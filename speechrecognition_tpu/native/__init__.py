"""Native (C++) runtime components, exposed via ctypes.

The shared library is built on first use (cached next to the source);
all callers fall back to the pure-Python path if no compiler is present.
"""

from .loader import load_corpus_native, native_available  # noqa: F401
