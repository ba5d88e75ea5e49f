from .ngram import Vocabulary, CountLM  # noqa: F401
from .arpa import ArpaLM  # noqa: F401
