"""Runtime contract layer (contracts.py vs Core/Assertions.hh)."""

import numpy as np
import pytest

from speechrecognition_tpu.contracts import (ContractError, defect, ensure,
                                             require, verify)


def test_require_always_on(monkeypatch):
    monkeypatch.setenv("SPEECH_TPU_CHECKS", "0")
    with pytest.raises(ContractError, match="require failed: bad input"):
        require(False, "bad input")
    require(True, "fine")


def test_verify_and_ensure_gated(monkeypatch):
    with pytest.raises(ContractError, match="verify failed"):
        verify(False)
    with pytest.raises(ContractError, match="ensure failed"):
        ensure(False)
    monkeypatch.setenv("SPEECH_TPU_CHECKS", "0")
    verify(False)     # released build: no-op
    ensure(False)


def test_defect():
    with pytest.raises(ContractError, match="defect"):
        defect("unhandled mode")


def test_contract_error_is_value_error():
    """Call sites that previously raised ValueError keep their contract."""
    assert issubclass(ContractError, ValueError)


def test_wired_into_decode_bounds():
    from speechrecognition_tpu.search.decoder import _check_pack_bounds

    _check_pack_bounds(100, 12)
    with pytest.raises(ContractError, match="too long"):
        _check_pack_bounds(70000, 12)
    with pytest.raises(ContractError, match="vocabulary too large"):
        _check_pack_bounds(100, 1 << 15)


def test_wired_into_aligner_tables():
    from speechrecognition_tpu.align.viterbi import AlignerTables
    from speechrecognition_tpu.lexicon import MarkovAutomaton
    from speechrecognition_tpu.tdp import TdpModel

    a = MarkovAutomaton(states=np.asarray([40000], np.int32))
    with pytest.raises(ContractError, match="int16"):
        AlignerTables.build([a], TdpModel(silence_state=0))
