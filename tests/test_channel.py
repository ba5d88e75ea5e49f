"""Core channel/component/application harness tests (Core/check.cc's
Component+Channel+Parameter exercise, Core/check.config wildcard cases)."""

import numpy as np
import pytest

from speechrecognition_tpu.sprint.channel import (Application, ChannelManager,
                                                  Component, XmlWriter)
from speechrecognition_tpu.sprint.config import SprintConfig


def _config_from_text(tmp_path, text):
    p = tmp_path / "test.config"
    p.write_text(text)
    return SprintConfig.read(str(p))


def test_channel_resolution_and_file_target(tmp_path):
    out = tmp_path / "results.log"
    cfg = _config_from_text(tmp_path, f"""
[*]
results.channel = {out}
""")
    mgr = ChannelManager(cfg)
    comp = Component(mgr, "check.test-1")
    ch = comp.channel("results")
    assert ch.is_open()
    XmlWriter(ch).full("score", 1.5)
    mgr.close()
    text = out.read_text()
    assert text.startswith('<?xml version="1.0"')
    assert "<score>1.5</score>" in text and "</sprint>" in text


def test_unconfigured_channel_is_closed(tmp_path):
    cfg = _config_from_text(tmp_path, "[*]\n")
    comp = Component(ChannelManager(cfg), "check.foo")
    assert not comp.channel("statistics").is_open()


def test_component_messages_and_counts(tmp_path, capsys):
    cfg = _config_from_text(tmp_path, "[*]\n")
    comp = Component(ChannelManager(cfg), "recognizer.search")
    comp.log("starting <search>")
    comp.warning("beam & small")
    comp.error("bad model")
    captured = capsys.readouterr()
    assert '<log component="recognizer.search">starting &lt;search&gt;</log>' \
        in captured.out
    assert "<warning" in captured.err and "beam &amp; small" in captured.err
    assert comp.n_errors == 1 and comp.n_warnings == 1
    with pytest.raises(RuntimeError):
        comp.critical_error("fatal")
    assert comp.n_errors == 2


def test_xml_writer_nesting_and_escaping(tmp_path):
    out = tmp_path / "trace.log"
    cfg = _config_from_text(tmp_path, f"[*]\ntrace.channel = {out}\n")
    mgr = ChannelManager(cfg)
    comp = Component(mgr, "app")
    with comp.xml_channel("trace") as xml:
        xml.open("traceback", segment="utt<1>")
        xml.full("word", "zwei", start=0, end=42)
        xml.empty("silence", frames=10)
        xml.close("traceback")
    mgr.close()
    text = out.read_text()
    assert '<traceback segment="utt&lt;1&gt;">' in text
    assert '<word start="0" end="42">zwei</word>' in text
    assert '<silence frames="10"/>' in text
    assert text.index("<traceback") < text.index("<word")


def test_wildcard_channel_selection(tmp_path):
    """check.config-style resolution: a channel configured for one
    component selection doesn't leak to others."""
    a = tmp_path / "a.log"
    cfg = _config_from_text(tmp_path, f"""
[*.test-1]
results.channel = {a}
""")
    mgr = ChannelManager(cfg)
    assert Component(mgr, "check.test-1").channel("results").is_open()
    assert not Component(mgr, "check.test-2").channel("results").is_open()
    mgr.close()


def test_application_run_and_overrides(tmp_path):
    base = tmp_path / "app.config"
    base.write_text("[*]\nalpha = 1\n")
    sysinfo = tmp_path / "sys.log"
    app = Application("tool", argv=[
        f"--config={base}", "--tool.alpha=2", "corpus.json",
        f"--tool.system-info.channel={sysinfo}"])
    assert app.args == ["corpus.json"]
    assert app.config.get("tool.alpha") == "2"   # override beats file

    seen = {}

    def main(a):
        seen["alpha"] = a.config.get_int("tool.alpha")
        a.log("running")
        return 0

    assert app.run(main) == 0
    assert seen["alpha"] == 2
    assert "<elapsed-time" in sysinfo.read_text()


def test_application_error_status(tmp_path):
    base = tmp_path / "app.config"
    base.write_text("[*]\n")
    app = Application("tool", argv=[f"--config={base}"])

    def main(a):
        a.error("broken")
        return 0

    assert app.run(main) == 1
