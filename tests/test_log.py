"""Leveled logging + CHECK (utils/log.py — util/log.h + util/check.h)."""

import pytest

from vspg_pbrt_v4_tpu.utils import log


def test_levels_gate_emission(capsys):
    log.set_level("error")
    log.verbose("hidden %d", 1)
    log.warning("hidden too")
    log.error("shown %s", "x")
    err = capsys.readouterr().err
    assert "hidden" not in err
    assert "shown x" in err and "ERROR" in err
    log.set_level("warning")
    log.warning("now visible")
    assert "now visible" in capsys.readouterr().err


def test_check_raises_with_context(capsys):
    remove = log.register_check_callback(lambda: "pixel (3,4) sample 7")
    try:
        log.check(True, "fine")  # no-op
        with pytest.raises(log.CheckError) as ei:
            log.check(False, "bad value %d", 42)
        assert "bad value 42" in str(ei.value)
        assert "pixel (3,4) sample 7" in str(ei.value)
    finally:
        remove()
    # callback removed: context no longer attached
    with pytest.raises(log.CheckError) as ei:
        log.check(False, "again")
    assert "pixel (3,4)" not in str(ei.value)


def test_fatal_raises(capsys):
    log.set_level("fatal")
    with pytest.raises(log.CheckError):
        log.fatal("boom")
    assert "FATAL" in capsys.readouterr().err


def test_log_file_mirroring(tmp_path, capsys):
    p = tmp_path / "render.log"
    log.set_level("verbose")
    log.set_file(str(p))
    try:
        log.verbose("to both sinks")
    finally:
        log.set_file(None)
        log.set_level("warning")
    assert "to both sinks" in p.read_text()
    assert "to both sinks" in capsys.readouterr().err
