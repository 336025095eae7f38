"""Logging configuration (the log4j2.xml analogue,
src/main/resources/log4j2.xml): namespace isolation, MGL_TPU_LOG global
and per-component levels."""

import logging


def test_levels_and_components(monkeypatch, capsys):
    import mgl_tpu.utils.logging as L

    monkeypatch.setenv("MGL_TPU_LOG", "info,io=debug")
    L.configure(force=True)
    try:
        eng = L.get_logger("engine")
        io = L.get_logger("io")
        assert eng.getEffectiveLevel() == logging.INFO
        assert io.getEffectiveLevel() == logging.DEBUG
        eng.debug("hidden")
        eng.info("shown-info")
        io.debug("shown-debug")
        err = capsys.readouterr().err
        assert "hidden" not in err
        assert "shown-info" in err and "shown-debug" in err
        # never touches the root logger (embedding apps keep control)
        assert not logging.getLogger().handlers or \
            logging.getLogger("mgl_tpu").propagate is False
    finally:
        monkeypatch.delenv("MGL_TPU_LOG")
        L.configure(force=True)
        logging.getLogger("mgl_tpu.io").setLevel(logging.NOTSET)


def test_default_quiet(monkeypatch, capsys):
    import mgl_tpu.utils.logging as L

    monkeypatch.delenv("MGL_TPU_LOG", raising=False)
    L.configure(force=True)
    L.get_logger("engine").debug("invisible")
    L.get_logger("engine").info("invisible2")
    err = capsys.readouterr().err
    assert "invisible" not in err
