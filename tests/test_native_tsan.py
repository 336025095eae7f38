"""ThreadSanitizer run over the native work-queue threading.

The reference leans on TBB's scheduler (MicrosoftPairHmm.cc:131); our
stand-in is a hand-rolled atomic work queue (mgl_native.cpp), so CI
builds the threaded batch APIs with -fsanitize=thread and drives them
with 4 threads, asserting zero TSan reports and 1-thread == N-thread
outputs (SURVEY §5 race-detection row)."""

import pathlib
import shutil
import subprocess

import pytest

SRC = pathlib.Path(__file__).resolve().parent.parent / "mgl_tpu/native/src"


@pytest.mark.slow
def test_tsan_clean(tmp_path):
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    exe = tmp_path / "tsan_driver"
    build = subprocess.run(
        ["g++", "-fsanitize=thread", "-O1", "-g", "-std=c++17",
         str(SRC / "tsan_driver.cpp"), str(SRC / "mgl_native.cpp"),
         "-o", str(exe), "-pthread"],
        capture_output=True, text=True)
    if build.returncode != 0:
        if "tsan" in build.stderr or "cannot find" in build.stderr:
            pytest.skip(f"tsan unavailable: {build.stderr[-200:]}")
        raise AssertionError(build.stderr)
    run = subprocess.run([str(exe)], capture_output=True, text=True,
                         timeout=300,
                         env={"TSAN_OPTIONS": "halt_on_error=1"})
    assert run.returncode == 0, (run.stdout, run.stderr)
    assert "ThreadSanitizer" not in run.stderr, run.stderr
    assert "OK" in run.stdout
