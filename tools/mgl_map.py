"""End-to-end CLI shim for checkouts: see mgl_tpu/cli.py (the
installed `mgl-map` console script is the same entry point)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from mgl_tpu.cli import map_main

if __name__ == "__main__":
    map_main()
