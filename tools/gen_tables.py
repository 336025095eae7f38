"""Regenerate mgl_tpu/core/_tables/context_tables.npz from the C++ oracle.

Usage:  tools/oracle/build.sh && python tools/gen_tables.py

The dump makes the quality-context tables bit-exact with the reference's
libm (Context.h powf/log10 calls); the NumPy fallback in core/context.py is
within 1 ulp but not bitwise identical.
"""

from __future__ import annotations

import pathlib
import subprocess
import tempfile

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent


def main() -> None:
    from mgl_tpu.core.context import JACOBIAN_LOG_TABLE_SIZE, _TRI_SIZE

    def load(path, dt):
        raw = np.fromfile(path, dtype=dt)
        ph2pr = raw[:128]
        o = 128
        m2m = raw[o:o + _TRI_SIZE]
        o += _TRI_SIZE
        jac = raw[o:o + JACOBIAN_LOG_TABLE_SIZE]
        return ph2pr, m2m, jac

    with tempfile.TemporaryDirectory() as td:
        subprocess.run([str(REPO / "tools/oracle/oracle"), "tables", td], check=True)
        p32, m32, j32 = load(f"{td}/ctx_f32.bin", np.float32)
        p64, m64, j64 = load(f"{td}/ctx_f64.bin", np.float64)

    out = REPO / "mgl_tpu/core/_tables/context_tables.npz"
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, ph2pr_f32=p32, m2m_f32=m32, jac_f32=j32,
                        ph2pr_f64=p64, m2m_f64=m64, jac_f64=j64)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
