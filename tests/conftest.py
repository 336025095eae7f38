"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh *before* jax is imported
anywhere, so sharding/multi-chip tests run without TPU hardware.  Kernel
numerics are identical between CPU and TPU for the f32/int32 ops we use
(Pallas kernels run in interpret mode on CPU).
"""

import os

# Must happen before any jax import in the test session.
#
# The axon TPU plugin registers itself from sitecustomize in every python
# process when PALLAS_AXON_POOL_IPS is set, ignores JAX_PLATFORMS=cpu, and
# hangs when two processes contend for the single tunnel.  Tests therefore
# run pure-CPU (set MGL_TPU_TEST_TPU=1 to keep the TPU for the -m tpu
# hardware-parity tests).
if os.environ.get("MGL_TPU_TEST_TPU") != "1":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # 16 virtual devices, though meshes use at most 8: the XLA CPU
    # client's thread pool is sized to the device count, and an 8-device
    # Mosaic-interpret pallas program parks 8 *blocking* host callbacks
    # on pool threads whose argument-producer tasks also need threads —
    # with exactly 8 that deadlocks (see __graft_entry__.dryrun_multichip).
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=16"
    ).strip()

import json  # noqa: E402
import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def pairhmm_kat():
    """105 known-answer cases (104 reference data-file rows + simpleTest)."""
    return json.loads((GOLDEN / "pairhmm_kat.json").read_text())


@pytest.fixture(scope="session")
def sw_golden():
    """~2000 SW cases with golden CIGAR/offset from the compiled reference."""
    return [json.loads(l) for l in (GOLDEN / "sw_golden.jsonl").read_text().splitlines()]


@pytest.fixture(scope="session")
def pairhmm_golden():
    """225 PairHMM cases with hex-exact scores from all 4 reference kernels."""
    return [json.loads(l) for l in (GOLDEN / "pairhmm_golden.jsonl").read_text().splitlines()]


def as_u8(s: str) -> np.ndarray:
    return np.frombuffer(s.encode(), dtype=np.uint8)


def kat_read(case: dict) -> dict:
    return dict(
        bases=as_u8(case["read"]),
        q=np.array(case["q"], dtype=np.uint8),
        i=np.array(case["i"], dtype=np.uint8),
        d=np.array(case["d"], dtype=np.uint8),
        c=np.array(case["c"], dtype=np.uint8),
    )
