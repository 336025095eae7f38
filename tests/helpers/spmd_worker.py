"""SPMD pod-mode process: init_runtime + pipeline_step over the GLOBAL
mesh spanning all processes' devices.  Spawned N times by
tests/test_launcher.py::test_spmd_two_process_global_mesh; each process
dumps the global-array slices it addresses; the test sums the disjoint
per-process dumps and compares against a single-process run."""

import sys

pid = int(sys.argv[1])
n_procs = int(sys.argv[2])
port = sys.argv[3]
workload = sys.argv[4]
out_npz = sys.argv[5]

from mgl_tpu.parallel.launcher import (ChunkRunner, collect_global,  # noqa: E402
                                       init_runtime, load_workload)

init_runtime(coordinator_address=f"127.0.0.1:{port}",
             num_processes=n_procs, process_id=pid,
             local_device_count=4)

import jax  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

devs = jax.devices()
assert len(devs) == 4 * n_procs, f"global device list wrong: {len(devs)}"
assert len(jax.local_devices()) == 4
mesh = Mesh(np.array(devs).reshape(len(devs) // 2, 2), ("dp", "hp"))

reads, haps, ref = load_workload(workload)
runner = ChunkRunner(mesh, haps, ref, impl="xla")
out = runner.run(reads, 0, len(reads["rslen"]))
np.savez(out_npz, **{k: v for k, v in out.items() if v is not None})
print(f"proc {pid}: global mesh {dict(mesh.shape)} OK", flush=True)
