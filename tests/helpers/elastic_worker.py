"""Subprocess worker for the elastic transport integration test.

Usage: python elastic_worker.py <host> <port> <name> <heartbeat_ttl>

Work function: sleep payload["t"] seconds, return payload["x"] squared.
A payload whose "hang_for" equals this worker's name sleeps forever —
a machine-specific failure: the test SIGKILLs that worker mid-shard and
the re-dispatched shard completes normally on the survivor.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from mgl_tpu.parallel.transport import run_worker  # noqa: E402


def main():
    host, port, name, hb = (sys.argv[1], int(sys.argv[2]), sys.argv[3],
                            float(sys.argv[4]))

    def work(payload):
        if payload.get("hang_for") == name:
            time.sleep(3600)
        time.sleep(payload.get("t", 0))
        return payload["x"] ** 2

    n = run_worker((host, port), work, name, heartbeat_ttl=hb)
    print(f"{name} committed {n}", flush=True)


if __name__ == "__main__":
    main()
