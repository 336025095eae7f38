"""Elastic shard-dispatch tests (parallel/elastic.py): heartbeat expiry,
re-dispatch after a worker death, idempotent commit."""

import numpy as np
import pytest

from mgl_tpu.parallel.elastic import ShardCoordinator, run_elastic


def test_all_shards_complete_simple():
    out = run_elastic(list(range(10)), lambda p: p * p, n_workers=3)
    assert out == {i: i * i for i in range(10)}


def test_worker_death_redispatch():
    import threading

    died = []
    dlock = threading.Lock()

    def fail(worker, shard_id):
        # the first worker to pick up any shard dies with it (picking a
        # fixed worker name is a scheduling flake: on a loaded 1-core
        # host the other workers can drain the queue before that thread
        # ever runs)
        with dlock:
            if not died:
                died.append((worker, shard_id))
                return True
        return False

    shards = list(range(16))
    out = run_elastic(shards, lambda p: p + 100, n_workers=3,
                      lease_ttl=0.2, heartbeat_ttl=0.1)
    assert out == {i: i + 100 for i in range(16)}
    assert died == []  # fail hook unused in this call

    out = run_elastic(shards, lambda p: p + 100, n_workers=3,
                      lease_ttl=0.2, heartbeat_ttl=0.1, fail=fail)
    assert died, "hook should have killed host0 once"
    assert out == {i: i + 100 for i in range(16)}, \
        "abandoned shard must be re-dispatched and completed"


def test_lease_expiry_and_idempotent_commit():
    clock = [0.0]
    coord = ShardCoordinator([b"a", b"b"], lease_ttl=5.0, heartbeat_ttl=3.0,
                             clock=lambda: clock[0])
    sid0, _ = coord.lease("hostA")
    # hostA goes silent; clock passes heartbeat ttl
    clock[0] = 4.0
    got = coord.lease("hostB")           # hostA's lease reaped -> re-leased
    assert got is not None and got[0] == sid0
    got2 = coord.lease("hostB")
    assert got2 is not None
    sid1 = got2[0]
    assert sid1 != sid0
    # late completion from the dead host still commits if first
    assert coord.complete("hostA", sid0, "late") is True
    # second completion of the same shard is rejected
    assert coord.complete("hostB", sid0, "dup") is False
    assert coord.complete("hostB", sid1, "ok") is True
    assert coord.done()
    assert coord.results() == {sid0: "late", sid1: "ok"}
    assert "hostA" in coord.stats()["dead_workers"]


def test_elastic_alignment_work_matches_serial():
    """Shards of real SW work through the elastic pool == serial results."""
    from mgl_tpu.api import OverhangStrategy, SmithWatermanAligner, SWParameters

    rng = np.random.default_rng(5)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    pairs = [(rng.choice(alpha, 40).tobytes(), rng.choice(alpha, 30).tobytes())
             for _ in range(12)]
    shards = [pairs[i:i + 3] for i in range(0, 12, 3)]
    p = SWParameters(25, -50, 110, 6)
    aligner = SmithWatermanAligner()

    def work(shard):
        res = aligner.align_batch([t for t, _ in shard],
                                  [q for _, q in shard], p,
                                  OverhangStrategy.SOFTCLIP)
        return [(r.cigar, r.offset) for r in res]

    out = run_elastic(shards, work, n_workers=2)
    serial = [work(s) for s in shards]
    assert [out[i] for i in range(len(shards))] == serial


def test_slow_shard_not_reaped_from_live_worker():
    """A healthy worker on a shard slower than heartbeat_ttl keeps its
    lease (heartbeats renew deadlines); the shard runs exactly once."""
    import time

    calls = []

    def slow_work(p):
        calls.append(p)
        time.sleep(2.0)            # >> ttls below
        return p * 2

    # margins sized for a loaded 1-core CI host: the heartbeat thread
    # beats every ttl/3 ~ 0.33s against a 1.0s expiry
    stats = {}
    out = run_elastic(list(range(2)), slow_work, n_workers=2,
                      lease_ttl=1.5, heartbeat_ttl=1.0, stats_out=stats)
    assert out == {i: i * 2 for i in range(2)}
    gaps = stats.get("max_heartbeat_gap", {})
    if gaps and max(gaps.values()) > 1.0:
        # the HOST stalled the heartbeat thread past the ttl — the
        # coordinator reaping then is correct behavior, not a bug; the
        # no-reexecution invariant is only claimed when beats flowed
        pytest.skip(f"host scheduling stalled heartbeats: {gaps}")
    assert sorted(calls) == [0, 1], f"shards re-executed: {sorted(calls)}"
