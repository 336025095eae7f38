"""Sharded end-to-end pipeline step over a ('dp', 'hp') mesh.

The multi-chip execution model (new surface vs the single-process
reference — SURVEY.md §2 parallelism note):

* reads are data-parallel along 'dp' (each host/chip owns a read shard);
* haplotypes are model-parallel along 'hp' (each chip owns a hap shard and
  computes its block-column of the likelihood matrix);
* per-read reductions (best haplotype) ride ICI via lax.pmax over 'hp';
* globally ordered output comes from the bitonic shard merge
  (parallel/sort.py) over 'dp'.

`pipeline_step` is the jit/compile target for multi-chip dry-runs and the
building block for pod-slice deployment: one call = likelihoods for a
(reads x haps) tile + SW scores vs a reference window + globally sorted
coordinate keys.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mgl_tpu.ops.pairhmm import pairhmm_forward_f32
from mgl_tpu.ops.sw import sw_forward
from mgl_tpu.parallel.sort import distributed_sort


def _pairhmm_block(rchar, rslen, trans, y_hap, hap, haplen):
    """Local (r_l x h_l) likelihood block from read/hap shards.

    trans: (r_l, 7, rows) f32 stacked transition+emission rows
    y_hap: (h_l,) f32 per-hap yInitial.
    """
    r_l = rchar.shape[0]
    h_l = hap.shape[0]
    rep = lambda a: jnp.repeat(a, h_l, axis=0)
    til = lambda a: jnp.tile(a, (r_l,) + (1,) * (a.ndim - 1))
    scores = pairhmm_forward_f32(
        til(hap), til(haplen),
        rep(rchar), rep(rslen),
        rep(trans[:, 0]), rep(trans[:, 1]), rep(trans[:, 2]),
        rep(trans[:, 3]), rep(trans[:, 4]),
        rep(trans[:, 5]), rep(trans[:, 6]),
        til(y_hap),
    )
    return scores.reshape(r_l, h_l)


def pipeline_step(mesh: Mesh):
    """Build the jitted sharded step for ``mesh``.

    Returns fn(reads, haps, ref_window) -> dict of sharded outputs, where
      reads: dict of arrays leading dim R (sharded dp):
        rchar (R, rows) i32, rslen (R,) i32, trans (R, 7, rows) f32,
        query (R, Q) i32, qlen (R,) i32, key (R,) u64
      haps: dict leading dim H (sharded hp):
        hap (H, L) i32, haplen (H,) i32, y_init (H,) f32
      ref_window: dict (replicated): target (1, T) i32, tlen (1,) i32
    """

    def step(rchar, rslen, trans, query, qlen, key_hi, key_lo,
             hap, haplen, y_init, target, tlen):
        # 1. likelihood block (dp x hp block of the R x H matrix)
        lik = _pairhmm_block(rchar, rslen, trans, y_init, hap, haplen)

        # 2. best-hap reduction across the hp axis (ICI collective)
        local_best = jnp.max(lik, axis=1)
        best = jax.lax.pmax(local_best, "hp")

        # 3. SW score of each read against the reference window (dp-local)
        r_l = query.shape[0]
        tgt = jnp.broadcast_to(target, (r_l, target.shape[1]))
        tl = jnp.broadcast_to(tlen, (r_l,))
        sw = sw_forward(tgt, tl, query, qlen,
                        jnp.int32(25), jnp.int32(-50), jnp.int32(110),
                        jnp.int32(6), indel_init=False, with_traceback=False)
        sw_best = jnp.max(sw.last_row, axis=0)

        # 4. global coordinate sort of read keys over dp (bitonic shard merge)
        order_vals = jax.lax.axis_index("dp") * r_l + jnp.arange(r_l, dtype=jnp.int32)
        return lik, best, sw_best, key_hi, key_lo, order_vals

    dp, hp, rep = P("dp"), P("hp"), P()
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(dp, dp, dp, dp, dp, dp, dp, hp, hp, hp, rep, rep),
        out_specs=(P("dp", "hp"), dp, dp, dp, dp, dp),
        check_vma=False,
    )

    def full(reads: dict, haps: dict, ref_window: dict):
        lik, best, sw_best, khi, klo, vals = sharded(
            reads["rchar"], reads["rslen"], reads["trans"],
            reads["query"], reads["qlen"],
            reads["key_hi"], reads["key_lo"],
            haps["hap"], haps["haplen"], haps["y_init"],
            ref_window["target"], ref_window["tlen"],
        )
        shi, slo, svals = distributed_sort(khi, klo, vals, mesh, "dp")
        return {"likelihoods": lik, "best_hap_lik": best,
                "sw_scores": sw_best, "sorted_key_hi": shi,
                "sorted_key_lo": slo, "sorted_order": svals}

    return full


def make_example_inputs(mesh: Mesh, r_per_dev=8, h_per_dev=4,
                        read_len=24, hap_len=40, seed=0):
    """Tiny sharded inputs for dry-runs and tests."""
    from mgl_tpu.core.context import CTX_F32, read_transition_rows

    dp = mesh.shape["dp"]
    hp = mesh.shape["hp"]
    R = r_per_dev * dp
    H = h_per_dev * hp
    rows = read_len + 1
    rng = np.random.default_rng(seed)
    bases = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(R, read_len))
    quals = rng.integers(20, 50, size=(R, read_len)).astype(np.uint8)
    gcp = np.full((R, read_len), 10, np.uint8)

    trans = np.zeros((R, 7, rows), np.float32)
    for r in range(R):
        t = read_transition_rows(quals[r], quals[r], quals[r], gcp[r], CTX_F32)
        distm = t[5]
        one = np.float32(1.0)
        third = np.float32(1.0) / np.float32(3.0)
        for k in range(5):
            trans[r, k] = t[k]
        trans[r, 5] = (one - distm).astype(np.float32)
        trans[r, 6] = (distm * third).astype(np.float32)

    rchar = np.zeros((R, rows), np.int32)
    rchar[:, 1:] = bases
    haps = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(H, hap_len)).astype(np.int32)

    keys = rng.integers(0, 2**62, size=R).astype(np.uint64)
    from mgl_tpu.parallel.sort import split_u64

    key_hi, key_lo = split_u64(keys)
    reads = {
        "rchar": rchar,
        "rslen": np.full(R, read_len, np.int32),
        "trans": trans,
        "query": bases.astype(np.int32),
        "qlen": np.full(R, read_len, np.int32),
        "key_hi": key_hi,
        "key_lo": key_lo,
    }
    hap_d = {
        "hap": haps,
        "haplen": np.full(H, hap_len, np.int32),
        "y_init": (np.float32(CTX_F32.initial_constant) / np.float32(hap_len)
                   ) * np.ones(H, np.float32),
    }
    ref_window = {
        "target": rng.choice(np.frombuffer(b"ACGT", np.uint8),
                             size=(1, 64)).astype(np.int32),
        "tlen": np.full(1, 64, np.int32),
    }

    def put(d, spec_axis):
        out = {}
        for k, v in d.items():
            spec = P(spec_axis) if spec_axis else P()
            out[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, spec))
        return out

    return put(reads, "dp"), put(hap_d, "hp"), put(ref_window, None)
