"""Distributed record sort: device-local sort + bitonic merge over the mesh.

The TPU-native replacement for host-side record sorting (BASELINE.json
config 5: global coordinate sort with shard merge).  Keys are uint64
(typically (contig << 48) | position << 16 | tiebreak); values ride along
as a parallel uint32/int32 payload (record index).

Algorithm: each device sorts its shard locally (XLA's on-device sort),
then a bitonic merge network over the mesh axis exchanges whole shards
with partners via ppermute and keeps the lower/upper half of each merged
pair.  log2(P)*(log2(P)+1)/2 exchange stages; every stage moves one shard
per device over ICI.  Deterministic, fixed shapes, no host round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _merge_keep(keys, vals, other_keys, other_vals, keep_low: jax.Array):
    """Merge two sorted shards, keep lower or upper half (sorted)."""
    n = keys.shape[0]
    all_k = jnp.concatenate([keys, other_keys])
    all_v = jnp.concatenate([vals, other_vals])
    order = jnp.argsort(all_k)
    all_k = all_k[order]
    all_v = all_v[order]
    lo_k, lo_v = all_k[:n], all_v[:n]
    hi_k, hi_v = all_k[n:], all_v[n:]
    k = jnp.where(keep_low, lo_k, hi_k)
    v = jnp.where(keep_low, lo_v, hi_v)
    return k, v


def _bitonic_stages(p: int):
    """Yield (partner_xor, ascending_mask_bit) stages of a bitonic sorter
    over p = 2^k participants."""
    k = p.bit_length() - 1
    for major in range(1, k + 1):
        for minor in range(major - 1, -1, -1):
            yield (1 << minor), (1 << major)


def distributed_sort(keys, vals, mesh: Mesh, axis: str = "dp"):
    """Globally sort (keys, vals) sharded along ``axis``.

    Returns (keys, vals) with the same sharding: shard i holds the i-th
    contiguous slice of the global sorted order.  Shard sizes must be
    equal (pad with 0xFFFF... sentinels).
    """
    p = mesh.shape[axis]
    if p & (p - 1):
        raise ValueError("device count on sort axis must be a power of two")

    def local(keys, vals):
        order = jnp.argsort(keys)
        keys, vals = keys[order], vals[order]
        if p == 1:
            return keys, vals
        idx = jax.lax.axis_index(axis)
        for partner_xor, major_bit in _bitonic_stages(p):
            partner = idx ^ partner_xor
            # ascending region if (idx & major_bit) == 0
            ascending = (idx & major_bit) == 0
            # bitonic network with ascending-only final ordering:
            # within a merge pair, the lower-indexed member keeps the
            # smaller half iff the region is ascending
            is_lower = (idx & partner_xor) == 0
            keep_low = jnp.logical_not(jnp.logical_xor(is_lower, ascending))
            perm = [(j, j ^ partner_xor) for j in range(p)]
            ok = jax.lax.ppermute(keys, axis, perm)
            ov = jax.lax.ppermute(vals, axis, perm)
            keys, vals = _merge_keep(keys, vals, ok, ov, keep_low)
        return keys, vals

    spec = P(axis)
    fn = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec),
                       out_specs=(spec, spec), check_vma=False)
    return fn(keys, vals)


def sort_records(keys: np.ndarray, vals: np.ndarray, mesh: Mesh,
                 axis: str = "dp"):
    """Host convenience: pad to equal shards, sort, strip sentinels."""
    p = mesh.shape[axis]
    n = len(keys)
    per = -(-n // p)
    total = per * p
    kp = np.full(total, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    vp = np.zeros(total, dtype=vals.dtype)
    kp[:n] = keys
    vp[:n] = vals
    sharding = NamedSharding(mesh, P(axis))
    kd = jax.device_put(jnp.asarray(kp), sharding)
    vd = jax.device_put(jnp.asarray(vp), sharding)
    ks, vs = distributed_sort(kd, vd, mesh, axis)
    ks = np.asarray(ks)[:n]
    vs = np.asarray(vs)[:n]
    return ks, vs
