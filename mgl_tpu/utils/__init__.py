"""Shared small helpers + observability (metrics, debug_check submodules)."""

from __future__ import annotations


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``x``."""
    return (x + m - 1) // m * m


def shift_down(x, fill):
    """out[..., r] = x[..., r-1]; out[..., 0] = fill (jax arrays)."""
    import jax.numpy as jnp

    fill_col = jnp.full(x.shape[:-1] + (1,), fill, dtype=x.dtype)
    return jnp.concatenate([fill_col, x[..., :-1]], axis=-1)
