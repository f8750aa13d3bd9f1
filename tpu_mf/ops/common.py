"""Shared scatter helpers for the batched update kernels.

The reference applies weight decay *per rating, sequentially*: a row touched k
times in a row is scaled by (1-d)^k (reference inner loops: mf.h:94-109,
dpmf.h:72-88, admf.h:69-80). A batched kernel that instead accumulates k
additive deltas of -d*row diverges once k*d > 2, so decay is applied
multiplicatively — one scatter-multiply of (1-d)^k per touched row — and the
gradient terms are scatter-added. At batch size 1 this is bit-for-bit the
sequential update; for k > 1 it matches to first order in eta while keeping
the exact geometric contraction of the sequential scheme.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def pad_to_oob(idx: jax.Array, w: jax.Array, n_rows: int) -> jax.Array:
    """Redirect padded (w==0) slots to row index n_rows.

    Scatters drop out-of-bounds indices in JAX, so writes from padded slots
    vanish instead of corrupting row 0.
    """
    return jnp.where(w > 0, idx, n_rows)


def occurrence_stats(
    idx_pad: jax.Array, n_rows: int
) -> Tuple[jax.Array, jax.Array]:
    """Per-slot (is_first_occurrence, row_occurrence_count) within a batch.

    idx_pad must already have padded slots redirected to n_rows (pad_to_oob).
    Counts include only slots mapping to real rows' indices.
    """
    b = idx_pad.shape[0]
    pos = jnp.arange(b, dtype=jnp.int32)
    first_pos = jnp.full((n_rows + 1,), b, jnp.int32).at[idx_pad].min(pos)
    is_first = (first_pos[idx_pad] == pos) & (idx_pad < n_rows)
    counts = (
        jnp.zeros((n_rows + 1,), jnp.float32).at[idx_pad].add(1.0)[idx_pad]
    )
    return is_first, counts


def decay_factors(
    base: jax.Array, is_first: jax.Array, counts: jax.Array
) -> jax.Array:
    """(1-d)^k per first-occurrence slot, 1 elsewhere.

    base may be (B,) or (B, D); is_first/counts are (B,). jnp.power handles a
    negative base with these integral exponents, so behavior degrades exactly
    like the sequential reference when d > 1 (oscillating divergence) instead
    of silently differing.
    """
    if base.ndim == 2:
        is_first = is_first[:, None]
        counts = counts[:, None]
    return jnp.where(is_first, jnp.power(base, counts), 1.0)


def distinct_counts(ids, real) -> "np.ndarray":
    """Distinct real ids per leading row, vectorized (host-side plan build).

    ids/real: (..., n_slots) arrays; returns float32 of shape ids.shape[:-1].
    Replaces O(rows * n_slots) Python np.unique loops with one sort — plan
    build for Netflix/Yahoo-scale configs must finish in seconds, not minutes.
    """
    import numpy as np

    sentinel = np.iinfo(np.int64).max
    flat = ids.astype(np.int64, copy=True)
    flat[~np.asarray(real, bool)] = sentinel
    flat.sort(axis=-1)
    first = np.empty(flat.shape, bool)
    first[..., :1] = flat[..., :1] < sentinel
    first[..., 1:] = (flat[..., 1:] != flat[..., :-1]) & (flat[..., 1:] < sentinel)
    return first.sum(axis=-1).astype(np.float32)
