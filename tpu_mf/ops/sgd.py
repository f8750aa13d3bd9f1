"""Batched synchronous SGD update for biased MF.

TPU-native replacement for the reference's Hogwild per-rating inner loop
(reference: src/mf.h:72-133). The per-rating math is identical:

    err       = eta * (r - theta_u . phi_v - bu_u - bv_v - gb)
    theta_u  <- (1 - eta*lambda) * theta_u + err * phi_v(old)
    phi_v    <- (1 - eta*lambda) * phi_v   + err * theta_u(old)
    bu_u     <- (1 - eta*lambda) * bu_u + err
    bv_v     <- (1 - eta*lambda) * bv_v + err

but instead of lock-free racing threads, a batch of B ratings is processed
synchronously: gather rows, compute all residuals against batch-start values,
and scatter-add the per-rating deltas (duplicates within a batch accumulate —
the mini-batch analogue of the Hogwild races the reference tolerates by
design). Written as deltas, one rating contributes

    d_theta_u = err * phi_v     - eta*lambda * theta_u
    d_phi_v   = err * theta_u   - eta*lambda * phi_v

so a user with k ratings in the batch receives the decay k times, exactly as k
sequential reference updates would apply it (to first order).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_mf.models.mf import MFParams

Batch = Tuple[jax.Array, jax.Array, jax.Array, jax.Array]  # (u, v, r, w)


def sgd_batch_update(
    params: MFParams,
    batch: Batch,
    eta: jax.Array,
    lam: jax.Array,
) -> MFParams:
    """One synchronous SGD step over a batch of ratings (see module docstring)."""
    u, v, r, w = batch
    theta, phi, bu, bv, gb = params
    cdtype = jnp.float32

    t = theta[u].astype(cdtype)          # (B, D) gather
    p = phi[v].astype(cdtype)
    bu_g = bu[u].astype(cdtype)
    bv_g = bv[v].astype(cdtype)

    pred = jnp.sum(t * p, axis=-1) + bu_g + bv_g + gb.astype(cdtype)
    err = (eta * w) * (r - pred)          # (B,) — masked: padded slots are 0
    decay = (eta * lam) * w               # per-occurrence decay weight

    d_theta = err[:, None] * p - decay[:, None] * t
    d_phi = err[:, None] * t - decay[:, None] * p
    d_bu = err - decay * bu_g
    d_bv = err - decay * bv_g

    return MFParams(
        theta=theta.at[u].add(d_theta.astype(theta.dtype)),
        phi=phi.at[v].add(d_phi.astype(phi.dtype)),
        bu=bu.at[u].add(d_bu.astype(bu.dtype)),
        bv=bv.at[v].add(d_bv.astype(bv.dtype)),
        gb=gb,
    )


@partial(jax.jit, donate_argnums=(0,))
def sgd_epoch(
    params: MFParams,
    batches: Batch,
    eta: jax.Array,
    lam: jax.Array,
) -> MFParams:
    """Scan the batched update over one epoch of (nb, B) rating batches.

    This is the jitted analogue of the reference's pipeline body: the TBB
    read/parse filters become host-side prefetch (tpu_mf.io.stream) and the
    epoch loop lives here as a ``lax.scan`` (reference epoch loop:
    src/mf.h:24-47 read-filter rewind logic).
    """

    def step(p, b):
        return sgd_batch_update(p, b, eta, lam), None

    params, _ = jax.lax.scan(step, params, batches)
    return params
