"""NumPy sequential-SGD oracle: golden model for kernel tests.

Implements the reference's per-rating math exactly as written in the Hogwild
inner loop (reference: src/mf.h:94-109), but strictly sequentially — the
ground truth that both the batched JAX op (at batch size 1) and the Pallas
kernels are validated against (SURVEY §4 test strategy).
"""

from __future__ import annotations

import numpy as np


def sgd_sequential(theta, phi, bu, bv, gb, u, v, r, eta, lam):
    """Run sequential biased-MF SGD over ratings in order. Mutates copies."""
    theta = theta.astype(np.float64).copy()
    phi = phi.astype(np.float64).copy()
    bu = bu.astype(np.float64).copy()
    bv = bv.astype(np.float64).copy()
    lameta = 1.0 - eta * lam
    for i in range(len(u)):
        uu, vv = int(u[i]), int(v[i])
        err = eta * (
            r[i] - theta[uu] @ phi[vv] - bu[uu] - bv[vv] - gb
        )
        t_old = theta[uu].copy()
        theta[uu] = lameta * theta[uu] + err * phi[vv]
        phi[vv] = lameta * phi[vv] + err * t_old
        bu[uu] = lameta * bu[uu] + err
        bv[vv] = lameta * bv[vv] + err
    return theta, phi, bu, bv


def sgd_sequential_scan(theta, phi, bu, bv, gb, u, v, r, eta, lam):
    """The SAME per-rating sequential loop as sgd_sequential, expressed as a
    lax.scan so million-rating oracles finish in seconds. Math is float32,
    exactly like the reference's `float` tables (src/mf.h:94-109); the scan
    carries the full tables and each step updates one (user, item) pair —
    strictly sequential, no batching semantics anywhere.
    """
    import jax
    import jax.numpy as jnp

    lameta = np.float32(1.0 - eta * lam)
    eta = np.float32(eta)
    gb = np.float32(gb)

    def step(carry, x):
        theta, phi, bu, bv = carry
        uu, vv, rr = x
        t = theta[uu]
        p = phi[vv]
        err = eta * (rr - t @ p - bu[uu] - bv[vv] - gb)
        theta = theta.at[uu].set(lameta * t + err * p)
        phi = phi.at[vv].set(lameta * p + err * t)
        bu = bu.at[uu].set(lameta * bu[uu] + err)
        bv = bv.at[vv].set(lameta * bv[vv] + err)
        return (theta, phi, bu, bv), None

    carry = (
        jnp.asarray(theta, jnp.float32), jnp.asarray(phi, jnp.float32),
        jnp.asarray(bu, jnp.float32), jnp.asarray(bv, jnp.float32),
    )
    xs = (
        jnp.asarray(u, jnp.int32), jnp.asarray(v, jnp.int32),
        jnp.asarray(r, jnp.float32),
    )
    carry, _ = jax.jit(lambda c, x: jax.lax.scan(step, c, x))(carry, xs)
    return tuple(np.asarray(a) for a in carry)


def predict(theta, phi, bu, bv, gb, u, v):
    return np.einsum("nd,nd->n", theta[u], phi[v]) + bu[u] + bv[v] + gb


def rmse(theta, phi, bu, bv, gb, u, v, r):
    e = r - predict(theta, phi, bu, bv, gb, u, v)
    return float(np.sqrt(np.mean(e * e)))
