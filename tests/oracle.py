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


def predict(theta, phi, bu, bv, gb, u, v):
    return np.einsum("nd,nd->n", theta[u], phi[v]) + bu[u] + bv[v] + gb


def rmse(theta, phi, bu, bv, gb, u, v, r):
    e = r - predict(theta, phi, bu, bv, gb, u, v)
    return float(np.sqrt(np.mean(e * e)))
