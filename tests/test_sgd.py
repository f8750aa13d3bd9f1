"""Batched SGD kernel vs. the sequential NumPy oracle + convergence gates."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.oracle import sgd_sequential, rmse as oracle_rmse
from tpu_mf.config import TrainConfig
from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import MFParams, init_mf, predict, rmse
from tpu_mf.ops.sgd import sgd_batch_update, sgd_epoch
from tpu_mf.train.loop import train_mf


def make_params(nu=11, nv=7, dim=4, seed=0):
    rng = np.random.default_rng(seed)
    return MFParams(
        theta=jnp.asarray(rng.normal(0, 1e-2, (nu, dim)).astype(np.float32)),
        phi=jnp.asarray(rng.normal(0, 1e-2, (nv, dim)).astype(np.float32)),
        bu=jnp.asarray(rng.normal(0, 1e-2, nu).astype(np.float32)),
        bv=jnp.asarray(rng.normal(0, 1e-2, nv).astype(np.float32)),
        gb=jnp.float32(3.0),
    )


def test_batch_size_one_matches_sequential_oracle():
    """B=1 batched updates == sequential reference math (src/mf.h:94-109)."""
    params = make_params()
    ds = synthetic_ratings(11, 7, 64, seed=1)
    eta, lam = 0.05, 0.01

    t, p, bu, bv = sgd_sequential(
        np.asarray(params.theta), np.asarray(params.phi),
        np.asarray(params.bu), np.asarray(params.bv),
        float(params.gb), ds.u, ds.v, ds.r, eta, lam,
    )

    jp = params
    for i in range(len(ds)):
        batch = (
            jnp.asarray([ds.u[i]]), jnp.asarray([ds.v[i]]),
            jnp.asarray([ds.r[i]]), jnp.ones(1, jnp.float32),
        )
        jp = sgd_batch_update(jp, batch, jnp.float32(eta), jnp.float32(lam))

    np.testing.assert_allclose(np.asarray(jp.theta), t, rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jp.phi), p, rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jp.bu), bu, rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jp.bv), bv, rtol=0, atol=1e-4)


def test_padding_mask_is_noop():
    """Weight-0 (padded) slots must not change any parameter."""
    params = make_params()
    batch = (
        jnp.asarray([3, 0], jnp.int32),
        jnp.asarray([5, 0], jnp.int32),
        jnp.asarray([4.0, 9.9], jnp.float32),
        jnp.asarray([1.0, 0.0], jnp.float32),
    )
    only_first = (
        jnp.asarray([3], jnp.int32), jnp.asarray([5], jnp.int32),
        jnp.asarray([4.0], jnp.float32), jnp.ones(1, jnp.float32),
    )
    out_masked = sgd_batch_update(params, batch, jnp.float32(0.1), jnp.float32(0.01))
    out_single = sgd_batch_update(params, only_first, jnp.float32(0.1), jnp.float32(0.01))
    for a, b in zip(out_masked, out_single):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_epoch_scan_matches_loop():
    """lax.scan epoch == Python loop of batch updates."""
    params = make_params(nu=32, nv=16, dim=8)
    ds = synthetic_ratings(32, 16, 256, seed=2)
    u, v, r, w = ds.to_batches(64)
    batches = tuple(jnp.asarray(x) for x in (u, v, r, w))
    eta, lam = jnp.float32(0.03), jnp.float32(0.005)

    scanned = sgd_epoch(
        jax.tree.map(jnp.copy, params), batches, eta, lam
    )
    looped = params
    for i in range(u.shape[0]):
        b = tuple(jnp.asarray(x[i]) for x in (u, v, r, w))
        looped = sgd_batch_update(looped, b, eta, lam)
    for a, b in zip(scanned, looped):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_convergence_synthetic_vs_oracle():
    """Full training drives test RMSE near the sequential oracle's (SURVEY §7)."""
    nu, nv, n = 200, 100, 20000
    ds = synthetic_ratings(nu, nv, n, rank=4, noise=0.1, seed=3)
    train, test = ds.split(0.2, seed=4)

    cfg = TrainConfig(
        dim=8, iters=8, eta=0.05, lam=0.01, gam=0.3, gb=ds.mean_rating(),
        batch_size=512, seed=0,
    )
    params = train_mf(cfg, train, test_ds=None, log=lambda s: None)
    ours = rmse(params, test)

    # Sequential oracle with the same schedule.
    key = jax.random.PRNGKey(0)
    p0 = init_mf(key, nu, nv, cfg.dim, gb=cfg.gb)
    t = np.asarray(p0.theta); p = np.asarray(p0.phi)
    bu = np.asarray(p0.bu); bv = np.asarray(p0.bv)
    rng = np.random.default_rng(7)
    for it in range(1, cfg.iters + 1):
        perm = rng.permutation(len(train))
        t, p, bu, bv = sgd_sequential(
            t, p, bu, bv, cfg.gb,
            train.u[perm], train.v[perm], train.r[perm],
            cfg.eta_at(it), cfg.lam,
        )
    oracle = oracle_rmse(t, p, bu, bv, cfg.gb, test.u, test.v, test.r)

    assert ours < 0.5, f"training failed to converge: RMSE {ours}"
    assert abs(ours - oracle) < 0.02, f"ours={ours} oracle={oracle}"


def test_predict_logistic():
    params = make_params()
    u = jnp.asarray([0, 1], jnp.int32)
    v = jnp.asarray([0, 1], jnp.int32)
    raw = predict(params, u, v, loss=0)
    sig = predict(params, u, v, loss=1)
    np.testing.assert_allclose(np.asarray(sig), 1 / (1 + np.exp(-np.asarray(raw))), atol=1e-6)


def test_divergence_diagnosis_logged_once():
    """A run that goes non-finite must print ONE actionable diagnosis line
    (the round-3 silent-nan product gap: the packed kernel at eta=0.02 on
    pure-zipf data NaNed with no hint why)."""
    ds = synthetic_ratings(300, 200, 20000, rank=3, noise=0.1, seed=1,
                           zipf=1.4)
    train, test = ds.split(0.2, seed=2)
    cfg = TrainConfig(dim=8, iters=4, eta=30.0, lam=0.01, gam=0.0,
                      gb=ds.mean_rating(), batch_size=4096)
    lines = []
    train_mf(cfg, train, test_ds=test, log=lines.append)
    warns = [l for l in lines if l.startswith("# WARNING: non-finite")]
    assert len(warns) == 1, lines
    assert "Reduce --eta" in warns[0]
