"""Fused Pallas SGLD kernel vs. the XLA SGLD op (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.dpmf import init_dpmf
from tpu_mf.ops.pallas_sgld import PallasSgldRunner, sgld_pallas_eligible
from tpu_mf.ops.sgld import SgldHyper, sgld_batch_update


def replay_xla(state, plan, hyper, key):
    """Run the XLA SGLD op over the exact batches of a CellPlan.

    Noise in the fused kernel is batch-granular while the gradient applies
    as 8 sequential sub-batches; with temp=0 (the equivalence regime) only
    the gradient granularity matters, so replay per sub-batch.
    """
    for i in range(plan.u.shape[0]):
        for k in range(8):
            w = plan.w[i][:, k]
            gu_off = plan.gu[i] * plan.tile_u
            gv_off = plan.gv[i, k] * plan.tile_v
            ul = np.where(w > 0, plan.u[i][:, k], 0) + gu_off * (w > 0)
            vl = np.where(w > 0, plan.v[i][:, k], 0) + gv_off * (w > 0)
            batch = (
                jnp.asarray(ul.astype(np.int32)),
                jnp.asarray(vl.astype(np.int32)),
                jnp.asarray(plan.r[i][:, k]),
                jnp.asarray(w),
            )
            state = sgld_batch_update(
                state, batch, hyper, jax.random.fold_in(key, i * 8 + k)
            )
    return state


def test_sgld_pallas_matches_xla_with_temp0():
    """temp=0 removes all randomness: both paths must agree closely."""
    ds = synthetic_ratings(300, 200, 4000, rank=3, seed=0)
    state = init_dpmf(jax.random.PRNGKey(0), ds, 8)
    eta, temp, bound = 1e-5, 0.0, 1.0
    ntrain = float(len(ds))

    runner = PallasSgldRunner(
        ds, tile_u=128, tile_v=128, batch=256, seed=1,
        mxu="float32", interpret=True,
    )
    tables = runner.pad(state)
    scal = eta * ntrain * bound * float(state.lambda_r)
    tables = runner.epoch(tables, 0, (eta, temp, bound, scal, float(state.params.gb)), noise_seed=7)
    out = runner.unpack(state, tables)

    hyper = SgldHyper(
        eta=jnp.float32(eta), temp=jnp.float32(temp),
        bound=jnp.float32(bound), ntrain=jnp.float32(ntrain),
    )
    state0 = init_dpmf(jax.random.PRNGKey(0), ds, 8)
    ref = replay_xla(state0, runner.plan, hyper, jax.random.PRNGKey(9))

    np.testing.assert_allclose(
        np.asarray(out.params.theta), np.asarray(ref.params.theta), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.params.phi), np.asarray(ref.params.phi), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.params.bu), np.asarray(ref.params.bu), atol=3e-5
    )
    # counters: the fused kernel stamps at batch granularity, the XLA replay
    # at sub-batch granularity -- last-touch values may differ by < one batch
    du = np.abs(np.asarray(out.gcountu[:-1]) - np.asarray(ref.gcountu[:-1]))
    dv = np.abs(np.asarray(out.gcountv[:-1]) - np.asarray(ref.gcountv[:-1]))
    assert du.max() < 256 and dv.max() < 256
    assert int(out.gcount) == int(ref.gcount) == len(ds)


def test_bits_to_normals_statistics():
    """Box-Muller transform produces standard normals from raw uint32 bits."""
    from tpu_mf.ops.pallas_sgld import bits_to_normals

    rng = np.random.default_rng(0)
    b1 = jnp.asarray(rng.integers(0, 1 << 32, (512, 128), dtype=np.uint32))
    b2 = jnp.asarray(rng.integers(0, 1 << 32, (512, 128), dtype=np.uint32))
    n = np.asarray(bits_to_normals(b1, b2))
    assert np.isfinite(n).all()
    assert n.mean() == pytest.approx(0.0, abs=0.02)
    assert n.var() == pytest.approx(1.0, rel=0.05)
    # symmetric tails
    assert (np.abs(n) > 3).mean() == pytest.approx(0.0027, rel=0.5)


@pytest.mark.skipif(
    __import__("jax").default_backend() == "cpu",
    reason="interpret-mode prng_random_bits is degenerate (returns zeros)",
)
def test_sgld_pallas_noise_statistics():
    """With gradient off, injected noise variance ~= temp*eta*count."""
    nu, nv, dim = 16, 8, 64
    ds = synthetic_ratings(nu, nv, 64, seed=1)
    state = init_dpmf(jax.random.PRNGKey(0), ds, dim)
    temp, eta = 2.0, 1e-3
    runner = PallasSgldRunner(
        ds, tile_u=128, tile_v=128, batch=1024, seed=2,
        mxu="float32", interpret=False,  # compiled: real on-chip PRNG
    )
    tables = runner.pad(state)
    theta_before = np.asarray(tables[0][:, :dim]).copy()
    # scal=0 (no gradient); lambda vectors zeroed (no decay)
    runner.lamvec = jnp.zeros_like(runner.lamvec)
    tables = runner.epoch(tables, 0, (eta, temp, 1.0, 0.0, 3.0), noise_seed=3)
    out = runner.unpack(state, tables)
    diff = np.asarray(out.params.theta) - theta_before[:nu]
    touched = np.unique(ds.u)
    # every touched row gets one draw of variance temp*eta*64 (single batch)
    sel = diff[touched]
    expected = temp * eta * len(ds)
    assert np.var(sel) == pytest.approx(expected, rel=0.4)
    untouched = np.setdiff1d(np.arange(nu), touched)
    if len(untouched):
        assert np.abs(diff[untouched]).max() == 0.0


def test_sgld_eligibility_gate():
    ds = synthetic_ratings(100, 60, 1000, seed=3)
    state = init_dpmf(jax.random.PRNGKey(0), ds, 8)
    assert sgld_pallas_eligible(state, 1000)
    assert sgld_pallas_eligible(state, 1 << 25)  # lo/hi split: > 2^24 OK
    assert not sgld_pallas_eligible(state, 1 << 31)  # int32 state counters
    wide = init_dpmf(jax.random.PRNGKey(0), ds, 128)  # reference default dim
    assert sgld_pallas_eligible(wide, 1000)  # 2-lane-group rows
    big = init_dpmf(jax.random.PRNGKey(0), ds, 252)
    assert not sgld_pallas_eligible(big, 1000)  # dim > 251


def test_sgld_pallas_dim128_matches_xla_with_temp0():
    """Two-lane-group rows (reference default dim=128) match the XLA op."""
    ds = synthetic_ratings(150, 100, 1500, rank=3, seed=4)
    state = init_dpmf(jax.random.PRNGKey(0), ds, 128)
    eta, temp, bound = 1e-5, 0.0, 1.0
    ntrain = float(len(ds))

    runner = PallasSgldRunner(
        ds, tile_u=64, tile_v=64, batch=128, seed=1,
        mxu="float32", interpret=True,
    )
    tables = runner.pad(state)
    scal = eta * ntrain * bound * float(state.lambda_r)
    tables = runner.epoch(
        tables, 0, (eta, temp, bound, scal, float(state.params.gb)),
        noise_seed=7,
    )
    out = runner.unpack(state, tables)

    hyper = SgldHyper(
        eta=jnp.float32(eta), temp=jnp.float32(temp),
        bound=jnp.float32(bound), ntrain=jnp.float32(ntrain),
    )
    state0 = init_dpmf(jax.random.PRNGKey(0), ds, 128)
    ref = replay_xla(state0, runner.plan, hyper, jax.random.PRNGKey(9))

    np.testing.assert_allclose(
        np.asarray(out.params.theta), np.asarray(ref.params.theta), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.params.phi), np.asarray(ref.params.phi), atol=3e-5
    )
    assert int(out.gcount) == int(ref.gcount) == len(ds)


def test_sgld_counter_split_telescopes_past_2_24():
    """Lo/hi split counters stamp exactly at values far beyond 2^24.

    Simulates a huge round: the runner's cum clock is offset by state_gcount
    = 2^26 + 3 (as after ~67M ratings of a >2^24-rating round); touched rows
    must come back stamped to EXACTLY offset + their last-touch position —
    the old single-f32-lane layout loses low bits here (2^26 + small is not
    representable), breaking the noise-variance telescoping.
    """
    from tpu_mf.ops.pallas_sgld import split_count

    base = (1 << 26) + 3
    lo, hi = split_count(np.asarray([base], np.int64))
    assert int(lo[0]) + (int(hi[0]) << 22) == base  # exact encode/decode

    ds = synthetic_ratings(80, 50, 600, rank=2, seed=5)
    state = init_dpmf(jax.random.PRNGKey(0), ds, 8)
    # pretend the round is already base ratings in
    state = state._replace(
        gcountu=jnp.full_like(state.gcountu, base),
        gcountv=jnp.full_like(state.gcountv, base),
        gcount=jnp.int32(base),
    )
    runner = PallasSgldRunner(
        ds, tile_u=64, tile_v=64, batch=128, seed=1,
        mxu="float32", interpret=True,
    )
    tables = runner.pad(state)
    tables = runner.epoch(tables, base, (1e-6, 0.0, 1.0, 0.0, 3.0),
                          noise_seed=11)
    out = runner.unpack(state, tables)

    # exact expected last-touch stamp per row from the plan's batch clock
    w = runner.plan.w
    real_per_batch = w.reshape(w.shape[0], -1).sum(1)
    cum = np.cumsum(real_per_batch).astype(np.int64) + base
    exp_u = np.full(ds.nu, base, np.int64)
    exp_v = np.full(ds.nv, base, np.int64)
    for i in range(w.shape[0]):
        gu_off = runner.plan.gu[i] * runner.plan.tile_u
        for k in range(8):
            gv_off = runner.plan.gv[i, k] * runner.plan.tile_v
            sel = w[i][:, k] > 0
            exp_u[runner.plan.u[i][:, k][sel] + gu_off] = cum[i]
            exp_v[runner.plan.v[i][:, k][sel] + gv_off] = cum[i]
    np.testing.assert_array_equal(np.asarray(out.gcountu[:-1]), exp_u)
    np.testing.assert_array_equal(np.asarray(out.gcountv[:-1]), exp_v)


def test_sgld_plan_rotation():
    """n_plans=2 rotates shuffled plans; counters stay exact across both."""
    ds = synthetic_ratings(120, 80, 2000, rank=3, seed=6)
    state = init_dpmf(jax.random.PRNGKey(0), ds, 8)
    runner = PallasSgldRunner(
        ds, tile_u=64, tile_v=64, batch=128, seed=1,
        mxu="float32", interpret=True, n_plans=2,
    )
    eta, temp, bound = 1e-5, 0.0, 1.0
    scal = eta * len(ds) * bound * float(state.lambda_r)
    hyper = (eta, temp, bound, scal, float(state.params.gb))
    tables = runner.pad(state)
    tables = runner.epoch(tables, 0, hyper, noise_seed=7, epoch_idx=0)
    state = runner.unpack(state, tables)
    tables = runner.pad(state)
    tables = runner.epoch(tables, int(state.gcount), hyper, noise_seed=900,
                          epoch_idx=1)
    state = runner.unpack(state, tables)
    assert int(state.gcount) == 2 * len(ds)
    # every touched row's last stamp falls inside round 2's clock range
    touched = np.unique(ds.u)
    gcu = np.asarray(state.gcountu[:-1])[touched]
    assert (gcu > len(ds)).all() and (gcu <= 2 * len(ds)).all()
    assert not np.array_equal(runner.plans[0].u, runner.plans[1].u)
