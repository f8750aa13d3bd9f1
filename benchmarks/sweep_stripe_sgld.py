"""TPU sweep: delta-striped slot SGLD vs the plain slot SGLD kernel.

Round-3 best (plain slot, balance+saturate, sub 320): 257M/s calibrated
ML-10M rank 8; the noise-stubbed ceiling was 321M/s at sub 384. Striping
(pallas_sgd_slot.prepare_cells_stripe) raised slot SGD +18% on the same
marginals by breaking the nb >= n_gu*n_gv floor and growing sub into the
MXU's flat-in-M regime — this sweep measures whether SGLD follows.

Usage: sweep_stripe_sgld.py [CASES...]
Each CASE is "sub" (striped, noise ring), "sub:prng" (striped, in-kernel
Box-Muller), "plain" / "plain:prng" (un-striped at auto-ish sub 320).
Default: plain:prng plain 256 384 512 — one run covers both the VERDICT-#7
noise-ring delta and the striping delta.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

from bench import calibrated_ml10m
from tpu_mf.models.dpmf import init_dpmf
from tpu_mf.ops.pallas_sgld_slot import SlotSgldRunner

CASES = sys.argv[1:] or ["plain:prng", "plain", "256", "384", "512"]

ds = calibrated_ml10m()
state = init_dpmf(jax.random.PRNGKey(0), ds, 8, gb=float(ds.mean_rating()))
ntrain = len(ds)
eta = 0.05 / (ntrain * 100.0)
temp, bound = 1e-11, 1.0
scal = eta * ntrain * bound * float(state.lambda_r)
gb = float(state.params.gb)

# The first measured case in a fresh process runs ~3x slow through the
# TPU tunnel even after its own warm epoch (time-based, not compile);
# prepend a sacrificial copy of the first case and discard its number.
CASES = CASES[:1] + CASES
cases = []
for c in CASES:
    base, _, tag = c.partition(":")
    ring = tag != "prng"
    kw = dict(noise_ring=ring)
    if base == "plain":
        kw.update(striped=False, sub=320)
        name = "plain"
    else:
        kw.update(striped=True, sub=int(base))
        name = "strip"
    cases.append((name + ("+ring" if ring else "+prng"), kw))
cases[0] = ("WARMUP(discard)", cases[0][1])
for name, kw in cases:
    try:
        t_build = time.perf_counter()
        runner = SlotSgldRunner(ds, seed=1, dim=8, n_plans=1, balance=True,
                                saturate=True, **kw)
        t_build = time.perf_counter() - t_build
        runner.set_lambdas(state)
        tables = runner.pad(state)
        hyper = (eta, temp, bound, scal, gb)
        tables = runner.epoch(tables, 0, hyper, noise_seed=1)
        _ = float(jnp.sum(tables[0]))
        t0 = time.perf_counter(); reps = 5
        for i in range(reps):
            tables = runner.epoch(tables, 0, hyper,
                                  noise_seed=1 + i * runner.seed_stride)
        fin = bool(jnp.isfinite(jnp.sum(tables[0])))
        dt = (time.perf_counter() - t0) / reps
        plan = runner.plan
        print(f"sgld-{name} d8 sub={runner.sub}: "
              f"{plan.n_real/dt/1e6:7.1f}M/s "
              f"fill={plan.n_real/max(1, plan.u.size):.3f} "
              f"nb={plan.u.shape[0]} finite={fin} build={t_build:.0f}s",
              flush=True)
        del runner, tables
    except Exception as e:
        import traceback; traceback.print_exc()
        print(f"{name} {kw}: FAILED {e}", flush=True)
