"""TPU sweep: delta-striped slot AdaptReg vs the plain slot kernel.

Round-3 plain slot AdaptReg measured 295M/s calibrated ML-10M rank 8
(4 fused segments). Striping (pallas_sgd_slot.prepare_cells_stripe) broke
the nb >= n_gu*n_gv column floor for slot SGD (+18%) and SGLD (+27% with
the noise ring) — this sweep measures whether the hypergradient kernel
follows (its per-column fixed work is larger: validation gathers ride
every segment step).

Usage: sweep_stripe_adreg.py [CASES...]   (CASE: "plain" or a striped sub)
Default: plain 384 512 640.
"""
import sys
import time
import warnings

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bench import calibrated_ml10m
from tpu_mf.models.admf import init_admf
from tpu_mf.ops.pallas_adreg_slot import SlotAdRegRunner

CASES = sys.argv[1:] or ["plain", "384", "512", "640"]

ds = calibrated_ml10m()
train, valid = ds.split(0.05, seed=3)
state = init_admf(jax.random.PRNGKey(0), train.nu, train.nv, 8, lam=0.05,
                  gb=float(train.mean_rating()))
eta, eta_reg = 0.002, 0.01

# First measured case in a fresh process runs ~3x slow through the tunnel
# (time-based warmup); sacrifice a copy of the first case.
CASES = CASES[:1] + CASES
for ci, c in enumerate(CASES):
    kw = (dict(striped=False, sub=None) if c == "plain"
          else dict(striped=True, sub=int(c)))
    name = "WARM " if ci == 0 else ("plain" if c == "plain" else "strip")
    try:
        t_build = time.perf_counter()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r = SlotAdRegRunner(
                train, valid, seed=1, dim=8, n_plans=1, balance=True, **kw
            )
        t_build = time.perf_counter() - t_build
        tables = r.pad(state)
        key = jax.random.PRNGKey(9)
        tables = r.epoch(tables, eta, eta_reg, key)
        _ = float(jnp.sum(tables[0]))
        t0 = time.perf_counter()
        reps = 5
        for i in range(reps):
            tables = r.epoch(tables, eta, eta_reg, key, epoch_idx=i)
        fin = bool(jnp.isfinite(jnp.sum(tables[0])))
        dt = (time.perf_counter() - t0) / reps
        plan = r.plan
        nb = plan.u.shape[0]
        print(f"adreg-{name} d8 sub={r.sub:4d}: "
              f"{plan.n_real/dt/1e6:7.1f}M/s "
              f"fill={plan.n_real/max(1, plan.u.size):.3f} "
              f"nb={nb} finite={fin} build={t_build:.0f}s", flush=True)
        del r, tables
    except Exception as e:
        import traceback

        traceback.print_exc()
        print(f"{name} {c}: FAILED {e}", flush=True)
