"""TPU sweep: slot-major SGLD kernel (pallas_sgld_slot) geometries.

Measures epoch throughput on the CALIBRATED ML-10M stand-in (bench.py's
Zipf-Mandelbrot marginals) at rank 8, sweeping sub and balance — the SGD
slot kernel gained 257.8 -> 378.2M/s from LPT balance on these marginals;
the round-3 213M/s SGLD number predates it.

Usage: sweep_sgld_slot.py [SUBS...] (default 256 384 448 512)
"""
import sys, time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import calibrated_ml10m
from tpu_mf.models.dpmf import init_dpmf
from tpu_mf.ops.pallas_sgld_slot import SlotSgldRunner

SUBS = [int(a) for a in sys.argv[1:]] or [256, 384, 448, 512]

ds = calibrated_ml10m()
state = init_dpmf(jax.random.PRNGKey(0), ds, 8, gb=float(ds.mean_rating()))
ntrain = len(ds)
# Throughput-sweep hypers in the stable envelope (run_configs.py derivation).
eta = 0.05 / (ntrain * 100.0)
temp, bound = 1e-11, 1.0
scal = eta * ntrain * bound * float(state.lambda_r)
gb = float(state.params.gb)

for balance in (True, False):
    for sub in SUBS:
        try:
            t_build = time.perf_counter()
            runner = SlotSgldRunner(ds, sub=sub, seed=1, dim=8, n_plans=1,
                                    balance=balance)
            t_build = time.perf_counter() - t_build
            ok = runner.envelope_ok(scal)
            runner.set_lambdas(state)
            tables = runner.pad(state)
            hyper = (eta, temp, bound, scal, gb)
            tables = runner.epoch(tables, 0, hyper, noise_seed=1)
            _ = float(jnp.sum(tables[0]))
            t0 = time.perf_counter(); reps = 5
            for i in range(reps):
                tables = runner.epoch(tables, 0, hyper,
                                      noise_seed=1 + i * runner.seed_stride)
            _ = float(jnp.sum(tables[0]))
            dt = (time.perf_counter() - t0) / reps
            plan = runner.plan
            n_slots = plan.u.shape[0] * plan.u.shape[1] * plan.u.shape[2] \
                if plan.u.ndim == 3 else plan.u.size
            print(f"sgld-slot d8 sub={sub} bal={int(balance)}: "
                  f"{plan.n_real/dt/1e6:7.1f}M/s "
                  f"fill={plan.n_real/max(1,n_slots):.3f} "
                  f"nb={plan.u.shape[0]} env_ok={ok} build={t_build:.0f}s",
                  flush=True)
            del runner, tables
        except Exception as e:
            import traceback; traceback.print_exc()
            print(f"sub={sub} bal={balance}: FAILED {e}", flush=True)
