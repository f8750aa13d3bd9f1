"""TPU sweep: delta-striped slot SGLD vs the plain slot SGLD kernel.

Round-3 best (plain slot, balance+saturate, sub 320): 257M/s calibrated
ML-10M rank 8; the noise-stubbed ceiling was 321M/s at sub 384. Striping
(pallas_sgd_slot.prepare_cells_stripe) raised slot SGD +18% on the same
marginals by breaking the nb >= n_gu*n_gv floor and growing sub into the
MXU's flat-in-M regime — this sweep measures whether SGLD follows, and
the VMEM noise ring vs the in-kernel Box-Muller PRNG.

Measurement protocol: the tunnel runs slow for the first MINUTES of a
process, so build + warm EVERY case first, then run ROUNDS timing rounds
over all cases and report the best per case.

Usage: sweep_stripe_sgld.py [CASES...]
Each CASE is "sub" (striped, noise ring), "sub:prng" (striped, in-kernel
Box-Muller), "plain" / "plain:prng" (un-striped at auto-ish sub 320).
Default: plain:prng plain 384 512 640.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bench import calibrated_ml10m
from tpu_mf.models.dpmf import init_dpmf
from tpu_mf.ops.pallas_sgld_slot import SlotSgldRunner

CASES = sys.argv[1:] or ["plain:prng", "plain", "384", "512", "640"]
ROUNDS, REPS = 3, 4

ds = calibrated_ml10m()
state = init_dpmf(jax.random.PRNGKey(0), ds, 8, gb=float(ds.mean_rating()))
ntrain = len(ds)
eta = 0.05 / (ntrain * 100.0)
temp, bound = 1e-11, 1.0
scal = eta * ntrain * bound * float(state.lambda_r)
gb = float(state.params.gb)
hyper = (eta, temp, bound, scal, gb)

runners = []
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
    name += "+ring" if ring else "+prng"
    t_build = time.perf_counter()
    r = SlotSgldRunner(ds, seed=1, dim=8, n_plans=1, balance=True,
                       saturate=True, **kw)
    t_build = time.perf_counter() - t_build
    r.set_lambdas(state)
    tables = r.pad(state)
    tables = r.epoch(tables, 0, hyper, noise_seed=1)  # compile + warm
    _ = float(jnp.sum(tables[0]))
    print(f"built {name} sub={r.sub} ({t_build:.0f}s)", flush=True)
    # epoch() donates its table operands: keep the live buffers in a dict.
    runners.append(dict(name=name, r=r, tables=tables, best=float("inf")))

for rnd in range(ROUNDS):
    for c in runners:
        r, tables = c["r"], c["tables"]
        # 2 untimed epochs after the kernel switch (production runs the
        # same kernel for consecutive epochs; the switch isn't the kernel).
        for i in range(2):
            tables = r.epoch(tables, 0, hyper, noise_seed=3 + i)
        _ = float(jnp.sum(tables[0]))
        t0 = time.perf_counter()
        for i in range(REPS):
            tables = r.epoch(tables, 0, hyper,
                             noise_seed=1 + i * r.seed_stride)
        _ = float(jnp.sum(tables[0]))
        c["best"] = min(c["best"], (time.perf_counter() - t0) / REPS)
        c["tables"] = tables

for c in runners:
    r = c["r"]
    fin = bool(jnp.isfinite(jnp.sum(c["tables"][0])))
    plan = r.plan
    print(f"sgld-{c['name']} d8 sub={r.sub:4d}: "
          f"{plan.n_real/c['best']/1e6:7.1f}M/s "
          f"fill={plan.n_real/max(1, plan.u.size):.3f} "
          f"nb={plan.u.shape[0]} finite={fin}", flush=True)
