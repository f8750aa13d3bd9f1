"""TPU sweep: delta-striped slot AdaptReg vs the plain slot kernel.

Round-3 plain slot AdaptReg measured 295M/s calibrated ML-10M rank 8
(4 fused segments). Striping (pallas_sgd_slot.prepare_cells_stripe) broke
the nb >= n_gu*n_gv column floor for slot SGD (+18%) and SGLD (+27% with
the noise ring) — this sweep measures whether the hypergradient kernel
follows (its per-column fixed work is larger: validation gathers ride
every segment step).

Measurement protocol: the tunnel runs slow for the first MINUTES of a
process (not just the first case — two early sweeps both rose
monotonically across cases regardless of config), so this sweep builds +
warms EVERY case first, then runs ROUNDS timing rounds over all cases and
reports the best per case.

Usage: sweep_stripe_adreg.py [CASES...]   (CASE: "plain" or a striped sub)
Default: plain 384 512 640 768 1024.
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

CASES = sys.argv[1:] or ["plain", "384", "512", "640", "768", "1024"]
ROUNDS, REPS = 3, 4

ds = calibrated_ml10m()
train, valid = ds.split(0.05, seed=3)
state = init_admf(jax.random.PRNGKey(0), train.nu, train.nv, 8, lam=0.05,
                  gb=float(train.mean_rating()))
eta, eta_reg = 0.002, 0.01
key = jax.random.PRNGKey(9)

runners = []
for c in CASES:
    kw = (dict(striped=False, sub=None) if c == "plain"
          else dict(striped=True, sub=int(c)))
    name = "plain" if c == "plain" else "strip"
    t_build = time.perf_counter()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = SlotAdRegRunner(
            train, valid, seed=1, dim=8, n_plans=1, balance=True, **kw
        )
    t_build = time.perf_counter() - t_build
    tables = r.pad(state)
    tables = r.epoch(tables, eta, eta_reg, key)  # compile + warm
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
            tables = r.epoch(tables, eta, eta_reg, key, epoch_idx=i)
        _ = float(jnp.sum(tables[0]))
        t0 = time.perf_counter()
        for i in range(REPS):
            tables = r.epoch(tables, eta, eta_reg, key, epoch_idx=i)
        _ = float(jnp.sum(tables[0]))
        c["best"] = min(c["best"], (time.perf_counter() - t0) / REPS)
        c["tables"] = tables

for c in runners:
    r = c["r"]
    fin = bool(jnp.isfinite(jnp.sum(c["tables"][0])))
    plan = r.plan
    print(f"adreg-{c['name']} d8 sub={r.sub:4d}: "
          f"{plan.n_real/c['best']/1e6:7.1f}M/s "
          f"fill={plan.n_real/max(1, plan.u.size):.3f} "
          f"nb={plan.u.shape[0]} finite={fin}", flush=True)
