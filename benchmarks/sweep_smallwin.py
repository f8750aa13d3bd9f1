"""TPU check: does the small-window slot kernel beat packed at warm eta?

The round-4 schedule (train/loop._mf_runner_schedule) engages a SMALLER-sub
slot plan at the first epoch whose eta clears its shrunken window envelope
(sub*P slots per column), displacing the packed kernel for the middle
epochs. This sweep validates that the displaced epochs actually get faster:
it times the packed production kernel against slot plans at the probe subs,
EACH AT THE ETA OF THE EPOCH THE SCHEDULE RUNS IT (group pick included —
warm etas force more-sequential apply groupings, which cost).

Usage: sweep_smallwin.py [SUBS...]   (default: packed + slot 64/128/256)
"""
import sys
import time
import warnings

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from tpu_mf.config import TrainConfig
from tpu_mf.models.mf import init_mf
from tpu_mf.ops.pallas_sgd_packed import PackedEpochRunner
from tpu_mf.ops.pallas_sgd_slot import SlotEpochRunner

DIM = 8
ETA0, LAM = 2e-2, 5e-3
ROUNDS, REPS = 3, 4
SUBS = [int(s) for s in sys.argv[1:]] or [64, 128, 256]


def main():
    from bench import calibrated_ml10m

    ds = calibrated_ml10m()
    cfg = TrainConfig(dim=DIM, iters=15, eta=ETA0, lam=LAM)
    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, DIM,
                     gb=ds.mean_rating())
    gb = float(params.gb)

    cases = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = PackedEpochRunner(ds, batch=8192, seed=1, n_plans=2, dim=DIM,
                              saturate=True)
        cases.append(("packed B8192 @e1", r, cfg.eta_at(1)))
        for sub in SUBS:
            r = SlotEpochRunner(ds, seed=1, n_plans=2, dim=DIM, sub=sub,
                                balance=True, saturate=True)
            # first epoch whose eta clears this plan's envelope
            e = next((it for it in range(1, cfg.iters + 1)
                      if r.envelope_ok(cfg.eta_at(it))), cfg.iters)
            eta = cfg.eta_at(e)
            g = r.pick_theta_groups(eta), r.pick_phi_groups(eta)
            cases.append((f"slot s{sub} @e{e} g{g[0]}/{g[1]}", r, eta))

    st = []
    for name, r, eta in cases:
        tables = r.epoch(r.pad(params), eta, LAM, gb, epoch_idx=0)
        _ = float(jnp.sum(tables[0]))
        fill = r.plan.n_real / r.n_slots
        print(f"built {name}: nb={r.plan.u.shape[0]} fill={fill:.3f}",
              flush=True)
        st.append(dict(name=name, r=r, eta=eta, tables=tables,
                       best=float("inf")))

    for _rnd in range(ROUNDS):
        for c in st:
            tables, r = c["tables"], c["r"]
            for i in range(2):  # untimed rewarm after the kernel switch
                tables = r.epoch(tables, c["eta"], LAM, gb, epoch_idx=i)
            _ = float(jnp.sum(tables[0]))
            t0 = time.perf_counter()
            for i in range(REPS):
                tables = r.epoch(tables, c["eta"], LAM, gb, epoch_idx=i)
            _ = float(jnp.sum(tables[0]))
            c["best"] = min(c["best"],
                            (time.perf_counter() - t0) / REPS)
            c["tables"] = tables

    for c in st:
        rate = c["r"].plan.n_real / c["best"]
        fin = bool(jnp.isfinite(jnp.sum(c["tables"][0])))
        print(f"{c['name']:34s}: {rate / 1e6:8.1f}M/s  finite={fin}")


if __name__ == "__main__":
    main()
