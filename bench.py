"""Headline benchmark: rating updates/sec/chip for the fused SGD epoch kernels.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

vs_baseline measures against the BASELINE.json north-star target of 1e9
rating updates/sec/chip on TPU v5e (the reference publishes no numbers of its
own — BASELINE.md).

Honesty rules (round-3 VERDICT #3):
* Data is the CALIBRATED ML-10M stand-in (Zipf-Mandelbrot heads matched to
  the real dataset: top item ~0.36%, top user ~0.07% of ratings —
  benchmarks/ML10M_STUDY.md), not uniform marginals.
* Every number reported is measured on the kernel the PRODUCTION path
  (train.loop._mf_runner_schedule) selects for that configuration at the
  default CLI hyperparameters, evaluated at the eta of the epoch actually
  running that kernel — never on a kernel the envelope would refuse.
* Timing protocol (round 4): the tunneled chip runs ~3x slow for the
  first minutes of a process, so every kernel is built+warmed first, then
  timed over 3 interleaved rounds with 2 untimed epochs after each kernel
  switch, keeping each kernel's best round (_run_tasks).

Headline config: ML-10M scale (nu=69878, nv=10677, 10M ratings), rank 64
(BASELINE.json configs[2] shape). "extra" records rank 8 (the small-rank
production path, reporting the kernel + epoch the switch schedule engages)
and the reference-default dim=128 (main.cc:98). At this shape the schedule
selects the dense-cell kernel (ops/pallas_sgd_dense.py) from its
A/B-calibrated engagement epoch (1 at dims 64/128; later at dim 8).
Counts only REAL ratings (cell padding excluded). Falls back to the XLA
path off-TPU.
"""

import json
import time


def calibrated_ds(nu, nv, n, seed=0):
    """Zipf-Mandelbrot stand-in at any shape, with the gate-matched
    calibration (benchmarks/ML10M_STUDY.md).

    Disk-cached (~/.cache/tpu_mf/data): generation is ~3 CPU-min per 10M
    ratings on a 1-core host and every benchmark sweep starts here."""
    import os

    import numpy as np

    from tpu_mf.data.coo import RatingsCOO, synthetic_ratings

    cache = os.path.expanduser(
        f"~/.cache/tpu_mf/data/cal.{nu}.{nv}.{n}.{seed}.npz"
    )
    if os.path.exists(cache):
        z = np.load(cache)
        return RatingsCOO(u=z["u"], v=z["v"], r=z["r"], nu=nu, nv=nv)
    ds = synthetic_ratings(
        nu, nv, n, rank=8, seed=seed,
        noise=0.76, signal=1.0, bias_std=0.38,
        zipf=1.0, zipf_q=50.0, zipf_u=1.0, zipf_uq=250.0,
    )
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    tmp = cache + ".tmp.npz"
    np.savez(tmp, u=ds.u, v=ds.v, r=ds.r)
    os.replace(tmp, cache)
    return ds


def calibrated_ml10m(n=10_000_000, seed=0):
    """ML-10M-shaped calibrated stand-in (see calibrated_ds)."""
    return calibrated_ds(69_878, 10_677, n, seed)


def calibrated_unique(nu=69_878, nv=10_677, n=10_000_000, seed=0):
    """Unique-pair variant of the calibrated stand-in: the real ML-10M (a
    user rates a movie once) has NO duplicate (u, v) pairs, while sampling
    the Zipf-Mandelbrot marginals with replacement makes ~17% of ratings
    duplicates at 10M. Oversample 1.3x, keep first occurrences, trim to n.
    This is the dataset class whose dense-cell plan runs W-less (counts
    derived on-chip; ops/pallas_sgd_dense.DensePlan.wless)."""
    import os

    import numpy as np

    from tpu_mf.data.coo import RatingsCOO

    cache = os.path.expanduser(
        f"~/.cache/tpu_mf/data/caluq.{nu}.{nv}.{n}.{seed}.npz"
    )
    if os.path.exists(cache):
        z = np.load(cache)
        return RatingsCOO(u=z["u"], v=z["v"], r=z["r"], nu=nu, nv=nv)
    ds = calibrated_ds(nu, nv, int(n * 1.3), seed)
    key = ds.u.astype(np.int64) * nv + ds.v
    _, first = np.unique(key, return_index=True)
    first.sort()
    first = first[:n]
    assert len(first) == n, (len(first), n)
    u, v, r = ds.u[first], ds.v[first], ds.r[first]
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    tmp = cache + ".tmp.npz"
    np.savez(tmp, u=u, v=v, r=r)
    os.replace(tmp, cache)
    return RatingsCOO(u=u, v=v, r=r, nu=nu, nv=nv)


def _kernel_name(kernel):
    name = type(kernel).__name__
    if getattr(kernel, "striped", False):
        name += " striped"
    if getattr(kernel, "use_wless", False) and getattr(
            getattr(kernel, "plan", None), "wless", False):
        name += " wless"
    return name


class _Task:
    """One timed kernel: build + warm first, time later (see _run_tasks)."""

    def __init__(self, label, step, tables, n_real):
        self.label, self.step, self.tables, self.n_real = (
            label, step, tables, n_real)
        self.best = float("inf")
        self.round_times = []  # per-round avg epoch seconds (variance)


def _run_tasks(tasks, rounds=3, reps=4):
    """Best per-epoch time per task, interleaved rounds with rewarm.

    The tunneled chip runs ~3x slow for the first minutes of a process and
    kernel switches cost ~5-10% (CLAUDE.md): warm every task once
    (compile), then per round run 2 untimed epochs after the switch and
    time `reps`; keep each task's best round. Every round's reading is
    kept on the task (round_times) so callers can report spread — the
    round-4 headline drop was undecidable without it (VERDICT r4 #4)."""
    import jax.numpy as jnp

    for t in tasks:
        t.tables = t.step(t.tables, 0)  # compile + warm
        _ = float(jnp.sum(t.tables[0]))
    for _rnd in range(rounds):
        for t in tasks:
            tables = t.tables
            for i in range(2):
                tables = t.step(tables, i)
            _ = float(jnp.sum(tables[0]))
            t0 = time.perf_counter()
            for i in range(reps):
                tables = t.step(tables, i)
            _ = float(jnp.sum(tables[0]))
            t.round_times.append((time.perf_counter() - t0) / reps)
            t.best = min(t.best, t.round_times[-1])
            t.tables = tables
    return {t.label: t.n_real / t.best for t in tasks}


def _spread(tasks):
    """Per-task timing spread across rounds: (max-min)/min in percent."""
    out = {}
    for t in tasks:
        rt = sorted(t.round_times)
        if rt:
            out[t.label] = {
                "best_s": round(rt[0], 4),
                "median_s": round(rt[len(rt) // 2], 4),
                "spread_pct": round((rt[-1] - rt[0]) / rt[0] * 100, 1),
            }
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpu_mf.config import TrainConfig
    from tpu_mf.models.mf import init_mf

    ds = calibrated_ml10m()
    n = len(ds)
    eta, lam = 2e-2, 5e-3  # reference defaults (main.cc:97-105)

    on_tpu = jax.default_backend() != "cpu"
    extra = {}
    if on_tpu:
        from tpu_mf.train.loop import _mf_runner_schedule

        gb = float(ds.mean_rating())
        tasks = []

        def mf_step(r, eta_at):
            def step(tables, i):
                return r.epoch(tables, eta_at, lam, gb, epoch_idx=i)
            return step

        # MF configs: rank 64 (headline), rank 8 (small-rank slot path,
        # every schedule phase for the whole-run weighting), dim 128
        # (reference CLI default, 256-lane rows).
        scheds = {}
        dense_devs = {}
        for key, dim in (("rank64", 64), ("rank8", 8), ("dim128", 128)):
            cfg = TrainConfig(dim=dim, iters=15, eta=eta, lam=lam, gb=gb)
            p = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, dim, gb=gb)
            sched = _mf_runner_schedule(cfg, ds, p, lambda *_: None)
            scheds[key] = (cfg, sched)
            engage, kernel = sched[-1]
            extra[f"{key}_kernel"] = _kernel_name(kernel)
            if len(sched) > 1:
                extra[f"{key}_engaged_epoch"] = engage
            phases = sched if key == "rank8" else sched[-1:]
            for ep, r in phases:
                if type(r).__name__ == "DenseEpochRunner":
                    # the dense cell matrices are dim-independent: share
                    # one device copy across the three MF configs (4.5 GB
                    # each; three copies would crowd the 16 GB chip)
                    kd = (r.plan.n_gu, r.plan.n_gvp, r.tile_u, r.tile_v,
                          str(r.dtype))
                    if kd in dense_devs:
                        r._dev = dense_devs[kd]
                    else:
                        dense_devs[kd] = r.dev
                tasks.append(_Task(
                    f"{key}@{ep}", mf_step(r, cfg.eta_at(max(1, ep))),
                    r.pad(p), r.plan.n_real,
                ))

        # Unique-pairs variant (the real ML-10M has unique (u, v) pairs;
        # the calibrated sampler's ~17% duplicate pairs are an artifact):
        # tracks the production path on the more-faithful stand-in.
        uds = calibrated_unique()
        gbu = float(uds.mean_rating())
        cfgu = TrainConfig(dim=64, iters=15, eta=eta, lam=lam, gb=gbu)
        pu_ = init_mf(jax.random.PRNGKey(0), uds.nu, uds.nv, 64, gb=gbu)
        schedu = _mf_runner_schedule(cfgu, uds, pu_, lambda *_: None)
        epu, ru = schedu[-1]
        extra["rank64_unique_kernel"] = _kernel_name(ru)
        tasks.append(_Task(
            "rank64uq", mf_step(ru, cfgu.eta_at(max(1, epu))),
            ru.pad(pu_), ru.plan.n_real,
        ))

        # DP-SGLD and AdaptReg production kernels at rank 8 (the loop.py
        # single-chip selections: slot-major, striped, saturated; SGLD
        # with the VMEM noise ring).
        from tpu_mf.models.admf import init_admf
        from tpu_mf.models.dpmf import init_dpmf
        from tpu_mf.ops.pallas_adreg_slot import SlotAdRegRunner
        from tpu_mf.ops.pallas_sgld_slot import SlotSgldRunner

        dstate = init_dpmf(jax.random.PRNGKey(0), ds, 8, gb=gb)
        sgld_eta = 0.05 / (n * 100.0)
        scal = sgld_eta * n * 1.0 * float(dstate.lambda_r)
        hyper = (sgld_eta, 1e-11, 1.0, scal, gb)
        sgld_r = SlotSgldRunner(ds, seed=0, dim=8, n_plans=1, balance=True,
                                saturate=True, striped=True)
        sgld_r.set_lambdas(dstate)
        tasks.append(_Task(
            "sgld",
            lambda tables, i: sgld_r.epoch(
                tables, 0, hyper, noise_seed=1 + i * sgld_r.seed_stride),
            sgld_r.pad(dstate), sgld_r.plan.n_real,
        ))

        atrain, avalid = ds.split(0.05, seed=3)
        astate = init_admf(jax.random.PRNGKey(0), atrain.nu, atrain.nv, 8,
                           lam=0.05, gb=gb)
        adreg_r = SlotAdRegRunner(atrain, avalid, seed=0, dim=8, n_plans=1,
                                  balance=True, striped=True)
        akey = jax.random.PRNGKey(9)
        tasks.append(_Task(
            "adreg",
            lambda tables, i: adreg_r.epoch(
                tables, 0.002, 0.01, akey, epoch_idx=i),
            adreg_r.pad(astate), adreg_r.plan.n_real,
        ))

        # Reference-default-shape dpmf/admf (round-4 VERDICT #7:
        # BASELINE.json configs[2] is a rank-64 SGLD config; only rank-8
        # slot paths were tracked): the gen-1 kernels the production
        # loops select at dim 64 (loop.py fallbacks, tile 512).
        from tpu_mf.ops.pallas_adreg import PallasAdRegRunner
        from tpu_mf.ops.pallas_sgld import PallasSgldRunner

        dstate64 = init_dpmf(jax.random.PRNGKey(0), ds, 64, gb=gb)
        scal64 = sgld_eta * n * 1.0 * float(dstate64.lambda_r)
        hyper64 = (sgld_eta, 1e-11, 1.0, scal64, gb)
        sgld64_r = PallasSgldRunner(ds, tile_u=512, tile_v=512,
                                    batch=8192, seed=0, n_plans=1)
        sgld64_r.set_lambdas(dstate64)
        tasks.append(_Task(
            "sgld64",
            lambda tables, i: sgld64_r.epoch(
                tables, 0, hyper64,
                noise_seed=1 + i * sgld64_r.seed_stride),
            sgld64_r.pad(dstate64), sgld64_r.plan.n_real,
        ))

        astate64 = init_admf(jax.random.PRNGKey(0), atrain.nu, atrain.nv,
                             64, lam=0.05, gb=gb)
        adreg64_r = PallasAdRegRunner(atrain, avalid, tile_u=512,
                                      tile_v=512, batch=4096, seed=0,
                                      n_plans=1)
        tasks.append(_Task(
            "adreg64",
            lambda tables, i: adreg64_r.epoch(
                tables, 0.002, 0.01, akey, epoch_idx=i),
            adreg64_r.pad(astate64), adreg64_r.plan.n_real,
        ))

        # Yahoo-shape catalog (round-4 VERDICT #3: the item-sharded fused
        # path had never been TPU-timed): nu/nv from the reference's own
        # Yahoo config (src/run.py:6-9) at a 20M-rating cached stand-in —
        # density is ~12x below the real 250M-rating Yahoo, so this EXTRA
        # tracks the phi-sharded kernel's regression, not the headline
        # (benchmarks/bench_yahoo.py measures at 100M).
        from tpu_mf.ops.phi_shard import PhiShardedRunner

        yds = calibrated_ds(1_000_990, 624_961, 20_000_000, seed=11)
        y_r = PhiShardedRunner(yds, dim=8, seed=3, n_plans=1, saturate=True)
        yp = init_mf(jax.random.PRNGKey(0), yds.nu, yds.nv, 8,
                     gb=yds.mean_rating())
        tasks.append(_Task(
            "yahoo",
            lambda tables, i: y_r.epoch(
                tables, eta, lam, float(yp.gb), epoch_idx=i),
            y_r.pad(yp), len(yds),
        ))

        rates = _run_tasks(tasks)
        ups = rates[f"rank64@{scheds['rank64'][1][-1][0]}"]
        name = extra["rank64_kernel"]
        cfg8, sched8 = scheds["rank8"]
        extra["rank8_updates_per_s"] = round(
            rates[f"rank8@{sched8[-1][0]}"]
        )
        # Whole-run honesty (round-3 VERDICT weak #2): the steady-state
        # number engages at the last phase's epoch; a default 15-epoch run
        # spends the earlier epochs on the slower phases. Report the
        # epoch-weighted run average over the full schedule too.
        if len(sched8) > 1:
            bounds = [ep for ep, _ in sched8[1:]] + [cfg8.iters + 1]
            total = 0.0
            for (ep, r), nxt in zip(sched8, bounds):
                n_ep = min(cfg8.iters + 1, nxt) - max(1, ep)
                if n_ep > 0:
                    total += n_ep * r.plan.n_real / rates[f"rank8@{ep}"]
            extra["rank8_run_weighted_updates_per_s"] = round(
                cfg8.iters * n / total
            )
        extra["dim128_updates_per_s"] = round(
            rates[f"dim128@{scheds['dim128'][1][-1][0]}"]
        )
        extra["rank64_unique_updates_per_s"] = round(rates["rank64uq"])
        extra["sgld_updates_per_s"] = round(rates["sgld"])
        extra["adreg_updates_per_s"] = round(rates["adreg"])
        extra["sgld_rank64_updates_per_s"] = round(rates["sgld64"])
        extra["adreg_rank64_updates_per_s"] = round(rates["adreg64"])
        extra["yahoo_updates_per_s"] = round(rates["yahoo"])
        extra["timing"] = _spread(tasks)
    else:
        from tpu_mf.models.mf import init_mf as _init
        from tpu_mf.ops.sgd import sgd_epoch

        params = _init(jax.random.PRNGKey(0), ds.nu, ds.nv, 64,
                       gb=ds.mean_rating())
        u, v, r, w = ds.to_batches(4096, shuffle_seed=1)
        batches = tuple(jnp.asarray(x) for x in (u, v, r, w))
        params = sgd_epoch(params, batches, jnp.float32(eta), jnp.float32(lam))
        _ = float(jnp.sum(params.theta))
        reps = 2
        t0 = time.perf_counter()
        for _i in range(reps):
            params = sgd_epoch(
                params, batches, jnp.float32(eta), jnp.float32(lam)
            )
        _ = float(jnp.sum(params.theta))
        dt = (time.perf_counter() - t0) / reps
        ups = n / dt
        name = "xla-cpu-fallback"

    out = {
        "metric": (
            "rating updates/sec/chip (calibrated ML-10M scale, rank 64, "
            f"{name})"
        ),
        "value": round(ups),
        "unit": "updates/s",
        "vs_baseline": round(ups / 1e9, 4),
    }
    if extra:
        out["extra"] = extra
    print(json.dumps(out))


if __name__ == "__main__":
    main()
