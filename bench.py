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
  (train.loop._pick_mf_runners) selects for that configuration at the
  default CLI hyperparameters, evaluated at the eta of the epoch actually
  running that kernel — never on a kernel the envelope would refuse.

Headline config: ML-10M scale (nu=69878, nv=10677, 10M ratings), rank 64
(BASELINE.json configs[2] shape). "extra" records rank 8 (the small-rank
production path, reporting the kernel + epoch the switch schedule engages)
and the reference-default dim=128 (main.cc:98) on the 256-lane fused kernel.
Counts only REAL ratings (cell padding excluded). Falls back to the XLA
path off-TPU.
"""

import json
import time


def _time_epochs(runner, tables, eta, lam, gb, reps=5):
    import jax.numpy as jnp

    tables = runner.epoch(tables, eta, lam, gb)  # compile + warm
    _ = float(jnp.sum(tables[0]))
    t0 = time.perf_counter()
    for i in range(reps):
        tables = runner.epoch(tables, eta, lam, gb, epoch_idx=i)
    _ = float(jnp.sum(tables[0]))
    return (time.perf_counter() - t0) / reps


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


def _production_number(cfg, ds, params, extra_prefix, extra):
    """Measure the steady-state kernel the production path runs for cfg, at
    the eta of the epoch where it engages. Returns (updates/s, schedule)."""
    from tpu_mf.train.loop import _mf_runner_schedule

    logs = []
    sched = _mf_runner_schedule(cfg, ds, params, logs.append)
    # The steady-state production kernel: the schedule's last phase.
    engage, kernel = sched[-1]
    name = type(kernel).__name__
    if getattr(kernel, "striped", False):
        name += " striped"
    extra[f"{extra_prefix}_kernel"] = name
    if len(sched) > 1:
        extra[f"{extra_prefix}_engaged_epoch"] = engage
    tables = kernel.pad(params)
    dt = _time_epochs(
        kernel, tables, cfg.eta_at(engage), cfg.lam, float(params.gb)
    )
    return kernel.plan.n_real / dt, sched


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
        gb = float(ds.mean_rating())

        # Headline: rank 64, whatever kernel production selects for it.
        cfg64 = TrainConfig(dim=64, iters=15, eta=eta, lam=lam, gb=gb)
        p64 = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, 64, gb=gb)
        ups, _ = _production_number(cfg64, ds, p64, "rank64", extra)
        name = extra["rank64_kernel"]

        # Small-rank production path (slot kernel behind its envelope
        # schedule).
        cfg8 = TrainConfig(dim=8, iters=15, eta=eta, lam=lam, gb=gb)
        p8 = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, 8, gb=gb)
        ups8, sched8 = _production_number(cfg8, ds, p8, "rank8", extra)
        extra["rank8_updates_per_s"] = round(ups8)
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
                    total += n_ep * _time_epochs(
                        r, r.pad(p8), cfg8.eta_at(max(1, ep)), lam, gb,
                        reps=3,
                    )
            extra["rank8_run_weighted_updates_per_s"] = round(
                cfg8.iters * n / total
            )

        # Reference default dim=128: the 256-lane fused kernel.
        cfg128 = TrainConfig(dim=128, iters=15, eta=eta, lam=lam, gb=gb)
        p128 = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, 128, gb=gb)
        ups128, _ = _production_number(cfg128, ds, p128, "dim128", extra)
        extra["dim128_updates_per_s"] = round(ups128)
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
