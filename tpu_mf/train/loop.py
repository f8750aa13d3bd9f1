"""Training orchestrators — one per algorithm, like the reference's run() overloads.

Reference: src/main.cc:36-93. Each orchestrator initializes the model
(optionally warm-starting from a checkpoint), loads the test set, and runs the
epoch loop, printing the reference's per-epoch line:

    iter#<n>\t<elapsed>\ttRMSE=<rmse>          (reference: src/mf.h:35)

The TBB pipeline (read -> parse -> update, reference src/mf.h:6-70) becomes:
host-side batch preparation + device scan (tpu_mf.ops.sgd.sgd_epoch).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_mf.config import TrainConfig
from tpu_mf.data.coo import RatingsCOO, epoch_batches
from tpu_mf.models.mf import MFParams, init_mf, rmse
from tpu_mf.ops.sgd import sgd_epoch


def train_mf(
    cfg: TrainConfig,
    train_ds: RatingsCOO,
    test_ds: Optional[RatingsCOO] = None,
    params: Optional[MFParams] = None,
    log: Callable[[str], None] = print,
    device_shuffle: bool = True,
) -> MFParams:
    """Vanilla biased-MF SGD training (reference: run(MF&), src/main.cc:36-52).

    Per epoch: reshuffle ratings, scan the batched SGD update, decay the
    learning rate as eta0/round**gam (reference: model.cc:36-38), and report
    test RMSE in the reference's format.
    """
    nu, nv = train_ds.nu, train_ds.nv
    if params is None:
        key = jax.random.PRNGKey(cfg.seed)
        params = init_mf(key, nu, nv, cfg.dim, gb=cfg.gb, dtype=jnp.dtype(cfg.dtype))

    # Static batch layout; per-epoch shuffle permutes within it on device.
    u, v, r, w = train_ds.to_batches(cfg.batch_size)
    nb, bsz = u.shape
    flat = (
        jnp.asarray(u.reshape(-1)),
        jnp.asarray(v.reshape(-1)),
        jnp.asarray(r.reshape(-1)),
        jnp.asarray(w.reshape(-1)),
    )

    @jax.jit
    def shuffle(key, fu, fv, fr, fw):
        p = jax.random.permutation(key, fu.shape[0])
        return tuple(x[p].reshape(nb, bsz) for x in (fu, fv, fr, fw))

    t0 = time.perf_counter()
    for it in range(1, cfg.iters + 1):
        eta_r = jnp.float32(cfg.eta_at(it))
        lam = jnp.float32(cfg.lam)
        if device_shuffle:
            kshuf = jax.random.fold_in(jax.random.PRNGKey(cfg.seed ^ 0x5F5E), it)
            batches = shuffle(kshuf, *flat)
        else:
            eu, ev, er, ew = epoch_batches(train_ds, cfg.batch_size, it, cfg.seed)
            batches = tuple(jnp.asarray(x) for x in (eu, ev, er, ew))
        params = sgd_epoch(params, batches, eta_r, lam)
        jax.block_until_ready(params.theta)
        elapsed = time.perf_counter() - t0
        if test_ds is not None:
            t_rmse = rmse(params, test_ds)
            # Reference prints cumulative elapsed time (src/mf.h:33-35).
            log(f"iter#{it}\t{elapsed:f}\ttRMSE={t_rmse:f}")
        else:
            log(f"iter#{it}\t{elapsed:f}")
    return params
