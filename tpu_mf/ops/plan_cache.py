"""Disk cache for epoch plans (cell/packed/slot), in-memory path.

Plan construction is argsort-bound: ~145 s for a Netflix-scale (100M
rating) plan on a 1-core host, ~850 epochs' worth of kernel time
(PERF_NOTES.md). The streamed path has cached its plans since round 2
(io/stream_fused.py); this brings the same to the in-memory runners: the
``prepare_cells*`` builders consult a disk cache keyed by (data
fingerprint, seed, kernel geometry) before building.

Policy:
* Only plans for datasets with >= MIN_RATINGS ratings are cached (small
  plans build in milliseconds; don't litter the cache dir).
* The data fingerprint is a blake2b over the raw id/rating bytes — a
  second run on the same dataset loads in seconds; ANY change to the data
  rebuilds.
* ``TPU_MF_PLAN_CACHE`` env: a directory path overrides the default
  (~/.cache/tpu_mf/plans); ``0`` disables caching entirely.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable

import numpy as np

MIN_RATINGS = 2_000_000


def cache_dir() -> str | None:
    env = os.environ.get("TPU_MF_PLAN_CACHE")
    if env == "0":
        return None
    if env:
        return env
    return os.path.join(
        os.path.expanduser("~"), ".cache", "tpu_mf", "plans"
    )


def _fingerprint(ds, kind: str, seed: int, geom: tuple) -> str:
    h = hashlib.blake2b(digest_size=20)
    h.update(repr((kind, seed, geom, ds.nu, ds.nv, len(ds))).encode())
    h.update(np.ascontiguousarray(ds.u).tobytes())
    h.update(np.ascontiguousarray(ds.v).tobytes())
    h.update(np.ascontiguousarray(ds.r).tobytes())
    return h.hexdigest()


def cached_build(kind: str, cls, ds, seed: int, geom: tuple,
                 builder: Callable):
    """Return builder() with a disk-backed cache when eligible.

    cls is the plan NamedTuple class; ndarray fields round-trip through one
    npz, scalar fields through its 'meta' entry.
    """
    cdir = cache_dir()
    if cdir is None or len(ds) < MIN_RATINGS:
        return builder()
    try:
        os.makedirs(cdir, exist_ok=True)
        key = _fingerprint(ds, kind, seed, geom)
        path = os.path.join(cdir, f"{kind}.{key}.npz")
        if os.path.exists(path):
            z = np.load(path, allow_pickle=False)
            fields = {}
            meta = {}
            if "plan_meta_keys" in z:
                keys = [k for k in str(z["plan_meta_keys"]).split(",") if k]
                vals = z["plan_meta_vals"]
                meta = {k: int(v) for k, v in zip(keys, vals)}
            for name in cls._fields:
                if name in meta:
                    fields[name] = meta[name]
                else:
                    fields[name] = z[name]
            return cls(**fields)
    except (OSError, KeyError, ValueError):
        pass  # unreadable/stale cache entry: rebuild below
    plan = builder()
    try:
        arrays = {}
        meta = {}
        for name in cls._fields:
            val = getattr(plan, name)
            if isinstance(val, np.ndarray):
                arrays[name] = val
            else:
                meta[name] = int(val)
        tmp = path + f".{os.getpid()}.tmp.npz"
        np.savez(
            tmp,
            plan_meta_keys=",".join(meta),
            plan_meta_vals=np.asarray(list(meta.values()), np.int64),
            **arrays,
        )
        os.replace(tmp, path)
    except OSError as e:  # cache write is best-effort, but say so
        import warnings

        warnings.warn(f"plan cache write failed ({path}): {e}")
    return plan
