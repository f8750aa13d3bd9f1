"""Checkpoint-restart: resumable training state (SURVEY §5 failure row).

The reference has no failure handling — unchecked fopen, no retry, no resume
beyond manual --model warm start (SURVEY §5). Here training state (params +
algorithm extras + round counter + config fingerprint) round-trips through
atomic npz writes, and `latest`/`resume_round` make restart-after-preemption
a one-liner:

    start = resume_round(prefix)        # 0 if fresh
    for rnd in range(start + 1, iters + 1):
        ...train...
        save_round(prefix, rnd, params, **extras)
"""

from __future__ import annotations

import glob
import os
import re
from typing import Optional, Tuple

from tpu_mf.io.checkpoint import load_npz, save_npz


def _path(prefix: str, rnd: int) -> str:
    return f"{prefix}.r{rnd:06d}.npz"


def save_round(prefix: str, rnd: int, params, keep: int = 3, **extras) -> str:
    """Atomically write round state and prune old checkpoints (keep last N)."""
    import numpy as np

    path = _path(prefix, rnd)
    # np.savez appends .npz when missing, so the temp name must end with it
    # (and must not match the prune glob below).
    tmp = f"{prefix}.tmp-npz"
    save_npz(tmp, params, round=np.int32(rnd), **extras)
    os.replace(tmp + ".npz", path)
    for old in sorted(glob.glob(f"{prefix}.r*.npz"))[:-keep]:
        os.remove(old)
    return path


def latest(prefix: str) -> Optional[str]:
    """Newest round checkpoint for a prefix, or None."""
    paths = sorted(glob.glob(f"{prefix}.r*.npz"))
    return paths[-1] if paths else None


def resume_round(prefix: str) -> int:
    """Round number of the newest checkpoint (0 = start fresh)."""
    path = latest(prefix)
    if path is None:
        return 0
    m = re.search(r"\.r(\d+)\.npz$", path)
    return int(m.group(1)) if m else 0


def load_round(prefix: str) -> Optional[Tuple]:
    """(params, extras) from the newest checkpoint, or None."""
    path = latest(prefix)
    if path is None:
        return None
    return load_npz(path)
