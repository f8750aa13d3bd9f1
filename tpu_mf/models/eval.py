"""Ranking evaluation: recall@k, precision@k, NDCG@k.

The reference's only metric is RMSE (``--measure``: "support RMSE",
main.cc:33; calc_mse model.cc:41-73) — matched by tpu_mf.models.mf.rmse.
Production recommenders also gate on ranking quality, so top-k metrics are
provided on top of the batched serving scorer (models/serving.py): score the
full catalog per user on the MXU, mask training items, take top-k, and
compare against each user's held-out positives.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from tpu_mf.data.coo import RatingsCOO
from tpu_mf.models.mf import MFParams
from tpu_mf.models.serving import recommend_topk


def _group_by_user(ds: RatingsCOO, min_rating: Optional[float]):
    """user -> set of relevant item ids (rating >= min_rating if given)."""
    sel = np.ones(len(ds), bool) if min_rating is None else ds.r >= min_rating
    out: Dict[int, set] = {}
    for u, v in zip(ds.u[sel], ds.v[sel]):
        out.setdefault(int(u), set()).add(int(v))
    return out


def ranking_metrics(
    params: MFParams,
    test_ds: RatingsCOO,
    train_ds: Optional[RatingsCOO] = None,
    k: int = 10,
    min_rating: Optional[float] = None,
    user_batch: int = 1024,
    max_seen: int = 512,
) -> Dict[str, float]:
    """recall@k / precision@k / ndcg@k over users with test positives.

    Items the user rated in train_ds are masked out of the candidates
    (standard leave-out protocol). Users whose train history exceeds
    ``max_seen`` items have only their FIRST ``max_seen`` items (in train_ds
    order — RatingsCOO carries no timestamps) masked; the count of such
    truncated users is returned as ``n_truncated`` so callers can raise
    ``max_seen`` when it is nonzero.
    """
    import jax.numpy as jnp

    positives = _group_by_user(test_ds, min_rating)
    users = np.asarray(sorted(positives), np.int32)
    if len(users) == 0:
        return {"recall@k": 0.0, "precision@k": 0.0, "ndcg@k": 0.0, "k": k}

    seen: Dict[int, list] = {}
    n_truncated = 0
    if train_ds is not None:
        for u, v in zip(train_ds.u, train_ds.v):
            seen.setdefault(int(u), []).append(int(v))
        n_truncated = sum(
            1 for u in users if len(seen.get(int(u), [])) > max_seen
        )

    log2 = np.log2(np.arange(2, k + 2))  # DCG discounts
    recall = prec = ndcg = 0.0
    for s in range(0, len(users), user_batch):
        chunk = users[s : s + user_batch]
        if train_ds is not None:
            sv = np.zeros((len(chunk), max_seen), np.int32)
            sm = np.zeros((len(chunk), max_seen), np.float32)
            for i, u in enumerate(chunk):
                items = seen.get(int(u), [])[:max_seen]
                sv[i, : len(items)] = items
                sm[i, : len(items)] = 1.0
            items_k, _ = recommend_topk(
                params, jnp.asarray(chunk), k,
                seen_v=jnp.asarray(sv), seen_mask=jnp.asarray(sm),
            )
        else:
            items_k, _ = recommend_topk(params, jnp.asarray(chunk), k)
        items_k = np.asarray(items_k)
        for i, u in enumerate(chunk):
            rel = positives[int(u)]
            hits = np.asarray([it in rel for it in items_k[i]], np.float32)
            recall += hits.sum() / min(len(rel), k)
            prec += hits.sum() / k
            idcg = (1.0 / log2[: min(len(rel), k)]).sum()
            ndcg += float((hits / log2).sum() / idcg)
    n = float(len(users))
    return {
        "recall@k": recall / n,
        "precision@k": prec / n,
        "ndcg@k": ndcg / n,
        "k": k,
        "n_users": int(n),
        "n_truncated": n_truncated,
    }
