"""Vectorized plan builders must reproduce the loop implementations EXACTLY.

prepare_cells / prepare_cells_packed were rewritten from per-cell Python
loops to one-shot cumsum+scatter math (100M-rating plans in seconds); these
tests keep byte-identical reference copies of the loop versions and assert
full array equality on skewed inputs across tile/batch shapes.
"""

import numpy as np
import pytest

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.ops.pallas_sgd import CellPlan, cdiv, prepare_cells
from tpu_mf.ops.pallas_sgd_packed import PackedPlan, prepare_cells_packed


def prepare_cells_loop(ds, tile_u, tile_v, batch_size, seed):
    """Reference: the original per-cell loop implementation."""
    assert batch_size % 8 == 0
    sub = batch_size // 8
    n_gu = cdiv(ds.nu, tile_u)
    n_gv = cdiv(ds.nv, tile_v)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(ds))
    u, v, r = ds.u[perm], ds.v[perm], ds.r[perm]
    gu = u // tile_u
    gv = v // tile_v
    cell = (gu * n_gv + gv).astype(np.int64)
    order = np.argsort(cell, kind="stable")
    u, v, r, cell = u[order], v[order], r[order], cell[order]
    counts = np.bincount(cell, minlength=n_gu * n_gv)
    sb_per_cell = np.ceil(counts / sub).astype(np.int64)
    sb_per_group = sb_per_cell.reshape(n_gu, n_gv).sum(1)
    nb_per_group = np.maximum(1, np.ceil(sb_per_group / 8)).astype(np.int64)
    nb_total = int(nb_per_group.sum())
    U = np.full((nb_total, sub, 8), tile_u, np.int32)
    V = np.full((nb_total, sub, 8), tile_v, np.int32)
    R = np.zeros((nb_total, sub, 8), np.float32)
    W = np.zeros((nb_total, sub, 8), np.float32)
    GU = np.zeros(nb_total, np.int32)
    GV = np.zeros((nb_total, 8), np.int32)
    src = np.concatenate([[0], np.cumsum(counts)])
    base = 0
    for g in range(n_gu):
        GU[base : base + int(nb_per_group[g])] = g
        sb = 0
        for j in range(n_gv):
            c = g * n_gv + j
            n = int(counts[c])
            if n == 0:
                continue
            s = src[c]
            ul = (u[s : s + n] % tile_u).astype(np.int32)
            vl = (v[s : s + n] % tile_v).astype(np.int32)
            for s0 in range(0, n, sub):
                m = min(sub, n - s0)
                b = base + sb // 8
                col = sb % 8
                U[b, :m, col] = ul[s0 : s0 + m]
                V[b, :m, col] = vl[s0 : s0 + m]
                R[b, :m, col] = r[s + s0 : s + s0 + m]
                W[b, :m, col] = 1.0
                GV[b, col] = j
                sb += 1
        base += int(nb_per_group[g])
    return CellPlan(u=U, v=V, r=R, w=W, gu=GU, gv=GV, tile_u=tile_u,
                    tile_v=tile_v, n_gu=n_gu, n_gv=n_gv, n_real=len(ds))


def prepare_cells_packed_loop(ds, tile_u, tile_v, batch_size, seed, pack):
    """Reference: the original per-bucket loop implementation."""
    P = pack
    sub = batch_size // 8
    n_gu = cdiv(ds.nu, tile_u)
    n_gv = cdiv(ds.nv, tile_v)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(ds))
    u, v, r = ds.u[perm], ds.v[perm], ds.r[perm]
    gu = u // tile_u
    gv = v // tile_v
    gd = (v - u) % P
    cell = ((gu * P + gd) * n_gv + gv).astype(np.int64)
    order = np.argsort(cell, kind="stable")
    u, v, r, cell = u[order], v[order], r[order], cell[order]
    counts = np.bincount(cell, minlength=n_gu * n_gv * P)
    sb_per_cell = np.ceil(counts / sub).astype(np.int64)
    cpc = 8 // P
    sb_per_class = sb_per_cell.reshape(n_gu, P, n_gv).sum(2)
    nb_per_group = np.maximum(
        1, np.ceil(sb_per_class / cpc).max(1)).astype(np.int64)
    nb_total = int(nb_per_group.sum())
    U = np.full((nb_total, sub, 8), tile_u, np.int32)
    V = np.full((nb_total, sub, 8), tile_v, np.int32)
    R = np.zeros((nb_total, sub, 8), np.float32)
    W = np.zeros((nb_total, sub, 8), np.float32)
    GU = np.zeros(nb_total, np.int32)
    GV = np.zeros((nb_total, 8), np.int32)
    GD = np.broadcast_to(
        np.arange(8, dtype=np.int32) % P, (nb_total, 8)).copy()
    src = np.concatenate([[0], np.cumsum(counts)])
    base = 0
    for g in range(n_gu):
        GU[base : base + int(nb_per_group[g])] = g
        for d in range(P):
            sb = 0
            for j in range(n_gv):
                c = (g * P + d) * n_gv + j
                n = int(counts[c])
                if n == 0:
                    continue
                s = src[c]
                ul = (u[s : s + n] % tile_u).astype(np.int32)
                vl = (v[s : s + n] % tile_v).astype(np.int32)
                for s0 in range(0, n, sub):
                    mreal = min(sub, n - s0)
                    b = base + sb // cpc
                    col = d + (sb % cpc) * P
                    U[b, :mreal, col] = ul[s0 : s0 + mreal]
                    V[b, :mreal, col] = vl[s0 : s0 + mreal]
                    R[b, :mreal, col] = r[s + s0 : s + s0 + mreal]
                    W[b, :mreal, col] = 1.0
                    GV[b, col] = j
                    sb += 1
        base += int(nb_per_group[g])
    return PackedPlan(u=U, v=V, r=R, w=W, gu=GU, gv=GV, gd=GD,
                      tile_u=tile_u, tile_v=tile_v, n_gu=n_gu, n_gv=n_gv,
                      n_real=len(ds), pack=P)


CASES = [
    (300, 150, 5000, 64, 64, 128, 0),
    (1000, 400, 30000, 128, 64, 256, 1),
    (97, 53, 700, 64, 64, 64, 2),       # ragged tails, sparse cells
    (2000, 900, 60000, 256, 256, 512, 3),
]


@pytest.mark.parametrize("nu,nv,n,tu,tv,bs,seed", CASES)
def test_prepare_cells_matches_loop(nu, nv, n, tu, tv, bs, seed):
    ds = synthetic_ratings(nu, nv, n, rank=3, seed=seed, zipf=0.9)
    a = prepare_cells(ds, tu, tv, bs, seed=seed + 7)
    b = prepare_cells_loop(ds, tu, tv, bs, seed=seed + 7)
    for f in CellPlan._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )


@pytest.mark.parametrize("pack", [2, 4, 8])
def test_prepare_cells_packed_matches_loop(pack):
    ds = synthetic_ratings(900, 500, 20000, rank=3, seed=4, zipf=0.9)
    a = prepare_cells_packed(ds, 16 * pack, 16 * pack, 128, seed=5, pack=pack)
    b = prepare_cells_packed_loop(
        ds, 16 * pack, 16 * pack, 128, seed=5, pack=pack
    )
    for f in PackedPlan._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )
