"""Disk-backed plan cache (ops/plan_cache.py)."""

import os

import numpy as np
import pytest

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.ops import plan_cache
from tpu_mf.ops.pallas_sgd import CellPlan, prepare_cells
from tpu_mf.ops.pallas_sgd_slot import SlotPlan, prepare_cells_slot


@pytest.fixture(autouse=True)
def small_threshold(tmp_path, monkeypatch):
    monkeypatch.setenv("TPU_MF_PLAN_CACHE", str(tmp_path / "plans"))
    monkeypatch.setattr(plan_cache, "MIN_RATINGS", 100)
    yield tmp_path / "plans"


def _plans_equal(a, b):
    assert type(a) is type(b)
    for name in a._fields:
        va, vb = getattr(a, name), getattr(b, name)
        if isinstance(va, np.ndarray):
            np.testing.assert_array_equal(va, vb)
            assert va.dtype == vb.dtype
        else:
            assert va == vb


def test_cell_plan_roundtrips_through_cache(small_threshold):
    ds = synthetic_ratings(100, 80, 2000, seed=0)
    p1 = prepare_cells(ds, tile_u=32, tile_v=32, batch_size=64, seed=1)
    files = os.listdir(small_threshold)
    assert any(f.startswith("cell.") for f in files)
    p2 = prepare_cells(ds, tile_u=32, tile_v=32, batch_size=64, seed=1)
    _plans_equal(p1, p2)
    assert isinstance(p2, CellPlan)


def test_slot_plan_roundtrips_through_cache(small_threshold):
    ds = synthetic_ratings(100, 80, 2000, seed=0)
    kw = dict(tile_u=16, tile_v=16, sub=8, seed=2, pack=8)
    p1 = prepare_cells_slot(ds, **kw)
    p2 = prepare_cells_slot(ds, **kw)
    _plans_equal(p1, p2)
    assert isinstance(p2, SlotPlan)


def test_cache_keys_on_data_seed_and_geometry(small_threshold):
    ds = synthetic_ratings(100, 80, 2000, seed=0)
    prepare_cells(ds, tile_u=32, tile_v=32, batch_size=64, seed=1)
    # different seed: new entry, different plan
    p_seed = prepare_cells(ds, tile_u=32, tile_v=32, batch_size=64, seed=9)
    # different data: new entry
    ds2 = synthetic_ratings(100, 80, 2000, seed=5)
    p_data = prepare_cells(ds2, tile_u=32, tile_v=32, batch_size=64, seed=1)
    entries = [f for f in os.listdir(small_threshold) if f.startswith("cell.")]
    assert len(entries) == 3
    assert not np.array_equal(
        p_seed.u, prepare_cells(ds, tile_u=32, tile_v=32, batch_size=64,
                                seed=1).u
    ) or not np.array_equal(p_seed.gu, p_data.gu)


def test_cache_disabled_by_env(tmp_path, monkeypatch):
    monkeypatch.setenv("TPU_MF_PLAN_CACHE", "0")
    monkeypatch.setattr(plan_cache, "MIN_RATINGS", 100)
    ds = synthetic_ratings(100, 80, 2000, seed=0)
    prepare_cells(ds, tile_u=32, tile_v=32, batch_size=64, seed=1)
    assert plan_cache.cache_dir() is None
