"""Fused out-of-core streaming (io/stream_fused.py) on the CPU interpreter."""

import numpy as np
import jax
import pytest

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.data.proto import write_block_frames
from tpu_mf.io.stream_fused import FusedStreamTrainer, ShardStore
from tpu_mf.models.mf import init_mf, rmse


@pytest.fixture()
def stream_file(tmp_path):
    ds = synthetic_ratings(200, 100, 12000, rank=3, noise=0.1, seed=1)
    train, test = ds.split(0.2, seed=2)
    p = str(tmp_path / "train.pb")
    write_block_frames(p, train)
    return p, train, test


def test_shard_store_partitions_by_user_range(stream_file, tmp_path):
    path, train, _ = stream_file
    store = ShardStore(path, tile_u=32, mem_limit=3000,
                       workdir=str(tmp_path / "wk"))
    assert store.n_shards > 1
    span = 32 * store.tiles_per_shard
    total = 0
    got = []
    for s in range(store.n_shards):
        ds = store.load(s, seed=0)
        total += len(ds)
        if len(ds):
            assert (ds.u // span == s).all()
        got += list(zip(ds.u.tolist(), ds.v.tolist(), np.round(ds.r, 4)))
    assert total == len(train)
    want = sorted(zip(train.u.tolist(), train.v.tolist(), np.round(train.r, 4)))
    assert sorted(got) == want
    store.close()


def test_plan_cache_rejects_stale_fingerprint(stream_file, tmp_path):
    """A cached plan built under a different (seed, batch, tiles, dataset)
    must be rebuilt, not silently reused, when the workdir persists."""
    import os

    path, train, _ = stream_file
    wk = str(tmp_path / "wkfp")
    t1 = FusedStreamTrainer(
        path, tile_u=32, tile_v=32, batch=128, mem_limit=3000, seed=3,
        mxu="float32", interpret=True, workdir=wk,
    )
    plans1 = [tuple(np.asarray(a) for a in p) for p in t1._plans(0)]
    caches = sorted(f for f in os.listdir(wk) if f.startswith("plan."))
    assert caches, "no plan cache files written"
    # Same geometry: the cache is reused (same bytes back).
    plans1b = [tuple(np.asarray(a) for a in p) for p in t1._plans(0)]
    for a, b in zip(plans1, plans1b):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    # New seed, same workdir: fingerprints differ -> plans rebuilt.
    t2 = FusedStreamTrainer(
        path, tile_u=32, tile_v=32, batch=128, mem_limit=3000, seed=99,
        mxu="float32", interpret=True, workdir=wk,
    )
    plans2 = [tuple(np.asarray(a) for a in p) for p in t2._plans(0)]
    assert any(
        not np.array_equal(a[2], b[2])  # uv stream differs under a new shuffle
        for a, b in zip(plans1, plans2)
    ), "stale cached plan was reused despite a different seed"


def test_fused_stream_trainer_converges_interpret(stream_file, tmp_path):
    path, train, test = stream_file
    trainer = FusedStreamTrainer(
        path, tile_u=32, tile_v=32, batch=128, mem_limit=3000, seed=3,
        mxu="float32", interpret=True, workdir=str(tmp_path / "wk2"),
    )
    assert trainer.n == len(train)
    params = init_mf(
        jax.random.PRNGKey(0), trainer.nu, trainer.nv, 8,
        gb=train.mean_rating(),
    )
    tables = trainer.pad(params)
    for it in range(1, 7):
        tables = trainer.epoch(
            tables, 0.05 / it**0.3, 0.01, float(params.gb), epoch_idx=it
        )
    out = trainer.trim(tables)
    trainer.close()
    final = rmse(out, test)
    assert final < 0.6, f"fused streaming training failed to converge: {final}"
