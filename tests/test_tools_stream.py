"""ETL tools, streaming pipeline, serving API, and metrics tests."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.data.proto import write_block_frames
from tpu_mf.data.textfmt import read_any, write_raw
from tpu_mf.io.stream import Prefetcher, stream_batches, streaming_sgd_epoch
from tpu_mf.models.mf import init_mf
from tpu_mf.models.serving import recommend_topk, score_all_items
from tpu_mf.ops.sgd import sgd_batch_update
from tpu_mf.tools import grid as grid_tool
from tpu_mf.tools import prepare
from tpu_mf.train.metrics import MetricsLogger


def test_prepare_convert_and_split(tmp_path):
    ds = synthetic_ratings(60, 40, 3000, seed=0)
    raw = str(tmp_path / "raw.txt")
    write_raw(raw, ds)
    out = str(tmp_path / "out")
    rc = prepare.main(
        ["-r", raw, "-w", out, "--method", "protobuf", "--size", "17",
         "--split", "0.2", "--valid", "0.1", "--seed", "3"]
    )
    assert rc == 0
    train = read_any(out + ".train", nu=ds.nu, nv=ds.nv)
    test = read_any(out + ".test", nu=ds.nu, nv=ds.nv)
    valid = read_any(out + ".valid", nu=ds.nu, nv=ds.nv)
    assert len(train) + len(test) + len(valid) == len(ds)
    assert len(test) == pytest.approx(0.2 * len(ds), rel=0.05)


def test_prepare_userwise_roundtrip(tmp_path):
    ds = synthetic_ratings(30, 20, 500, seed=1)
    raw = str(tmp_path / "raw.txt")
    write_raw(raw, ds)
    uw = str(tmp_path / "uw.txt")
    assert prepare.main(["-r", raw, "-w", uw, "--method", "userwise"]) == 0
    back = read_any(uw, nu=ds.nu, nv=ds.nv)
    assert len(back) == len(ds)


def test_grid_driver_runs_all_points(tmp_path, capsys):
    ds = synthetic_ratings(40, 30, 2000, seed=2)
    train = str(tmp_path / "train.pb")
    write_block_frames(train, ds)
    rc = grid_tool.main(
        ["--train", train, "--alg", "mf", "--iter", "1",
         "--eta", "0.05,0.02", "--dim", "4,8", "--batch_size", "256",
         "--bias", str(ds.mean_rating())]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("### mf ") == 4  # 2 etas x 2 dims


def test_stream_batches_covers_file(tmp_path):
    ds = synthetic_ratings(50, 30, 1111, seed=3)
    path = str(tmp_path / "s.pb")
    write_block_frames(path, ds, users_per_block=7)
    total = 0
    for u, v, r, w in stream_batches(path, 256):
        assert u.shape == (256,)
        total += int(w.sum())
    assert total == len(ds)


def test_prefetcher_preserves_order_and_errors():
    items = [np.asarray([i]) for i in range(20)]
    out = [int(x[0]) for x in Prefetcher(iter(items), fly=4)]
    assert out == list(range(20))

    def boom():
        yield np.asarray([1])
        raise RuntimeError("source failed")

    it = Prefetcher(boom(), fly=2)
    assert int(next(it)[0]) == 1
    with pytest.raises(RuntimeError, match="source failed"):
        next(it)


def test_streaming_epoch_matches_batched_kernel(tmp_path):
    ds = synthetic_ratings(40, 25, 700, seed=4)
    path = str(tmp_path / "t.pb")
    write_block_frames(path, ds, users_per_block=5)
    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, 4, gb=3.0)

    # streaming_sgd_epoch donates its input state; keep a copy for the replay
    donated = jax.tree.map(jnp.copy, params)
    streamed, n = streaming_sgd_epoch(donated, path, 0.05, 0.01, batch_size=128)
    assert n == len(ds)

    ref = params
    for batch in stream_batches(path, 128):
        ref = sgd_batch_update(
            ref, tuple(jnp.asarray(x) for x in batch),
            jnp.float32(0.05), jnp.float32(0.01),
        )
    np.testing.assert_allclose(
        np.asarray(streamed.theta), np.asarray(ref.theta), atol=1e-6
    )


def test_serving_scores_and_topk():
    params = init_mf(jax.random.PRNGKey(1), 20, 15, 8, gb=3.0)
    users = jnp.asarray([0, 5], jnp.int32)
    scores = score_all_items(params, users)
    assert scores.shape == (2, 15)
    # matches the predict formula
    from tpu_mf.models.mf import predict

    direct = predict(params, jnp.asarray([0]), jnp.asarray([7]))
    np.testing.assert_allclose(float(scores[0, 7]), float(direct[0]), rtol=1e-6)

    items, vals = recommend_topk(params, users, k=5)
    assert items.shape == (2, 5)
    assert (np.diff(np.asarray(vals), axis=1) <= 1e-7).all()  # sorted desc

    # masking removes seen items from recommendations
    seen = jnp.asarray([[int(items[0, 0])], [0]], jnp.int32)
    mask = jnp.asarray([[1.0], [0.0]], jnp.float32)
    items2, _ = recommend_topk(params, users, k=5, seen_v=seen, seen_mask=mask)
    assert int(items[0, 0]) not in np.asarray(items2)[0]
    # user 1's mask entry is 0 (padding) -> item 0 may still appear
    np.testing.assert_array_equal(np.asarray(items)[1], np.asarray(items2)[1])


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    m = MetricsLogger(path)
    m.count_updates(1000)
    m.log(epoch=1, rmse=0.9)
    m.log(epoch=2, rmse=0.8)
    m.close()
    lines = [json.loads(l) for l in open(path)]
    assert [l["epoch"] for l in lines] == [1, 2]
    assert all("updates_per_sec" in l and "t" in l for l in lines)


def test_ranking_metrics():
    from tpu_mf.models.eval import ranking_metrics
    from tpu_mf.config import TrainConfig
    from tpu_mf.train.loop import train_mf

    ds = synthetic_ratings(120, 80, 12000, rank=3, noise=0.1, seed=8)
    train, test = ds.split(0.2, seed=9)
    cfg = TrainConfig(dim=8, iters=6, eta=0.05, lam=0.01, gam=0.3,
                      gb=ds.mean_rating(), batch_size=512, seed=0)
    params = train_mf(cfg, train, test_ds=None, log=lambda s: None)

    m = ranking_metrics(params, test, train_ds=train, k=10,
                        min_rating=float(np.percentile(test.r, 75)))
    assert 0.0 <= m["precision@k"] <= 1.0
    assert 0.0 <= m["ndcg@k"] <= 1.0
    assert m["n_users"] > 50
    # trained factors must beat random factors at ranking
    rnd = init_mf(jax.random.PRNGKey(99), ds.nu, ds.nv, 8, gb=ds.mean_rating())
    m_rnd = ranking_metrics(rnd, test, train_ds=train, k=10,
                            min_rating=float(np.percentile(test.r, 75)))
    assert m["ndcg@k"] > m_rnd["ndcg@k"]


def test_prepare_nway_split(tmp_path):
    """Reference getdata --split N: N user-grouped shard files covering all
    ratings exactly once (getdata.cc:128-173)."""
    ds = synthetic_ratings(60, 40, 3000, seed=2)
    raw = str(tmp_path / "raw.txt")
    write_raw(raw, ds)
    out = str(tmp_path / "nway")
    rc = prepare.main(
        ["-r", raw, "-w", out, "--method", "userwise", "--split", "4"]
    )
    assert rc == 0
    total = 0
    got = []
    for i in range(4):
        part = read_any(out + f".part{i}", nu=ds.nu, nv=ds.nv)
        assert len(part) > 0
        total += len(part)
        got += list(zip(part.u.tolist(), part.v.tolist(),
                        np.round(part.r, 3).tolist()))
    assert total == len(ds)
    want = sorted(zip(ds.u.tolist(), ds.v.tolist(),
                      np.round(ds.r, 3).tolist()))
    assert sorted(got) == want
