"""--mesh CLI training path and checkpoint-resume tests."""

import numpy as np
import jax
import pytest

from tpu_mf.config import TrainConfig
from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.io import resume
from tpu_mf.models.mf import init_mf, rmse
from tpu_mf.train.loop import train_mf


def test_train_mf_mesh_path_converges():
    """cfg.mesh > 1 routes through diagonal-block DSGD (XLA on CPU mesh)."""
    assert len(jax.devices()) >= 4
    ds = synthetic_ratings(200, 120, 10000, rank=3, noise=0.1, seed=0)
    train, test = ds.split(0.2, seed=1)
    cfg = TrainConfig(
        dim=8, iters=8, eta=0.08, lam=0.01, gam=0.3, gb=ds.mean_rating(),
        batch_size=256, mesh=4, seed=0,
    )
    logs = []
    params = train_mf(cfg, train, test_ds=test, log=logs.append)
    assert len(logs) == 8
    final = rmse(params, test)
    assert final < 0.55, f"mesh training failed to converge: {final}"


def test_resume_roundtrip(tmp_path):
    prefix = str(tmp_path / "ckpt")
    assert resume.resume_round(prefix) == 0
    assert resume.load_round(prefix) is None

    params = init_mf(jax.random.PRNGKey(0), 10, 8, 4, gb=2.0)
    for rnd in (1, 2, 3, 4, 5):
        resume.save_round(prefix, rnd, params, keep=3, eta=np.float32(0.01 * rnd))

    assert resume.resume_round(prefix) == 5
    loaded, extras = resume.load_round(prefix)
    np.testing.assert_allclose(np.asarray(loaded.theta), np.asarray(params.theta))
    assert float(extras["eta"]) == pytest.approx(0.05)
    assert int(extras["round"]) == 5
    # prune keeps only the last 3
    import glob

    assert len(glob.glob(prefix + ".r*.npz")) == 3


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from tpu_mf.io.checkpoint import load_orbax, save_orbax

    params = init_mf(jax.random.PRNGKey(3), 12, 9, 4, gb=2.5)
    path = str(tmp_path / "orbax_ckpt")
    save_orbax(path, params, round=np.asarray(4, np.int32))
    back, extras = load_orbax(path)
    np.testing.assert_allclose(np.asarray(back.theta), np.asarray(params.theta))
    np.testing.assert_allclose(np.asarray(back.bv), np.asarray(params.bv))
    assert int(extras["round"]) == 4
