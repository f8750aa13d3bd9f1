"""Multi-host layer (parallel/multihost.py): jax.distributed-gated init,
host-local staging, and a process-count-1 end-to-end smoke (round-3 VERDICT
#8: promote the PARITY.md design note to a tested component)."""

import subprocess
import sys

import numpy as np
import jax

from tpu_mf.parallel.mesh import make_mesh
from tpu_mf.parallel.multihost import (
    init_distributed,
    local_user_shards,
    put_host_local,
)


def test_init_distributed_noop_without_config(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert init_distributed() == jax.process_count() == 1


def test_local_user_shards_single_process_owns_all():
    mesh = make_mesh(4)
    assert local_user_shards(mesh) == [0, 1, 2, 3]


def test_put_host_local_matches_device_put():
    """Single-process: staging every slab host-locally must equal a plain
    sharded device_put of the stacked array."""
    from tpu_mf.parallel.mesh import row_sharding

    mesh = make_mesh(4)
    stack = np.arange(4 * 6 * 8, dtype=np.float32).reshape(4, 6, 8)
    owned = local_user_shards(mesh)
    a = put_host_local(mesh, stack, owned)
    b = jax.device_put(stack, row_sharding(mesh))
    assert a.shape == b.shape == (4, 6, 8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # per-device shards line up position for position
    for sa, sb in zip(a.addressable_shards, b.addressable_shards):
        assert sa.index == sb.index


SMOKE = r"""
import jax
jax.config.update("jax_num_cpu_devices", 4)
from tpu_mf.parallel.multihost import init_distributed
n = init_distributed(coordinator_address="localhost:12987",
                     num_processes=1, process_id=0)
assert n == 1, n
assert jax.process_count() == 1
from tpu_mf.config import TrainConfig
from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.train.loop import train_mf
ds = synthetic_ratings(200, 150, 6000, rank=3, noise=0.1, seed=0)
tr, te = ds.split(0.2, seed=1)
cfg = TrainConfig(dim=8, iters=2, eta=0.05, lam=0.01, gam=0.3,
                  gb=ds.mean_rating(), batch_size=512, mesh=2)
lines = []
train_mf(cfg, tr, test_ds=te, log=lines.append)
rmse_lines = [l for l in lines if "tRMSE=" in l]
assert len(rmse_lines) == 2, lines
assert "nan" not in " ".join(rmse_lines), lines
print("MULTIHOST_SMOKE_OK")
"""


def test_mesh_under_jax_distributed_single_process():
    """--mesh works under jax.distributed.initialize() with one process
    (subprocess: distributed init is process-global)."""
    r = subprocess.run(
        [sys.executable, "-c", SMOKE],
        capture_output=True, text=True, timeout=900,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root",
             "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo"},
    )
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "MULTIHOST_SMOKE_OK" in r.stdout


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_training(tmp_path):
    """GENUINE multi-process training (round-4 VERDICT #5): two OS
    processes, localhost coordinator, Gloo CPU collectives, one device
    each — ``--mesh 2`` spans the processes. Exercises the full CLI path:
    cli.init_distributed (env-var gated), put_blocks' host-local staging
    (each process uploads only its own user shard), put_row_sharded
    params, cross-process ppermute in dsgd_epoch, host_pull's replicate-
    then-read, and the primary-only checkpoint write."""
    from tpu_mf.data.coo import synthetic_ratings
    from tpu_mf.data.proto import write_block_frames

    ds = synthetic_ratings(200, 150, 6000, rank=3, noise=0.1, seed=0)
    tr, te = ds.split(0.2, seed=1)
    train_pb = tmp_path / "train.pb"
    test_pb = tmp_path / "test.pb"
    write_block_frames(str(train_pb), tr)
    write_block_frames(str(test_pb), te)
    result = tmp_path / "ck"

    port = _free_port()
    base_env = {
        "PATH": "/usr/bin:/bin", "HOME": "/root",
        "JAX_PLATFORMS": "cpu", "PYTHONPATH": "/root/repo",
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": "2",
    }
    cmd = [
        sys.executable, "-m", "tpu_mf.cli",
        "--train", str(train_pb), "--test", str(test_pb),
        "--alg", "mf", "--dim", "8", "--iter", "2", "--mesh", "2",
        "--batch_size", "512", "--eta", "0.05", "--lambda", "0.01",
        "--gam", "0.3", "--bias", f"{float(tr.mean_rating()):f}",
        "--result", str(result),
    ]
    procs = [
        subprocess.Popen(
            cmd, env={**base_env, "JAX_PROCESS_ID": str(i)},
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in (0, 1)
    ]
    outs = [p.communicate(timeout=900) for p in procs]
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (i, out, err)

    # Both processes print identical, finite RMSE trajectories.
    def rmse_lines(out):
        return [ln for ln in out.splitlines() if "tRMSE=" in ln]

    l0, l1 = rmse_lines(outs[0][0]), rmse_lines(outs[1][0])
    assert len(l0) == 2, outs[0]
    assert [ln.split("tRMSE=")[1] for ln in l0] == [
        ln.split("tRMSE=")[1] for ln in l1
    ]
    final = float(l0[-1].split("tRMSE=")[1])
    assert np.isfinite(final) and final < 2.0, l0
    # Primary-only checkpoint write happened exactly once.
    assert (tmp_path / "ck_2").exists()
    assert "process 0/2" in outs[0][1] and "process 1/2" in outs[1][1]
