"""What is the 5us/step floor? Scale batch; drop phi; drop inputs."""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MODE = sys.argv[1]          # full-io | no-phi | no-inputs | theta-only
BATCH = int(sys.argv[2])    # 4096 | 8192 | 16384
NB = int(sys.argv[3]) if len(sys.argv) > 3 else 2867
ROWS_U, N_GU = 128, 69
ROWS_V, N_GV = 128, 11

def kernel_full(gu_ref, hyper_ref, u_ref, v_ref, ut_ref, vt_ref, r_ref, w_ref,
                theta_ref, phi_hbm, theta_out, phi_out, sem):
    i = pl.program_id(0)
    prev = jnp.maximum(i - 1, 0)
    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(phi_hbm, phi_out, sem)
        cp.start(); cp.wait()
    @pl.when((i == 0) | (gu_ref[i] != gu_ref[prev]))
    def _():
        theta_out[:] = theta_ref[:]

def kernel_nophi(gu_ref, hyper_ref, u_ref, v_ref, ut_ref, vt_ref, r_ref, w_ref,
                 theta_ref, theta_out):
    i = pl.program_id(0)
    prev = jnp.maximum(i - 1, 0)
    @pl.when((i == 0) | (gu_ref[i] != gu_ref[prev]))
    def _():
        theta_out[:] = theta_ref[:]

def kernel_noin(gu_ref, hyper_ref, theta_ref, theta_out):
    i = pl.program_id(0)
    prev = jnp.maximum(i - 1, 0)
    @pl.when((i == 0) | (gu_ref[i] != gu_ref[prev]))
    def _():
        theta_out[:] = theta_ref[:]

def main():
    sub = BATCH // 8
    rng = np.random.default_rng(0)
    gu = jnp.asarray(np.sort(rng.integers(0, N_GU, NB)).astype(np.int32))
    hyper = jnp.asarray([0.02, 5e-3, 3.0], jnp.float32)
    u = jnp.zeros((NB, sub, 8), jnp.int32); v = u
    ut = jnp.zeros((NB, 8, sub), jnp.int32); vt = ut
    r = jnp.zeros((NB, sub, 8), jnp.float32); w = r
    theta = jnp.zeros((N_GU * ROWS_U, LANES), jnp.float32)
    phi = jnp.zeros((N_GV * ROWS_V, LANES), jnp.float32)
    bs_data = [
        pl.BlockSpec((1, sub, 8), lambda i, a, h: (i, 0, 0)),
        pl.BlockSpec((1, sub, 8), lambda i, a, h: (i, 0, 0)),
        pl.BlockSpec((1, 8, sub), lambda i, a, h: (i, 0, 0)),
        pl.BlockSpec((1, 8, sub), lambda i, a, h: (i, 0, 0)),
        pl.BlockSpec((1, sub, 8), lambda i, a, h: (i, 0, 0)),
        pl.BlockSpec((1, sub, 8), lambda i, a, h: (i, 0, 0)),
    ]
    bs_theta_in = pl.BlockSpec((ROWS_U, LANES), lambda i, a, h: (a[i], 0))
    bs_theta_out = pl.BlockSpec((ROWS_U, LANES), lambda i, a, h: (a[i], 0))
    if MODE == "full-io":
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(NB,),
            in_specs=bs_data + [bs_theta_in, pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[bs_theta_out,
                       pl.BlockSpec((N_GV * ROWS_V, LANES), lambda i, a, h: (0, 0))],
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        )
        fn = pl.pallas_call(kernel_full, grid_spec=gs,
            out_shape=[jax.ShapeDtypeStruct((N_GU * ROWS_U, LANES), jnp.float32),
                       jax.ShapeDtypeStruct((N_GV * ROWS_V, LANES), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
            input_output_aliases={8: 0, 9: 1})
        args = (gu, hyper, u, v, ut, vt, r, w, theta, phi)
    elif MODE == "no-phi":
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(NB,),
            in_specs=bs_data + [bs_theta_in],
            out_specs=[bs_theta_out],
            scratch_shapes=[],
        )
        fn = pl.pallas_call(kernel_nophi, grid_spec=gs,
            out_shape=[jax.ShapeDtypeStruct((N_GU * ROWS_U, LANES), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
            input_output_aliases={8: 0})
        args = (gu, hyper, u, v, ut, vt, r, w, theta)
    else:  # no-inputs
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(NB,),
            in_specs=[bs_theta_in],
            out_specs=[bs_theta_out],
            scratch_shapes=[],
        )
        fn = pl.pallas_call(kernel_noin, grid_spec=gs,
            out_shape=[jax.ShapeDtypeStruct((N_GU * ROWS_U, LANES), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
            input_output_aliases={2: 0})
        args = (gu, hyper, theta)
    jfn = jax.jit(fn)
    out = jfn(*args); _ = float(jnp.sum(out[0] if isinstance(out, (list, tuple)) else out))
    t0 = time.perf_counter(); reps = 10
    for _ in range(reps):
        out = jfn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, (list, tuple)) else out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{MODE:9s} B={BATCH:5d} nb={NB}: {dt*1e6/NB:6.2f}us/step  total {dt*1e3:.1f}ms")

main()
