"""In-kernel Mosaic matmul rate without serial-dependency artifacts.

The megakernel needs qkv/out/ffn matmuls (43 GFLOP/step) to run at XLA-like
rates inside a pallas_call.  Measures:
  - grid-reps matmul (independent per grid step, accumulate into out)
  - 4-way unrolled fori (exposes ILP)
  - XLA scan matmul with the same loop-carried shape (tunnel-honest compare)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 256, 1024, 1024
FLOP = 2 * M * K * N


def fence(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def bench(name, f, args, per_call):
    fence(f(*args))
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        f(*args)
    fence(f(*args))
    dt = (time.perf_counter() - t0) / iters / per_call
    print(f"  {name}: {dt*1e6:.1f} us/matmul ({FLOP/dt/1e12:.1f} TFLOP/s)",
          flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    kq = jax.random.PRNGKey(0)
    a = jax.random.normal(kq, (M, K), jnp.bfloat16)
    b = jax.random.normal(kq, (K, N), jnp.bfloat16)

    G = 256

    def kern_grid(a_ref, b_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros((M, N), jnp.float32)
        o_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                            preferred_element_type=jnp.float32)

    f_grid = jax.jit(pl.pallas_call(
        kern_grid,
        grid=(G,),
        in_specs=[pl.BlockSpec((M, K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)))
    bench("pallas grid-reps", f_grid, (a, b), G)

    R = 64

    def kern_unroll(a_ref, b_ref, o_ref):
        av = a_ref[:]
        bv = b_ref[:]
        acc = jnp.zeros((M, N), jnp.float32)

        def body(i, carry):
            acc, av = carry
            # 4 independent dots per iteration (distinct lhs offsets)
            for s in range(4):
                acc += jnp.dot(av + jnp.bfloat16(s), bv,
                               preferred_element_type=jnp.float32)
            return acc, av + jnp.bfloat16(1)
        acc, _ = jax.lax.fori_loop(0, R // 4, body, (acc, av))
        o_ref[:] = acc

    f_unroll = jax.jit(pl.pallas_call(
        kern_unroll,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)))
    bench("pallas fori-unroll4", f_unroll, (a, b), R)

    @jax.jit
    def f_xla(a, b):
        def body(c, _):
            return jnp.dot(c, b, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16), None
        return jax.lax.scan(body, a, None, length=G)[0]
    bench("XLA scan chained", f_xla, (a, b), G)


if __name__ == "__main__":
    main()
