"""Round 2 of attention lowering probes: plain int8 matmul rate, and
chunked VPU broadcast-multiply-reduce for batched GEMV."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, L, D = 512, 200, 128
REPS = 256


def fence(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def run(name, fn, *args, macs=None):
    def kern(*refs):
        out_ref = refs[-1]
        ins = [r[:] for r in refs[:-1]]

        def body(_, carry):
            acc, a = carry
            a = a + jnp.ones((), a.dtype)
            return acc + fn(a, *ins[1:]).astype(acc.dtype), a
        acc0 = jnp.zeros(out_ref.shape, jnp.float32)
        out, _ = jax.lax.fori_loop(0, REPS, body, (acc0, ins[0]))
        out_ref[:] = out.astype(out_ref.dtype)

    res = jax.eval_shape(lambda *a: fn(*a), *args)
    try:
        f = jax.jit(pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(res.shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)))
        fence(f(*args))
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters - 1):
            f(*args)
        fence(f(*args))
        dt = (time.perf_counter() - t0) / iters / REPS
        macs = macs or N * L * D
        print(f"  {name}: {dt*1e6:.1f} us/pass ({macs*2/dt/1e12:.2f} TFLOP/s)",
              flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:130]
        print(f"  {name}: FAIL {msg}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    kq = jax.random.PRNGKey(0)

    # -- plain (unbatched) int8 matmul: does it compile, what rate? --
    a8 = jax.random.randint(kq, (256, 1024), -127, 127, jnp.int8)
    b8 = jax.random.randint(kq, (1024, 1024), -127, 127, jnp.int8)
    ab = a8.astype(jnp.bfloat16)
    bb = b8.astype(jnp.bfloat16)
    mm = 256 * 1024 * 1024
    run("plain int8 matmul 256x1024x1024",
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32),
        a8, b8, macs=mm)
    run("plain bf16 matmul 256x1024x1024",
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
        ab, bb, macs=mm)

    # -- chunked VPU batched GEMV: q (N, d) x k_t (N, d, L) reduce over d --
    q8 = jax.random.randint(kq, (N, D), -127, 127, jnp.int8)
    k8_t = jax.random.randint(kq, (N, D, L), -127, 127, jnp.int8)
    kb_t = k8_t.astype(jnp.bfloat16)
    qf = q8.astype(jnp.float32)

    def vpu_chunked(q, kt, chunk=64):
        outs = []
        for c in range(N // chunk):
            qc = q[c * chunk:(c + 1) * chunk].astype(jnp.float32)
            kc = kt[c * chunk:(c + 1) * chunk].astype(jnp.float32)
            outs.append(jnp.sum(qc[:, :, None] * kc, axis=1))
        return jnp.concatenate(outs)

    run("VPU chunked64 f32 (from int8 kt)", vpu_chunked, qf, k8_t)
    run("VPU chunked64 f32 (from bf16 kt)", vpu_chunked, qf, kb_t)

    # -- batched GEMV with L as lanes and contraction via repeated fma --
    def vpu_fori(q, kt):
        # accumulate over d with fori to avoid the big broadcast intermediate
        def body(d, acc):
            return acc + q[:, d][:, None].astype(jnp.float32) * \
                kt[:, d, :].astype(jnp.float32)
        return jax.lax.fori_loop(0, D, body,
                                 jnp.zeros((N, L), jnp.float32))
    run("VPU fori-d f32 (int8 kt)", vpu_fori, qf, k8_t)

    # -- per-sample fori MXU matmuls (k (L,d) @ q (d,1)) --
    k8_s = jax.random.randint(kq, (N, L, D), -127, 127, jnp.int8)
    kb_s = k8_s.astype(jnp.bfloat16)
    qb2 = q8.astype(jnp.bfloat16)

    def mxu_per8(q, ks):
        # group 8 samples into the N(column) dim of one matmul each
        outs = []
        for c in range(N // 8):
            kc = ks[c * 8:(c + 1) * 8]          # (8, L, d)
            qc = q[c * 8:(c + 1) * 8]           # (8, d)
            s = jax.lax.dot_general(
                kc, qc.T, (((2,), (0,)), ()),
                preferred_element_type=jnp.float32)  # (8, L, 8)
            idx = jax.lax.broadcasted_iota(jnp.int32, (8, L, 8), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (8, L, 8), 2)
            outs.append(jnp.sum(jnp.where(idx == col, s, 0.0), axis=2))
        return jnp.concatenate(outs)
    run("MXU shared-cols x8 bf16", mxu_per8, qb2, kb_s)


if __name__ == "__main__":
    main()
