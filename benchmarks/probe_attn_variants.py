"""Find the fastest compiling lowering for decode attention's batched matvec
(N=512 rows, L=200 keys, d=128) with int8 K in VMEM."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, L, D = 512, 200, 128
REPS = 512


def fence(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def run(name, fn, *args):
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
        macs = N * L * D
        print(f"  {name}: {dt*1e6:.1f} us/pass ({macs*2/dt/1e12:.2f} TFLOP/s)",
              flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:130]
        print(f"  {name}: FAIL {msg}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    kq = jax.random.PRNGKey(0)
    q8 = jax.random.randint(kq, (N, 1, D), -127, 127, jnp.int8)
    q8_m8 = jax.random.randint(kq, (N, 8, D), -127, 127, jnp.int8)
    k8 = jax.random.randint(kq, (N, L, D), -127, 127, jnp.int8)
    qb = q8.astype(jnp.bfloat16)
    qb_m8 = q8_m8.astype(jnp.bfloat16)
    kb = k8.astype(jnp.bfloat16)

    dn = (((2,), (2,)), ((0,), (0,)))

    run("int8xint8 M=1 -> int32", lambda a, b: jax.lax.dot_general(
        a, b, dn, preferred_element_type=jnp.int32), q8, k8)
    run("int8xint8 M=8 -> int32", lambda a, b: jax.lax.dot_general(
        a, b, dn, preferred_element_type=jnp.int32), q8_m8, k8)
    run("int8xint8 M=1 -> f32", lambda a, b: jax.lax.dot_general(
        a, b, dn, preferred_element_type=jnp.float32), q8, k8)
    run("bf16 M=8", lambda a, b: jax.lax.dot_general(
        a, b, dn, preferred_element_type=jnp.float32), qb_m8, kb)
    run("bf16 M=1 k-from-int8", lambda a, b: jax.lax.dot_general(
        a, b.astype(jnp.bfloat16), dn,
        preferred_element_type=jnp.float32), qb, k8)
    run("bf16 M=1 (baseline)", lambda a, b: jax.lax.dot_general(
        a, b, dn, preferred_element_type=jnp.float32), qb, kb)
    # VPU: d on sublanes via transpose layout (N, d, L) precomputed
    k8_t = jnp.swapaxes(k8, 1, 2)  # (N, D, L)
    kb_t = k8_t.astype(jnp.bfloat16)
    run("VPU bcast-mul-reduce (N,d,L) f32",
        lambda a, b: jnp.sum(a.astype(jnp.float32)[:, :, None]
                             * b.astype(jnp.float32),
                             axis=1)[:, None, :], q8[:, 0], k8_t)
    run("VPU einsum nd,ndl->nl bf16",
        lambda a, b: jnp.einsum("nd,ndl->nl", a[:, 0], b,
                                preferred_element_type=jnp.float32
                                )[:, None, :], qb, kb_t)


if __name__ == "__main__":
    main()
