"""Scheduling probes: can more of the chip's GEMV rate be unlocked by
issuing independent dots (per L-chunk) or splitting work MXU/VPU?"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, L, D = 512, 256, 128
REPS = 256
dn = (((2,), (2,)), ((0,), (0,)))


def fence(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def run(name, fn, *args, elems=None):
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
                vmem_limit_bytes=110 * 1024 * 1024)))
        fence(f(*args))
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters - 1):
            f(*args)
        fence(f(*args))
        dt = (time.perf_counter() - t0) / iters / REPS
        elems = elems or N * L * D
        print(f"  {name}: {dt*1e6:.1f} us/pass "
              f"({elems/dt/1e9:.2f} Gelem/us... {elems/dt/1e3:.0f} Melem/ms)",
              flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:130]
        print(f"  {name}: FAIL {msg}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    kq = jax.random.PRNGKey(0)
    kb = jax.random.normal(kq, (N, L, D), jnp.bfloat16)

    for m in (1, 8, 32, 128):
        qm = jax.random.normal(kq, (N, m, D), jnp.bfloat16)
        run(f"M={m} batched", lambda a, b: jax.lax.dot_general(
            a, b, dn, preferred_element_type=jnp.float32), qm, kb)

    q1 = jax.random.normal(kq, (N, 1, D), jnp.bfloat16)

    def split4(a, b):
        outs = []
        for c in range(4):
            outs.append(jax.lax.dot_general(
                a, b[:, c * (L // 4):(c + 1) * (L // 4)], dn,
                preferred_element_type=jnp.float32))
        return jnp.concatenate(outs, axis=2)
    run("L-split x4 independent dots", split4, q1, kb)

    def mxu_vpu(a, b, frac=160):
        s1 = jax.lax.dot_general(
            a, b[:, :frac], dn, preferred_element_type=jnp.float32)
        # VPU half: chunked over N
        outs = []
        ch = 64
        for c in range(N // ch):
            qc = a[c * ch:(c + 1) * ch, 0].astype(jnp.float32)
            kc = b[c * ch:(c + 1) * ch, frac:].astype(jnp.float32)
            outs.append(jnp.einsum("nd,nld->nl", qc, kc))
        s2 = jnp.concatenate(outs)[:, None, :]
        return jnp.concatenate([s1, s2], axis=2)
    run("MXU 160 + VPU 96 split", mxu_vpu, q1, kb)

    # batch-dim as leading grid: two dots on independent halves of N
    def nsplit2(a, b):
        h = N // 2
        o1 = jax.lax.dot_general(a[:h], b[:h], dn,
                                 preferred_element_type=jnp.float32)
        o2 = jax.lax.dot_general(a[h:], b[h:], dn,
                                 preferred_element_type=jnp.float32)
        return jnp.concatenate([o1, o2])
    run("N-split x2 independent dots", nsplit2, q1, kb)


if __name__ == "__main__":
    main()
