"""Empirical probes that size the whole-step decode megakernel.

Answers three questions on the real chip (see docs/PERF.md):
  1. How much VMEM can one pallas_call actually use?  (v5e spec is 128 MiB;
     Mosaic's default limit is lower)
  2. What HBM read bandwidth does a grid-pipelined int8 streaming kernel
     reach (the megakernel's traffic is ~90%% int8 reads)?
  3. What is the fixed cost of one pallas_call inside a lax.scan step
     (one call per decode step in the megakernel design)?

Timing fences use device->host readbacks: over the axon tunnel
``block_until_ready`` does NOT synchronize.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fence(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def probe_vmem():
    """Binary-search the largest single VMEM scratch a kernel can hold."""
    print("== VMEM capacity ==", flush=True)
    for mb in (16, 32, 64, 96, 112, 120, 128):
        n = mb * 1024 * 1024 // 4

        def kern(o_ref, scratch):
            scratch[0:8, :] = jnp.ones((8, 128), jnp.float32)
            o_ref[:] = scratch[0:8, :]

        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((n // 128, 128), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=134217728),
            )()
            fence(out)
            print(f"  {mb} MiB scratch: OK", flush=True)
        except Exception as e:
            print(f"  {mb} MiB scratch: FAIL ({str(e)[:120]})", flush=True)
            break


def probe_stream_bw(total_mb: int = 1024):
    """Grid-pipelined int8 read: rows x 1024 int8, block over rows.

    Touches only 8 rows per block on the VPU so the measurement is pure DMA
    (the full block is still fetched by the pipeline)."""
    print("== int8 streaming read bandwidth ==", flush=True)
    rows = total_mb * 1024
    x = jnp.ones((rows, 1024), jnp.int8)

    def kern(x_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros((8, 1024), jnp.float32)
        o_ref[:] += x_ref[0:8, :].astype(jnp.float32)

    reps = 16  # inside one jit: dispatch over the tunnel is ~3 ms and would
    # otherwise dominate a ~1.3 ms full-bandwidth sweep
    for block_rows in (512, 2048):
        pc = pl.pallas_call(
            kern,
            grid=(rows // block_rows,),
            in_specs=[pl.BlockSpec((block_rows, 1024), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 1024), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        @jax.jit
        def f(x):
            def body(c, _):
                return c + pc(x)[0, 0], None
            return jax.lax.scan(body, jnp.float32(0), None, length=reps)[0]

        fence(f(x))
        iters = 4
        t0 = time.perf_counter()
        for _ in range(iters - 1):
            f(x)
        fence(f(x))
        dt = (time.perf_counter() - t0) / iters / reps
        gbps = total_mb / 1024 / dt
        print(f"  {total_mb} MiB in {dt*1e3:.2f} ms -> {gbps:.0f} GB/s "
              f"(block_rows={block_rows})", flush=True)


def probe_call_overhead(n_calls: int = 98):
    """scan of n steps, each one trivial pallas_call vs pure-XLA body."""
    print("== per-call overhead in scan ==", flush=True)
    x = jnp.ones((256, 1024), jnp.float32)

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 1.0001

    pcall = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, 1024), jnp.float32))

    @jax.jit
    def scan_pallas(x):
        def body(c, _):
            return pcall(c), None
        return jax.lax.scan(body, x, None, length=n_calls)[0]

    @jax.jit
    def scan_xla(x):
        def body(c, _):
            return c * 1.0001, None
        return jax.lax.scan(body, x, None, length=n_calls)[0]

    for name, f in (("pallas", scan_pallas), ("xla", scan_xla)):
        fence(f(x))
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters - 1):
            f(x)
        fence(f(x))
        dt = (time.perf_counter() - t0) / iters
        print(f"  {name}: {dt*1e3:.3f} ms / {n_calls} steps = "
              f"{dt/n_calls*1e6:.1f} us/step", flush=True)


def probe_batched_matvec(n: int = 512, length: int = 200, d: int = 128,
                         reps: int = 512):
    """Decode attention's inner shape: N batched (1,d)x(d,L) matvecs.

    Which unit can sustain it?  Reps loop inside the kernel over the same
    VMEM block isolates compute from HBM traffic.  Per-rep work equals one
    cross-attention score pass for one layer at batch block N/H.
    """
    print(f"== batched matvec (N={n}, L={length}, d={d}) ==", flush=True)
    kq = jax.random.PRNGKey(0)
    q8 = jax.random.randint(kq, (n, 1, d), -127, 127, jnp.int8)
    k8 = jax.random.randint(kq, (n, length, d), -127, 127, jnp.int8)
    qb = q8.astype(jnp.bfloat16)
    kb = k8.astype(jnp.bfloat16)
    w32 = jax.random.uniform(kq, (n, 1, length), jnp.float32)

    dn_qk = (((2,), (2,)), ((0,), (0,)))   # contract d, batch N
    dn_wv = (((2,), (1,)), ((0,), (0,)))   # contract L, batch N

    def make(fn, *args):
        def kern(*refs):
            out_ref = refs[-1]
            ins = [r[:] for r in refs[:-1]]

            # loop-carried lhs so the compiler cannot hoist the dot out
            def body(_, carry):
                acc, a = carry
                a = a + jnp.ones((), a.dtype)
                return acc + fn(a, *ins[1:]), a
            acc0 = jnp.zeros(out_ref.shape, out_ref.dtype)
            out, _ = jax.lax.fori_loop(0, reps, body, (acc0, ins[0]))
            out_ref[:] = out.astype(out_ref.dtype)

        probe_dtype = fn(*args).dtype
        f = jax.jit(pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(fn(*args).shape, probe_dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)))
        return f, args

    cases = {
        "int8 MXU qk": (lambda a, b: jax.lax.dot_general(
            a, b, dn_qk, preferred_element_type=jnp.int32), q8, k8),
        "bf16 MXU qk": (lambda a, b: jax.lax.dot_general(
            a, b, dn_qk, preferred_element_type=jnp.float32), qb, kb),
        "VPU f32 qk": (lambda a, b: jnp.sum(
            a.astype(jnp.float32) * b.astype(jnp.float32),
            axis=-1, keepdims=True).transpose(0, 2, 1), q8, k8),
        "f32 wv MXU": (lambda w, b: jax.lax.dot_general(
            w, b.astype(jnp.float32), dn_wv,
            preferred_element_type=jnp.float32), w32, k8),
        "int8 wv MXU": (lambda w, b: jax.lax.dot_general(
            (w * 127).astype(jnp.int8), b, dn_wv,
            preferred_element_type=jnp.int32), w32, k8),
    }
    for name, (fn, *args) in cases.items():
        try:
            f, a = make(fn, *args)
            fence(f(*a))
            iters = 3
            t0 = time.perf_counter()
            for _ in range(iters - 1):
                f(*a)
            fence(f(*a))
            dt = (time.perf_counter() - t0) / iters / reps
            macs = n * length * d
            print(f"  {name}: {dt*1e6:.1f} us/pass "
                  f"({macs*2/dt/1e12:.2f} TFLOP/s)", flush=True)
        except Exception as e:
            print(f"  {name}: FAIL {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    probe_vmem()
    probe_stream_bw()
    probe_call_overhead()
    probe_batched_matvec()
