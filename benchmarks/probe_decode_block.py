"""Time decode_block standalone (outside the while_loop) across K.

bench_speculative implies per-verify-iteration cost grows superlinearly in
K (9.0/12.8/26.6 ms at K=3/4/6) while a single greedy decode_step iteration
is ~4.2 ms.  This probe times the jitted decoder calls directly (20 reps,
device fence via host readback; the tunnel's per-dispatch floor is ~1.1 ms
— measured by probe_block_scatter) to separate per-op cost from loop
raggedness.

Run: python benchmarks/probe_decode_block.py
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from bench import load_params
    from mdcnet_tpu.config import large_preset
    from mdcnet_tpu.models import build_model

    batch = 256
    cfg = large_preset()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, vocab_size=332))
    model = build_model(cfg.model)
    params, workload, _ = load_params(model, cfg)
    print(f"workload={workload}", file=sys.stderr)
    decoder = model.decoder
    cache_len = decoder.max_len - 1

    enc = jax.random.normal(jax.random.PRNGKey(0),
                            (batch, 196, cfg.model.enc_out_dim), jnp.float32)
    mem_kvs = jax.jit(lambda p, e: model.apply(
        p, e, method=lambda m, x: m.decoder.prepare_memory(x)))(params, enc)

    pos_v = jax.random.randint(jax.random.PRNGKey(1), (batch,), 5, 90)
    tok1 = jnp.full((batch,), 300, jnp.int32)

    # NB: caches are created INSIDE jit — an eager init_cache materializes
    # ~52 MB x 16 host-side zeros and ships them through the tunnel, which
    # takes tens of minutes during a degraded window.
    @jax.jit
    def step(params):
        caches = decoder.init_cache(batch, cache_len)
        key_valid = (jnp.arange(cache_len)[None, :] <= 20)
        key_valid = jnp.broadcast_to(key_valid, (batch, cache_len))
        return model.apply(params, tok1, 20, caches, mem_kvs, key_valid,
                           method=lambda m, *a: m.decoder.decode_step(*a))[0]

    ms = bench(step, params)
    print(f"decode_step (scalar pos):      {ms:7.2f} ms")

    for k in (3, 4, 6, 8):
        toks = jnp.full((batch, k), 300, jnp.int32)

        @jax.jit
        def block(params, k=k, toks=toks):
            caches = decoder.init_cache(batch, cache_len + k)
            return model.apply(params, toks, pos_v, caches, mem_kvs,
                               method=lambda m, *a: m.decoder.decode_block(*a)
                               )[0]

        @jax.jit
        def block_split(params, k=k, toks=toks):
            caches = decoder.init_cache(batch, cache_len + k)
            return model.apply(params, toks, pos_v, caches, mem_kvs,
                               method=lambda m, *a:
                               m.decoder.decode_block_split(*a))[0]

        # ragged acceptance (the realistic in-loop case): acc < K rows route
        # their rejected lanes to the dump column under impl="scatter" —
        # duplicate indices force XLA's ordered serialized scatter lowering.
        # impl="unique" always writes all K lanes (duplicate-free).
        acc_ragged = jax.random.randint(jax.random.PRNGKey(2), (batch,),
                                        1, k + 1)

        def mk_commit(impl, acc):
            @jax.jit
            def split_commit(params, k=k, toks=toks):
                caches = decoder.init_cache(batch, cache_len + k)
                logits, blk_kvs = model.apply(
                    params, toks, pos_v, caches, mem_kvs,
                    method=lambda m, *a: m.decoder.decode_block_split(*a))
                return logits, decoder.commit_blocks(caches, blk_kvs,
                                                     pos_v, acc, impl=impl)
            return split_commit

        acc_full = jnp.full((batch,), k, jnp.int32)
        ms = bench(block, params)
        ms_s = bench(block_split, params)
        ms_c = bench(mk_commit("scatter", acc_full), params)
        ms_cr = bench(mk_commit("scatter", acc_ragged), params)
        ms_g = bench(mk_commit("gather", acc_ragged), params)
        ms_u = bench(mk_commit("unique", acc_ragged), params)
        print(f"K={k}: scatter-block={ms:7.2f}  split-noc={ms_s:7.2f}  "
              f"commit scatter-full={ms_c:7.2f} scatter-ragged={ms_cr:7.2f} "
              f"gather={ms_g:7.2f} unique={ms_u:7.2f} ms")


if __name__ == "__main__":
    main()
