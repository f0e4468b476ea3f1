"""In-loop per-iteration cost of the speculative verify body vs greedy.

The round-3/4 numbers (9.0/12.8/26.6 ms per verify block at K=3/4/6 vs
4.2 ms greedy) came from dividing while_loop wall time by n_iters — they
conflate per-iteration compute, buffer-aliasing copies, and anything else
the loop carries.  probe_weight_restage showed a bare weight-matmul chain
is FLAT in M (so the "weight re-staging" hypothesis does not reproduce in
isolation); this probe times a fixed-trip ``lax.fori_loop`` around each
decode body — greedy ``decode_step`` vs the full verify-block body
(``decode_block_split`` + argmax + ``commit_blocks`` + token scatter) —
which is exactly the compiled-loop context where the cost shows up, with
zero per-iteration dispatch overhead and no data-dependent trip counts.

Untrained params (geometry-identical; timing is shape-dependent only), so
there is no checkpoint restore and the probe starts fast.

Run: python benchmarks/probe_spec_inloop.py [--iters 20] [--batch 256]
"""
from __future__ import annotations

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timed(fn, *args, reps=3):
    out = fn(*args)   # compile + warm
    fence(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def cast_tree_bf16(params, keep_f32=("output",)):
    """Pre-cast float32 leaves to bf16 except subtrees named in keep_f32
    (the decoder head computes in f32).  With compute dtype bf16 this is
    numerically identical to flax's per-op cast."""
    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if (hasattr(tree, "dtype") and tree.dtype == jnp.float32
                and not any(k in keep_f32 for k in path)):
            return tree.astype(jnp.bfloat16)
        return tree
    return walk(params, ())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--ks", default="1,3,4,6,8")
    args = ap.parse_args()

    from mdcnet_tpu.config import large_preset
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.ops.sampling import top_k_top_p_filtering

    cfg = large_preset()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, vocab_size=332))
    model = build_model(cfg.model)
    decoder = model.decoder
    cache_len = decoder.max_len - 1
    batch, iters = args.batch, args.iters

    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((1, cfg.data.img_size, cfg.data.img_size, 3))
    tgt = jnp.zeros((1, cfg.data.max_len - 1), jnp.int32)
    params = jax.jit(model.init)({"params": rng}, images, tgt)
    params_bf16 = jax.jit(cast_tree_bf16)(params)
    fence(params_bf16)

    enc = jax.random.normal(jax.random.PRNGKey(1),
                            (batch, 196, cfg.model.enc_out_dim), jnp.float32)

    @jax.jit
    def prep(params, enc):
        return model.apply(params, enc,
                           method=lambda m, e: m.decoder.prepare_memory(e))

    mem_kvs = prep(params, enc)
    fence(mem_kvs)

    # ---- greedy decode_step, fori_loop(iters) --------------------------
    @functools.partial(jax.jit, static_argnames=())
    def greedy_loop(params, mem_kvs):
        caches = decoder.init_cache(batch, cache_len)
        tok0 = jnp.full((batch,), 300, jnp.int32)
        positions = jnp.arange(cache_len)[None, :]

        def body(i, carry):
            tok, caches = carry
            key_valid = ((positions <= i)
                         & jnp.ones((batch, 1), bool))
            logits, caches = model.apply(
                params, tok, i, caches, mem_kvs, key_valid,
                method=lambda m, *a: m.decoder.decode_step(*a))
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, caches)

        tok, caches = jax.lax.fori_loop(0, iters, body, (tok0, caches))
        return tok

    # ---- verify body (block_split + commit unique), fori_loop(iters) ---
    def make_spec_loop(k_blk, impl):
        @jax.jit
        def spec_loop(params, mem_kvs):
            caches = decoder.init_cache(batch, cache_len + k_blk)
            tok0 = jnp.full((batch, k_blk), 300, jnp.int32)
            pos0 = jnp.zeros((batch,), jnp.int32)
            rows = jnp.arange(batch)
            tokens = jnp.full((batch, cache_len + 1 + k_blk), 302, jnp.int32)

            def body(i, carry):
                toks, pos, caches, tokens = carry
                logits, blk_kvs = model.apply(
                    params, toks, pos, caches, mem_kvs,
                    method=lambda m, *a: m.decoder.decode_block_split(*a))
                filtered = top_k_top_p_filtering(
                    logits.reshape(batch * k_blk, -1), 0, 1.0
                ).reshape(batch, k_blk, -1)
                out = jnp.argmax(filtered, axis=-1).astype(jnp.int32)
                # accept 1..K tokens round-robin (shape-typical raggedness)
                acc = 1 + (rows + i) % k_blk
                caches = decoder.commit_blocks(caches, blk_kvs, pos, acc,
                                               impl=impl)
                j_idx = jnp.arange(k_blk)[None, :]
                if impl == "unique":
                    tcol = pos[:, None] + 1 + j_idx
                    tokens = tokens.at[rows[:, None], tcol].set(
                        out, unique_indices=True, mode="promise_in_bounds")
                else:
                    commit = j_idx < acc[:, None]
                    tcol = jnp.where(commit, pos[:, None] + 1 + j_idx,
                                     cache_len + k_blk)
                    tokens = tokens.at[rows[:, None], tcol].set(
                        jnp.where(commit, out,
                                  tokens[rows[:, None], tcol]))
                # wrap pos so iters fixed trips never overflow the cache
                pos = (pos + acc) % (cache_len - k_blk)
                toks = out
                return (toks, pos, caches, tokens)

            carry = jax.lax.fori_loop(0, iters, body,
                                      (tok0, pos0, caches, tokens))
            return carry[3]
        return spec_loop

    ms = timed(greedy_loop, params, mem_kvs) / iters
    ms_b = timed(greedy_loop, params_bf16, mem_kvs) / iters
    print(f"greedy step in-loop: f32 {ms:6.2f}  bf16-precast {ms_b:6.2f} "
          f"ms/iter", flush=True)

    for k in (int(s) for s in args.ks.split(",") if int(s) > 1):
        for impl in ("unique", "scatter"):
            loop = make_spec_loop(k, impl)
            ms = timed(loop, params, mem_kvs) / iters
            ms_b = timed(loop, params_bf16, mem_kvs) / iters
            print(f"verify K={k} impl={impl:8s}: f32 {ms:6.2f}  "
                  f"bf16-precast {ms_b:6.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
