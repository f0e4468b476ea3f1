"""Megakernel numerics: interpret-mode kernel vs a pure-jnp mirror.

The mirror applies the same op order and casts (bf16 dots over int8-stored
K/V with f32 per-position scales), so agreement is tight; compiled-TPU
equivalence to the XLA path is exercised by benchmarks/bench_megakernel.py
and the caption-identity check there.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.ops import megakernel as mk

L_LAYERS, B, H, DH = 2, 4, 2, 128
D = H * DH
FFN = 256
CACHE = 16
MEM_REAL, MEM_PAD = 10, 16


def rand_weights(rng):
    def r(*shape, scale=0.05):
        nonlocal rng
        rng, k = jax.random.split(rng)
        return (jax.random.normal(k, shape, jnp.float32) * scale)

    layers = {}
    for i in range(L_LAYERS):
        layers[f"layer{i}"] = {
            "self_attn": {p: {"kernel": r(D, D), "bias": r(D)}
                          for p in ("q_proj", "k_proj", "v_proj",
                                    "out_proj")},
            "cross_attn": {p: {"kernel": r(D, D), "bias": r(D)}
                           for p in ("q_proj", "k_proj", "v_proj",
                                     "out_proj")},
            "linear1": {"kernel": r(D, FFN), "bias": r(FFN)},
            "linear2": {"kernel": r(FFN, D), "bias": r(D)},
            "norm1": {"scale": 1.0 + r(D), "bias": r(D)},
            "norm2": {"scale": 1.0 + r(D), "bias": r(D)},
            "norm3": {"scale": 1.0 + r(D), "bias": r(D)},
        }
    return layers


def mirror_attend(q, kq, ks, vq, vs, extent, limit, cur=None):
    """q: (B, D) f32; kq/vq: (B, H, Lc, Dh) int8; ks/vs: (B, H, Sc) f32."""
    n = q.shape[0] * H
    qc = q.reshape(n, 1, DH).astype(jnp.bfloat16)
    kc = kq[:, :, :extent].reshape(n, extent, DH).astype(jnp.bfloat16)
    s = jax.lax.dot_general(qc, kc, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)[:, 0]
    # multiply order matches the kernel's ``s * (scale * ksc)`` exactly —
    # f32 non-associativity can flip a later bf16 rounding otherwise
    s = s * ((DH ** -0.5) * ks.reshape(n, -1)[:, :extent])
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, extent), 1)
    s = jnp.where(ids < limit, s, mk.NEG_INF)
    if cur is not None:
        k8, ksc_c, v8, vsc_c = cur
        kd = (k8.astype(jnp.float32) * ksc_c).astype(jnp.bfloat16)
        # bf16 dot like the kernel's s_cur (accumulation-order identical)
        s_cur = jax.lax.dot_general(
            qc, kd.reshape(n, 1, DH), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0] * (DH ** -0.5)
        m = jnp.maximum(jnp.max(s, -1, keepdims=True), s_cur)
        e, e_cur = jnp.exp(s - m), jnp.exp(s_cur - m)
        den = jnp.sum(e, -1, keepdims=True) + e_cur
        w, w_cur = e / den, e_cur / den
    else:
        m = jnp.max(s, -1, keepdims=True)
        e = jnp.exp(s - m)
        w = e / jnp.sum(e, -1, keepdims=True)
    wv = w * vs.reshape(n, -1)[:, :extent]
    wv = jnp.where(ids < limit, wv, 0.0)
    vc = vq[:, :, :extent].reshape(n, extent, DH).astype(jnp.bfloat16)
    o = jax.lax.dot_general(wv.astype(jnp.bfloat16)[:, None], vc,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)[:, 0]
    if cur is not None:
        o = o + w_cur * (v8.astype(jnp.float32) * vsc_c)
    return o.reshape(-1, D)


def mirror_step(w: mk.StackedDecoder, x, self_kv: mk.StackedKV,
                mem_kv: mk.StackedKV, pos):
    outs = []
    # wsc row indices mirror the kernel: qkv | o_s | q_c | o_c | w1 | w2
    for l in range(L_LAYERS):
        def mm(a, wgt, b, sc_row, width):
            y = jnp.dot(a.astype(jnp.bfloat16), wgt[l].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return y * w.wsc[l, sc_row, :width][None, :] + b[l]

        qkv = mm(x, w.wqkv, w.bqkv, 0, 3 * D).astype(jnp.bfloat16)
        # qkv scratch
        q, k_new, v_new = (qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:])
        k8, ksc = mk._rowquant(
            k_new.reshape(B * H, DH).astype(jnp.float32))
        v8, vsc = mk._rowquant(
            v_new.reshape(B * H, DH).astype(jnp.float32))
        outs.append((k8, ksc, v8, vsc))
        fast_ext = min(16, CACHE)  # must track fused_decode_step's choice
        extent = fast_ext if pos < fast_ext else CACHE
        attn = mirror_attend(q, self_kv.k[l], self_kv.k_scale[l],
                             self_kv.v[l], self_kv.v_scale[l],
                             extent, pos, cur=(k8, ksc, v8, vsc))
        x = mk._ln(x + mm(attn, w.wo_s, w.bo_s, 1, D),
                   w.ln[l, 0], w.ln[l, 1])
        qc = mm(x, w.wq_c, w.bq_c, 2, D)
        attn = mirror_attend(qc, mem_kv.k[l], mem_kv.k_scale[l],
                             mem_kv.v[l], mem_kv.v_scale[l],
                             MEM_PAD, MEM_REAL)
        x = mk._ln(x + mm(attn, w.wo_c, w.bo_c, 3, D),
                   w.ln[l, 2], w.ln[l, 3])
        ff = jnp.maximum(mm(x, w.w1, w.b1, 4, FFN), 0.0)
        x = mk._ln(x + mm(ff, w.w2, w.b2, 5, D), w.ln[l, 4], w.ln[l, 5])
    return x, outs


def run_mirror(w, x, self_kv, mem_kv, pos):
    """mirror_step evaluated INSIDE a trivial interpret-mode pallas_call:
    pallas interpret lowers jnp ops slightly differently from raw XLA:CPU
    (~1e-8 seeds that int8 re-quantization at the next layer amplifies to
    ~1e-3), so sharing the lowering makes kernel-vs-mirror bit-exact."""
    from jax.experimental import pallas as pl
    flat, treedef = jax.tree_util.tree_flatten((w, self_kv, mem_kv))

    def kern(*refs):
        in_refs, x_ref = refs[: len(flat)], refs[len(flat)]
        out_refs = refs[len(flat) + 1:]
        wt, skv, mkv = jax.tree_util.tree_unflatten(
            treedef, [r[:] for r in in_refs])
        x_out, outs = mirror_step(wt, x_ref[:], skv, mkv, pos)
        out_refs[0][:] = x_out
        for l, (k8, ksc, v8, vsc) in enumerate(outs):
            out_refs[1 + 4 * l][:] = k8
            out_refs[2 + 4 * l][:] = ksc
            out_refs[3 + 4 * l][:] = v8
            out_refs[4 + 4 * l][:] = vsc

    out_shape = [jax.ShapeDtypeStruct(x.shape, x.dtype)]
    for _ in range(L_LAYERS):
        out_shape += [jax.ShapeDtypeStruct((B * H, DH), jnp.int8),
                      jax.ShapeDtypeStruct((B * H, 1), jnp.float32),
                      jax.ShapeDtypeStruct((B * H, DH), jnp.int8),
                      jax.ShapeDtypeStruct((B * H, 1), jnp.float32)]
    res = pl.pallas_call(kern, out_shape=out_shape, interpret=True
                         )(*flat, x)
    x_ref, rest = res[0], res[1:]
    kv_ref = [tuple(rest[4 * l: 4 * l + 4]) for l in range(L_LAYERS)]
    return x_ref, kv_ref


@pytest.mark.parametrize("pos", [0, 3, 15])
def test_fused_step_matches_mirror(pos):
    rng = jax.random.PRNGKey(42)
    params = rand_weights(rng)
    w = mk.stack_decoder_weights(params, L_LAYERS)

    rng, k1, k2, k3 = jax.random.split(rng, 4)
    x = jax.random.normal(k1, (B, D), jnp.float32)

    # live caches: quantized random K/V in the first `pos` slots
    kv_layers = [(jax.random.normal(jax.random.fold_in(k2, l),
                                    (B, H, CACHE, DH)) * 0.3,
                  jax.random.normal(jax.random.fold_in(k2, 100 + l),
                                    (B, H, CACHE, DH)) * 0.3)
                 for l in range(L_LAYERS)]
    self_kv = mk.quantize_stacked(kv_layers, CACHE)

    mem_layers = [(jax.random.normal(jax.random.fold_in(k3, l),
                                     (B, H, MEM_REAL, DH)) * 0.3,
                   jax.random.normal(jax.random.fold_in(k3, 100 + l),
                                     (B, H, MEM_REAL, DH)) * 0.3)
                  for l in range(L_LAYERS)]
    mem_kv = mk.quantize_stacked(mem_layers, MEM_PAD)

    x_out, k_new, v_new, k_sc, v_sc = mk.fused_decode_step(
        w, x, self_kv, mem_kv, pos,
        num_layers=L_LAYERS, heads=H, mem_len=MEM_REAL, chunk=2,
        interpret=True)

    x_ref, kv_ref = run_mirror(w, x, self_kv, mem_kv, pos)

    np.testing.assert_allclose(np.asarray(x_out), np.asarray(x_ref),
                               rtol=1e-6, atol=1e-6)
    for l in range(L_LAYERS):
        k8, ksc, v8, vsc = kv_ref[l]
        np.testing.assert_array_equal(np.asarray(k_new[l]),
                                      np.asarray(k8.reshape(B, D)))
        np.testing.assert_array_equal(np.asarray(v_new[l]),
                                      np.asarray(v8.reshape(B, D)))
        np.testing.assert_allclose(np.asarray(k_sc[l]),
                                   np.asarray(ksc.reshape(B, H)), rtol=1e-6)


class TestGenerateIntegration:
    def _build(self):
        import dataclasses
        from mdcnet_tpu.config import test_preset
        from mdcnet_tpu.models import build_model
        cfg = test_preset()
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, enc_out_dim=256, dec_dim=256, dec_heads=2,
            dec_layers=2, dtype="float32"))
        model = build_model(cfg.model)
        rng = jax.random.PRNGKey(7)
        images = jax.random.uniform(
            rng, (4, cfg.data.img_size, cfg.data.img_size, 3))
        params = model.init({"params": rng}, images,
                            jnp.zeros((4, cfg.data.max_len - 1), jnp.int32))
        return model, params, images, cfg

    def test_tokens_track_xla_path(self):
        """Int8-quantized megakernel generation matches the exact path's
        greedy tokens on a (deterministic, peaked-logit-free) tiny model up
        to quantization noise: first-step logits close, sequences mostly
        identical."""
        from mdcnet_tpu.infer.generate import generate, generate_megakernel
        model, params, images, cfg = self._build()
        rng = jax.random.PRNGKey(0)
        ref = generate(model, params, images, rng, steps=8, greedy=True,
                       early_exit=False)
        encoder_out = model.apply(params, images, method="encode")
        got = generate_megakernel(model, params, encoder_out, rng, steps=8,
                                  greedy=True, early_exit=False)
        assert got.tokens.shape == ref.tokens.shape
        agree = np.mean(np.asarray(got.tokens) == np.asarray(ref.tokens))
        assert agree >= 0.7, f"token agreement {agree}"
        # confidences of agreeing positions should be close
        assert np.allclose(np.asarray(got.confs), np.asarray(ref.confs),
                           atol=0.1)


def test_cache_update_roundtrip():
    cache = mk.init_stacked_cache(L_LAYERS, B, H, CACHE, DH)
    k_new = jnp.ones((L_LAYERS, B, D), jnp.int8) * 5
    v_new = jnp.ones((L_LAYERS, B, D), jnp.int8) * 7
    ksc = jnp.full((L_LAYERS, B, H), 0.5)
    vsc = jnp.full((L_LAYERS, B, H), 0.25)
    out = mk.update_stacked_cache(cache, k_new, v_new, ksc, vsc, 3)
    assert int(out.k[1, 2, 1, 3, 10]) == 5
    assert int(out.v[0, 0, 0, 3, 0]) == 7
    assert float(out.k_scale[1, 2, 1, 3]) == 0.5
    assert int(out.k[0, 0, 0, 2, 0]) == 0


def test_fused_step_slow_path_matches_mirror():
    """pos >= fast_ext exercises the chunked full-extent self fallback."""
    global CACHE
    old = CACHE
    CACHE = 48
    try:
        test_fused_step_matches_mirror(40)
    finally:
        CACHE = old


def test_fused_step_flagship_geometry():
    """Per-step numerics at the flagship decoder geometry (dim 1024 /
    8 heads / FFN 2048, trail_01.py:158-160) — small batch/cache so the
    interpret-mode run stays tractable, but every lane/sublane dimension
    matches production.  A megakernel numerics regression fails HERE, in
    the suite, not just in the on-chip benchmark."""
    global L_LAYERS, B, H, DH, D, FFN, CACHE, MEM_REAL, MEM_PAD
    saved = (L_LAYERS, B, H, DH, D, FFN, CACHE, MEM_REAL, MEM_PAD)
    L_LAYERS, B, H, DH = 2, 8, 8, 128
    D = H * DH
    FFN = 2 * D
    CACHE, MEM_REAL, MEM_PAD = 24, 196, 200
    try:
        for pos in (5, 20):  # fast path and chunked fallback
            test_fused_step_matches_mirror(pos)
    finally:
        (L_LAYERS, B, H, DH, D, FFN, CACHE, MEM_REAL, MEM_PAD) = saved
