"""Model forward/predict semantics and numerics tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.config import BOS_ID, PAD_ID, test_preset
from mdcnet_tpu.models import build_model, interpolate_pos_embed
from mdcnet_tpu.models.encdec import patch_dropout_mask
from mdcnet_tpu.models.vit import adaptive_pool_matrix


@pytest.fixture(scope="module")
def small_model():
    cfg = test_preset().model
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((2, cfg.img_size, cfg.img_size, 3))
    tgt = jnp.zeros((2, 10), jnp.int32)
    params = model.init({"params": rng}, images, tgt)
    return cfg, model, params


class TestShapes:
    def test_forward_prepends_bos(self, small_model):
        cfg, model, params = small_model
        images = jnp.ones((2, cfg.img_size, cfg.img_size, 3)) * 0.1
        tgt = jnp.array([[300, 303, 270, 304, 263, 1, 1, 9, 9, 301]] * 2,
                        jnp.int32)
        logits = model.apply(params, images, tgt)
        # (B, L+1, V): BOS column prepended (model.py:60-61)
        assert logits.shape == (2, 11, cfg.vocab_size)

    def test_predict_shape_and_bos_row(self, small_model):
        cfg, model, params = small_model
        images = jnp.ones((2, cfg.img_size, cfg.img_size, 3)) * 0.1
        prefix = jnp.array([[BOS_ID, 303, 270]] * 2, jnp.int32)
        out = model.apply(params, images, prefix, method="predict")
        assert out.shape == (2, cfg.max_len - 1, cfg.vocab_size)
        # first row is the pseudo-logit BOS splice (model.py:117-123)
        assert np.all(np.asarray(out[:, 0]) == float(BOS_ID))

    def test_encoder_output_geometry(self, small_model):
        cfg, model, params = small_model
        images = jnp.ones((2, cfg.img_size, cfg.img_size, 3))
        enc = model.apply(params, images, method="encode")
        assert enc.shape == (2, cfg.num_patches, cfg.enc_out_dim)


class TestAdaptivePool:
    @pytest.mark.parametrize("in_dim,out_dim", [(512, 1024), (1024, 256),
                                                (512, 512), (768, 64)])
    def test_matches_torch_adaptive_avg_pool(self, in_dim, out_dim):
        torch = pytest.importorskip("torch")
        x = np.random.default_rng(0).normal(size=(2, 7, in_dim)).astype(np.float32)
        want = torch.nn.AdaptiveAvgPool1d(out_dim)(torch.tensor(x)).numpy()
        got = x @ adaptive_pool_matrix(in_dim, out_dim)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestPosEmbedInterp:
    @pytest.mark.parametrize("new_len", [5, 23, 99, 150])
    def test_matches_torch_linear_interpolate(self, new_len):
        torch = pytest.importorskip("torch")
        pos = np.random.default_rng(1).normal(size=(1, 99, 16)).astype(np.float32)
        want = torch.nn.functional.interpolate(
            torch.tensor(pos).permute(0, 2, 1), size=new_len, mode="linear",
            align_corners=False).permute(0, 2, 1).numpy()
        got = np.asarray(interpolate_pos_embed(jnp.asarray(pos), new_len))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestPatchDropout:
    def test_masks_exactly_k_patches_per_sample(self):
        rng = jax.random.PRNGKey(0)
        mask = patch_dropout_mask(rng, batch=8, num_patches=196, rate=0.02)
        zeros_per_row = np.asarray((mask[..., 0] == 0).sum(axis=1))
        assert np.all(zeros_per_row == max(1, int(196 * 0.02)))

    def test_applied_only_in_training(self, small_model):
        cfg, model, params = small_model
        images = jnp.ones((2, cfg.img_size, cfg.img_size, 3)) * 0.3
        tgt = jnp.array([[300, 303, 270, 304]] * 2, jnp.int32)
        eval_logits = model.apply(params, images, tgt, deterministic=True)
        train_logits = model.apply(
            params, images, tgt, deterministic=False,
            rngs={"patch_dropout": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(eval_logits),
                               np.asarray(train_logits))
        # eval path is deterministic
        eval2 = model.apply(params, images, tgt, deterministic=True)
        np.testing.assert_array_equal(np.asarray(eval_logits), np.asarray(eval2))


class TestMaskingBehavior:
    def test_causal(self, small_model):
        """Changing a later target token must not affect earlier logits."""
        cfg, model, params = small_model
        images = jnp.ones((2, cfg.img_size, cfg.img_size, 3)) * 0.1
        tgt1 = jnp.array([[300, 303, 270, 271, 304, 263]] * 2, jnp.int32)
        tgt2 = tgt1.at[:, -1].set(261)
        l1 = model.apply(params, images, tgt1)
        l2 = model.apply(params, images, tgt2)
        np.testing.assert_allclose(np.asarray(l1[:, :6]),
                                   np.asarray(l2[:, :6]), atol=1e-6)

    def test_predict_prefix_logits_independent_of_prefix_length(self, small_model):
        """predict pads to max_len-1 (model.py:92-95); logits at the original
        prefix positions must not change when the prefix grows — the property
        KV-cached generation relies on."""
        cfg, model, params = small_model
        images = jnp.ones((2, cfg.img_size, cfg.img_size, 3)) * 0.1
        short = jnp.array([[BOS_ID, 303, 270, 304]] * 2, jnp.int32)
        longer = jnp.concatenate(
            [short, jnp.array([[263, 5]] * 2, jnp.int32)], axis=1)
        ls = model.apply(params, images, short, method="predict")
        ll = model.apply(params, images, longer, method="predict")
        np.testing.assert_allclose(np.asarray(ls[:, :5]), np.asarray(ll[:, :5]),
                                   rtol=2e-4, atol=2e-5)


class TestFusedPrefill:
    def test_matches_per_layer_projections(self, small_model):
        """prepare_memory with the fused (D, 2*n_layers*D) K/V matmul must
        equal the per-layer project_kv path exactly (f32: identical
        reductions per output column)."""
        import dataclasses

        cfg, model, params = small_model
        images = jnp.ones((2, cfg.img_size, cfg.img_size, 3)) * 0.3
        enc = model.apply(params, images, method="encode")

        model_ref = build_model(dataclasses.replace(cfg,
                                                    dec_fuse_prefill=False))
        fused = model.apply(
            params, enc, method=lambda m, e: m.decoder.prepare_memory(e))
        plain = model_ref.apply(
            params, enc, method=lambda m, e: m.decoder.prepare_memory(e))
        for (kf, vf), (kp, vp) in zip(fused, plain):
            np.testing.assert_allclose(np.asarray(kf), np.asarray(kp),
                                       rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(np.asarray(vf), np.asarray(vp),
                                       rtol=1e-6, atol=1e-6)


class TestAxialVariant:
    def test_no_bos_prepend_and_runs(self):
        cfg = test_preset().model
        cfg = type(cfg)(**{**cfg.__dict__, "axial": True})
        model = build_model(cfg)
        rng = jax.random.PRNGKey(0)
        images = jnp.zeros((2, cfg.img_size, cfg.img_size, 3))
        tgt = jnp.zeros((2, 10), jnp.int32)
        params = model.init({"params": rng}, images, tgt)
        logits = model.apply(params, images, tgt)
        # no BOS prepend (axial_model.py:88-101): L stays 10
        assert logits.shape == (2, 10, cfg.vocab_size)


def test_adapt_params_resolution():
    """A checkpoint's patch-grid pos embeds re-gridded to a new image size
    must drive the higher-resolution model end to end, and the re-grid must
    follow the runtime bilinear law (vit._pos / jax.image.resize)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mdcnet_tpu.config import test_preset
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.models.encdec import adapt_params_resolution

    cfg = test_preset().model
    model32 = build_model(cfg)
    images32 = jax.random.uniform(jax.random.PRNGKey(0),
                                  (2, cfg.img_size, cfg.img_size, 3))
    params32 = model32.init({"params": jax.random.PRNGKey(1)}, images32,
                            jnp.zeros((2, 8), jnp.int32))

    size2 = cfg.img_size * 2
    n2 = (size2 // cfg.patch_size) ** 2
    cfg2 = dc.replace(cfg, img_size=size2, num_patches=n2)
    model64 = build_model(cfg2)
    params64 = adapt_params_resolution(params32, n2)

    pe = params64["params"]["encoder"]["pos_embed"]
    de = params64["params"]["decoder"]["encoder_pos_embed"]
    assert pe.shape[1] == n2 and de.shape[1] == n2
    # matches the bilinear grid law directly
    old = params32["params"]["encoder"]["pos_embed"]
    s_old = int(old.shape[1] ** 0.5)
    s_new = int(n2 ** 0.5)
    want = jax.image.resize(old.reshape(1, s_old, s_old, -1),
                            (1, s_new, s_new, old.shape[-1]),
                            "bilinear").reshape(1, n2, -1)
    np.testing.assert_allclose(np.asarray(pe), np.asarray(want), atol=1e-6)

    images64 = jax.random.uniform(jax.random.PRNGKey(2), (2, size2, size2, 3))
    out = model64.apply(params64, images64, jnp.zeros((2, 8), jnp.int32))
    assert out.shape == (2, 9, cfg.vocab_size)
    assert np.isfinite(np.asarray(out)).all()


def test_fold_prefill_matches_standard():
    """Folded cross-K/V prefill (bottleneck folded into the K/V projection)
    must match prepare_memory(encode(images)) numerically, and the folded
    generate() must emit the same greedy tokens — with a REAL bottleneck
    (enc_dim != out_dim, like the flagship 512->1024)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mdcnet_tpu.config import test_preset
    from mdcnet_tpu.infer.generate import (
        generate, prepare_memory_folded_from_images)
    from mdcnet_tpu.models import build_model

    cfg = dc.replace(test_preset().model, enc_out_dim=48, dec_dim=48,
                     enc_dim=32)
    model = build_model(cfg)
    images = jax.random.uniform(jax.random.PRNGKey(0),
                                (2, cfg.img_size, cfg.img_size, 3))
    params = model.init({"params": jax.random.PRNGKey(1)}, images,
                        jnp.zeros((2, 8), jnp.int32))

    std = model.apply(params, model.apply(params, images, method="encode"),
                      method=lambda m, e: m.decoder.prepare_memory(e))
    fold, batch = prepare_memory_folded_from_images(model, params, images)
    assert batch == 2
    for (ks, vs), (kf, vf) in zip(std, fold):
        np.testing.assert_allclose(np.asarray(ks), np.asarray(kf),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vf),
                                   atol=1e-5, rtol=1e-5)

    a = generate(model, params, images, jax.random.PRNGKey(2), steps=10,
                 greedy=True)
    b = generate(model, params, images, jax.random.PRNGKey(2), steps=10,
                 greedy=True, fold_prefill=True)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))


def test_int8_encoder_projections():
    """ops/int8.py dynamic int8 matmul: bounded relative error at the op
    level, and the ViTBlock int8_mm knob produces a close-but-not-identical
    block output (param tree unchanged — same params apply to both)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mdcnet_tpu.models.vit import ViTBlock
    from mdcnet_tpu.ops.int8 import int8_matmul

    x = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 96)) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(2), (96,))
    exact = np.asarray(x @ w + b)
    got = np.asarray(int8_matmul(x, w, b))
    rel = np.abs(got - exact) / (np.abs(exact) + 1e-2)
    assert np.median(rel) < 0.02, np.median(rel)

    # block level with LayerScale 1.0 so the branch contribution is visible
    # (at the untrained 1e-6 init the int8 noise vanishes below f32 eps)
    xb = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 64), jnp.float32)
    blk = ViTBlock(dim=64, num_heads=2, fuse_qkv=True, layerscale_init=1.0)
    blk8 = ViTBlock(dim=64, num_heads=2, fuse_qkv=True, layerscale_init=1.0,
                    int8_mm=True)
    p = blk.init(jax.random.PRNGKey(4), xb)
    o = np.asarray(blk.apply(p, xb))
    o8 = np.asarray(blk8.apply(p, xb))
    d = np.abs(o - o8)
    assert d.max() > 0, "int8 path did not engage"
    assert np.median(d / (np.abs(o) + 1e-2)) < 0.05, d.max()


def test_int8_static_calibrated_encoder():
    """Static-calibrated int8 (enc_int8_static): calibrate_encoder produces
    per-block (4,) amax vectors; injecting the calib collection changes the
    encoder output by a bounded amount vs the exact path; without the
    collection the static knob falls back to the exact path bit-for-bit.
    Covers both the scan_blocks and unrolled stacks."""
    import dataclasses

    from mdcnet_tpu.ops.int8 import (calibrate_encoder, load_calib,
                                     save_calib)

    cfg = test_preset().model
    cfg = dataclasses.replace(cfg, enc_scan_blocks=True)
    model = build_model(cfg)
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), images,
                        jnp.zeros((2, 4), jnp.int32))
    exact = np.asarray(model.apply(params, images, method="encode"))

    calib = calibrate_encoder(cfg, params, [images])
    amaxes = np.concatenate([np.asarray(b["amax"])
                             for b in calib["encoder"].values()])
    assert amaxes.shape == (cfg.enc_depth * 4,)
    assert (amaxes > 0).all() and np.isfinite(amaxes).all()

    for scan in (True, False):
        m8 = build_model(dataclasses.replace(cfg, enc_int8_static=True,
                                             enc_scan_blocks=scan))
        got = np.asarray(m8.apply({**params, "calib": calib}, images,
                                  method="encode"))
        d = np.abs(got - exact)
        assert d.max() > 0, "static int8 path did not engage"
        assert np.median(d / (np.abs(exact) + 1e-2)) < 0.08, d.max()
        # absent collection -> exact fallback
        fb = np.asarray(m8.apply(params, images, method="encode"))
        np.testing.assert_array_equal(fb, exact)

    # JSON round-trip
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".json", mode="w",
                                     delete=False) as f:
        path = f.name
    save_calib(calib, path)
    loaded = load_calib(path)
    for name, blk in calib["encoder"].items():
        np.testing.assert_allclose(np.asarray(loaded["encoder"][name]["amax"]),
                                   np.asarray(blk["amax"]), rtol=1e-6)


def test_decoder_bf16_precast_bitwise():
    """cast_decoder_params_bf16 must be BIT-identical under the bf16
    compute dtype: flax already casts each f32 weight to bf16 per use, so
    pre-casting (vocab head excluded — it computes in f32) changes the
    HBM stream, not the math (serving default in bench.py)."""
    import dataclasses

    import numpy as np

    from mdcnet_tpu.config import test_preset
    from mdcnet_tpu.infer.generate import generate
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.models.encdec import cast_decoder_params_bf16

    cfg = dataclasses.replace(test_preset().model, dtype="bfloat16")
    model = build_model(cfg)
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (3, cfg.img_size, cfg.img_size, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, images,
                        jnp.zeros((3, 10), jnp.int32))
    cast = cast_decoder_params_bf16(params)
    # vocab head stays f32
    assert cast["params"]["decoder"]["output"]["kernel"].dtype == jnp.float32
    assert cast["params"]["decoder"]["layer0"]["linear1"]["kernel"].dtype \
        == jnp.bfloat16

    rng = jax.random.PRNGKey(2)
    ref = generate(model, params, images, rng, steps=12, greedy=True)
    got = generate(model, cast, images, rng, steps=12, greedy=True)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(ref.confs),
                                  np.asarray(got.confs))

    # teacher-forced logits identical too (train-time parity of the cast)
    lr = model.apply(params, images, jnp.zeros((3, 10), jnp.int32),
                     deterministic=True)
    lg = model.apply(cast, images, jnp.zeros((3, 10), jnp.int32),
                     deterministic=True)
    np.testing.assert_array_equal(np.asarray(lr), np.asarray(lg))
