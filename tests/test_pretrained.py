"""Pretrained-backbone path: timm checkpoint -> .npz asset -> training start.

The reference relies on ImageNet-pretrained DeiT3 weights
(``timm.create_model(..., pretrained=True)``, model.py:15-17).  These tests
drive the whole TPU-side path: a raw timm-format state_dict saved as a real
``.pth`` is converted by scripts/convert_pretrained.py, the resulting .npz
loads back bit-exactly, the converted encoder matches the torch forward, and
``create_train_state`` grafts it so training starts from those weights.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdcnet_tpu.models.pretrained import (convert_timm_state_dict,
                                          graft_pretrained_encoder,
                                          infer_depth, load_encoder_npz,
                                          save_encoder_npz)


def timm_format_state_dict(dim, depth, patch, img, rng):
    """A raw timm-DeiT3-format state_dict (numpy) at arbitrary geometry."""
    n = (img // patch) ** 2
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(dim, 3, patch, patch)),
        "patch_embed.proj.bias": rng.normal(size=(dim,)),
        "cls_token": rng.normal(size=(1, 1, dim)),
        "pos_embed": rng.normal(size=(1, n, dim)),
        "norm.weight": rng.normal(size=(dim,)),
        "norm.bias": rng.normal(size=(dim,)),
    }
    for i in range(depth):
        b = f"blocks.{i}."
        sd.update({
            f"{b}norm1.weight": rng.normal(size=(dim,)),
            f"{b}norm1.bias": rng.normal(size=(dim,)),
            f"{b}attn.qkv.weight": rng.normal(size=(3 * dim, dim)),
            f"{b}attn.qkv.bias": rng.normal(size=(3 * dim,)),
            f"{b}attn.proj.weight": rng.normal(size=(dim, dim)),
            f"{b}attn.proj.bias": rng.normal(size=(dim,)),
            f"{b}ls1.gamma": rng.normal(size=(dim,)),
            f"{b}norm2.weight": rng.normal(size=(dim,)),
            f"{b}norm2.bias": rng.normal(size=(dim,)),
            f"{b}mlp.fc1.weight": rng.normal(size=(4 * dim, dim)),
            f"{b}mlp.fc1.bias": rng.normal(size=(4 * dim,)),
            f"{b}mlp.fc2.weight": rng.normal(size=(dim, 4 * dim)),
            f"{b}mlp.fc2.bias": rng.normal(size=(dim,)),
            f"{b}ls2.gamma": rng.normal(size=(dim,)),
        })
    return {k: v.astype(np.float32) for k, v in sd.items()}


class TestConversion:
    def test_infer_depth_and_prefix_detection(self):
        sd = timm_format_state_dict(8, 3, 4, 8, np.random.default_rng(0))
        assert infer_depth(sd, "") == 3
        prefixed = {f"encoder.model.{k}": v for k, v in sd.items()}
        from mdcnet_tpu.models.pretrained import detect_prefix
        assert detect_prefix(sd) == ""
        assert detect_prefix(prefixed) == "encoder.model."
        # conversion works from either layout
        a = convert_timm_state_dict(sd)
        b = convert_timm_state_dict(prefixed)
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(x, y)

    def test_npz_roundtrip_bit_exact(self, tmp_path):
        sd = timm_format_state_dict(8, 2, 4, 8, np.random.default_rng(1))
        params = convert_timm_state_dict(sd)
        path = str(tmp_path / "enc.npz")
        save_encoder_npz(params, path)
        back = load_encoder_npz(path)
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = {jax.tree_util.keystr(p): v for p, v
                  in jax.tree_util.tree_leaves_with_path(back)}
        assert len(flat_a) == len(flat_b)
        for p, v in flat_a:
            np.testing.assert_array_equal(np.asarray(v),
                                          flat_b[jax.tree_util.keystr(p)])


class TestScriptAndParity:
    def test_script_converts_real_pth_and_encoder_matches_torch(self, tmp_path):
        """scripts/convert_pretrained.py on a real torch-saved raw timm dump;
        the converted encoder must reproduce the torch forward."""
        torch = pytest.importorskip("torch")
        from tests.test_encoder_parity import (DEPTH, DIM, HEADS, IMG, OUT,
                                               PATCH, TorchDeit3)
        from mdcnet_tpu.models.vit import ViTEncoder
        import scripts.convert_pretrained as cp

        torch.manual_seed(3)
        tmodel = TorchDeit3().eval()
        pth = str(tmp_path / "timm_raw.pth")
        torch.save(tmodel.state_dict(), pth)  # raw timm layout (no prefix)
        npz = str(tmp_path / "enc.npz")
        assert cp.main([pth, npz]) == 0

        params = {"params": load_encoder_npz(npz)}
        jmodel = ViTEncoder(patch_size=PATCH, img_size=IMG, dim=DIM,
                            depth=DEPTH, num_heads=HEADS, out_dim=OUT)
        rng = np.random.default_rng(0)
        images = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.tensor(images).permute(0, 3, 1, 2)).numpy()
        got = np.asarray(jmodel.apply(params, jnp.asarray(images)))
        np.testing.assert_allclose(got, want, atol=3e-5)


class TestTrainingStart:
    def test_create_train_state_grafts_pretrained(self, tmp_path):
        import dataclasses
        from mdcnet_tpu.config import test_preset
        from mdcnet_tpu.models import build_model
        from mdcnet_tpu.train.state import create_train_state

        cfg = test_preset()
        m = cfg.model
        sd = timm_format_state_dict(m.enc_dim, m.enc_depth, m.patch_size,
                                    m.img_size, np.random.default_rng(2))
        npz = str(tmp_path / "enc.npz")
        save_encoder_npz(convert_timm_state_dict(sd), npz)
        cfg = cfg.replace(model=dataclasses.replace(m, pretrained_path=npz))

        model = build_model(cfg.model)
        rng = jax.random.PRNGKey(0)
        images = jnp.zeros((2, cfg.data.img_size, cfg.data.img_size, 3))
        tgt = jnp.zeros((2, cfg.data.max_len - 1), jnp.int32)
        state = create_train_state(model, cfg, rng, images, tgt)

        # encoder == converted checkpoint
        enc = state.params["params"]["encoder"]
        np.testing.assert_allclose(
            np.asarray(enc["patch_embed"]["kernel"]),
            sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(enc["block0"]["mlp_fc1"]["kernel"]),
            sd["blocks.0.mlp.fc1.weight"].T, rtol=1e-6)
        # a forward pass runs from the grafted params
        out = model.apply(state.params, images, tgt, deterministic=True)
        assert np.isfinite(np.asarray(out)).all()

    def test_geometry_mismatch_raises(self, tmp_path):
        from mdcnet_tpu.config import test_preset
        from mdcnet_tpu.models import build_model

        cfg = test_preset()
        # wrong dim (16 vs the preset's enc_dim)
        sd = timm_format_state_dict(16, cfg.model.enc_depth,
                                    cfg.model.patch_size, cfg.model.img_size,
                                    np.random.default_rng(4))
        npz = str(tmp_path / "bad.npz")
        save_encoder_npz(convert_timm_state_dict(sd), npz)

        model = build_model(cfg.model)
        params = model.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, cfg.data.img_size,
                                       cfg.data.img_size, 3)),
                            jnp.zeros((1, 4), jnp.int32))
        with pytest.raises(ValueError, match="shape mismatch"):
            graft_pretrained_encoder(params, npz)
