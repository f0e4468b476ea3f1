"""Encoder numerics parity: flax ViT vs a live torch DeiT3-style backbone.

Constructs the timm deit3 block structure in torch (pre-norm + LayerScale,
pos-embed on patch tokens only, CLS concatenated after — the geometry the
reference selects via ``deit3_medium_patch16_224`` allied_files.py:27),
converts its weights with models/torch_convert.py, and checks our ViTEncoder
(including the channel-adaptive-pool bottleneck, model.py:19-23) matches.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mdcnet_tpu.models.torch_convert import convert_encoder
from mdcnet_tpu.models.vit import ViTEncoder

DIM, DEPTH, HEADS, PATCH, IMG, OUT = 64, 2, 2, 16, 64, 96


class TorchBlock(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(DIM, eps=1e-6)
        self.attn = TorchAttn()
        self.ls1 = TorchLayerScale()
        self.norm2 = torch.nn.LayerNorm(DIM, eps=1e-6)
        self.mlp = TorchMlp()
        self.ls2 = TorchLayerScale()

    def forward(self, x):
        x = x + self.ls1.gamma * self.attn(self.norm1(x))
        x = x + self.ls2.gamma * self.mlp(self.norm2(x))
        return x


class TorchAttn(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.qkv = torch.nn.Linear(DIM, DIM * 3)
        self.proj = torch.nn.Linear(DIM, DIM)

    def forward(self, x):
        b, n, _ = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, HEADS, DIM // HEADS)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        s = (q @ k.transpose(-2, -1)) * (DIM // HEADS) ** -0.5
        out = (s.softmax(dim=-1) @ v).transpose(1, 2).reshape(b, n, DIM)
        return self.proj(out)


class TorchMlp(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = torch.nn.Linear(DIM, DIM * 4)
        self.fc2 = torch.nn.Linear(DIM * 4, DIM)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x)))


class TorchLayerScale(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.gamma = torch.nn.Parameter(torch.full((DIM,), 1e-6))


class TorchDeit3(torch.nn.Module):
    """timm deit3 structure: pos embed on patches only (no_embed_class)."""

    def __init__(self):
        super().__init__()
        n_patches = (IMG // PATCH) ** 2

        class PatchEmbed(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = torch.nn.Conv2d(3, DIM, PATCH, PATCH)

        self.patch_embed = PatchEmbed()
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, DIM) * 0.02)
        self.pos_embed = torch.nn.Parameter(
            torch.randn(1, n_patches, DIM) * 0.02)
        self.blocks = torch.nn.ModuleList([TorchBlock() for _ in range(DEPTH)])
        self.norm = torch.nn.LayerNorm(DIM, eps=1e-6)

    def forward(self, x):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = x + self.pos_embed
        cls = self.cls_token.expand(x.size(0), -1, -1)
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        # reference Encoder: drop CLS + AdaptiveAvgPool1d(out) (model.py:21-23)
        return torch.nn.AdaptiveAvgPool1d(OUT)(x[:, 1:])


class TestEncoderParity:
    def test_encoder_outputs_match(self):
        torch.manual_seed(0)
        tmodel = TorchDeit3().eval()
        sd = {f"encoder.model.{k}": v.detach().numpy()
              for k, v in tmodel.state_dict().items()}
        params = {"params": convert_encoder(sd, DEPTH)}

        jmodel = ViTEncoder(patch_size=PATCH, img_size=IMG, dim=DIM, depth=DEPTH,
                            num_heads=HEADS, out_dim=OUT)
        rng = np.random.default_rng(0)
        images = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.tensor(images).permute(0, 3, 1, 2)).numpy()
        got = np.asarray(jmodel.apply(params, jnp.asarray(images)))
        assert got.shape == want.shape == (2, (IMG // PATCH) ** 2, OUT)
        np.testing.assert_allclose(got, want, atol=3e-5)


class TestFusedQKV:
    def test_fused_matches_unfused(self):
        """enc_fuse_qkv packs q/k/v into one matmul — same params, same
        output (one shared reduction order per output column)."""
        base = ViTEncoder(patch_size=PATCH, img_size=IMG, dim=DIM,
                          depth=DEPTH, num_heads=HEADS, out_dim=OUT)
        fused = ViTEncoder(patch_size=PATCH, img_size=IMG, dim=DIM,
                           depth=DEPTH, num_heads=HEADS, out_dim=OUT,
                           fuse_qkv=True)
        rng = np.random.default_rng(1)
        images = jnp.asarray(rng.normal(size=(2, IMG, IMG, 3)),
                             jnp.float32)
        params = base.init(jax.random.PRNGKey(0), images)
        # identical param tree: fusion concatenates at apply time
        a = jax.tree_util.tree_structure(params)
        b = jax.tree_util.tree_structure(
            fused.init(jax.random.PRNGKey(0), images))
        assert a == b
        want = np.asarray(base.apply(params, images))
        got = np.asarray(fused.apply(params, images))
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-6)


class TestScanBlocks:
    def test_scan_matches_loop(self):
        """enc_scan_blocks runs the stack as one lax.scan over stacked
        params — same params tree, same output as the unrolled loop."""
        base = ViTEncoder(patch_size=PATCH, img_size=IMG, dim=DIM,
                          depth=DEPTH, num_heads=HEADS, out_dim=OUT)
        scan = ViTEncoder(patch_size=PATCH, img_size=IMG, dim=DIM,
                          depth=DEPTH, num_heads=HEADS, out_dim=OUT,
                          scan_blocks=True)
        rng = np.random.default_rng(2)
        images = jnp.asarray(rng.normal(size=(2, IMG, IMG, 3)),
                             jnp.float32)
        params = base.init(jax.random.PRNGKey(0), images)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(
                    scan.init(jax.random.PRNGKey(0), images)))
        want = np.asarray(base.apply(params, images))
        got = np.asarray(scan.apply(params, images))
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-6)


def test_attn_impl_bf16_close_to_xla():
    """The bf16-score serving knob must track the f32-score attention
    closely (it only changes the score matmul accumulation dtype)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mdcnet_tpu.models.vit import ViTEncoder

    kw = dict(patch_size=8, img_size=32, dim=64, depth=2, num_heads=4,
              out_dim=48, dtype=jnp.float32, param_dtype=jnp.float32)
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    base = ViTEncoder(**kw)
    params = base.init(jax.random.PRNGKey(1), images)
    a = base.apply(params, images)
    b = ViTEncoder(attn_impl="bf16", **kw).apply(params, images)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=5e-2, rtol=5e-2)
    # must not be bit-identical (otherwise the knob is wired to nothing)
    assert not np.array_equal(np.asarray(a), np.asarray(b))
