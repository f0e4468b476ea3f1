"""End-to-end .pth round-trip: a full reference-shaped EncoderDecoder is
built in torch (encoder + decoder halves composed exactly as trail_01.py:158-163
/ model.py:147-181), its state_dict is SAVED TO A REAL .pth FILE, loaded back
through models/torch_convert.load_pth + convert_state_dict, and the converted
params must reproduce the torch model's full-model logits and greedy decode
tokens — covering the encoder/decoder seam the per-half parity tests miss.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mdcnet_tpu.config import BOS_ID, PAD_ID
from mdcnet_tpu.models.decoder import CaptionDecoder
from mdcnet_tpu.models.encdec import EncoderDecoder
from mdcnet_tpu.models.torch_convert import convert_state_dict, load_pth
from mdcnet_tpu.models.vit import ViTEncoder

# encoder geometry
EDIM, DEPTH, EHEADS, PATCH, IMG = 48, 2, 2, 16, 32
ENC_LEN = (IMG // PATCH) ** 2
# decoder geometry (encoder out_dim must equal decoder dim, trail_01.py:158)
DDIM, DHEADS, LAYERS, VOCAB, MAX_LEN, FFN = 32, 2, 2, 332, 16, 64


class TorchLayerScale(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.gamma = torch.nn.Parameter(torch.full((EDIM,), 1e-6))


class TorchAttn(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.qkv = torch.nn.Linear(EDIM, EDIM * 3)
        self.proj = torch.nn.Linear(EDIM, EDIM)

    def forward(self, x):
        b, n, _ = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, EHEADS, EDIM // EHEADS)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        s = (q @ k.transpose(-2, -1)) * (EDIM // EHEADS) ** -0.5
        out = (s.softmax(dim=-1) @ v).transpose(1, 2).reshape(b, n, EDIM)
        return self.proj(out)


class TorchMlp(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = torch.nn.Linear(EDIM, EDIM * 4)
        self.fc2 = torch.nn.Linear(EDIM * 4, EDIM)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x)))


class TorchBlock(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(EDIM, eps=1e-6)
        self.attn = TorchAttn()
        self.ls1 = TorchLayerScale()
        self.norm2 = torch.nn.LayerNorm(EDIM, eps=1e-6)
        self.mlp = TorchMlp()
        self.ls2 = TorchLayerScale()

    def forward(self, x):
        x = x + self.ls1.gamma * self.attn(self.norm1(x))
        x = x + self.ls2.gamma * self.mlp(self.norm2(x))
        return x


class TorchBackbone(torch.nn.Module):
    """timm deit3 structure (no_embed_class: pos embed on patches only)."""

    def __init__(self):
        super().__init__()

        class PatchEmbed(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = torch.nn.Conv2d(3, EDIM, PATCH, PATCH)

        self.patch_embed = PatchEmbed()
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, EDIM) * 0.02)
        self.pos_embed = torch.nn.Parameter(
            torch.randn(1, ENC_LEN, EDIM) * 0.02)
        self.blocks = torch.nn.ModuleList([TorchBlock() for _ in range(DEPTH)])
        self.norm = torch.nn.LayerNorm(EDIM, eps=1e-6)

    def forward(self, x):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = x + self.pos_embed
        cls = self.cls_token.expand(x.size(0), -1, -1)
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


class TorchEncoder(torch.nn.Module):
    """Reference Encoder (model.py:14-23): backbone under ``.model``, drop
    CLS, AdaptiveAvgPool1d channel bottleneck."""

    def __init__(self):
        super().__init__()
        self.model = TorchBackbone()

    def forward(self, x):
        features = self.model(x)
        return torch.nn.AdaptiveAvgPool1d(DDIM)(features[:, 1:])


class TorchDecoder(torch.nn.Module):
    """Reference Decoder composition (model.py:26-127)."""

    def __init__(self):
        super().__init__()
        self.embedding = torch.nn.Embedding(VOCAB, DDIM)
        self.decoder_pos_embed = torch.nn.Parameter(
            torch.randn(1, MAX_LEN - 1, DDIM) * 0.02)
        self.encoder_pos_embed = torch.nn.Parameter(
            torch.randn(1, ENC_LEN, DDIM) * 0.02)
        layer = torch.nn.TransformerDecoderLayer(
            d_model=DDIM, nhead=DHEADS, dim_feedforward=FFN)
        self.decoder = torch.nn.TransformerDecoder(layer, num_layers=LAYERS)
        self.output = torch.nn.Linear(DDIM, VOCAB)

    def _interp_pos(self, length):
        pos = self.decoder_pos_embed
        if length == pos.size(1):
            return pos
        return torch.nn.functional.interpolate(
            pos.permute(0, 2, 1), size=length, mode="linear",
            align_corners=False).permute(0, 2, 1)

    def forward(self, encoder_out, tgt):
        bos = torch.full((tgt.size(0), 1), BOS_ID, dtype=torch.long)
        tgt = torch.cat([bos, tgt], dim=1)
        L = tgt.size(1)
        emb = self.embedding(tgt) + self._interp_pos(L)
        mem = encoder_out + self.encoder_pos_embed
        causal = torch.triu(torch.full((L, L), float("-inf")), diagonal=1)
        preds = self.decoder(
            memory=mem.transpose(0, 1), tgt=emb.transpose(0, 1),
            tgt_mask=causal, tgt_key_padding_mask=(tgt == PAD_ID))
        return self.output(preds.transpose(0, 1))


class TorchEncDec(torch.nn.Module):
    """Reference EncoderDecoder composition (model.py:147-181, eval path)."""

    def __init__(self):
        super().__init__()
        self.encoder = TorchEncoder()
        self.decoder = TorchDecoder()

    def forward(self, images, tgt):
        return self.decoder(self.encoder(images), tgt)


def build_jax_model():
    encoder = ViTEncoder(patch_size=PATCH, img_size=IMG, dim=EDIM,
                         depth=DEPTH, num_heads=EHEADS, out_dim=DDIM)
    decoder = CaptionDecoder(vocab_size=VOCAB, encoder_length=ENC_LEN,
                             dim=DDIM, num_heads=DHEADS, num_layers=LAYERS,
                             ffn_dim=FFN, max_len=MAX_LEN)
    return EncoderDecoder(encoder=encoder, decoder=decoder)


@pytest.fixture(scope="module")
def roundtrip(tmp_path_factory):
    torch.manual_seed(0)
    tmodel = TorchEncDec().eval()
    path = str(tmp_path_factory.mktemp("ckpt") / "reference_model.pth")
    torch.save(tmodel.state_dict(), path)          # a REAL saved checkpoint
    params = convert_state_dict(load_pth(path), enc_depth=DEPTH,
                                dec_layers=LAYERS)
    return tmodel, build_jax_model(), params


class TestFullModelRoundTrip:
    def test_full_model_logits_match(self, roundtrip):
        tmodel, jmodel, params = roundtrip
        rng = np.random.default_rng(0)
        images = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)
        tgt = rng.integers(0, 258, size=(2, 9))
        with torch.no_grad():
            want = tmodel(torch.tensor(images).permute(0, 3, 1, 2),
                          torch.tensor(tgt)).numpy()
        got = np.asarray(jmodel.apply(params, jnp.asarray(images),
                                      jnp.asarray(tgt), deterministic=True))
        assert got.shape == want.shape == (2, 10, VOCAB)
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_greedy_decode_token_parity(self, roundtrip):
        """Incremental greedy loop (inference_code_craeted_me_gpt.py:46-65):
        both sides must emit the same token at every step."""
        tmodel, jmodel, params = roundtrip
        rng = np.random.default_rng(1)
        images = rng.normal(size=(1, IMG, IMG, 3)).astype(np.float32)
        timg = torch.tensor(images).permute(0, 3, 1, 2)
        jimg = jnp.asarray(images)

        tt = [[BOS_ID]]
        jt = [[BOS_ID]]
        apply = jax.jit(lambda y: jmodel.apply(params, jimg, y,
                                               deterministic=True))
        for _ in range(MAX_LEN - 3):
            with torch.no_grad():
                tl = tmodel(timg, torch.tensor(tt))[:, -1]
            t_next = int(tl.argmax(-1))
            jl = apply(jnp.asarray(jt, jnp.int32))[:, -1]
            j_next = int(jnp.argmax(jl, -1)[0])
            assert j_next == t_next, (tt, t_next, j_next)
            tt[0].append(t_next)
            jt[0].append(j_next)
