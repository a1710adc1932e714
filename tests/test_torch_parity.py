"""Real-checkpoint converter proof: a layer-complete tiny Swin implemented in
torch (from the public Swin-Transformer spec), saved in the detectron2
checkpoint key layout, converted with utils/convert_weights, must produce the
SAME multi-scale features as the flax backbone (~1e-4).

This is the trust chain for the reference's eval-only stages: initial weights
are Mask2Former-COCO torch checkpoints (weights/README.md,
configs/proposal_learning/*.yaml:8), so converter parity on a full forward —
not just key mapping — is what makes ``--torch-params`` meaningful.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from partdistillation_tpu.models.swin import SwinConfig, SwinTransformer  # noqa: E402
from partdistillation_tpu.utils.convert_weights import (  # noqa: E402
    convert_mask2former_state_dict,
)


# ------------------------- independent torch Swin (public spec) -------------


def _rel_pos_index(ws):
    coords = torch.stack(torch.meshgrid(
        torch.arange(ws), torch.arange(ws), indexing="ij"))
    flat = coords.flatten(1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous() + (ws - 1)
    return rel[..., 0] * (2 * ws - 1) + rel[..., 1]


class TorchWindowAttention(tnn.Module):
    def __init__(self, dim, heads, ws):
        super().__init__()
        self.dim, self.heads, self.ws = dim, heads, ws
        self.scale = (dim // heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.02)
        self.register_buffer("rpi", _rel_pos_index(ws), persistent=False)

    def forward(self, x, mask):
        bnw, n, c = x.shape
        qkv = self.qkv(x).reshape(bnw, n, 3, self.heads, c // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[self.rpi.reshape(-1)]
        bias = bias.reshape(n, n, self.heads).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(bnw // nw, nw, self.heads, n, n) + mask[:, None]
            attn = attn.view(bnw, self.heads, n, n)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(bnw, n, c)
        return self.proj(out)


class TorchSwinBlock(tnn.Module):
    def __init__(self, dim, heads, ws, shift, mlp_ratio=4.0):
        super().__init__()
        self.ws, self.shift = ws, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TorchWindowAttention(dim, heads, ws)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Sequential()
        self.mlp.fc1 = tnn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = tnn.Linear(int(dim * mlp_ratio), dim)

    def forward(self, x):  # x: (B, H, W, C)
        b, h, w, c = x.shape
        ws = self.ws
        # reference convention: no shift once one window covers the map
        # (swin.py SwinTransformerBlock zeroes shift when min(H,W) <= ws)
        shift = self.shift if min(h, w) > ws else 0
        shortcut = x
        x = self.norm1(x)
        if shift:
            x = torch.roll(x, (-shift, -shift), dims=(1, 2))
            img = torch.zeros((h, w), dtype=torch.long)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -self.shift), slice(-self.shift, None)):
                for vs in (slice(0, -ws), slice(-ws, -self.shift), slice(-self.shift, None)):
                    img[hs, vs] = cnt
                    cnt += 1
            wins = img.view(h // ws, ws, w // ws, ws).permute(0, 2, 1, 3)
            wins = wins.reshape(-1, ws * ws)
            mask = torch.where(wins[:, :, None] != wins[:, None, :], -100.0, 0.0)
        else:
            mask = None
        xw = x.view(b, h // ws, ws, w // ws, ws, c).permute(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(-1, ws * ws, c)
        xw = self.attn(xw, mask)
        x = xw.view(b, h // ws, w // ws, ws, ws, c).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h, w, c)
        if shift:
            x = torch.roll(x, (shift, shift), dims=(1, 2))
        x = shortcut + x
        y = self.norm2(x)
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))
        return x + y


class TorchPatchMerging(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = tnn.LayerNorm(4 * dim)
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):  # (B, H, W, C)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        return self.reduction(self.norm(torch.cat([x0, x1, x2, x3], dim=-1)))


class TorchSwin(tnn.Module):
    """Two-stage Swin in the detectron2 checkpoint layout."""

    def __init__(self, embed_dim=8, depths=(2, 2), heads=(2, 4), ws=4):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, embed_dim, 4, stride=4)
        self.patch_embed.norm = tnn.LayerNorm(embed_dim)
        self.layers = tnn.ModuleList()
        for s, depth in enumerate(depths):
            dim = embed_dim * 2**s
            layer = tnn.Module()
            layer.blocks = tnn.ModuleList([
                TorchSwinBlock(dim, heads[s], ws, shift=0 if b % 2 == 0 else ws // 2)
                for b in range(depth)
            ])
            if s < len(depths) - 1:
                layer.downsample = TorchPatchMerging(dim)
            self.layers.append(layer)
        for s in range(len(depths)):
            self.add_module(f"norm{s}", tnn.LayerNorm(embed_dim * 2**s))

    def forward(self, x):  # (B, 3, H, W) -> {res2, res3} channel-last
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        outs = {}
        for s, layer in enumerate(self.layers):
            for blk in layer.blocks:
                x = blk(x)
            outs[f"res{s + 2}"] = getattr(self, f"norm{s}")(x)
            if hasattr(layer, "downsample"):
                x = layer.downsample(x)
        return outs


def test_torch_swin_forward_parity():
    torch.manual_seed(0)
    tmodel = TorchSwin().eval()
    sd = {f"backbone.{k}": v.detach().numpy()
          for k, v in tmodel.state_dict().items()}

    cfg = SwinConfig(embed_dim=8, depths=(2, 2), num_heads=(2, 4), window_size=4,
                     drop_path_rate=0.0, out_features=("res2", "res3"))
    model = SwinTransformer(cfg)
    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))

    # the converter addresses the segmenter-level tree (backbone/...)
    seg_template = {"params": {"backbone": template["params"]}}
    converted, unmatched = convert_mask2former_state_dict(sd, template=seg_template)
    assert unmatched == [], f"unmatched torch keys: {unmatched}"
    params = {"params": converted["params"]["backbone"]}

    flax_out = jax.jit(model.apply)(params, jnp.asarray(x))
    with torch.no_grad():
        torch_out = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))

    for key in ("res2", "res3"):
        ours = np.asarray(flax_out[key])
        ref = torch_out[key].numpy()
        assert ours.shape == ref.shape
        # f32 accumulation-order noise only: observed max |diff| ~3e-4 after
        # 4 attention blocks + merging
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=5e-4)


def test_torch_swin_shifted_block_differs_from_unshifted():
    """Sanity: the parity above exercises a real shifted window (block 1),
    i.e. the roll + attention mask path is live at 8x8/ws=4."""
    torch.manual_seed(0)
    blk = TorchSwinBlock(8, 2, 4, shift=2).eval()
    x = torch.randn(1, 8, 8, 8)
    with torch.no_grad():
        shifted = blk(x)
        blk.shift = 0
        unshifted = blk(x)
    assert not torch.allclose(shifted, unshifted)
