"""Building-block modules for the FlashVTG network, in flax.linen.

Functional re-design of the reference blocks (cited per class) with static
shapes and mask-based control flow so that the whole forward pass compiles to
one XLA program. All sequence tensors are channels-last (B, L, D) — the
native layout for TPU matmuls — instead of torch's (L, B, D) permutes.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sine_position_embedding(
    mask: jnp.ndarray,
    num_pos_feats: int,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
) -> jnp.ndarray:
    """1-D sine PE over the cumulative sum of the validity mask.

    Oracle: FlashVTG/position_encoding.py:35-72 (PositionEmbeddingSine).

    Args:
      mask: (B, L) float/bool validity mask (1 = valid).
    Returns:
      (B, L, num_pos_feats) position features.
    """
    x_embed = jnp.cumsum(mask.astype(jnp.float32), axis=1)
    if normalize:
        eps = 1e-6
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    # dim_t is static — build it host-side in float64 and round once. XLA's
    # on-device f32 pow (exp(y*log x) in f32) is ~3e-6 rel off libm powf,
    # which put every position feature ~1e-5 away from the torch oracle's
    # (position_encoding.py:66-67 computes in f32 via libm); f64-then-round
    # is correctly rounded and lands within 1 ulp of the reference.
    dim_np = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = jnp.asarray(
        (temperature ** (2 * (dim_np // 2) / num_pos_feats)).astype(np.float32)
    )
    pos = x_embed[:, :, None] / dim_t  # (B, L, F)
    pos = jnp.stack([jnp.sin(pos[:, :, 0::2]), jnp.cos(pos[:, :, 1::2])], axis=3)
    return pos.reshape(pos.shape[0], pos.shape[1], -1)


class TrainablePositionalEncoding(nn.Module):
    """Learned absolute positions + LN + dropout over text tokens
    (oracle: position_encoding.py:10-32; active under --use_txt_pos)."""

    max_positions: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dropout: float = 0.1):
        b, l, d = x.shape
        table = nn.Embed(self.max_positions, d, name="positions")
        pos = table(jnp.arange(l))
        out = nn.LayerNorm(epsilon=1e-5, name="norm")(x + pos[None])
        return nn.Dropout(dropout)(out, deterministic=deterministic)


class PReLU(nn.Module):
    """Learnable leaky-ReLU with a single shared slope (torch nn.PReLU())."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda k: jnp.asarray(0.25, jnp.float32))
        return jnp.where(x >= 0, x, alpha * x)


def drop_path(x, rate: float, deterministic: bool, rng=None):
    """Per-sample stochastic depth (oracle: transformer.py:454-467)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, dtype=x.dtype))
    return x / keep * mask


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        return drop_path(x, self.rate, False, self.make_rng("dropout"))


class LinearLayer(nn.Module):
    """LayerNorm -> Dropout -> Dense -> optional ReLU (model.py:767-789)."""

    out_dim: int
    layer_norm: bool = True
    dropout: float = 0.1
    relu: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, name="dense")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class InputProj(nn.Module):
    """Stack of `n_layers` LinearLayers; ReLU on all but the last
    (model.py:98-110: relu_args[n_input_proj-1] = False)."""

    hidden_dim: int
    n_layers: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.n_layers):
            x = LinearLayer(
                self.hidden_dim,
                layer_norm=True,
                dropout=self.dropout,
                relu=(i != self.n_layers - 1),
                name=f"layer{i}",
            )(x, deterministic=deterministic)
        return x


class MLP(nn.Module):
    """ReLU MLP, no activation after the last layer (model.py:755-765)."""

    hidden_dim: int
    out_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.out_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layer{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class ConvHead(nn.Module):
    """Conv1d(k) -> ReLU -> Conv1d(k) regression head (blocks/blocks.py:89-105).

    Input/output are (B, L, D) — flax convs are channels-last natively.
    """

    dims: int
    out_dims: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, mask=None):
        """`mask` (B, L): zeroes intermediate activations at invalid
        positions so the second conv sees zero padding beyond each sample's
        true length, exactly like the reference's unpadded run."""
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.dims, (self.kernel_size,), padding=[(pad, pad)], name="conv1"
        )(x)
        if mask is not None:
            x = x * mask[..., None]
        x = nn.relu(x)
        x = nn.Conv(
            self.out_dims, (self.kernel_size,), padding=[(pad, pad)], name="conv2"
        )(x)
        return x


class ConfidenceScorer(nn.Module):
    """Conv stack along the point axis + MLP to a scalar (model.py:44-71).

    The reference uses Conv2d with kernel (1, k) on a (B, C, 1, N) layout —
    functionally a 1-D conv over the (concatenated) pyramid point axis. Here
    it is exactly that: nn.Conv over (B, N, C).
    """

    out_channels: int
    kernel_size: int
    num_conv_layers: int = 1
    num_mlp_layers: int = 3

    @nn.compact
    def __call__(self, x, mask=None):
        pad = self.kernel_size // 2
        for i in range(self.num_conv_layers):
            x = nn.Conv(
                self.out_channels,
                (self.kernel_size,),
                padding=[(pad, pad)],
                name=f"conv{i}",
            )(x)
            if mask is not None:
                x = x * mask[..., None]
            x = nn.relu(x)
        x = MLP(
            self.out_channels // 2, 1, self.num_mlp_layers, name="mlp"
        )(x)
        return x


class AdaPooling(nn.Module):
    """Attention-pool text tokens into one query embedding
    (blocks/blocks.py:73-85)."""

    @nn.compact
    def __call__(self, x, mask):
        a = nn.Dense(1, use_bias=False, name="att")(x)
        a = a + jnp.where(mask[..., None] == 1, 0.0, -jnp.inf)
        a = jax.nn.softmax(a, axis=1)  # (B, L, 1)
        pooled = jnp.einsum("bld,blo->bod", x, a)  # (B, 1, D)
        return pooled


class PyramidLevel(nn.Module):
    """One ConvPyramid level: log2(stride) x [Conv1d(2,s=2) -> LN -> ReLU]
    (blocks/blocks.py:21-70; note the reference's `pre_conv` is built but NOT
    applied — only `layers` is appended — so it is omitted here).

    stride == 1 reduces to a plain ReLU.
    """

    stride: int

    @nn.compact
    def __call__(self, x):
        p = int(math.log2(self.stride))
        if p == 0:
            return nn.relu(x)
        for i in range(p):
            x = nn.Conv(
                x.shape[-1], (2,), strides=(2,), padding="VALID", name=f"conv{i}"
            )(x)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm{i}")(x)
            x = nn.relu(x)
        return x


class ConvPyramid(nn.Module):
    """Temporal feature pyramid with static depth.

    Each level is computed from the full-resolution input (matching the
    reference, which re-applies the chained stride-2 convs per level). Levels
    whose stride exceeds the static sequence length are never instantiated;
    per-sample level validity is carried by masks (see models/points.py).

    Reference quirk reproduced on purpose: the stride-1 level is
    `nn.ReLU(inplace=True)` (blocks/blocks.py:35), which MUTATES the input
    tensor — every later level (and the `video_emb` the SampledNCE loss
    reads, model.py:188-221) therefore sees relu(x), not x. We thread the
    post-ReLU tensor through explicitly and also return it.
    """

    strides: Sequence[int]

    @nn.compact
    def __call__(self, x) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
        outs = []
        for s in self.strides:
            if x.shape[1] < s:  # static shape check: level structurally absent
                continue
            if s == 1:
                x = nn.relu(x)  # emulates the reference's in-place ReLU
                outs.append(x)
            else:
                outs.append(PyramidLevel(stride=s, name=f"level{s}")(x))
        return tuple(outs), x


def pool_mask(mask: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Max-pool a (B, L) validity mask with kernel=stride, stride=stride
    (oracle: blocks/blocks.py:63 F.max_pool1d). Output length floor(L/s)...
    matching the VALID conv output length floor((L - 2)/2) + 1 per halving."""
    if stride == 1:
        return mask
    b, l = mask.shape
    out_len = (l - stride) // stride + 1
    trimmed = mask[:, : out_len * stride]
    return trimmed.reshape(b, out_len, stride).max(axis=2)
