"""Model building blocks — flax equivalents of /root/reference/lib/layers.py.

Layout convention: **channel-last** ((B, T, C) for 1-D, (B, H, W, C) for 2-D),
the TPU-native layout (XLA convolutions prefer NHWC). The reference uses
torch's channel-first; the semantics of every block are preserved, only the
axis order differs. Mask convention here follows the reference's layer
convention: **True = valid** (lib/layers.py:6-30 MeanPool), opposite of
wealy_tpu.ops (see wealy_tpu.utils.masks for converters).

BatchNorm blocks take a ``train`` flag and use flax's ``batch_stats``
collection; InstanceNorm is GroupNorm with one group per channel.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class LayerNormFused(nn.Module):
    """Drop-in for ``nn.LayerNorm(epsilon=eps, dtype=f32)`` backed by the
    fused Pallas kernel (wealy_tpu.ops.layer_norm): bf16 I/O, f32 statistics,
    single memory pass. Param names match nn.LayerNorm ("scale"/"bias") so
    converted checkpoints load unchanged."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        from wealy_tpu.ops.layer_norm import fused_layer_norm

        D = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (D,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (D,), jnp.float32)
        return fused_layer_norm(x, scale, bias, self.epsilon)


def mean_pool(x, mask=None, eps: float = 1e-8):
    """Masked mean over time. x: (B, T, C); mask: (B, T) True=valid -> (B, C).

    Parity: lib/layers.py:6-30 (MeanPool), with the reference's +1e-8
    denominator guard.
    """
    if mask is None:
        return jnp.mean(x, axis=1)
    m = mask.astype(x.dtype)[..., None]
    return jnp.sum(x * m, axis=1) / (jnp.sum(m, axis=1) + eps)


class MeanPool(nn.Module):
    """Module wrapper around :func:`mean_pool`."""

    @nn.compact
    def __call__(self, x, mask=None):
        return mean_pool(x, mask)


class ConvBlock(nn.Module):
    """Conv1d(no bias) -> ReLU -> LayerNorm(channels). x: (B, T, C).

    Parity: lib/layers.py:32-58. The reference transposes to channel-last just
    for the LayerNorm; here everything is channel-last already.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel_size,),
            strides=(self.stride,),
            padding=self.kernel_size // 2,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        return x.astype(self.dtype)


class CQTPrepare(nn.Module):
    """CQT input conditioning: clamp>=0, power, normalize, eps-noise, affine.

    Parity: lib/layers.py:67-99. x: (B, H, W, C) (freq, time, channel);
    normalization reduces over the (H, W) spatial dims like the reference's
    dims (2, 3) in NCHW. ``noise`` requires an rng via
    ``self.make_rng("noise")`` when enabled at call time.
    """

    pow: float = 0.5
    norm: str = "max2d"
    noise: bool = True
    affine: bool = True
    eps: float = 1e-6

    def _normalize(self, h):
        h = h - jnp.min(h, axis=(1, 2), keepdims=True)
        if self.norm == "max2d":
            h = h / (jnp.max(h, axis=(1, 2), keepdims=True) + self.eps)
        elif self.norm == "max1d":
            # reference max1d: max over the freq dim only (dim 2 in NCHW)
            h = h / (jnp.max(h, axis=1, keepdims=True) + self.eps)
        elif self.norm == "mean2d":
            h = h / (jnp.mean(h, axis=(1, 2), keepdims=True) + self.eps)
        else:
            raise ValueError(f"unknown norm {self.norm!r}")
        return h

    @nn.compact
    def __call__(self, h, add_noise: bool = False):
        assert self.norm in ("max1d", "max2d", "mean2d")
        h = jnp.clip(h, min=0.0) ** self.pow
        h = self._normalize(h)
        if self.noise and add_noise:
            r = jax.random.uniform(self.make_rng("noise"), h.shape, dtype=h.dtype)
            h = h + self.eps * r
            h = self._normalize(h)
        if self.affine:
            gain = self.param("gain", nn.initializers.ones, (1,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)
            h = gain * h + bias
        return h


class AxisLinear(nn.Module):
    """Linear applied along an arbitrary axis (reference lib/layers.py:105-118).

    In channel-last layout this is mostly the identity case (axis=-1), but the
    axis argument is kept for parity with the reference's ``dim`` semantics.
    """

    features: int
    axis: int = -1
    use_bias: bool = True

    @nn.compact
    def __call__(self, h):
        if self.axis not in (-1, h.ndim - 1):
            h = jnp.swapaxes(h, self.axis, -1)
        h = nn.Dense(self.features, use_bias=self.use_bias, name="lin")(h)
        if self.axis not in (-1, h.ndim - 1):
            h = jnp.swapaxes(h, self.axis, -1)
        return h


class PadConv2d(nn.Module):
    """Same-padding odd-kernel Conv2d (reference lib/layers.py:121-133)."""

    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, h):
        assert self.kernel % 2 == 1
        pad = self.kernel // 2
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=self.use_bias,
            name="conv",
        )(h)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over spatial dims (+affine).

    torch.nn.InstanceNorm{1,2}d semantics (eps inside sqrt, biased variance),
    channel-last.
    """

    features: int
    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, h):
        axes = tuple(range(1, h.ndim - 1))
        mu = jnp.mean(h, axis=axes, keepdims=True)
        var = jnp.var(h, axis=axes, keepdims=True)
        out = (h - mu) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out * scale + bias
        return out


class InstanceBatchNorm(nn.Module):
    """IBN: first half of channels BatchNorm, second half InstanceNorm.

    Parity: lib/layers.py:163-192 (both the 1d and 2d variants — rank-generic
    in channel-last layout). ``train`` toggles batch-stat updates.
    """

    features: int
    affine: bool = True

    @nn.compact
    def __call__(self, h, train: bool = False):
        assert self.features % 2 == 0
        half = self.features // 2
        h1, h2 = h[..., :half], h[..., half:]
        h1 = nn.BatchNorm(
            use_running_average=not train,
            use_bias=self.affine,
            use_scale=self.affine,
            momentum=0.9,
            epsilon=1e-5,
            name="bn",
        )(h1)
        h2 = InstanceNorm(half, affine=self.affine, name="inst")(h2)
        return jnp.concatenate([h1, h2], axis=-1)


class GeMPool(nn.Module):
    """Generalized-mean pooling with learnable p = 1 + softplus(p_raw).

    Parity: lib/layers.py:198-213. x: (B, ..., C) — spatial dims flattened,
    pooled to (B, C).
    """

    features: int = 1
    p_init: float = 3.0
    eps: float = 1e-6

    @nn.compact
    def __call__(self, h):
        B, C = h.shape[0], h.shape[-1]
        h = h.reshape(B, -1, C)  # (B, S, C)
        pinit = math.log(math.exp(self.p_init - 1.0) - 1.0)
        p_raw = self.param(
            "p", lambda k, s: jnp.full(s, pinit, jnp.float32), (1, 1, self.features)
        )
        p = 1.0 + jax.nn.softplus(p_raw)  # (1, 1, C or 1)
        h = jnp.clip(h, min=self.eps) ** p
        h = jnp.mean(h, axis=1)  # (B, C)
        return h ** (1.0 / p[:, 0, :])


class AutoPool(nn.Module):
    """Learnable-temperature softmax attention pooling (lib/layers.py:216-226)."""

    features: int = 1
    p_init: float = 1.0

    @nn.compact
    def __call__(self, h):
        B, C = h.shape[0], h.shape[-1]
        h = h.reshape(B, -1, C)
        p = self.param(
            "p", lambda k, s: jnp.full(s, self.p_init, jnp.float32), (1, 1, self.features)
        )
        a = jax.nn.softmax(p * h, axis=1)
        return jnp.sum(h * a, axis=1)


class SoftPool(nn.Module):
    """Linear -> split (values, attention) -> InstanceNorm'd softmax weights.

    Parity: lib/layers.py:229-242.
    """

    features: int

    @nn.compact
    def __call__(self, h):
        B, C = h.shape[0], h.shape[-1]
        h = h.reshape(B, -1, C)  # (B, S, C)
        h = nn.Dense(2 * self.features, use_bias=False, name="lin")(h)
        vals, att = h[..., : self.features], h[..., self.features :]
        att = InstanceNorm(self.features, affine=True, name="norm")(att)
        att = jax.nn.softmax(att, axis=1)
        return jnp.sum(vals * att, axis=1)


class SqueezeExcitation2d(nn.Module):
    """Global-avg-pool -> bottleneck MLP -> sigmoid channel gates
    (lib/layers.py:354-370). x: (B, H, W, C)."""

    features: int
    r: int = 2

    @nn.compact
    def __call__(self, h):
        s = jnp.mean(h, axis=(1, 2))  # (B, C)
        nmid = max(1, self.features // self.r)
        s = nn.Dense(nmid, use_bias=False, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(self.features, use_bias=False, name="fc2")(s)
        s = jax.nn.sigmoid(s)
        return h * s[:, None, None, :]


class ResNet50BottBlock(nn.Module):
    """1x1 -> kxk(stride) -> 1x1 bottleneck with BN/IBN, optional SE, conv-BN
    shortcut on shape change (lib/layers.py:248-294)."""

    ncin: int
    ncout: int
    ncfactor: float = 0.25
    kern: int = 3
    stride: int = 1
    ibn: bool = False
    se: bool = False

    @nn.compact
    def __call__(self, h, train: bool = False):
        assert self.kern % 2 == 1
        ncmid = int(max(self.ncin, self.ncout) * self.ncfactor)
        ncmid += ncmid % 2

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
            )

        x = nn.Conv(ncmid, (1, 1), use_bias=False, name="conv1")(h)
        if self.ibn:
            x = InstanceBatchNorm(ncmid, name="norm1")(x, train=train)
        else:
            x = bn("norm1")(x)
        x = nn.relu(x)
        x = nn.Conv(
            ncmid,
            (self.kern, self.kern),
            strides=(self.stride, self.stride),
            padding=self.kern // 2,
            use_bias=False,
            name="conv2",
        )(x)
        x = bn("norm2")(x)
        x = nn.relu(x)
        x = nn.Conv(self.ncout, (1, 1), use_bias=False, name="conv3")(x)
        x = bn("norm3")(x)
        if self.se:
            x = SqueezeExcitation2d(self.ncout, name="se")(x)

        if self.ncin != self.ncout or self.stride != 1:
            sc = nn.Conv(
                self.ncout,
                (self.kern, self.kern),
                strides=(self.stride, self.stride),
                padding=self.kern // 2,
                use_bias=False,
                name="short_conv",
            )(h)
            sc = bn("short_norm")(sc)
        else:
            sc = h
        return nn.relu(x + sc)


class MyIBNResBlock(nn.Module):
    """Pre-activation residual block with IBN/SE options and a zero-init
    learnable gain on the residual branch (lib/layers.py:300-348)."""

    ncin: int
    ncout: int
    factor: float = 0.5
    kern: int = 3
    stride: int = 1
    ibn: str = "pre"  # "pre" | "post" | other -> plain BN
    se: str = "none"  # "pre" | "post" | "none"

    @nn.compact
    def __call__(self, h, train: bool = False):
        ncmid = max(1, int(max(self.ncin, self.ncout) * self.factor))
        ncmid += ncmid % 2

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
            )

        x = h
        if self.ibn == "pre":
            x = InstanceBatchNorm(self.ncin, name="norm1")(x, train=train)
        else:
            x = bn("norm1")(x)
        if self.se == "pre":
            x = SqueezeExcitation2d(self.ncin, name="se_pre")(x)
        x = nn.relu(x)
        x = PadConv2d(ncmid, self.kern, stride=self.stride, use_bias=False, name="conv1")(x)
        if self.ibn == "post":
            x = InstanceBatchNorm(ncmid, name="norm2")(x, train=train)
        else:
            x = bn("norm2")(x)
        x = nn.relu(x)
        x = PadConv2d(self.ncout, self.kern, use_bias=False, name="conv2")(x)
        if self.se == "post":
            x = SqueezeExcitation2d(self.ncout, name="se_post")(x)

        if self.ncin != self.ncout or self.stride != 1:
            sc = bn("skip_norm")(h)
            sc = nn.relu(sc)
            sc = PadConv2d(self.ncout, self.kern, stride=self.stride, use_bias=False, name="skip_conv")(sc)
        else:
            sc = h
        gain = self.param("gain", nn.initializers.zeros, (1,), jnp.float32)
        return gain * x + sc
