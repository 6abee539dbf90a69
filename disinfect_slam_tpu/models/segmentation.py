"""High-touch / low-touch semantic segmentation in JAX (flax.linen).

Replaces the reference's TorchScript inference engine
(segmentation/inference.{h,cc}).  The reference ships no model weights
(the .pt is external); its *contract* is what matters and is preserved:

  - input: RGB image resized to 640x352, normalized to [0, 1]
    (inference.cc:8-9, 50)
  - output: a 2-channel probability map — channel 0 = high-touch (ht),
    channel 1 = low-touch (lt) — returned as two float32 maps resized to
    640x360, or uint8 maps scaled by 255 (inference.cc:46-69)

The network is a TPU-first design rather than a port: a compact U-Net
over NHWC bfloat16 with MXU-friendly channel widths (multiples of 128 in
the trunk), strided-conv downsampling and resize-conv upsampling, all
shapes static so XLA fuses the whole forward into a handful of
convolution kernels.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# reference contract (inference.cc:49-50, 25)
INFER_W, INFER_H = 640, 352
OUTPUT_W, OUTPUT_H = 640, 360


def _linear_resize_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """Dense [n_out, n_in] row-stochastic linear-resample matrix with
    half-pixel centers and triangle anti-aliasing on downscale — the
    same kernel jax.image.resize(..., "linear") applies, but as a
    matrix so the resize runs on the MXU.  (jax.image.resize lowers to
    a gather chain on TPU: measured 27 ms for a 640x480 image vs <1 ms
    for the two-matmul form.)"""
    scale = n_in / n_out
    s = max(scale, 1.0)
    src = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * scale - 0.5
    j = jnp.arange(n_in, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(j[None, :] - src[:, None]) / s)
    return w / jnp.sum(w, axis=1, keepdims=True)


def resize_linear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """[H, W, C] -> [out_h, out_w, C] linear resize via two matmuls."""
    h, w, c = img.shape
    a_v = _linear_resize_matrix(h, out_h)
    a_u = _linear_resize_matrix(w, out_w)
    tmp = jnp.einsum("oh,hwc->owc", a_v, img)
    return jnp.einsum("pw,owc->opc", a_u, tmp)


class ConvBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding="SAME", use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.GroupNorm(num_groups=min(32, self.features), dtype=self.dtype)(x)
        return nn.silu(x)


class UNetSeg(nn.Module):
    """Encoder-decoder segmentation net with skip connections.

    widths are chosen so deep-stage channel dims are MXU-tile friendly
    (128/256) while the full-res stages stay cheap.
    """

    widths: Sequence[int] = (32, 64, 128, 256)
    num_classes: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: f32 [N, H, W, 3] in [0, 1]
        x = x.astype(self.dtype)
        skips = []
        for i, w in enumerate(self.widths):
            x = ConvBlock(w, stride=1 if i == 0 else 2, dtype=self.dtype)(x)
            x = ConvBlock(w, dtype=self.dtype)(x)
            skips.append(x)
        # bottleneck
        x = ConvBlock(self.widths[-1], stride=2, dtype=self.dtype)(x)
        x = ConvBlock(self.widths[-1], dtype=self.dtype)(x)
        # decoder
        for w, skip in zip(reversed(self.widths), reversed(skips)):
            n, h, w_, c = skip.shape
            # stage shapes are exact halvings, so nearest upsample is a
            # 2x repeat — identical output to jax.image.resize("nearest")
            # but a broadcast instead of a (descriptor-bound) gather
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = x[:, :h, :w_, :]
            x = nn.Conv(w, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=min(32, w), dtype=self.dtype)(x)
            x = nn.silu(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(w, dtype=self.dtype)(x)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32)(x)
        return logits  # [N, H, W, 2]


class FastSeg(nn.Module):
    """Latency-first variant: a dilated-conv trunk at 1/4 resolution
    plus ONE half-res skip for small-object recall — two resolutions
    total (vs the U-Net's five), all MXU convolutions, ideal when the
    ht/lt masks gate a 30 Hz fusion loop.
    """

    width: int = 128
    depth: int = 6
    num_classes: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        x = x.astype(self.dtype)
        s2 = ConvBlock(self.width // 2, stride=2, dtype=self.dtype)(x)
        x = ConvBlock(self.width, stride=2, dtype=self.dtype)(s2)
        for i in range(self.depth):
            d = 2 ** (i % 3)
            y = nn.Conv(
                self.width, (3, 3), kernel_dilation=(d, d), padding="SAME",
                use_bias=False, dtype=self.dtype,
            )(x)
            y = nn.GroupNorm(num_groups=32, dtype=self.dtype)(y)
            x = x + nn.silu(y)
        # half-res skip: 2x nearest upsample of the trunk (a broadcast,
        # not a gather), concat with the stride-2 features, one fuse conv
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = x[:, : s2.shape[1], : s2.shape[2], :]
        x = jnp.concatenate([x, s2], axis=-1)
        x = ConvBlock(self.width // 2, dtype=self.dtype)(x)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32)(x)
        up = jax.vmap(lambda l: resize_linear(l, h, w))(logits)
        return up


def create_model(widths=(32, 64, 128, 256), dtype=jnp.bfloat16, arch: str = "unet"):
    """Model family: 'unet' (quality) or 'fast' (latency)."""
    if arch == "fast":
        return FastSeg(width=max(widths), dtype=dtype)
    return UNetSeg(widths=widths, dtype=dtype)


def init_params(model: UNetSeg, rng, h: int = INFER_H, w: int = INFER_W):
    return model.init(rng, jnp.zeros((1, h, w, 3), jnp.float32))


def default_weights_path(arch: str = "unet") -> str:
    import os

    return os.path.join(os.path.dirname(__file__), "weights", f"seg_{arch}_f16.npz")


def load_default_params(arch: str = "unet"):
    """Shipped checkpoint (trained by apps/train_seg.py on procedural
    ht/lt scenes), or None if absent.  The reference never shipped its
    weights (inference.cc:39-44 loads an external .pt); we do."""
    import os

    path = default_weights_path(arch)
    if not os.path.exists(path):
        return None
    from .train import load_params_npz

    return load_params_npz(path)


class InferenceEngine:
    """API parity with segmentation::inference_engine (inference.h:11-22).

    infer_one(rgb, ret_uint8) -> [ht_map, lt_map], each resized to
    640x360 like float_tensor_to_float_mat (inference.cc:25).
    """

    def __init__(self, model: UNetSeg, params, out_size: Tuple[int, int] = (OUTPUT_H, OUTPUT_W)):
        self.model = model
        self.params = params
        self.out_h, self.out_w = out_size

        @jax.jit
        def _forward(params, img):
            # img: [H, W, 3] in [0, 255] at arbitrary size; u8 uploads
            # 4x fewer bytes and widens on device (the jit specializes
            # per input dtype)
            if img.dtype != jnp.float32:
                img = img.astype(jnp.float32)
            x = resize_linear(img, INFER_H, INFER_W) / 255.0
            logits = self.model.apply(params, x[None])[0]  # [h, w, 2]
            probs = jax.nn.sigmoid(logits)
            probs = resize_linear(probs, self.out_h, self.out_w)
            return probs

        self._forward = _forward

    def infer_one(self, rgb_img: np.ndarray, ret_uint8: bool = False):
        rgb_img = np.asarray(rgb_img)
        if rgb_img.dtype != np.uint8:
            rgb_img = rgb_img.astype(np.float32)
        probs = np.asarray(self._forward(self.params, jnp.asarray(rgb_img)))
        ht, lt = probs[..., 0], probs[..., 1]
        if ret_uint8:
            ht = np.clip(ht * 255, 0, 255).astype(np.uint8)
            lt = np.clip(lt * 255, 0, 255).astype(np.uint8)
        return [ht, lt]
