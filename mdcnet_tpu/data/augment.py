"""On-device image augmentation + normalization.

The reference augments on the host with albumentations (dataset.py:91-113):
  train: RandomBrightnessContrast(p=0.2), GaussianBlur(blur_limit=(3,7),
         p=0.5), MotionBlur(blur_limit=3, p=0.5), Resize, Normalize
  valid: Resize, Normalize

Here the same distributions run *on device*, fully batched and jitted:
per-sample randomness comes from one rng key, blurs are separable/depthwise
convs (XLA fuses them with the normalize), so the host only ships uint8
pixels.  Semantics per albumentations defaults:
  - brightness/contrast: limits ±0.2, brightness_by_max=True ->
    x*alpha + beta*255
  - GaussianBlur: odd kernel size k in {3,5,7}, sigma = 0.3*((k-1)/2 - 1)+0.8
    (cv2's default-sigma formula)
  - MotionBlur(3): 3-tap line kernel in a random direction
  - Normalize: (x/255 - imagenet_mean) / imagenet_std
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)

_MAX_RADIUS = 3  # supports kernel sizes up to 7


def normalize(images: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [0,255] HWC -> imagenet-normalized float32."""
    x = images.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def resize(images: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear resize (B, H, W, C) -> (B, size, size, C)."""
    b, _, _, c = images.shape
    return jax.image.resize(images.astype(jnp.float32),
                            (b, size, size, c), method="bilinear")


def scale_boxes(boxes: jnp.ndarray, src_hw: Tuple[int, int],
                size: int) -> jnp.ndarray:
    """pascal_voc xyxy boxes under a Resize (dataset.py:104 bbox_params)."""
    h, w = src_hw
    scale = jnp.array([size / w, size / h, size / w, size / h], boxes.dtype)
    return boxes * scale


def _gaussian_taps(sigma: jnp.ndarray, radius_mask: jnp.ndarray) -> jnp.ndarray:
    """7-tap gaussian kernel; taps outside the sampled radius are zeroed so
    one fixed-width conv expresses kernel sizes 3/5/7."""
    offs = jnp.arange(-_MAX_RADIUS, _MAX_RADIUS + 1, dtype=jnp.float32)
    taps = jnp.exp(-0.5 * (offs / jnp.maximum(sigma, 1e-3)) ** 2)
    taps = taps * radius_mask
    return taps / jnp.sum(taps)


def _separable_blur(img: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable 1-D blur along H then W. img: (H, W, C)."""
    pad = _MAX_RADIUS
    x = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)), mode="edge")
    xh = sum(taps[i] * x[i: i + img.shape[0]] for i in range(2 * pad + 1))
    x = jnp.pad(xh, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    return sum(taps[i] * x[:, i: i + img.shape[1]] for i in range(2 * pad + 1))


def _motion_blur_3(img: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """3-tap line blur along one of 4 directions (H, W, diag, anti-diag)."""
    pad = 1
    x = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    h, w = img.shape[0], img.shape[1]
    shifts = [
        ((0, 1), (2, 1)),   # vertical
        ((1, 0), (1, 2)),   # horizontal
        ((0, 0), (2, 2)),   # diagonal
        ((0, 2), (2, 0)),   # anti-diagonal
    ]
    outs = []
    for (r0, c0), (r1, c1) in shifts:
        outs.append((x[r0:r0 + h, c0:c0 + w] + img +
                     x[r1:r1 + h, c1:c1 + w]) / 3.0)
    return jax.lax.switch(direction, [lambda o=o: o for o in outs])


def _augment_single(img: jnp.ndarray, key: jax.Array,
                    bc_p: float, gauss_p: float, motion_p: float
                    ) -> jnp.ndarray:
    """img: (H, W, C) float in [0, 255]."""
    k = jax.random.split(key, 8)

    # RandomBrightnessContrast(limits 0.2, p=bc_p)
    apply_bc = jax.random.uniform(k[0]) < bc_p
    alpha = 1.0 + jax.random.uniform(k[1], minval=-0.2, maxval=0.2)
    beta = jax.random.uniform(k[2], minval=-0.2, maxval=0.2)
    bc = jnp.clip(img * alpha + beta * 255.0, 0.0, 255.0)
    img = jnp.where(apply_bc, bc, img)

    # GaussianBlur(blur_limit=(3,7), p=gauss_p)
    apply_g = jax.random.uniform(k[3]) < gauss_p
    ksize_half = jax.random.randint(k[4], (), 1, _MAX_RADIUS + 1)  # 1..3
    offs = jnp.abs(jnp.arange(-_MAX_RADIUS, _MAX_RADIUS + 1))
    radius_mask = (offs <= ksize_half).astype(jnp.float32)
    sigma = 0.3 * (ksize_half.astype(jnp.float32) - 1.0) + 0.8
    blurred = _separable_blur(img, _gaussian_taps(sigma, radius_mask))
    img = jnp.where(apply_g, blurred, img)

    # MotionBlur(blur_limit=3, p=motion_p)
    apply_m = jax.random.uniform(k[5]) < motion_p
    direction = jax.random.randint(k[6], (), 0, 4)
    img = jnp.where(apply_m, _motion_blur_3(img, direction), img)
    return img


@functools.partial(jax.jit, static_argnames=("size", "train", "bc_p",
                                             "gauss_p", "motion_p"))
def preprocess(images: jnp.ndarray, rng: jax.Array, size: int,
               train: bool = False, bc_p: float = 0.2, gauss_p: float = 0.5,
               motion_p: float = 0.5) -> jnp.ndarray:
    """Full device-side pipeline: (B, H, W, C) uint8 -> augmented (train),
    resized, imagenet-normalized float32 (B, size, size, C)."""
    x = images.astype(jnp.float32)
    if train:
        keys = jax.random.split(rng, x.shape[0])
        x = jax.vmap(_augment_single, in_axes=(0, 0, None, None, None))(
            x, keys, bc_p, gauss_p, motion_p)
    x = resize(x, size)
    return normalize(x)
