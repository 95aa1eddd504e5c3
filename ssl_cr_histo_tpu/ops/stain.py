"""Histopathology stain augmentation as fused matrix math.

Replaces the reference's per-pixel Python HED loop (reference
``dataset.py:75-107`` / ``util.py:62-118`` — an O(pixels) interpreted loop
that dominated its CPU time) and the DIAGNijmegen-style augmenter classes
(``Pretraining_v2/models/augmenters/color/hedcoloraugmenter.py:149-217``,
``hsbcoloraugmenter.py:80-132``) with 3x3-matmul pipelines that XLA fuses
into a handful of VPU ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from ssl_cr_histo_tpu.ops import color


def hed_shift(img: jnp.ndarray, dh, de, dd) -> jnp.ndarray:
    """v1 ``colour_augmentation`` (reference dataset.py:75-107): additive
    per-channel shift in HED space.

    The caller draws dh/de/dd ~ Normal(mean, sigma) with sigma itself drawn
    uniform(-0.035, 0.035) per the reference's `Color` op.  Channel order
    follows the HED stain matrix rows (H, E, D).
    """
    hed = color.rgb2hed(img)
    shift = jnp.stack(
        [jnp.asarray(dh, jnp.float32), jnp.asarray(de, jnp.float32), jnp.asarray(dd, jnp.float32)]
    )
    return color.hed2rgb(hed + shift)


def hed_color_augment(
    img: jnp.ndarray,
    sigmas: jnp.ndarray,
    biases: jnp.ndarray,
    cutoff_low: float = 0.15,
    cutoff_high: float = 0.85,
) -> jnp.ndarray:
    """v2 ``HedColorAugmenter.transform`` (hedcoloraugmenter.py:149-207):
    per-channel scale (1 + sigma) then bias in HED space, gated so patches
    whose mean intensity falls outside [cutoff_low, cutoff_high] pass through
    unchanged."""
    mean = jnp.mean(img)
    inside = (mean >= cutoff_low) & (mean <= cutoff_high)
    hed = color.rgb2hed(img)
    hed = hed * (1.0 + jnp.asarray(sigmas, jnp.float32)) + jnp.asarray(biases, jnp.float32)
    out = color.hed2rgb(hed)
    return jnp.where(inside, out, img)


def hsb_color_augment(img: jnp.ndarray, sigmas: jnp.ndarray) -> jnp.ndarray:
    """v2 ``HsbColorAugmenter.transform`` (hsbcoloraugmenter.py:80-132):
    hue rotation (mod 1) plus asymmetric saturation/brightness scaling.

    sigmas = (hue, saturation, brightness).
    """
    sigmas = jnp.asarray(sigmas, jnp.float32)
    hsv = color.rgb2hsv(img)
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h = (h + sigmas[0] % 1.0) % 1.0
    s = jnp.where(
        sigmas[1] < 0.0,
        s * (1.0 + sigmas[1]),
        s * (1.0 + (1.0 - s) * sigmas[1]),
    )
    v = jnp.where(
        sigmas[2] < 0.0,
        v * (1.0 + sigmas[2]),
        v + (1.0 - v) * sigmas[2],
    )
    return color.hsv2rgb(jnp.stack([h, s, v], axis=-1))
