"""Color-space conversions as pure JAX matrix/elementwise math.

The reference implements stain separation through scikit-image's legacy
``separate_stains``/``combine_stains`` (vendored verbatim at
``Pretraining_v2/models/augmenters/color/utils/custom_hed_transform.py:8-40``
in the reference repo): the `rgb + 2` offset, natural log, and the final
``rescale_intensity(rgb - 2, in_range=(-1, 1))``.  We reproduce that exact
formulation here so stain augmentation matches the reference numerically, but
as fused (H, W, 3) @ (3, 3) matmuls instead of per-pixel Python loops
(reference ``dataset.py:93-96`` loops over every pixel in Python).

All functions take/return float32 arrays shaped (..., 3); RGB values in
[0, 1] unless noted.  Everything is jit/vmap/grad-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Stain matrix of Ruifrok & Johnston (as used by scikit-image and the
# reference, custom_hed_transform.py:8-11): rows are H, E, DAB stain vectors.
RGB_FROM_HED = np.array(
    [
        [0.65, 0.70, 0.29],
        [0.07, 0.99, 0.11],
        [0.27, 0.57, 0.78],
    ],
    dtype=np.float32,
)
HED_FROM_RGB = np.linalg.inv(RGB_FROM_HED).astype(np.float32)


def rgb2hed(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB [0,1] -> HED optical-density space (legacy skimage formulation).

    stains = -log(rgb + 2) @ HED_FROM_RGB   (custom_hed_transform.py:24-28)
    """
    rgb = rgb.astype(jnp.float32)
    return (-jnp.log(rgb + 2.0)) @ jnp.asarray(HED_FROM_RGB)


def hed2rgb(hed: jnp.ndarray) -> jnp.ndarray:
    """HED -> RGB [0,1] (legacy skimage formulation).

    rgb = exp(-stains @ RGB_FROM_HED); output is ``rescale_intensity(rgb - 2,
    in_range=(-1, 1))`` i.e. ``clip((rgb - 1) / 2, 0, 1)``
    (custom_hed_transform.py:31-40).
    """
    hed = hed.astype(jnp.float32)
    rgb2 = jnp.exp(-(hed @ jnp.asarray(RGB_FROM_HED)))
    return jnp.clip((rgb2 - 2.0 + 1.0) / 2.0, 0.0, 1.0)


def rgb2hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB [0,1] -> HSV with H, S, V all in [0, 1] (matplotlib/skimage
    convention, matching the reference's skimage.color.rgb2hsv usage in
    hsbcoloraugmenter.py:93-95)."""
    rgb = rgb.astype(jnp.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    delta = v - mn
    safe = jnp.where(delta == 0.0, 1.0, delta)
    # Hue sector selection without data-dependent control flow.
    h_r = ((g - b) / safe) % 6.0
    h_g = (b - r) / safe + 2.0
    h_b = (r - g) / safe + 4.0
    h = jnp.where(v == r, h_r, jnp.where(v == g, h_g, h_b))
    h = jnp.where(delta == 0.0, 0.0, h / 6.0)
    s = jnp.where(v == 0.0, 0.0, delta / jnp.where(v == 0.0, 1.0, v))
    return jnp.stack([h, s, v], axis=-1)


def hsv2rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """HSV (all channels [0,1]) -> RGB [0,1]."""
    hsv = hsv.astype(jnp.float32)
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h6 = (h % 1.0) * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    # chained wheres instead of jnp.select: select lowers through argmax,
    # which Mosaic (Pallas TPU) only supports for float32 operands.
    def pick(c0, c1, c2, c3, c4, c5):
        return jnp.where(
            i == 0, c0,
            jnp.where(i == 1, c1,
                      jnp.where(i == 2, c2,
                                jnp.where(i == 3, c3, jnp.where(i == 4, c4, c5)))),
        )

    r = pick(v, q, p, p, t, v)
    g = pick(t, v, v, q, p, p)
    b = pick(p, p, t, v, v, q)
    return jnp.stack([r, g, b], axis=-1)


# sRGB -> XYZ (D65) matrix, as used by skimage.color.rgb2lab.
_XYZ_FROM_RGB = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=np.float32,
)
_D65_WHITE = np.array([0.95047, 1.0, 1.08883], dtype=np.float32)


def rgb2lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB [0,1] -> CIELAB (D65), matching skimage.color.rgb2lab.

    Used by the v1 foreground detector (reference util.py:18-23) which
    thresholds the `a` channel.
    """
    rgb = rgb.astype(jnp.float32)
    # sRGB companding inverse.
    linear = jnp.where(
        rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92
    )
    xyz = linear @ jnp.asarray(_XYZ_FROM_RGB.T)
    xyz = xyz / jnp.asarray(_D65_WHITE)
    eps = 0.008856451679035631  # (6/29)**3
    kappa = 903.2962962962963  # (29/3)**3
    f = jnp.where(xyz > eps, jnp.cbrt(xyz), (kappa * xyz + 16.0) / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def rgb_to_luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601-2 luma as used by PIL's L conversion (basis for the PIL
    Contrast/Color enhancement ops in the v2 RandAugment pool)."""
    rgb = rgb.astype(jnp.float32)
    return rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114
