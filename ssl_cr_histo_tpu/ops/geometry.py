"""Geometric image ops as affine warps over one shared gather-based resampler.

TPU-first design: instead of translating the reference's chain of
albumentations/PIL calls (Rotate, ShiftScaleRotate, RandomScale, translate,
shear — reference ``models/randaugment.py:51-110``,
``Pretraining_v2/models/randaugment.py:68-125``), every geometric op here is
expressed as a 3x3 affine matrix; matrices compose on the host/in-trace and a
single bilinear (or nearest) resample executes the whole chain in one fused
gather.  Static shapes throughout; magnitudes may be traced scalars, so the
same compiled step serves every random draw.

Coordinate convention: (x, y) pixel coordinates, y down.  ``warp_affine``
takes the *inverse* map — output pixel -> input location — which is the
natural direction for gather sampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Affine matrix builders (3x3 homogeneous, output -> input mapping)
# ---------------------------------------------------------------------------


def identity_matrix() -> jnp.ndarray:
    return jnp.eye(3, dtype=jnp.float32)


def _about_center(mat: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Conjugate a linear map so it acts about the image center."""
    cx = (w - 1) / 2.0
    cy = (h - 1) / 2.0
    to_origin = jnp.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]], jnp.float32)
    back = jnp.array([[1, 0, cx], [0, 1, cy], [0, 0, 1]], jnp.float32)
    return back @ mat @ to_origin


def rotation_matrix(degrees, h: int, w: int) -> jnp.ndarray:
    """Inverse map for a counter-clockwise rotation (PIL ``Image.rotate`` /
    albumentations ``Rotate`` convention) about the image center."""
    theta = jnp.deg2rad(degrees).astype(jnp.float32)
    c, s = jnp.cos(theta), jnp.sin(theta)
    # Inverse of a CCW rotation in a y-down frame.
    lin = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
    lin = lin.at[0, 0].set(c).at[0, 1].set(-s).at[1, 0].set(s).at[1, 1].set(c)
    return _about_center(lin, h, w)


def scale_matrix(scale, h: int, w: int) -> jnp.ndarray:
    """Inverse map for zooming by ``scale`` about the center (scale > 1 zooms
    in)."""
    inv = 1.0 / scale
    lin = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
    lin = lin.at[0, 0].set(inv).at[1, 1].set(inv)
    return _about_center(lin.astype(jnp.float32), h, w)


def translation_matrix(tx, ty) -> jnp.ndarray:
    """Inverse map matching PIL ``transform(AFFINE, (1, 0, tx, 0, 1, ty))``:
    output (x, y) samples input (x + tx, y + ty) (reference v2
    ``randaugment.py:85``, ``:96``)."""
    m = jnp.eye(3, dtype=jnp.float32)
    return m.at[0, 2].set(tx).at[1, 2].set(ty)


def shear_x_matrix(level) -> jnp.ndarray:
    """PIL ``transform(AFFINE, (1, level, 0, 0, 1, 0))`` — inverse map with
    xi = xo + level * yo (reference v2 ``randaugment.py:108``)."""
    m = jnp.eye(3, dtype=jnp.float32)
    return m.at[0, 1].set(level)


def shear_y_matrix(level) -> jnp.ndarray:
    m = jnp.eye(3, dtype=jnp.float32)
    return m.at[1, 0].set(level)


def compose(*mats: jnp.ndarray) -> jnp.ndarray:
    """Compose inverse maps: ``warp(compose(A, B)) == warp B then warp A``.

    (Applying op A to the result of op B gathers through B's map first:
    inv = B_inv @ A_inv.)
    """
    out = mats[0]
    for m in mats[1:]:
        out = m @ out
    return out


def shift_scale_rotate_matrix(shift_x, shift_y, scale, degrees, h: int, w: int) -> jnp.ndarray:
    """albumentations ``ShiftScaleRotate`` geometry: rotate+scale about the
    center then shift by a fraction of the image size."""
    rot = rotation_matrix(degrees, h, w)
    sc = scale_matrix(scale, h, w)
    # Shift of the *image content* by +shift — inverse map translates by -shift.
    tr = translation_matrix(-shift_x * w, -shift_y * h)
    return compose(tr, sc, rot)


# ---------------------------------------------------------------------------
# Resampler
# ---------------------------------------------------------------------------


def _reflect101(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """OpenCV BORDER_REFLECT_101 coordinate folding (gfedcb|abcdefgh|gfedcba)."""
    if size == 1:
        return jnp.zeros_like(coord)
    period = 2 * (size - 1)
    coord = jnp.abs(coord) % period
    return jnp.where(coord >= size, period - coord, coord)


def _gather_pixels(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray,
                   pad_mode: str) -> jnp.ndarray:
    """Gather img[yi, xi] with integer index tensors; out-of-range handling by
    ``pad_mode`` ('constant' clamps here, masking happens in the caller)."""
    h, w = img.shape[0], img.shape[1]
    if pad_mode == "reflect101":
        yi = _reflect101(yi, h)
        xi = _reflect101(xi, w)
    else:  # constant / edge: clamp (constant masks afterwards)
        yi = jnp.clip(yi, 0, h - 1)
        xi = jnp.clip(xi, 0, w - 1)
    flat = img.reshape(h * w, -1)
    idx = yi * w + xi
    return jnp.take(flat, idx.reshape(-1), axis=0).reshape(*idx.shape, img.shape[-1])


def warp_affine(
    img: jnp.ndarray,
    inv_matrix: jnp.ndarray,
    out_shape: tuple[int, int] | None = None,
    interp: str = "bilinear",
    pad_mode: str = "constant",
    fill: float = 0.0,
) -> jnp.ndarray:
    """Warp a single (H, W, C) image through an inverse affine map.

    ``inv_matrix`` is 3x3: [xi, yi, 1]^T = M @ [xo, yo, 1]^T.
    pad_mode: 'constant' (fill value), 'reflect101', 'edge'.
    """
    h, w = img.shape[0], img.shape[1]
    oh, ow = out_shape if out_shape is not None else (h, w)
    img = img.astype(jnp.float32)

    xo = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
    yo = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
    xi = inv_matrix[0, 0] * xo + inv_matrix[0, 1] * yo + inv_matrix[0, 2]
    yi = inv_matrix[1, 0] * xo + inv_matrix[1, 1] * yo + inv_matrix[1, 2]

    if interp == "nearest":
        xn = jnp.round(xi).astype(jnp.int32)
        yn = jnp.round(yi).astype(jnp.int32)
        out = _gather_pixels(img, yn, xn, pad_mode)
    else:
        x0 = jnp.floor(xi)
        y0 = jnp.floor(yi)
        fx = (xi - x0)[..., None]
        fy = (yi - y0)[..., None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        p00 = _gather_pixels(img, y0i, x0i, pad_mode)
        p01 = _gather_pixels(img, y0i, x0i + 1, pad_mode)
        p10 = _gather_pixels(img, y0i + 1, x0i, pad_mode)
        p11 = _gather_pixels(img, y0i + 1, x0i + 1, pad_mode)
        out = (
            p00 * (1 - fx) * (1 - fy)
            + p01 * fx * (1 - fy)
            + p10 * (1 - fx) * fy
            + p11 * fx * fy
        )

    if pad_mode == "constant":
        inside = (
            (xi >= 0.0) & (xi <= w - 1.0) & (yi >= 0.0) & (yi <= h - 1.0)
        )[..., None]
        out = jnp.where(inside, out, jnp.asarray(fill, jnp.float32))
    return out


# ---------------------------------------------------------------------------
# Simple lattice ops (no resampling)
# ---------------------------------------------------------------------------


def flip_horizontal(img: jnp.ndarray) -> jnp.ndarray:
    return img[..., :, ::-1, :]


def flip_vertical(img: jnp.ndarray) -> jnp.ndarray:
    return img[..., ::-1, :, :]


def rot90(img: jnp.ndarray, k) -> jnp.ndarray:
    """Rotate by k*90 degrees CCW; k may be a traced scalar (lax.switch)."""
    fns = [
        lambda x: x,
        lambda x: jnp.rot90(x, 1, axes=(-3, -2)),
        lambda x: jnp.rot90(x, 2, axes=(-3, -2)),
        lambda x: jnp.rot90(x, 3, axes=(-3, -2)),
    ]
    if isinstance(k, int):
        return fns[k % 4](img)
    return jax.lax.switch(k % 4, fns, img)


def center_crop(img: jnp.ndarray, crop_h: int, crop_w: int) -> jnp.ndarray:
    h, w = img.shape[-3], img.shape[-2]
    y0 = (h - crop_h) // 2
    x0 = (w - crop_w) // 2
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(img, y0, y0 + crop_h, axis=-3), x0, x0 + crop_w, axis=-2
    )


def random_crop(img: jnp.ndarray, key: jax.Array, crop_h: int, crop_w: int) -> jnp.ndarray:
    """Random crop of a single (H, W, C) image (traced offsets, static size)."""
    h, w, c = img.shape
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, h - crop_h + 1)
    x0 = jax.random.randint(kx, (), 0, w - crop_w + 1)
    return jax.lax.dynamic_slice(img, (y0, x0, 0), (crop_h, crop_w, c))


def resize(img: jnp.ndarray, out_h: int, out_w: int, method: str = "bilinear") -> jnp.ndarray:
    """Resize trailing (H, W, C) dims."""
    shape = (*img.shape[:-3], out_h, out_w, img.shape[-1])
    return jax.image.resize(img.astype(jnp.float32), shape, method=method)
