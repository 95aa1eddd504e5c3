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
import numpy as np


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
# MXU warp: two-pass separable affine resampling as matmuls
# ---------------------------------------------------------------------------
#
# Gathers are the slowest primitive on TPU (~4 ms per 256x256x3 bilinear warp
# measured on v5e); the MXU path instead decomposes the affine map into a
# horizontal then a vertical 1-D resampling pass, each expressed as a matmul
# against an interpolation-weight tensor built on the fly from iota — XLA
# fuses the weight computation into the dot and the MXU does the rest
# (~0.4 ms per tile, 10x faster).
#
# Catmull-Smith 2-pass decomposition of the inverse map
#   xi = a xo + b yo + c ;  yi = d xo + e yo + f
# horizontal-first requires e != 0; conditioning degrades as |e| -> 0, so we
# (1) pre-rotate the lattice 90 degrees when the map is closer to a 90-degree
# rotation, and (2) transpose to the vertical-first variant when |a| > |e|.
# Both fixups are cheap lattice ops composed into the matrix, applied with
# jnp.where so the program stays branch-free under vmap.
#
# Interpolation note: 2-pass bilinear is not bit-identical to direct 2-D
# bilinear (the second pass interpolates already-interpolated rows); for
# augmentation purposes the two are interchangeable (oracle-tested against
# cv2 within tolerance on smooth images).


def _fold_coords(pos: jnp.ndarray, size: int, pad_mode: str) -> jnp.ndarray:
    """Fold continuous sample positions for the padding mode.  For constant
    padding, out-of-range positions keep their value — the hat weights vanish
    there, which zero-fills naturally."""
    if pad_mode == "reflect101":
        if size == 1:
            return jnp.zeros_like(pos)
        period = 2.0 * (size - 1)
        pos = jnp.abs(pos) % period
        return jnp.where(pos >= size - 1 + 1e-6, period - pos, pos)
    if pad_mode == "edge":
        return jnp.clip(pos, 0.0, size - 1.0)
    return pos


def _resample_pass(img: jnp.ndarray, pos: jnp.ndarray, axis: str, pad_mode: str) -> jnp.ndarray:
    """One 1-D resampling pass via matmul.

    axis='x': pos has shape (H, W_out); out[y, o, c] = interp(img[y], pos[y, o]).
    axis='y': pos has shape (H_out, W); out[o, x, c] = interp(img[:, x], pos[o, x]).
    """
    # The hat weights are built in f32 (positions up to S need fractional
    # resolution bf16 lacks) but the dots run with bf16 operands and f32
    # accumulation: weights are exact in bf16 to ~3 decimal digits, which is
    # beyond augmentation tolerance, and the MXU runs 2x faster on bf16.
    # (CPU keeps f32 operands — XLA:CPU's thunk runtime has no bf16 dot.)
    dot_t = _dot_operand_dtype()
    if axis == "x":
        size = img.shape[1]
        pos = _fold_coords(pos, size, pad_mode)
        i_in = jax.lax.broadcasted_iota(jnp.float32, (1, size, 1), 1)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(i_in - pos[:, None, :]))  # (H, I, O)
        return jnp.einsum(
            "yic,yio->yoc",
            img.astype(dot_t),
            w.astype(dot_t),
            preferred_element_type=jnp.float32,
        )
    size = img.shape[0]
    pos = _fold_coords(pos, size, pad_mode)
    i_in = jax.lax.broadcasted_iota(jnp.float32, (1, size, 1), 1)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(i_in - pos[:, None, :].transpose(2, 1, 0)))
    # w: (X, I, O) where X indexes columns; img -> (X, I, C)
    img_t = img.transpose(1, 0, 2)
    out = jnp.einsum(
        "xic,xio->xoc",
        img_t.astype(dot_t),
        w.astype(dot_t),
        preferred_element_type=jnp.float32,
    )
    return out.transpose(1, 0, 2)


def _dot_operand_dtype():
    """bf16 dot operands on accelerators (MXU 2x rate, weights exact to ~3
    digits); f32 on CPU, whose thunk runtime cannot execute bf16 dots."""
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


_SWAP_XY = np.array([[0, 1, 0], [1, 0, 0], [0, 0, 1]], np.float32)


def _rot90_matrix(h: int, w: int) -> np.ndarray:
    """Coordinate map of `img2 = rot90(img, 1)` (CCW, axes (0,1)): original
    (x, y) -> rotated-lattice coords.  rot90 CCW sends img[y, x] to
    img2[w-1-x, y]; so a point at original (x, y) lives at rotated
    (x2, y2) = (y, w-1-x)."""
    return np.array([[0, 1, 0], [-1, 0, w - 1], [0, 0, 1]], np.float32)


def warp_affine_mxu(
    img: jnp.ndarray,
    inv_matrix: jnp.ndarray,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """Affine warp of a square (S, S, C) image via two matmul resampling
    passes (see module comment).  Output shape == input shape.

    Square inputs only (all augmentation tiles are square); supports traced
    per-sample matrices under vmap with no data-dependent branching.
    """
    h, w = img.shape[0], img.shape[1]
    if h != w:
        raise ValueError("warp_affine_mxu requires square images")
    img = img.astype(jnp.float32)
    m = inv_matrix.astype(jnp.float32)

    # Fixup 1: if the map is dominated by the off-diagonal terms (near +-90
    # degree rotation), pre-rotate the lattice by 90 degrees.
    rot_dominant = jnp.abs(m[0, 0]) + jnp.abs(m[1, 1]) < jnp.abs(m[0, 1]) + jnp.abs(m[1, 0])
    img_r = jnp.rot90(img, 1, axes=(0, 1))
    img = jnp.where(rot_dominant, img_r, img)
    m = jnp.where(rot_dominant, jnp.asarray(_rot90_matrix(h, w)) @ m, m)

    # Fixup 2: transpose so the horizontal-first pass is well conditioned
    # (requires |e| >= |a| after the swap decision).
    swap = jnp.abs(m[0, 0]) > jnp.abs(m[1, 1])
    img_t = img.transpose(1, 0, 2)
    img = jnp.where(swap, img_t, img)
    s = jnp.asarray(_SWAP_XY)
    m = jnp.where(swap, s @ m @ s, m)

    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    e_safe = jnp.where(jnp.abs(e) < 1e-6, jnp.where(e < 0, -1e-6, 1e-6), e)

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, 1), 0)
    os_ = jax.lax.broadcasted_iota(jnp.float32, (1, w), 1)

    # Pass 1 (horizontal): tmp[y, o] = img[y, ap*o + bp*y + cp]
    ap = a - b * d / e_safe
    bp = b / e_safe
    cp = c - b * f / e_safe
    pos1 = ap * os_ + bp * ys + cp  # (H, W_out)
    tmp = _resample_pass(img, pos1, "x", pad_mode)

    # Pass 2 (vertical): out[o, x] = tmp[d*x + e*o + f, x]
    oy = jax.lax.broadcasted_iota(jnp.float32, (h, 1), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (1, w), 1)
    pos2 = d * xs + e * oy + f  # (H_out, W)
    out = _resample_pass(tmp, pos2, "y", pad_mode)

    # Undo the lattice fixups.
    out_t = out.transpose(1, 0, 2)
    out = jnp.where(swap, out_t, out)
    return out


def warp_affine_mxu_planar(
    img: jnp.ndarray,
    inv_matrix: jnp.ndarray,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """``warp_affine_mxu`` on a channel-planar (C, S, S) image.

    The TPU aug path keeps tiles channel-planar end-to-end: the Pallas
    photometric kernel requires planar blocks, and the model's first conv
    absorbs the final planar->NHWC transpose for free under XLA layout
    assignment — so warping in planar form deletes both relayouts that the
    NHWC warp forced around the kernel (~2 ms/batch64 on v5e).
    """
    c, h, w = img.shape
    if h != w:
        raise ValueError("warp_affine_mxu_planar requires square images")
    img = img.astype(jnp.float32)
    m = inv_matrix.astype(jnp.float32)

    rot_dominant = jnp.abs(m[0, 0]) + jnp.abs(m[1, 1]) < jnp.abs(m[0, 1]) + jnp.abs(m[1, 0])
    img_r = jnp.rot90(img, 1, axes=(1, 2))
    img = jnp.where(rot_dominant, img_r, img)
    m = jnp.where(rot_dominant, jnp.asarray(_rot90_matrix(h, w)) @ m, m)

    swap = jnp.abs(m[0, 0]) > jnp.abs(m[1, 1])
    img_t = img.transpose(0, 2, 1)
    img = jnp.where(swap, img_t, img)
    sm = jnp.asarray(_SWAP_XY)
    m = jnp.where(swap, sm @ m @ sm, m)

    a, b, c_ = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    e_safe = jnp.where(jnp.abs(e) < 1e-6, jnp.where(e < 0, -1e-6, 1e-6), e)

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, 1), 0)
    os_ = jax.lax.broadcasted_iota(jnp.float32, (1, w), 1)

    ap = a - b * d / e_safe
    bp = b / e_safe
    cp = c_ - b * f / e_safe
    pos1 = ap * os_ + bp * ys + cp
    tmp = _resample_pass_planar(img, pos1, "x", pad_mode)

    oy = jax.lax.broadcasted_iota(jnp.float32, (h, 1), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (1, w), 1)
    pos2 = d * xs + e * oy + f
    out = _resample_pass_planar(tmp, pos2, "y", pad_mode)

    out_t = out.transpose(0, 2, 1)
    return jnp.where(swap, out_t, out)


def _resample_pass_planar(img: jnp.ndarray, pos: jnp.ndarray, axis: str, pad_mode: str) -> jnp.ndarray:
    """``_resample_pass`` for channel-planar (C, H, W) images."""
    dot_t = _dot_operand_dtype()
    if axis == "x":
        size = img.shape[2]
        pos = _fold_coords(pos, size, pad_mode)
        i_in = jax.lax.broadcasted_iota(jnp.float32, (1, size, 1), 1)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(i_in - pos[:, None, :]))  # (H, I, O)
        return jnp.einsum(
            "cyi,yio->cyo",
            img.astype(dot_t),
            w.astype(dot_t),
            preferred_element_type=jnp.float32,
        )
    size = img.shape[1]
    pos = _fold_coords(pos, size, pad_mode)
    i_in = jax.lax.broadcasted_iota(jnp.float32, (1, size, 1), 1)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(i_in - pos[:, None, :].transpose(2, 1, 0)))
    # w: (X, I, O); img -> (C, X, I)
    img_t = img.transpose(0, 2, 1)
    out = jnp.einsum(
        "cxi,xio->cxo",
        img_t.astype(dot_t),
        w.astype(dot_t),
        preferred_element_type=jnp.float32,
    )
    return out.transpose(0, 2, 1)


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


def _cv2_linear_weights(n_in: int, n_out: int) -> np.ndarray:
    """Static 1-D cv2.INTER_LINEAR weight matrix (n_out, n_in): half-pixel
    mapping src = (dst+0.5)*n_in/n_out - 0.5, two taps, edge clamp."""
    dst = np.arange(n_out, dtype=np.float64)
    src = (dst + 0.5) * (n_in / n_out) - 0.5
    i0 = np.floor(src).astype(int)
    frac = (src - i0).astype(np.float32)
    w = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    np.add.at(w, (rows, np.clip(i0, 0, n_in - 1)), 1.0 - frac)
    np.add.at(w, (rows, np.clip(i0 + 1, 0, n_in - 1)), frac)
    return w


def resize(img: jnp.ndarray, out_h: int, out_w: int, method: str = "bilinear") -> jnp.ndarray:
    """Resize trailing (H, W, C) dims.

    ``bilinear`` is cv2.INTER_LINEAR-exact (the oracle for albumentations'
    Resize, reference models/randaugment.py:67-68): two static 2-tap weight
    matmuls (MXU-friendly, weights folded at trace time).  NOT
    ``jax.image.resize``, whose 'linear' anti-aliases on DOWNSCALE with a
    scale-aware kernel — the magnitude sweep measured a 0.23 max divergence
    from cv2 at 2x downscale (tests/test_ops_geometry.py); upscale taps are
    identical either way.  Other methods delegate to jax.image.resize."""
    if method != "bilinear":
        shape = (*img.shape[:-3], out_h, out_w, img.shape[-1])
        return jax.image.resize(img.astype(jnp.float32), shape, method=method)
    x = img.astype(jnp.float32)
    h, w = img.shape[-3], img.shape[-2]
    if out_h != h:
        x = jnp.einsum("oh,...hwc->...owc", jnp.asarray(_cv2_linear_weights(h, out_h)), x)
    if out_w != w:
        x = jnp.einsum("ow,...hwc->...hoc", jnp.asarray(_cv2_linear_weights(w, out_w)), x)
    return x
