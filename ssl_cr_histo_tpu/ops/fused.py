"""Fused augmentation policies — the TPU fast path.

The exact-mode policies in ``ops.randaugment`` replay the reference's
op-by-op semantics, which costs one gather-based resample per geometric op
per stage (gathers are the slowest primitive on TPU).  The fused policies
exploit two structural facts:

  1. geometric ops are affine, so any sequence of them composes into a
     single 3x3 matrix -> ONE resample per tile regardless of stage count;
  2. photometric ops are pixelwise (or small convs), so they chain into one
     elementwise program the XLA fuser melts into a handful of VPU loops.

Semantics vs exact mode: identical per-op parameter distributions; the
differences are (a) all geometry is applied in one warp before the
photometric chain instead of interleaved, and (b) the pretraining pool
applies its always-on photometric ops in a fixed canonical order rather than
the sampled order.  These are distributional approximations of augmentation
noise, not of model math — oracle tests pin each op's math in exact mode.

Reference provenance: pool definitions at reference ``dataset.py:109-152``
(pretrain), ``models/randaugment.py:51-123`` (v1 strong),
``Pretraining_v2/models/randaugment.py:176-213`` (v2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssl_cr_histo_tpu.ops import geometry, photometric
from ssl_cr_histo_tpu.ops.randaugment import _hed_color, _mag_v1


def _identity3():
    return jnp.eye(3, dtype=jnp.float32)


def _maybe_mat(key, mat, p=0.5):
    return jnp.where(jax.random.bernoulli(key, p), mat, _identity3())


def _hflip_mat(w: int):
    m = jnp.array([[-1.0, 0.0, w - 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32)
    return m


def _vflip_mat(h: int):
    return jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, h - 1.0], [0.0, 0.0, 1.0]], jnp.float32)


def _random_flip_mat(key, h, w):
    """albumentations Flip (p=0.5): identity, or one of h/v/both."""
    kd, kp = jax.random.split(key)
    d = jax.random.randint(kd, (), 0, 3)
    mat = jax.lax.switch(
        d,
        [
            lambda: _hflip_mat(w),
            lambda: _vflip_mat(h),
            lambda: _vflip_mat(h) @ _hflip_mat(w),
        ],
    )
    return _maybe_mat(kp, mat)


def _resize_crop_mat(key, s: int, pad: int = 20):
    """resize S -> S+pad (half-pixel centers, matching jax.image.resize) then
    random crop back to S."""
    ky, kx = jax.random.split(key)
    ox = jax.random.randint(kx, (), 0, pad + 1).astype(jnp.float32)
    oy = jax.random.randint(ky, (), 0, pad + 1).astype(jnp.float32)
    scale = s / (s + pad)
    m = jnp.eye(3, dtype=jnp.float32)
    m = m.at[0, 0].set(scale).at[0, 2].set((ox + 0.5) * scale - 0.5)
    m = m.at[1, 1].set(scale).at[1, 2].set((oy + 0.5) * scale - 0.5)
    return m


# ---------------------------------------------------------------------------
# Pretraining pool, fused (reference dataset.py:109-152)
# ---------------------------------------------------------------------------


def _pretrain_geo_matrix(key, s: int) -> jnp.ndarray:
    """Compose the three geometric pool ops' matrices (drawn with the same
    parameter distributions as exact mode) in a random order."""
    k_order, k1a, k1p, k1c, k2f, k2x, k2y, k2s, k2a, k2p, k3a, k3p = (
        jax.random.split(key, 12)
    )

    # op A: Scale_Resize_Crop — rotate(+-90, p.5) then resize+randcrop
    rotA = _maybe_mat(k1p, geometry.rotation_matrix(
        jax.random.uniform(k1a, (), minval=-90.0, maxval=90.0), s, s))
    matA = rotA @ _resize_crop_mat(k1c, s)

    # op B: Shift_Scale_Rotate — hflip(p.5) then SSR(p.5)
    flipB = _maybe_mat(k2f, _hflip_mat(s))
    ssr = geometry.shift_scale_rotate_matrix(
        shift_x=jax.random.uniform(k2x, (), minval=-0.0625, maxval=0.0625),
        shift_y=jax.random.uniform(k2y, (), minval=-0.0625, maxval=0.0625),
        scale=jax.random.uniform(k2s, (), minval=0.5, maxval=1.5),
        degrees=jax.random.uniform(k2a, (), minval=-45.0, maxval=45.0),
        h=s, w=s,
    )
    matB = flipB @ _maybe_mat(k2p, ssr)

    # op C: Rotate_Crop — rotate(+-90, p.5) + center crop only; the pretrain
    # pool's Rotate_Crop has NO flip (reference dataset.py:145-148 — unlike
    # the v1 STRONG pool's Rotate_Crop, which does flip and keeps it in
    # _ra1_geo_rotate_crop)
    matC = _maybe_mat(
        k3p,
        geometry.rotation_matrix(
            jax.random.uniform(k3a, (), minval=-90.0, maxval=90.0), s, s
        ),
    )

    mats = jnp.stack([matA, matB, matC])
    order = jax.random.permutation(k_order, 3)

    def body(g, i):
        return g @ mats[i], None

    g, _ = jax.lax.scan(body, _identity3(), order)
    return g


def _pretrain_photometric(img, key):
    """The five photometric pool ops in canonical order, each with its
    reference parameter distribution and p=0.5 gates."""
    kh1, kh2, kh3, khp, kn1, kn2, knp, khed, kb, kbp, kbc1, kbc2, kbcp = (
        jax.random.split(key, 13)
    )
    # HSV
    out = photometric.hsv_shift(
        img,
        hue_shift=jax.random.uniform(kh1, (), minval=-0.1, maxval=0.1),
        sat_shift=jax.random.uniform(kh2, (), minval=-1.0, maxval=1.0),
        val_shift=jax.random.uniform(kh3, (), minval=-20.0, maxval=20.0),
    )
    img = jnp.where(jax.random.bernoulli(khp), out, img)
    # Noise
    sigma = jax.random.uniform(kn1, (), minval=0.0, maxval=0.1)
    img = jnp.where(
        jax.random.bernoulli(knp), photometric.gaussian_noise(img, kn2, sigma), img
    )
    # HED colour augmentation (always applied)
    img = _hed_color(img, khed)
    # Blur
    ksz = 3 + 2 * jax.random.randint(kb, (), 0, 3)
    img = jnp.where(
        jax.random.bernoulli(kbp), photometric.box_blur(img, ksz, max_ksize=7), img
    )
    # Brightness/Contrast
    out = photometric.brightness_contrast(
        img,
        brightness=jax.random.uniform(kbc1, (), minval=-0.2, maxval=0.2),
        contrast=jax.random.uniform(kbc2, (), minval=-0.2, maxval=0.2),
    )
    return jnp.where(jax.random.bernoulli(kbcp), out, img)


def pretrain_augment_v1_fused(tiles: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Fused pretraining augmentation for one (3, H, W, 3) triplet: one warp
    + one photometric chain per tile."""
    s = tiles.shape[-2]

    def aug_tile(tile, tile_key):
        kg, kp = jax.random.split(tile_key)
        g = _pretrain_geo_matrix(kg, s)
        tile = geometry.warp_affine_mxu(tile, g, pad_mode="reflect101")
        return _pretrain_photometric(tile, kp)

    return jax.vmap(aug_tile)(tiles, jax.random.split(key, tiles.shape[0]))


def pretrain_geo_warp_only(tiles: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Just the composed geometric warp of the pretraining pool (the
    photometric half runs in the Pallas kernel when photometric='pallas')."""
    s = tiles.shape[-2]

    def warp_tile(tile, tile_key):
        g = _pretrain_geo_matrix(tile_key, s)
        return geometry.warp_affine_mxu(tile, g, pad_mode="reflect101")

    return jax.vmap(warp_tile)(tiles, jax.random.split(key, tiles.shape[0]))


def pretrain_geo_warp_planar(tile_chw: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Per-tile planar variant of the composed pretraining warp: one
    (3, S, S) tile in, same out (see geometry.warp_affine_mxu_planar for why
    the TPU path stays channel-planar)."""
    s = tile_chw.shape[-1]
    g = _pretrain_geo_matrix(key, s)
    return geometry.warp_affine_mxu_planar(tile_chw, g, pad_mode="reflect101")


# ---------------------------------------------------------------------------
# v1 RandAugment, fused (reference models/randaugment.py:51-144)
# ---------------------------------------------------------------------------


def _ra1_geo_scale_resize_crop(img, v, key, s):
    return img, _resize_crop_mat(key, s)


def _ra1_geo_shift_scale_rotate(img, v, key, s):
    val = _mag_v1(v, 0.01, 0.1)
    kx, ky, ks, ka, kp = jax.random.split(key, 5)
    mat = geometry.shift_scale_rotate_matrix(
        shift_x=jax.random.uniform(kx, (), minval=-val, maxval=val),
        shift_y=jax.random.uniform(ky, (), minval=-val, maxval=val),
        scale=jax.random.uniform(ks, (), minval=1.0 - (val + 0.5), maxval=1.0 + (val + 0.5)),
        degrees=jax.random.uniform(ka, (), minval=-90.0, maxval=90.0),
        h=s, w=s,
    )
    return img, _maybe_mat(kp, mat)


def _ra1_geo_rotate_crop(img, v, key, s):
    val = jnp.abs(_mag_v1(v, -90.0, 90.0))
    kf, ka, kp = jax.random.split(key, 3)
    rot = geometry.rotation_matrix(
        jax.random.uniform(ka, (), minval=-val, maxval=val), s, s
    )
    return img, _random_flip_mat(kf, s, s) @ _maybe_mat(kp, rot)


def randaugment_v1_fused(img: jnp.ndarray, key: jax.Array, n: int, m: int) -> jnp.ndarray:
    """Fused v1 RandAugment: photometric ops apply inline in stage order; the
    geometric ops accumulate one matrix, resampled once at the end."""
    from ssl_cr_histo_tpu.ops.randaugment import (
        _v1_blur,
        _v1_brightness,
        _v1_color,
        _v1_contrast,
        _v1_hsv,
        _v1_noise,
    )

    s = img.shape[0]

    def photo(f):
        def branch(a):
            im, g, v, k = a
            return f(im, v, k), g

        return branch

    def geo(f):
        def branch(a):
            im, g, v, k = a
            im2, mat = f(im, v, k, s)
            return im2, g @ mat

        return branch

    branches = [
        photo(_v1_hsv),
        photo(_v1_noise),
        geo(_ra1_geo_scale_resize_crop),
        geo(_ra1_geo_shift_scale_rotate),
        photo(_v1_color),
        photo(_v1_blur),
        photo(_v1_brightness),
        photo(_v1_contrast),
        geo(_ra1_geo_rotate_crop),
    ]

    def prep(k):
        kop, kmag, kparam = jax.random.split(k, 3)
        return (
            jax.random.randint(kop, (), 0, len(branches)),
            jax.random.randint(kmag, (), 1, m),
            kparam,
        )

    op_idx, v, kparams = jax.vmap(prep)(jax.random.split(key, n))

    def stage(carry, xs):
        im, g = carry
        i, vi, ki = xs
        im, g = jax.lax.switch(i, branches, (im, g, vi, ki))
        return (im, g), None

    (img, g), _ = jax.lax.scan(stage, (img, _identity3()), (op_idx, v, kparams))
    return geometry.warp_affine_mxu(img, g, pad_mode="reflect101")


def _transform_fix(img, key, strong_fn, n, m):
    """Shared weak/strong scaffolding (reference dataset.py:663-677):
    weak = p=0.5 hflip; strong = p=0.5 hflip -> `strong_fn` pool."""
    kw, ks1, ks2 = jax.random.split(key, 3)
    weak = jnp.where(jax.random.bernoulli(kw), geometry.flip_horizontal(img), img)
    strong = jnp.where(jax.random.bernoulli(ks1), geometry.flip_horizontal(img), img)
    return weak, strong_fn(strong, ks2, n=n, m=m)


def transform_fix_fused(img: jnp.ndarray, key: jax.Array, n: int = 7, m: int = 10):
    """Fused weak/strong views (reference dataset.py:663-677)."""
    return _transform_fix(img, key, randaugment_v1_fused, n, m)


def randaugment_v1_shared_batch(
    imgs: jnp.ndarray, key: jax.Array, n: int, m: int
) -> jnp.ndarray:
    """Batch-level v1 RandAugment with a batch-SHARED op sequence.

    The per-image formulation (``randaugment_v1_fused`` under vmap) turns
    each stage's 9-way ``lax.switch`` into compute-all-branches-and-select:
    every image pays for every op body at every stage (n x 9 bodies).  Here
    the n op indices draw ONCE per batch, so the switch index is a scalar
    and XLA executes only the drawn op's body per stage (~9x less VPU
    work), while magnitudes, op parameters, and the per-op p=0.5 gates stay
    independent per image.

    Law: each image's marginal distribution — op selection (n with-
    replacement draws over 9), magnitude `(v/30)(max-min)+min`, parameter
    and gate laws — is exactly the reference RandAugment's
    (models/randaugment.py:125-144).  What is given up is independence of
    the op SEQUENCE across images in one batch (they share selection and
    order, redrawn per batch) — the same sharing the reference itself uses
    across a pretrain triplet (dataset.py:181-187).  Behind
    ``--aug_mode fast``; default stays per-image.

    imgs: (B, S, S, 3) float in [0, 1].
    """
    from ssl_cr_histo_tpu.ops.randaugment import (
        _v1_blur,
        _v1_brightness,
        _v1_color,
        _v1_contrast,
        _v1_hsv,
        _v1_noise,
    )

    b, s = imgs.shape[0], imgs.shape[1]

    def photo(f):
        def branch(a):
            ims, g, v, ks = a
            return jax.vmap(f)(ims, v, ks), g

        return branch

    def geo(f):
        def branch(a):
            ims, g, v, ks = a
            ims2, mats = jax.vmap(lambda im, vi, ki: f(im, vi, ki, s))(ims, v, ks)
            return ims2, jnp.matmul(g, mats)

        return branch

    # branch order matches randaugment_v1_fused (same op-index semantics)
    branches = [
        photo(_v1_hsv),
        photo(_v1_noise),
        geo(_ra1_geo_scale_resize_crop),
        geo(_ra1_geo_shift_scale_rotate),
        photo(_v1_color),
        photo(_v1_blur),
        photo(_v1_brightness),
        photo(_v1_contrast),
        geo(_ra1_geo_rotate_crop),
    ]

    kop, kmag, kparam = jax.random.split(key, 3)
    op_idx = jax.random.randint(kop, (n,), 0, len(branches))  # batch-shared
    v = jax.random.randint(kmag, (n, b), 1, m)  # per image
    kparams = jax.random.split(kparam, n * b).reshape(n, b, -1)

    def stage(carry, xs):
        ims, g = carry
        i, vi, ki = xs
        ims, g = jax.lax.switch(i, branches, (ims, g, vi, ki))
        return (ims, g), None

    g0 = jnp.tile(_identity3()[None], (b, 1, 1))
    (imgs, g), _ = jax.lax.scan(stage, (imgs, g0), (op_idx, v, kparams))
    return jax.vmap(
        lambda im, gi: geometry.warp_affine_mxu(im, gi, pad_mode="reflect101")
    )(imgs, g)


def randaugment_v1_masked(img: jnp.ndarray, key: jax.Array, n: int, m: int) -> jnp.ndarray:
    """Masked-application fast variant of the v1 strong pool: each of the 9
    ops runs ONCE in canonical (pool) order, gated by its presence in the n
    with-replacement draws — so under vmap each image pays 9 op bodies + 1
    warp instead of the per-stage switch's compute-all-branches n x 9
    (``randaugment_v1_fused`` under vmap).

    Law vs the reference (models/randaugment.py:125-144): per-op presence
    P(op drawn >= once in n) is exact; magnitudes/params/p=0.5 gates draw
    per op per image as usual; per-image independence is kept (unlike the
    batch-shared ``randaugment_v1_shared_batch``).  Collapsed: op
    MULTIPLICITY — an op drawn k>1 times applies once, for photometric AND
    geometric ops alike (the fused variant would compose k independently-
    parameterized matrices; here each geometric op contributes at most one)
    — and op ORDER (canonical, not drawn; the fused warp already reorders
    geometry vs photometrics).  Measured numbers in PERF.md."""
    from ssl_cr_histo_tpu.ops.randaugment import (
        _v1_blur,
        _v1_brightness,
        _v1_color,
        _v1_contrast,
        _v1_hsv,
        _v1_noise,
    )

    s = img.shape[0]
    n_ops = 9
    kop, kmag, kparam = jax.random.split(key, 3)
    draws = jax.random.randint(kop, (n,), 0, n_ops)
    mask = jnp.any(draws[:, None] == jnp.arange(n_ops)[None, :], axis=0)
    v = jax.random.randint(kmag, (n_ops,), 1, m)
    keys = jax.random.split(kparam, n_ops)

    def photo(i, f):
        nonlocal img
        img = jnp.where(mask[i], f(img, v[i], keys[i]), img)

    g = _identity3()

    def geo(i, f):
        nonlocal img, g
        img2, mat = f(img, v[i], keys[i], s)
        img = jnp.where(mask[i], img2, img)
        g = jnp.where(mask[i], g @ mat, g)

    # canonical order = the pool/branch order of randaugment_v1_fused
    photo(0, _v1_hsv)
    photo(1, _v1_noise)
    geo(2, _ra1_geo_scale_resize_crop)
    geo(3, _ra1_geo_shift_scale_rotate)
    photo(4, _v1_color)
    photo(5, _v1_blur)
    photo(6, _v1_brightness)
    photo(7, _v1_contrast)
    geo(8, _ra1_geo_rotate_crop)
    return geometry.warp_affine_mxu(img, g, pad_mode="reflect101")


def transform_fix_masked(img: jnp.ndarray, key: jax.Array, n: int = 7, m: int = 10):
    """Weak/strong views with the masked v1 strong pool (per-image)."""
    return _transform_fix(img, key, randaugment_v1_masked, n, m)


def transform_fix_fast_batch(
    key: jax.Array, imgs: jnp.ndarray, n: int = 7, m: int = 10
):
    """Batch-level weak/strong views using the shared-sequence strong aug
    (see ``randaugment_v1_shared_batch``).  imgs: (B, S, S, 3) float."""
    b = imgs.shape[0]
    kw, ks1, ks2 = jax.random.split(key, 3)
    flipped = imgs[:, :, ::-1, :]

    def flip(k):
        gate = jax.random.bernoulli(k, 0.5, (b, 1, 1, 1))
        return jnp.where(gate, flipped, imgs)

    weak = flip(kw)
    strong = randaugment_v1_shared_batch(flip(ks1), ks2, n=n, m=m)
    return weak, strong


# ---------------------------------------------------------------------------
# v2 RandAugment, fused (Pretraining_v2/models/randaugment.py:176-213)
# ---------------------------------------------------------------------------
#
# Two fused variants:
#   * randaugment_v2_fused      — scan over n stages, one 14-way switch per
#     stage.  Under vmap every branch executes per stage (n x 14 op bodies).
#   * randaugment_v2_masked     — draw the EXACT without-replacement
#     selection set (rank-of-permutation < n gives the same joint law as
#     random.sample), then apply every op ONCE in canonical order under its
#     selection mask (14 op bodies total, ~n x cheaper).  Only the op
#     ORDER distribution differs from the reference.


def randaugment_v2_fused(img: jnp.ndarray, key: jax.Array, n: int, m: float) -> jnp.ndarray:
    from ssl_cr_histo_tpu.ops.randaugment import (
        _MAX_LEVEL,
        _signflip,
        _v2_autocontrast,
        _v2_brightness,
        _v2_color,
        _v2_contrast,
        _v2_equalize,
        _v2_hed,
        _v2_hsv,
        _v2_sharpness,
    )

    s = img.shape[0]

    def photo(f):
        def branch(a):
            im, g, v, k = a
            return f(im, v, k), g

        return branch

    def geo_mat(make):
        def branch(a):
            im, g, v, k = a
            return im, g @ make(v, k)

        return branch

    def rot_mat(v, k):
        deg = _signflip(k, (v / _MAX_LEVEL) * 30.0)
        return geometry.rotation_matrix(deg, s, s)

    def tx_mat(v, k):
        return geometry.translation_matrix(_signflip(k, (v / _MAX_LEVEL) * 10.0), 0.0)

    def ty_mat(v, k):
        return geometry.translation_matrix(0.0, _signflip(k, (v / _MAX_LEVEL) * 10.0))

    def shx_mat(v, k):
        return geometry.shear_x_matrix(_signflip(k, (v / _MAX_LEVEL) * 0.3))

    def shy_mat(v, k):
        return geometry.shear_y_matrix(_signflip(k, (v / _MAX_LEVEL) * 0.3))

    branches = [
        lambda a: (a[0], a[1]),  # identity
        photo(_v2_contrast),
        photo(_v2_brightness),
        photo(_v2_sharpness),
        geo_mat(rot_mat),
        geo_mat(tx_mat),
        geo_mat(ty_mat),
        geo_mat(shx_mat),
        geo_mat(shy_mat),
        photo(_v2_hed),
        photo(_v2_hsv),
        photo(_v2_autocontrast),
        photo(_v2_color),
        photo(_v2_equalize),
    ]

    kperm, kstages = jax.random.split(key)
    order = jax.random.permutation(kperm, len(branches))[:n]

    def prep(k):
        kmag, kparam = jax.random.split(k)
        return jax.random.uniform(kmag, (), minval=1.0, maxval=float(m)), kparam

    vals, kparams = jax.vmap(prep)(jax.random.split(kstages, n))

    def stage(carry, xs):
        im, g = carry
        i, vi, ki = xs
        im, g = jax.lax.switch(i, branches, (im, g, vi, ki))
        return (im, g), None

    (img, g), _ = jax.lax.scan(stage, (img, _identity3()), (order, vals, kparams))
    return geometry.warp_affine_mxu(img, g, pad_mode="constant")


def randaugment_v2_masked(img: jnp.ndarray, key: jax.Array, n: int, m: float) -> jnp.ndarray:
    """Masked-application fast variant of the fused v2 policy (see the block
    comment above): each pool op runs once in canonical order, gated by its
    exact without-replacement selection mask."""
    from ssl_cr_histo_tpu.ops.randaugment import (
        _MAX_LEVEL,
        _signflip,
        _v2_autocontrast,
        _v2_brightness,
        _v2_color,
        _v2_contrast,
        _v2_equalize,
        _v2_hed,
        _v2_hsv,
        _v2_sharpness,
    )

    s = img.shape[0]
    n_ops = 14
    kperm, kvals, kparams = jax.random.split(key, 3)
    # exact sample-without-replacement selection set: rank < n
    ranks = jnp.argsort(jax.random.uniform(kperm, (n_ops,)))
    mask = ranks < n
    vals = jax.random.uniform(kvals, (n_ops,), minval=1.0, maxval=float(m))
    keys = jax.random.split(kparams, n_ops)

    def photo(i, f):
        nonlocal img
        img = jnp.where(mask[i], f(img, vals[i], keys[i]), img)

    g = _identity3()

    def geo(i, make):
        nonlocal g
        g = jnp.where(mask[i], g @ make(vals[i], keys[i]), g)

    def rot_mat(v, k):
        return geometry.rotation_matrix(_signflip(k, (v / _MAX_LEVEL) * 30.0), s, s)

    def tx_mat(v, k):
        return geometry.translation_matrix(_signflip(k, (v / _MAX_LEVEL) * 10.0), 0.0)

    def ty_mat(v, k):
        return geometry.translation_matrix(0.0, _signflip(k, (v / _MAX_LEVEL) * 10.0))

    def shx_mat(v, k):
        return geometry.shear_x_matrix(_signflip(k, (v / _MAX_LEVEL) * 0.3))

    def shy_mat(v, k):
        return geometry.shear_y_matrix(_signflip(k, (v / _MAX_LEVEL) * 0.3))

    # canonical order = pool order (identity at 0 is a no-op either way)
    photo(1, _v2_contrast)
    photo(2, _v2_brightness)
    photo(3, _v2_sharpness)
    geo(4, rot_mat)
    geo(5, tx_mat)
    geo(6, ty_mat)
    geo(7, shx_mat)
    geo(8, shy_mat)
    photo(9, _v2_hed)
    photo(10, _v2_hsv)
    photo(11, _v2_autocontrast)
    photo(12, _v2_color)
    photo(13, _v2_equalize)
    return geometry.warp_affine_mxu(img, g, pad_mode="constant")
