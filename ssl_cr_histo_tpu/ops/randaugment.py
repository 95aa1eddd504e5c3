"""RandAugment policies (v1 + v2) and the pretraining augmentation pool,
expressed as traced JAX programs.

The reference applies these per-sample on CPU worker processes through
albumentations/PIL (v1 pool: ``models/randaugment.py:112-144`` and
``dataset.py:109-152``; v2 pool: ``Pretraining_v2/models/randaugment.py:
176-213``).  Here every op is a branch of a ``lax.switch`` over traced
magnitudes, so op *selection* stays data-dependent while the compiled program
is static — the whole policy jits, vmaps over the batch, and runs on the TPU
inside the train step.

Albumentations transforms default to p=0.5; the reference never overrides
that, so each stochastic sub-transform here is gated by a bernoulli(0.5) draw
to reproduce the training distribution.

Single-image functions operate on (H, W, 3) float32 RGB in [0, 1]; batch
entry points live in ``ssl_cr_histo_tpu.ops.batch``.

Even in exact (op-by-op) mode, bilinear resamples go through the MXU
two-pass warp (ops.geometry.warp_affine_mxu) — op semantics and ordering are
preserved; only the interpolation decomposition differs (tolerance-tested).
The v2 pool's PIL-nearest ops keep the direct gather resampler for
bit-faithful nearest sampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssl_cr_histo_tpu.ops import geometry, photometric, stain


def _maybe(key: jax.Array, out: jnp.ndarray, img: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    """Apply-with-probability-p: select between transformed and original."""
    return jnp.where(jax.random.bernoulli(key, p), out, img)


def _signflip(key: jax.Array, v):
    return jnp.where(jax.random.bernoulli(key), v, -v)


def _mag_v1(v, minval: float, maxval: float):
    """v1 magnitude mapping: val = (v/30) * (max-min) + min
    (reference models/randaugment.py:136)."""
    return (v.astype(jnp.float32) / 30.0) * (maxval - minval) + minval


# ---------------------------------------------------------------------------
# v1 strong-augmentation pool (reference models/randaugment.py:51-123)
# Each op: (img, v_int, key) -> img, with v_int a traced int in [1, m).
# ---------------------------------------------------------------------------


def _v1_hsv(img, v, key):
    val = jnp.abs(_mag_v1(v, -1.0, 1.0))
    kh, ks, kv, kp = jax.random.split(key, 4)
    out = photometric.hsv_shift(
        img,
        hue_shift=jax.random.uniform(kh, (), minval=-val, maxval=val),
        sat_shift=jax.random.uniform(ks, (), minval=-val, maxval=val),
        val_shift=jax.random.uniform(kv, (), minval=-val, maxval=val),
    )
    return _maybe(kp, out, img)


def _v1_noise(img, v, key):
    val = _mag_v1(v, 0.0, 0.15)
    ks, kn, kp = jax.random.split(key, 3)
    sigma = jax.random.uniform(ks, (), minval=0.0, maxval=val)
    return _maybe(kp, photometric.gaussian_noise(img, kn, sigma), img)


def _v1_scale_resize_crop(img, v, key):
    # RandomScale is immediately undone by the fixed Resize (reference
    # models/randaugment.py:67-68); net effect = resize to S+20, random crop S.
    s = img.shape[0]
    big = geometry.resize(img, s + 20, s + 20)
    return geometry.random_crop(big, key, s, s)


def _v1_shift_scale_rotate(img, v, key):
    val = _mag_v1(v, 0.01, 0.1)
    kx, ky, ks, ka, kp = jax.random.split(key, 5)
    h, w = img.shape[0], img.shape[1]
    mat = geometry.shift_scale_rotate_matrix(
        shift_x=jax.random.uniform(kx, (), minval=-val, maxval=val),
        shift_y=jax.random.uniform(ky, (), minval=-val, maxval=val),
        scale=jax.random.uniform(ks, (), minval=1.0 - (val + 0.5), maxval=1.0 + (val + 0.5)),
        degrees=jax.random.uniform(ka, (), minval=-90.0, maxval=90.0),
        h=h,
        w=w,
    )
    out = geometry.warp_affine_mxu(img, mat, pad_mode="reflect101")
    return _maybe(kp, out, img)


def _hed_color(img, key):
    """v1 Color op: HED shift with per-channel sigma ~ U(-0.035, 0.035) and
    shift ~ Normal(0, sigma) (reference models/randaugment.py:81-84)."""
    ksig, knorm = jax.random.split(key)
    sigma = jax.random.uniform(ksig, (3,), minval=-0.035, maxval=0.035)
    d = jax.random.normal(knorm, (3,)) * sigma
    return stain.hed_shift(img, d[0], d[1], d[2])


def _v1_color(img, v, key):
    return _hed_color(img, key)


def _v1_blur(img, v, key):
    # blur_limit = int(val + 5) == 5 for every magnitude; ksize in {3, 5}.
    kk, kp = jax.random.split(key)
    ksize = 3 + 2 * jax.random.randint(kk, (), 0, 2)
    return _maybe(kp, photometric.box_blur(img, ksize, max_ksize=5), img)


def _v1_brightness(img, v, key):
    val = jnp.abs(_mag_v1(v, -0.2, 0.2))
    kb, kc, kp = jax.random.split(key, 3)
    out = photometric.brightness_contrast(
        img,
        brightness=jax.random.uniform(kb, (), minval=-val, maxval=val),
        contrast=jax.random.uniform(kc, (), minval=-0.2, maxval=0.2),
    )
    return _maybe(kp, out, img)


def _v1_contrast(img, v, key):
    val = jnp.abs(_mag_v1(v, -0.2, 0.2))
    kb, kc, kp = jax.random.split(key, 3)
    out = photometric.brightness_contrast(
        img,
        brightness=jax.random.uniform(kb, (), minval=-0.2, maxval=0.2),
        contrast=jax.random.uniform(kc, (), minval=-val, maxval=val),
    )
    return _maybe(kp, out, img)


def _random_flip(img, key):
    """albumentations ``Flip`` (p=0.5): one of hflip / vflip / both."""
    kd, kp = jax.random.split(key)
    d = jax.random.randint(kd, (), 0, 3)
    out = jax.lax.switch(
        d,
        [
            geometry.flip_horizontal,
            geometry.flip_vertical,
            lambda x: geometry.flip_horizontal(geometry.flip_vertical(x)),
        ],
        img,
    )
    return _maybe(kp, out, img)


def _v1_rotate_crop(img, v, key):
    val = jnp.abs(_mag_v1(v, -90.0, 90.0))
    kf, ka, kp = jax.random.split(key, 3)
    img = _random_flip(img, kf)
    angle = jax.random.uniform(ka, (), minval=-val, maxval=val)
    mat = geometry.rotation_matrix(angle, img.shape[0], img.shape[1])
    out = geometry.warp_affine_mxu(img, mat, pad_mode="reflect101")
    return _maybe(kp, out, img)


V1_POOL = [
    _v1_hsv,
    _v1_noise,
    _v1_scale_resize_crop,
    _v1_shift_scale_rotate,
    _v1_color,
    _v1_blur,
    _v1_brightness,
    _v1_contrast,
    _v1_rotate_crop,
]


def randaugment_v1(img: jnp.ndarray, key: jax.Array, n: int, m: int) -> jnp.ndarray:
    """v1 RandAugment (reference models/randaugment.py:125-144): n ops drawn
    WITH replacement, integer magnitude v ~ randint(1, m) per op.

    Implemented as a ``lax.scan`` over n stages with one ``lax.switch`` body —
    every pool op is shape-preserving, so the compiled program contains each
    op exactly once regardless of n.
    """
    branches = [lambda a, f=f: f(a[0], a[1], a[2]) for f in V1_POOL]

    def prep(k):
        kop, kmag, kparam = jax.random.split(k, 3)
        return (
            jax.random.randint(kop, (), 0, len(V1_POOL)),
            jax.random.randint(kmag, (), 1, m),
            kparam,
        )

    op_idx, v, kparams = jax.vmap(prep)(jax.random.split(key, n))

    def stage(img, xs):
        i, vi, ki = xs
        return jax.lax.switch(i, branches, (img, vi, ki)), None

    img, _ = jax.lax.scan(stage, img, (op_idx, v, kparams))
    return img


# ---------------------------------------------------------------------------
# v1 pretraining pool (reference dataset.py:109-152) — all 8 ops applied in a
# random order shared by the 3 resolution tiles of a triplet.
# ---------------------------------------------------------------------------


def _p_hsv(img, key):
    kh, ks, kv, kp = jax.random.split(key, 4)
    out = photometric.hsv_shift(
        img,
        hue_shift=jax.random.uniform(kh, (), minval=-0.1, maxval=0.1),
        sat_shift=jax.random.uniform(ks, (), minval=-1.0, maxval=1.0),
        val_shift=jax.random.uniform(kv, (), minval=-20.0, maxval=20.0),
    )
    return _maybe(kp, out, img)


def _p_noise(img, key):
    ks, kn, kp = jax.random.split(key, 3)
    sigma = jax.random.uniform(ks, (), minval=0.0, maxval=0.1)
    return _maybe(kp, photometric.gaussian_noise(img, kn, sigma), img)


def _p_scale_resize_crop(img, key):
    ka, kp, kc = jax.random.split(key, 3)
    s = img.shape[0]
    angle = jax.random.uniform(ka, (), minval=-90.0, maxval=90.0)
    mat = geometry.rotation_matrix(angle, s, s)
    img = _maybe(kp, geometry.warp_affine_mxu(img, mat, pad_mode="reflect101"), img)
    big = geometry.resize(img, s + 20, s + 20)
    return geometry.random_crop(big, kc, s, s)


def _p_shift_scale_rotate(img, key):
    kf, kx, ky, ks, ka, kp = jax.random.split(key, 6)
    img = jnp.where(jax.random.bernoulli(kf), geometry.flip_horizontal(img), img)
    h, w = img.shape[0], img.shape[1]
    mat = geometry.shift_scale_rotate_matrix(
        shift_x=jax.random.uniform(kx, (), minval=-0.0625, maxval=0.0625),
        shift_y=jax.random.uniform(ky, (), minval=-0.0625, maxval=0.0625),
        scale=jax.random.uniform(ks, (), minval=0.5, maxval=1.5),
        degrees=jax.random.uniform(ka, (), minval=-45.0, maxval=45.0),
        h=h,
        w=w,
    )
    out = geometry.warp_affine_mxu(img, mat, pad_mode="reflect101")
    return _maybe(kp, out, img)


def _p_color(img, key):
    return _hed_color(img, key)


def _p_blur(img, key):
    kk, kp = jax.random.split(key)
    ksize = 3 + 2 * jax.random.randint(kk, (), 0, 3)  # {3, 5, 7}
    return _maybe(kp, photometric.box_blur(img, ksize, max_ksize=7), img)


def _p_brightness_contrast(img, key):
    kb, kc, kp = jax.random.split(key, 3)
    out = photometric.brightness_contrast(
        img,
        brightness=jax.random.uniform(kb, (), minval=-0.2, maxval=0.2),
        contrast=jax.random.uniform(kc, (), minval=-0.2, maxval=0.2),
    )
    return _maybe(kp, out, img)


def _p_rotate_crop(img, key):
    ka, kp = jax.random.split(key)
    angle = jax.random.uniform(ka, (), minval=-90.0, maxval=90.0)
    mat = geometry.rotation_matrix(angle, img.shape[0], img.shape[1])
    return _maybe(kp, geometry.warp_affine_mxu(img, mat, pad_mode="reflect101"), img)


PRETRAIN_POOL_V1 = [
    _p_hsv,
    _p_noise,
    _p_scale_resize_crop,
    _p_shift_scale_rotate,
    _p_color,
    _p_blur,
    _p_brightness_contrast,
    _p_rotate_crop,
]


def pretrain_augment_v1(tiles: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Apply all 8 pretraining ops in a random order to the 3 tiles of one RSP
    triplet (reference dataset.py:166-213: the op *order* is shared across
    tiles, the per-op random parameters are drawn independently per tile).

    tiles: (3, H, W, 3) float32 in [0, 1].
    """
    n_ops = len(PRETRAIN_POOL_V1)
    kperm, kparams = jax.random.split(key)
    order = jax.random.permutation(kperm, n_ops)
    branches = [lambda a, f=f: f(a[0], a[1]) for f in PRETRAIN_POOL_V1]

    def aug_tile(tile, tile_key):
        stage_keys = jax.random.split(tile_key, n_ops)

        def stage(img, xs):
            i, ki = xs
            return jax.lax.switch(i, branches, (img, ki)), None

        tile, _ = jax.lax.scan(stage, tile, (order, stage_keys))
        return tile

    return jax.vmap(aug_tile)(tiles, jax.random.split(kparams, tiles.shape[0]))


# ---------------------------------------------------------------------------
# v2 pool (reference Pretraining_v2/models/randaugment.py:176-213)
# Each op: (img, val, key) -> img, with val a traced float in [1, m].
# ---------------------------------------------------------------------------

_MAX_LEVEL = 10.0


def _enh_factor(val):
    return (val / _MAX_LEVEL) * 1.8 + 0.1


def _v2_identity(img, val, key):
    return img


def _v2_contrast(img, val, key):
    return photometric.pil_contrast(img, _enh_factor(val))


def _v2_brightness(img, val, key):
    return photometric.pil_brightness(img, _enh_factor(val))


def _v2_sharpness(img, val, key):
    return photometric.pil_sharpness(img, _enh_factor(val))


def _v2_rotate(img, val, key):
    deg = _signflip(key, (val / _MAX_LEVEL) * 30.0)
    mat = geometry.rotation_matrix(deg, img.shape[0], img.shape[1])
    # PIL Image.rotate defaults to nearest resampling with black fill.
    return geometry.warp_affine(img, mat, interp="nearest", pad_mode="constant")


def _v2_translate_x(img, val, key):
    px = _signflip(key, (val / _MAX_LEVEL) * 10.0)
    return geometry.warp_affine(
        img, geometry.translation_matrix(px, 0.0), interp="nearest", pad_mode="constant"
    )


def _v2_translate_y(img, val, key):
    px = _signflip(key, (val / _MAX_LEVEL) * 10.0)
    return geometry.warp_affine(
        img, geometry.translation_matrix(0.0, px), interp="nearest", pad_mode="constant"
    )


def _v2_shear_x(img, val, key):
    lvl = _signflip(key, (val / _MAX_LEVEL) * 0.3)
    return geometry.warp_affine(img, geometry.shear_x_matrix(lvl), pad_mode="constant")


def _v2_shear_y(img, val, key):
    lvl = _signflip(key, (val / _MAX_LEVEL) * 0.3)
    return geometry.warp_affine(img, geometry.shear_y_matrix(lvl), pad_mode="constant")


def _v2_hed(img, val, key):
    f = val * 0.03
    ks, kb = jax.random.split(key)
    sigmas = jax.random.uniform(ks, (3,), minval=-f, maxval=f)
    biases = jax.random.uniform(kb, (3,), minval=-f, maxval=f)
    return stain.hed_color_augment(img, sigmas, biases, 0.15, 0.85)


def _v2_hsv(img, val, key):
    f = val * 0.03
    kh, ks = jax.random.split(key)
    sigmas = jnp.stack(
        [
            jax.random.uniform(kh, (), minval=-f, maxval=f),
            jax.random.uniform(ks, (), minval=-f, maxval=f),
            jnp.float32(0.0),
        ]
    )
    return stain.hsb_color_augment(img, sigmas)


def _v2_autocontrast(img, val, key):
    return photometric.autocontrast(img)


def _v2_color(img, val, key):
    return photometric.pil_color(img, _enh_factor(val))


def _v2_equalize(img, val, key):
    return photometric.equalize(img)


V2_POOL = [
    _v2_identity,
    _v2_contrast,
    _v2_brightness,
    _v2_sharpness,
    _v2_rotate,
    _v2_translate_x,
    _v2_translate_y,
    _v2_shear_x,
    _v2_shear_y,
    _v2_hed,
    _v2_hsv,
    _v2_autocontrast,
    _v2_color,
    _v2_equalize,
]


def randaugment_v2(img: jnp.ndarray, key: jax.Array, n: int, m: float) -> jnp.ndarray:
    """v2 RandAugment (Pretraining_v2/models/randaugment.py:195-213): n ops
    drawn WITHOUT replacement, magnitude val ~ uniform(1, m) per op."""
    branches = [lambda a, f=f: f(a[0], a[1], a[2]) for f in V2_POOL]
    kperm, kstages = jax.random.split(key)
    order = jax.random.permutation(kperm, len(V2_POOL))[:n]

    def prep(k):
        kmag, kparam = jax.random.split(k)
        return jax.random.uniform(kmag, (), minval=1.0, maxval=float(m)), kparam

    vals, kparams = jax.vmap(prep)(jax.random.split(kstages, n))

    def stage(img, xs):
        i, vi, ki = xs
        return jax.lax.switch(i, branches, (img, vi, ki)), None

    img, _ = jax.lax.scan(stage, img, (order, vals, kparams))
    return img


# ---------------------------------------------------------------------------
# TransformFix — weak/strong views for consistency training
# (reference dataset.py:663-677)
# ---------------------------------------------------------------------------


def transform_fix(img: jnp.ndarray, key: jax.Array, n: int = 7, m: int = 10):
    """Return (weak, strong) views.  weak = random hflip (+ identity crop —
    inputs are already at target size, matching the reference where
    RandomCrop(image_size) on an image_size input is a no-op); strong = random
    hflip + RandAugment_v1(n, m=10)."""
    kw, ks1, ks2 = jax.random.split(key, 3)
    weak = jnp.where(jax.random.bernoulli(kw), geometry.flip_horizontal(img), img)
    strong = jnp.where(jax.random.bernoulli(ks1), geometry.flip_horizontal(img), img)
    strong = randaugment_v1(strong, ks2, n=n, m=m)
    return weak, strong
