"""Batched, jit-ready augmentation entry points.

These are the on-device replacements for the reference's CPU DataLoader-worker
augmentation (reference ``dataset.py:157-216`` pretrain pool,
``dataset.py:487-536`` 3-view supervised stack, ``dataset.py:663-677``
weak/strong TransformFix).  Loaders ship raw uint8 patches to the device; the
whole augmentation stack runs inside the jitted train step, fused by XLA.

Conventions: uint8 NHWC in, float32 NHWC in [0, 1] out (normalization is a
separate final op so eval paths can share it).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ssl_cr_histo_tpu.ops import fused, geometry, randaugment

# Channel statistics used by the reference (plain /255 scaling — the
# reference normalizes only by ToTensor; keep mean 0 / std 1 defaults).
DEFAULT_MEAN = (0.0, 0.0, 0.0)
DEFAULT_STD = (1.0, 1.0, 1.0)


def to_float(img_u8: jnp.ndarray) -> jnp.ndarray:
    return img_u8.astype(jnp.float32) / 255.0


def _clip01(img: jnp.ndarray) -> jnp.ndarray:
    """Final [0,1] clamp for augmented batches.  The reference clips to the
    uint8 range at every albumentations op; here one fused clamp at the
    batch boundary suffices — the bf16 MXU warp's interpolation weights can
    overshoot by ~1e-3 on TPU (they sum to 1 only in f32)."""
    return jnp.clip(img, 0.0, 1.0)


def augment_rsp_batch_v1(
    key: jax.Array, triplets_u8: jnp.ndarray, mode: str = "fused",
    photometric: str = "xla", planar_out: bool = False,
) -> jnp.ndarray:
    """v1 RSP pretraining augmentation: all 8 pool ops per triplet.

    mode='fused' (default): single-warp fast path (ops.fused); mode='exact':
    op-by-op replay of the reference semantics, random order shared across
    the 3 tiles (ops.randaugment).
    photometric='pallas' (fused mode, TPU only): run the photometric chain
    in the VMEM-resident Pallas kernel (ops.pallas_photometric).

    triplets_u8: (B, 3, H, W, 3) uint8 -> (B, 3, H, W, 3) float32, or
    (B, 3, 3, H, W) channel-planar with ``planar_out=True`` (pallas path
    only) — the kernel's native layout, so the NHWC<->planar relayouts
    around it disappear and the caller's first conv absorbs the final
    planar->NHWC transpose for free (XLA layout assignment).
    """
    b = triplets_u8.shape[0]
    if mode == "fused" and photometric == "pallas":
        from ssl_cr_histo_tpu.ops import pallas_photometric as PP

        kg, kp = jax.random.split(key)
        t, h, w = triplets_u8.shape[1:4]
        # one cheap uint8 relayout up front; planar float32 from there on
        flat_u8 = triplets_u8.reshape(b * t, h, w, 3)
        imgs_p = to_float(flat_u8.transpose(0, 3, 1, 2))  # (N, 3, H, W)
        warped = jax.vmap(fused.pretrain_geo_warp_planar)(
            imgs_p, jax.random.split(kg, b * t)
        )
        out = _clip01(PP.pretrain_photometric_pallas(warped, kp, planar_io=True))
        out = out.reshape(b, t, 3, h, w)
        if planar_out:
            return out
        return out.transpose(0, 1, 3, 4, 2)
    if planar_out:
        raise ValueError("planar_out is only supported on the fused+pallas path")
    imgs = to_float(triplets_u8)
    keys = jax.random.split(key, b)
    fn = fused.pretrain_augment_v1_fused if mode == "fused" else randaugment.pretrain_augment_v1
    return _clip01(jax.vmap(fn)(imgs, keys))


def augment_rsp_batch_v2(
    key: jax.Array, triplets_u8: jnp.ndarray, n: int = 2, m: float = 3.0,
    mode: str = "fused",
) -> jnp.ndarray:
    """v2 RSP pretraining augmentation: RandAugment(n, m) drawn independently
    per tile (Pretraining_v2/dataset.py:92-95)."""
    b, t = triplets_u8.shape[0], triplets_u8.shape[1]
    imgs = to_float(triplets_u8)
    keys = jax.random.split(key, b * t).reshape(b, t, 2)
    ra = {
        "fused": fused.randaugment_v2_fused,
        "fast": fused.randaugment_v2_masked,
        "masked": fused.randaugment_v2_masked,
        "exact": randaugment.randaugment_v2,
    }[mode]

    def per_tile(img, k):
        return ra(img, k, n=n, m=m)

    return _clip01(jax.vmap(jax.vmap(per_tile))(imgs, keys))


def _three_view(img: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """The supervised fine-tune 3-view stack (reference dataset.py:487-536):
    [identity, rotate+centercrop, rotate+resize(S+20)+randomcrop], shuffled.
    Rotations apply with p=0.5 (albumentations default)."""
    s = img.shape[0]
    k2a, k2p, k3a, k3p, k3c, kshuf = jax.random.split(key, 6)

    def rot(im, ka, kp):
        angle = jax.random.uniform(ka, (), minval=-90.0, maxval=90.0)
        mat = geometry.rotation_matrix(angle, im.shape[0], im.shape[1])
        out = geometry.warp_affine_mxu(im, mat, pad_mode="reflect101")
        return jnp.where(jax.random.bernoulli(kp), out, im)

    v1 = img
    v2 = rot(img, k2a, k2p)
    v3 = rot(img, k3a, k3p)
    v3 = geometry.resize(v3, s + 20, s + 20)
    v3 = geometry.random_crop(v3, k3c, s, s)
    views = jnp.stack([v1, v2, v3])
    perm = jax.random.permutation(kshuf, 3)
    return views[perm]


def augment_3view_batch(key: jax.Array, imgs_u8: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> (B, 3, H, W, 3) float32 shuffled 3-view stacks."""
    b = imgs_u8.shape[0]
    imgs = to_float(imgs_u8)
    keys = jax.random.split(key, b)
    return _clip01(jax.vmap(_three_view)(imgs, keys))


def transform_fix_batch(
    key: jax.Array, imgs_u8: jnp.ndarray, n: int = 7, m: int = 10,
    mode: str = "fused",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weak/strong views for consistency training.

    (B, H, W, 3) uint8 -> (weak, strong) float32 pairs.
    """
    b = imgs_u8.shape[0]
    imgs = to_float(imgs_u8)
    if mode == "fast":
        # batch-shared strong-aug op sequence (scalar switch: only the
        # drawn op body executes per stage); per-image params/magnitudes.
        # See fused.randaugment_v1_shared_batch for the law note.
        weak, strong = fused.transform_fix_fast_batch(key, imgs, n=n, m=m)
        return _clip01(weak), _clip01(strong)
    keys = jax.random.split(key, b)
    base = {
        "fused": fused.transform_fix_fused,
        "masked": fused.transform_fix_masked,  # per-image masked pool (law note there)
        "exact": randaugment.transform_fix,
    }[mode]
    fn = partial(base, n=n, m=m)
    weak, strong = jax.vmap(fn)(imgs, keys)
    return _clip01(weak), _clip01(strong)


def normalize_batch(
    imgs: jnp.ndarray, mean=DEFAULT_MEAN, std=DEFAULT_STD, channel_axis: int = -1
) -> jnp.ndarray:
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    if channel_axis != -1 and channel_axis != imgs.ndim - 1:
        shape = [1] * imgs.ndim
        shape[channel_axis] = mean.shape[0] if mean.ndim else 1
        mean = jnp.broadcast_to(mean, (shape[channel_axis],)).reshape(shape)
        std = jnp.broadcast_to(std, (shape[channel_axis],)).reshape(shape)
    return (imgs - mean) / std
