"""Pallas TPU kernel: the v1 pretraining photometric chain fused into one
VMEM-resident pass.

The XLA version of the chain (``ops.fused._pretrain_photometric``) breaks
into several fusions (color-space converts, the blur conv, selects), each
paying an HBM round trip on a 256x256x3 tile.  This kernel keeps the tile in
VMEM for the whole chain — one HBM read, one write — and draws the per-pixel
noise with the on-core PRNG:

    HSV shift (p=.5) -> additive Gaussian noise (p=.5) -> HED stain shift
    -> box blur 3/5/7 (p=.5) -> brightness/contrast (p=.5)

Per-tile scalar parameters (shift magnitudes, gates, blur size) are drawn on
the host side of the jit (cheap) and prefetched to SMEM; the kernel grid is
one step per tile.

Reference provenance: pool ops at reference ``dataset.py:109-152``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssl_cr_histo_tpu.ops import color

# params vector layout (float32):
#   0: hue_shift   1: sat_shift   2: val_shift   3: hsv_gate
#   4: noise_sigma 5: noise_gate
#   6: hed_dh      7: hed_de      8: hed_dd
#   9: blur_ksize (3/5/7)         10: blur_gate
#  11: brightness 12: contrast    13: bc_gate
N_PARAMS = 16


def _uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 random bits -> uniform floats in (0, 1).

    Mosaic has no uint32->float32 cast; stuff 23 random bits into the
    mantissa of 1.0f and subtract (the classic bit trick): gives [0, 1)."""
    mantissa = bits >> jnp.uint32(9)
    one_to_two = pltpu.bitcast(mantissa | jnp.uint32(0x3F800000), jnp.float32)
    return (one_to_two - 1.0) + 1e-7


def _reflect_pad_rows(img: jnp.ndarray, r: int) -> jnp.ndarray:
    """reflect101 row padding built from explicit single-row slices (jnp's
    negative-step slicing lowers to `rev`, which Mosaic lacks)."""
    h = img.shape[0]
    top = [img[k : k + 1] for k in range(r, 0, -1)]
    bot = [img[h - 1 - k : h - k] for k in range(1, r + 1)]
    return jnp.concatenate(top + [img] + bot, axis=0)


def _box_blur_vmem(img: jnp.ndarray, ksize: jnp.ndarray, max_k: int = 7) -> jnp.ndarray:
    """Box blur via shift-accumulate on a VMEM-resident (H, W, C) tile with
    reflect101 borders; traced odd ``ksize`` <= max_k via masked taps."""
    r = max_k // 2
    padded = _reflect_pad_rows(img, r)
    padded = _reflect_pad_rows(padded.transpose(1, 0, 2), r).transpose(1, 0, 2)
    h, w = img.shape[0], img.shape[1]
    half = (ksize - 1.0) / 2.0
    acc_rows = jnp.zeros_like(img)
    norm = jnp.float32(0.0)
    # vertical taps
    for dy in range(-r, r + 1):
        tap = (jnp.abs(jnp.float32(dy)) <= half).astype(jnp.float32)
        acc_rows = acc_rows + tap * padded[dy + r : dy + r + h, r : r + w, :]
        norm = norm + tap
    acc_rows = acc_rows / norm
    # horizontal taps
    padded2 = _reflect_pad_rows(acc_rows.transpose(1, 0, 2), r).transpose(1, 0, 2)
    acc = jnp.zeros_like(img)
    for dx in range(-r, r + 1):
        tap = (jnp.abs(jnp.float32(dx)) <= half).astype(jnp.float32)
        acc = acc + tap * padded2[:, dx + r : dx + r + w, :]
    return acc / norm


def _mat3_apply(c0, c1, c2, m) -> tuple:
    """(3-channel planes) @ m with python-float matrix entries (kernel-safe:
    no captured constant arrays)."""
    return (
        c0 * m[0][0] + c1 * m[1][0] + c2 * m[2][0],
        c0 * m[0][1] + c1 * m[1][1] + c2 * m[2][1],
        c0 * m[0][2] + c1 * m[1][2] + c2 * m[2][2],
    )


_RGB_FROM_HED = tuple(tuple(float(v) for v in row) for row in color.RGB_FROM_HED)
_HED_FROM_RGB = tuple(tuple(float(v) for v in row) for row in color.HED_FROM_RGB)


def _hed_shift_scalar(img: jnp.ndarray, dh, de, dd) -> jnp.ndarray:
    """Legacy-skimage HED shift with unrolled 3x3 matmuls (matches
    ops.stain.hed_shift)."""
    r, g, b = -jnp.log(img[..., 0] + 2.0), -jnp.log(img[..., 1] + 2.0), -jnp.log(img[..., 2] + 2.0)
    h, e, d = _mat3_apply(r, g, b, _HED_FROM_RGB)
    h, e, d = h + dh, e + de, d + dd
    lr, lg, lb = _mat3_apply(-h, -e, -d, _RGB_FROM_HED)
    out = jnp.stack([jnp.exp(lr), jnp.exp(lg), jnp.exp(lb)], axis=-1)
    return jnp.clip((out - 1.0) / 2.0, 0.0, 1.0)


def _chain(img: jnp.ndarray, p: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """The photometric chain on a resident (H, W, 3) tile."""
    # HSV shift
    hsv = color.rgb2hsv(img)
    h = (hsv[..., 0] + p[0] / 180.0) % 1.0
    s = jnp.clip(hsv[..., 1] + p[1] / 255.0, 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] + p[2] / 255.0, 0.0, 1.0)
    out = color.hsv2rgb(jnp.stack([h, s, v], axis=-1))
    img = jnp.where(p[3] > 0.5, out, img)
    # Gaussian noise
    out = jnp.clip(img + noise * p[4], 0.0, 1.0)
    img = jnp.where(p[5] > 0.5, out, img)
    # HED shift (always applied)
    img = _hed_shift_scalar(img, p[6], p[7], p[8])
    # Box blur
    out = _box_blur_vmem(img, p[9])
    img = jnp.where(p[10] > 0.5, out, img)
    # Brightness / contrast
    out = jnp.clip(img * (1.0 + p[12]) + p[11], 0.0, 1.0)
    return jnp.where(p[13] > 0.5, out, img)


def _kernel_prng(seed_ref, params_ref, img_ref, out_ref):
    """TPU kernel: per-pixel Gaussian noise from the on-core PRNG.

    seeds/params arrive via scalar prefetch (whole arrays in SMEM), indexed
    by the grid position."""
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[i])
    img = img_ref[0]
    h, w, c = img.shape
    # Box-Muller gaussian from two uniform draws
    u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits((h, w, c)), jnp.uint32))
    u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits((h, w, c)), jnp.uint32))
    noise = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
    p = tuple(params_ref[i, j] for j in range(N_PARAMS))  # SMEM scalar loads
    out_ref[0] = _chain(img, p, noise)


def _kernel_noise_input(seed_ref, params_ref, img_ref, noise_ref, out_ref):
    """Variant with host-supplied noise (interpret-mode tests; the Pallas
    PRNG primitives lower only on real TPUs)."""
    i = pl.program_id(0)
    p = tuple(params_ref[i, j] for j in range(N_PARAMS))
    out_ref[0] = _chain(img_ref[0], p, noise_ref[0])


def draw_params(key: jax.Array, n: int) -> jnp.ndarray:
    """Draw the per-tile parameter vectors with the reference distributions
    (dataset.py:109-152 + albumentations p=0.5 defaults)."""
    ks = jax.random.split(key, 12)
    u = lambda k, lo, hi: jax.random.uniform(k, (n,), minval=lo, maxval=hi)
    g = lambda k: jax.random.bernoulli(k, 0.5, (n,)).astype(jnp.float32)
    params = jnp.zeros((n, N_PARAMS), jnp.float32)
    params = params.at[:, 0].set(u(ks[0], -0.1, 0.1))
    params = params.at[:, 1].set(u(ks[1], -1.0, 1.0))
    params = params.at[:, 2].set(u(ks[2], -20.0, 20.0))
    params = params.at[:, 3].set(g(ks[3]))
    params = params.at[:, 4].set(u(ks[4], 0.0, 0.1))
    params = params.at[:, 5].set(g(ks[5]))
    ksig, knorm = jax.random.split(ks[6])
    sigma = jax.random.uniform(ksig, (n, 3), minval=-0.035, maxval=0.035)
    hed = jax.random.normal(knorm, (n, 3)) * sigma
    params = params.at[:, 6:9].set(hed)
    params = params.at[:, 9].set(3.0 + 2.0 * jax.random.randint(ks[7], (n,), 0, 3).astype(jnp.float32))
    params = params.at[:, 10].set(g(ks[8]))
    params = params.at[:, 11].set(u(ks[9], -0.2, 0.2))
    params = params.at[:, 12].set(u(ks[10], -0.2, 0.2))
    params = params.at[:, 13].set(g(ks[11]))
    return params


def pretrain_photometric_pallas(
    imgs: jnp.ndarray,
    key: jax.Array,
    interpret: bool = False,
    noise: jnp.ndarray | None = None,
    params: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fused photometric chain over (N, H, W, 3) float32 tiles.

    On TPU the noise comes from the on-core PRNG; pass ``noise`` explicitly
    (and usually ``interpret=True``) on other platforms/tests.
    """
    n, h, w, c = imgs.shape
    if params is None:
        params = draw_params(key, n)
    seeds = jax.random.randint(
        jax.random.fold_in(key, 1), (n,), minval=0, maxval=2**31 - 1, dtype=jnp.int32
    )
    img_spec = pl.BlockSpec((1, h, w, c), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, h, w, c), jnp.float32)
    if noise is None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # seeds, params live whole in SMEM
            grid=(n,),
            in_specs=[img_spec],
            out_specs=img_spec,
        )
        return pl.pallas_call(
            _kernel_prng, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret
        )(seeds, params, imgs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[img_spec, img_spec],
        out_specs=img_spec,
    )
    return pl.pallas_call(
        _kernel_noise_input, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret
    )(seeds, params, imgs, noise)


def reference_chain(imgs: jnp.ndarray, params: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Pure-jnp oracle of the kernel's math (same params/noise), for tests."""
    return jax.vmap(_chain)(imgs, params, noise)
