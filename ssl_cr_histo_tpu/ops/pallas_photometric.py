"""Pallas TPU kernel: the v1 pretraining photometric chain fused into one
VMEM-resident pass.

The XLA version of the chain (``ops.fused._pretrain_photometric``) breaks
into several fusions (color-space converts, the blur conv, selects), each
paying an HBM round trip on a 256x256x3 tile.  This kernel keeps the tile in
VMEM for the whole chain — one HBM read, one write — and draws the per-pixel
noise with the on-core PRNG:

    HSV shift (p=.5) -> additive Gaussian noise (p=.5) -> HED stain shift
    -> box blur 3/5/7 (p=.5) -> brightness/contrast (p=.5)

TPU-first data layout: the kernel works on CHANNEL-PLANAR (3, H, W) blocks —
each color plane is a cleanly (8,128)-tileable (H, W) array.  A channels-
minor (H, W, 3) layout forces Mosaic into per-op relayouts of a 3-wide minor
dimension (pathological at 256x256).  The public entry point keeps the
framework's NHWC convention and transposes at the boundary.

Per-tile scalar parameters (shift magnitudes, gates, blur size) are drawn on
the host side of the jit (cheap) and land in SMEM via scalar prefetch.

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
    mantissa of 1.0f and subtract (the classic bit trick)."""
    mantissa = bits >> jnp.uint32(9)
    one_to_two = pltpu.bitcast(mantissa | jnp.uint32(0x3F800000), jnp.float32)
    return (one_to_two - 1.0) + 1e-7


def _reflect_pad_rows(img: jnp.ndarray, r: int) -> jnp.ndarray:
    """reflect101 row padding of a (H, W) plane from explicit single-row
    slices (negative-step slicing lowers to `rev`, which Mosaic lacks)."""
    h = img.shape[0]
    top = [img[k : k + 1] for k in range(r, 0, -1)]
    bot = [img[h - 1 - k : h - k] for k in range(1, r + 1)]
    return jnp.concatenate(top + [img] + bot, axis=0)


def _box_blur_plane(img: jnp.ndarray, ksize, max_k: int = 7) -> jnp.ndarray:
    """Box blur of one (H, W) plane via shift-accumulate with reflect101
    borders; traced odd ``ksize`` <= max_k via masked taps."""
    r = max_k // 2
    h, w = img.shape
    half = (ksize - 1.0) / 2.0
    padded = _reflect_pad_rows(img, r)
    acc = jnp.zeros_like(img)
    norm = jnp.float32(0.0)
    for dy in range(-r, r + 1):
        tap = (jnp.abs(jnp.float32(dy)) <= half).astype(jnp.float32)
        acc = acc + tap * padded[dy + r : dy + r + h, :]
        norm = norm + tap
    acc = acc / norm
    padded2 = _reflect_pad_rows(acc.T, r)
    acc2 = jnp.zeros_like(img.T)
    for dx in range(-r, r + 1):
        tap = (jnp.abs(jnp.float32(dx)) <= half).astype(jnp.float32)
        acc2 = acc2 + tap * padded2[dx + r : dx + r + w, :]
    return (acc2 / norm).T


def _mat3_apply(c0, c1, c2, m) -> tuple:
    """(3 planes) @ m with python-float matrix entries (kernel-safe: no
    captured constant arrays)."""
    return (
        c0 * m[0][0] + c1 * m[1][0] + c2 * m[2][0],
        c0 * m[0][1] + c1 * m[1][1] + c2 * m[2][1],
        c0 * m[0][2] + c1 * m[1][2] + c2 * m[2][2],
    )


_RGB_FROM_HED = tuple(tuple(float(v) for v in row) for row in color.RGB_FROM_HED)
_HED_FROM_RGB = tuple(tuple(float(v) for v in row) for row in color.HED_FROM_RGB)


def _rgb2hsv_planes(r, g, b):
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = v - mn
    safe = jnp.where(delta == 0.0, 1.0, delta)
    h_r = ((g - b) / safe) % 6.0
    h_g = (b - r) / safe + 2.0
    h_b = (r - g) / safe + 4.0
    h = jnp.where(v == r, h_r, jnp.where(v == g, h_g, h_b))
    h = jnp.where(delta == 0.0, 0.0, h / 6.0)
    s = jnp.where(v == 0.0, 0.0, delta / jnp.where(v == 0.0, 1.0, v))
    return h, s, v


def _hsv2rgb_planes(h, s, v):
    h6 = (h % 1.0) * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    def pick(c0, c1, c2, c3, c4, c5):
        return jnp.where(
            i == 0, c0,
            jnp.where(i == 1, c1,
                      jnp.where(i == 2, c2,
                                jnp.where(i == 3, c3, jnp.where(i == 4, c4, c5)))),
        )

    return pick(v, q, p, p, t, v), pick(t, v, v, q, p, p), pick(p, p, t, v, v, q)


def _hed_shift_planes(r, g, b, dh, de, dd):
    """Legacy-skimage HED shift (matches ops.stain.hed_shift) on planes."""
    lr0, lg0, lb0 = -jnp.log(r + 2.0), -jnp.log(g + 2.0), -jnp.log(b + 2.0)
    h, e, d = _mat3_apply(lr0, lg0, lb0, _HED_FROM_RGB)
    h, e, d = h + dh, e + de, d + dd
    lr, lg, lb = _mat3_apply(-h, -e, -d, _RGB_FROM_HED)
    clip = lambda x: jnp.clip((jnp.exp(x) - 1.0) / 2.0, 0.0, 1.0)
    return clip(lr), clip(lg), clip(lb)


def _chain_planes(r, g, b, p, noise_fn):
    """The photometric chain on resident (H, W) color planes, in
    compute-then-select form — the oracle for the TPU kernel, which applies
    the same per-stage math under ``pl.when`` predication instead (see
    ``_kernel_prng``; results are identical for equal params/noise).

    p is an indexable of N_PARAMS scalars (SMEM loads in the kernel, an
    array row in the oracle)."""

    def gated(gate_val, fn, operands):
        new = fn(operands)
        return tuple(jnp.where(gate_val > 0.5, a, o) for a, o in zip(new, operands))

    # HSV shift
    def hsv_stage(ops):
        r, g, b = ops
        h, s, v = _rgb2hsv_planes(r, g, b)
        h = (h + p[0] / 180.0) % 1.0
        s = jnp.clip(s + p[1] / 255.0, 0.0, 1.0)
        v = jnp.clip(v + p[2] / 255.0, 0.0, 1.0)
        return _hsv2rgb_planes(h, s, v)

    r, g, b = gated(p[3], hsv_stage, (r, g, b))

    # Gaussian noise — noise_fn is a 0-arg callable so that under
    # predication the (expensive) Box-Muller draws happen only in the
    # taken branch.
    def noise_stage(ops):
        r, g, b = ops
        nr, ng, nb = noise_fn()
        return (
            jnp.clip(r + nr * p[4], 0.0, 1.0),
            jnp.clip(g + ng * p[4], 0.0, 1.0),
            jnp.clip(b + nb * p[4], 0.0, 1.0),
        )

    r, g, b = gated(p[5], noise_stage, (r, g, b))

    # HED shift (always applied)
    r, g, b = _hed_shift_planes(r, g, b, p[6], p[7], p[8])

    # Box blur
    def blur_stage(ops):
        return tuple(_box_blur_plane(x, p[9]) for x in ops)

    r, g, b = gated(p[10], blur_stage, (r, g, b))

    # Brightness / contrast (cheap — keep the select form)
    gate = p[13] > 0.5
    bc = lambda x: jnp.clip(x * (1.0 + p[12]) + p[11], 0.0, 1.0)
    return (
        jnp.where(gate, bc(r), r),
        jnp.where(gate, bc(g), g),
        jnp.where(gate, bc(b), b),
    )


def _kernel_prng(seed_ref, params_ref, img_ref, out_ref):
    """TPU kernel over a (1, 3, H, W) planar block; per-pixel Gaussian noise
    from the on-core PRNG (Box-Muller).

    Each p=0.5-gated stage is guarded by ``pl.when`` store-predication on
    out_ref (a genuine Mosaic branch, not compute-then-select), so the
    HSV round-trip, the Box-Muller draws, and the blur taps are skipped
    outright for the ~half of tiles whose gate is off.  Same math per stage
    as ``_chain_planes`` (the oracle keeps the select form; results are
    identical for equal params/noise)."""
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[i])
    h, w = img_ref.shape[2], img_ref.shape[3]

    def normal():
        u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits((h, w)), jnp.uint32))
        u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits((h, w)), jnp.uint32))
        return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)

    p = tuple(params_ref[i, j] for j in range(N_PARAMS))

    out_ref[0, 0] = img_ref[0, 0]
    out_ref[0, 1] = img_ref[0, 1]
    out_ref[0, 2] = img_ref[0, 2]

    @pl.when(p[3] > 0.5)
    def _hsv():
        hh, ss, vv = _rgb2hsv_planes(out_ref[0, 0], out_ref[0, 1], out_ref[0, 2])
        hh = (hh + p[0] / 180.0) % 1.0
        ss = jnp.clip(ss + p[1] / 255.0, 0.0, 1.0)
        vv = jnp.clip(vv + p[2] / 255.0, 0.0, 1.0)
        r2, g2, b2 = _hsv2rgb_planes(hh, ss, vv)
        out_ref[0, 0] = r2
        out_ref[0, 1] = g2
        out_ref[0, 2] = b2

    @pl.when(p[5] > 0.5)
    def _noise():
        for c in range(3):
            out_ref[0, c] = jnp.clip(out_ref[0, c] + normal() * p[4], 0.0, 1.0)

    # HED shift (always applied)
    ro, go, bo = _hed_shift_planes(
        out_ref[0, 0], out_ref[0, 1], out_ref[0, 2], p[6], p[7], p[8]
    )
    out_ref[0, 0] = ro
    out_ref[0, 1] = go
    out_ref[0, 2] = bo

    @pl.when(p[10] > 0.5)
    def _blur():
        for c in range(3):
            out_ref[0, c] = _box_blur_plane(out_ref[0, c], p[9])

    @pl.when(p[13] > 0.5)
    def _bc():
        for c in range(3):
            out_ref[0, c] = jnp.clip(
                out_ref[0, c] * (1.0 + p[12]) + p[11], 0.0, 1.0
            )


def _kernel_noise_input(seed_ref, params_ref, img_ref, noise_ref, out_ref):
    """Variant with host-supplied noise (interpret-mode tests; the Pallas
    PRNG primitives lower only on real TPUs)."""
    i = pl.program_id(0)
    p = tuple(params_ref[i, j] for j in range(N_PARAMS))
    ro, go, bo = _chain_planes(
        img_ref[0, 0], img_ref[0, 1], img_ref[0, 2], p,
        lambda: (noise_ref[0, 0], noise_ref[0, 1], noise_ref[0, 2]),
    )
    out_ref[0, 0] = ro
    out_ref[0, 1] = go
    out_ref[0, 2] = bo


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
    params = params.at[:, 9].set(
        3.0 + 2.0 * jax.random.randint(ks[7], (n,), 0, 3).astype(jnp.float32)
    )
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
    planar_io: bool = False,
) -> jnp.ndarray:
    """Fused photometric chain over float32 tiles: (N, H, W, 3), or
    (N, 3, H, W) with ``planar_io=True`` (the kernel's native layout — no
    boundary relayouts; see the module docstring).

    On TPU the noise comes from the on-core PRNG; pass ``noise`` explicitly
    (and usually ``interpret=True``) on other platforms/tests.
    """
    if planar_io:
        n, c, h, w = imgs.shape
    else:
        n, h, w, c = imgs.shape
    if params is None:
        params = draw_params(key, n)
    seeds = jax.random.randint(
        jax.random.fold_in(key, 1), (n,), minval=0, maxval=2**31 - 1, dtype=jnp.int32
    )
    planar = imgs if planar_io else imgs.transpose(0, 3, 1, 2)  # (N, 3, H, W)
    img_spec = pl.BlockSpec((1, c, h, w), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, c, h, w), jnp.float32)
    if noise is None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # seeds, params live whole in SMEM
            grid=(n,),
            in_specs=[img_spec],
            out_specs=img_spec,
        )
        out = pl.pallas_call(
            _kernel_prng, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret
        )(seeds, params, planar)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n,),
            in_specs=[img_spec, img_spec],
            out_specs=img_spec,
        )
        out = pl.pallas_call(
            _kernel_noise_input, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(seeds, params, planar,
          noise if planar_io else noise.transpose(0, 3, 1, 2))
    return out if planar_io else out.transpose(0, 2, 3, 1)


def reference_chain(imgs: jnp.ndarray, params: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Pure-jnp oracle of the kernel's math (same params/noise), for tests.

    imgs/noise: (N, H, W, 3) NHWC.
    """

    def one(img, p, nz):
        r, g, b = _chain_planes(
            img[..., 0], img[..., 1], img[..., 2], p,
            lambda: (nz[..., 0], nz[..., 1], nz[..., 2]),
        )
        return jnp.stack([r, g, b], axis=-1)

    return jax.vmap(one)(imgs, params, noise)
