"""Pallas photometric kernel: interpret-mode math vs independent oracles.

The PRNG variant only lowers on real TPUs; these tests pin the kernel's
arithmetic via the noise-input variant in interpret mode, and each stage
against the independently-implemented ops it must match."""

import jax
import jax.numpy as jnp
import numpy as np

from ssl_cr_histo_tpu.ops import pallas_photometric as PP
from ssl_cr_histo_tpu.ops import photometric as P
from ssl_cr_histo_tpu.ops import stain


def _planes(img):
    return img[..., 0], img[..., 1], img[..., 2]


def test_kernel_matches_oracle():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((3, 32, 32, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    params = PP.draw_params(key, 3)
    noise = jnp.asarray(rng.normal(0, 1, (3, 32, 32, 3)).astype(np.float32))
    got = PP.pretrain_photometric_pallas(imgs, key, interpret=True, noise=noise, params=params)
    want = PP.reference_chain(imgs, params, noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_chain_matches_independent_ops():
    """Full chain vs a composition of the independent ops implementations
    with identical parameters (all gates on)."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    noise = jnp.asarray(rng.normal(0, 1, (32, 32, 3)).astype(np.float32))
    p = np.zeros(PP.N_PARAMS, np.float32)
    p[0], p[1], p[2], p[3] = 5.0, 10.0, -8.0, 1.0  # hsv + gate
    p[4], p[5] = 0.05, 1.0  # noise
    p[6], p[7], p[8] = 0.02, -0.01, 0.005  # hed
    p[9], p[10] = 5.0, 1.0  # blur
    p[11], p[12], p[13] = 0.1, -0.05, 1.0  # brightness/contrast
    got = jnp.stack(
        PP._chain_planes(
            *_planes(img), jnp.asarray(p), lambda: _planes(noise)
        ),
        axis=-1,
    )

    want = P.hsv_shift(img, 5.0, 10.0, -8.0)
    want = jnp.clip(want + noise * 0.05, 0, 1)
    want = stain.hed_shift(want, 0.02, -0.01, 0.005)
    want = P.box_blur(want, 5, max_ksize=7)
    want = P.brightness_contrast(want, brightness=0.1, contrast=-0.05)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_plane_blur_matches_conv_blur():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    for k in (3, 5, 7):
        got = jnp.stack(
            [PP._box_blur_plane(img[..., c], jnp.float32(k)) for c in range(3)], -1
        )
        want = P.box_blur(img, k, max_ksize=7)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_hed_planes_matches_stain():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((16, 16, 3)).astype(np.float32))
    got = jnp.stack(PP._hed_shift_planes(*_planes(img), 0.02, -0.01, 0.005), -1)
    want = stain.hed_shift(img, 0.02, -0.01, 0.005)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_draw_params_distributions():
    params = np.asarray(PP.draw_params(jax.random.PRNGKey(0), 512))
    assert params.shape == (512, PP.N_PARAMS)
    assert np.all(np.abs(params[:, 0]) <= 0.1)
    assert set(np.unique(params[:, 9])) <= {3.0, 5.0, 7.0}
    for gate_col in (3, 5, 10, 13):
        frac = params[:, gate_col].mean()
        assert 0.3 < frac < 0.7  # bernoulli(0.5)
