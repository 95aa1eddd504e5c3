"""Pallas photometric kernel: interpret-mode math vs the jnp oracle.

The PRNG variant only lowers on real TPUs; these tests pin the kernel's
arithmetic via the noise-input variant in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np

from ssl_cr_histo_tpu.ops import pallas_photometric as PP
from ssl_cr_histo_tpu.ops import photometric as P


def test_kernel_matches_oracle():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((3, 32, 32, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    params = PP.draw_params(key, 3)
    noise = jnp.asarray(rng.normal(0, 1, (3, 32, 32, 3)).astype(np.float32))
    got = PP.pretrain_photometric_pallas(imgs, key, interpret=True, noise=noise, params=params)
    want = PP.reference_chain(imgs, params, noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_vmem_blur_matches_conv_blur():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    for k in (3, 5, 7):
        a = PP._box_blur_vmem(img, jnp.float32(k))
        b = P.box_blur(img, k, max_ksize=7)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_hed_scalar_matches_stain():
    from ssl_cr_histo_tpu.ops import stain

    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((16, 16, 3)).astype(np.float32))
    a = PP._hed_shift_scalar(img, 0.02, -0.01, 0.005)
    b = stain.hed_shift(img, 0.02, -0.01, 0.005)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_draw_params_distributions():
    params = np.asarray(PP.draw_params(jax.random.PRNGKey(0), 512))
    assert params.shape == (512, PP.N_PARAMS)
    assert np.all(np.abs(params[:, 0]) <= 0.1)
    assert set(np.unique(params[:, 9])) <= {3.0, 5.0, 7.0}
    for gate_col in (3, 5, 10, 13):
        frac = params[:, gate_col].mean()
        assert 0.3 < frac < 0.7  # bernoulli(0.5)
