"""Tests for stain augmentation against numpy transcriptions of the
reference formulas (hedcoloraugmenter.py / hsbcoloraugmenter.py)."""

import colorsys

import jax.numpy as jnp
import numpy as np
import pytest

from ssl_cr_histo_tpu.ops import color, stain


@pytest.fixture
def img():
    rng = np.random.default_rng(3)
    return (rng.random((16, 16, 3)).astype(np.float32) * 0.7 + 0.15)


def test_hed_shift_zero_matches_legacy(img):
    # Legacy skimage-0.15 combine/separate (see ops.color): zero shift maps
    # rgb -> (rgb + 1) / 2, exactly as the reference's Color op did.
    out = np.asarray(stain.hed_shift(jnp.asarray(img), 0.0, 0.0, 0.0))
    np.testing.assert_allclose(out, (img + 1.0) / 2.0, atol=1e-4)


def test_hed_shift_changes_image(img):
    out = np.asarray(stain.hed_shift(jnp.asarray(img), 0.05, -0.02, 0.01))
    assert np.abs(out - img).max() > 0.01
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_hed_color_augment_cutoff_gates(img):
    sig = jnp.asarray([0.1, 0.1, 0.1])
    b = jnp.asarray([0.05, 0.05, 0.05])
    dark = jnp.asarray(img) * 0.05  # mean < 0.15 -> outside cutoff
    out_dark = np.asarray(stain.hed_color_augment(dark, sig, b))
    np.testing.assert_allclose(out_dark, np.asarray(dark), atol=1e-6)
    out_mid = np.asarray(stain.hed_color_augment(jnp.asarray(img), sig, b))
    assert np.abs(out_mid - img).max() > 1e-3


def test_hed_color_augment_matches_numpy(img):
    sigmas = np.array([0.02, -0.01, 0.015], np.float32)
    biases = np.array([0.01, 0.0, -0.02], np.float32)
    got = np.asarray(stain.hed_color_augment(jnp.asarray(img), jnp.asarray(sigmas), jnp.asarray(biases)))
    hed = np.dot(-np.log(img + 2.0), np.asarray(color.HED_FROM_RGB))
    hed = hed * (1.0 + sigmas) + biases
    rgb2 = np.exp(-np.dot(hed, np.asarray(color.RGB_FROM_HED)))
    want = np.clip((rgb2 - 1.0) / 2.0, 0.0, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_hsb_matches_reference_formula(img):
    sigmas = np.array([0.1, 0.2, -0.1], np.float32)
    got = np.asarray(stain.hsb_color_augment(jnp.asarray(img), jnp.asarray(sigmas)))
    # numpy oracle via colorsys per-pixel
    want = np.empty_like(img)
    for i in range(img.shape[0]):
        for j in range(img.shape[1]):
            h, s, v = colorsys.rgb_to_hsv(*img[i, j])
            h = (h + sigmas[0] % 1.0) % 1.0
            s = s * (1.0 + (1.0 - s) * sigmas[1]) if sigmas[1] >= 0 else s * (1.0 + sigmas[1])
            v = v * (1.0 + sigmas[2]) if sigmas[2] < 0 else v + (1.0 - v) * sigmas[2]
            want[i, j] = colorsys.hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_hsb_zero_identity(img):
    out = np.asarray(stain.hsb_color_augment(jnp.asarray(img), jnp.zeros(3)))
    np.testing.assert_allclose(out, img, atol=1e-5)
