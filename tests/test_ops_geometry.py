"""Golden tests for the affine warp engine against cv2.warpAffine."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl_cr_histo_tpu.ops import geometry


@pytest.fixture
def img():
    rng = np.random.default_rng(1)
    return rng.random((48, 48, 3), dtype=np.float32)


def _cv2_rotate(img, deg, border=cv2.BORDER_REFLECT_101):
    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D(((w - 1) / 2, (h - 1) / 2), deg, 1.0)
    return cv2.warpAffine(img, m, (w, h), flags=cv2.INTER_LINEAR, borderMode=border)


def test_rotation_matches_cv2_interior(img):
    deg = 33.0
    got = np.asarray(
        geometry.warp_affine(
            jnp.asarray(img), geometry.rotation_matrix(deg, 48, 48), pad_mode="reflect101"
        )
    )
    want = _cv2_rotate(img, deg)
    # Compare away from borders (border fold conventions differ subtly).
    np.testing.assert_allclose(got[8:-8, 8:-8], want[8:-8, 8:-8], atol=2e-2)


def test_rotation_360_identity(img):
    got = np.asarray(
        geometry.warp_affine(
            jnp.asarray(img), geometry.rotation_matrix(360.0, 48, 48), pad_mode="reflect101"
        )
    )
    np.testing.assert_allclose(got, img, atol=1e-4)


def test_translation_integer_exact(img):
    mat = geometry.translation_matrix(3.0, 5.0)
    got = np.asarray(geometry.warp_affine(jnp.asarray(img), mat, pad_mode="constant"))
    # output (x, y) samples input (x+3, y+5)
    np.testing.assert_allclose(got[:-5, :-3], img[5:, 3:], atol=1e-6)
    assert np.all(got[-5:] == 0) and np.all(got[:, -3:] == 0)


def test_scale_zoom_in_center_preserved(img):
    mat = geometry.scale_matrix(2.0, 48, 48)
    got = np.asarray(geometry.warp_affine(jnp.asarray(img), mat))
    # center pixel maps to itself
    np.testing.assert_allclose(got[23:25, 23:25].mean(), img[23:25, 23:25].mean(), atol=0.2)


def test_shear_matches_cv2(img):
    lvl = 0.2
    got = np.asarray(
        geometry.warp_affine(jnp.asarray(img), geometry.shear_x_matrix(lvl), pad_mode="constant")
    )
    m = np.array([[1, -lvl, 0], [0, 1, 0]], np.float32)
    # cv2 wants forward map; inverse of [[1, lvl],[0,1]] is [[1,-lvl],[0,1]]
    want = cv2.warpAffine(
        img, m, (48, 48), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT
    )
    np.testing.assert_allclose(got[4:-4, 12:-12], want[4:-4, 12:-12], atol=2e-2)


def test_flips_and_rot90(img):
    x = jnp.asarray(img)
    np.testing.assert_array_equal(np.asarray(geometry.flip_horizontal(x)), img[:, ::-1])
    np.testing.assert_array_equal(np.asarray(geometry.flip_vertical(x)), img[::-1])
    np.testing.assert_array_equal(np.asarray(geometry.rot90(x, 1)), np.rot90(img, 1))
    got = np.asarray(geometry.rot90(x, jnp.int32(2)))
    np.testing.assert_array_equal(got, np.rot90(img, 2))


def test_center_and_random_crop(img):
    x = jnp.asarray(img)
    cc = np.asarray(geometry.center_crop(x, 32, 32))
    np.testing.assert_array_equal(cc, img[8:40, 8:40])
    rc = np.asarray(geometry.random_crop(x, jax.random.PRNGKey(0), 32, 32))
    assert rc.shape == (32, 32, 3)
    # crop content must come from the source image
    found = any(
        np.array_equal(rc, img[y : y + 32, x0 : x0 + 32])
        for y in range(17)
        for x0 in range(17)
    )
    assert found


def test_resize_matches_cv2(img):
    got = np.asarray(geometry.resize(jnp.asarray(img), 68, 68))
    want = cv2.resize(img, (68, 68), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_compose_equals_sequential(img):
    x = jnp.asarray(img)
    rot = geometry.rotation_matrix(20.0, 48, 48)
    tr = geometry.translation_matrix(2.0, -3.0)
    seq = geometry.warp_affine(geometry.warp_affine(x, rot), tr)
    fused = geometry.warp_affine(x, geometry.compose(tr, rot))
    # fused avoids double interpolation; compare loosely away from borders
    np.testing.assert_allclose(
        np.asarray(seq)[10:-10, 10:-10], np.asarray(fused)[10:-10, 10:-10], atol=5e-2
    )


def test_reflect101_coord_fold():
    c = jnp.arange(-3, 8)
    got = np.asarray(geometry._reflect101(c, 5))
    # for size 5: ... 3 2 1 | 0 1 2 3 4 | 3 2 1 ...
    want = np.array([3, 2, 1, 0, 1, 2, 3, 4, 3, 2, 1])
    np.testing.assert_array_equal(got, want)


def test_warp_planar_matches_nhwc():
    """warp_affine_mxu_planar == warp_affine_mxu (same matrix) to bf16-dot
    tolerance, across rotation-dominant / swap-fixup regimes."""
    import jax

    from ssl_cr_histo_tpu.ops import geometry as G

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    for deg, scale in ((10.0, 1.0), (80.0, 0.7), (-45.0, 1.4), (0.0, 0.5)):
        m = G.compose(
            G.rotation_matrix(deg, 32, 32), G.scale_matrix(scale, 32, 32)
        )
        # jit: the warp's bf16 dot has no eager CPU kernel (fine under XLA)
        want = np.asarray(
            jax.jit(G.warp_affine_mxu, static_argnames="pad_mode")(
                img, m, pad_mode="reflect101"
            )
        )
        got = np.asarray(
            jax.jit(G.warp_affine_mxu_planar, static_argnames="pad_mode")(
                img.transpose(2, 0, 1), m, pad_mode="reflect101"
            )
        ).transpose(1, 2, 0)
        np.testing.assert_allclose(got, want, atol=2e-2)
