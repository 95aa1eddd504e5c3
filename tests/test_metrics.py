"""Metrics tests against sklearn/scipy oracles and hand-computed values."""

import numpy as np
import pytest

from ssl_cr_histo_tpu.eval import metrics as M


def test_average_meter():
    m = M.AverageMeter()
    m.update(1.0, 2)
    m.update(2.0, 2)
    assert m.avg == pytest.approx(1.5)
    assert m.val == 2.0
    m.reset()
    assert m.count == 0


def test_icc_perfect_agreement():
    a = np.linspace(0, 1, 20)
    t = M.icc_two_raters(a, a)
    for k in ("ICC1", "ICC2", "ICC3"):
        assert t[k] == pytest.approx(1.0, abs=1e-9)


def test_icc_matches_published_example():
    """Shrout & Fleiss (1979) Table 2: 6 targets x 4 judges."""
    ratings = np.array(
        [
            [9, 2, 5, 8],
            [6, 1, 3, 2],
            [8, 4, 6, 8],
            [7, 1, 2, 6],
            [10, 5, 6, 9],
            [6, 2, 4, 7],
        ],
        float,
    )
    t = M.icc_table(ratings)
    assert t["ICC1"] == pytest.approx(0.17, abs=0.01)
    assert t["ICC2"] == pytest.approx(0.29, abs=0.01)
    assert t["ICC3"] == pytest.approx(0.71, abs=0.01)
    assert t["ICC2k"] == pytest.approx(0.62, abs=0.01)
    assert t["ICC3k"] == pytest.approx(0.91, abs=0.01)


def test_kendall_tau():
    a = np.array([1, 2, 3, 4, 5.0])
    assert M.kendall_tau(a, a) == pytest.approx(1.0)
    assert M.kendall_tau(a, -a) == pytest.approx(-1.0)


def test_bland_altman():
    a = np.array([1.0, 2.0, 3.0])
    b = np.array([0.5, 1.5, 2.5])
    ba = M.bland_altman(a, b)
    assert ba.mean_diff == pytest.approx(0.5)
    assert ba.std_diff == pytest.approx(0.0, abs=1e-9)


def test_confusion_and_per_class():
    y_true = np.array([0, 0, 1, 1, 2, 2])
    y_pred = np.array([0, 1, 1, 1, 2, 0])
    cm = M.confusion_matrix(y_true, y_pred, 3)
    from sklearn.metrics import confusion_matrix as sk_cm

    np.testing.assert_array_equal(cm, sk_cm(y_true, y_pred))
    stats = M.per_class_sens_spec_acc(cm)
    assert stats["sensitivity"][1] == pytest.approx(1.0)
    assert stats["sensitivity"][2] == pytest.approx(0.5)
    # specificity of class 0: TN=3 of 4 negatives predicted non-0
    assert stats["specificity"][0] == pytest.approx(3 / 4)


def test_weighted_f1_and_auc():
    y_true = np.array([0, 1, 2, 1, 0, 2])
    y_pred = np.array([0, 1, 2, 1, 1, 2])
    from sklearn.metrics import f1_score

    assert M.weighted_f1(y_true, y_pred) == pytest.approx(
        f1_score(y_true, y_pred, average="weighted")
    )
    probs = np.full((6, 3), 0.1)
    probs[np.arange(6), y_true] = 0.8
    assert M.multiclass_ovr_auc(y_true, probs) == pytest.approx(1.0)
    assert M.binary_auc([0, 0, 1, 1], [0.1, 0.2, 0.8, 0.9]) == pytest.approx(1.0)


def test_heatmap_on_synthetic_wsi(tmp_path):
    from ssl_cr_histo_tpu.data.wsi import ArrayPyramid
    from ssl_cr_histo_tpu.eval.heatmap import compute_probs_map, save_heatmap_artifacts

    level0 = np.full((512, 512, 3), 255, np.uint8)
    level0[100:300, 100:300] = 30  # dark "tumor" block
    pyr = ArrayPyramid(level0, levels=1)
    mask = np.zeros((64, 64), bool)  # resolution 8
    mask[10:40, 10:40] = True

    def forward(patches_u8):
        # fake model: tumor logit ~ darkness of the patch center
        dark = 255.0 - patches_u8[:, 28:36, 28:36].mean(axis=(1, 2, 3))
        return np.stack([np.zeros_like(dark), (dark - 100.0) / 10.0], axis=1)

    pm = compute_probs_map(pyr, mask, forward, image_size=64, batch_size=32)
    assert pm.shape == (64, 64)
    # center of the dark block (mask coords ~ (25, 25)) is confident tumor
    assert pm[25, 25] > 0.9
    # outside the mask stays zero
    assert pm[5, 5] == 0.0
    save_heatmap_artifacts(pm, str(tmp_path), "wsi0")
    for suffix in ("npy", "png"):
        assert any(p.endswith(suffix) for p in map(str, tmp_path.iterdir()))


def test_pair_wsi_masks():
    from ssl_cr_histo_tpu.eval.heatmap import pair_wsi_masks

    wsis = ["/w/t2.tif", "/w/t1.tif", "/w/t3.npy"]
    masks = ["/m/t1_mask.npy", "/m/t2.npy", "/m/t3_tissue.npy"]
    pairs = pair_wsi_masks(wsis, masks)
    assert pairs == [
        ("/w/t1.tif", "/m/t1_mask.npy"),
        ("/w/t2.tif", "/m/t2.npy"),
        ("/w/t3.npy", "/m/t3_tissue.npy"),
    ]

    import pytest

    # a missing mask must fail loudly, not shift subsequent pairings
    with pytest.raises(ValueError, match="t2"):
        pair_wsi_masks(wsis, ["/m/t1_mask.npy", "/m/t3_tissue.npy"])
    # an orphan mask is also an error
    with pytest.raises(ValueError, match="t9"):
        pair_wsi_masks(wsis, masks + ["/m/t9_mask.npy"])
