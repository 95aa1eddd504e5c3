"""FROC evaluation tests: candidate detection, hand-computed curves, ITC
exclusion, annotation rasterization, and the CLI end-to-end."""

import json
import os

import numpy as np
import pytest

from ssl_cr_histo_tpu.eval.froc import (
    FP_RATES,
    SlideDetections,
    detect_candidates,
    evaluate_froc,
    evaluate_probs_maps,
    lesion_labels,
    rasterize_annotation,
)


def test_detect_candidates_blobs():
    pm = np.zeros((20, 20), np.float32)
    pm[2:5, 2:5] = 0.7
    pm[3, 3] = 0.9  # component 1 peak
    pm[10:12, 14:16] = 0.6  # component 2 (uniform: first max position wins)
    probs, coords = detect_candidates(pm, threshold=0.5)
    assert len(probs) == 2
    order = np.argsort(coords[:, 0])
    np.testing.assert_array_equal(coords[order[0]], [3, 3])
    assert probs[order[0]] == pytest.approx(0.9)
    assert probs[order[1]] == pytest.approx(0.6)
    # below-threshold map: no candidates
    p0, c0 = detect_candidates(np.full((4, 4), 0.1, np.float32))
    assert len(p0) == 0 and c0.shape == (0, 2)


def test_evaluate_froc_hand_computed():
    """2 slides: tumor slide with 2 lesions (one hit at 0.9, one at 0.3,
    one FP at 0.6) + normal slide with FPs at 0.8 and 0.4."""
    gt = np.zeros((30, 30), np.uint8)
    gt[2:6, 2:6] = 1   # lesion A
    gt[20:24, 20:24] = 1  # lesion B
    tumor = SlideDetections(
        probs=np.array([0.9, 0.3, 0.6]),
        coords=np.array([[3, 3], [21, 21], [10, 10]]),
        gt_mask=gt,
    )
    normal = SlideDetections(
        probs=np.array([0.8, 0.4]), coords=np.array([[1, 1], [5, 5]]), gt_mask=None
    )
    r = evaluate_froc([tumor, normal])
    assert r["total_lesions"] == 2
    assert r["n_false_positives"] == 3
    assert r["n_slides"] == 2
    # sens is 0.5 until the 0.3-hit enters; avg FPs reach 1.5 max
    for rate in (0.25, 0.5, 1.0):
        assert r["sens_at_fp"][rate] == pytest.approx(0.5)
    for rate in (4.0, 8.0):
        assert r["sens_at_fp"][rate] == pytest.approx(1.0)
    assert r["froc"] == pytest.approx(
        np.mean([r["sens_at_fp"][x] for x in FP_RATES])
    )


def test_perfect_and_empty_detection():
    gt = np.zeros((10, 10), np.uint8)
    gt[4:7, 4:7] = 1
    perfect = SlideDetections(np.array([0.99]), np.array([[5, 5]]), gt)
    r = evaluate_froc([perfect])
    assert r["froc"] == pytest.approx(1.0) and r["n_false_positives"] == 0
    r0 = evaluate_froc([SlideDetections(np.zeros(0), np.zeros((0, 2), int), gt)])
    assert r0["froc"] == pytest.approx(0.0) and r0["total_lesions"] == 1


def test_itc_exclusion():
    gt = np.zeros((40, 40), np.uint8)
    gt[5, 5:25] = 1    # long lesion: major axis ~23 px
    gt[30:32, 30:32] = 1  # 2x2 blob: major axis ~2.3 px -> ITC at cutoff 10
    labeled, n, itc = lesion_labels(gt, itc_diameter_px=10.0)
    assert n == 2 and len(itc) == 1
    s = SlideDetections(
        probs=np.array([0.9, 0.8]),
        coords=np.array([[5, 10], [30, 30]]),  # hit lesion + hit ITC
        gt_mask=gt,
    )
    r = evaluate_froc([s], itc_diameter_px=10.0)
    # ITC: not a lesion, and its detection is NOT a false positive
    assert r["total_lesions"] == 1
    assert r["n_false_positives"] == 0
    assert r["froc"] == pytest.approx(1.0)


def test_evaluate_probs_maps():
    pm = np.zeros((16, 16), np.float32)
    pm[3:5, 3:5] = 0.9
    gt = np.zeros((16, 16), np.uint8)
    gt[2:6, 2:6] = 1
    r = evaluate_probs_maps([(pm, gt), (np.zeros((16, 16), np.float32), None)])
    assert r["froc"] == pytest.approx(1.0)
    assert r["n_slides"] == 2


def test_rasterize_annotation(tmp_path):
    from ssl_cr_histo_tpu.data.annotations import vertices2json

    jp = str(tmp_path / "slide.json")
    vertices2json(jp, positive_vertices=[[[2, 2], [2, 14], [14, 14], [14, 2]]])
    mask = rasterize_annotation(jp, (8, 8), resolution=4)
    ys, xs = np.nonzero(mask)
    assert set(ys.tolist()) == {1, 2, 3} and set(xs.tolist()) == {1, 2, 3}
    assert mask.sum() == 9


def test_froc_cli_end_to_end(tmp_path, capsys):
    from ssl_cr_histo_tpu.cli import froc as cli

    maps = tmp_path / "maps"
    gts = tmp_path / "gt"
    maps.mkdir(), gts.mkdir()
    pm = np.zeros((16, 16), np.float32)
    pm[3:5, 3:5] = 0.9
    np.save(maps / "tumor_001.npy", pm)
    gt = np.zeros((16, 16), np.uint8)
    gt[2:6, 2:6] = 1
    np.save(gts / "tumor_001.npy", gt)
    np.save(maps / "normal_001.npy", np.zeros((16, 16), np.float32))
    out = tmp_path / "froc.json"
    cli.main([
        "--probs_map_path", str(maps), "--gt_path", str(gts), "--out", str(out),
    ])
    report = json.loads(out.read_text())
    assert report["froc"] == pytest.approx(1.0)
    assert report["total_lesions"] == 1
    assert report["slides"] == ["normal_001", "tumor_001"]
    text = capsys.readouterr().out
    assert "FROC score: 1.0000" in text


def test_eight_connectivity():
    """Diagonally-touching pixels are ONE component (official tooling uses
    8-connectivity; scipy's default 4-connected cross would split them)."""
    pm = np.zeros((8, 8), np.float32)
    pm[2, 2] = 0.9
    pm[3, 3] = 0.8  # diagonal neighbor
    probs, coords = detect_candidates(pm, threshold=0.5)
    assert len(probs) == 1 and probs[0] == pytest.approx(0.9)
    gt = np.zeros((8, 8), np.uint8)
    gt[2, 2] = gt[3, 3] = 1
    _, n, _ = lesion_labels(gt)
    assert n == 1


def test_major_axis_population_normalization():
    """2x2 block: population-covariance major axis is exactly 2.0 px
    (skimage regionprops convention), not the N-1 estimator's 2.31."""
    from ssl_cr_histo_tpu.eval.froc import _major_axis_px

    ys, xs = np.array([0, 0, 1, 1]), np.array([0, 1, 0, 1])
    assert _major_axis_px(ys, xs) == pytest.approx(2.0)


def test_rasterize_annotation_exclusion_hole(tmp_path):
    """Negative ('_2' exclusion) polygons punch holes in the rasterized GT."""
    from ssl_cr_histo_tpu.data.annotations import vertices2json

    jp = str(tmp_path / "slide.json")
    vertices2json(
        jp,
        positive_vertices=[[[2, 2], [2, 26], [26, 26], [26, 2]]],
        negative_vertices=[[[10, 10], [10, 22], [22, 22], [22, 10]]],
    )
    mask = rasterize_annotation(jp, (8, 8), resolution=4)
    assert mask[1, 1] == 1        # inside tumor, outside hole
    assert mask[4, 4] == 0        # grid point (16,16): inside the hole
    assert mask[7, 7] == 0        # grid point (28,28): outside the tumor
