"""Data-layer tests: synthetic WSI fixtures, sampler geometry against
closed-form coordinates, annotations, dataset readers, pipeline."""

import json
import os

import numpy as np
import pytest

from ssl_cr_histo_tpu.data import annotations as A
from ssl_cr_histo_tpu.data import datasets as D
from ssl_cr_histo_tpu.data import pipeline as P
from ssl_cr_histo_tpu.data.sampler import (
    RSPTripletSampler,
    foreground_hsv,
    foreground_lab,
    slide_lab_mu,
)
from ssl_cr_histo_tpu.data.wsi import ArrayPyramid, synthetic_wsi


# ---------------------------------------------------------------------------
# WSI pyramid
# ---------------------------------------------------------------------------


def test_array_pyramid_geometry():
    rng = np.random.default_rng(0)
    level0 = (rng.random((512, 768, 3)) * 255).astype(np.uint8)
    pyr = ArrayPyramid(level0, levels=3)
    assert pyr.level_count == 3
    assert pyr.level_dimensions[0] == (768, 512)
    assert pyr.level_dimensions[1] == (384, 256)
    assert pyr.level_downsamples[1] == pytest.approx(2.0)
    # read_region uses level-0 coordinates
    region = pyr.read_region((100, 40), 0, (64, 32))
    np.testing.assert_array_equal(region, level0[40:72, 100:164])
    # level-1 read at level-0 location (100, 40) -> level-1 pixel (50, 20)
    region1 = pyr.read_region((100, 40), 1, (16, 16))
    assert region1.shape == (16, 16, 3)


def test_array_pyramid_out_of_bounds_is_white():
    pyr = ArrayPyramid(np.zeros((64, 64, 3), np.uint8), levels=1)
    region = pyr.read_region((-10, -10), 0, (20, 20))
    assert region[0, 0].tolist() == [255, 255, 255]
    assert region[-1, -1].tolist() == [0, 0, 0]


def test_synthetic_wsi_has_tissue():
    pyr = synthetic_wsi(512, 512, seed=1)
    img = pyr.read_region((0, 0), 0, (512, 512))
    # tissue pixels (non-background) exist
    assert (img < 200).any()


# ---------------------------------------------------------------------------
# Foreground tests
# ---------------------------------------------------------------------------


def test_foreground_lab_discriminates():
    pink = np.full((64, 64, 3), 0, np.uint8)
    pink[..., 0] = 220; pink[..., 1] = 150; pink[..., 2] = 190  # high a*
    white = np.full((64, 64, 3), 245, np.uint8)
    mu = 2.0  # low slide mean a*
    assert foreground_lab(pink, mu)
    assert not foreground_lab(white, mu)


def test_foreground_hsv_discriminates():
    saturated = np.zeros((32, 32, 3), np.uint8)
    saturated[..., 0] = 200; saturated[..., 1] = 80; saturated[..., 2] = 180
    gray = np.full((32, 32, 3), 128, np.uint8)
    assert foreground_hsv(saturated)
    assert not foreground_hsv(gray)


# ---------------------------------------------------------------------------
# RSP sampler geometry — closed-form coordinate checks on a coordinate ramp
# ---------------------------------------------------------------------------


def _coord_pyramid(size=1024, levels=3):
    """Level-0 image encoding x in R(high byte) and y in G so tile reads can
    be verified by value."""
    x = np.arange(size, dtype=np.uint16)
    y = np.arange(size, dtype=np.uint16)
    xx, yy = np.meshgrid(x, y)
    img = np.stack([(xx // 4) % 256, (yy // 4) % 256, np.zeros_like(xx)], -1).astype(np.uint8)
    return ArrayPyramid(img, levels=levels)


def test_sampler_v1_geometry():
    pyr = _coord_pyramid()
    s = RSPTripletSampler(tile=64, stride=64, geometry="v1", check_mpp=False)
    x, y = 32, 16  # LR2-level coords
    trip = s.read_triplet(pyr, x, y)
    assert trip.shape == (3, 64, 64, 3)
    hr, lr1, lr2 = trip[0], trip[1], trip[2]
    m = pyr.level_downsamples[2]  # 4.0
    # LR2 tile starts at level-0 (m*x, m*y): first pixel encodes x=m*x
    assert lr2[0, 0, 0] == ((int(m * x)) // 4) % 256
    # v1: HR tile STARTS at the LR2 center point (corner-at-center geometry)
    cx0 = int(m * (x + 32))
    assert hr[0, 0, 0] == (cx0 // 4) % 256
    # LR1 starts at the center quantized to downsample-2 grid
    ml = pyr.level_downsamples[1]
    lx1 = int(int(cx0 / ml) * ml)
    assert lr1[0, 0, 0] == (lx1 // 4) % 256


def test_sampler_v2_geometry_centered():
    pyr = _coord_pyramid()
    s = RSPTripletSampler(tile=64, stride=64, geometry="v2", check_mpp=False)
    x, y = 32, 16
    trip = s.read_triplet(pyr, x, y)
    hr = trip[0]
    m = pyr.level_downsamples[2]
    cx0 = int(m * (x + 32))
    # v2: HR tile is CENTERED on the LR2 center -> starts tile/2 earlier
    want_left = int((int(cx0 / 1.0) - 32) * 1.0)
    assert hr[0, 0, 0] == (want_left // 4) % 256
    # center pixel of HR equals the center point
    assert hr[32, 32, 0] == (cx0 // 4) % 256


def test_sampler_index_and_batches(tmp_path):
    pyr = synthetic_wsi(1024, 1024, seed=0)
    np.save(tmp_path / "slide0.npy", pyr._levels[0])
    s = RSPTripletSampler(tile=64, stride=64, geometry="v2", check_mpp=False)
    indices = s.index_directory(str(tmp_path))
    assert indices and len(indices[0].coords) > 0
    batches = list(s.iter_batches(indices, batch_size=4, seed=0))
    assert batches and batches[0].shape == (4, 3, 64, 64, 3)
    assert batches[0].dtype == np.uint8


# ---------------------------------------------------------------------------
# Annotations
# ---------------------------------------------------------------------------


def test_annotation_polygon_membership(tmp_path):
    doc = {
        "positive": [{"name": "t0", "vertices": [[0, 0], [100, 0], [100, 100], [0, 100]]}],
        "negative": [{"name": "n0", "vertices": [[200, 200], [300, 200], [300, 300], [200, 300]]}],
    }
    p = tmp_path / "Tumor_001.json"
    p.write_text(json.dumps(doc))
    ann = A.Annotation().from_json(str(p))
    assert ann.inside_polygons((50, 50), True)
    assert not ann.inside_polygons((150, 150), True)
    assert ann.inside_polygons((250, 250), False)
    coords = np.array([[50, 50], [150, 150], [250, 250]])
    np.testing.assert_array_equal(
        ann.inside_polygons_many(coords, True), [True, False, False]
    )


def test_xml2json_roundtrip(tmp_path):
    xml = """<?xml version="1.0"?>
<ASAP_Annotations>
 <Annotations>
  <Annotation Name="A0" PartOfGroup="Tumor">
   <Coordinates>
    <Coordinate Order="0" X="10.2" Y="20.7"/>
    <Coordinate Order="1" X="110.0" Y="20.0"/>
    <Coordinate Order="2" X="110.0" Y="120.0"/>
   </Coordinates>
  </Annotation>
  <Annotation Name="A1" PartOfGroup="_2">
   <Coordinates>
    <Coordinate Order="0" X="5" Y="5"/>
    <Coordinate Order="1" X="6" Y="5"/>
    <Coordinate Order="2" X="6" Y="6"/>
   </Coordinates>
  </Annotation>
 </Annotations>
</ASAP_Annotations>"""
    inxml = tmp_path / "tumor_001.xml"
    inxml.write_text(xml)
    outjson = tmp_path / "tumor_001.json"
    A.camelyon16xml2json(str(inxml), str(outjson))
    doc = json.loads(outjson.read_text())
    assert len(doc["positive"]) == 1 and len(doc["negative"]) == 1
    assert doc["positive"][0]["vertices"][0] == [10, 21]  # rounded


# ---------------------------------------------------------------------------
# Dataset readers
# ---------------------------------------------------------------------------


def test_breastpathq_h5(tmp_path):
    import h5py

    rng = np.random.default_rng(0)
    with h5py.File(tmp_path / "train_0.h5", "w") as f:
        f["x"] = rng.random((5, 3, 48, 48)).astype(np.float32)
        f["y"] = np.linspace(0, 1, 5).astype(np.float32)
    ds = D.load_breastpathq_h5(str(tmp_path) + "/", image_size=64)
    assert ds.images.shape == (5, 64, 64, 3) and ds.images.dtype == np.uint8
    np.testing.assert_allclose(ds.labels, np.linspace(0, 1, 5), atol=1e-6)


def test_kather_folder(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    for cls in ("ADI", "TUM", "STR"):
        os.makedirs(tmp_path / cls)
        for i in range(2):
            cv2.imwrite(
                str(tmp_path / cls / f"p{i}.tif"),
                (rng.random((32, 32, 3)) * 255).astype(np.uint8),
            )
    ds = D.load_kather_folder(str(tmp_path), image_size=48)
    assert ds.images.shape == (6, 48, 48, 3)
    assert sorted(set(ds.labels.tolist())) == [0, 7, 8]


def test_camelyon16_patches(tmp_path):
    import cv2

    data = tmp_path / "patches"
    jsons = tmp_path / "jsons"
    os.makedirs(data)
    os.makedirs(jsons)
    lines = [
        ("Tumor_026", 50, 50),     # finetune split, inside tumor polygon
        ("Tumor_026", 500, 500),   # finetune split, outside polygon
        ("Tumor_001", 50, 50),     # pretrain split (<=25)
        ("Normal_040", 500, 500),  # finetune split, normal slide
    ]
    with open(data / "list.txt", "w") as f:
        for i, (pid, x, y) in enumerate(lines):
            f.write(f"{pid},{x},{y}\n")
            cv2.imwrite(str(data / f"{i}.png"), np.full((32, 32, 3), i * 40, np.uint8))
    tumor_doc = {
        "positive": [{"name": "t", "vertices": [[0, 0], [100, 0], [100, 100], [0, 100]]}],
        "negative": [],
    }
    empty_doc = {"positive": [], "negative": []}
    (jsons / "Tumor_026.json").write_text(json.dumps(tumor_doc))
    (jsons / "Tumor_001.json").write_text(json.dumps(tumor_doc))
    (jsons / "Normal_040.json").write_text(json.dumps(empty_doc))

    ds = D.load_camelyon16_patches(str(data), str(jsons), image_size=32, split="finetune")
    assert len(ds) == 3
    np.testing.assert_array_equal(ds.labels, [1, 0, 0])
    # patch pairing by line index preserved: first kept line is idx 0
    assert ds.images[0, 0, 0, 0] == 0


def test_camelyon16_patches_multi_dir(tmp_path):
    """The reference ships tumor and normal patches as SEPARATE dirs, each
    with its own list.txt and line-indexed '{idx}.png'
    (eval_Camelyon_SSL.py:226-232); a comma-joined data_path loads both,
    resolving each idx against its own directory."""
    from camelyon_fixtures import write_annotation_jsons, write_patch_dir

    jsons = write_annotation_jsons(tmp_path / "jsons")

    def class_dir(name, pid, coord, vals):
        return write_patch_dir(
            tmp_path / name, [(pid, coord, v) for v in vals]
        )

    td = class_dir("tumor", "Tumor_026", 50, [10, 20])
    nd = class_dir("normal", "Normal_040", 500, [30, 40, 50])

    ds = D.load_camelyon16_patches(f"{td},{nd}", str(jsons), image_size=32)
    assert len(ds) == 5
    np.testing.assert_array_equal(ds.labels, [1, 1, 0, 0, 0])
    # per-dir line-index pairing: both dirs contribute their own 0.png/1.png
    np.testing.assert_array_equal(ds.images[:, 0, 0, 0], [10, 20, 30, 40, 50])
    # single-dir behavior unchanged
    assert len(D.load_camelyon16_patches(str(nd), str(jsons), image_size=32)) == 3

    # lazy=True returns a path-backed dataset that decodes to the same
    # pixels/labels (reference-scale class dirs stay out of host RAM)
    lazy = D.load_camelyon16_patches(f"{td},{nd}", str(jsons), image_size=32, lazy=True)
    assert isinstance(lazy, D.LazyImageDataset)
    np.testing.assert_array_equal(lazy.decode(np.arange(5)), ds.images)
    np.testing.assert_array_equal(lazy.labels, ds.labels)

    # filtering every patch out (pre-fine-tune slide ids like Tumor_001)
    # raises a clear error naming the split rule instead of np.stack's
    # 'need at least one array to stack'
    write_annotation_jsons(jsons, pids=("Tumor_001",))
    excluded = class_dir("pretrain_only", "Tumor_001", 50, [60])
    with pytest.raises(ValueError, match="slide rule"):
        D.load_camelyon16_patches(str(excluded), str(jsons), image_size=32)


def test_camelyon_pools_key_on_source_dir(tmp_path):
    """The reference's Camelyon16 balancing/subsampling pools are per
    SOURCE DIRECTORY (one loader per patch dir, eval_Camelyon_SSL.py:226-232
    + :273-274), not per polygon label: an annotation-boundary patch in the
    tumor dir whose center is polygon-negative still rides in the tumor
    pool.  grouping_key must reproduce that, and fall back to labels for
    single-dir layouts."""
    from camelyon_fixtures import write_annotation_jsons, write_patch_dir

    jsons = write_annotation_jsons(tmp_path / "jsons")
    # tumor dir: 3 patches inside the polygon + 1 boundary patch outside it
    # (bright pixels mark dir membership for the batch check below)
    td = write_patch_dir(
        tmp_path / "tumor",
        [("Tumor_026", 50, 200)] * 3 + [("Tumor_026", 500, 200)],
    )
    nd = write_patch_dir(tmp_path / "normal", [("Normal_040", 500, 60)] * 6)

    ds = D.load_camelyon16_patches(f"{td},{nd}", str(jsons), image_size=32)
    np.testing.assert_array_equal(ds.groups, [0] * 4 + [1] * 6)
    np.testing.assert_array_equal(ds.labels, [1, 1, 1, 0] + [0] * 6)
    np.testing.assert_array_equal(D.grouping_key(ds), ds.groups)

    # per-pool subsample draws int(frac * n_dir) from each DIR: 0.5 of the
    # 4-patch tumor dir -> 2 (label-keyed pools would draw 1 from the 3
    # polygon-positives and 3 from the 7 polygon-negatives)
    sub = D.labeled_fraction(ds, 0.5, seed=0, per_class=True)
    assert (sub.groups == 0).sum() == 2 and (sub.groups == 1).sum() == 3

    # the balanced iterator draws batch_size from EACH dir: every batch has
    # 2 bright (tumor-dir) rows even though only 3 of 4 are polygon-positive
    for imgs, labels in P.balanced_batch_iterator(ds, batch_size=2, seed=0):
        bright = (imgs[:, 0, 0, 0] > 128).sum()
        assert imgs.shape[0] == 4 and bright == 2

    # single-dir layouts carry no dir information: key falls back to labels
    mixed = ds.subset(np.arange(10))
    mixed.groups[:] = 0
    np.testing.assert_array_equal(D.grouping_key(mixed), mixed.labels)


def test_camelyon_missing_patch_fails_at_load(tmp_path):
    """A list.txt longer than the extracted png set must fail AT LOAD with
    the offending path — not hours into a lazy epoch inside cv2.cvtColor."""
    from camelyon_fixtures import write_annotation_jsons, write_patch_dir

    jsons = write_annotation_jsons(tmp_path / "jsons")
    d = write_patch_dir(tmp_path / "patches", [("Tumor_026", 50, 200)] * 2)
    with open(d / "list.txt", "a") as f:
        f.write("Tumor_026,50,50\n")  # line 2 has no 2.png
    with pytest.raises(FileNotFoundError, match="2.png"):
        D.load_camelyon16_patches(str(d), str(jsons), image_size=32)

    # a file deleted AFTER indexing is named by the lazy decode
    d = write_patch_dir(tmp_path / "patches", [("Tumor_026", 50, 200)] * 2)
    ds = D.load_camelyon16_patches(str(d), str(jsons), image_size=32, lazy=True)
    os.remove(d / "1.png")
    with pytest.raises(FileNotFoundError, match="1.png"):
        ds.decode([1])


def test_annotation_parse_memoized(tmp_path):
    """_load_annotations memoizes on the dir's (filename, mtime) listing —
    the train and VALID loaders default to the same --json_path, and
    re-parsing hundreds of polygon files twice per startup is pure waste.
    An edited file (new mtime) invalidates the entry."""
    from camelyon_fixtures import write_annotation_jsons

    jsons = write_annotation_jsons(tmp_path / "jsons")
    first = D._load_annotations(str(jsons))
    assert D._load_annotations(str(jsons)) is first
    os.utime(jsons / "Tumor_026.json", (0, 12345))
    fresh = D._load_annotations(str(jsons))
    assert fresh is not first
    assert fresh.keys() == first.keys()


def test_splits_and_fraction():
    ds = D.ArrayDataset(np.arange(100)[:, None, None, None].astype(np.uint8), np.arange(100))
    tr, va = D.train_val_split(ds, 0.2, seed=0)
    assert len(tr) == 80 and len(va) == 20
    assert set(tr.labels.tolist()).isdisjoint(va.labels.tolist())
    sub = D.labeled_fraction(tr, 0.25, seed=0)
    assert len(sub) == 20
    assert len(set(sub.labels.tolist())) == 20  # without replacement
    subr = D.labeled_fraction(tr, 0.25, seed=0, with_replacement=True)
    assert len(subr) == 20


def test_labeled_fraction_per_class():
    """Camelyon16 drivers subsample the labeled fraction PER CLASS —
    int(frac * n_class) tumor and normal indices drawn from their own
    loaders (eval_Camelyon_SSL.py:273-274, eval_Camelyon_SSL_CR.py:318-319)
    — so the labeled pool stays class-balanced even when pooled sampling
    would starve one class."""
    labels = np.array([0] * 80 + [1] * 20)
    ds = D.ArrayDataset(np.zeros((100, 1, 1, 1), np.uint8), labels)
    sub = D.labeled_fraction(ds, 0.25, seed=0, per_class=True)
    assert (sub.labels == 0).sum() == 20 and (sub.labels == 1).sum() == 5
    # floor semantics match the reference's int(frac * n): 0.1 of 20 -> 2
    sub = D.labeled_fraction(ds, 0.1, seed=0, per_class=True)
    assert (sub.labels == 1).sum() == 2
    # bootstrap (with replacement) keeps the per-class counts too
    subr = D.labeled_fraction(ds, 0.5, seed=0, per_class=True, with_replacement=True)
    assert (subr.labels == 0).sum() == 40 and (subr.labels == 1).sum() == 10
    # a fraction flooring to zero fails loudly instead of training on nothing
    with pytest.raises(ValueError, match="floors to zero"):
        D.labeled_fraction(ds, 0.001, seed=0)


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------


def test_batch_iterator_and_prefetch():
    imgs = np.arange(10 * 4).reshape(10, 4).astype(np.uint8)
    labels = np.arange(10)
    batches = list(P.batch_iterator((imgs, labels), 4, shuffle=True, seed=0))
    assert len(batches) == 2  # drop_last
    for bi, bl in batches:
        assert bi.shape == (4, 4) and bl.shape == (4,)
        np.testing.assert_array_equal(bi[:, 0] // 4, bl)
    out = list(P.prefetch_to_device(P.batch_iterator((imgs, labels), 2, shuffle=False)))
    assert len(out) == 5
    np.testing.assert_array_equal(np.asarray(out[0][1]), [0, 1])


def test_pad_batches():
    imgs = np.arange(10 * 4).reshape(10, 4).astype(np.uint8)
    it = (b[0] for b in P.batch_iterator((imgs,), 4, shuffle=False, drop_last=False))
    out = list(P.pad_batches(it, batch_size=4))
    assert len(out) == 3
    for batch, valid in out:
        assert batch.shape == (4, 4) and valid.shape == (4,)
    last, valid = out[-1]
    np.testing.assert_array_equal(valid, [1, 1, 0, 0])
    np.testing.assert_array_equal(last[2:], 0)


def test_dump_triplet_pngs(tmp_path):
    from ssl_cr_histo_tpu.data.sampler import RSPTripletSampler

    s = RSPTripletSampler(tile=16, stride=16, geometry="v2", check_mpp=False)
    trip = np.zeros((3, 16, 16, 3), np.uint8)
    s.dump_triplet_pngs(trip, str(tmp_path), "slideA", 7)
    for name in ("hr", "lr1", "lr2"):
        assert (tmp_path / "slideA" / "7" / name / "7.png").exists()


def test_pil_tiff_pyramid_reader(tmp_path):
    from PIL import Image

    from ssl_cr_histo_tpu.data.wsi import PILTiffReader, open_slide

    rng = np.random.default_rng(0)
    level0 = (rng.random((256, 512, 3)) * 255).astype(np.uint8)
    pages = [Image.fromarray(level0)]
    for k in (2, 4):
        pages.append(Image.fromarray(level0[::k, ::k]))
    path = tmp_path / "slide.tif"
    pages[0].save(str(path), save_all=True, append_images=pages[1:])

    r = open_slide(str(path))
    assert isinstance(r, PILTiffReader)
    assert r.level_count == 3
    assert r.level_dimensions[0] == (512, 256)
    assert r.level_downsamples[1] == pytest.approx(2.0)
    region = r.read_region((100, 40), 0, (64, 32))
    np.testing.assert_array_equal(region, level0[40:72, 100:164])
    region1 = r.read_region((100, 40), 1, (16, 16))
    np.testing.assert_array_equal(region1, level0[::2, ::2][20:36, 50:66])
    # sampler works end-to-end on the tif
    from ssl_cr_histo_tpu.data.sampler import RSPTripletSampler

    s = RSPTripletSampler(tile=32, stride=32, geometry="v2", check_mpp=False)
    trip = s.read_triplet(r, 8, 8)
    assert trip.shape == (3, 32, 32, 3)


def test_pil_tiff_reader_shared_across_threads(tmp_path):
    """One PILTiffReader shared by a thread pool (the heatmap serving
    pipeline's usage) must produce the same patches as serial reads — the
    shared PIL handle's page decodes are lock-protected."""
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    from ssl_cr_histo_tpu.data.wsi import PILTiffReader

    rng = np.random.default_rng(1)
    level0 = (rng.random((512, 512, 3)) * 255).astype(np.uint8)
    pages = [Image.fromarray(level0), Image.fromarray(level0[::2, ::2])]
    path = tmp_path / "shared.tif"
    pages[0].save(str(path), save_all=True, append_images=pages[1:])

    locs = [(int(x), int(y)) for x, y in rng.integers(0, 448, (64, 2))]

    def read_all(reader, pool=None):
        f = lambda loc: reader.read_region(loc, 0, (64, 64))
        return list(pool.map(f, locs)) if pool else [f(l) for l in locs]

    serial = read_all(PILTiffReader(str(path)))
    shared = PILTiffReader(str(path))  # cold cache: threads race the decode
    with ThreadPoolExecutor(max_workers=8) as pool:
        concurrent = read_all(shared, pool)
    for a, b in zip(serial, concurrent):
        np.testing.assert_array_equal(a, b)


def test_lazy_kather_dataset(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    for cls in ("ADI", "TUM"):
        os.makedirs(tmp_path / cls)
        for i in range(4):
            cv2.imwrite(
                str(tmp_path / cls / f"p{i}.tif"),
                (rng.random((32, 32, 3)) * 255).astype(np.uint8),
            )
    lazy = D.load_kather_folder(str(tmp_path), image_size=48, lazy=True)
    assert isinstance(lazy, D.LazyImageDataset)
    assert len(lazy) == 8
    # eager and lazy agree image-for-image
    eager = D.load_kather_folder(str(tmp_path), image_size=48, lazy=False)
    np.testing.assert_array_equal(lazy.decode(np.arange(8)), eager.images)
    np.testing.assert_array_equal(lazy.labels, eager.labels)
    # splits, fractions, batches work on the lazy dataset
    tr, va = D.train_val_split(lazy, 0.25, seed=0)
    assert len(tr) == 6 and len(va) == 2
    sub = D.labeled_fraction(tr, 0.5, seed=0)
    assert len(sub) == 3
    batches = list(tr.batches(2, shuffle=True, seed=0))
    assert len(batches) == 3
    assert batches[0][0].shape == (2, 48, 48, 3)
    # 'auto' returns eager below the threshold
    auto = D.load_kather_folder(str(tmp_path), image_size=48)
    assert isinstance(auto, D.ArrayDataset)


def test_reader_cache_lru_eviction(tmp_path):
    from ssl_cr_histo_tpu.data.wsi import ReaderCache

    closed = []

    class FakeReader:
        def __init__(self, path):
            self.path = path

        def close(self):
            closed.append(self.path)

    cache = ReaderCache(capacity=2, opener=FakeReader)
    a = cache.get("a")
    cache.get("b")
    assert cache.get("a") is a  # hit moves to MRU
    cache.get("c")  # evicts b (LRU), not a
    assert closed == ["b"]
    assert len(cache) == 2
    cache.close()
    assert sorted(closed) == ["a", "b", "c"]


def test_prefetch_indivisible_batch_raises():
    import jax
    import pytest

    from ssl_cr_histo_tpu.parallel import batch_sharding, make_mesh

    sharding = batch_sharding(make_mesh())  # 8 virtual devices
    it = iter([np.zeros((6, 4), np.uint8)])  # 6 % 8 != 0
    with pytest.raises(ValueError, match="not shardable"):
        list(P.prefetch_to_device(it, sharding=sharding))


def test_prefetch_early_break_stops_worker():
    import threading

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield np.full((2, 2), i, np.uint8)

    before = threading.active_count()
    g = P.prefetch_to_device(gen(), size=2)
    for i, _ in enumerate(g):
        if i == 3:
            break
    g.close()  # generator cleanup must stop the worker thread
    import time

    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    assert len(produced) < 1000  # worker did not drain the whole iterator


def test_mesh_for_batch_divisibility():
    import warnings

    from ssl_cr_histo_tpu.parallel import mesh_for_batch

    m = mesh_for_batch(64)  # 8 virtual devices divide 64
    assert int(m.shape["data"]) == 8
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m4 = mesh_for_batch(4)
        assert int(m4.shape["data"]) == 4
        assert any("not divisible" in str(x.message) for x in w)


def test_prefetch_iter_host_side():
    """prefetch_iter: order-preserving, map_fn applied on the worker,
    errors re-raised, early break stops the worker."""
    import threading
    import time

    items = list(range(20))
    out = list(P.prefetch_iter(iter(items), size=3, map_fn=lambda x: x * 2))
    assert out == [x * 2 for x in items]

    def bad():
        yield 1
        raise RuntimeError("loader boom")

    with pytest.raises(RuntimeError, match="loader boom"):
        list(P.prefetch_iter(bad(), size=2))

    before = threading.active_count()
    g = P.prefetch_iter(iter(range(1000)), size=2)
    for i in g:
        if i == 3:
            break
    g.close()
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_sampler_expand_orderings_epoch(tmp_path):
    """--expand_orderings strict mode (reference dataset.py:27-70 eager x6
    expansion): every triplet position appears exactly 6 times per epoch,
    once per ordering label, shuffled; batches carry the labels."""
    pyr = synthetic_wsi(1024, 1024, seed=0)
    np.save(tmp_path / "slide0.npy", pyr._levels[0])
    s = RSPTripletSampler(tile=64, stride=64, geometry="v2", check_mpp=False)
    indices = s.index_directory(str(tmp_path))
    n_pos = sum(len(i.coords) for i in indices)
    batches = list(
        s.iter_batches(indices, batch_size=4, seed=0, drop_last=False,
                       expand_orderings=True)
    )
    tiles_all = np.concatenate([b[0] for b in batches])
    labels_all = np.concatenate([b[1] for b in batches])
    assert len(tiles_all) == 6 * n_pos
    assert labels_all.dtype == np.int32
    # each label appears exactly n_pos times
    assert np.bincount(labels_all, minlength=6).tolist() == [n_pos] * 6
    # identical tile content appears 6x: group by content hash
    import hashlib

    seen = {}
    for tile, lab in zip(tiles_all, labels_all):
        h = hashlib.md5(tile.tobytes()).hexdigest()
        seen.setdefault(h, []).append(int(lab))
    for labs in seen.values():
        assert sorted(labs) == [0, 1, 2, 3, 4, 5]


def test_index_directory_cache_and_threads(tmp_path, monkeypatch):
    """Persistent index cache: the second scan reads the .npz instead of
    re-running the foreground scan; cache invalidates on parameter change;
    threaded and serial scans agree."""
    for i in range(3):
        np.save(tmp_path / f"s{i}.npy", synthetic_wsi(1024, 1024, seed=i)._levels[0])
    s = RSPTripletSampler(tile=64, stride=64, geometry="v2", check_mpp=False)

    serial = s.index_directory(str(tmp_path), n_workers=1)
    assert (tmp_path / ".rsp_index").is_dir()
    threaded = s.index_directory(str(tmp_path), n_workers=4)
    assert len(serial) == len(threaded)
    for a, b in zip(serial, threaded):
        assert a.slide_path == b.slide_path
        np.testing.assert_array_equal(a.coords, b.coords)

    # second run must not call index_slide at all
    calls = []
    real = RSPTripletSampler.index_slide

    def counting(self, reader, slide_path=""):
        calls.append(slide_path)
        return real(self, reader, slide_path)

    monkeypatch.setattr(RSPTripletSampler, "index_slide", counting)
    cached = s.index_directory(str(tmp_path))
    assert calls == []
    for a, b in zip(serial, cached):
        np.testing.assert_array_equal(a.coords, b.coords)

    # different geometry params -> cache miss -> fresh scan
    s2 = RSPTripletSampler(tile=64, stride=32, geometry="v2", check_mpp=False)
    s2.index_directory(str(tmp_path))
    assert len(calls) == 3

    # disabling the cache also scans
    calls.clear()
    s.index_directory(str(tmp_path), cache_dir=None)
    assert len(calls) == 3


def test_iter_batches_tile_cache_and_read_workers(tmp_path):
    """tile_cache returns identical epochs without re-reading; threaded
    reads (own readers per worker) yield byte-identical batches."""
    for i in range(2):
        np.save(tmp_path / f"s{i}.npy", synthetic_wsi(1024, 1024, seed=i)._levels[0])
    s = RSPTripletSampler(tile=64, stride=64, geometry="v2", check_mpp=False)
    indices = s.index_directory(str(tmp_path), cache_dir=None)

    base = list(s.iter_batches(indices, 4, seed=3, drop_last=False))
    threaded = list(s.iter_batches(indices, 4, seed=3, drop_last=False, read_workers=4))
    assert len(base) == len(threaded)
    for a, b in zip(base, threaded):
        np.testing.assert_array_equal(a, b)

    cache = {}
    first = list(s.iter_batches(indices, 4, seed=3, drop_last=False, tile_cache=cache))
    assert len(cache) == sum(len(i.coords) for i in indices)
    # second epoch: all from cache — poison read_triplet to prove no reads
    s.read_triplet = None  # type: ignore[assignment]
    second = list(s.iter_batches(indices, 4, seed=3, drop_last=False, tile_cache=cache))
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(base, first):
        np.testing.assert_array_equal(a, b)
