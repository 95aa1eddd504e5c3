"""Dataset readers for the three downstream tasks.

Host-side readers return raw uint8 arrays + labels; ALL augmentation happens
on device inside the train steps (see parallel/steps.py) — the inverse of
the reference's CPU-worker design.

Readers mirror the reference's data contracts:
  * BreastPathQ  — .h5 files with data['x'] float CHW in [0,1] and data['y']
                   cellularity scores (reference dataset.py:453-536,
                   :539-599, :603-659)
  * Camelyon16   — pre-sampled '{idx}.png' patches indexed by list.txt lines
                   'pid,x_center,y_center'; labels from point-in-polygon
                   tests against per-WSI JSON annotations; fine-tune split
                   rule Tumor_>25 / Normal_>35 (reference dataset.py:685-939)
  * Kather       — folder-per-class .tif patches, 9 classes ADI..TUM
                   (reference dataset.py:1002-1241)

Labeled-fraction subsampling defaults to sampling WITHOUT replacement; the
reference uses np.random.choice with replacement (a documented defect,
eval_BreastPathQ_SSL.py:299) — pass with_replacement=True for strict parity.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from ssl_cr_histo_tpu.data.annotations import Annotation

KATHER_CLASSES = ("ADI", "BACK", "DEB", "LYM", "MUC", "MUS", "NORM", "STR", "TUM")
KATHER_LABELS: Dict[str, int] = {c: i for i, c in enumerate(KATHER_CLASSES)}


@dataclass
class ArrayDataset:
    """Materialized (images uint8 NHWC, labels) pair with simple ops.

    `groups` (optional) records each item's source pool — for Camelyon16,
    the index of the directory it was read from (see `grouping_key`)."""

    images: np.ndarray
    labels: np.ndarray
    groups: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return len(self.images)

    def subset(self, idx) -> "ArrayDataset":
        return ArrayDataset(
            self.images[idx], self.labels[idx],
            None if self.groups is None else self.groups[idx],
        )

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                drop_last: bool = True):
        from ssl_cr_histo_tpu.data.pipeline import epoch_indices

        for sel in epoch_indices(len(self), batch_size, shuffle, seed, drop_last):
            yield self.images[sel], self.labels[sel]


@dataclass
class LazyImageDataset:
    """Path-backed dataset: labels are eager (splits/balancing need them),
    pixels decode on demand with a thread pool.

    The reference's Kather loaders are also lazy (paths + per-item decode in
    DataLoader workers, dataset.py:1002-1071); eager decoding of
    NCT-CRC-HE-100K would need ~15 GB of host RAM.
    """

    paths: list
    labels: np.ndarray
    image_size: int
    decode_threads: int = 8
    groups: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return len(self.paths)

    def subset(self, idx) -> "LazyImageDataset":
        idx = np.asarray(idx)
        return LazyImageDataset(
            [self.paths[int(i)] for i in idx], self.labels[idx],
            self.image_size, self.decode_threads,
            None if self.groups is None else self.groups[idx],
        )

    def decode(self, idx) -> np.ndarray:
        def one(i):
            raw = cv2.imread(self.paths[int(i)], cv2.IMREAD_COLOR)
            if raw is None:  # deleted/corrupt file: name it instead of
                # crashing later inside cvtColor with no path in the message
                raise FileNotFoundError(
                    f"unreadable image {self.paths[int(i)]!r}"
                )
            img = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
            return _resize(img, self.image_size)

        return np.stack(list(self._executor().map(one, np.asarray(idx))))

    def _executor(self):
        # one persistent pool per dataset — decode() runs once per batch on
        # the lazy hot path, so per-call executor creation would spawn and
        # join decode_threads OS threads thousands of times per epoch
        pool = getattr(self, "_pool", None)
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=self.decode_threads)
            self._pool = pool
        return pool

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                drop_last: bool = True):
        from ssl_cr_histo_tpu.data.pipeline import epoch_indices

        for sel in epoch_indices(len(self), batch_size, shuffle, seed, drop_last):
            yield self.decode(sel), self.labels[sel]

    def materialize(self) -> ArrayDataset:
        return ArrayDataset(
            self.decode(np.arange(len(self))), self.labels, self.groups
        )


def grouping_key(ds) -> np.ndarray:
    """Pool key for Camelyon16 class-balanced batching and per-class
    labeled subsampling.  The reference keys both on the SOURCE DIRECTORY —
    it builds a separate loader per patch dir (tumor/normal,
    eval_Camelyon_SSL.py:226-232) and draws/zips per loader — NOT on the
    polygon label, so an annotation-boundary patch in the tumor dir rides
    in the tumor pool even when its center is polygon-negative.  Uses the
    dataset's source-dir `groups` when they distinguish >=2 pools; falls
    back to labels for single-dir layouts (where dir membership carries no
    class information)."""
    g = getattr(ds, "groups", None)
    if g is not None and len(np.unique(g)) >= 2:
        return np.asarray(g)
    return np.asarray(ds.labels)


def _resize(img: np.ndarray, size: int) -> np.ndarray:
    if img.shape[0] == size and img.shape[1] == size:
        return img
    return cv2.resize(img, (size, size), interpolation=cv2.INTER_CUBIC)


# ---------------------------------------------------------------------------
# BreastPathQ (.h5, regression)
# ---------------------------------------------------------------------------


def load_breastpathq_h5(dataset_path: str, image_size: int = 256) -> ArrayDataset:
    """Read every .h5 under dataset_path: data['x'] float CHW [0,1] ->
    uint8 HWC resized to image_size; data['y'] float scores."""
    import h5py

    images: List[np.ndarray] = []
    labels: List[float] = []
    for path in sorted(glob.glob(os.path.join(dataset_path, "*.h5"))):
        with h5py.File(path, "r") as f:
            x = np.asarray(f["x"])
            y = np.asarray(f["y"]).reshape(len(x), -1)[:, 0]
        for patch, score in zip(x, y):
            img = (np.transpose(patch, (1, 2, 0)) * 255).astype(np.uint8)
            images.append(_resize(img, image_size))
            labels.append(float(score))
    return ArrayDataset(np.stack(images), np.asarray(labels, np.float32))


def load_breastpathq_eval_pair(
    dir_a: str, dir_b: str, image_size: int = 256
) -> Tuple[ArrayDataset, np.ndarray]:
    """Two-rater eval set (reference dataset.py:539-599: TestSetSherine +
    TestSetSharon hold the same patches scored by two raters).  Returns the
    dataset labeled by rater A plus rater B's label vector."""
    a = load_breastpathq_h5(dir_a, image_size)
    b = load_breastpathq_h5(dir_b, image_size)
    if len(a) != len(b):
        raise ValueError(f"rater sets differ in size: {len(a)} vs {len(b)}")
    return a, b.labels


# ---------------------------------------------------------------------------
# Camelyon16 (pre-sampled patches + annotations, binary)
# ---------------------------------------------------------------------------


def _camelyon_list(data_path: str) -> List[Tuple[int, str, int, int]]:
    """Parse list.txt -> [(line_idx, pid, x, y)].  Patch files are named by
    LINE INDEX ('{idx}.png' — reference dataset.py:737), so the pairing
    depends on list order; we preserve it."""
    out = []
    with open(os.path.join(data_path, "list.txt")) as f:
        for i, line in enumerate(f):
            parts = line.strip("\n").split(",")
            if len(parts) < 3:
                continue
            pid, x, y = parts[0], int(parts[1]), int(parts[2])
            out.append((i, pid, x, y))
    return out


_ANNS_CACHE: Dict[str, Tuple[tuple, Dict[str, Annotation]]] = {}


def _load_annotations(json_path: str) -> Dict[str, Annotation]:
    """Parse every per-WSI annotation JSON under json_path, memoized on the
    dir's (filename, mtime) listing — the train and VALID loaders default to
    the same --json_path (cli/finetune.py load_train_val), and re-parsing
    hundreds of polygon files twice per startup is pure waste."""
    root = os.path.realpath(json_path)
    files = sorted(p for p in os.listdir(json_path) if p.endswith(".json"))
    stamp = tuple(
        (p, os.path.getmtime(os.path.join(json_path, p))) for p in files
    )
    cached = _ANNS_CACHE.get(root)
    if cached is not None and cached[0] == stamp:
        return cached[1]
    anns = {}
    for p in files:
        pid = p[: -len(".json")]
        anns[pid] = Annotation().from_json(os.path.join(json_path, p))
    _ANNS_CACHE[root] = (stamp, anns)
    return anns


def _finetune_split(pid: str) -> bool:
    """Reference hard-coded rule (dataset.py:716-727): fine-tune uses
    Tumor_>25 and Normal_>35; the rest pretrains."""
    head, _, num = pid.partition("_")
    if not num.isdigit():
        return False
    if head == "Tumor":
        return int(num) > 25
    if head == "Normal":
        return int(num) > 35
    return False


def split_data_dirs(data_path: str) -> List[str]:
    """Split a --*_path value into its comma-separated directories.  The
    reference ships Camelyon16 tumor and normal patches as SEPARATE
    directories (eval_Camelyon_SSL.py --train_tumor_image_pth /
    --train_normal_image_pth, same for *_VALID) — pass both as one
    comma-joined value here.  Only ',' separates (not os.pathsep — ':' is
    legal inside POSIX paths)."""
    return [d.strip() for d in data_path.split(",") if d.strip()]


def load_camelyon16_patches(
    data_path: str,
    json_path: str,
    image_size: int = 256,
    split: Optional[str] = "finetune",
    lazy: "str | bool" = "auto",
    lazy_threshold: int = 20000,
):
    """Load '{idx}.png' patches with point-in-polygon labels.

    data_path may name SEVERAL comma-separated patch directories, each with
    its own list.txt and line-indexed '{idx}.png' files — the reference's
    layout is one tumor dir + one normal dir per split
    (eval_Camelyon_SSL.py:226-232, eval_Camelyon_SSL_CR.py:270-277), each
    indexed independently (dataset.py:737 opens '{idx}.png' relative to its
    own data_path).

    split: 'finetune' applies the Tumor_>25/Normal_>35 rule; 'pretrain' the
    complement; None keeps everything.

    lazy=True (or 'auto' above lazy_threshold items) returns a
    LazyImageDataset that decodes per batch — matching the reference's lazy
    per-item decode (dataset.py:735-739) and keeping reference-scale patch
    sets (tens of thousands of 256x256 PNGs per class dir) out of host RAM.
    Labels are always eager (splits and class balancing need them), and
    every listed file's existence is checked up front so a list.txt longer
    than the extracted png set fails at load, not hours into a lazy epoch.

    The returned dataset's `groups` records each patch's source-dir index —
    the pool key for balanced batching and per-class subsampling
    (`grouping_key`): the reference draws those per DIRECTORY loader.
    """
    dirs = split_data_dirs(data_path)
    if not dirs:
        raise ValueError("empty Camelyon16 data_path (expected patch dir(s))")
    anns = _load_annotations(json_path)
    paths: List[str] = []
    labels: List[int] = []
    groups: List[int] = []
    for dir_i, d in enumerate(dirs):
        for idx, pid, x, y in _camelyon_list(d):
            keep = (
                split is None
                or (split == "finetune" and _finetune_split(pid))
                or (split == "pretrain" and not _finetune_split(pid))
            )
            if not keep:
                continue
            p = os.path.join(d, f"{idx}.png")
            if not os.path.isfile(p):
                raise FileNotFoundError(
                    f"list.txt line {idx} of {d!r} names a missing patch "
                    f"file {p!r} (list longer than the extracted png set?)"
                )
            paths.append(p)
            groups.append(dir_i)
            ann = anns.get(pid)
            labels.append(1 if (ann is not None and ann.inside_polygons((x, y), True)) else 0)
    if not paths:
        raise ValueError(
            f"no Camelyon16 patches survived the split={split!r} slide rule "
            f"{'(Tumor_>25/Normal_>35 fine-tune slides only)' if split == 'finetune' else ''} "
            f"in {dirs}; check the list.txt slide ids or pass split=None"
        )
    ds = LazyImageDataset(
        paths, np.asarray(labels, np.int32), image_size,
        groups=np.asarray(groups, np.int32),
    )
    if lazy is True or (lazy == "auto" and len(ds) > lazy_threshold):
        return ds
    return ds.materialize()


# ---------------------------------------------------------------------------
# Kather / NCT-CRC-HE-100K (folder-per-class, 9-way)
# ---------------------------------------------------------------------------


def load_kather_folder(
    dataset_path: str,
    image_size: int = 224,
    exts: Sequence[str] = ("tif", "png", "jpg"),
    lazy: str | bool = "auto",
    lazy_threshold: int = 20000,
):
    """Folder-per-class loader.  lazy=True (or 'auto' above lazy_threshold
    items) returns a LazyImageDataset that decodes per batch — matching the
    reference's lazy per-item decode and keeping NCT-CRC-HE-100K out of host
    RAM."""
    all_paths: List[str] = []
    labels: List[int] = []
    for cls_dir in sorted(glob.glob(os.path.join(dataset_path, "*/"))):
        cls = os.path.basename(os.path.dirname(cls_dir))
        label = KATHER_LABELS.get(cls, 8)  # unknown folder -> TUM, like the
        # reference's else-branch (dataset.py:1050-1052)
        paths: List[str] = []
        for ext in exts:
            paths += glob.glob(os.path.join(cls_dir, f"*.{ext}"))
        for p in sorted(paths):
            all_paths.append(p)
            labels.append(label)
    ds = LazyImageDataset(all_paths, np.asarray(labels, np.int32), image_size)
    if lazy is True or (lazy == "auto" and len(ds) > lazy_threshold):
        return ds
    return ds.materialize()


# ---------------------------------------------------------------------------
# Splits & label-fraction subsampling
# ---------------------------------------------------------------------------


def train_val_split(
    ds: ArrayDataset, validation_split: float = 0.1, seed: int = 42, shuffle: bool = True
) -> Tuple[ArrayDataset, ArrayDataset]:
    """Index split matching the reference's sklearn-style holdout
    (eval_BreastPathQ_SSL.py:293-307)."""
    n = len(ds)
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    n_val = int(np.floor(validation_split * n))
    return ds.subset(idx[n_val:]), ds.subset(idx[:n_val])


def labeled_fraction(
    ds: ArrayDataset,
    fraction: float,
    seed: int = 42,
    with_replacement: bool = False,
    per_class: bool = False,
):
    """Subsample a labeled fraction (10/25/50/100%), floor-sized like the
    reference's int(frac * n) (eval_BreastPathQ_SSL.py:298).

    with_replacement=True reproduces the reference's np.random.choice
    duplicates defect.  per_class=True subsamples each pool separately —
    the Camelyon16 drivers draw int(frac * n) tumor and normal indices from
    their own per-DIRECTORY loaders (eval_Camelyon_SSL.py:273-274,
    eval_Camelyon_SSL_CR.py:318-319), which keeps the labeled pool
    balanced; pooled sampling would starve the rarer pool.  The pool key is
    `grouping_key(ds)`: the source dir when the dataset records >=2 of
    them (exact reference semantics, including annotation-boundary patches
    riding in their dir's pool), else the polygon label."""
    rng = np.random.default_rng(seed)
    if per_class:
        parts = []
        key = grouping_key(ds)
        for cls in np.unique(key):
            cls_idx = np.where(key == cls)[0]
            k = int(fraction * len(cls_idx))
            if k == 0:
                # the reference's empty per-class sampler makes the zipped
                # epoch 0 steps long (silent no-op training) — fail loudly
                raise ValueError(
                    f"labeled fraction {fraction} of {len(cls_idx)} "
                    f"pool-{cls} samples floors to zero — raise "
                    f"--labeled_train or add data"
                )
            parts.append(rng.choice(cls_idx, size=k, replace=with_replacement))
        idx = np.concatenate(parts)
    else:
        n = len(ds)
        idx = rng.choice(n, size=int(fraction * n), replace=with_replacement)
        if len(idx) == 0 and n > 0:
            raise ValueError(
                f"labeled fraction {fraction} of {n} samples floors to "
                f"zero — raise --labeled_train or add data"
            )
    return ds.subset(idx)
