"""Shared Camelyon16 fixture builders.

The reference's patch layout is one list.txt ('pid,x,y' per line) plus
line-indexed '{i}.png' files per directory (eval_Camelyon_SSL.py:226-232,
dataset.py:737).  The layout contract is written HERE once; every suite
that needs a synthetic Camelyon16 tree builds it through these helpers so
a contract change (e.g. extra list.txt columns) has a single home.
"""

import json
import os

import cv2
import numpy as np

# One 100x100 polygon at the origin: patches centered inside it are tumor.
TUMOR_DOC = {
    "positive": [
        {"name": "t", "vertices": [[0, 0], [100, 0], [100, 100], [0, 100]]}
    ],
    "negative": [],
}
EMPTY_DOC = {"positive": [], "negative": []}


def write_annotation_jsons(jsons, pids=("Tumor_026", "Normal_040")):
    """Per-WSI annotation JSONs: Tumor_* slides get the origin polygon,
    Normal_* slides an empty document."""
    os.makedirs(jsons, exist_ok=True)
    for pid in pids:
        doc = TUMOR_DOC if pid.startswith("Tumor") else EMPTY_DOC
        (jsons / f"{pid}.json").write_text(json.dumps(doc))
    return jsons


def write_patch_dir(d, entries, size=32):
    """Write one patch dir: list.txt line i pairs with '{i}.png'.

    entries: iterable of (pid, coord, pixels) where pixels is either a
    uint8 HWC array or a scalar fill value."""
    os.makedirs(d, exist_ok=True)
    with open(d / "list.txt", "w") as f:
        for i, (pid, coord, val) in enumerate(entries):
            f.write(f"{pid},{coord},{coord}\n")
            img = (
                val
                if isinstance(val, np.ndarray)
                else np.full((size, size, 3), val, np.uint8)
            )
            cv2.imwrite(str(d / f"{i}.png"), img)
    return d


def class_entries(pid, coord, n, seed=0, size=32):
    """n noisy same-class patches (tumor bright, normal dark) centered at
    (coord, coord) on slide pid."""
    rng = np.random.default_rng(seed)
    base = 200 if pid.startswith("Tumor") else 60
    return [
        (
            pid,
            coord,
            np.full((size, size, 3), base, np.uint8)
            + rng.integers(0, 30, (size, size, 3), dtype=np.uint8),
        )
        for _ in range(n)
    ]
