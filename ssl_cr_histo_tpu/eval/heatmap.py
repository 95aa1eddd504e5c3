"""WSI tumor-probability heatmap inference.

TPU-native rework of reference ``test_Camelyon16.py``: the tissue mask's
nonzero cells define a patch work list; patches stream through a threaded
reader into fixed-size batches (padded, so ONE compiled forward serves every
WSI regardless of its tissue area — no shape-driven recompiles), and the
tumor probabilities scatter into the probability map on the host.

Reference-behavior notes (deliberate fixes, documented for parity review):
  * the reference feeds raw float 0..255 pixels at test time
    (dataset.py:994) while training on /255 tensors — we normalize
    consistently with training;
  * the reference never loads the trained classifier head at inference
    (test_Camelyon16.py:126-127, random head) — our CLI loads it.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Tuple

import numpy as np

from ssl_cr_histo_tpu.data.wsi import PyramidReader


def pair_wsi_masks(wsipaths, maskpaths) -> list:
    """Pair each WSI with its tissue mask BY BASENAME: mask stem must be
    ``{wsi_id}``, ``{wsi_id}_mask`` or ``{wsi_id}_tissue``.  Raises listing
    every unmatched file.

    The reference pairs by zip of two independently sorted listings
    (test_Camelyon16.py:148) — one missing mask silently shifts every
    subsequent pairing; this is a deliberate fix, not parity.
    """
    masks = {}
    for mp in maskpaths:
        masks[os.path.splitext(os.path.basename(mp))[0]] = mp
    pairs, missing = [], []
    for wp in sorted(wsipaths):
        wid = os.path.splitext(os.path.basename(wp))[0]
        mp = None
        for stem in (wid, f"{wid}_mask", f"{wid}_tissue"):
            mp = masks.pop(stem, None)
            if mp is not None:
                break
        if mp is None:
            missing.append(wid)
        else:
            pairs.append((wp, mp))
    if missing or masks:
        raise ValueError(
            "WSI/mask pairing failed — WSIs without a {id,id_mask,id_tissue} "
            f"mask: {missing or 'none'}; masks without a WSI: "
            f"{sorted(masks) or 'none'}"
        )
    return pairs


def mask_work_list(reader: PyramidReader, mask: np.ndarray) -> Tuple[np.ndarray, np.ndarray, int]:
    """Validate slide/mask scale (power of 2, reference dataset.py:958-978)
    and return (x_idcs, y_idcs, resolution)."""
    x_slide, y_slide = reader.level_dimensions[0]
    x_mask, y_mask = mask.shape
    if round(x_slide / x_mask) != round(y_slide / y_mask):
        raise ValueError(
            f"slide/mask dimension mismatch: {x_slide}/{x_mask} vs {y_slide}/{y_mask}"
        )
    resolution = round(x_slide / x_mask)
    if not float(np.log2(resolution)).is_integer():
        raise ValueError(f"slide/mask resolution {resolution} is not a power of 2")
    x_idcs, y_idcs = np.where(mask)
    return x_idcs, y_idcs, resolution


def _iter_patch_batches(
    reader: PyramidReader,
    x_idcs: np.ndarray,
    y_idcs: np.ndarray,
    resolution: int,
    image_size: int,
    batch_size: int,
    io_threads: int = 8,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray, int]]:
    """Yield (patches u8 (B,S,S,3), x_mask, y_mask, n_valid) fixed-size
    batches; the final batch is zero-padded to keep shapes static."""

    def read_one(i: int) -> np.ndarray:
        x = int(x_idcs[i] * resolution - image_size / 2)
        y = int(y_idcs[i] * resolution - image_size / 2)
        return reader.read_region((x, y), 0, (image_size, image_size))

    n = len(x_idcs)
    with ThreadPoolExecutor(max_workers=io_threads) as pool:
        for start in range(0, n, batch_size):
            idx = list(range(start, min(start + batch_size, n)))
            patches = list(pool.map(read_one, idx))
            n_valid = len(idx)
            if n_valid < batch_size:
                patches += [np.zeros_like(patches[0])] * (batch_size - n_valid)
            yield (
                np.stack(patches),
                x_idcs[start : start + n_valid],
                y_idcs[start : start + n_valid],
                n_valid,
            )


def compute_probs_map(
    reader: PyramidReader,
    mask: np.ndarray,
    forward_fn: Callable[[np.ndarray], np.ndarray],
    image_size: int = 256,
    batch_size: int = 256,
    io_threads: int = 8,
    put_fn: Callable[[np.ndarray], object] = None,
    prefetch: int = 2,
) -> np.ndarray:
    """Run sliding-window inference and return the (X_mask, Y_mask) tumor
    probability map (reference test_Camelyon16.py:30-70).

    forward_fn: uint8 (B, S, S, 3) -> logits (B, 2); tumor prob is
    softmax[:, -1].
    put_fn: optional host->device transfer applied to each patch batch ON
    THE PREFETCH THREAD (e.g. a sharded ``jax.device_put``), so the H2D
    copy overlaps compute.

    The loop is a 3-deep pipeline: patch reads (+H2D) run ``prefetch``
    batches ahead on a background thread; the device result of batch k is
    fetched only AFTER batch k+1's forward has been dispatched (JAX's async
    dispatch makes ``forward_fn`` non-blocking), so the host-side softmax/
    scatter and the device->host sync hide under the next batch's compute.
    The reference runs the same loop fully serialized
    (test_Camelyon16.py:41-57: DataLoader -> forward -> .cpu() each step).
    """
    x_idcs, y_idcs, resolution = mask_work_list(reader, mask)
    probs_map = np.zeros(mask.shape, np.float32)

    batches = _iter_patch_batches(
        reader, x_idcs, y_idcs, resolution, image_size, batch_size, io_threads
    )
    if put_fn is not None:
        map_fn = lambda b: (put_fn(b[0]),) + b[1:]  # noqa: E731
    else:
        map_fn = None
    from ssl_cr_histo_tpu.data.pipeline import prefetch_iter

    def drain(pending) -> None:
        logits, xs, ys, n_valid = pending
        logits = np.asarray(logits)
        ex = np.exp(logits - logits.max(axis=-1, keepdims=True))
        probs = (ex / ex.sum(axis=-1, keepdims=True))[:n_valid, -1]
        probs_map[xs, ys] = probs

    pending = None
    for patches, xs, ys, n_valid in prefetch_iter(batches, prefetch, map_fn):
        logits = forward_fn(patches)  # async dispatch — do not block here
        if pending is not None:
            drain(pending)
        pending = (logits, xs, ys, n_valid)
    if pending is not None:
        drain(pending)
    return probs_map


def save_heatmap_artifacts(probs_map: np.ndarray, out_dir: str, wsi_id: str) -> None:
    """Write the reference's four artifacts (test_Camelyon16.py:168-189):
    .npy, grayscale PNG, jet heatmap PNG, and a colorbar figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, wsi_id), probs_map)

    pm = np.transpose(probs_map)
    Image.fromarray(np.uint8(pm * 255)).save(os.path.join(out_dir, f"{wsi_id}.png"))
    cmapper = matplotlib.colormaps["jet"]
    Image.fromarray(np.uint8(cmapper(np.clip(pm, 0, 1)) * 255)).save(
        os.path.join(out_dir, f"{wsi_id}_heatmap.png")
    )
    plt.imshow(pm, cmap="jet", interpolation="nearest")
    plt.colorbar()
    plt.clim(0.0, 1.0)
    plt.axis("off")
    plt.savefig(
        os.path.join(out_dir, f"{wsi_id}_heatmap_bar.png"), bbox_inches="tight", dpi=300
    )
    plt.clf()
