"""Tests for reporting artifacts, balanced loader, and profiling utils."""

import numpy as np
import pytest

from ssl_cr_histo_tpu.data import datasets as D
from ssl_cr_histo_tpu.data.pipeline import balanced_batch_iterator
from ssl_cr_histo_tpu.eval import reporting as R
from ssl_cr_histo_tpu.utils.profiling import StepTimer, Throughput


def test_confusion_matrix_plot(tmp_path):
    cm = np.array([[5, 1], [2, 7]])
    out = tmp_path / "cm.png"
    R.save_confusion_matrix_plot(cm, ["neg", "pos"], str(out))
    assert out.exists() and out.stat().st_size > 0
    R.save_confusion_matrix_plot(cm, ["neg", "pos"], str(tmp_path / "cmn.png"), normalize=True)


def test_tsne_plot(tmp_path):
    rng = np.random.default_rng(0)
    feats = np.concatenate([rng.normal(i, 0.1, (20, 16)) for i in range(3)])
    labels = np.repeat(np.arange(3), 20)
    out = tmp_path / "tsne.png"
    R.save_tsne_plot(feats, labels, str(out), perplexity=5)
    assert out.exists()
    assert (tmp_path / "tsne_feats.npy").exists()


def test_scatter_and_bland_altman(tmp_path):
    a = np.linspace(0, 1, 30)
    b = a + np.random.default_rng(0).normal(0, 0.05, 30)
    R.save_scatter_plot(a, b, "rater", "model", str(tmp_path / "sc.png"))
    R.save_bland_altman_plot(a, b, str(tmp_path / "ba.png"))
    assert (tmp_path / "sc.png").exists() and (tmp_path / "ba.png").exists()


def test_balanced_batch_iterator():
    """Reference dual-loader semantics (eval_Camelyon_SSL.py:281-291 +
    :50-75): batch_size samples from EACH class per step -> 2*batch_size
    rows per yielded batch; epoch length = min-class count // batch_size."""
    images = np.arange(30)[:, None].astype(np.uint8)
    labels = np.array([0] * 20 + [1] * 10)
    ds = D.ArrayDataset(images, labels)
    batches = list(balanced_batch_iterator(ds, batch_size=4, seed=0))
    # smaller class has 10 -> 2 batches, each 4+4
    assert len(batches) == 2
    for imgs, labs in batches:
        assert len(labs) == 8
        assert (labs == 0).sum() == 4 and (labs == 1).sum() == 4
    # no duplicate use of minority samples across the epoch
    used = np.concatenate([l for _, l in batches])
    assert (used == 1).sum() == 8
    sel = np.concatenate([i[:, 0] for i, _ in batches])
    assert len(np.unique(sel)) == len(sel)


def test_balanced_epoch_len_matches_iterator():
    from ssl_cr_histo_tpu.cli.common import balanced_epoch_len

    labels = np.array([0] * 37 + [1] * 23)
    ds = D.ArrayDataset(np.zeros((60, 1), np.uint8), labels)
    for bs in (4, 8, 16):
        got = len(list(balanced_batch_iterator(ds, bs, seed=1)))
        assert got == balanced_epoch_len(labels, bs) or (
            got == 0 and balanced_epoch_len(labels, bs) == 1
        )


def test_balanced_epoch_len_guards():
    from ssl_cr_histo_tpu.cli.common import balanced_epoch_len

    # != 2 pools must fail upfront (3+ comma-joined dirs would otherwise
    # crash mid-epoch inside balanced_batch_iterator, after load + compile)
    with pytest.raises(SystemExit, match="exactly two pools"):
        balanced_epoch_len(np.array([0, 1, 2, 2]), 2)
    with pytest.raises(SystemExit, match="exactly two pools"):
        balanced_epoch_len(np.ones(8, np.int64), 2)
    # clamp=False reports a truly empty epoch (smaller pool < batch size)
    assert balanced_epoch_len(np.array([0] * 3 + [1] * 100), 4, clamp=False) == 0
    assert balanced_epoch_len(np.array([0] * 3 + [1] * 100), 4) == 1


def test_step_timer_and_throughput():
    t = StepTimer()
    t.reset()
    assert t.elapsed() >= 0.0
    assert t.elapsed(sync_value=np.float32(1.0)) >= 0.0
    tp = Throughput(window=2)
    tp.update(10, 1.0)
    tp.update(20, 1.0)
    assert tp.items_per_sec == 15.0
    tp.update(30, 1.0)  # evicts the first
    assert tp.items_per_sec == 25.0
