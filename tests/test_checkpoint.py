"""Checkpoint tests: native save/restore round-trip and torch import parity.

The torch-import test builds a minimal torch ResNet18+TripletNet with
torchvision state_dict naming (torchvision itself is not installed), loads
its weights through the importer, and checks the flax forward matches the
torch forward numerically — validating both the importer and the flax
architecture against the reference's backbone math.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
from torch_oracle import TorchTripletNet

from ssl_cr_histo_tpu.models import Classifier, TripletNet
from ssl_cr_histo_tpu.train import optim
from ssl_cr_histo_tpu.train.checkpoint import (
    latest_checkpoint,
    load_torch_triplet_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from ssl_cr_histo_tpu.train.init import init_triplet_state


def test_save_restore_roundtrip(tmp_path):
    model = TripletNet("resnet18")
    clf = Classifier(num_classes=6)
    tx = optim.adam(1e-3)
    state = init_triplet_state(model, clf, tx, jax.random.PRNGKey(0), image_size=32)
    path = str(tmp_path / "ckpt_5")
    save_checkpoint(path, state, {"epoch": 5, "val_loss": 0.5})
    template = init_triplet_state(model, clf, tx, jax.random.PRNGKey(1), image_size=32)
    restored, meta = restore_checkpoint(path, template)
    assert meta["epoch"] == 5
    np.testing.assert_array_equal(
        np.asarray(state.params["model"]["backbone"]["conv1"]["kernel"]),
        np.asarray(restored.params["model"]["backbone"]["conv1"]["kernel"]),
    )
    assert latest_checkpoint(str(tmp_path)) == path


# torch ResNet18/TripletNet oracle with torchvision naming: tests/torch_oracle.py


@pytest.fixture(scope="module")
def torch_ckpt(tmp_path_factory):
    torch.manual_seed(0)
    net = TorchTripletNet().eval()
    # randomize BN running stats so the import is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
    path = tmp_path_factory.mktemp("torch") / "ckpt.pth"
    # DataParallel-style 'module.' prefix, as the reference saves
    sd = {"module." + k: v for k, v in net.state_dict().items()}
    torch.save({"model": sd, "epoch": 3}, str(path))
    return str(path), net


def test_torch_import_forward_parity(torch_ckpt):
    path, net = torch_ckpt
    params, stats = load_torch_triplet_checkpoint(path)

    model = TripletNet("resnet18")
    x = np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        want = net(xt, xt, xt).numpy()

    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x),
        train=False,
        method=model.encode_single,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=1e-3)


def test_torch_import_structure_matches_init(torch_ckpt):
    path, _ = torch_ckpt
    params, stats = load_torch_triplet_checkpoint(path)
    model = TripletNet("resnet18")
    x = jnp.zeros((1, 32, 32, 3))
    ref = model.init(jax.random.PRNGKey(0), x, x, x, train=False)

    ref_paths = {jax.tree_util.tree_structure(ref["params"])}
    got_struct = jax.tree_util.tree_structure(params)
    assert got_struct == jax.tree_util.tree_structure(ref["params"])
    assert jax.tree_util.tree_structure(stats) == jax.tree_util.tree_structure(
        ref["batch_stats"]
    )
    # shapes agree leaf-by-leaf
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(ref["params"])
    ):
        assert a.shape == b.shape


def test_export_import_roundtrip(torch_ckpt, tmp_path):
    """flax -> torch state_dict -> flax round-trips exactly."""
    path, _ = torch_ckpt
    from ssl_cr_histo_tpu.train.checkpoint import export_torch_state_dict

    params, stats = load_torch_triplet_checkpoint(path)
    sd = export_torch_state_dict(params, stats)
    out = tmp_path / "export.pth"
    torch.save({"model": sd}, str(out))
    params2, stats2 = load_torch_triplet_checkpoint(str(out))
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(stats), jax.tree_util.tree_leaves(stats2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_checkpoint_cli_round_trip(tmp_path):
    """Native -> torch export CLI: the emitted .pt re-imports through the
    torch loader with identical backbone and head tensors."""
    import jax
    import torch

    from ssl_cr_histo_tpu.cli import convert_checkpoint
    from ssl_cr_histo_tpu.models import FinetuneHead, TripletNet
    from ssl_cr_histo_tpu.train import optim
    from ssl_cr_histo_tpu.train.checkpoint import (
        load_torch_triplet_checkpoint,
        save_checkpoint,
    )
    from ssl_cr_histo_tpu.train.init import init_triplet_state

    model = TripletNet("resnet18")
    head = FinetuneHead(num_classes=2)
    state = init_triplet_state(
        model, head, optim.adam(1e-4), jax.random.PRNGKey(3),
        image_size=32, triplet=False,
    )
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), state, {"epoch": 7})
    out = tmp_path / "model.pt"
    convert_checkpoint.main(["--input", str(ckpt), "--output", str(out)])

    raw = torch.load(out, map_location="cpu", weights_only=False)
    assert raw["epoch"] == 7
    assert "classifier.0.weight" in raw["classifier"]
    params, stats = load_torch_triplet_checkpoint(str(out))
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["conv1"]["kernel"]),
        np.asarray(state.params["model"]["backbone"]["conv1"]["kernel"]),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["fc"]["fc1"]["kernel"]),
        np.asarray(state.params["model"]["fc"]["fc1"]["kernel"]),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(raw["classifier"]["classifier.0.weight"]),
        np.asarray(state.params["head"]["fc"]["kernel"]).T,
        rtol=1e-6,
    )


def test_convert_checkpoint_strict_loads_into_reference_modules(tmp_path):
    """The exported .pt must load into the reference's OWN module shapes with
    strict=True — the CLI's stated purpose (reference eval_BreastPathQ_SSL.py:376
    does model.load_state_dict(state['model'])).  The torch modules here
    replicate the reference's state_dict key sets exactly: TripletNet
    (models/net.py:25-66, torchvision backbone under `model` with BN
    num_batches_tracked + `fc` Sequential) and FinetuneResNet (net.py:106-114,
    Sequential wrapped in `self.classifier`)."""
    import jax

    from ssl_cr_histo_tpu.cli import convert_checkpoint
    from ssl_cr_histo_tpu.models import FinetuneHead, TripletNet
    from ssl_cr_histo_tpu.train import optim
    from ssl_cr_histo_tpu.train.checkpoint import save_checkpoint
    from ssl_cr_histo_tpu.train.init import init_triplet_state

    model = TripletNet("resnet18")
    head = FinetuneHead(num_classes=2)
    state = init_triplet_state(
        model, head, optim.adam(1e-4), jax.random.PRNGKey(4),
        image_size=32, triplet=False,
    )
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), state, {"epoch": 1})
    out = tmp_path / "model.pt"
    convert_checkpoint.main(["--input", str(ckpt), "--output", str(out)])
    raw = torch.load(out, map_location="cpu", weights_only=False)

    trip = TorchTripletNet()
    trip.load_state_dict(raw["model"], strict=True)

    class TorchFinetuneResNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.classifier = tnn.Sequential(tnn.Linear(256 * 3, 2))

    TorchFinetuneResNet().load_state_dict(raw["classifier"], strict=True)
    # num_batches_tracked entries must be torch.long scalars
    nbt = raw["model"]["model.bn1.num_batches_tracked"]
    assert nbt.dtype == torch.int64 and nbt.ndim == 0
