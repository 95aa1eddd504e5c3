"""Export a native checkpoint to the reference's torch format.

The reverse direction (reference ``.pt`` -> this framework) needs no
conversion: ``cli.finetune --model_path <torch.pt>`` imports directly.
This CLI serves users going the other way — evaluating TPU-trained
weights with the reference's own PyTorch tooling:

    python -m ssl_cr_histo_tpu.cli.convert_checkpoint \
        --input runs/best --output model.pt

Writes a ``torch.save`` dict with the reference's layout: ``model`` (the
torchvision-named TripletNet state_dict, ``model.*`` backbone — incl. BN
``num_batches_tracked`` — + ``fc.*`` pairwise head, reference
models/net.py:25-66) and ``classifier`` (``classifier.0.*`` for
FinetuneResNet's single Linear, ``classifier.{0,2}.*`` for the pretrain
Classifier MLP — both wrap their Sequential in ``self.classifier``,
net.py:12-15/:111), plus the checkpoint's meta (epoch etc., reference
pretrain_BreastPathQ.py:296-320).  Strict ``load_state_dict`` into the
reference modules succeeds (tested against reference-shaped torch modules
in tests/test_checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import os

import flax
import numpy as np


def head_torch_state_dict(head_params: dict) -> dict:
    """Flax head params -> torch state_dict names.

    The reference's Classifier / FinetuneResNet wrap their Sequential in a
    ``self.classifier`` attribute (reference models/net.py:12-15, :111), so
    ``classifier.load_state_dict`` expects ``classifier.{0,2}.*`` keys."""
    if "fc" in head_params:  # FinetuneHead: single Linear
        layers = [("fc", 0)]
    elif "fc1" in head_params:  # Classifier: Linear -> ReLU -> Linear
        layers = [("fc1", 0), ("fc2", 2)]
    else:
        raise KeyError(f"unrecognized head params: {sorted(head_params)}")
    sd = {}
    for name, idx in layers:
        sd[f"classifier.{idx}.weight"] = np.asarray(head_params[name]["kernel"]).T
        sd[f"classifier.{idx}.bias"] = np.asarray(head_params[name]["bias"])
    return sd


def main(argv=None):
    p = argparse.ArgumentParser("native checkpoint -> reference torch format")
    p.add_argument("--input", required=True, help="native checkpoint directory")
    p.add_argument("--output", required=True, help="output .pt path")
    args = p.parse_args(argv)

    import torch

    from ssl_cr_histo_tpu.train.checkpoint import export_torch_state_dict

    with open(os.path.join(args.input, "checkpoint.msgpack"), "rb") as f:
        sd = flax.serialization.msgpack_restore(f.read())
    meta_path = os.path.join(args.input, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)

    model_sd = export_torch_state_dict(sd["params"]["model"], sd["batch_stats"])
    # np.array(copy) keeps 0-d arrays 0-d (BN num_batches_tracked must stay
    # scalar) and detaches from read-only msgpack views torch can't own
    def t(v):
        return torch.as_tensor(np.array(v))

    out = {
        "model": {k: t(v) for k, v in model_sd.items()},
        "epoch": meta.get("epoch", 0),
    }
    if "head" in sd["params"]:
        out["classifier"] = {
            k: t(v) for k, v in head_torch_state_dict(sd["params"]["head"]).items()
        }
    torch.save(out, args.output)
    n = len(out["model"]) + len(out.get("classifier", {}))
    print(f"{args.input} -> {args.output} ({n} tensors, epoch {out['epoch']})")


if __name__ == "__main__":
    main()
