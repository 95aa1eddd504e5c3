"""Reference-compatible parameter freezing.

The reference freezes by *torch parameter enumeration index*: the first
``--modules`` tensors of ``model.parameters()`` get ``requires_grad=False``
(reference eval_BreastPathQ_SSL.py:361-370).  Documented operating points for
the TripletNet(resnet18) (reference eval_Kather_SSL.py:229):

  modules=0   full fine-tune
  modules=3   freeze conv1+bn1          (train from layer1)
  modules=15  freeze through layer1     (train from layer2)
  modules=30  freeze through layer2     (train from layer3)
  modules=45  freeze through layer3     (train from layer4)
  modules=60  freeze the whole backbone (train the pairwise fc + head)
  modules=64  freeze backbone + pairwise fc (train the final head only)

We reproduce the same index space by enumerating our flax param tree in torch
``model.parameters()`` order (weights/biases only — BN running stats are
buffers, and they keep updating during training exactly as in the reference,
which never puts frozen modules in eval mode).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import optax

_STAGE_SIZES = {"resnet18": (2, 2, 2, 2), "resnet50": (3, 4, 6, 3)}
_HAS_DOWNSAMPLE = {
    "resnet18": lambda stage, block: stage > 0 and block == 0,
    "resnet50": lambda stage, block: block == 0,
}


def torch_param_order(model_name: str = "resnet18") -> List[Tuple[str, ...]]:
    """Ordered flax-param paths matching torch ``model.parameters()`` for the
    TripletNet: backbone first, then the pairwise fc head."""
    order: List[Tuple[str, ...]] = []
    bb = ("backbone",)
    order.append(bb + ("conv1", "kernel"))
    order.append(bb + ("bn1", "scale"))
    order.append(bb + ("bn1", "bias"))
    bottleneck = model_name == "resnet50"
    for stage, n_blocks in enumerate(_STAGE_SIZES[model_name]):
        for block in range(n_blocks):
            prefix = bb + (f"layer{stage + 1}_{block}",)
            n_convs = 3 if bottleneck else 2
            for c in range(1, n_convs + 1):
                order.append(prefix + (f"conv{c}", "kernel"))
                order.append(prefix + (f"bn{c}", "scale"))
                order.append(prefix + (f"bn{c}", "bias"))
            if _HAS_DOWNSAMPLE[model_name](stage, block):
                order.append(prefix + ("downsample_conv", "kernel"))
                order.append(prefix + ("downsample_bn", "scale"))
                order.append(prefix + ("downsample_bn", "bias"))
    for fc in ("fc1", "fc2"):
        order.append(("fc", fc, "kernel"))
        order.append(("fc", fc, "bias"))
    return order


def freeze_labels(params: Any, modules: int, model_name: str = "resnet18") -> Any:
    """Label pytree over ``params`` = {'model': ..., 'head': ...}: leaves with
    torch index < ``modules`` -> 'freeze', everything else -> 'train'.

    The head is never frozen by this scheme for students; the teacher in CR
    is handled by keeping it out of the optimizer entirely.
    """
    index = {path: i for i, path in enumerate(torch_param_order(model_name))}

    def label_for(path_tuple):
        i = index.get(path_tuple)
        if i is None:  # head params and anything outside the torch ordering
            return "train"
        return "freeze" if i < modules else "train"

    def build(tree, prefix):
        if isinstance(tree, dict):
            return {k: build(v, prefix + (k,)) for k, v in tree.items()}
        # leaf: strip the top-level 'model'/'head' key for backbone lookup
        if prefix and prefix[0] == "model":
            return label_for(prefix[1:])
        return "train"

    return build(params, ())


def masked_optimizer(
    tx: optax.GradientTransformation, params: Any, modules: int,
    model_name: str = "resnet18",
) -> optax.GradientTransformation:
    """Wrap ``tx`` so the first ``modules`` torch-ordered backbone tensors
    receive zero updates."""
    if modules <= 0:
        return tx
    labels = freeze_labels(params, modules, model_name)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )


def count_frozen(params: Any, modules: int, model_name: str = "resnet18") -> int:
    labels = freeze_labels(params, modules, model_name)
    return sum(
        1 for leaf in jax.tree_util.tree_leaves(labels) if leaf == "freeze"
    )
