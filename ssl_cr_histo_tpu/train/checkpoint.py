"""Checkpointing: native msgpack checkpoints + torch checkpoint import.

Native format mirrors the reference's checkpoint *semantics* (reference
pretrain_BreastPathQ.py:296-320: a dict of {args, model, classifier,
optimizer, epoch, losses} saved every save_freq epochs plus best-val copies;
SSL_CR saves teacher+student pairs, eval_BreastPathQ_SSL_CR.py:519-554) with
a TPU-native representation: flax msgpack bytes + a JSON sidecar, written
atomically.  Cross-stage handoff (pretrain -> fine-tune -> CR) is
``train.init.load_backbone``.

``load_torch_triplet_checkpoint`` imports the reference's own torch
checkpoints (torchvision state_dict naming, optional DataParallel
``module.`` prefixes — reference eval_BreastPathQ_SSL.py:344-353) so parity
evaluations can run against published weights.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np

from ssl_cr_histo_tpu.train.state import TrainState


def save_checkpoint(path: str, state: TrainState, metadata: Optional[dict] = None) -> None:
    """Write {path}/checkpoint.msgpack + meta.json atomically.

    On multi-host pods only process 0 writes (params are replicated, so
    every process holds identical state; N processes writing the same files
    would race)."""
    from ssl_cr_histo_tpu.parallel.distributed import is_primary

    if not is_primary():
        return
    os.makedirs(path, exist_ok=True)
    payload = flax.serialization.msgpack_serialize(
        flax.serialization.to_state_dict(state)
    )
    meta = dict(metadata or {})
    meta["step"] = int(state.step)
    for name, data in (
        ("checkpoint.msgpack", payload),
        ("meta.json", json.dumps(meta, indent=2).encode()),
    ):
        fd, tmp = tempfile.mkstemp(dir=path)
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(path, name))


def restore_checkpoint(
    path: str, template: TrainState, restore_opt: bool = True
) -> Tuple[TrainState, dict]:
    """Restore a checkpoint component-wise into a template state.

    params/batch_stats/step always restore; opt_state and the Lookahead slow
    weights restore only when their structure matches the template's (a
    checkpoint written with a different freezing mask, or consumed by a
    different stage, keeps the template's fresh optimizer — matching the
    reference's cross-stage handoff, which never carries optimizer state,
    eval_BreastPathQ_SSL.py:342-353)."""
    with open(os.path.join(path, "checkpoint.msgpack"), "rb") as f:
        sd = flax.serialization.msgpack_restore(f.read())

    params = flax.serialization.from_state_dict(template.params, sd["params"])
    batch_stats = flax.serialization.from_state_dict(
        template.batch_stats, sd["batch_stats"]
    )
    step = jnp.asarray(sd.get("step", 0))
    state = template.replace(params=params, batch_stats=batch_stats, step=step)

    if restore_opt and sd.get("opt_state") is not None:
        try:
            opt_state = flax.serialization.from_state_dict(
                template.opt_state, sd["opt_state"]
            )
            state = state.replace(opt_state=opt_state)
        except (ValueError, KeyError, TypeError):
            pass  # structure mismatch -> keep fresh optimizer
    if template.slow_params is not None and sd.get("slow_params") is not None:
        try:
            state = state.replace(
                slow_params=flax.serialization.from_state_dict(
                    template.slow_params, sd["slow_params"]
                ),
                la_count=jnp.asarray(sd.get("la_count", 0)),
            )
        except (ValueError, KeyError, TypeError):
            pass

    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def latest_checkpoint(base_dir: str) -> Optional[str]:
    """Most recent epoch-numbered checkpoint directory under base_dir."""
    if not os.path.isdir(base_dir):
        return None
    cands = [
        d for d in os.listdir(base_dir)
        if d.startswith("ckpt_") and os.path.isdir(os.path.join(base_dir, d))
    ]
    if not cands:
        return None
    cands.sort(key=lambda d: int(d.split("_")[-1]))
    return os.path.join(base_dir, cands[-1])


# ---------------------------------------------------------------------------
# Torch checkpoint import (parity with reference weights)
# ---------------------------------------------------------------------------


def _strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v for k, v in sd.items()
    }


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def torch_backbone_to_flax(sd: Dict[str, Any], prefix: str = "model.") -> Tuple[dict, dict]:
    """Convert a torchvision-ResNet state_dict subtree to (params,
    batch_stats) flax trees matching ``models.resnet``.

    conv: OIHW -> HWIO; linear: (out, in) -> (in, out); BN weight/bias ->
    scale/bias, running stats -> batch_stats.
    """
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(value)

    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        name = key[len(prefix):]
        parts = name.split(".")
        v = _to_np(val)
        # torch "layer1.0.conv1.weight" -> flax "layer1_0/conv1/kernel"
        if parts[0].startswith("layer"):
            block = f"{parts[0]}_{parts[1]}"
            rest = parts[2:]
        else:
            block = None
            rest = parts
        if rest[0] == "downsample":
            mod = "downsample_conv" if rest[1] == "0" else "downsample_bn"
            rest = [mod] + rest[2:]
        mod, leaf = rest[0], rest[-1]
        path_prefix = (block, mod) if block else (mod,)
        if leaf == "weight":
            if v.ndim == 4:
                put(params, path_prefix + ("kernel",), v.transpose(2, 3, 1, 0))
            elif v.ndim == 1:  # BN scale
                put(params, path_prefix + ("scale",), v)
            else:
                put(params, path_prefix + ("kernel",), v.T)
        elif leaf == "bias":
            put(params, path_prefix + ("bias",), v)
        elif leaf == "running_mean":
            put(stats, path_prefix + ("mean",), v)
        elif leaf == "running_var":
            put(stats, path_prefix + ("var",), v)
        # num_batches_tracked: dropped
    return params, stats


def load_torch_triplet_checkpoint(ckpt_path: str, map_key: str = "model") -> Tuple[dict, dict]:
    """Load a reference TripletNet checkpoint file (torch.save dict with a
    '<map_key>' state_dict) into flax (model_params, batch_stats).

    The returned params tree has {'backbone': ..., 'fc': ...} matching
    ``models.nets.TripletNet``.
    """
    import torch

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw[map_key] if isinstance(raw, dict) and map_key in raw else raw
    sd = _strip_module_prefix(sd)

    backbone_params, backbone_stats = torch_backbone_to_flax(sd, prefix="model.")
    fc_params: dict = {}
    for i, name in ((0, "fc1"), (2, "fc2")):
        w = sd.get(f"fc.{i}.weight")
        b = sd.get(f"fc.{i}.bias")
        if w is None:
            raise KeyError(f"fc.{i}.weight missing from checkpoint")
        fc_params[name] = {"kernel": jnp.asarray(_to_np(w).T), "bias": jnp.asarray(_to_np(b))}

    params = {"backbone": backbone_params, "fc": fc_params}
    stats = {"backbone": backbone_stats}
    return params, stats


def export_torch_state_dict(model_params: dict, batch_stats: dict) -> Dict[str, Any]:
    """Inverse of the importer: flax TripletNet (params, batch_stats) ->
    a torch state_dict with torchvision naming ('model.*' backbone +
    'fc.{0,2}.*' pairwise head), for interop with reference tooling."""
    sd: Dict[str, Any] = {}

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            else:
                leaves[path + (k,)] = np.asarray(v)

    leaves: Dict[tuple, np.ndarray] = {}
    walk(model_params.get("backbone", {}), ())
    stats_leaves: Dict[tuple, np.ndarray] = {}
    leaves_store = leaves
    leaves = stats_leaves
    walk(batch_stats.get("backbone", {}), ())
    leaves = leaves_store

    def torch_name(path: tuple) -> str:
        parts = list(path)
        if parts[0].startswith("layer") and "_" in parts[0]:
            stage, block = parts[0].split("_")
            parts = [stage, block] + parts[1:]
        name = []
        for p in parts[:-1]:
            if p == "downsample_conv":
                name.append("downsample.0")
            elif p == "downsample_bn":
                name.append("downsample.1")
            else:
                name.append(p)
        leaf = parts[-1]
        leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
                    "mean": "running_mean", "var": "running_var",
                    "num_batches_tracked": "num_batches_tracked"}
        return "model." + ".".join(name) + "." + leaf_map[leaf]

    for path, v in leaves_store.items():
        if path[-1] == "kernel" and v.ndim == 4:
            v = v.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        elif path[-1] == "kernel":
            v = v.T
        sd[torch_name(path)] = v
    for path, v in stats_leaves.items():
        sd[torch_name(path)] = v
        if path[-1] == "mean":
            # torch BatchNorm state_dicts carry a long `num_batches_tracked`
            # per BN module; strict load_state_dict into the reference models
            # (eval_BreastPathQ_SSL.py:376) fails without it.  Flax tracks no
            # equivalent, so emit the fresh-module value (0).
            sd[torch_name(path[:-1] + ("num_batches_tracked",))] = np.zeros((), np.int64)

    fc = model_params.get("fc", {})
    for flax_name, idx in (("fc1", 0), ("fc2", 2)):
        if flax_name in fc:
            sd[f"fc.{idx}.weight"] = np.asarray(fc[flax_name]["kernel"]).T
            sd[f"fc.{idx}.bias"] = np.asarray(fc[flax_name]["bias"])
    return sd


def load_torch_linear_head(ckpt_path: str, map_key: str, torch_name: str = "classifier.0") -> dict:
    """Import a reference head (Classifier / FinetuneResNet) state_dict."""
    import torch

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = _strip_module_prefix(raw[map_key] if map_key in raw else raw)
    out: dict = {}
    names = sorted(
        {k.rsplit(".", 1)[0] for k in sd if k.endswith(".weight")},
        key=lambda s: int(s.split(".")[-1]),
    )
    flax_names = ["fc"] if len(names) == 1 else [f"fc{i + 1}" for i in range(len(names))]
    for tname, fname in zip(names, flax_names):
        out[fname] = {
            "kernel": jnp.asarray(_to_np(sd[f"{tname}.weight"]).T),
            "bias": jnp.asarray(_to_np(sd[f"{tname}.bias"])),
        }
    return out
