"""SSL_CR_Histo model assemblies: the triplet (RSP) network and its heads.

Mirrors the contracts of reference ``models/net.py``:
  * TripletNet        — shared backbone over 3 inputs, pairwise-concat fc head
                        -> 3*fc_out features (768-d for resnet18)
                        (reference models/net.py:25-66)
  * Classifier        — in -> 128 -> num_classes MLP (reference :8-20)
  * TripletNetFinetune— single-input variant (reference :70-103).  The
                        reference encodes the SAME image three times and
                        concatenates (a documented 3x-FLOPs quirk kept only
                        for checkpoint shape compatibility); in deterministic
                        JAX the three encodings are identical, so we encode
                        once and tile — bit-identical output, 1/3 the FLOPs.
  * FinetuneHead      — single Linear 3*fc_out -> num_classes (reference
                        :107-115)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ssl_cr_histo_tpu.models.resnet import make_backbone

_FC_DIMS = {"resnet18": (1024, 512, 256), "resnet50": (4096, 1024, 512)}


def feature_dim(model_name: str) -> int:
    """Final triplet feature dimension (3 * fc_out): 768 for resnet18."""
    return 3 * _FC_DIMS[model_name][2]


class _PairFC(nn.Module):
    """Shared MLP applied to pairwise-concatenated embeddings."""

    model_name: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d_in, d_hidden, d_out = _FC_DIMS[self.model_name]
        x = nn.Dense(d_hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(d_out, dtype=self.dtype, name="fc2")(x)
        return x


class TripletNet(nn.Module):
    """Backbone + pairwise-concat head.

    ``__call__(i1, i2, i3, train)`` -> (B, 3*fc_out) features.
    ``encode_single(i, train)``     -> same feature layout from one image
    (the TripletNet_Finetune forward, computed without redundancy).
    """

    model_name: str = "resnet18"
    dtype: Any = jnp.float32
    remat: bool = False  # see models.resnet.ResNet.remat

    def setup(self):
        self.backbone = make_backbone(self.model_name, dtype=self.dtype, remat=self.remat)
        self.fc = _PairFC(self.model_name, dtype=self.dtype)

    def __call__(self, i1, i2, i3, train: bool = True):
        e1 = self.backbone(i1, train=train)
        e2 = self.backbone(i2, train=train)
        e3 = self.backbone(i3, train=train)
        f12 = self.fc(jnp.concatenate([e1, e2], axis=-1))
        f23 = self.fc(jnp.concatenate([e2, e3], axis=-1))
        f13 = self.fc(jnp.concatenate([e1, e3], axis=-1))
        return jnp.concatenate([f12, f23, f13], axis=-1)

    def encode_single(self, i, train: bool = True):
        e = self.backbone(i, train=train)
        f = self.fc(jnp.concatenate([e, e], axis=-1))
        return jnp.concatenate([f, f, f], axis=-1)

    def forward_joint(self, tiles, train: bool = True):
        """Triplet forward with ONE batched backbone pass over the 3 views
        (tiles: (B, 3, H, W, C)).  ~2x faster fwd/bwd on TPU than three
        separate passes, at the cost of BatchNorm batch statistics being
        computed jointly across the 3 resolutions rather than per view (the
        reference computes per-view stats — models/net.py:50-53).  Eval-mode
        results are identical."""
        b = tiles.shape[0]
        flat = tiles.reshape((b * 3,) + tiles.shape[2:])
        e = self.backbone(flat, train=train)
        e = e.reshape(b, 3, -1)
        e1, e2, e3 = e[:, 0], e[:, 1], e[:, 2]
        f12 = self.fc(jnp.concatenate([e1, e2], axis=-1))
        f23 = self.fc(jnp.concatenate([e2, e3], axis=-1))
        f13 = self.fc(jnp.concatenate([e1, e3], axis=-1))
        return jnp.concatenate([f12, f23, f13], axis=-1)


# Alias kept for reference-API familiarity; use method="encode_single".
TripletNetFinetune = TripletNet


class Classifier(nn.Module):
    """Pretraining classifier head: in -> 128 -> num_classes."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(128, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)
        return x


class FinetuneHead(nn.Module):
    """Fine-tune head: single Linear 3*fc_out -> num_classes."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
