"""Model architecture tests: shapes, param counts vs torchvision, freezing
index map."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl_cr_histo_tpu.models import Classifier, FinetuneHead, TripletNet, feature_dim
from ssl_cr_histo_tpu.train.freeze import count_frozen, freeze_labels, torch_param_order


@pytest.fixture(scope="module")
def triplet18():
    model = TripletNet("resnet18")
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, x, x, train=False)
    return model, variables


def test_triplet_feature_shapes(triplet18):
    model, variables = triplet18
    x = jnp.ones((2, 64, 64, 3))
    feats = model.apply(variables, x, x, x, train=False)
    assert feats.shape == (2, 768)
    single = model.apply(variables, x, train=False, method=model.encode_single)
    assert single.shape == (2, 768)
    # encode_single == __call__ with identical inputs (deterministic BN eval)
    np.testing.assert_allclose(np.asarray(single), np.asarray(feats), atol=1e-5)


def test_backbone_param_count_matches_torchvision(triplet18):
    _, variables = triplet18
    bb = variables["params"]["backbone"]
    n_tensors = len(jax.tree_util.tree_leaves(bb))
    assert n_tensors == 60  # torchvision resnet18 sans fc: 60 param tensors
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(bb))
    # torchvision resnet18 param count minus fc (512*1000+1000) = 11,176,512
    assert n_params == 11_176_512


def test_fc_head_shapes(triplet18):
    _, variables = triplet18
    fc = variables["params"]["fc"]
    assert fc["fc1"]["kernel"].shape == (1024, 512)
    assert fc["fc2"]["kernel"].shape == (512, 256)


def test_heads():
    clf = Classifier(num_classes=6)
    v = clf.init(jax.random.PRNGKey(0), jnp.zeros((1, 768)))
    out = clf.apply(v, jnp.ones((4, 768)))
    assert out.shape == (4, 6)
    head = FinetuneHead(num_classes=9)
    v = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 768)))
    assert head.apply(v, jnp.ones((4, 768))).shape == (4, 9)
    assert feature_dim("resnet18") == 768
    assert feature_dim("resnet50") == 1536


def test_torch_param_order_matches_tree(triplet18):
    _, variables = triplet18
    order = torch_param_order("resnet18")
    assert len(order) == 64  # 60 backbone + 4 pairwise-fc tensors
    model_params = variables["params"]
    for path in order:
        node = model_params
        for k in path:
            assert k in node, f"missing {path}"
            node = node[k]
        assert hasattr(node, "shape")


def test_freeze_operating_points(triplet18):
    _, variables = triplet18
    params = {"model": variables["params"], "head": {"fc": {"kernel": jnp.zeros((768, 2))}}}
    # modules=60 freezes exactly the 60 backbone tensors
    assert count_frozen(params, 60) == 60
    assert count_frozen(params, 64) == 64
    assert count_frozen(params, 0) == 0
    labels = freeze_labels(params, 60)
    # head stays trainable
    assert labels["head"]["fc"]["kernel"] == "train"
    # pairwise fc stays trainable at modules=60
    assert labels["model"]["fc"]["fc1"]["kernel"] == "train"
    assert labels["model"]["backbone"]["conv1"]["kernel"] == "freeze"


def test_resnet50_variant():
    model = TripletNet("resnet50")
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, x, x, train=False)
    feats = model.apply(variables, x, x, x, train=False)
    assert feats.shape == (1, 1536)
    order = torch_param_order("resnet50")
    n_bb = len(jax.tree_util.tree_leaves(variables["params"]["backbone"]))
    assert len(order) == n_bb + 4


def test_remat_param_and_grad_equivalence():
    """remat=True must keep the exact param tree (checkpoint compatible)
    and produce the same loss/gradients as the plain backbone."""
    import jax
    import jax.numpy as jnp

    from ssl_cr_histo_tpu.models import TripletNet

    x = jnp.asarray(
        (np.random.default_rng(0).random((2, 32, 32, 3)) * 255).astype(np.float32) / 255.0
    )
    key = jax.random.PRNGKey(0)
    plain = TripletNet("resnet18")
    remat = TripletNet("resnet18", remat=True)
    v_p = plain.init(key, x, x, x, train=False)
    v_r = remat.init(key, x, x, x, train=False)
    assert jax.tree_util.tree_structure(v_p) == jax.tree_util.tree_structure(v_r)

    def loss(variables, model):
        out, mut = model.apply(
            variables, x, train=True, method=model.encode_single,
            mutable=["batch_stats"],
        )
        return jnp.sum(out**2)

    l_p, g_p = jax.value_and_grad(loss)(v_p, plain)
    l_r, g_r = jax.value_and_grad(loss)(v_r, remat)
    np.testing.assert_allclose(float(l_p), float(l_r), rtol=1e-6)
    gp = g_p["params"]["backbone"]["conv1"]["kernel"]
    gr = g_r["params"]["backbone"]["conv1"]["kernel"]
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=1e-5)
