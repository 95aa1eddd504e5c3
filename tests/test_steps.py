"""Train-step tests: loss decreases, freezing holds, consistency mechanics,
and 8-device data-parallel equivalence on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl_cr_histo_tpu.models import Classifier, FinetuneHead, TripletNet
from ssl_cr_histo_tpu.parallel import make_mesh, shard_batch
from ssl_cr_histo_tpu.parallel import steps as S
from ssl_cr_histo_tpu.train import optim
from ssl_cr_histo_tpu.train.freeze import masked_optimizer
from ssl_cr_histo_tpu.train.init import init_triplet_state, load_backbone

IMG = 32


@pytest.fixture(scope="module")
def toy_batch():
    rng = np.random.default_rng(0)
    tiles = (rng.random((8, 3, IMG, IMG, 3)) * 255).astype(np.uint8)
    return tiles


def test_permute_triplets():
    tiles = jnp.arange(2 * 3).reshape(2, 3, 1, 1, 1).astype(jnp.float32)
    tiles = jnp.tile(tiles, (1, 1, 2, 2, 3))
    out = S.permute_triplets(tiles, jnp.array([0, 5]))
    np.testing.assert_allclose(np.asarray(out[0, :, 0, 0, 0]), [0, 1, 2])
    np.testing.assert_allclose(np.asarray(out[1, :, 0, 0, 0]), [5, 4, 3])


def test_pretrain_step_loss_decreases(toy_batch):
    model = TripletNet("resnet18")
    clf = Classifier(num_classes=6)
    tx = optim.adam(1e-3)
    state = init_triplet_state(model, clf, tx, jax.random.PRNGKey(0), image_size=IMG)
    step = S.make_pretrain_step(model, clf, tx, augment=None)
    losses = []
    for i in range(8):
        # fixed key -> fixed permutation labels: the model can overfit
        state, metrics = step(state, jnp.asarray(toy_batch), jax.random.PRNGKey(7))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_pretrain_step_with_augment_runs(toy_batch):
    model = TripletNet("resnet18")
    clf = Classifier(num_classes=6)
    tx = optim.sgd_nesterov(0.01)
    state = init_triplet_state(model, clf, tx, jax.random.PRNGKey(0), image_size=IMG)
    step = S.make_pretrain_step(model, clf, tx, augment="v1")
    state, metrics = step(state, jnp.asarray(toy_batch), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_pretrain_eval_x6_semantics(toy_batch):
    """Validation evaluates every triplet under all 6 orderings (count = 6x
    valid rows) and is invariant to the padded rows' contents."""
    model = TripletNet("resnet18")
    clf = Classifier(num_classes=6)
    tx = optim.adam(1e-3)
    state = init_triplet_state(model, clf, tx, jax.random.PRNGKey(0), image_size=IMG)
    step = S.make_pretrain_eval_step(model, clf, return_feats=True)

    tiles = jnp.asarray(toy_batch[:4])
    valid = jnp.array([1.0, 1.0, 1.0, 0.0])
    m = step(state, tiles, valid)
    assert float(m["count"]) == 6 * 3
    assert np.isfinite(float(m["loss_sum"]))
    assert m["feats"].shape == (6, 4, 768)
    # the default (per-epoch val loop) variant omits the t-SNE features
    m_light = S.make_pretrain_eval_step(model, clf)(state, tiles, valid)
    assert "feats" not in m_light
    np.testing.assert_allclose(float(m_light["loss_sum"]), float(m["loss_sum"]),
                               rtol=1e-5)

    # padding-invariance: garbage in the masked row must not change the sums
    tiles_g = tiles.at[3].set(255)
    m2 = step(state, tiles_g, valid)
    np.testing.assert_allclose(float(m["loss_sum"]), float(m2["loss_sum"]), rtol=1e-5)
    np.testing.assert_allclose(float(m["correct"]), float(m2["correct"]))


def test_finetune_freezing_holds(toy_batch):
    model = TripletNet("resnet18")
    head = FinetuneHead(num_classes=9)
    base_tx = optim.adam(1e-3)
    key = jax.random.PRNGKey(0)
    tmp = init_triplet_state(model, head, base_tx, key, image_size=IMG, triplet=False)
    tx = masked_optimizer(base_tx, tmp.params, modules=60)
    state = tmp.replace(opt_state=tx.init(tmp.params))
    step = S.make_finetune_step(model, head, tx, task="classification")
    imgs = jnp.asarray(toy_batch[:, 0])
    labels = jnp.arange(8) % 9
    before = jax.tree_util.tree_map(np.asarray, state.params)
    state, metrics = step(state, imgs, labels, jax.random.PRNGKey(1))
    after = state.params
    # frozen: backbone unchanged
    np.testing.assert_array_equal(
        before["model"]["backbone"]["conv1"]["kernel"],
        np.asarray(after["model"]["backbone"]["conv1"]["kernel"]),
    )
    # trainable: head changed
    assert np.abs(
        before["head"]["fc"]["kernel"] - np.asarray(after["head"]["fc"]["kernel"])
    ).max() > 0


def test_finetune_regression(toy_batch):
    model = TripletNet("resnet18")
    head = FinetuneHead(num_classes=1)
    tx = optim.adam(1e-4)
    state = init_triplet_state(model, head, tx, jax.random.PRNGKey(0), image_size=IMG, triplet=False)
    step = S.make_finetune_step(model, head, tx, task="regression", three_view=False)
    labels = jnp.linspace(0, 1, 8)
    losses = []
    for i in range(10):
        state, m = step(state, jnp.asarray(toy_batch[:, 0]), labels, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[-3:]) < losses[0]


def test_grouped_concat_split_equivalence():
    """grouped_concat/grouped_split with any group count are a pure batch
    permutation + its inverse: splitting returns the original arrays, and
    sums over the concat match the plain concat."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((12, 5)))
    b = jnp.asarray(rng.random((8, 5)))
    plain = jnp.concatenate([a, b], axis=0)
    for groups in (1, 2, 4):
        cat = S.grouped_concat([a, b], groups)
        assert cat.shape == plain.shape
        np.testing.assert_allclose(np.sort(np.asarray(cat), 0), np.sort(np.asarray(plain), 0))
        a2, b2 = S.grouped_split(cat, a.shape[0], groups)
        np.testing.assert_array_equal(np.asarray(a2), np.asarray(a))
        np.testing.assert_array_equal(np.asarray(b2), np.asarray(b))


def test_expand_labeled_batch_contract(toy_batch):
    """The CR labeled branch must be 3 augmented views per sample with the
    label repeated (reference eval_Kather_SSL_CR.py:70-79), matching
    augment_3view_batch's output order."""
    from ssl_cr_histo_tpu.ops import batch as aug_batch

    x = jnp.asarray(toy_batch[:4, 0])
    y = jnp.arange(4) % 9
    key = jax.random.PRNGKey(7)
    imgs, labels = S.expand_labeled_batch(key, x, y, views=3)
    assert imgs.shape == (12, IMG, IMG, 3)
    np.testing.assert_array_equal(np.asarray(labels), np.repeat(np.arange(4) % 9, 3))
    expected = aug_batch.augment_3view_batch(key, x).reshape(12, IMG, IMG, 3)
    np.testing.assert_allclose(np.asarray(imgs), np.asarray(expected))
    # views=1: raw float images, labels untouched
    imgs1, labels1 = S.expand_labeled_batch(key, x, y, views=1)
    np.testing.assert_allclose(np.asarray(imgs1), np.asarray(x, dtype=np.float32) / 255.0)
    np.testing.assert_array_equal(np.asarray(labels1), np.asarray(y))


def test_consistency_grouped_equals_plain(toy_batch):
    """One consistency step with data_groups=4 must produce the same loss and
    params as data_groups=1 (the grouped concat is order-only)."""
    model = TripletNet("resnet18")
    head = FinetuneHead(num_classes=9)
    # SGD: param delta is proportional to the gradient, so the comparison is
    # not distorted by Adam's per-element normalization of float-reordering
    # noise in near-zero gradient entries.
    tx = optim.sgd_nesterov(0.01)
    state = init_triplet_state(model, head, tx, jax.random.PRNGKey(0), image_size=IMG, triplet=False)
    t_params, t_stats = S.refresh_teacher(state)
    x_l = jnp.asarray(toy_batch[:4, 0])
    y_l = jnp.arange(4) % 9
    x_u = jnp.asarray(toy_batch[:, 0])
    outs = []
    for groups in (1, 4):
        step = S.make_consistency_step(
            model, head, tx, task="classification", n_aug=2, data_groups=groups,
            donate=False,  # `state` is reused across the two group settings
        )
        s, m = step(state, t_params, t_stats, x_l, y_l, x_u, jax.random.PRNGKey(0))
        outs.append((float(m["loss"]), np.asarray(s.params["head"]["fc"]["kernel"])))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-5)


def test_consistency_step_and_teacher_refresh(toy_batch):
    model = TripletNet("resnet18")
    head = FinetuneHead(num_classes=9)
    tx = optim.adam(1e-3)
    state = init_triplet_state(model, head, tx, jax.random.PRNGKey(0), image_size=IMG, triplet=False)
    t_params, t_stats = S.refresh_teacher(state)
    step = S.make_consistency_step(model, head, tx, task="classification", n_aug=2)
    x_l = jnp.asarray(toy_batch[:4, 0])
    y_l = jnp.arange(4) % 9
    x_u = jnp.asarray(toy_batch[:, 0])
    state, m = step(state, t_params, t_stats, x_l, y_l, x_u, jax.random.PRNGKey(0))
    for k in ("loss", "sup", "cons"):
        assert np.isfinite(float(m[k]))
    # teacher unchanged by the student update
    np.testing.assert_array_equal(
        np.asarray(t_params["head"]["fc"]["kernel"]),
        np.asarray(S.refresh_teacher(state.replace(params=t_params))[0]["head"]["fc"]["kernel"]),
    )
    # refresh copies the student
    t2, _ = S.refresh_teacher(state)
    np.testing.assert_array_equal(
        np.asarray(t2["head"]["fc"]["kernel"]),
        np.asarray(state.params["head"]["fc"]["kernel"]),
    )


def test_consistency_regression_variant(toy_batch):
    model = TripletNet("resnet18")
    head = FinetuneHead(num_classes=1)
    tx = optim.adam(1e-3)
    state = init_triplet_state(model, head, tx, jax.random.PRNGKey(0), image_size=IMG, triplet=False)
    t_params, t_stats = S.refresh_teacher(state)
    step = S.make_consistency_step(model, head, tx, task="regression", n_aug=2)
    state, m = step(
        state, t_params, t_stats,
        jnp.asarray(toy_batch[:4, 0]), jnp.linspace(0, 1, 4),
        jnp.asarray(toy_batch[:, 0]), jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(m["loss"]))


def test_load_backbone_handoff():
    model = TripletNet("resnet18")
    clf = Classifier(num_classes=6)
    head = FinetuneHead(num_classes=9)
    tx = optim.adam(1e-3)
    s1 = init_triplet_state(model, clf, tx, jax.random.PRNGKey(0), image_size=IMG)
    s2 = init_triplet_state(model, head, tx, jax.random.PRNGKey(1), image_size=IMG, triplet=False)
    s2b = load_backbone(s2, s1.params["model"], s1.batch_stats)
    np.testing.assert_array_equal(
        np.asarray(s2b.params["model"]["backbone"]["conv1"]["kernel"]),
        np.asarray(s1.params["model"]["backbone"]["conv1"]["kernel"]),
    )
    # head kept from stage-2 init
    assert s2b.params["head"]["fc"]["kernel"].shape == (768, 9)


def test_data_parallel_equivalence(toy_batch):
    """The same pretrain step on a sharded 8-device batch must match the
    single-device result (data-parallel determinism)."""
    model = TripletNet("resnet18")
    clf = Classifier(num_classes=6)
    tx = optim.adam(1e-3)
    state = init_triplet_state(model, clf, tx, jax.random.PRNGKey(0), image_size=IMG)
    # donate=False: the same initial state feeds both the 1- and 8-device runs
    step = S.make_pretrain_step(model, clf, tx, augment=None, donate=False)
    tiles = jnp.asarray(toy_batch)
    key = jax.random.PRNGKey(3)

    # single device
    s1, m1 = step(state, tiles, key)

    # 8-device mesh with the batch sharded over `data`
    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded = shard_batch(mesh, tiles)
    s8, m8 = step(state, sharded, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.params["head"]["fc2"]["kernel"]),
        np.asarray(s8.params["head"]["fc2"]["kernel"]),
        atol=1e-5,
    )


def test_joint_encode_eval_equivalence(toy_batch):
    """forward_joint == separate triple forward in eval mode (identical BN
    running stats)."""
    model = TripletNet("resnet18")
    tiles = jnp.asarray(toy_batch[:2].astype(np.float32) / 255.0)
    variables = model.init(
        jax.random.PRNGKey(0), tiles[:, 0], tiles[:, 1], tiles[:, 2], train=False
    )
    sep = model.apply(variables, tiles[:, 0], tiles[:, 1], tiles[:, 2], train=False)
    joint = model.apply(variables, tiles, train=False, method=model.forward_joint)
    np.testing.assert_allclose(np.asarray(sep), np.asarray(joint), atol=1e-5)


def test_pretrain_step_joint_encode_runs(toy_batch):
    model = TripletNet("resnet18")
    clf = Classifier(num_classes=6)
    tx = optim.adam(1e-3)
    state = init_triplet_state(model, clf, tx, jax.random.PRNGKey(0), image_size=IMG)
    step = S.make_pretrain_step(model, clf, tx, augment=None, joint_encode=True)
    state, m = step(state, jnp.asarray(toy_batch), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_multi_step_matches_sequential_single_steps(toy_batch):
    """K scanned steps == K sequential single steps (same body, same keys),
    and a padded invalid step leaves the state untouched."""
    model = TripletNet("resnet18")
    clf = Classifier(num_classes=6)
    tx = optim.sgd_nesterov(0.01)
    state0 = init_triplet_state(model, clf, tx, jax.random.PRNGKey(0), image_size=IMG)

    k = 3
    tiles_k = jnp.stack([jnp.asarray(toy_batch)] * k)
    key = jax.random.PRNGKey(5)
    multi = S.make_pretrain_multi_step(model, clf, tx, augment=None, donate=False)
    m_state, ms = multi(state0, tiles_k, key, jnp.ones((k,)))
    assert ms["loss"].shape == (k,)

    step = S.make_pretrain_step(model, clf, tx, augment=None, donate=False)
    s_state = state0
    for i, ki in enumerate(jax.random.split(key, k)):
        s_state, m = step(s_state, tiles_k[i], ki)
        np.testing.assert_allclose(float(ms["loss"][i]), float(m["loss"]), rtol=1e-4)
    # The per-step losses above are the tight contract; raw params drift a
    # few 1e-4 after 3 steps because BN's rsqrt(var) amplifies the different
    # (but individually valid) f32 reduction orders XLA picks inside vs
    # outside the scan.
    np.testing.assert_allclose(
        np.asarray(m_state.params["model"]["backbone"]["conv1"]["kernel"]),
        np.asarray(s_state.params["model"]["backbone"]["conv1"]["kernel"]),
        atol=2e-3,
    )
    assert int(m_state.step) == int(s_state.step) == k

    # invalid trailing step: state must pass through unchanged
    valid = jnp.array([1.0, 1.0, 0.0])
    p_state, _ = multi(state0, tiles_k, key, valid)
    assert int(p_state.step) == 2


def test_chunk_batches_stacks_and_pads():
    from ssl_cr_histo_tpu.data.pipeline import chunk_batches

    batches = [(np.full((4, 2), i, np.uint8),) for i in range(5)]
    chunks = list(chunk_batches(iter(batches), 2))
    assert len(chunks) == 3
    (stacked, valid) = chunks[0]
    assert stacked.shape == (2, 4, 2) and valid.tolist() == [1.0, 1.0]
    (last, valid_last) = chunks[2]
    assert valid_last.tolist() == [1.0, 0.0]
    assert (last[0] == 4).all() and (last[1] == 0).all()


def test_finetune_multi_step_matches_sequential(toy_batch):
    """K scanned finetune steps == K sequential single steps (same keys),
    and an invalid trailing step leaves the state untouched."""
    model = TripletNet("resnet18")
    head = FinetuneHead(num_classes=9)
    tx = optim.sgd_nesterov(0.01)
    state0 = init_triplet_state(
        model, head, tx, jax.random.PRNGKey(0), image_size=IMG, triplet=False
    )
    k = 2
    imgs_k = jnp.stack([jnp.asarray(toy_batch[:, 0])] * k)
    labs_k = jnp.stack([jnp.arange(8) % 9] * k)
    key = jax.random.PRNGKey(11)

    multi = S.make_finetune_step(
        model, head, tx, task="classification", donate=False, multi=True
    )
    m_state, ms = multi(state0, imgs_k, labs_k, key, jnp.ones((k,)))
    assert ms["loss"].shape == (k,)

    step = S.make_finetune_step(model, head, tx, task="classification", donate=False)
    s_state = state0
    for i, ki in enumerate(jax.random.split(key, k)):
        s_state, m = step(s_state, imgs_k[i], labs_k[i], ki)
        np.testing.assert_allclose(float(ms["loss"][i]), float(m["loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(m_state.params["head"]["fc"]["kernel"]),
        np.asarray(s_state.params["head"]["fc"]["kernel"]),
        atol=2e-3,
    )
    assert int(m_state.step) == int(s_state.step) == k

    p_state, _ = multi(state0, imgs_k, labs_k, key, jnp.array([1.0, 0.0]))
    assert int(p_state.step) == 1


def test_consistency_multi_step_matches_sequential(toy_batch):
    """K scanned consistency steps == K sequential steps, including the
    per-step EMA teacher riding the scan carry."""
    model = TripletNet("resnet18")
    head = FinetuneHead(num_classes=9)
    tx = optim.sgd_nesterov(0.01)
    state0 = init_triplet_state(
        model, head, tx, jax.random.PRNGKey(0), image_size=IMG, triplet=False
    )
    t_params0, t_stats0 = S.refresh_teacher(state0)
    k = 2
    ema = 0.9
    xl_k = jnp.stack([jnp.asarray(toy_batch[:4, 0])] * k)
    yl_k = jnp.stack([jnp.arange(4) % 9] * k)
    xu_k = jnp.stack([jnp.asarray(toy_batch[:, 0])] * k)
    key = jax.random.PRNGKey(13)

    multi = S.make_consistency_step(
        model, head, tx, task="classification", n_aug=2,
        donate=False, multi=True, ema=ema,
    )
    m_state, m_tp, m_ts, ms = multi(
        state0, t_params0, t_stats0, xl_k, yl_k, xu_k, key, jnp.ones((k,))
    )
    assert ms["loss"].shape == (k,)

    step = S.make_consistency_step(
        model, head, tx, task="classification", n_aug=2, donate=False
    )
    s_state, tp, ts = state0, t_params0, t_stats0
    for i, ki in enumerate(jax.random.split(key, k)):
        s_state, m = step(s_state, tp, ts, xl_k[i], yl_k[i], xu_k[i], ki)
        np.testing.assert_allclose(float(ms["loss"][i]), float(m["loss"]), rtol=1e-4)
        tp = S.ema_update(tp, s_state.params, ema)
        ts = S.ema_update(ts, s_state.batch_stats, ema)
    np.testing.assert_allclose(
        np.asarray(m_state.params["head"]["fc"]["kernel"]),
        np.asarray(s_state.params["head"]["fc"]["kernel"]),
        atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(m_tp["head"]["fc"]["kernel"]),
        np.asarray(tp["head"]["fc"]["kernel"]),
        atol=2e-3,
    )

    # ema=0 variant: the teacher must come back exactly unchanged
    multi0 = S.make_consistency_step(
        model, head, tx, task="classification", n_aug=2, donate=False, multi=True,
    )
    _, tp0, ts0, _ = multi0(
        state0, t_params0, t_stats0, xl_k, yl_k, xu_k, key, jnp.ones((k,))
    )
    np.testing.assert_array_equal(
        np.asarray(tp0["head"]["fc"]["kernel"]),
        np.asarray(t_params0["head"]["fc"]["kernel"]),
    )

    # invalid trailing step: state and teacher pass through
    p_state, p_tp, _, _ = multi(
        state0, t_params0, t_stats0, xl_k, yl_k, xu_k, key, jnp.array([1.0, 0.0])
    )
    assert int(p_state.step) == 1


def test_pretrain_step_explicit_orderings(toy_batch):
    """Explicit labels (--expand_orderings) bypass the on-device ordering
    sampling: the step is deterministic in the labels — different RNG keys
    give identical loss with augment=None — and metrics echo the labels
    when return_feats is on."""
    model = TripletNet("resnet18")
    clf = Classifier(num_classes=6)
    tx = optim.adam(1e-3)
    state = init_triplet_state(model, clf, tx, jax.random.PRNGKey(0), image_size=IMG)
    step = S.make_pretrain_step(model, clf, tx, augment=None, donate=False,
                                return_feats=True)
    labels = jnp.array([0, 1, 2, 3, 4, 5, 0, 1], jnp.int32)
    _, m1 = step(state, jnp.asarray(toy_batch), jax.random.PRNGKey(1), labels)
    _, m2 = step(state, jnp.asarray(toy_batch), jax.random.PRNGKey(2), labels)
    assert float(m1["loss"]) == float(m2["loss"])
    np.testing.assert_array_equal(np.asarray(m1["labels"]), np.asarray(labels))
    assert m1["feats"].shape[0] == len(labels) and m1["feats"].ndim == 2


def test_pretrain_multi_step_explicit_orderings(toy_batch):
    """Multi-step scan with host-enumerated orderings matches running the
    single steps sequentially."""
    model = TripletNet("resnet18")
    clf = Classifier(num_classes=6)
    tx = optim.adam(1e-3)
    state = init_triplet_state(model, clf, tx, jax.random.PRNGKey(0), image_size=IMG)
    single = S.make_pretrain_step(model, clf, tx, augment=None, donate=False)
    multi = S.make_pretrain_multi_step(model, clf, tx, augment=None, donate=False)

    k = 3
    tiles_k = jnp.asarray(np.stack([toy_batch] * k))
    labels_k = jnp.asarray(
        np.random.default_rng(0).integers(0, 6, (k, len(toy_batch))).astype(np.int32)
    )
    key = jax.random.PRNGKey(5)
    st_m, ms = multi(state, tiles_k, key, jnp.ones(k), labels_k)

    st_s = state
    keys = jax.random.split(key, k)
    for i in range(k):
        st_s, m = single(st_s, tiles_k[i], keys[i], labels_k[i])
        # same tolerance rationale as test_multi_step_matches_sequential:
        # BN rsqrt amplifies XLA's different f32 reduction orders in/out of
        # the scan
        np.testing.assert_allclose(
            float(ms["loss"][i]), float(m["loss"]), rtol=1e-3
        )
    np.testing.assert_allclose(
        np.asarray(st_m.params["head"]["fc1"]["kernel"]),
        np.asarray(st_s.params["head"]["fc1"]["kernel"]),
        atol=2e-3,
    )
