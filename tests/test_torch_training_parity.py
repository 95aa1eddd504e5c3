"""Training-dynamics parity vs REAL torch (torch is installed in this image).

The forward pass is already proven equal to the torch oracle
(tests/test_checkpoint.py::test_torch_import_forward_parity, 2e-3).  This
module extends parity to the *training* dynamics — the strongest quality
evidence obtainable without the real datasets:

  1. Optimizer math in isolation: optax ``sgd_nesterov``/``adam`` trajectories
     against torch.optim on hand-fed identical gradients (exact, 1e-6), and
     the per-step ``lookahead`` transform against a faithful torch Lookahead
     oracle (reference models/optimiser/RAdam/lookahead.py:81-106).
  2. One fine-tune step (reference eval_BreastPathQ_SSL.py:35-103 /
     eval_Camelyon_SSL.py SGD config): identical imported weights, identical
     batch, f32, no aug — loss, per-tensor gradients, and post-step params
     match torch SGD-Nesterov(+L2) and Adam.
  3. The triple-encode equivalence: the reference TripletNet_Finetune
     encodes the SAME image 3x (models/net.py:86-103); our ``encode_single``
     encodes once.  Verified IN TORCH that loss and gradients are identical
     in train mode (BN batch stats included), so the deviation is sound at
     the gradient level, not just the forward.
  4. One RSP pretrain step (reference pretrain_BreastPathQ.py:27-92):
     loss/grads/params plus BN running stats.  torch updates running_var
     with the UNBIASED batch variance (factor n/(n-1), n = B*H*W per layer)
     while flax uses the biased one; the comparison removes this analytically
     (linearity of the EMA) instead of hiding it in tolerance.
  5. A 60-step no-aug pretrain trajectory, same data order, torch loop vs
     JAX loop — including the reference's per-"epoch" Lookahead sync
     (pretrain_BreastPathQ.py:247,293, minus the stale-grad defect) — with
     loss curves tracking, final params close, and BN running stats agreeing.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax
from torch_oracle import (
    LookaheadOracle,
    TorchClassifier,
    TorchFinetuneHead,
    TorchTripletNet,
)

from ssl_cr_histo_tpu.models import Classifier, FinetuneHead, TripletNet
from ssl_cr_histo_tpu.ops import batch as aug_batch
from ssl_cr_histo_tpu.parallel.steps import (
    RSP_PERMUTATIONS,
    make_finetune_step,
    make_pretrain_step,
)
from ssl_cr_histo_tpu.train import optim
from ssl_cr_histo_tpu.train.checkpoint import (
    export_torch_state_dict,
    load_torch_linear_head,
    load_torch_triplet_checkpoint,
)
from ssl_cr_histo_tpu.train.init import init_triplet_state

IMG = 32  # layer4 feature map is 1x1 at 32^2 — the harshest BN-stat case


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _to_nchw(x_u8: np.ndarray) -> torch.Tensor:
    """uint8 NHWC -> torch float NCHW in [0,1] (DEFAULT_MEAN/STD are 0/1, so
    normalize_batch is the identity after /255 — ops/batch.py)."""
    return torch.from_numpy(x_u8.astype(np.float32) / 255.0).permute(0, 3, 1, 2)


def _torch_grads(named_params) -> dict:
    return {k: p.grad.detach().numpy().copy() for k, p in named_params if p.grad is not None}


def _flax_model_sd(model_params, batch_stats=None) -> dict:
    """flax {'backbone','fc'} tree -> torch-named numpy dict (model.* / fc.*)."""
    sd = export_torch_state_dict(model_params, batch_stats or {})
    return {k: np.asarray(v) for k, v in sd.items() if "num_batches_tracked" not in k}


def _assert_sd_close(got: dict, want: dict, rtol, atol, label=""):
    assert set(want).issubset(set(got)), sorted(set(want) - set(got))
    for k in sorted(want):
        np.testing.assert_allclose(
            got[k], want[k], rtol=rtol, atol=atol, err_msg=f"{label}{k}"
        )


def _head_sd_from_flax(head_params: dict) -> dict:
    """flax Classifier/FinetuneHead params -> reference 'classifier.{i}.*'."""
    idx = {"fc": 0, "fc1": 0, "fc2": 2}
    out = {}
    for name, leaf in head_params.items():
        out[f"classifier.{idx[name]}.weight"] = np.asarray(leaf["kernel"]).T
        out[f"classifier.{idx[name]}.bias"] = np.asarray(leaf["bias"])
    return out


def _bn_counts(net: tnn.Module, forward) -> dict:
    """n = B*H*W seen by each BatchNorm2d (for torch's unbiased running_var
    correction n/(n-1)); keys are state_dict prefixes."""
    counts, hooks = {}, []
    for name, m in net.named_modules():
        if isinstance(m, tnn.BatchNorm2d):
            def hook(mod, inp, out, name=name):
                x = inp[0]
                counts[name] = int(x.shape[0] * x.shape[2] * x.shape[3])
            hooks.append(m.register_forward_hook(hook))
    with torch.no_grad():
        forward()
    for h in hooks:
        h.remove()
    return counts


def _assert_bn_stats_match(torch_sd, flax_stats_sd, rv0_sd, counts, n_updates,
                           rtol, atol):
    """running_mean compares directly; running_var after removing torch's
    unbiased n/(n-1) factor: with identical per-update batch variances v_i,
      torch_rv = 0.9^U rv0 + c * sum_i w_i v_i,   flax_rv = 0.9^U rv0 + sum_i w_i v_i
    (c = n/(n-1)), so (torch_rv - 0.9^U rv0) == c * (flax_rv - 0.9^U rv0)."""
    decay = 0.9 ** n_updates
    for key, want in torch_sd.items():
        if key.endswith("running_mean"):
            np.testing.assert_allclose(
                flax_stats_sd[key], want, rtol=rtol, atol=atol, err_msg=key
            )
        elif key.endswith("running_var"):
            mod = key[: -len(".running_var")]
            c = counts[mod] / (counts[mod] - 1)
            base = decay * rv0_sd[key]
            np.testing.assert_allclose(
                c * (flax_stats_sd[key] - base), want - base,
                rtol=rtol, atol=atol, err_msg=key,
            )


# ---------------------------------------------------------------------------
# 1. optimizer math in isolation (exact trajectories on identical grads)
# ---------------------------------------------------------------------------


def _run_optimizer_pair(torch_opt_fn, optax_tx, steps=10, shape=(7, 5)):
    """Apply the SAME deterministic gradient sequence through torch and optax;
    return (torch_params, optax_params) trajectories."""
    rng = np.random.default_rng(0)
    init = rng.normal(size=shape).astype(np.float32)
    grads = [rng.normal(size=shape).astype(np.float32) * 10.0 ** rng.uniform(-3, 1)
             for _ in range(steps)]

    tp = torch.nn.Parameter(torch.from_numpy(init.copy()))
    topt = torch_opt_fn([tp])
    t_traj = []
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        topt.step()
        t_traj.append(tp.detach().numpy().copy())

    jp = jnp.asarray(init)
    st = optax_tx.init(jp)
    j_traj = []
    for g in grads:
        up, st = optax_tx.update(jnp.asarray(g), st, jp)
        jp = optax.apply_updates(jp, up)
        j_traj.append(np.asarray(jp))
    return t_traj, j_traj


def test_optax_sgd_nesterov_matches_torch_trajectory():
    """optim.sgd_nesterov == torch SGD(momentum=0.9, nesterov, weight_decay)
    step-for-step (reference eval_Camelyon_SSL.py SGD config)."""
    t_traj, j_traj = _run_optimizer_pair(
        lambda ps: torch.optim.SGD(ps, lr=5e-4, momentum=0.9, nesterov=True,
                                   weight_decay=1e-4),
        optim.sgd_nesterov(5e-4, momentum=0.9, weight_decay=1e-4),
    )
    for t, j in zip(t_traj, j_traj):
        np.testing.assert_allclose(j, t, rtol=1e-6, atol=1e-7)


def test_optax_adam_matches_torch_trajectory():
    """optim.adam == torch Adam (reference eval_BreastPathQ_SSL.py:396 Adam
    1e-4) step-for-step, including bias correction and eps placement."""
    t_traj, j_traj = _run_optimizer_pair(
        lambda ps: torch.optim.Adam(ps, lr=1e-4),
        optim.adam(1e-4),
    )
    for t, j in zip(t_traj, j_traj):
        np.testing.assert_allclose(j, t, rtol=1e-6, atol=1e-8)


def test_lookahead_transform_matches_torch_oracle():
    """optim.lookahead(sgd_nesterov) vs the torch Lookahead oracle
    (reference lookahead.py:81-106 update rule, pullback_momentum='none')
    across several sync boundaries (la_steps=5, la_alpha=0.5 — the
    pretrain config, pretrain_BreastPathQ.py:247)."""
    rng = np.random.default_rng(1)
    init = rng.normal(size=(6, 4)).astype(np.float32)
    grads = [rng.normal(size=(6, 4)).astype(np.float32) for _ in range(13)]

    tp = torch.nn.Parameter(torch.from_numpy(init.copy()))
    topt = LookaheadOracle(
        torch.optim.SGD([tp], lr=0.01, momentum=0.9, nesterov=True,
                        weight_decay=1e-4),
        la_steps=5, la_alpha=0.5,
    )
    jp = jnp.asarray(init)
    tx = optim.lookahead(optim.sgd_nesterov(0.01, momentum=0.9, weight_decay=1e-4),
                         sync_period=5, slow_step_size=0.5)
    st = tx.init(jp)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        topt.step()
        up, st = tx.update(jnp.asarray(g), st, jp)
        jp = optax.apply_updates(jp, up)
        np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                                   rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# matched model pairs (module fixtures)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def finetune_pair(tmp_path_factory):
    """Pristine matched weights (torch state_dicts + flax import via the
    validated converter) and a shared batch; each test builds FRESH torch
    modules from the saved state_dicts (torch training mutates modules
    in-place — BN stats, optimizer steps — so the originals must never be
    forwarded)."""
    torch.manual_seed(7)
    net = TorchTripletNet()
    head = TorchFinetuneHead(768, 2)
    path = tmp_path_factory.mktemp("pp") / "ckpt.pth"
    torch.save({"model": net.state_dict(), "classifier": head.state_dict()}, str(path))
    mparams, mstats = load_torch_triplet_checkpoint(str(path))
    hparams = load_torch_linear_head(str(path), "classifier")
    rng = np.random.default_rng(11)
    x_u8 = rng.integers(0, 256, (4, IMG, IMG, 3), dtype=np.uint8)
    y = rng.integers(0, 2, (4,)).astype(np.int32)

    def fresh():
        n, h = TorchTripletNet(), TorchFinetuneHead(768, 2)
        n.load_state_dict(net.state_dict())
        h.load_state_dict(head.state_dict())
        n.train(), h.train()
        return n, h

    return fresh, {"model": mparams, "head": hparams}, mstats, x_u8, y


def _torch_finetune_loss(net, head, x_u8, y):
    out = head(net.encode_single(_to_nchw(x_u8)))
    return F.cross_entropy(out, torch.from_numpy(np.asarray(y)).long())


def _flax_finetune_loss_fn(model, head):
    def loss_fn(params, batch_stats, images, labels):
        vs = {"params": params["model"], "batch_stats": batch_stats}
        feats, mutated = model.apply(vs, images, train=True,
                                     mutable=["batch_stats"],
                                     method=model.encode_single)
        out = head.apply({"params": params["head"]}, feats)
        loss = optax.softmax_cross_entropy_with_integer_labels(out, labels).mean()
        return loss, mutated["batch_stats"]
    return loss_fn


def test_finetune_step_loss_grads_params_sgd(finetune_pair):
    """One supervised fine-tune step, SGD-Nesterov(+L2): loss, per-tensor
    gradients, and post-step params all match torch (reference
    eval_Camelyon_SSL.py SGD 5e-4 config; step body
    parallel/steps.py make_finetune_step)."""
    fresh, params, stats, x_u8, y = finetune_pair
    net, thead = fresh()
    model = TripletNet("resnet18")
    head = FinetuneHead(num_classes=2)

    # torch side: loss + grads + one SGD step
    topt = torch.optim.SGD(list(net.parameters()) + list(thead.parameters()),
                           lr=5e-4, momentum=0.9, nesterov=True, weight_decay=1e-4)
    topt.zero_grad()
    tloss = _torch_finetune_loss(net, thead, x_u8, y)
    tloss.backward()
    tgrads = _torch_grads(list(net.named_parameters()))
    tgrads_head = _torch_grads(list(thead.named_parameters()))
    topt.step()

    # flax side: same loss fn as the step body, explicit grads
    images = aug_batch.normalize_batch(
        aug_batch.to_float(jnp.asarray(x_u8)), aug_batch.DEFAULT_MEAN, aug_batch.DEFAULT_STD
    )
    (jloss, _), grads = jax.value_and_grad(
        _flax_finetune_loss_fn(model, head), has_aux=True
    )(params, stats, images, jnp.asarray(y))
    np.testing.assert_allclose(float(jloss), float(tloss.detach()), rtol=2e-4, atol=2e-5)
    # conv1's weight grads sum over every spatial position; f32 backward
    # accumulation noise reaches ~3e-4 absolute there (values are O(1))
    _assert_sd_close(_flax_model_sd(grads["model"]), tgrads,
                     rtol=2e-3, atol=5e-4, label="grad ")
    _assert_sd_close(_head_sd_from_flax(grads["head"]), tgrads_head,
                     rtol=2e-3, atol=5e-4, label="head grad ")

    # post-step params through the ACTUAL shipped step
    tx = optim.sgd_nesterov(5e-4, momentum=0.9, weight_decay=1e-4)
    state = init_triplet_state(TripletNet("resnet18"), head, tx,
                               jax.random.PRNGKey(0), image_size=IMG, triplet=False)
    state = state.replace(params=params, batch_stats=stats, opt_state=tx.init(params))
    step = make_finetune_step(model, head, tx, task="classification",
                              three_view=False, donate=False)
    state, metrics = step(state, jnp.asarray(x_u8), jnp.asarray(y), jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["loss"]), float(tloss.detach()), rtol=2e-4, atol=2e-5)
    _assert_sd_close(
        _flax_model_sd(state.params["model"]),
        {k: v.detach().numpy() for k, v in net.state_dict().items()
         if "running_" not in k and "num_batches" not in k},
        rtol=1e-4, atol=2e-6, label="post-step ",
    )
    _assert_sd_close(
        _head_sd_from_flax(state.params["head"]),
        {k: v.detach().numpy() for k, v in thead.state_dict().items()},
        rtol=1e-4, atol=2e-6, label="post-step head ",
    )


def test_finetune_step_adam_post_params(finetune_pair):
    """Same batch under Adam 1e-4 (reference eval_BreastPathQ_SSL.py:396).
    First-step Adam updates are ~lr*sign(g), so tensors whose gradients sit
    at f32 conv noise can flip sign — post-step params are asserted within
    2.5*lr absolute (optimizer-math exactness is pinned separately by
    test_optax_adam_matches_torch_trajectory)."""
    fresh, params, stats, x_u8, y = finetune_pair
    net2, head2 = fresh()
    topt = torch.optim.Adam(list(net2.parameters()) + list(head2.parameters()), lr=1e-4)
    topt.zero_grad()
    tloss = _torch_finetune_loss(net2, head2, x_u8, y)
    tloss.backward()
    topt.step()

    model = TripletNet("resnet18")
    head = FinetuneHead(num_classes=2)
    tx = optim.adam(1e-4)
    state = init_triplet_state(TripletNet("resnet18"), head, tx,
                               jax.random.PRNGKey(0), image_size=IMG, triplet=False)
    state = state.replace(params=params, batch_stats=stats, opt_state=tx.init(params))
    step = make_finetune_step(model, head, tx, task="classification",
                              three_view=False, donate=False)
    state, metrics = step(state, jnp.asarray(x_u8), jnp.asarray(y), jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["loss"]), float(tloss.detach()), rtol=2e-4, atol=2e-5)
    _assert_sd_close(
        _flax_model_sd(state.params["model"]),
        {k: v.detach().numpy() for k, v in net2.state_dict().items()
         if "running_" not in k and "num_batches" not in k},
        rtol=0.0, atol=2.5e-4, label="adam post-step ",
    )


def test_reference_3x_encode_equivalence(finetune_pair):
    """IN TORCH, train mode: the reference TripletNet_Finetune forward (same
    image through the backbone 3x, models/net.py:86-103) and the
    encode-once-and-tile forward produce identical loss AND identical
    gradients — proving our encode_single deviation is gradient-exact, with
    only the BN running-stat update COUNT differing (3 vs 1, same values)."""
    fresh, _, _, x_u8, y = finetune_pair
    rm0 = {k: v.numpy().copy() for k, v in fresh()[0].state_dict().items()
           if "running_mean" in k}

    def run(fwd):
        n, h = fresh()
        loss = F.cross_entropy(h(fwd(n, _to_nchw(x_u8))),
                               torch.from_numpy(np.asarray(y)).long())
        loss.backward()
        return (float(loss.detach()), _torch_grads(list(n.named_parameters())),
                {k: v.numpy().copy() for k, v in n.state_dict().items()
                 if "running_mean" in k})

    loss3, grads3, rm3 = run(lambda n, x: n.forward_3x(x))
    loss1, grads1, rm1 = run(lambda n, x: n.encode_single(x))
    np.testing.assert_allclose(loss1, loss3, rtol=1e-6)
    for k in grads3:
        np.testing.assert_allclose(grads1[k], grads3[k], rtol=1e-3, atol=1e-5,
                                   err_msg=k)  # f32 reassociation of 3 paths
    # identical batch per pass -> the 3x path applies the SAME batch mean mu
    # three times: rm3 = 0.9^3 rm0 + (0.1 + 0.09 + 0.081) mu, while
    # rm1 = 0.9 rm0 + 0.1 mu.  Cross-check the two via mu.
    for k in rm3:
        mu = (rm1[k] - 0.9 * rm0[k]) / 0.1
        want = 0.9 ** 3 * rm0[k] + (0.1 + 0.09 + 0.081) * mu
        np.testing.assert_allclose(rm3[k], want, rtol=1e-4, atol=1e-6, err_msg=k)


# ---------------------------------------------------------------------------
# RSP pretrain step + trajectory
# ---------------------------------------------------------------------------


def _torch_pretrain_loss(net, clf, tiles_u8_perm, labels):
    x = _to_nchw(tiles_u8_perm.reshape(-1, IMG, IMG, 3))
    b = tiles_u8_perm.shape[0]
    x = x.reshape(b, 3, 3, IMG, IMG)
    feats = net(x[:, 0], x[:, 1], x[:, 2])
    logits = clf(feats)
    return F.cross_entropy(logits, torch.from_numpy(np.asarray(labels)).long())


@pytest.fixture(scope="module")
def pretrain_pair(tmp_path_factory):
    torch.manual_seed(3)
    net = TorchTripletNet().train()
    clf = TorchClassifier(768, 6).train()
    path = tmp_path_factory.mktemp("pt") / "ckpt.pth"
    torch.save({"model": net.state_dict(), "classifier": clf.state_dict()}, str(path))
    mparams, mstats = load_torch_triplet_checkpoint(str(path))
    hparams = load_torch_linear_head(str(path), "classifier")
    return net, clf, {"model": mparams, "head": hparams}, mstats


def _make_batches(n_steps, batch=4, seed=5, learnable=False):
    """Random uint8 triplets + ordering labels.

    learnable=True returns BINARY tiles (0/255 only) whose white-pixel
    density differs per view (0.3/0.5/0.7), so the ordering is detectable
    and the loss genuinely descends — on unlearnable iid noise both
    frameworks just hover at chance (ln 6) where float noise decorrelates
    the curves.  Binary values make the /255 input scaling EXACT in every
    precision: XLA's simplifier may hoist the f64 convert above the f32
    division inside jit (computing u8/255 in f64 where torch computes
    f64(f32(u8/255))), an f32-eps input skew that chaos would amplify —
    with v/255 in {0, 1} the two orders are bit-identical."""
    rng = np.random.default_rng(seed)
    if learnable:
        dens = np.array([0.3, 0.5, 0.7])[None, None, :, None, None, None]
        tiles = (rng.random((n_steps, batch, 3, IMG, IMG, 3)) < dens).astype(np.uint8) * 255
    else:
        tiles = rng.integers(0, 256, (n_steps, batch, 3, IMG, IMG, 3), dtype=np.uint8)
    labels = rng.integers(0, 6, (n_steps, batch)).astype(np.int32)
    return tiles, labels


def test_pretrain_step_parity(pretrain_pair):
    """One RSP pretrain step (SGD-Nesterov lr=0.01 wd=1e-4, the reference
    pretrain config, pretrain_BreastPathQ.py:245-247): loss, gradients,
    post-step params, and BN running stats (mean exact; var matches after
    removing torch's unbiased n/(n-1) factor)."""
    net, clf, params, stats = pretrain_pair
    net2, clf2 = TorchTripletNet(), TorchClassifier(768, 6)
    net2.load_state_dict(net.state_dict())
    clf2.load_state_dict(clf.state_dict())
    net2.train(), clf2.train()
    tiles, labels = _make_batches(1)
    tiles, labels = tiles[0], labels[0]
    # the step permutes each triplet by its ordering label on device —
    # replicate on the host for torch
    perm = RSP_PERMUTATIONS[labels]
    tiles_perm = np.take_along_axis(tiles, perm[:, :, None, None, None], axis=1)

    rv0 = {k: v.numpy().copy() for k, v in net2.state_dict().items()
           if k.endswith("running_var")}
    counts = _bn_counts(
        net2, lambda: net2(_to_nchw(tiles_perm[:, 0]), _to_nchw(tiles_perm[:, 1]),
                           _to_nchw(tiles_perm[:, 2]))
    )
    # stat capture above ran the BN update path? no: no_grad + train mode DOES
    # update running stats — reload to reset them.
    net2.load_state_dict(net.state_dict())

    topt = torch.optim.SGD(list(net2.parameters()) + list(clf2.parameters()),
                           lr=0.01, momentum=0.9, nesterov=True, weight_decay=1e-4)
    topt.zero_grad()
    tloss = _torch_pretrain_loss(net2, clf2, tiles_perm, labels)
    tloss.backward()
    tgrads = _torch_grads(list(net2.named_parameters()))
    topt.step()

    model = TripletNet("resnet18")
    classifier = Classifier(num_classes=6)
    tx = optim.sgd_nesterov(0.01, momentum=0.9, weight_decay=1e-4)
    state = init_triplet_state(TripletNet("resnet18"), classifier, tx,
                               jax.random.PRNGKey(0), image_size=IMG)
    state = state.replace(params=params, batch_stats=stats, opt_state=tx.init(params))
    step = make_pretrain_step(model, classifier, tx, augment=None,
                              joint_encode=False, donate=False)
    state, metrics = step(state, jnp.asarray(tiles), jax.random.PRNGKey(1),
                          jnp.asarray(labels))
    np.testing.assert_allclose(float(metrics["loss"]), float(tloss),
                               rtol=2e-4, atol=2e-5)

    # gradients: recompute explicitly with the same math
    def loss_fn(p, bs):
        vs = {"params": p["model"], "batch_stats": bs}
        t = aug_batch.to_float(jnp.asarray(tiles_perm))
        feats, mut = model.apply(vs, t[:, 0], t[:, 1], t[:, 2], train=True,
                                 mutable=["batch_stats"])
        logits = classifier.apply({"params": p["head"]}, feats)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.asarray(labels)).mean(), mut["batch_stats"]

    (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, stats)
    _assert_sd_close(_flax_model_sd(grads["model"]), tgrads,
                     rtol=2e-3, atol=1e-4, label="grad ")

    _assert_sd_close(
        _flax_model_sd(state.params["model"]),
        {k: v.detach().numpy() for k, v in net2.state_dict().items()
         if "running_" not in k and "num_batches" not in k},
        rtol=1e-4, atol=2e-6, label="post-step ",
    )
    # BN running stats: 3 updates (one per view), same order both sides
    flax_sd = export_torch_state_dict(state.params["model"], state.batch_stats)
    torch_stats = {k: v.numpy() for k, v in net2.state_dict().items()
                   if "running_" in k}
    _assert_bn_stats_match(torch_stats,
                           {k: np.asarray(v) for k, v in flax_sd.items()},
                           rv0, counts, n_updates=3, rtol=5e-4, atol=1e-5)


def _run_trajectory(pretrain_pair, n_steps, epoch_len, la_steps, seed=17):
    """Run torch and JAX pretrain loops in FLOAT64 over the same data order,
    with the reference per-epoch Lookahead sync (la_alpha=0.5,
    pretrain_BreastPathQ.py:247,293 minus the stale-grad defect) every
    ``epoch_len`` steps.  Returns everything the assertions need."""
    net, clf, params, stats = pretrain_pair
    net2, clf2 = TorchTripletNet(), TorchClassifier(768, 6)
    net2.load_state_dict(net.state_dict())
    clf2.load_state_dict(clf.state_dict())
    net2.double().train(), clf2.double().train()

    tiles_all, labels_all = _make_batches(n_steps, seed=seed, learnable=True)
    rv0 = {k: v.numpy().copy() for k, v in net2.state_dict().items()
           if k.endswith("running_var")}

    def _nchw64(x_u8):
        # identical input quantization both sides: u8 -> f32/255 -> f64
        # (exact regardless of order for binary tiles, see _make_batches)
        return torch.from_numpy(x_u8.astype(np.float32) / 255.0).double().permute(0, 3, 1, 2)

    counts = _bn_counts(
        net2, lambda: net2(_nchw64(tiles_all[0, :, 0]), _nchw64(tiles_all[0, :, 1]),
                           _nchw64(tiles_all[0, :, 2]))
    )
    net2.load_state_dict(net.state_dict())  # reset stats mutated by the probe

    tparams = list(net2.parameters()) + list(clf2.parameters())
    topt = torch.optim.SGD(tparams, lr=0.01, momentum=0.9, nesterov=True,
                           weight_decay=1e-4)
    slow = [p.detach().clone() for p in tparams]
    la_count = 0
    t_losses, j_losses = [], []

    with jax.enable_x64():
        to64 = lambda tree: jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), tree)
        params64, stats64 = to64(params), to64(stats)
        model = TripletNet("resnet18", dtype=jnp.float64)
        classifier = Classifier(num_classes=6, dtype=jnp.float64)
        tx = optim.sgd_nesterov(0.01, momentum=0.9, weight_decay=1e-4)
        state = init_triplet_state(model, classifier, tx,
                                   jax.random.PRNGKey(0), image_size=IMG,
                                   lookahead_slow=True)
        state = state.replace(params=params64, batch_stats=stats64,
                              opt_state=tx.init(params64),
                              slow_params=jax.tree_util.tree_map(jnp.copy, params64))
        step = make_pretrain_step(model, classifier, tx, augment=None,
                                  joint_encode=False, donate=False)

        for i in range(n_steps):
            tiles, labels = tiles_all[i], labels_all[i]
            perm = RSP_PERMUTATIONS[labels]
            tiles_perm = np.take_along_axis(tiles, perm[:, :, None, None, None], axis=1)
            topt.zero_grad()
            x = _nchw64(tiles_perm.reshape(-1, IMG, IMG, 3)).reshape(4, 3, 3, IMG, IMG)
            tloss = F.cross_entropy(clf2(net2(x[:, 0], x[:, 1], x[:, 2])),
                                    torch.from_numpy(labels).long())
            tloss.backward()
            topt.step()
            t_losses.append(float(tloss.detach()))

            state, metrics = step(state, jnp.asarray(tiles), jax.random.PRNGKey(i),
                                  jnp.asarray(labels))
            j_losses.append(float(metrics["loss"]))

            if (i + 1) % epoch_len == 0:
                # reference per-epoch Lookahead sync (without the extra
                # optimizer.step the reference's scheduler call performs)
                la_count += 1
                if la_count >= la_steps:
                    la_count = 0
                    with torch.no_grad():
                        for p, s in zip(tparams, slow):
                            p.mul_(0.5).add_(s, alpha=0.5)
                            s.copy_(p)
                new_p, new_s, new_c = optim.lookahead_epoch_sync(
                    state.params, state.slow_params, state.la_count,
                    la_steps=la_steps, la_alpha=0.5,
                )
                state = state.replace(params=new_p, slow_params=new_s, la_count=new_c)

        final_model_sd = _flax_model_sd(state.params["model"])
        flax_stats_sd = {k: np.asarray(v) for k, v in export_torch_state_dict(
            state.params["model"], state.batch_stats).items()}

    torch_final = {k: v.detach().numpy().copy() for k, v in net2.state_dict().items()}
    return (np.array(t_losses), np.array(j_losses), torch_final,
            final_model_sd, flax_stats_sd, rv0, counts)


def test_pretrain_trajectory_short_tight(pretrain_pair):
    """7 identical no-aug pretrain steps in FLOAT64, reference pretrain
    config (SGD-Nesterov lr=0.01 wd=1e-4), with Lookahead epoch syncs every
    3 steps (la_steps=2, so a slow-weight PULLBACK fires inside the window
    at step 6): losses, final params, and BN running stats all track to
    ~1e-4.  7 steps is the tight-tracking horizon this system admits:
    training at lr 0.01 with momentum on batch-4 BN is measurably chaotic
    (divergence grows x30-100 per step), so even the f64 seed noise of
    ~1e-15 — torch-vs-torch would do no better — reaches ~5e-5 by step 8."""
    t_losses, j_losses, torch_final, final_sd, stats_sd, rv0, counts = \
        _run_trajectory(pretrain_pair, n_steps=7, epoch_len=3, la_steps=2)
    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-5, atol=1e-7)
    _assert_sd_close(
        final_sd,
        {k: v for k, v in torch_final.items()
         if "running_" not in k and "num_batches" not in k},
        rtol=1e-4, atol=1e-6, label="final ",
    )
    _assert_bn_stats_match(
        {k: v for k, v in torch_final.items() if "running_" in k},
        stats_sd, rv0, counts, n_updates=3 * 7, rtol=1e-4, atol=1e-7,
    )


@pytest.mark.slow
def test_pretrain_trajectory_long_statistical(pretrain_pair):
    """60 steps at the reference epoch structure (Lookahead sync every 10
    steps, la_steps=5 -> the pullback fires at step 50).  Per-step tightness
    over 60 chaotic steps is impossible for ANY two implementations (see
    test_pretrain_trajectory_short_tight), so this asserts the long-horizon
    statistics instead: bit-tight tracking through step 6, no systematic
    drift (mean losses agree), both loops actually learn, and the loss
    curves stay strongly correlated throughout."""
    t_losses, j_losses, *_ = _run_trajectory(
        pretrain_pair, n_steps=60, epoch_len=10, la_steps=5)
    # exact dynamics before chaos amplification kicks in
    np.testing.assert_allclose(j_losses[:6], t_losses[:6], rtol=1e-6, atol=1e-9)
    # learning happened on both sides (initial plateau is chance, ln 6 ~ 1.79)
    assert np.mean(t_losses[-10:]) < 0.65 * np.mean(t_losses[:5])
    assert np.mean(j_losses[-10:]) < 0.65 * np.mean(j_losses[:5])
    # no systematic drift: the curves share the same descent statistics
    assert abs(np.mean(j_losses) - np.mean(t_losses)) < 0.05
    assert np.mean(np.abs(j_losses - t_losses)) < 0.15
    assert np.corrcoef(j_losses, t_losses)[0, 1] > 0.95
