"""Optimizer tests: Lookahead semantics, schedules, masking."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssl_cr_histo_tpu.train import optim


def test_multistep_schedule():
    sched = optim.multistep_schedule(0.1, [10, 20], gamma=0.1)
    assert abs(sched(0) - 0.1) < 1e-9
    assert abs(sched(10) - 0.01) < 1e-9
    assert abs(sched(25) - 0.001) < 1e-9


def test_sgd_nesterov_matches_torch_formula():
    """One step of torch SGD(nesterov, momentum=0.9, wd) from zero momentum:
    d = g + wd*p; buf = d; update = -(lr)*(d + momentum*buf)."""
    p = jnp.array([1.0])
    g = jnp.array([0.5])
    lr, mom, wd = 0.1, 0.9, 1e-2
    tx = optim.sgd_nesterov(lr, momentum=mom, weight_decay=wd)
    st = tx.init(p)
    up, _ = tx.update(g, st, p)
    d = 0.5 + wd * 1.0
    want = -lr * (d + mom * d)
    np.testing.assert_allclose(np.asarray(up), want, rtol=1e-6)


def test_lookahead_step_transform():
    params = jnp.array([0.0])
    inner = optax.sgd(1.0)
    tx = optim.lookahead(inner, sync_period=2, slow_step_size=0.5)
    st = tx.init(params)
    g = jnp.array([-1.0])  # sgd update = +1 each step

    # step 1: fast 0->1, no sync
    up, st = tx.update(g, st, params)
    params = optax.apply_updates(params, up)
    np.testing.assert_allclose(np.asarray(params), [1.0])
    # step 2: fast 1->2, sync: slow(0) + 0.5*(2-0) = 1 -> params=1, slow=1
    up, st = tx.update(g, st, params)
    params = optax.apply_updates(params, up)
    np.testing.assert_allclose(np.asarray(params), [1.0])
    np.testing.assert_allclose(np.asarray(st.slow), [1.0])
    # two more steps: fast 1->2->... sync at 3: 1 + .5*(3-1) = 2
    up, st = tx.update(g, st, params)
    params = optax.apply_updates(params, up)
    np.testing.assert_allclose(np.asarray(params), [2.0])
    up, st = tx.update(g, st, params)
    params = optax.apply_updates(params, up)
    np.testing.assert_allclose(np.asarray(params), [2.0])


def test_lookahead_epoch_sync():
    params = {"w": jnp.array([4.0])}
    slow = {"w": jnp.array([0.0])}
    count = jnp.zeros([], jnp.int32)
    # la_steps=2: first call no sync, second call interpolates 0.5
    p, s, c = optim.lookahead_epoch_sync(params, slow, count, la_steps=2, la_alpha=0.5)
    np.testing.assert_allclose(np.asarray(p["w"]), [4.0])
    assert int(c) == 1
    p, s, c = optim.lookahead_epoch_sync(p, s, c, la_steps=2, la_alpha=0.5)
    np.testing.assert_allclose(np.asarray(p["w"]), [2.0])
    np.testing.assert_allclose(np.asarray(s["w"]), [2.0])
    assert int(c) == 0


def test_radam_runs():
    import jax.numpy as jnp

    p = jnp.array([1.0])
    tx = optim.radam(1e-3)
    st = tx.init(p)
    up, _ = tx.update(jnp.array([0.5]), st, p)
    assert np.isfinite(np.asarray(up)).all()


def test_best_tracker_rejects_nan(tmp_path, monkeypatch):
    """A diverged (NaN) validation metric must never overwrite best/ nor
    poison later comparisons (NaN compares False to everything)."""
    import math

    from ssl_cr_histo_tpu.train import loop as L

    saved = []
    monkeypatch.setattr(L, "save_checkpoint", lambda p, s, m: saved.append(m))
    bt = L.BestTracker(str(tmp_path), mode="min")
    assert not bt.update(float("nan"), 1, None, {})
    assert bt.best_value is None
    assert bt.update(0.4, 2, None, {})
    assert not bt.update(float("nan"), 3, None, {})
    assert not bt.update(0.55, 4, None, {})  # worse than 0.4 stays rejected
    assert bt.best_value == 0.4 and len(saved) == 1
    assert math.isfinite(saved[0]["best_val"])
