"""Multi-host wiring tests: the single-process no-op path, the primary-only
write guards, and a real 2-process ``jax.distributed`` smoke test over a
local coordinator (CPU backend) — the pod-launch path of SURVEY §2.2's DP
plan (reference equivalent: single-process DataParallel,
pretrain_BreastPathQ.py:231-233, which has no multi-host story)."""

import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_initialize_noop_single_process():
    from ssl_cr_histo_tpu.parallel import distributed as DI

    DI.initialize()  # no coordinator env vars -> must be a no-op
    assert DI.process_count() == 1
    assert DI.is_primary()


def test_primary_only_write_guards(tmp_path, monkeypatch):
    """CsvLogger and save_checkpoint must not write on non-primary hosts."""
    import jax

    from ssl_cr_histo_tpu.models import FinetuneHead, TripletNet
    from ssl_cr_histo_tpu.train import optim
    from ssl_cr_histo_tpu.train.checkpoint import save_checkpoint
    from ssl_cr_histo_tpu.train.init import init_triplet_state
    from ssl_cr_histo_tpu.train.loop import CsvLogger

    monkeypatch.setattr(
        "ssl_cr_histo_tpu.parallel.distributed.is_primary", lambda: False
    )
    log = CsvLogger(str(tmp_path / "log.csv"), "a,b")
    log.append(1, 2.0)
    assert not (tmp_path / "log.csv").exists()

    state = init_triplet_state(
        TripletNet("resnet18"), FinetuneHead(num_classes=2), optim.adam(1e-3),
        jax.random.PRNGKey(0), image_size=32, triplet=False,
    )
    save_checkpoint(str(tmp_path / "ckpt"), state, {})
    assert not (tmp_path / "ckpt").exists()


CHILD = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    from ssl_cr_histo_tpu.parallel import distributed as DI
    DI.initialize(coordinator_address=sys.argv[1], num_processes=2,
                  process_id=int(sys.argv[2]))
    assert jax.process_count() == 2, jax.process_count()
    assert DI.process_count() == 2
    assert DI.is_primary() == (int(sys.argv[2]) == 0)
    assert len(jax.devices()) == 2 * len(jax.local_devices())

    # cross-process collective: allgather the process ids
    import numpy as np
    from jax.experimental import multihost_utils
    got = multihost_utils.process_allgather(np.array([jax.process_index()]))
    assert sorted(np.ravel(got).tolist()) == [0, 1], got

    # primary-only write guards under a REAL non-zero process index
    from ssl_cr_histo_tpu.train.loop import CsvLogger
    log = CsvLogger(os.path.join(sys.argv[3], "log.csv"), "a,b")
    log.append(1, 2.0)
    print("CHILD_OK", jax.process_index())
    """
)


def test_two_process_distributed_smoke(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    addr = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children: 1 local CPU device each
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), addr, str(i), str(tmp_path), REPO],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o
        assert "CHILD_OK" in o, o
    # exactly one process (the primary) wrote the CSV
    lines = (tmp_path / "log.csv").read_text().strip().splitlines()
    assert lines == ["a,b", "1,2.000000"]


def test_multihost_pjit_step_matches_single_process(tmp_path):
    """A pjit train step on a mesh that SPANS PROCESSES (2 controllers x 4
    virtual CPU devices each, wired by ``jax.distributed``) computes the
    same pretrain and consistency losses as the single-process 8-device
    mesh — the multi-host pod path every CLI advertises via
    ``distributed.initialize()`` (SURVEY §2.2 DP row; reference equivalent
    is single-process DataParallel, pretrain_BreastPathQ.py:231-233).

    Exactness ledger: WITHIN the pod, ``dryrun_multihost`` already asserts
    all processes produced bit-identical losses (same executable, same
    collectives).  ACROSS topologies the 8-way loss/grad all-reduce is cut
    differently (intra-process tree vs hierarchical cross-process), so the
    sums differ by float32 ordering noise — measured ~1e-6 relative; a
    wrong batch shard or mesh layout would miss by >1e-1."""
    import numpy as np

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as g
    from ssl_cr_histo_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices())  # conftest: 8 virtual CPU devices
    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P("data"))
    single = g.pod_case_losses(
        mesh,
        lambda arr: jax.device_put(np.asarray(arr), dat),
        lambda tree: jax.device_put(tree, rep),
    )
    single.update(g.pod_case_eval(mesh))
    multi = g.dryrun_multihost(2, 4, out_path=str(tmp_path / "losses"))
    for k in ("pretrain_loss", "consistency_loss"):
        s, m = float.fromhex(single[k]), float.fromhex(multi[k])
        np.testing.assert_allclose(m, s, rtol=1e-5, err_msg=k)
    # eval logits + heatmap probability map (pure forwards): bitwise WITHIN
    # the pod (dryrun_multihost asserts the sha256s agree across its
    # processes); across topologies only ulp-tight — XLA compiles a
    # 2-process mesh into slightly different per-device programs
    # (fusion/tiling), measured ~4e-7 shifts with zero collectives involved
    for k in ("eval_logits", "probs_map"):
        np.testing.assert_allclose(
            np.asarray(multi[k]), np.asarray(single[k]), atol=1e-5, err_msg=k)
