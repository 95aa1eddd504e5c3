"""Defaults-of-record regression guard (docs/MIGRATION.md default-parity
table): the CLI defaults audited against the reference's parse_args blocks
in round 4 must stay put — a silent default drift is a parity break that no
behavioral test would catch (every behavioral test passes flags explicitly).

Reference provenance per value:
  pretrain_BreastPathQ.py:151-196, eval_BreastPathQ_SSL.py:220-267,
  eval_Camelyon_SSL.py:194-236, eval_Kather_SSL.py:220-265,
  eval_Kather_SSL_CR.py:250-302.
"""

from ssl_cr_histo_tpu.cli import consistency, finetune, pretrain


def test_pretrain_defaults_of_record():
    a = pretrain.parse_args(["--train_image_pth", "x"])
    assert a.tile_h == 256 and a.tile_w == 256          # pretrain_*:188-189
    assert a.tile_stride == 128                          # :190-191
    assert a.batch_size == 64                            # :165
    assert a.num_epoch == 250                            # :164
    assert a.lr == 0.01 and a.weight_decay == 1e-4       # :167-168
    assert a.la_steps == 5 and a.la_alpha == 0.5         # main: Lookahead(5, 0.5)
    assert a.save_freq == 10                             # :156
    assert a.lwst_level_idx == 1                         # :192 (BPQ config)
    assert a.NAug == 2 and a.Magn == 3.0                 # pretrain_RSP.py:197-198
    assert a.seed == 42                                  # :159


def test_finetune_defaults_of_record():
    a = finetune.parse_args(["--task", "kather"])
    assert a.modules == 0           # eval_*_SSL.py:232 (full fine-tune)
    assert a.validation_split == 0.2  # eval_BreastPathQ_SSL.py:262
    assert a.num_epoch == 90          # :234
    assert a.weight_decay == 1e-4     # :238
    assert a.save_freq == 10          # :224
    assert a.seed == 42               # :227
    # DOCUMENTED deviation (MIGRATION.md default-parity table): reference
    # defaults labeled_train to 0.1 (eval_BreastPathQ_SSL.py:264); a 0.1
    # default floors to zero samples on small datasets, so subsampling is
    # opt-in here.  If this changes, update the table.
    assert a.labeled_train == 1.0
    # task defaults resolve through TASKS (config of record)
    from ssl_cr_histo_tpu.cli.common import TASKS

    assert TASKS["breastpathq"].batch_size == 4    # eval_BreastPathQ_SSL.py:235
    assert TASKS["camelyon16"].batch_size == 16    # eval_Camelyon_SSL.py:206
    assert TASKS["kather"].batch_size == 64        # eval_Kather_SSL.py:232
    assert TASKS["breastpathq"].lr == 1e-4         # :237
    assert TASKS["camelyon16"].lr == 5e-4          # :208
    assert TASKS["kather"].lr == 1e-5              # :234


def test_consistency_defaults_of_record():
    a = consistency.parse_args(["--task", "kather"])
    assert a.mu == 7                 # eval_Kather_SSL_CR.py:268
    assert a.NAug == 7               # :269
    assert a.lambda_u == 1.0         # :276
    assert a.modules_student == 60   # :263
    assert a.labeled_train == 0.1    # :299
    assert a.validation_split == 0.2  # :298
    assert a.num_epoch == 90          # :266
    assert a.save_freq == 10          # :253
    from ssl_cr_histo_tpu.cli.common import TASKS

    # cr_batch resolves cr_batch_size=0 -> batch_size (BPQ: 4 == its SSL batch)
    assert TASKS["breastpathq"].cr_batch == 4   # eval_BreastPathQ_SSL_CR.py:264
    assert TASKS["camelyon16"].cr_batch == 8    # eval_Camelyon_SSL_CR.py:247
    assert TASKS["kather"].cr_batch == 8        # eval_Kather_SSL_CR.py:267


def test_slow_tier_collection_profiles():
    """Test-profile contract (CLAUDE.md): the default profile deselects the
    slow tier from whole-directory runs ONLY — explicitly-named files run
    exactly what was asked, and -m expressions take precedence.  Guards the
    conftest deselect hook (an addopts -m would silently collect nothing for
    `pytest tests/test_quality_gate.py` — round-4 review)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def collect(*argv):
        out = subprocess.run(
            [sys.executable, "-m", "pytest", "--collect-only", "-q",
             "-p", "no:cacheprovider", *argv],
            cwd=repo, capture_output=True, text=True, timeout=300)
        # 5 == collected nothing (legitimate for the -m precedence case)
        assert out.returncode in (0, 5), out.stdout + out.stderr
        return out.stdout.strip().splitlines()[-1]

    # explicit file target: the slow gates ARE collected
    tail = collect("tests/test_quality_gate.py")
    assert "2 tests collected" in tail, tail
    # whole-directory default profile: the slow tier is deselected
    tail = collect("tests/test_quality_gate.py::test_aug_on_pretrain_gate")
    assert "1 test collected" in tail, tail
    # an explicit -m expression wins over the default filter
    tail = collect("tests/test_quality_gate.py", "-m", "not slow")
    assert "no tests ran" in tail or "2 deselected" in tail, tail


def test_reference_exact_preset_resolves():
    """`--reference_exact` flips every ledgered deviation default in one
    flag (round-4 VERDICT #2: strict-parity configuration must not require
    reassembling ~6 remembered flags from two docs)."""
    from ssl_cr_histo_tpu.cli.common import apply_reference_exact

    a = apply_reference_exact(
        pretrain.parse_args(["--train_image_pth", "x", "--reference_exact"]),
        "pretrain")
    assert a.joint_encode is False        # per-view BN statistics
    assert a.expand_orderings is True     # eager x6 orderings (dataset.py:27-70)
    assert a.aug_mode == "exact" and a.photometric == "xla"
    assert a.bf16 is False                # reference trains f32

    a = apply_reference_exact(
        finetune.parse_args(["--task", "kather", "--reference_exact"]),
        "finetune")
    assert a.with_replacement is True     # eval_BreastPathQ_SSL.py:299
    assert a.aug_mode == "exact" and a.bf16 is False

    a = apply_reference_exact(
        consistency.parse_args(["--task", "camelyon16", "--reference_exact"]),
        "consistency")
    assert a.with_replacement is True     # eval_Camelyon_SSL_CR.py:318-319
    assert a.aug_mode == "exact" and a.photometric == "xla"
    assert a.bf16 is False

    # every add_common_args consumer resolves the flag — heatmap included
    # (a CLI that advertises --reference_exact in --help but ignores it
    # would produce bf16 maps in a parity review, silently)
    from ssl_cr_histo_tpu.cli import heatmap

    a = apply_reference_exact(
        heatmap.parse_args(["--test_image_pth", "x", "--test_mask_pth", "x",
                            "--probs_map_path", "x", "--finetune_ckpt", "x",
                            "--reference_exact"]),
        "heatmap")
    assert a.bf16 is False
    import inspect

    assert "apply_reference_exact" in inspect.getsource(heatmap.main)

    # the preset overrides individually-passed deviation flags (strictness
    # must not depend on flag order or memory)
    a = apply_reference_exact(
        pretrain.parse_args(
            ["--train_image_pth", "x", "--reference_exact", "--joint_encode"]),
        "pretrain")
    assert a.joint_encode is False

    # without the flag, nothing moves (shipped throughput defaults intact)
    a = apply_reference_exact(
        pretrain.parse_args(["--train_image_pth", "x"]), "pretrain")
    assert a.joint_encode is True and a.aug_mode == "fused" and a.bf16 is True


def test_reference_exact_preset_covers_documented_deviation_flags():
    """Cross-check the preset against the deviation LEDGER (PARITY.md +
    docs/MIGRATION.md): every flag the docs describe as restoring reference
    behavior must be in REFERENCE_EXACT_PRESET — a future deviation cannot
    be ledgered without joining the preset."""
    import os
    import re

    from ssl_cr_histo_tpu.cli.common import REFERENCE_EXACT_PRESET

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = ""
    for doc in ("PARITY.md", os.path.join("docs", "MIGRATION.md")):
        with open(os.path.join(repo, doc)) as f:
            text += f.read()

    # flags immediately followed by restore-the-reference language (the
    # window must not cross into the NEXT --flag's own description)
    found = set(re.findall(
        r"--([a-z_]+)`?(?:(?!--)[^.|]){0,60}?(?:restores|strict|reproduce)",
        text))
    assert found, "ledger scan matched nothing — docs reworded? fix the regex"

    preset_dests = set()
    for table in REFERENCE_EXACT_PRESET.values():
        preset_dests |= set(table)
    # store_false aliases: the DOC flag vs the argparse dest it drives
    aliases = {"no_joint_encode": "joint_encode"}
    # documented exclusions (rationale in common.REFERENCE_EXACT_PRESET):
    #   seed — RNG parity with torch is impossible regardless of seed value
    excluded = {"seed"}

    uncovered = {
        f for f in found - excluded
        if aliases.get(f, f) not in preset_dests
    }
    assert not uncovered, (
        f"deviation flags documented as restoring reference behavior but "
        f"missing from REFERENCE_EXACT_PRESET: {sorted(uncovered)}")
