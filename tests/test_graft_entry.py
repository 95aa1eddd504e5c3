"""Driver-contract tests: entry() compiles; dryrun_multichip runs on the
virtual 8-device CPU mesh."""

import jax


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 6)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
