"""Driver contract tests: entry() compiles single-device; dryrun_multichip
runs a full sharded train step on the virtual 8-device mesh."""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    logits, caps = jax.jit(fn)(*args)
    assert logits.shape[0] == args[1].shape[0]
    assert caps.shape[0] == 6  # six probed layers


@pytest.mark.slow
def test_dryrun_multichip(eight_devices):
    import __graft_entry__ as g

    g.dryrun_multichip(8)
