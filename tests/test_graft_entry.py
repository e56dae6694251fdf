"""Driver-contract checks: dryrun_multichip on the virtual CPU mesh."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_returns_jittable():
    import jax
    import __graft_entry__ as ge

    fn, args = ge.entry()
    # trace only (full 64^3 c3p compile is exercised by the driver)
    jax.eval_shape(fn, *args)
