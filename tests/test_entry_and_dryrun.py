"""Driver-contract tests: __graft_entry__.entry() compiles and runs, and
dryrun_multichip exercises the full fused train step over the virtual mesh."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)  # asserts internally


def test_dryrun_multichip_2():
    import __graft_entry__ as g
    g.dryrun_multichip(2)
