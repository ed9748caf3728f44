"""Driver-contract tests: __graft_entry__.entry() compiles and runs, and
dryrun_multichip exercises the full fused train step over the virtual mesh."""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)  # asserts internally


@pytest.mark.slow
def test_dryrun_multichip_2():
    import __graft_entry__ as g
    g.dryrun_multichip(2)


@pytest.mark.slow
def test_dryrun_multichip_self_provisions():
    """Driver contract: from a process with too few devices, dryrun_multichip
    must re-exec itself with a virtual CPU mesh instead of asserting
    (the round-1 failure mode: MULTICHIP_r01.json rc=1 on the 1-chip host)."""
    import subprocess

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 1)\n"   # driver-like: 1 device
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(2)\n"
        "print('SELF_PROVISION_OK')\n")
    env = dict(os.environ)
    env.pop("_DWC_DRYRUN_CHILD", None)
    # simulate the driver env: no CPU-mesh XLA flag preset
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "SELF_PROVISION_OK" in out.stdout
    assert "dryrun_multichip OK" in out.stdout
