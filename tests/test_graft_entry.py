"""Driver-contract regression tests for __graft_entry__.

Round 1 failed the driver's multi-chip gate because ``dryrun_multichip``
initialized the real TPU backend (MULTICHIP_r01.json, rc=1). The dryrun
now always re-execs in a scrubbed subprocess; this test reproduces the
hostile driver environment (axon plugin vars set, no XLA_FLAGS) and
asserts the gate passes anyway.
"""

import os
import subprocess
import sys

import pytest

from tests.conftest import REPO_ROOT


@pytest.mark.slow
def test_dryrun_multichip_survives_axon_env():
    env = dict(os.environ)
    # hostile env: axon TPU plugin nominally active, no CPU forcing
    env["PALLAS_AXON_POOL_IPS"] = "127.0.0.1"
    env["JAX_PLATFORMS"] = "axon"
    env.pop("XLA_FLAGS", None)
    env.pop("_GRAFT_DRYRUN_CHILD", None)
    env["PYTHONPATH"] = str(REPO_ROOT)
    r = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=REPO_ROOT, env=env, capture_output=True, text=True, timeout=580,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mesh=" in r.stdout and "OK" in r.stdout, r.stdout


def test_make_mesh_refuses_truncation():
    from pcc_geo_cnn_v2_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="only"):
        make_mesh(1024)
