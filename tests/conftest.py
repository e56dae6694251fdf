"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host CPU devices instead (same XLA partitioner/collectives).
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# Child processes (subprocess-driven CLIs) must not grab the TPU either:
# the axon sitecustomize registers the TPU backend only when
# PALLAS_AXON_POOL_IPS is set, so clear it and force CPU for children.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores JAX_PLATFORMS, so force CPU via config too.
import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat test runs skip XLA:CPU re-compiles
# (hundreds of small executables — roughly halves suite wall time)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_SRC = Path("/root/reference/src")


def reference_module(name):
    """Import a module from the read-only reference repo as a test oracle.

    Only pure-numpy reference modules are importable here (no TF). Used to
    cross-check bitstream-visible semantics (octree binstr layout, syntax),
    never as an implementation source.
    """
    import importlib

    if str(REFERENCE_SRC) not in sys.path:
        sys.path.insert(0, str(REFERENCE_SRC))
    return importlib.import_module(name)
