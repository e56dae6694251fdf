"""Cross-process AOT executable cache for the codec's jitted passes.

Motivation (VERDICT r2 #6b): the axon remote-TPU compiler bypasses
``JAX_COMPILATION_CACHE_DIR``, so every fresh process pays the full
1-3 min remote compile set before the first encode. The r3 experiment
(``tools/aot_export.py``) showed ``jax.experimental.serialize_executable``
round-trips a compiled executable through disk into a fresh process:
5.7 MB payload, ~0.1 s deserialize + 1.6 s first run vs a 1-3 min
compile. This module turns that into a production path.

:func:`aot_jit` is a drop-in ``jax.jit`` for the codec's fused passes.
With ``$PCC_AOT_CACHE`` unset it IS ``jax.jit`` (zero new behavior).
With it set to a directory, each (function, input-signature) pair keyed
by the sha256 of its lowered StableHLO module is serialized there on
first compile and deserialized on every later process start.

Safety properties:
 - the key hashes the lowered module text, so any change to the model
   code, the input shapes/dtypes, the jax version, or the device kind
   misses the cache instead of running a stale executable;
 - deserialized executables are device-bound, so the cache disables
   itself when the codec round-robins over multiple devices
   (``enabled=False`` from the wrap site) — plain jit handles that;
 - any serialize/deserialize failure logs once and permanently falls
   back to the plain jit path for that wrapper (the bucket-backend
   demotion pattern, codec.py warmup).

The reference has no analogue: its TF1 graphs are rebuilt per process
(``/root/reference/src/compress_octree.py:37-52`` constructs the model
and session from scratch on every CLI invocation).
"""

import hashlib
import logging
import os
import pickle
import tempfile
from pathlib import Path

import jax

log = logging.getLogger(__name__)


def cache_dir():
    """Active cache directory, or None when the feature is off.

    Off unless ``$PCC_AOT_CACHE`` names a directory AND the default
    backend is listed in ``$PCC_AOT_CACHE_PLATFORMS`` (default:
    ``tpu``). The XLA:CPU AOT loader resolves kernels through a
    compile-order-dependent function-name registry (``wrapped_reverse.2
    not found`` failures when executables are loaded in a different
    order than they were compiled), so CPU is opt-in for tests only;
    the TPU payload is a self-contained binary and round-trips reliably
    (tools/aot_export.py measurement).
    """
    d = os.environ.get("PCC_AOT_CACHE")
    if not d:
        return None
    allowed = os.environ.get("PCC_AOT_CACHE_PLATFORMS", "tpu").split(",")
    if jax.default_backend() not in allowed:
        return None
    return Path(d)


class _AotJit:
    """``jax.jit`` plus a per-signature disk cache of compiled executables."""

    def __init__(self, fn, name=None, enabled=True):
        self._jit = jax.jit(fn)
        self._name = name or getattr(fn, "__name__", "fn")
        self._enabled = enabled
        self._compiled = {}  # signature -> loaded/compiled executable
        self._broken = False

    # jax.jit API passthroughs used elsewhere in the codec/tools
    def lower(self, *args, **kwargs):
        return self._jit.lower(*args, **kwargs)

    def __call__(self, *args, **kwargs):
        d = cache_dir()
        if d is None or not self._enabled or self._broken or kwargs:
            return self._jit(*args, **kwargs)
        try:
            leaves, treedef = jax.tree_util.tree_flatten(args)
            sig = (str(treedef),
                   tuple((tuple(x.shape), str(x.dtype)) for x in leaves))
        except Exception:  # noqa: BLE001 - odd leaves: plain jit handles them
            return self._jit(*args)
        exe = self._compiled.get(sig)
        if exe is None:
            try:
                exe = self._load_or_compile(d, args)
            except Exception as e:  # noqa: BLE001 - cache must never break a run
                log.warning("aot cache disabled for %s: %s: %s",
                            self._name, type(e).__name__, e)
                self._broken = True
                return self._jit(*args)
            self._compiled[sig] = exe
        return exe(*args)

    def _load_or_compile(self, d, args):
        import time

        t0 = time.time()
        lowered = self._jit.lower(*args)
        dev = jax.devices()[0]
        key_src = "|".join([
            jax.__version__, jax.default_backend(), dev.device_kind,
            hashlib.sha256(lowered.as_text().encode()).hexdigest(),
        ])
        key = hashlib.sha256(key_src.encode()).hexdigest()[:24]
        path = d / f"{self._name}-{key}.aotx"
        if path.exists():
            from jax.experimental.serialize_executable import (
                deserialize_and_load,
            )

            payload, in_tree, out_tree = pickle.loads(path.read_bytes())
            # our executables are single-device (jit, no sharding); the
            # default execution_devices = ALL local devices breaks on
            # multi-device hosts (e.g. the 8-device virtual CPU mesh)
            exe = deserialize_and_load(payload, in_tree, out_tree,
                                       execution_devices=[dev])
            # validation run: loader failures surface LAZILY at output
            # fetch, so execute once and block before trusting the load
            # (raises -> caller demotes this wrapper to plain jit)
            jax.block_until_ready(exe(*args))
            log.info("aot cache HIT %s (%.1f MB, %.2fs incl. lower + "
                     "validation run)",
                     path.name, path.stat().st_size / 1e6, time.time() - t0)
            return exe
        exe = lowered.compile()
        try:
            from jax.experimental.serialize_executable import serialize

            payload, in_tree, out_tree = serialize(exe)
            d.mkdir(parents=True, exist_ok=True)
            blob = pickle.dumps((payload, in_tree, out_tree))
            # atomic publish: concurrent processes race benignly
            with tempfile.NamedTemporaryFile(dir=d, delete=False) as f:
                f.write(blob)
            os.replace(f.name, path)
            log.info("aot cache MISS %s: compiled %.1fs, stored %.1f MB",
                     path.name, time.time() - t0, len(blob) / 1e6)
        except Exception as e:  # noqa: BLE001 - store failure: still run
            log.warning("aot serialize failed for %s (executable still "
                        "used this process): %s: %s",
                        self._name, type(e).__name__, e)
        return exe


def aot_jit(fn, name=None, enabled=True):
    """Drop-in ``jax.jit`` with an optional cross-process executable cache.

    Identical to ``jax.jit(fn)`` unless ``$PCC_AOT_CACHE`` names a
    directory AND ``enabled`` is True (wrap sites pass False in
    multi-device round-robin mode, where executables must follow the
    argument's device).
    """
    return _AotJit(fn, name=name, enabled=enabled)
