"""AOT executable cache (aot.py): correctness + cache behavior.

The production win is on the remote-TPU backend (1-3 min compile set →
~0.1 s deserialize, tools/aot_export.py measurement); these tests pin
the *semantics* on CPU: cached results identical to plain jit, files
appear/round-trip, disabled and multi-sig paths fall through safely.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcc_geo_cnn_v2_tpu.aot import _AotJit, aot_jit


@pytest.fixture
def cache(tmp_path, monkeypatch):
    monkeypatch.setenv("PCC_AOT_CACHE", str(tmp_path))
    # production default is tpu-only (the CPU AOT loader is fragile,
    # see aot.cache_dir); tests opt the cpu backend in explicitly
    monkeypatch.setenv("PCC_AOT_CACHE_PLATFORMS", "cpu,tpu")
    return tmp_path


def test_default_platform_gate(monkeypatch, tmp_path):
    """With PCC_AOT_CACHE set but PLATFORMS left at the tpu default,
    the cpu backend stays on plain jit (no files)."""
    monkeypatch.setenv("PCC_AOT_CACHE", str(tmp_path))
    monkeypatch.delenv("PCC_AOT_CACHE_PLATFORMS", raising=False)
    f = aot_jit(_fn, name="gate")
    f(np.ones((2, 4), np.float32), np.ones((4, 3), np.float32))
    assert not list(tmp_path.iterdir())


def _fn(a, b):
    return jnp.tanh(a) @ b + 1.0


def test_disabled_without_env(monkeypatch, tmp_path):
    monkeypatch.delenv("PCC_AOT_CACHE", raising=False)
    f = aot_jit(_fn, name="t0")
    a = np.ones((4, 8), np.float32)
    b = np.ones((8, 2), np.float32)
    np.testing.assert_allclose(f(a, b), jax.jit(_fn)(a, b))
    assert not list(tmp_path.iterdir())


def test_store_and_fresh_load(cache):
    a = np.random.RandomState(0).randn(4, 8).astype(np.float32)
    b = np.random.RandomState(1).randn(8, 2).astype(np.float32)
    want = np.asarray(jax.jit(_fn)(a, b))

    f1 = aot_jit(_fn, name="t1")
    got1 = np.asarray(f1(a, b))
    files = list(cache.glob("t1-*.aotx"))
    assert len(files) == 1, files

    # fresh wrapper = fresh process stand-in: must LOAD, not recompile
    f2 = aot_jit(_fn, name="t1")
    got2 = np.asarray(f2(a, b))
    assert list(cache.glob("t1-*.aotx")) == files  # no second file
    np.testing.assert_allclose(got1, want, rtol=1e-6)
    np.testing.assert_allclose(got2, want, rtol=1e-6)


def test_loaded_executable_is_used(cache):
    """The second wrapper's executable really comes from disk: corrupting
    the stored payload breaks the load and the wrapper falls back to
    plain jit (broken flag) instead of crashing."""
    a = np.ones((2, 4), np.float32)
    b = np.ones((4, 3), np.float32)
    aot_jit(_fn, name="t2")(a, b)
    (path,) = cache.glob("t2-*.aotx")
    path.write_bytes(b"not a pickle")
    f = aot_jit(_fn, name="t2")
    np.testing.assert_allclose(f(a, b), jax.jit(_fn)(a, b))
    assert f._broken  # fell back loudly, not silently wrong


def test_distinct_signatures_distinct_files(cache):
    f = aot_jit(_fn, name="t3")
    f(np.ones((2, 4), np.float32), np.ones((4, 3), np.float32))
    f(np.ones((5, 4), np.float32), np.ones((4, 3), np.float32))
    assert len(list(cache.glob("t3-*.aotx"))) == 2


def test_kwargs_and_enabled_false_fall_through(cache):
    calls = []

    def g(a, *, s=1.0):
        calls.append(1)
        return a * s

    f = aot_jit(g, name="t4")
    f(np.ones(3, np.float32), s=2.0)  # kwargs: plain jit path
    f2 = aot_jit(_fn, name="t5", enabled=False)
    f2(np.ones((2, 4), np.float32), np.ones((4, 3), np.float32))
    assert not list(cache.glob("t4-*")) and not list(cache.glob("t5-*"))


def test_codec_roundtrip_with_cache(cache):
    """End-to-end: BlockCodec encode/decode with the cache on is
    bit-identical to the cache-off result, and a second codec instance
    populates zero new files (full warm set hit)."""
    from pcc_geo_cnn_v2_tpu.models.configs import build_model
    from pcc_geo_cnn_v2_tpu.codec import BlockCodec
    from pcc_geo_cnn_v2_tpu.utils.octree import partition_octree

    rng = np.random.default_rng(7)
    pts = np.unique(rng.integers(0, 32, (600, 3)), axis=0).astype(np.float64)
    blocks, binstr = partition_octree(pts, [0, 0, 0], [32] * 3, 1)
    model = build_model("c3p")
    params = jax.tree_util.tree_map(
        np.asarray,
        model.init(jax.random.PRNGKey(0),
                   np.zeros((1, 16, 16, 16, 1), np.float32),
                   training=False))
    # untrained synthesis can be all-zero probability; lift the final
    # deconv bias so the candidate masks are non-empty (codec e2e pattern)
    syn = params["params"]["synthesis_t"]
    last = sorted(k for k in syn if k.startswith("ConvTranspose"))[-1]
    syn[last]["bias"] = syn[last]["bias"] + 0.55

    os.environ.pop("PCC_AOT_CACHE")
    codec_off = BlockCodec(model, params, block_size=16, batch_blocks=4)
    data_off, _ = codec_off.compress_blocks(blocks, binstr, pts, 32, 1,
                                            fixed_threshold=True)
    os.environ["PCC_AOT_CACHE"] = str(cache)

    codec = BlockCodec(model, params, block_size=16, batch_blocks=4)
    data_on, _ = codec.compress_blocks(blocks, binstr, pts, 32, 1,
                                       fixed_threshold=True)
    n_files = len(list(cache.glob("*.aotx")))
    assert n_files >= 2  # encode/decode executables stored

    # same bitstream + same decoded blocks, cache on vs off
    assert [tuple(s) for s, _ in data_on[0]] == \
        [tuple(s) for s, _ in data_off[0]]
    dec_off = codec_off.decompress_blocks(data_off[0])
    dec_on = codec.decompress_blocks(data_on[0])
    for a, b in zip(dec_on, dec_off):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    codec2 = BlockCodec(model, params, block_size=16, batch_blocks=4)
    codec2.compress_blocks(blocks, binstr, pts, 32, 1, fixed_threshold=True)
    assert len(list(cache.glob("*.aotx"))) == n_files
