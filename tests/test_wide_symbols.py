"""Wide-symbol (|sym| > 127 / > 32767) handling in the codec transport.

The reference's coder handles unbounded symbols by design
(``/root/reference/src/utils/patch_gaussian_conditional.py:27-31``); our
rANS escape mechanism does too, but round 1's device→host transport
asserted int16 fits. These tests pin the graceful widen path: the
narrow int8 transfer plus device-retained full-width copies must
reconstruct exact symbols at int8/int16/int32, matching the decoder's
``narrow_symbols`` dtype choice.
"""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcc_geo_cnn_v2_tpu.codec import BlockCodec, narrow_symbols


def _roundtrip(sym):
    out_dev = {"y_sym": jnp.asarray(sym)}
    compact = BlockCodec._compact(out_dev, narrow=True)
    dev_keep = {"y_sym_full": jnp.asarray(sym), "y_sym": compact["y_sym"]}
    host = {k: np.array(v) for k, v in jax.device_get(compact).items()}
    ns = types.SimpleNamespace(is_v2=False, batch_blocks=len(sym),
                               _cast16=lambda a: a.astype(jnp.int16))
    ns._gather_full_rows = types.MethodType(
        BlockCodec._gather_full_rows, ns)
    feeds = BlockCodec._widen_symbols_chunks(ns, host, [dev_keep],
                                             len(sym))
    return host["y_sym"], np.asarray(feeds[0]["y_sym"])


def _base_syms(seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-5, 6, size=(6, 4, 4, 4, 2), dtype=np.int32)


def test_all_narrow_stays_int8():
    sym = _base_syms()
    host, dev = _roundtrip(sym)
    assert host.dtype == np.int8 and dev.dtype == np.int8
    np.testing.assert_array_equal(host, sym)
    assert narrow_symbols(sym).dtype == np.int8


def test_wide8_widens_to_int16():
    sym = _base_syms()
    sym[1, 0, 0, 0, 0] = 300
    sym[4, 2, 1, 3, 1] = -3000
    host, dev = _roundtrip(sym)
    assert host.dtype == np.int16 and dev.dtype == np.int16
    np.testing.assert_array_equal(host, sym)
    np.testing.assert_array_equal(dev, sym)
    assert narrow_symbols(sym).dtype == np.int16


def test_wide16_widens_to_int32():
    sym = _base_syms()
    sym[1, 0, 0, 0, 0] = 300
    sym[3, 1, 1, 1, 1] = 70_000  # divergent-model regime
    host, dev = _roundtrip(sym)
    assert host.dtype == np.int32 and dev.dtype == np.int32
    np.testing.assert_array_equal(host, sym)
    np.testing.assert_array_equal(dev, sym)
    assert narrow_symbols(sym).dtype == np.int32


def test_wide_symbols_entropy_roundtrip():
    """rANS escape coding round-trips int32-regime symbols losslessly."""
    from pcc_geo_cnn_v2_tpu.coding import range_coder as rc
    from pcc_geo_cnn_v2_tpu.models.entropy import build_gaussian_cdf

    table = build_gaussian_cdf(np.geomspace(0.11, 64.0, 8), 1e-9)
    sym = _base_syms().ravel()
    sym[7] = 70_000
    sym[19] = -40_000
    idx = np.arange(sym.size, dtype=np.int32) % 8
    data = rc.encode(sym, idx, table)
    dec = rc.decode(data, idx, table)
    np.testing.assert_array_equal(dec, sym)


@pytest.mark.slow
def test_sparse_symbol_budget_overflow_refetch():
    """Blocks with more nonzero y symbols than sym_nz_budget must rebuild
    from the device-retained full rows and still roundtrip bit-exact."""
    import numpy as np
    from pcc_geo_cnn_v2_tpu.codec import BlockCodec
    from pcc_geo_cnn_v2_tpu.models.configs import build_model
    from pcc_geo_cnn_v2_tpu.utils.octree import partition_octree
    import jax

    rng = np.random.default_rng(21)
    pts = np.unique(rng.integers(0, 32, size=(700, 3)).astype(np.float64),
                    axis=0)
    blocks, binstr = partition_octree(pts, [0, 0, 0], [32] * 3, 1)
    model = build_model(dict(model="v2", num_filters=8,
                             analysis="AnalysisTransformV1",
                             synthesis="SynthesisTransformV1"))
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 16, 16, 16, 1), np.float32),
                        training=False)
    params = jax.tree_util.tree_map(np.asarray, params)
    syn = params["params"]["synthesis_t"]
    last = sorted(k for k in syn if k.startswith("ConvTranspose"))[-1]
    syn[last]["bias"] = syn[last]["bias"] + 0.55

    ref = BlockCodec(model, params, block_size=16, batch_blocks=4)
    tiny = BlockCodec(model, params, block_size=16, batch_blocks=4)
    tiny.sym_nz_budget = 2  # force every block over the sparse budget
    d_r, _ = ref.compress_blocks_device_opt(blocks, binstr, pts, 32, 1)
    d_t, m_t = tiny.compress_blocks_device_opt(blocks, binstr, pts, 32, 1)
    assert d_r[0] == d_t[0], "sparse-overflow path changed the bitstream"
    dec = tiny.decompress_blocks(d_t[0])
    for a, b in zip(m_t[0]["x_hat_list"], dec):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
