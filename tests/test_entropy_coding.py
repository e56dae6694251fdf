"""Entropy models + range coder: roundtrips, C++/Python parity, rate sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcc_geo_cnn_v2_tpu.coding import range_coder as rc
from pcc_geo_cnn_v2_tpu.models.entropy import (
    CdfTable,
    FactorizedPrior,
    GaussianConditional,
    build_factorized_cdf,
    build_gaussian_cdf,
    default_scale_table,
    pmf_to_quantized_cdf,
)


def test_pmf_to_quantized_cdf_invariants():
    rng = np.random.default_rng(0)
    for n in (1, 2, 7, 300, 2000):
        pmf = rng.random(n) ** 4  # spiky
        cdf = pmf_to_quantized_cdf(pmf)
        assert cdf[0] == 0 and cdf[-1] == 1 << 16
        assert np.all(np.diff(cdf) >= 1)
    # degenerate: zeros
    cdf = pmf_to_quantized_cdf(np.zeros(5))
    assert cdf[-1] == 1 << 16 and np.all(np.diff(cdf) >= 1)


def _random_table(rng, rows=8, buckets=12):
    cdf = np.zeros((rows, buckets + 2), np.int32)
    lengths = np.zeros(rows, np.int32)
    offsets = rng.integers(-10, 10, rows).astype(np.int32)
    for r in range(rows):
        L = int(rng.integers(2, buckets + 1))
        pmf = rng.random(L + 1) + 1e-3  # + escape bucket
        cdf[r, : L + 2] = pmf_to_quantized_cdf(pmf)
        lengths[r] = L + 2
    return CdfTable(cdf, lengths, offsets)


def test_range_coder_roundtrip_and_parity():
    rng = np.random.default_rng(1)
    table = _random_table(rng)
    assert rc.native_available(), "native range coder failed to build"
    for n in (0, 1, 5, 1000, 20000):
        indexes = rng.integers(0, table.rows, n).astype(np.int32)
        span = table.cdf_length[indexes] - 2
        # mix of in-range symbols and wild escapes (incl. huge magnitudes)
        symbols = table.offset[indexes] + rng.integers(0, np.maximum(span, 1))
        wild = rng.random(n) < 0.05
        symbols = np.where(
            wild, rng.integers(-(2 ** 20), 2 ** 20, n), symbols
        ).astype(np.int32)

        data_c = rc.encode(symbols, indexes, table)
        data_py = rc.encode_py(symbols, indexes, table)
        assert data_c == data_py, "C++ and Python encoders diverge"
        np.testing.assert_array_equal(rc.decode(data_c, indexes, table), symbols)
        np.testing.assert_array_equal(
            rc.decode_py(data_py, indexes, table), symbols
        )


def test_batch_coder_matches_per_stream():
    """encode_batch/decode_batch are byte/bit-identical to per-block
    encode/decode — shared AND per-stream index rows, escapes included."""
    rng = np.random.default_rng(7)
    table = _random_table(rng)
    assert rc.native_available()
    n, row = 6, (4, 5)  # leading row dim != n on purpose... and == below
    for per_stream in (False, True):
        for n_streams in (0, 1, 4, 6):  # 4 == row[0]: ambiguity guard
            if per_stream:
                indexes = rng.integers(
                    0, table.rows, (n_streams,) + row).astype(np.int32)
            else:
                indexes = rng.integers(0, table.rows, row).astype(np.int32)
            span_of = lambda idx: table.cdf_length[idx] - 2
            symbols = np.empty((n_streams,) + row, np.int32)
            for s in range(n_streams):
                idx = indexes[s] if per_stream else indexes
                symbols[s] = table.offset[idx] + rng.integers(
                    0, np.maximum(span_of(idx), 1))
            wild = rng.random(symbols.shape) < 0.1
            symbols = np.where(
                wild, rng.integers(-(2 ** 18), 2 ** 18, symbols.shape),
                symbols).astype(np.int32)

            datas = rc.encode_batch(symbols, indexes, table)
            expect = [rc.encode(symbols[s],
                                indexes[s] if per_stream else indexes,
                                table) for s in range(n_streams)]
            assert datas == expect, (per_stream, n_streams)
            got = rc.decode_batch(datas, indexes, table,
                                  per_stream=per_stream)
            assert got.shape == symbols.shape
            np.testing.assert_array_equal(got, symbols)


def test_batch_coder_fallback_paths(monkeypatch):
    """With the native lib unavailable the batch APIs loop the scalar
    (pure-Python twin) paths and still round-trip."""
    rng = np.random.default_rng(8)
    table = _random_table(rng)
    monkeypatch.setattr(rc, "_get_lib", lambda: None)
    indexes = rng.integers(0, table.rows, (3, 7)).astype(np.int32)
    symbols = (table.offset[indexes]
               + rng.integers(0, 2, (3, 7))).astype(np.int32)
    datas = rc.encode_batch(symbols, indexes, table)
    np.testing.assert_array_equal(
        rc.decode_batch(datas, indexes, table, per_stream=True), symbols)


def test_range_coder_rate_near_entropy():
    """Coding cost ≈ entropy of the quantized Gaussian within ~1%."""
    rng = np.random.default_rng(2)
    table = build_gaussian_cdf()
    sigma_idx = 40  # a mid-table scale
    sigma = default_scale_table()[sigma_idx]
    n = 50000
    symbols = np.round(rng.normal(0, sigma, n)).astype(np.int32)
    indexes = np.full(n, sigma_idx, np.int32)
    data = rc.encode(symbols, indexes, table)
    bits = len(data) * 8
    # true entropy of the discretized Gaussian
    k = np.arange(-5000, 5001)
    from scipy.stats import norm

    p = norm.cdf((k + 0.5) / sigma) - norm.cdf((k - 0.5) / sigma)
    p = p[p > 0]
    h = -(p * np.log2(p)).sum()
    assert bits / n < h * 1.01 + 64 / n, f"rate {bits/n:.4f} vs entropy {h:.4f}"
    np.testing.assert_array_equal(rc.decode(data, indexes, table), symbols)


def test_gaussian_cdf_table_shape_and_determinism():
    t1 = build_gaussian_cdf()
    t2 = build_gaussian_cdf()
    np.testing.assert_array_equal(t1.cdf, t2.cdf)
    assert t1.rows == 64
    # symmetric support: offset = -center, length = 2*center+3
    centers = -t1.offset
    np.testing.assert_array_equal(t1.cdf_length, 2 * centers + 3)


def test_gaussian_conditional_indexes_match_reference_semantics():
    gc = GaussianConditional()
    table = gc.scale_table
    sigma = jnp.asarray(
        np.array([0.01, table[0], table[0] + 1e-4, 1.0, 255.0, 256.0, 300.0])
    )
    sigma_b = gc.bound_scale(sigma)
    idx = np.asarray(gc.indexes(sigma_b))
    # reference semantics: idx = (len-1) - #{k < len-1 : sigma <= table[k]}
    expect = []
    for s in np.asarray(sigma_b):
        expect.append(63 - int(np.sum(s <= table[:-1])))
    np.testing.assert_array_equal(idx, expect)
    assert idx[0] == 0 and idx[-1] == 63


def test_gaussian_likelihood_sums_to_one():
    gc = GaussianConditional()
    sigma = jnp.full((1,), 3.0)
    ks = jnp.arange(-60, 61).astype(jnp.float32)
    p = np.asarray(jax.vmap(lambda k: gc.likelihood(k[None], sigma))(ks))
    assert abs(p.sum() - 1.0) < 1e-4


def test_factorized_prior_basics():
    fp = FactorizedPrior(channels=4)
    rng = jax.random.PRNGKey(0)
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 3, 3, 4)) * 5
    params = fp.init(rng, y, training=True, noise_rng=jax.random.PRNGKey(2))
    y_tilde, p = fp.apply(params, y, training=True,
                          noise_rng=jax.random.PRNGKey(3))
    assert y_tilde.shape == y.shape and p.shape == y.shape
    assert np.all(np.asarray(p) > 0) and np.all(np.asarray(p) <= 1)
    assert np.all(np.abs(np.asarray(y_tilde - y)) <= 0.5 + 1e-6)
    # eval mode: integer grid around medians
    y_hat, _ = fp.apply(params, y, training=False)
    med = np.asarray(
        fp.apply(params, method=FactorizedPrior.medians)
    )
    frac = np.asarray(y_hat) - med[None, None, None, None, :]
    np.testing.assert_allclose(frac, np.round(frac), atol=1e-5)
    aux = fp.apply(params, method=FactorizedPrior.aux_loss)
    assert np.isfinite(float(aux))


def test_factorized_cdf_roundtrip_through_coder():
    """Symbols drawn from the (untrained) prior roundtrip via its CDF table."""
    fp = FactorizedPrior(channels=3)
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 2, 3)) * 8
    params = fp.init(jax.random.PRNGKey(0), y, training=True,
                     noise_rng=jax.random.PRNGKey(2))
    table = build_factorized_cdf(params["params"])
    symbols = np.asarray(
        fp.apply(params, y, method=FactorizedPrior.quantize_symbols)
    )
    # channel index per element (NDHWC -> channel-major like encode order)
    idx = np.broadcast_to(np.arange(3, dtype=np.int32), symbols.shape)
    data = rc.encode(symbols, idx, table)
    out = rc.decode(data, idx, table)
    np.testing.assert_array_equal(out, symbols.ravel().reshape(out.shape))
    # dequantize matches y_hat from eval-mode call
    deq = np.asarray(
        fp.apply(params, jnp.asarray(out.reshape(symbols.shape)),
                 method=FactorizedPrior.dequantize_symbols)
    )
    y_hat, _ = fp.apply(params, y, training=False)
    np.testing.assert_allclose(deq, np.asarray(y_hat), atol=1e-5)


def test_factorized_cdf_deterministic():
    fp = FactorizedPrior(channels=2)
    y = jnp.zeros((1, 2, 2, 2, 2))
    params = fp.init(jax.random.PRNGKey(0), y, training=False)
    t1 = build_factorized_cdf(params["params"])
    t2 = build_factorized_cdf(params["params"])
    np.testing.assert_array_equal(t1.cdf, t2.cdf)
    np.testing.assert_array_equal(t1.offset, t2.offset)


def test_refine_factorized_quantiles_solves_targets():
    """Bisection lands each quantile on its cumulative target even when the
    learned quantiles lag (the aux-optimizer failure mode of round 4)."""
    from pcc_geo_cnn_v2_tpu.models.entropy import (
        _logits_cumulative_np,
        refine_factorized_quantiles,
    )

    fp = FactorizedPrior(channels=5)
    y = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 2, 2, 5))
    params = jax.tree_util.tree_map(
        np.asarray,
        fp.init(jax.random.PRNGKey(0), y, training=False)["params"],
    )
    # simulate a badly lagged aux optimizer: quantiles way off target
    params["quantiles"] = np.tile(
        np.array([[-37.0, 12.0, 55.0]], np.float32), (5, 1)
    )
    refined = refine_factorized_quantiles(params, tail_mass=1e-9)
    q = refined["quantiles"]
    assert q.shape == (5, 3)
    assert np.all(q[:, 0] < q[:, 1]) and np.all(q[:, 1] < q[:, 2])
    t = 1e-9
    targets = np.log(
        np.array([t / 2, 0.5, 1 - t / 2]) / np.array([1 - t / 2, 0.5, t / 2])
    )
    logits = _logits_cumulative_np(params, q[:, None, :].astype(np.float64))
    # each solved point is within bisection resolution of its target
    np.testing.assert_allclose(
        logits[:, 0, :], np.broadcast_to(targets, (5, 3)),
        rtol=1e-5, atol=1e-4,
    )
    # deterministic: a second solve is bit-identical
    again = refine_factorized_quantiles(params, tail_mass=1e-9)
    np.testing.assert_array_equal(q, again["quantiles"])


def test_codec_refines_quantiles_consistently():
    """BlockCodec.set_params refines the EB quantiles before deriving the
    CDF table and the device medians, so encode/decode stay consistent
    and the table support tracks the actual density, not the lagged
    learned quantiles."""
    from pcc_geo_cnn_v2_tpu.codec import BlockCodec
    from pcc_geo_cnn_v2_tpu.models.configs import build_model

    from pcc_geo_cnn_v2_tpu.models.entropy import (
        refine_factorized_quantiles,
    )

    model = build_model("c1")
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = jax.tree_util.tree_map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), x, training=True,
                   noise_rng=jax.random.PRNGKey(1)),
    )
    # plant lagged quantiles; the codec must not trust them
    planted = np.tile(np.array([[-100.0, 7.0, 100.0]], np.float32),
                      (model.num_filters, 1))
    params["params"]["entropy_bottleneck"]["quantiles"] = planted.copy()
    codec = BlockCodec(model, params, block_size=16)
    got = codec.params_host["params"]["entropy_bottleneck"]["quantiles"]
    want = refine_factorized_quantiles(
        {k: np.asarray(v)
         for k, v in params["params"]["entropy_bottleneck"].items()}
    )["quantiles"]
    assert not np.allclose(got, planted)  # planted values were replaced
    np.testing.assert_array_equal(got, want)  # by the deterministic solve
    # the CDF table derives from the refined quantiles (support check)
    medians = want[:, 1]
    minima = np.maximum(np.ceil(medians - want[:, 0]).astype(int), 0)
    np.testing.assert_array_equal(codec.eb_table.offset, -minima)
