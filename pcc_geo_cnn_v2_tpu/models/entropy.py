"""Entropy models: learned factorized prior + conditional Gaussian, in JAX.

Reimplements the semantics the reference gets from tensorflow-compression 1.3
(``tfc.EntropyBottleneck`` / ``tfc.GaussianConditional``, used at
``/root/reference/src/model_types.py:254,333,340,377-391``):

- **FactorizedPrior** — per-channel univariate density modeled by a small
  monotone MLP (the Ballé 2018 "deep factorized" model): K+1 layers of
  softplus-reparameterized matrices, biases, and tanh factors; trainable
  quantiles track the two tails and the median. Training uses additive
  uniform noise; inference quantizes to integers around the median.
- **GaussianConditional** — zero-mean Gaussian likelihoods with scales
  drawn from a fixed 64-entry log-spaced table; per-element table index is
  the smallest table scale ≥ the predicted scale (reference index math at
  ``utils/patch_gaussian_conditional.py:104-116``).
- **CDF tables** — deterministic float64 host-side construction of the
  quantized integer CDFs consumed by the range coder (reference CDF build
  at ``patch_gaussian_conditional.py:62-100``). Tables are a pure function
  of checkpoint parameters, so encoder and decoder always agree — the
  determinism the reference chased with a 100-retry debug loop
  (``decompress_octree.py:69-131``) is designed in here.

Everything under ``__call__``/likelihood runs on TPU inside jit; table
construction and arithmetic coding are host-side by design.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import erfc as _erfc

__all__ = [
    "lower_bound",
    "FactorizedPrior",
    "GaussianConditional",
    "CdfTable",
    "pmf_to_quantized_cdf",
    "build_factorized_cdf",
    "build_gaussian_cdf",
    "default_scale_table",
]

LIKELIHOOD_BOUND = 1e-9
RANGE_CODER_PRECISION = 16


@jax.custom_vjp
def lower_bound(x, bound):
    """max(x, bound) with a gradient that can push x back up.

    Gradient passes through when ``x >= bound`` or when the upstream
    gradient would increase x (tfc's ``math_ops.lower_bound`` semantics —
    plain max would dead-zone scales stuck below the bound).
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def default_scale_table(scales_min=0.11, scales_max=256.0, levels=64):
    """Log-spaced scale table (reference ``model_types.py:324``)."""
    return np.exp(np.linspace(np.log(scales_min), np.log(scales_max), levels))


# ---------------------------------------------------------------------------
# Factorized prior (EntropyBottleneck)
# ---------------------------------------------------------------------------


class FactorizedPrior(nn.Module):
    """Learned per-channel factorized entropy model.

    Operates on NDHWC tensors; the density is independent per channel and
    shared over batch/spatial positions.
    """

    channels: int
    filters: tuple = (3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9

    def setup(self):
        dims = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1.0 / (len(self.filters) + 1))
        matrices, biases, factors = [], [], []
        for k in range(len(self.filters) + 1):
            init_m = float(np.log(np.expm1(1.0 / scale / dims[k + 1])))
            matrices.append(
                self.param(
                    f"matrix_{k}",
                    lambda rng, shape, v=init_m: jnp.full(shape, v, jnp.float32),
                    (self.channels, dims[k + 1], dims[k]),
                )
            )
            biases.append(
                self.param(
                    f"bias_{k}",
                    lambda rng, shape: jax.random.uniform(
                        rng, shape, jnp.float32, -0.5, 0.5
                    ),
                    (self.channels, dims[k + 1], 1),
                )
            )
            if k < len(self.filters):
                factors.append(
                    self.param(
                        f"factor_{k}",
                        nn.initializers.zeros,
                        (self.channels, dims[k + 1], 1),
                    )
                )
        self._matrices = matrices
        self._biases = biases
        self._factors = factors
        self.quantiles = self.param(
            "quantiles",
            lambda rng, shape: jnp.tile(
                jnp.array([[-self.init_scale, 0.0, self.init_scale]], jnp.float32),
                (self.channels, 1),
            ),
            (self.channels, 3),
        )

    def _logits_cumulative(self, x, stop_params=False):
        """Monotone logit of the cumulative; x: [C, 1, M] -> [C, 1, M].

        ``stop_params=True`` blocks gradients into the density parameters
        (used by the aux loss so it only moves the quantiles, as in tfc's
        ``_logits_cumulative(..., stop_gradient=True)``).
        """
        sg = jax.lax.stop_gradient if stop_params else (lambda t: t)
        u = x
        n_layers = len(self.filters) + 1
        for k in range(n_layers):
            m = jax.nn.softplus(sg(self._matrices[k]))
            u = jnp.einsum("cij,cjm->cim", m, u) + sg(self._biases[k])
            if k < len(self._factors):
                u = u + jnp.tanh(sg(self._factors[k])) * jnp.tanh(u)
        return u

    def medians(self):
        return self.quantiles[:, 1]

    def _likelihood(self, y_cm):
        """Likelihood of integer-width bins at y; y_cm: [C, 1, M]."""
        lo = self._logits_cumulative(y_cm - 0.5)
        hi = self._logits_cumulative(y_cm + 0.5)
        # Evaluate in whichever tail is more precise (tfc sign trick).
        sign = jax.lax.stop_gradient(-jnp.sign(lo + hi))
        p = jnp.abs(jax.nn.sigmoid(sign * hi) - jax.nn.sigmoid(sign * lo))
        return p

    def __call__(self, y, training: bool, noise_rng=None):
        """Quantize (or add noise) and return (y_tilde, likelihoods).

        :param y: [..., C] tensor (NDHWC).
        """
        c = y.shape[-1]
        assert c == self.channels
        flat = jnp.moveaxis(y, -1, 0).reshape(c, 1, -1)
        medians = self.medians()[:, None, None]
        if training:
            assert noise_rng is not None, "training quantization needs an rng"
            noise = jax.random.uniform(noise_rng, flat.shape, flat.dtype, -0.5, 0.5)
            y_tilde = flat + noise
        else:
            y_tilde = jnp.round(flat - medians) + medians
        p = self._likelihood(y_tilde)
        p = lower_bound(p, LIKELIHOOD_BOUND)
        restore = lambda t: jnp.moveaxis(t.reshape((c,) + y.shape[:-1]), 0, -1)
        return restore(y_tilde), restore(p)

    def aux_loss(self):
        """Drives quantiles to (t/2, 1/2, 1-t/2) cumulative targets.

        The reference minimizes this with a separate Adam(1e-3)
        (``model_types.py:279-280``).
        """
        logits = self._logits_cumulative(self.quantiles[:, None, :],
                                         stop_params=True)
        t = self.tail_mass
        targets = jnp.log(
            jnp.array([t / 2, 0.5, 1 - t / 2]) / jnp.array([1 - t / 2, 0.5, t / 2])
        )
        return jnp.sum(jnp.abs(logits[:, 0, :] - targets[None, :]))

    def quantize_symbols(self, y):
        """Integer symbols for range coding: round(y - median). [..., C]"""
        medians = self.medians()
        return jnp.round(y - medians).astype(jnp.int32)

    def dequantize_symbols(self, symbols):
        """Inverse of :meth:`quantize_symbols` (adds medians back)."""
        return symbols.astype(jnp.float32) + self.medians()


# ---------------------------------------------------------------------------
# Conditional Gaussian (GaussianConditional)
# ---------------------------------------------------------------------------


def _std_cumulative(x):
    """Standardized Gaussian CDF via erfc (stable left tail)."""
    return 0.5 * jax.scipy.special.erfc(-x / jnp.sqrt(2.0).astype(x.dtype))


@dataclasses.dataclass(frozen=True)
class GaussianConditional:
    """Zero-mean Gaussian entropy model with a fixed scale table.

    Stateless: all methods are pure functions usable inside jit.
    """

    scale_table: np.ndarray = dataclasses.field(
        default_factory=default_scale_table
    )
    tail_mass: float = 2.0 ** -8

    def bound_scale(self, sigma):
        return lower_bound(sigma, float(self.scale_table[0]))

    def indexes(self, sigma):
        """Per-element row index: smallest table scale ≥ sigma.

        Matches the reference's foldr count-down
        (``patch_gaussian_conditional.py:104-116``).
        """
        table = jnp.asarray(self.scale_table[:-1], sigma.dtype)
        return jnp.sum(sigma[..., None] > table, axis=-1).astype(jnp.int32)

    def likelihood(self, y, sigma):
        """P(round(y) bin) under N(0, sigma²), with noise-compatible bins."""
        sigma = self.bound_scale(sigma)
        v = jnp.abs(y)
        upper = _std_cumulative((0.5 - v) / sigma)
        lower = _std_cumulative((-0.5 - v) / sigma)
        return lower_bound(upper - lower, LIKELIHOOD_BOUND)

    def __call__(self, y, sigma, training: bool, noise_rng=None):
        if training:
            assert noise_rng is not None
            noise = jax.random.uniform(noise_rng, y.shape, y.dtype, -0.5, 0.5)
            y_tilde = y + noise
        else:
            y_tilde = jnp.round(y)
        return y_tilde, self.likelihood(y_tilde, sigma)

    def quantize_symbols(self, y):
        return jnp.round(y).astype(jnp.int32)

    def dequantize_symbols(self, symbols):
        return symbols.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Quantized CDF tables (host, deterministic)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CdfTable:
    """Integer CDF rows for the range coder.

    ``cdf[r]`` holds ``cdf_length[r]`` int32 entries: 0, ...,
    2^precision. Row r describes ``cdf_length[r] - 2`` regular buckets plus
    one escape bucket (index ``cdf_length[r] - 2``). A symbol ``s`` maps to
    bucket ``s - offset[r]``; out-of-range symbols are escape-coded.
    (Same row layout as tfc 1.3; see ``patch_gaussian_conditional.py:83-100``.)
    """

    cdf: np.ndarray  # int32 [rows, max_len]
    cdf_length: np.ndarray  # int32 [rows]
    offset: np.ndarray  # int32 [rows]
    precision: int = RANGE_CODER_PRECISION

    @property
    def rows(self):
        return self.cdf.shape[0]


def pmf_to_quantized_cdf(pmf, precision=RANGE_CODER_PRECISION):
    """Quantize a pmf (incl. trailing escape mass) to an integer CDF.

    Every bucket gets frequency ≥ 1; the total is exactly 2^precision.
    Deterministic (float64 host math), so encoder and decoder derive
    identical tables from identical parameters.
    """
    pmf = np.asarray(pmf, np.float64)
    n = len(pmf)
    assert n >= 1
    total = pmf.sum()
    if not np.isfinite(total) or total <= 0:
        pmf = np.ones(n)
        total = float(n)
    freq = np.round(pmf / total * (1 << precision)).astype(np.int64)
    freq = np.maximum(freq, 1)
    diff = (1 << precision) - freq.sum()
    if diff > 0:
        freq[np.argmax(freq)] += diff
    else:
        while diff < 0:
            i = int(np.argmax(freq))
            take = min(freq[i] - 1, -diff)
            assert take > 0, "cannot normalize pmf: too many buckets"
            freq[i] -= take
            diff += take
    cdf = np.zeros(n + 1, np.int32)
    cdf[1:] = np.cumsum(freq)
    assert cdf[-1] == (1 << precision)
    return cdf


def _logits_cumulative_np(params, x):
    """float64 numpy twin of FactorizedPrior._logits_cumulative.

    :param params: the FactorizedPrior param dict (numpy leaves).
    :param x: [C, 1, M]
    """
    u = np.asarray(x, np.float64)
    n_layers = sum(1 for k in params if k.startswith("matrix_"))
    for k in range(n_layers):
        m = np.logaddexp(0.0, np.asarray(params[f"matrix_{k}"], np.float64))
        u = np.einsum("cij,cjm->cim", m, u) + np.asarray(
            params[f"bias_{k}"], np.float64
        )
        if f"factor_{k}" in params:
            u = u + np.tanh(np.asarray(params[f"factor_{k}"], np.float64)) * np.tanh(u)
    return u


def _sigmoid_np(x):
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    e = np.exp(x[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def refine_factorized_quantiles(params, tail_mass=1e-9):
    """Solve the FactorizedPrior quantiles exactly by bisection.

    tfc trains the quantiles by SGD against the (t/2, 1/2, 1−t/2)
    cumulative targets (the aux loss, ``model_types.py:279-280``); when
    the density sharpens faster than Adam(1e-3) can chase, the learned
    quantiles lag far behind the targets — the CDF table gets the wrong
    support (escape-coding blowups) and the median used by
    quantize/dequantize drifts. ``_logits_cumulative`` is monotone in x
    (softplus-positive matrices, |tanh(factor)| < 1), so the targets can
    instead be solved directly: float64 host bisection, deterministic,
    encoder and decoder derive identical refined parameters from
    identical checkpoints.

    :param params: FactorizedPrior param dict (numpy leaves).
    :return: new dict with the ``quantiles`` leaf replaced.
    """
    params = {k: np.asarray(v) for k, v in params.items()}
    n_channels = params["quantiles"].shape[0]
    t = float(tail_mass)
    targets = np.log(
        np.array([t / 2, 0.5, 1 - t / 2]) / np.array([1 - t / 2, 0.5, t / 2])
    )
    lo = np.full((n_channels, 1, 3), -1.0)
    hi = np.full((n_channels, 1, 3), 1.0)
    for _ in range(64):  # expand until every target is bracketed
        need_lo = _logits_cumulative_np(params, lo) > targets
        need_hi = _logits_cumulative_np(params, hi) < targets
        if not need_lo.any() and not need_hi.any():
            break
        lo = np.where(need_lo, lo * 2.0, lo)
        hi = np.where(need_hi, hi * 2.0, hi)
    for _ in range(80):
        mid = 0.5 * (lo + hi)
        go_hi = _logits_cumulative_np(params, mid) < targets
        lo = np.where(go_hi, mid, lo)
        hi = np.where(go_hi, hi, mid)
    out = dict(params)
    out["quantiles"] = (0.5 * (lo + hi))[:, 0, :].astype(np.float32)
    return out


def build_factorized_cdf(params, precision=RANGE_CODER_PRECISION):
    """CDF table for a trained FactorizedPrior; one row per channel.

    tfc semantics (EntropyBottleneck CDF build): integer support
    [-minima, +maxima] around each channel's median, tails folded into the
    escape bucket.
    """
    params = jax.tree_util.tree_map(np.asarray, dict(params))
    quantiles = np.asarray(params["quantiles"], np.float64)
    medians = quantiles[:, 1]
    minima = np.maximum(np.ceil(medians - quantiles[:, 0]).astype(int), 0)
    maxima = np.maximum(np.ceil(quantiles[:, 2] - medians).astype(int), 0)
    pmf_length = minima + maxima + 1
    max_length = int(pmf_length.max())
    channels = len(medians)

    # Integer-offset samples around the median, one row per channel.
    samples = medians[:, None] + (np.arange(max_length)[None, :] - minima[:, None])
    lo = _logits_cumulative_np(params, samples[:, None, :] - 0.5)[:, 0, :]
    hi = _logits_cumulative_np(params, samples[:, None, :] + 0.5)[:, 0, :]
    sign = -np.sign(lo + hi)
    pmf = np.abs(_sigmoid_np(sign * hi) - _sigmoid_np(sign * lo))

    max_rowlen = max_length + 2
    cdf = np.zeros((channels, max_rowlen), np.int32)
    cdf_length = np.zeros(channels, np.int32)
    for c in range(channels):
        L = pmf_length[c]
        row_pmf = pmf[c, :L]
        tail = _sigmoid_np(lo[c, :1]) + _sigmoid_np(-hi[c, L - 1 : L])
        row = np.concatenate([row_pmf, np.maximum(tail, 0)])
        q = pmf_to_quantized_cdf(row, precision)
        cdf[c, : L + 2] = q
        cdf_length[c] = L + 2
    return CdfTable(cdf, cdf_length, (-minima).astype(np.int32), precision)


def build_gaussian_cdf(scale_table=None, tail_mass=2.0 ** -8,
                       precision=RANGE_CODER_PRECISION):
    """CDF table for the Gaussian conditional; one row per table scale.

    Mirrors the construction at ``patch_gaussian_conditional.py:62-100``:
    symmetric support ±ceil(scale·multiplier), left-tail evaluation for
    stability, escape mass = 2·Φ((−.5−center)/scale).
    """
    if scale_table is None:
        scale_table = default_scale_table()
    scale_table = np.asarray(scale_table, np.float64)
    from scipy.stats import norm

    multiplier = -norm.ppf(tail_mass / 2)
    pmf_center = np.ceil(scale_table * multiplier).astype(int)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())
    rows = len(scale_table)

    def cum(x):
        return 0.5 * _erfc(-x / np.sqrt(2.0))

    d = np.abs(np.arange(max_length)[None, :] - pmf_center[:, None])
    upper = cum((0.5 - d) / scale_table[:, None])
    lower = cum((-0.5 - d) / scale_table[:, None])
    pmf = upper - lower
    tail = 2 * lower[:, :1]

    cdf = np.zeros((rows, max_length + 2), np.int32)
    cdf_length = np.zeros(rows, np.int32)
    for r in range(rows):
        L = pmf_length[r]
        row = np.concatenate([pmf[r, :L], np.maximum(tail[r], 0)])
        q = pmf_to_quantized_cdf(row, precision)
        cdf[r, : L + 2] = q
        cdf_length[r] = L + 2
    return CdfTable(cdf, cdf_length, (-pmf_center).astype(np.int32), precision)
