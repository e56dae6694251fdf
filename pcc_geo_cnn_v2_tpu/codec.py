"""Batched block codec: whole point clouds through the TPU in large batches.

Replaces the reference's per-block session loop
(``/root/reference/src/model_types.py:184-238`` ``compress_blocks`` /
``decompress_blocks``) with a chunked-batch design: all occupied octree
blocks are voxelized and transformed on device in fixed-size batches under
``jit``, integer symbols and CDF-row indexes come back to the host in one
compact fetch per chunk, and the sequential range coding fans out over a
thread pool (the C++ coder releases the GIL).

Selection semantics (threshold sweep per block, best-variant-per-metric-
group over the full cloud, ``model_types.py:128-176``) are preserved
exactly; see ``utils/threshold.py``.
"""

from __future__ import annotations

import logging
import os
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from pcc_geo_cnn_v2_tpu.aot import aot_jit
from pcc_geo_cnn_v2_tpu.coding import range_coder as rc
from pcc_geo_cnn_v2_tpu.models.codec_models import (
    CompressionModelV1,
    CompressionModelV2,
)
from pcc_geo_cnn_v2_tpu.models.entropy import (
    build_factorized_cdf,
    build_gaussian_cdf,
    refine_factorized_quantiles,
)
from pcc_geo_cnn_v2_tpu.ops.voxel import (
    flatten_blocks,
    pack_coords,
    pack_points,
    unflatten_points,
    unpack_coords,
    voxelize,
)
from pcc_geo_cnn_v2_tpu.utils.metrics import compute_metrics
from pcc_geo_cnn_v2_tpu.utils.octree import departition_octree
from pcc_geo_cnn_v2_tpu.utils.threshold import compute_optimal_thresholds

logger = logging.getLogger(__name__)

__all__ = ["BlockCodec", "select_best_per_opt_metric"]


def _mk_tlog(tag):
    """PCC_TIMING=2 event logger: absolute-offset timestamps around every
    host-blocking step, for localizing tunnel/GIL/backpressure stalls that
    the phase totals hide."""
    import os
    import time

    if os.environ.get("PCC_TIMING", "0") < "2":
        return lambda label: None
    t0 = time.time()
    last = [t0]

    def tlog(label):
        now = time.time()
        logger.info("[t+%7.2fs] (+%6.2fs) %s %s",
                    now - t0, now - last[0], tag, label)
        last[0] = now

    return tlog


def _get_normals(arr, with_normals):
    if not with_normals:
        return None
    # last-3-columns slicing on a coords-only [N, 3] array would silently
    # hand the coordinates back as "normals" and corrupt every d2 metric
    assert arr.shape[1] >= 6, (
        f"d2 metrics need normal columns (x y z nx ny nz); got "
        f"{arr.shape[1]}-column points"
    )
    return arr[:, arr.shape[1] - 3:]


def _pow2_rows(idx, total):
    """Pad an index vector to the next pow2 length (≥8, ≤total rounded up).

    Data-dependent gather lengths (over-budget blocks, wide rows,
    overflow counts) change per cloud; under the axon remote compiler a
    novel shape means a fresh multi-second compile, so every
    host-computed index vector that feeds a device gather is padded to a
    pow2 bucket (the padding gathers row idx[0] again and is dropped on
    the host side).
    """
    k = len(idx)
    m = max(8, int(2 ** np.ceil(np.log2(max(k, 1)))))
    if total:
        m = min(m, max(8, int(2 ** np.ceil(np.log2(total)))))
    if m < k:
        m = k
    return np.concatenate(
        [idx, np.full(m - k, idx[0] if k else 0, idx.dtype)]
    )


def narrow_symbols(a):
    """int8 when every symbol fits, else int16, else int32.

    Encoder and decoder MUST make this choice identically: the executable
    (and hence XLA's fusion) depends on the input dtype, and the merged-
    decode bit-exactness guarantee requires both sides to run the SAME
    decoder executable. Both sides see identical symbol values (the range
    coder is lossless — unbounded symbols escape via overflow coding, as
    in the reference's coder, ``patch_gaussian_conditional.py:27-31``),
    so this range test is a consistent chooser.
    """
    a = np.asarray(a)
    if not a.size or (-128 <= a.min() and a.max() <= 127):
        return a.astype(np.int8)
    if -32768 <= a.min() and a.max() <= 32767:
        return a.astype(np.int16)
    return a.astype(np.int32)


def select_best_per_opt_metric(binstr, x_hat_list, level, opt_metrics, points,
                               resolution, with_normals,
                               opt_groups=("d1", "d2")):
    """Pick, per metric group, the candidate variant with best full-cloud PSNR.

    Mirrors ``model_types.py:128-176``: departition every candidate variant,
    compute whole-cloud metrics against the original points, argmax the
    group's PSNR.

    :param x_hat_list: list over opt_metrics of per-block point lists.
    :return: list of dicts (idx, metrics, blocks_depart, blocks_full).
    """
    assert len(opt_metrics) == len(x_hat_list)
    import time

    from scipy.spatial import cKDTree

    bbox_min = [0, 0, 0]
    bbox_max = [resolution] * 3
    t1 = cKDTree(points[:, :3], balanced_tree=False)
    metadata = []
    t_depart = t_metrics = 0.0
    for group in opt_groups:
        group_entries = [
            (name, blocks, i)
            for i, (name, blocks) in enumerate(zip(opt_metrics, x_hat_list))
            if name.startswith(group)
        ]
        if not group_entries:
            continue
        names, candidates, indexes = zip(*group_entries)
        t0 = time.time()
        departed = [
            departition_octree(blocks, binstr, bbox_min, bbox_max, level)
            for blocks in candidates
        ]
        full = [np.vstack(blocks) for blocks in departed]
        t_depart += time.time() - t0
        key = f"{group}_psnr"
        t0 = time.time()
        # empty candidates (all blocks hit the failure guard) score -inf
        metrics_full = [
            compute_metrics(points[:, :3], cloud, resolution - 1,
                            p1_n=_get_normals(points, with_normals), t1=t1)
            if len(cloud) else {key: -np.inf}
            for cloud in full
        ]
        t_metrics += time.time() - t0
        logger.info("select group %s: %d candidates, %d dec pts, "
                    "depart %.2fs, metrics %.2fs", group, len(candidates),
                    len(full[0]), t_depart, t_metrics)
        scores = [m[key] for m in metrics_full]
        local_best = int(np.argmax(scores))
        best_idx = indexes[local_best]
        logger.info("group %s: best %s (%s=%.2f)", group,
                    opt_metrics[best_idx], key, scores[local_best])
        metadata.append(
            {
                "idx": best_idx,
                "metrics": metrics_full[local_best],
                "x_hat_list": candidates[local_best],
                "blocks_depart": departed[local_best],
                "blocks_full": full[local_best],
            }
        )
    return metadata


class BlockCodec:
    """Drives a trained compression model over lists of octree blocks."""

    def __init__(self, model, params, block_size=64, n_thresholds=2 ** 8,
                 batch_blocks=32, threads=8, sweep_backend="auto",
                 devices=None, coord_budget=None):
        """:param devices: optional device list; block chunks round-robin
        across them with replicated params (octree blocks are embarrassingly
        parallel — no collectives needed, linear scaling over a slice).
        :param coord_budget: unused, accepted for call-site compatibility
        (reconstructions travel as packed 1-bit mask rows, B³/8
        bytes/block, and become coordinate lists via the native
        single-pass bit walker — the compact-position transfer this knob
        once sized was removed in r4)."""
        del coord_budget
        self.model = model
        self.block_size = int(block_size)
        self.thresholds = np.linspace(0, 1.0, n_thresholds)
        self.batch_blocks = int(batch_blocks)
        self.threads = threads
        if sweep_backend == "auto":
            sweep_backend = ("bucket" if jax.default_backend() == "tpu"
                             else "xla")
        self.sweep_backend = sweep_backend
        # candidate budget of the bucket sweep (ops/bucket_sweep); blocks
        # with more voxels above thresholds[0] fall back to the exact XLA
        # sweep (at 20480 every bench cloud still overflowed 9-19 dense
        # blocks and paid a rerun; 32768 makes overflow pathological-only)
        self.bucket_k = 32768
        # NOTE every _dec_fn call must use the SAME batch width
        # (batch_blocks): a differently-shaped conv executable may
        # reassociate accumulations on TPU, flipping borderline mask
        # bits and breaking the decoder-bit-exactness contract (observed
        # on real hardware when a 16-wide rerun decode was tried, r3
        # bench 03:38). The overflow rerun therefore never re-decodes:
        # it GATHERS the canonical x_hat rows kept from the phase-B
        # chunks (gathers are exact) and re-sweeps only those rows at
        # this narrow fixed width — elementwise mask compares are
        # batch-width-independent, so bit-exactness is preserved while
        # the rerun costs a W-wide exact sweep instead of the bs-wide
        # decode+sweep that measured 7-14 s/cloud at bs=128 (r4 bench).
        self.rerun_width = 16
        # nonzero-slot budget of the sparse y-symbol transfer (trained
        # models emit ~99% zeros; measured ≤580 nonzeros/block on the
        # bench checkpoint); denser blocks re-fetch their full rows
        self.sym_nz_budget = 2048
        # chunk size / halo width of the full-cloud halo-metric pass
        # (single knobs so the warmup compiles the same shapes the run
        # uses; smaller halo = cheaper banded EDTs but more host-resolved
        # outliers)
        self.halo_batch = 64
        self.halo_width = 12
        # EDT band of the point-based d2 threshold sweep (d2_sweep_pts):
        # picks are exact whenever every original point is within this
        # many voxels of the candidate set; None = exact full-grid argmin
        # EDT (CPU/test parity). PCC_D2_BAND overrides ('none' for exact).
        _b = os.environ.get("PCC_D2_BAND", "12")
        self.d2_band = None if _b.lower() == "none" else int(_b)
        self.is_v2 = isinstance(model, CompressionModelV2)
        assert self.is_v2 or isinstance(model, CompressionModelV1)
        self.devices = list(devices) if devices else None
        self.set_params(params)
        if self.is_v2:
            self.gc_table = build_gaussian_cdf(
                model.conditional.scale_table, model.conditional.tail_mass
            )

        # One fused executable per pass: eager op dispatch is
        # pathologically slow over the remote-TPU tunnel.
        # (set_params above established self.params/eb_table; weights are
        # traced ARGUMENTS of every jitted pass, so swapping them later
        # reuses all compiled executables — see set_params.)
        size = self.block_size
        # cross-process executable cache ($PCC_AOT_CACHE, see aot.py);
        # deserialized executables are device-bound, so multi-device
        # round-robin instances stay on the plain jit path
        self._aot_ok = not self.devices or len(self.devices) <= 1
        self._encode = aot_jit(
            lambda params, pts: self.model.apply(
                params, voxelize(pts, size), method=self.model.encode
            ),
            name="encode", enabled=self._aot_ok,
        )
        self._encode_syms_cache = {}
        self._sweep_mask_cache = {}

        # Bit-exactness contract: x_hat probability grids are ALWAYS
        # materialized by ONE shared decode executable (``_dec_fn``) on
        # both encoder and decoder; thresholding/bit-packing then operate
        # on identical concrete f32 values, so mask computations may live
        # in different executables (f32 compare is exact — no fusion can
        # change it). The reference approximated this property with a
        # 100-retry debug loop (``decompress_octree.py:64-131``).
        def _mask_pack_only(x_hat, thr):
            """Packed 1-bit mask per block, WITHOUT the compact position
            scan/scatter. The decoder fetches these rows (B³/8 bytes per
            block — about the same tunnel bytes as the pos+count compact
            transfer once over-budget row re-fetches are counted) and
            decodes ALL coordinates with the native single-pass bit
            walker; dropping the two-level scan + scatter cuts the
            dec_mask device pass and removes the per-cloud over-budget
            row gather wait (~1.6 s on the r4 decode trace)."""
            mask = x_hat[..., 0] > thr[:, None, None, None]
            flat = mask.reshape(mask.shape[0], -1)
            return {"packed": jnp.packbits(flat, axis=-1, bitorder="big")}

        self._mask_only_raw = _mask_pack_only      # for use inside jits
        self._mask_pack_only = aot_jit(_mask_pack_only, name="mask_only",
                                       enabled=self._aot_ok)
        # canonical-feed casts for wide clouds (jitted: eager dtype casts
        # are synchronous tunnel round-trips)
        self._cast16 = jax.jit(lambda a: a.astype(jnp.int16))
        if self.is_v2:
            self._decode_z = aot_jit(
                lambda params, s: self.model.apply(
                    params, s, method=self.model.decode_z
                )[1].astype(jnp.uint8),
                name="decode_z", enabled=self._aot_ok,
            )
            self._dec_fn = aot_jit(
                lambda params, s: self.model.apply(
                    params, s, method=self.model.decode_y),
                name="decode_y", enabled=self._aot_ok,
            )
        else:
            self._dec_fn = aot_jit(
                lambda params, s: self.model.apply(
                    params, s, method=self.model.decode),
                name="decode_v1", enabled=self._aot_ok,
            )

    def set_params(self, params):
        """Swap model weights without touching the compile cache.

        Weights are traced *arguments* of every jitted executable, so a
        λ-sweep (tools/rd_eval.py) reuses one codec instance — and every
        compiled pass — across checkpoints instead of paying the remote
        compile set per λ. Rebuilds the derived factorized-prior CDF
        table (checkpoint-dependent); the Gaussian scale table is
        model-static.

        ``self.params`` is committed to the device once here: host
        (numpy) pytrees are re-uploaded on EVERY jitted dispatch, which
        over the remote-TPU tunnel cost ~0.6 s of weight upload per
        64-block chunk — more than the chunk's compute.
        """
        self.params_host = jax.device_get(params)
        # Re-solve the factorized-prior quantiles before anything derives
        # from them (CDF table support + the median offsets baked into
        # quantize/dequantize): the aux optimizer chases a moving target
        # during training and can lag badly (see
        # refine_factorized_quantiles). Deterministic float64 host math,
        # so a separate decode process reaches identical parameters.
        eb = dict(self.params_host["params"]["entropy_bottleneck"])
        eb["quantiles"] = refine_factorized_quantiles(eb)["quantiles"]
        self.params_host = {
            **self.params_host,
            "params": {**self.params_host["params"],
                       "entropy_bottleneck": eb},
        }
        params = self.params_host
        if self.devices:
            self._params_per_dev = [
                jax.device_put(params, d) for d in self.devices
            ]
            self.params = self._params_per_dev[0]
        else:
            self.params = jax.device_put(params)
        self.eb_table = build_factorized_cdf(
            self.params_host["params"]["entropy_bottleneck"]
        )

    # -- shape helpers ----------------------------------------------------

    @property
    def y_shape(self):
        b = self.block_size // 8
        return (b, b, b, self.model.num_filters)

    @property
    def z_shape(self):
        b = self.block_size // 16
        return (b, b, b, self.model.num_filters)

    def _channel_indexes(self, shape):
        return np.broadcast_to(
            np.arange(shape[-1], dtype=np.int32), shape
        )

    @staticmethod
    def _compact(out, narrow=False):
        """Shrink device→host transfer dtypes; tunnel bandwidth is scarce.

        With ``narrow``, symbols travel as int8 plus per-block counts of
        values outside int8 (``*_wide``) and outside int16 (``*_wide16``)
        — trained models rarely emit |symbol| > 127, and the few blocks
        that do are re-fetched at full width from the retained device
        copy (see :meth:`_widen_symbols`). A divergent model that emits
        |symbol| > 32767 therefore still encodes correctly (int32 path)
        instead of aborting. Quarters the dominant device→host stream.
        """
        compact = dict(out)
        for key in ("y_sym", "z_sym"):
            if key in compact:
                s32 = compact[key]
                s16 = jnp.clip(s32, -32768, 32767).astype(jnp.int16)
                wide16 = jnp.sum(
                    (s16.astype(jnp.int32) != s32).astype(jnp.int32),
                    axis=tuple(range(1, s32.ndim)),
                )
                if narrow:
                    s8 = jnp.clip(s16, -128, 127).astype(jnp.int8)
                    wide = jnp.sum(
                        (s8.astype(jnp.int16) != s16).astype(jnp.int32),
                        axis=tuple(range(1, s16.ndim)),
                    )
                    compact[key] = s8
                    compact[f"{key}_wide"] = wide
                else:
                    compact[key] = s16
                compact[f"{key}_wide16"] = wide16
        if "y_idx" in compact:
            compact["y_idx"] = compact["y_idx"].astype(jnp.uint8)
        return compact

    # -- device passes in chunks ------------------------------------------

    def _run_chunked(self, fn, arrays, n, keep_device=(), also_device=False,
                     device_copies=(), defer=False):
        """Apply a jitted per-batch fn over n items, padding the last chunk.

        All chunks are dispatched before any result is fetched — JAX's async
        dispatch pipelines device compute with host transfers. Inputs may be
        device arrays (chunk slicing then happens on device — chaining
        passes without tunnel round-trips). An entry of ``arrays`` may also
        be a callable ``c(lo, hi, bs) -> tuple_of_arrays`` building that
        chunk's (already padded) inputs — used for ragged streams whose
        per-chunk shape is not a slice (see the flat point upload in
        :meth:`compress_blocks_device_opt`).

        :param keep_device: dict-output keys to keep ONLY as one device
            array (never crossing the tunnel); returns
            ``(host_out, device_out)``.
        :param also_device: array-output variant — return the host copy and
            the concatenated device array.
        :param device_copies: dict-output keys to keep on device IN ADDITION
            to the host copy (merged into the ``keep_device`` dict).
        :param defer: return a zero-arg finisher instead of results —
            dispatch happens now, the host fetch happens when the finisher
            is called. Lets a cheap pass's big fetch overlap a later
            pass's device compute (dispatch both, then fetch).
        """
        import os
        import time

        timing = os.environ.get("PCC_TIMING")
        t_build = t_put = t_disp = 0.0
        outs = []
        bs = self.batch_blocks
        for k, lo in enumerate(range(0, n, bs)):
            hi = min(lo + bs, n)
            t0 = time.time()
            chunk = []
            for a in arrays:
                if callable(a):
                    chunk.extend(a(lo, hi, bs))
                    continue
                c = a[lo:hi]
                if hi - lo < bs:
                    xp = jnp if isinstance(c, jax.Array) else np
                    c = xp.concatenate(
                        [c, xp.zeros((bs - (hi - lo),) + c.shape[1:],
                                     c.dtype)]
                    )
                chunk.append(c)
            t1 = time.time()
            if self.devices:
                dev = self.devices[k % len(self.devices)]
                params = self._params_per_dev[k % len(self.devices)]
                chunk_dev = [jax.device_put(c, dev) for c in chunk]
            else:
                params = self.params
                chunk_dev = [jnp.asarray(c) for c in chunk]
            t2 = time.time()
            outs.append(fn(params, *chunk_dev))
            t_build += t1 - t0
            t_put += t2 - t1
            t_disp += time.time() - t2
        def _concat_on_one_device(parts):
            if self.devices:  # round-robin leaves parts on many devices
                parts = [jax.device_put(p, self.devices[0]) for p in parts]
            return jnp.concatenate(parts)[:n]

        dev_keep = {}
        for key in keep_device:
            dev_keep[key] = _concat_on_one_device([o.pop(key) for o in outs])
        for key in device_copies:
            dev_keep[key] = _concat_on_one_device([o[key] for o in outs])
        dev_full = None
        if also_device:
            dev_full = _concat_on_one_device(outs)

        def finish():
            t3 = time.time()
            host = jax.device_get(outs)
            if timing:
                logger.info(
                    "_run_chunked(%d items, %d chunks): build %.2fs, put "
                    "%.2fs, dispatch %.2fs, keep/concat+fetch %.2fs",
                    n, -(-n // bs), t_build, t_put, t_disp,
                    time.time() - t3,
                )
            stitched = jax.tree_util.tree_map(
                lambda *xs: np.concatenate(xs), *host)
            stitched = jax.tree_util.tree_map(lambda a: a[:n], stitched)
            if keep_device or device_copies:
                return stitched, dev_keep
            if also_device:
                return stitched, dev_full
            return stitched

        return finish if defer else finish()

    def _gather_full_rows(self, key, gidx, syms_dev):
        """Fetch full-width rows for global block indexes from the
        per-chunk device-retained arrays (pow2-padded gathers — variable
        row counts would compile fresh remote executables per cloud)."""
        bs = self.batch_blocks
        sample = syms_dev[0][key]
        rows = np.empty((len(gidx),) + sample.shape[1:],
                        np.dtype(sample.dtype))
        for k in sorted(set(gidx // bs)):
            m = gidx // bs == k
            loc = (gidx[m] - k * bs).astype(np.int32)
            padded = _pow2_rows(loc, bs)
            got = jax.device_get(
                jnp.take(syms_dev[k][key], jnp.asarray(padded), axis=0))
            rows[m] = got[: int(m.sum())]
        return rows

    def _widen_symbols_chunks(self, out, syms_dev, n):
        """Exact host symbols + per-chunk canonical decoder feeds.

        Chunked counterpart of :meth:`_widen_symbols` (same dtype
        contract — see its docstring): the host dtype per tensor mirrors
        the decoder's :func:`narrow_symbols` choice over the whole cloud;
        feeds[k] holds the decoder-canonical device arrays for chunk k
        (int8 copies in the common case, jit-cast full-width otherwise).
        """
        tlog = _mk_tlog("widen")
        if "y_nzpos" in out:
            # rebuild the dense int8 grid from the sparse transfer
            pos = out.pop("y_nzpos")
            val = out.pop("y_nzval")
            cnt = out.pop("y_nzcnt")
            nzb = pos.shape[1]
            flat = np.zeros((n, int(np.prod(self.y_shape))), np.int8)
            valid = np.arange(nzb)[None, :] < np.minimum(cnt, nzb)[:, None]
            flat[np.nonzero(valid)[0], pos[valid]] = val[valid]
            over = np.nonzero(cnt > nzb)[0]
            if len(over):
                rows = self._gather_full_rows("y_sym_full", over, syms_dev)
                flat[over] = np.clip(rows, -128, 127).astype(
                    np.int8).reshape(len(over), -1)
                logger.info("re-fetched %d blocks over the %d-nonzero "
                            "symbol budget", len(over), nzb)
            out["y_sym"] = flat.reshape((n,) + self.y_shape)
        tlog("sparse y rebuilt")
        feeds = [dict() for _ in syms_dev]
        for key in ("y_sym", "z_sym") if self.is_v2 else ("y_sym",):
            wide = np.nonzero(out.pop(f"{key}_wide"))[0]
            wide16 = int(np.sum(out.pop(f"{key}_wide16")))
            dtype = (np.int32 if wide16 else
                     np.int16 if len(wide) else np.int8)
            out[key] = out[key].astype(dtype)
            for k, devk in enumerate(syms_dev):
                if dtype == np.int8:
                    feeds[k][key] = devk[key]
                elif dtype == np.int16:
                    feeds[k][key] = self._cast16(devk[f"{key}_full"])
                else:
                    feeds[k][key] = devk[f"{key}_full"]
            if len(wide):
                rows = self._gather_full_rows(
                    f"{key}_full", wide, syms_dev).astype(dtype)
                out[key][wide] = rows
                logger.info("re-fetched %d wide %s blocks as %s",
                            len(wide), key, np.dtype(dtype).name)
            tlog(f"{key} widened ({np.dtype(dtype).name})")
        return feeds

    # -- encode ------------------------------------------------------------

    def _flat_budget(self, offsets):
        """Pow2 flat-stream budget covering every chunk's true total."""
        bs = self.batch_blocks
        n = len(offsets) - 1
        totals = [int(offsets[min(lo + bs, n)] - offsets[lo])
                  for lo in range(0, n, bs)]
        return max(int(2 ** np.ceil(np.log2(max(totals)))), 64)

    def warmup(self, blocks, opt_metrics=("d1_mse",), max_deltas=(np.inf,),
               with_normals=False, point_budget=None, flat_budget=None):
        """Compile + run every executable of the codec path on one chunk.

        Uses the full block list only to reproduce the point-budget the
        real run will pack with (budget changes the executable shape);
        ``point_budget``/``flat_budget`` override — pass the same values
        to :meth:`compress_blocks_device_opt` when encoding several
        clouds so all calls share one executable set.
        """
        budget = point_budget or max(
            int(2 ** np.ceil(np.log2(max(len(b) for b in blocks)))), 64
        )
        bs = self.batch_blocks
        sub_blocks = blocks[:bs]
        flat, offsets = flatten_blocks(sub_blocks)
        if flat_budget is None:
            # derive from ALL blocks (not just the warmup chunk) so a
            # later chunk with a larger point total reuses the warmed
            # executable instead of forcing a mid-run recompile — this
            # mirrors compress_blocks_device_opt's own derivation
            full_offs = np.zeros(len(blocks) + 1, np.int64)
            np.cumsum([len(b) for b in blocks], out=full_offs[1:])
            flat_budget = self._flat_budget(full_offs)
        fc = np.zeros(flat_budget, np.uint32)
        fc[: len(flat)] = pack_coords(flat, self.block_size)
        offs = np.full(bs + 1, len(flat), np.int32)
        offs[: len(offsets)] = offsets
        arrays = [jnp.asarray(fc), jnp.asarray(offs)]
        if with_normals:
            nf = flatten_blocks(sub_blocks, cols=(3, 4, 5),
                                dtype=np.float32)[0]
            nc = np.zeros((flat_budget, 3), np.float32)
            nc[: len(nf)] = nf
            arrays.append(jnp.asarray(nc))
        out = self._encode_syms_fn(with_normals, point_budget=budget)(
            self.params, *arrays
        )
        # same widen step as the real run (full-width copies stay on
        # device; only int8 + counts cross the tunnel), so warmup encodes
        # correct symbols even for |sym| > 127 blocks. The int16 decoder
        # executables are warmed explicitly below (warm_wide_dec) even
        # when this chunk is int8-only.
        dev_only = ("pts16", "nrm")
        dev_keep = {k: out[k] for k in list(out)
                    if k.endswith("_full") or k in ("y_sym", "z_sym")
                    or k in dev_only}
        for k in list(out):
            if k.endswith("_full") or k in dev_only or k == "y_sym":
                out.pop(k)  # y_sym host copy comes from the sparse rebuild
        out = jax.device_get(out)
        out.pop("dup_count", None)  # padding blocks alias (0,0,0)
        feeds = self._widen_symbols_chunks(out, [dev_keep], bs)[0]
        if self.is_v2:
            out["y_idx"] = jax.device_get(
                self._decode_z(self.params, feeds["z_sym"])
            )
        # canonical decode + sweep + masks on the same chunk
        x_hat = self._dec_fn(self.params, feeds["y_sym"])
        sweep_mask = self._sweep_mask_fn(opt_metrics, max_deltas,
                                         with_normals)
        sm_args = [self.params, out["packed_occ"], x_hat,
                   dev_keep["pts16"]]
        if with_normals:
            sm_args.append(dev_keep["nrm"])
        mid_thr = len(self.thresholds) // 2
        payload = [(self.entropy_encode(out, i), mid_thr) for i in range(2)]
        from pcc_geo_cnn_v2_tpu.ops.cloud_metrics import blockwise_d1_sums

        packed = out["packed_occ"]
        origins = np.arange(len(packed))[:, None] * np.array(
            [[self.block_size, 0, 0]]
        )
        # the three remaining branches compile DISTINCT executables (the
        # sweep kernel, the decoder path, the halo-metric kernels) — under
        # the axon remote compiler each costs 1-3 min, so issue them from
        # separate threads and pay the max, not the sum
        gate_bucket = self.sweep_backend == "bucket" and not with_normals
        exact_fut = None

        def warm_sweep():
            try:
                res = sweep_mask(*sm_args)
                picks = np.asarray(jax.device_get(res["picks"]))
                if gate_bucket:
                    # on-device numerical parity gate: a Mosaic compile
                    # that *succeeds but diverges* from interpret-mode
                    # semantics would silently degrade every threshold
                    # pick — compare against the exact XLA backend on the
                    # warmup chunk before adopting the bucket backend.
                    # (The exact executable is the overflow fallback, so
                    # warming it here kills a mid-run compile hazard
                    # too.) Adjacent-index differences are f32 near-ties,
                    # not miscompiles.
                    ref = exact_fut.result()
                    valid = ~np.asarray(
                        jax.device_get(res["overflow"])).astype(bool)
                    delta = np.abs(picks[valid].astype(np.int64)
                                   - ref[valid].astype(np.int64))
                    if delta.size and (delta.max() > 1
                                       or (delta > 0).mean() > 0.25):
                        raise RuntimeError(
                            f"bucket sweep picks diverge from exact XLA "
                            f"backend on device (max|Δidx|={delta.max()}, "
                            f"{(delta > 0).mean():.0%} blocks differ)"
                        )
            except Exception:
                # a new kernel backend that fails to compile (or fails
                # the parity gate) on this hardware must not take the
                # whole encoder down — demote to the proven EDT backend
                # and warm that instead
                if self.sweep_backend != "bucket":
                    raise
                logger.exception("bucket sweep backend failed; falling "
                                 "back to the pallas EDT backend")
                self.sweep_backend = "pallas"
                self._sweep_mask_cache.clear()
                fb = self._sweep_mask_fn(opt_metrics, max_deltas,
                                         with_normals)
                jax.block_until_ready(fb(*sm_args)["picks"])

        def warm_wide_dec():
            # decoder executables are symbol-dtype-keyed; an int16-wide
            # cloud arriving after an int8-only warmup chunk would pay an
            # unwarmed 1-3 min remote compile mid-encode. Warm the int16
            # dense path explicitly (int32 is the divergent-model escape
            # hatch and stays lazy).
            y16 = jnp.zeros((bs,) + tuple(self.y_shape), jnp.int16)
            thr_c = jnp.zeros((bs,), jnp.float32)
            outs = self._mask_pack_only(
                self._dec_fn(self.params, y16), thr_c)
            jax.block_until_ready(outs["packed"])
            if self.is_v2:
                jax.block_until_ready(self._decode_z(
                    self.params,
                    jnp.zeros((bs,) + tuple(self.z_shape), jnp.int16)))

        def warm_rerun():
            # the overflow-rerun path (bucket backend only) gathers a
            # rerun_width-wide batch of canonical x_hat / occ / pts rows
            # out of the cloud concats with jnp.take, re-sweeps them on
            # the exact backend, and scatters the packed masks back
            # — all fresh executables whose first compile otherwise
            # lands in the MIDDLE of the first overflowing cloud
            # (measured 19 s on real TPU, r3). Normals runs use the
            # full-volume bucket_exact fallback instead.
            if self.sweep_backend != "bucket":
                return
            w = self.rerun_width
            gather = jnp.zeros((w,), jnp.int32)
            occ_dev = jnp.asarray(out["packed_occ"])
            occ_t = jnp.take(occ_dev, gather, axis=0)
            pts_t = jnp.take(dev_keep["pts16"], gather, axis=0)
            x_hat_t = jnp.take(x_hat, gather, axis=0)
            jax.block_until_ready(
                occ_dev.at[gather].set(jnp.zeros_like(occ_t)))
            fbx = self._sweep_mask_fn(
                opt_metrics, max_deltas, with_normals,
                backend="bucket_exact" if with_normals else "xla")
            nrm_t = ((jnp.take(dev_keep["nrm"], gather, axis=0),)
                     if with_normals else ())
            jax.block_until_ready(
                fbx(self.params, occ_t, x_hat_t, pts_t, *nrm_t)["picks"])

        with ThreadPoolExecutor(6) as pool:
            if gate_bucket:
                exact = self._sweep_mask_fn(opt_metrics, max_deltas,
                                            with_normals, backend="xla")
                exact_fut = pool.submit(lambda: np.asarray(
                    jax.device_get(exact(*sm_args)["picks"])))
            def warm_d2_nn():
                # full-cloud d2 metrics ride the argmin-EDT NN chunk
                # (~20-40 s remote compile) — an unwarmed first cloud
                # pays it mid-encode, twice (A→B and B→A share the
                # executable only when the packing widths match, see
                # cloud_metrics._QRY_B_HWM)
                if not with_normals:
                    return
                from pcc_geo_cnn_v2_tpu.ops.cloud_metrics import (
                    _nn_chunk_fn,
                )
                P = dev_keep["pts16"].shape[1]
                fn = _nn_chunk_fn(self.block_size, self.halo_width,
                                  aot=self._aot_ok)
                q = jnp.full((self.halo_batch, P, 3), -1, jnp.int32)
                t = jnp.zeros((self.halo_batch, 27,
                               self.block_size ** 3 // 8), jnp.uint8)
                jax.block_until_ready(fn(q, t)["off"])

            futs = [
                pool.submit(warm_sweep),
                pool.submit(self.decompress_blocks, payload),
                pool.submit(warm_wide_dec),
                pool.submit(warm_rerun),
                pool.submit(warm_d2_nn),
                pool.submit(blockwise_d1_sums, packed, packed, origins,
                            self.block_size, halo=self.halo_width,
                            batch=self.halo_batch, aot=self._aot_ok),
            ]
            for f in futs:
                f.result()

    def warmup_cloud_shapes(self, n_list, point_budget=4096):
        """Precompile the per-cloud-size executables (concat arities,
        halo gathers, overflow-rerun gathers/scatter) for clouds of the
        given block counts.

        The per-chunk wavefront leaves a handful of whole-cloud eager
        ops whose executables are keyed by chunk count / row count;
        compiling them up front keeps the first encode of each cloud
        size free of mid-run remote compiles. ``point_budget`` must match
        the pack width the encode will run with (pts16 row length).
        """
        from pcc_geo_cnn_v2_tpu.ops.cloud_metrics import (
            _halo_gather,
            _pad_zero_rows,
        )

        bs = self.batch_blocks
        fbytes = self.block_size ** 3 // 8
        done = set()
        for n in sorted(set(int(x) for x in n_list)):
            nck = -(-n // bs)
            if nck > 1 and nck not in done:
                done.add(nck)
                sz = self.block_size
                u8 = [jnp.zeros((bs, fbytes), jnp.uint8)] * nck
                i16 = [jnp.zeros((bs, point_budget, 3), jnp.int16)] * nck
                f32x = [jnp.zeros((bs, sz, sz, sz, 1), jnp.float32)] * nck
                occ_cat = self._concat_chunks(u8)
                pts_cat = self._concat_chunks(i16)
                xhat_cat = self._concat_chunks(f32x)
                # overflow-rerun executables at this chunk count: three
                # rerun_width-wide gathers out of the cloud concats + the
                # packed-mask scatter back in (see _rerun_overflowed)
                g = jnp.zeros((self.rerun_width,), jnp.int32)
                for t in (jnp.take(xhat_cat, g, axis=0),
                          jnp.take(occ_cat, g, axis=0),
                          jnp.take(pts_cat, g, axis=0),
                          occ_cat.at[g].set(
                              jnp.zeros((self.rerun_width, fbytes),
                                        jnp.uint8))):
                    jax.block_until_ready(t)
            rows = max(8, int(2 ** np.ceil(np.log2(nck * bs + 1))))
            key = ("halo", rows)
            if key in done:
                continue
            done.add(key)
            ext = _pad_zero_rows(jnp.zeros((nck * bs, fbytes), jnp.uint8),
                                 rows=rows)
            idx = jnp.zeros((self.halo_batch, 27), jnp.int32)
            jax.block_until_ready(_halo_gather(ext, ext, idx))

    def encode_blocks(self, blocks):
        """Device pass: blocks → integer symbols (+ x_hat probabilities)."""
        n = len(blocks)
        # round the point budget to a power of two so the jitted encode
        # executable is reused across clouds
        budget = max(int(2 ** np.ceil(np.log2(max(len(b) for b in blocks)))), 64)
        points, _ = pack_points(blocks, max_points=budget)
        return self._run_chunked(self._encode, [points], n)

    def entropy_encode_all(self, out, n):
        """Range-code ALL n blocks' symbols in (at most) two native batch
        calls → list of per-block string tuples.

        One ctypes call per latent stream family replaces n per-block
        submissions: on the single-core bench host the per-block path's
        cost is Python dispatch + per-call conversions competing with the
        fetch threads for the GIL, not the coding itself (the batch call
        releases the GIL for the entire C++ loop)."""
        if self.is_v2:
            y = rc.encode_batch(out["y_sym"][:n], out["y_idx"][:n],
                                self.gc_table)
            z = rc.encode_batch(out["z_sym"][:n],
                                self._channel_indexes(self.z_shape),
                                self.eb_table)
            return list(zip(y, z))
        y = rc.encode_batch(out["y_sym"][:n],
                            self._channel_indexes(self.y_shape),
                            self.eb_table)
        return [(s,) for s in y]

    def entropy_encode(self, out, i):
        """Range-code block i's symbols → tuple of strings."""
        if self.is_v2:
            y_string = rc.encode(out["y_sym"][i],
                                 out["y_idx"][i], self.gc_table)
            z_string = rc.encode(out["z_sym"][i],
                                 self._channel_indexes(self.z_shape),
                                 self.eb_table)
            return (y_string, z_string)
        y_string = rc.encode(out["y_sym"][i],
                             self._channel_indexes(self.y_shape),
                             self.eb_table)
        return (y_string,)

    def _encode_syms_fn(self, with_normals=False, point_budget=None):
        """Jitted analysis pass: points → symbols (no synthesis, no sweep).

        The decode path runs ONCE later via the decoder-canonical
        executables (``_dec_fn``) whose materialized x_hat also feeds the
        threshold sweep — round 1 ran synthesis 1 + n_metrics times per
        block; this design runs it exactly once.

        With ``point_budget`` the pass takes a FLAT point stream +
        per-block offsets (only real points cross the tunnel — a dense
        [N, budget, 3] upload padded to the largest block wastes ~10x
        link bandwidth on scan clouds) and rebuilds the padded batch on
        device; without it, the legacy padded-batch signature.
        """
        key = (with_normals, point_budget)
        if key in self._encode_syms_cache:
            return self._encode_syms_cache[key]
        size = self.block_size
        bs = self.batch_blocks
        nzb = min(self.sym_nz_budget, int(np.prod(self.y_shape)))

        def fn(params, pts, normals=None):
            x = voxelize(pts, size)
            out = self.model.apply(params, x,
                                   method=self.model.encode_syms)
            occ = x[..., 0]
            res = self._compact(out, narrow=True)
            # y symbols cross the tunnel SPARSE: trained models emit ~99%
            # zeros, so the nonzero coordinate list (~1-3 KB/block) beats
            # the dense int8 grid (~32 KB/block at 64³) ~10x; blocks with
            # more than ``nzb`` nonzeros re-fetch their full rows on host
            # (see _widen_symbols). The dense int8 copy stays on device
            # as the decoder-canonical feed.
            flat8 = res["y_sym"].reshape(res["y_sym"].shape[0], -1)
            nz = flat8 != 0
            res["y_nzcnt"] = jnp.sum(nz, axis=-1).astype(jnp.int32)
            slot = jnp.where(nz, jnp.cumsum(nz, axis=-1) - 1, nzb)
            b_i = jax.lax.broadcasted_iota(jnp.int32, nz.shape, 0)
            col = jax.lax.broadcasted_iota(jnp.int32, nz.shape, 1)
            # positions fit uint16 at ≤64³ blocks (y grid ≤ 32768 slots);
            # halves the dominant per-chunk host transfer
            pos_dt = (jnp.uint16 if int(np.prod(self.y_shape)) <= 65536
                      else jnp.int32)
            res["y_nzpos"] = jnp.zeros(
                (nz.shape[0], nzb), pos_dt
            ).at[b_i, slot].set(col.astype(pos_dt), mode="drop")
            res["y_nzval"] = jnp.zeros(
                (nz.shape[0], nzb), jnp.int8
            ).at[b_i, slot].set(flat8, mode="drop")
            # packed original occupancy feeds the sweep and the on-device
            # full-cloud metric (ops/cloud_metrics); 1 bit/voxel
            res["packed_occ"] = jnp.packbits(
                (occ > 0).reshape(occ.shape[0], -1), axis=-1,
                bitorder="big"
            )
            # duplicate-voxel guard (the Pallas sweep's sparse AB sums
            # double-count duplicated points; callers must dedup — this
            # turns silent corruption into a loud error)
            valid = jnp.all((pts >= 0) & (pts < size), axis=-1)
            res["dup_count"] = (
                jnp.sum(valid, axis=-1).astype(jnp.int32)
                - jnp.sum(occ > 0, axis=(1, 2, 3)).astype(jnp.int32)
            )
            # device-retained: full-width symbols (wide-block re-fetch),
            # compact point lists (re-used by the sweep pass tunnel-free)
            res["y_sym_full"] = out["y_sym"]
            if "z_sym" in out:
                res["z_sym_full"] = out["z_sym"]
            res["pts16"] = pts.astype(jnp.int16)
            if with_normals:
                res["nrm"] = normals  # f32: d2 sweep parity needs full precision
            return res

        if point_budget is not None:
            def fn_flat(params, flat, offs, normals=None):
                # flat: [flat_budget] uint32 packed coords (3x less upload
                # than int16 triplets); unpack+unflatten on device
                pts = unflatten_points(unpack_coords(flat, size), offs, bs,
                                       point_budget)
                if with_normals:
                    normals = unflatten_points(normals, offs, bs,
                                               point_budget, fill=0)
                return fn(params, pts, normals)

            jitted = aot_jit(fn_flat, name="encode_syms_flat",
                             enabled=self._aot_ok)
        else:
            jitted = aot_jit(fn, name="encode_syms", enabled=self._aot_ok)
        self._encode_syms_cache[key] = jitted
        return jitted

    def _sweep_mask_fn(self, opt_metrics, max_deltas, with_normals=False,
                       backend=None):
        """Jitted threshold sweep + per-metric mask packing.

        Consumes the MATERIALIZED x_hat from the decoder-canonical decode
        executable; picks thresholds (reference selection semantics, see
        ops/threshold_sweep) and packs the per-metric candidate masks in
        the same dispatch. Masks equal the decoder's bit-for-bit because
        both sides compare the same concrete x_hat values (see __init__).

        The ``bucket`` backend additionally emits an ``overflow`` flag
        per block (candidate count beyond its budget — picks/masks are
        then invalid and the caller re-runs those blocks on the exact
        backend, see :meth:`compress_blocks_device_opt`).
        """
        backend = backend or self.sweep_backend
        key = (tuple(opt_metrics), tuple(max_deltas), with_normals, backend)
        if key in self._sweep_mask_cache:
            return self._sweep_mask_cache[key]
        from pcc_geo_cnn_v2_tpu.ops.bucket_sweep import (
            select_thresholds_d1_bucket,
        )
        from pcc_geo_cnn_v2_tpu.ops.threshold_sweep import (
            select_thresholds_d1_batch,
            select_thresholds_d1_pallas,
            select_thresholds_device_pts,
        )

        size = self.block_size
        thresholds = jnp.asarray(self.thresholds, jnp.float32)
        n_metrics = len(opt_metrics) * len(max_deltas)
        bucket_k = self.bucket_k
        interpret = jax.default_backend() != "tpu"  # kernels in tests

        def fn(params, occ_packed, x_hat, pts16, nrm=None):
            del params  # sweep is model-free; signature matches _run_chunked
            occ = jnp.unpackbits(
                occ_packed, axis=-1, bitorder="big"
            ).reshape(-1, size, size, size).astype(jnp.float32)
            xh = x_hat[..., 0]
            pts = pts16.astype(jnp.int32)
            overflow = None
            if with_normals and backend in ("bucket", "bucket_exact"):
                # d2 metrics ride the bucket sweep: the prefix-min kernel
                # carries each original's plane distance to its NN
                # candidate (own-normal AB; exact BA — see
                # ops/bucket_sweep._bucket_kernel_d2). The grid-based d2
                # sweep this replaces kernel-faulted real TPUs under
                # lax.map (r4 bench_d2 worker crashes, bisected r5: the
                # argmin-EDT → grid-gather/scatter combination
                # miscompiles in nested while loops) and its TPU-safe
                # point-based rewrite (select_thresholds_device_pts)
                # still measured 6.1 s/block — the per-threshold EDT
                # volume work is the wrong shape; the bucket prefix
                # structure is ~3 orders cheaper.
                picks, overflow = select_thresholds_d1_bucket(
                    xh, pts, thresholds, opt_metrics=opt_metrics,
                    max_deltas=max_deltas,
                    # 'bucket_exact' = same kernel at K = full volume:
                    # overflow impossible, so it serves as the normals
                    # rerun fallback without entering a new program class
                    K=size ** 3 if backend == "bucket_exact" else bucket_k,
                    interpret=interpret, nrm=nrm,
                )
                if backend == "bucket_exact":
                    overflow = None
            elif with_normals:
                # exact-semantics fallback (overflow reruns, CPU): the
                # point-based per-block sweep — normals ride the EDT
                # carries, votes run over the ≤P point lists
                # (ops/threshold_sweep.d2_sweep_pts)
                def per_block_d2(args):
                    occ_b, xh_b, pts_b, nrm_b = args
                    return select_thresholds_device_pts(
                        occ_b, xh_b, thresholds, pts_b, nrm_b,
                        opt_metrics=opt_metrics, max_deltas=max_deltas,
                        band=self.d2_band,
                    )

                picks = jax.lax.map(per_block_d2, (occ, xh, pts, nrm))
            elif backend == "bucket":
                picks, overflow = select_thresholds_d1_bucket(
                    xh, pts, thresholds, opt_metrics=opt_metrics,
                    max_deltas=max_deltas, K=bucket_k,
                    interpret=interpret,
                )
            elif backend == "pallas":
                picks = select_thresholds_d1_pallas(
                    occ, xh, thresholds, opt_metrics=opt_metrics,
                    max_deltas=max_deltas, pts=pts,
                )
            else:
                picks = select_thresholds_d1_batch(
                    occ, xh, thresholds, opt_metrics=opt_metrics,
                    max_deltas=max_deltas,
                )  # [N, M]
            out = {"picks": picks}
            if overflow is not None:
                out["overflow"] = overflow
            thr = jnp.take(thresholds, picks, axis=0)  # [N, M]
            # packed 1-bit masks only: coordinate lists are rebuilt
            # host-side by the native bit walker (the compact-position
            # scan + scatter this used to do per metric was measurable
            # device time, and its pos/count transfer is superseded by
            # fetching the packed rows themselves)
            for m in range(n_metrics):
                out[f"masks{m}"] = self._mask_only_raw(
                    x_hat, thr[:, m])["packed"]
            return out

        jitted = aot_jit(fn, name=f"sweep_{backend}", enabled=self._aot_ok)
        self._sweep_mask_cache[key] = jitted
        return jitted

    def compress_blocks_device_opt(self, blocks, binstr, points, resolution,
                                   level, opt_metrics=("d1_mse",),
                                   max_deltas=(np.inf,), with_normals=False,
                                   need_metrics=True, point_budget=None,
                                   flat_budget=None):
        """Encoder with the fused on-device threshold sweep.

        Same outputs as :meth:`compress_blocks`; ~256 host KD-tree metric
        evaluations per block collapse into the jitted device pass. With
        normals (blocks carry nx,ny,nz columns) d2_* metrics are supported.

        :param need_metrics: compute full-cloud enc-side metrics even for
            groups whose selection doesn't need them (single candidate);
            ``False`` leaves ``metadata[g]["metrics"]`` as None there.
        """
        import time

        from pcc_geo_cnn_v2_tpu.ops.threshold_sweep import (
            D1_METRICS,
            D2_METRICS,
        )
        from pcc_geo_cnn_v2_tpu.ops.voxel import pack_attrs

        assert all(m in D1_METRICS + D2_METRICS for m in opt_metrics)
        if not with_normals:
            assert all(m in D1_METRICS for m in opt_metrics), opt_metrics
        n = len(blocks)
        tlog = _mk_tlog(f"enc[{n}]")
        budget = point_budget or max(
            int(2 ** np.ceil(np.log2(max(len(b) for b in blocks)))), 64
        )
        assert max(len(b) for b in blocks) <= budget, "budget too small"
        # flat-stream upload: only real points cross the tunnel; the
        # padded [bs, budget, 3] batch is rebuilt on device
        flat, offsets = flatten_blocks(blocks)
        flat_u32 = pack_coords(flat, self.block_size)
        bs = self.batch_blocks
        if flat_budget is None:
            flat_budget = self._flat_budget(offsets)
        nrm_flat = (flatten_blocks(blocks, cols=(3, 4, 5),
                                   dtype=np.float32)[0]
                    if with_normals else None)

        def pts_chunker(lo, hi, _bs):
            f0, f1 = int(offsets[lo]), int(offsets[hi])
            fc = np.zeros(flat_budget, np.uint32)
            fc[: f1 - f0] = flat_u32[f0:f1]
            offs = np.full(_bs + 1, f1 - f0, np.int32)
            offs[: hi - lo + 1] = offsets[lo:hi + 1] - f0
            parts = [fc, offs]
            if with_normals:
                nc = np.zeros((flat_budget, 3), np.float32)
                nc[: f1 - f0] = nrm_flat[f0:f1]
                parts.append(nc)
            return parts

        tlog("host prep (flatten/pack) done")
        t0 = time.time()
        # --- phase A: analysis pass, wavefront form -----------------------
        # One jitted dispatch per chunk; full-width symbols, occupancy and
        # point lists stay on device PER CHUNK (later passes consume the
        # chunk arrays directly — the old concat-then-reslice dance cost
        # two eager device ops per tensor per chunk, each a synchronous
        # tunnel round-trip); host outputs stream back on fetch threads
        # while later chunks compute.
        keep = ["packed_occ", "y_sym_full", "pts16", "y_sym"]
        if self.is_v2:
            keep += ["z_sym_full"]
        if with_normals:
            keep += ["nrm"]
        syms_fn = self._encode_syms_fn(with_normals, point_budget=budget)
        nck = -(-n // bs)
        fetchers = ThreadPoolExecutor(min(4, nck))
        syms_dev, syms_futs = [], []
        for k, lo in enumerate(range(0, n, bs)):
            hi = min(lo + bs, n)
            parts = pts_chunker(lo, hi, bs)
            dev_k, params_k = self._chunk_dev(k)
            parts = [jax.device_put(p, dev_k) for p in parts]
            o = syms_fn(params_k, *parts)
            devk = {key: o.pop(key) for key in keep}
            if self.is_v2:
                devk["z_sym"] = o["z_sym"]  # device copy AND host fetch
            syms_dev.append(devk)
            syms_futs.append(fetchers.submit(jax.device_get, o))
        out = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs)[:n],
            *[f.result() for f in syms_futs])
        tlog("syms pass fetched")
        dup = out.pop("dup_count")
        if np.any(dup):
            raise ValueError(
                f"{int(np.count_nonzero(dup))} block(s) contain duplicate "
                "voxel coordinates; dedup inputs (see cli/compress.py) — "
                "the sparse sweep sums would silently double-count"
            )
        feeds = self._widen_symbols_chunks(out, syms_dev, n)
        tlog("widen_symbols done")
        t_syms = time.time() - t0
        t_device = t_syms

        # --- phase B: decoder-canonical passes, one dispatch set/chunk ----
        # CDF-row indexes and x_hat come from the SAME executables the
        # decoder runs (same HLO → same fusion → bit-identical), the
        # merged-decode guarantee the reference approximated with its
        # retry loop (decompress_octree.py:64-131). Synthesis runs exactly
        # ONCE per block; its materialized x_hat feeds the threshold sweep
        # and all per-metric masks in the same per-chunk dispatch.
        t0 = time.time()
        opt_names = [f"{m}_{d}" for d in max_deltas for m in opt_metrics]
        n_metrics = len(opt_names)
        sweep_mask = self._sweep_mask_fn(opt_metrics, max_deltas,
                                         with_normals)
        yidx_futs, sweep_futs = [], []
        mask_chunks = [[] for _ in range(n_metrics)]
        # canonical x_hat per chunk, kept ONLY when the bucket sweep can
        # overflow and trigger a rerun (since r5 that includes normals
        # runs — d2 rides the bucket kernel); retaining it otherwise
        # pins ~1 MB/block f32 in HBM for the whole dec+sweep phase
        keep_xhat = self.sweep_backend == "bucket"
        xhat_dev = []
        for k in range(nck):
            _, params_k = self._chunk_dev(k)
            if self.is_v2:
                yi = self._decode_z(params_k, feeds[k]["z_sym"])
                yidx_futs.append(fetchers.submit(jax.device_get, yi))
            x_hat = self._dec_fn(params_k, feeds[k]["y_sym"])
            if keep_xhat:
                xhat_dev.append(x_hat)
            nrm_k = ((syms_dev[k]["nrm"],) if with_normals else ())
            res = sweep_mask(params_k, syms_dev[k]["packed_occ"], x_hat,
                             syms_dev[k]["pts16"], *nrm_k)
            for m in range(n_metrics):
                mask_chunks[m].append(res.pop(f"masks{m}"))
            sweep_futs.append(fetchers.submit(jax.device_get, res))
        tlog("dec+sweep dispatched")
        if self.is_v2:
            out["y_idx"] = np.concatenate(
                [f.result() for f in yidx_futs])[:n]
            tlog("y_idx fetched")
        out2 = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs)[:n],
            *[f.result() for f in sweep_futs])
        tlog("sweep results fetched")

        # full-cloud device arrays (halo metrics gather across chunk
        # boundaries): ONE concat per tensor; rows past n are padding and
        # are never indexed (block indexes stay < n everywhere)
        packed_dev_by_metric = [
            self._concat_chunks(mask_chunks[m]) for m in range(n_metrics)
        ]
        occ_cat = self._concat_chunks(
            [d["packed_occ"] for d in syms_dev])
        pts_cat = self._concat_chunks([d["pts16"] for d in syms_dev])

        overflow = out2.pop("overflow", None)
        if overflow is not None and np.any(overflow):
            xhat_cat = self._concat_chunks(xhat_dev)
            nrm_cat = (self._concat_chunks([d["nrm"] for d in syms_dev])
                       if with_normals else None)
            self._rerun_overflowed(
                np.nonzero(overflow)[0], out2, packed_dev_by_metric,
                xhat_cat, occ_cat, pts_cat, nrm_cat, opt_metrics,
                max_deltas, with_normals, n_metrics,
            )
            tlog("overflow rerun done")
        del xhat_dev  # release the kept canonical x_hat chunks (HBM)
        picks = np.asarray(out2["picks"])
        t_dec_sweep = time.time() - t0
        t_device += t_dec_sweep

        # pre-dispatch the per-metric packed-mask fetches BEFORE the d1
        # sums below enter the device queue, so the unpack phase's fetch
        # isn't serialized behind the halo pass; coordinates are rebuilt
        # host-side from the bits by the native single-pass walker
        # (the pos/count compact transfer this replaces cost a per-metric
        # scan+scatter on device plus separate over-budget row gathers)
        packed_futs = [fetchers.submit(jax.device_get,
                                       packed_dev_by_metric[m])
                       for m in range(n_metrics)]

        # dispatch the halo-EDT d1 sums for every candidate the select
        # phase will score NOW, on fetch threads: their device time and
        # blocking fetch (1-7 s/cloud on the r4 bench) then overlap the
        # host unpack + entropy phases instead of serializing inside
        # ``select``
        d1_sums_futs = None
        d1_entries = [i for i, nm in enumerate(opt_names)
                      if nm.startswith("d1")]
        if d1_entries and (need_metrics or len(d1_entries) > 1):
            from pcc_geo_cnn_v2_tpu.ops.cloud_metrics import (
                blockwise_d1_sums,
            )
            from pcc_geo_cnn_v2_tpu.utils.octree import block_origins

            origins_early = np.stack(
                block_origins(binstr, [0, 0, 0], [resolution] * 3, level))
            d1_sums_futs = {
                i: fetchers.submit(
                    blockwise_d1_sums, occ_cat, packed_dev_by_metric[i],
                    origins_early, self.block_size, halo=self.halo_width,
                    batch=self.halo_batch, aot=self._aot_ok)
                for i in d1_entries
            }

        # range coding overlaps the unpack + select phases below: the C++
        # rANS coder releases the GIL, so its threads run while the main
        # thread blocks on device fetches inside the metric passes
        t0 = time.time()
        entropy_pool = ThreadPoolExecutor(1)
        strings_fut = entropy_pool.submit(self.entropy_encode_all, out, n)
        t_entropy_submit = time.time() - t0
        threshold_list = [list(map(int, row)) for row in picks]
        t0 = time.time()
        from pcc_geo_cnn_v2_tpu.ops.bitunpack import unpack_mask_coords

        x_hat_points = [
            unpack_mask_coords(packed_futs[m].result()[:n],
                               self.block_size)
            for m in range(n_metrics)
        ]
        tlog("points unpacked")
        t_unpack = time.time() - t0
        t0 = time.time()
        metadata = self._select_best_device(
            binstr, x_hat_points, occ_cat,
            packed_dev_by_metric, opt_names, points, resolution, level,
            need_metrics=need_metrics,
            pts_dev=pts_cat,
            nrm_host=(pack_attrs(blocks, [3, 4, 5], budget)
                      if with_normals else None),
            d1_sums_futs=d1_sums_futs,
        )
        t_select = time.time() - t0
        tlog("select done")
        t0 = time.time()
        strings_list = strings_fut.result()
        entropy_pool.shutdown()
        fetchers.shutdown()
        t_entropy = t_entropy_submit + (time.time() - t0)
        logger.info(
            "compress_blocks_device_opt(%d blocks): device %.2fs "
            "(syms %.2fs, dec+sweep %.2fs), entropy-wait %.2fs, "
            "unpack %.2fs, select %.2fs",
            n, t_device, t_syms, t_dec_sweep, t_entropy, t_unpack, t_select,
        )
        by_metric = list(map(list, zip(*threshold_list)))
        data_list = [
            list(zip(strings_list, by_metric[m["idx"]])) for m in metadata
        ]
        return data_list, metadata

    def _chunk_dev(self, k):
        """(device, params) for chunk k under the round-robin block dp."""
        if self.devices:
            d = self.devices[k % len(self.devices)]
            return d, self._params_per_dev[k % len(self.devices)]
        return None, self.params

    def _concat_chunks(self, parts):
        """One device concat of per-chunk arrays (rows past n = padding).

        Multi-device chunks collect onto device 0 first. The concat is an
        eager op — ONE synchronous tunnel round-trip per tensor per cloud
        (arity is the chunk count, so at most a handful of executables
        ever compile).
        """
        if len(parts) == 1:
            return parts[0]
        if self.devices:
            parts = [jax.device_put(p, self.devices[0]) for p in parts]
        return jnp.concatenate(parts)

    def _rerun_overflowed(self, idx, out2, packed_dev_by_metric, xhat_cat,
                          occ_cat, pts_cat, nrm_cat, opt_metrics,
                          max_deltas, with_normals, n_metrics):
        """Re-sweep bucket-overflowed blocks on the exact XLA backend.

        A block overflows when more than ``bucket_k`` voxels sit above
        thresholds[0] (dense scan blocks, or a divergent model emitting
        diffuse probabilities everywhere). Its bucket picks/masks are
        invalid, so the exact sweep re-runs for just those blocks and
        splices picks / positions / packed masks in place — the common
        case never pays for the possibility.

        The rerun never calls ``_dec_fn``: it GATHERS the canonical
        x_hat rows kept from the phase-B chunks (``xhat_cat``). Gathers
        are exact and the mask compare ``x_hat > thr`` is elementwise,
        so the spliced masks are bit-identical to what the decoder's
        bs-wide canonical decode reproduces, regardless of the sweep's
        batch width (the r3 bit-exactness break came from RE-DECODING at
        a new width — see the ``rerun_width`` note in ``__init__``).
        That frees the rerun to run at the narrow fixed ``rerun_width``:
        one W-wide exact sweep (~0.5 s) instead of the bs-wide
        decode+sweep that measured 7-14 s/cloud at bs=128 (r4 bench).
        Gathers pad with their first entry and the mask scatter's
        padding rows rewrite row idx[0] with its own value — every
        executable here is compiled once per cloud chunk-count, not once
        per overflow count (warmed by ``warmup_cloud_shapes``).
        """
        logger.info("bucket sweep overflow: re-sweeping %d block(s) on "
                    "the exact backend (width %d)", len(idx),
                    self.rerun_width)
        # normals rerun: full-volume bucket (K = B³, overflow-free, same
        # kernel family) — the per-block EDT path is TPU-hostile (see
        # _sweep_mask_fn)
        fb = self._sweep_mask_fn(
            opt_metrics, max_deltas, with_normals,
            backend="bucket_exact" if with_normals else "xla")
        bs = self.rerun_width
        idx = np.asarray(idx)
        params0 = (self._params_per_dev[0] if self.devices
                   else self.params)
        for lo in range(0, len(idx), bs):
            sel = idx[lo: lo + bs]
            kk = len(sel)
            pad = np.concatenate(
                [sel, np.full(bs - kk, sel[0], sel.dtype)]
            ).astype(np.int32)
            gather = jnp.asarray(pad)
            x_hat = jnp.take(xhat_cat, gather, axis=0)
            occ = jnp.take(occ_cat, gather, axis=0)
            pts = jnp.take(pts_cat, gather, axis=0)
            nrm = ((jnp.take(nrm_cat, gather, axis=0),)
                   if with_normals else ())
            res = fb(params0, occ, x_hat, pts, *nrm)
            host = jax.device_get({key: v for key, v in res.items()
                                   if not key.startswith("masks")})
            out2["picks"][sel] = host["picks"][:kk]
            js = jnp.asarray(pad)
            for m in range(n_metrics):
                rows = res[f"masks{m}"]
                if self.devices:
                    rows = jax.device_put(rows, self.devices[0])
                packed_dev_by_metric[m] = (
                    packed_dev_by_metric[m].at[js].set(rows)
                )

    def _d1_full_cloud_metrics(self, occ_packed, mask_packed, origins,
                               x_hat_blocks, points, resolution,
                               sums=None):
        """Exact full-cloud D1 metrics of one candidate, device-first.

        Sums come from the halo-EDT device pass; the rare > halo outliers
        resolve on host WITHOUT ever building a KD-tree over the full
        candidate cloud (decoded clouds can dwarf the original —
        ``resolve_outliers`` ring search touches only blocks near each
        outlier). B-outliers query a tree over the original points, which
        is small and built once per call. ``sums`` accepts a precomputed
        ``blockwise_d1_sums`` result so the encoder can dispatch the
        halo pass early and overlap its device time + fetch with the
        host unpack/entropy phases (the blocking fetch measured
        1-7 s/cloud inside ``select`` on the r4 bench).
        """
        import time

        from pcc_geo_cnn_v2_tpu.ops.cloud_metrics import (
            blockwise_d1_sums,
            d1_metrics_from_sums,
            resolve_outliers,
        )

        t0 = time.time()
        if sums is None:
            sums = blockwise_d1_sums(occ_packed, mask_packed, origins,
                                     self.block_size,
                                     halo=self.halo_width,
                                     batch=self.halo_batch,
                                     aot=self._aot_ok)
        t_sums = time.time() - t0
        if sums["n_b"] == 0:  # all blocks hit the failure guard
            return {"d1_psnr": -np.inf}
        t0 = time.time()
        metrics = d1_metrics_from_sums(
            sums, resolution - 1, points_a=points[:, :3],
            resolve_a=lambda q: resolve_outliers(
                q, x_hat_blocks, origins, self.block_size,
                full_tree_limit=2_000_000,
            ),
        )
        logger.info("d1 full-cloud: sums %.2fs, resolve %.2fs (%d+%d "
                    "outliers; %d orig / %d cand pts)", t_sums,
                    time.time() - t0, len(sums["outliers_a"]),
                    len(sums["outliers_b"]), sums["n_a"], sums["n_b"])
        return metrics

    def _d2_full_cloud_metrics(self, pts_dev, nrm_host, mask_packed,
                               x_hat_blocks, origins, points, resolution):
        """Exact full-cloud D2 (+D1) metrics of one candidate.

        NN identities via banded argmin halo EDTs on device; vote-based
        normal transfer and f64 projections on host — reference
        semantics, ``model_types.py:150`` + ``pc_metric.py:76-138``.
        """
        from pcc_geo_cnn_v2_tpu.ops.cloud_metrics import (
            blockwise_d2_metrics,
        )

        return blockwise_d2_metrics(
            pts_dev, nrm_host, mask_packed, x_hat_blocks, origins,
            self.block_size, resolution, points, with_d1=True,
            batch=self.halo_batch, aot=self._aot_ok,
        )

    def _select_best_device(self, binstr, x_hat_points, occ_packed,
                            masks_packed, opt_names, points, resolution,
                            level, opt_groups=("d1", "d2"),
                            need_metrics=True, pts_dev=None,
                            nrm_host=None, d1_sums_futs=None):
        """Best-variant selection with full-cloud metrics on device.

        Same semantics as :func:`select_best_per_opt_metric` (exact d1
        sums via halo EDTs; d2 via argmin-EDT NN identities + host normal
        transfer, ops/cloud_metrics); host KD-trees only touch the rare
        > halo outliers. A group with a SINGLE candidate skips the
        comparative metric entirely (argmax over one is a no-op,
        ``model_types.py:128-176`` semantics unchanged); its metrics are
        computed only when ``need_metrics`` asks for the enc-side metric
        sidecar.
        """
        from pcc_geo_cnn_v2_tpu.utils.octree import block_origins

        bbox_min = [0, 0, 0]
        bbox_max = [resolution] * 3
        origins = np.stack(
            block_origins(binstr, bbox_min, bbox_max, level)
        )
        metadata = []
        for group in opt_groups:
            entries = [(nm, i) for i, nm in enumerate(opt_names)
                       if nm.startswith(group)]
            if not entries:
                continue
            if group == "d2":
                assert nrm_host is not None and pts_dev is not None, (
                    "d2 selection needs input normals (--input_normals)"
                )

                def metric_fn(i):
                    return self._d2_full_cloud_metrics(
                        pts_dev, nrm_host, masks_packed[i],
                        x_hat_points[i], origins, points, resolution,
                    )
            else:
                assert group == "d1", f"unknown metric group {group}"

                def metric_fn(i):
                    fut = (d1_sums_futs or {}).get(i)
                    return self._d1_full_cloud_metrics(
                        occ_packed, masks_packed[i], origins,
                        x_hat_points[i], points, resolution,
                        sums=fut.result() if fut is not None else None,
                    )
            score_key = f"{group}_psnr"
            if len(entries) == 1:
                nm, best_idx = entries[0]
                best_metrics = metric_fn(best_idx) if need_metrics else None
                logger.info("group %s: single candidate %s [selection "
                            "skipped]", group, nm)
            else:
                metrics_full = [metric_fn(i) for _, i in entries]
                scores = [m[score_key] for m in metrics_full]
                local_best = int(np.argmax(scores))
                nm, best_idx = entries[local_best]
                best_metrics = metrics_full[local_best]
                logger.info("group %s: best %s (%s=%.2f) "
                            "[device metric]", group, nm, score_key,
                            scores[local_best])
            blocks_depart = departition_octree(
                x_hat_points[best_idx], binstr, bbox_min, bbox_max, level
            )
            metadata.append({
                "idx": best_idx,
                "metrics": best_metrics,
                "x_hat_list": x_hat_points[best_idx],
                "blocks_depart": blocks_depart,
                "blocks_full": np.vstack(blocks_depart),
            })
        return metadata

    def compress_blocks(self, blocks, binstr, points, resolution, level,
                        with_normals=False, opt_metrics=("d1_mse",),
                        max_deltas=(np.inf,), fixed_threshold=False):
        """Full encoder: symbols, strings, per-block adaptive thresholds,
        best-variant selection per metric group.

        Return layout matches the reference (``model_types.py:184-218``):
        (data_list, metadata) where data_list[g] = [(strings, thr_idx), ...]
        per block for metric group g.
        """
        n = len(blocks)
        out = self.encode_blocks(blocks)
        if self.is_v2:
            # decoder-canonical CDF-row indexes (see compress_blocks_device_opt)
            out["y_idx"] = self._run_chunked(
                self._decode_z, [narrow_symbols(out["z_sym"])], n
            )

        strings_list = self.entropy_encode_all(out, n)
        with ThreadPoolExecutor(self.threads) as pool:

            def opt_one(i):
                block = np.asarray(blocks[i])
                x_hat = out["x_hat"][i, ..., 0]
                normals = _get_normals(block, with_normals)
                return compute_optimal_thresholds(
                    block, x_hat, self.thresholds, resolution,
                    normals=normals, opt_metrics=opt_metrics,
                    max_deltas=max_deltas, fixed_threshold=fixed_threshold,
                )

            results = list(pool.map(opt_one, range(n)))

        opt_names = results[0][0]
        threshold_list = [r[1] for r in results]  # [block][metric]
        # per metric -> per block candidate point lists, from the DECODER's
        # canonical decode executable (not this path's x_hat): the
        # threshold search above may use the fused x_hat freely, but
        # embedded reconstructions must be bit-identical to
        # decompress_blocks output (one-ulp fusion drift near a picked
        # threshold would flip voxels otherwise)
        y_narrow = narrow_symbols(out["y_sym"])

        def dec_mask(params, y_chunk, thr_chunk):
            return self._mask_pack_only(self._dec_fn(params, y_chunk),
                                        thr_chunk)

        from pcc_geo_cnn_v2_tpu.ops.bitunpack import unpack_mask_coords

        x_hat_points = []
        for col in map(list, zip(*threshold_list)):
            outm = self._run_chunked(
                dec_mask,
                [y_narrow,
                 self.thresholds[np.asarray(col)].astype(np.float32)],
                n,
            )
            x_hat_points.append(
                unpack_mask_coords(outm["packed"], self.block_size))
        metadata = select_best_per_opt_metric(
            binstr, x_hat_points, level, opt_names, points, resolution,
            with_normals,
        )
        by_metric = list(map(list, zip(*threshold_list)))
        data_list = [
            list(zip(strings_list, by_metric[m["idx"]])) for m in metadata
        ]
        return data_list, metadata

    # -- decode ------------------------------------------------------------

    def decompress_blocks(self, payload, return_debug=False):
        """payload: [(strings, threshold_idx), ...] → decoded point blocks.

        Thresholding and bit-packing happen on device; only 1-bit masks
        cross back to the host. ``return_debug`` additionally returns the
        decoded integer symbols — the decoder-side half of the
        bit-exactness harness (the reference needed encoder-side dumps and
        a 100-retry loop for this, ``decompress_octree.py:64-131``;
        deterministic XLA executables make one comparison sufficient).
        """
        n = len(payload)
        tlog = _mk_tlog(f"dec[{n}]")
        t_all = time.time()
        phases = {}

        def mark(name, t0):
            phases[name] = phases.get(name, 0.0) + (time.time() - t0)
            tlog(name)
            return time.time()

        thr = np.array(
            [self.thresholds[t] for _, t in payload], np.float32
        )

        narrow = narrow_symbols

        def dec_mask(params, y_chunk, thr_chunk):
            # same decode executable as the encoder's canonical pass;
            # the mask compares materialized f32 values (bit-exact).
            # Decode transports ONLY the packed 1-bit mask (coords are
            # rebuilt host-side by the native bit walker) — see
            # _mask_pack_only.
            return self._mask_pack_only(self._dec_fn(params, y_chunk),
                                        thr_chunk)

        # single-batch native rANS: one ctypes call per stream family
        # (GIL released throughout) instead of a per-block thread pool —
        # see entropy_encode_all for the single-core rationale
        t0 = time.time()
        if self.is_v2:
            z_idx = self._channel_indexes(self.z_shape)
            z_syms = narrow(rc.decode_batch([p[0][1] for p in payload],
                                            z_idx, self.eb_table,
                                            per_stream=False))
            t0 = mark("z_rans", t0)
            dz = self._run_chunked(self._decode_z, [z_syms], n)  # y indexes
            t0 = mark("decode_z", t0)
            y_syms = narrow(rc.decode_batch(
                [p[0][0] for p in payload],
                np.asarray(dz, np.int32), self.gc_table, per_stream=True))
            t0 = mark("y_rans", t0)
        else:
            y_idx = self._channel_indexes(self.y_shape)
            y_syms = narrow(rc.decode_batch([p[0][0] for p in payload],
                                            y_idx, self.eb_table,
                                            per_stream=False))
            t0 = mark("y_rans", t0)
        # mirror of the encoder's sparse transfer: int8 symbol batches
        # upload as a (position, value) list and scatter to the dense grid
        # on device — the SAME decode executable then consumes identical
        # values, so the canonical-decode guarantee is untouched. Batches
        # with a block over the nonzero budget (or wider dtypes) upload
        # dense.
        flat_host = y_syms.reshape(n, -1)
        nzb = min(self.sym_nz_budget, flat_host.shape[1])
        use_sparse = flat_host.dtype == np.int8
        if use_sparse:
            r, c = np.nonzero(flat_host)
            cnt = np.bincount(r, minlength=n)
            use_sparse = cnt.max(initial=0) <= nzb
        if use_sparse:
            slot = np.arange(len(r)) - np.repeat(
                np.insert(np.cumsum(cnt), 0, 0)[:-1], cnt)
            pos = np.zeros((n, nzb), np.int32)
            val = np.zeros((n, nzb), np.int8)
            pos[r, slot] = c
            val[r, slot] = flat_host[r, c]
            y_shape = tuple(y_syms.shape[1:])
            flat_size = flat_host.shape[1]

            def dec_mask_sparse(params, pos_c, val_c, thr_chunk):
                b_i = jax.lax.broadcasted_iota(jnp.int32, pos_c.shape, 0)
                y = jnp.zeros(
                    (pos_c.shape[0], flat_size), jnp.int8
                ).at[b_i, pos_c].add(val_c).reshape((-1,) + y_shape)
                return dec_mask(params, y, thr_chunk)

            t0 = mark("sparse_build", t0)
            outm = self._run_chunked(dec_mask_sparse,
                                     [pos, val, thr], n)
        else:
            outm = self._run_chunked(dec_mask, [y_syms, thr], n)
        t0 = mark("dec_mask", t0)
        from pcc_geo_cnn_v2_tpu.ops.bitunpack import unpack_mask_coords

        dec_blocks = unpack_mask_coords(outm["packed"], self.block_size)
        mark("unpack", t0)
        if os.environ.get("PCC_TIMING", "0") >= "1":
            logger.info(
                "decompress_blocks(%d): total %.2fs (%s)", n,
                time.time() - t_all,
                ", ".join(f"{k} {v:.2f}s" for k, v in phases.items()),
            )
        if return_debug:
            debug = {"y_sym": y_syms,
                     "packed_masks": outm["packed"]}
            if self.is_v2:
                debug["z_sym"] = z_syms
                debug["y_idx"] = dz
            return dec_blocks, debug
        return dec_blocks
