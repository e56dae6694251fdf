"""Train a (config, α) λ sweep for the RD-parity artifacts.

Reference protocol (``/root/reference/src/ev_experiment.yml:10-46`` sweep
matrix and λ grids, ``tr_train_all.py:57-61`` warm-seq chaining): a base
model at the highest λ, then each lower λ warm-started from the previous
one (the reference's 'c4-ws' protocol; its c1..c5 train each λ
independently for 100k steps — warm-seq is this tool's compute-saving
default, documented in results). Checkpoints land in
``<out>/<config>[-a<α>]/<λtag>/ckpt_<step>`` (orbax, the layout the
CLIs' ``load_params`` consumes) with ``done`` markers, so
``ev_experiment``/``ev_compare``/``tools/rd_eval.py`` run on top.

``--config c1|c2|c3|c3p`` + ``--alpha`` select the ladder rung
(reference λ grids per config are the defaults), so the published config
ordering (BASELINE.md: c1 → c2 → c3p → c3p-a0.75) can be reproduced as
within-repo BD deltas on identical content.

TPU-first throughput: the whole block dataset lives on device as one int8
array; each jitted call runs K training steps via ``lax.scan`` with
on-device batch sampling (``jax.random.randint`` folded from the step
counter), so the remote-TPU tunnel sees ONE dispatch per K steps and no
per-step uploads (the round-1 loop paid tunnel latency every step).

Usage: python tools/rd_train_all.py [out_dir] [--base_steps N] [--ft_steps N]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from pcc_geo_cnn_v2_tpu.models.configs import build_model
from pcc_geo_cnn_v2_tpu.training import (
    TrainConfig,
    create_train_state,
    make_scan_train_step,
    make_scan_val_step,
)
from pcc_geo_cnn_v2_tpu.ops.voxel import pack_points

# reference λ grids, high→low rate (warm-seq chains down the curve);
# ev_experiment.yml:13,41-46
LAMBDAS = {
    "c1": [2e-4, 1e-4, 5e-5, 1e-5, 5e-6],
    "c2": [2e-4, 1e-4, 5e-5, 1e-5, 5e-6],
    "c3": [3e-4, 1e-4, 5e-5, 2e-5],
    "c3p": [3e-4, 1e-4, 5e-5, 2e-5, 1e-5],
}
TRAIN_SEEDS = range(24)
VAL_SEEDS = range(100, 102)
BUDGET = 8192
K_INNER = 50


def lmbda_tag(lmbda):
    return f"{float(lmbda):.2e}"


def load_blocks(seeds, cache_tag):
    """figure_blocks with an on-disk cache (generation is ~20 s/cloud)."""
    from pcc_geo_cnn_v2_tpu.utils.scansim import figure_blocks

    cache = Path(f"/tmp/rd_blocks_{cache_tag}.npz")
    if cache.exists():
        with np.load(cache) as z:
            return z["packed"]
    blocks = figure_blocks(list(seeds), max_points=BUDGET)
    packed, _ = pack_points(blocks, max_points=BUDGET)
    np.savez_compressed(cache, packed=packed.astype(np.int8))
    return packed.astype(np.int8)


# scan/val step builders live in the framework (training.py); this tool
# only orchestrates the λ chain
make_multi_step = make_scan_train_step
make_val_step = make_scan_val_step


def save_ckpt(run_dir, state, step):
    import orbax.checkpoint as ocp

    path = Path(run_dir).resolve() / f"ckpt_{step}"
    tree = {"params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state), "step": step}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def restore_ckpt(run_dir, state):
    """Latest checkpoint of a run → (state with params+opt_state, step)."""
    import orbax.checkpoint as ocp

    from pcc_geo_cnn_v2_tpu.training import Trainer

    path = Trainer.latest_checkpoint(Path(run_dir).resolve())
    assert path is not None, f"no checkpoint in {run_dir}"
    tree = {"params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state), "step": 0}
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, tree)
    restored = ocp.StandardCheckpointer().restore(path, abstract)
    state = state.replace(
        params=jax.tree_util.tree_map(jnp.asarray, restored["params"]),
        opt_state=jax.tree_util.tree_map(jnp.asarray,
                                         restored["opt_state"]),
    )
    return state, int(restored["step"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="models/rd")
    ap.add_argument("--config", default="c3p",
                    choices=["c1", "c2", "c3", "c3p"])
    ap.add_argument("--alpha", type=float, default=None,
                    help="focal-loss alpha; default 0.75 for c3p (the "
                         "flagship continuation) and the reference's "
                         "global 0.9 for c1/c2/c3")
    ap.add_argument("--base_steps", type=int, default=30_000)
    ap.add_argument("--ft_steps", type=int, default=10_000)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--extend", type=int, default=0,
                    help="Train each ALREADY-DONE λ this many further "
                         "steps from its own checkpoint (params + "
                         "optimizer state), instead of skipping it.")
    ap.add_argument("--patience_steps", type=int, default=0,
                    help="Early stop: end a λ's run when val loss has "
                         "not improved for this many steps (reference "
                         "protocol: 2000, tr_train.py:54-57; val probes "
                         "here are every 1000 steps). The BEST-val "
                         "params are what gets checkpointed, as in the "
                         "reference's best-loss Saver. 0 = off (save "
                         "final params).")
    ap.add_argument("--lambdas", nargs="*", type=float, default=None,
                    help="Subset of the λ grid to process.")
    ap.add_argument("--run_id", default=None,
                    help="Override the derived run directory name "
                         "(default <config>[-a<alpha>]); needed for "
                         "rungs whose directory was renamed to avoid "
                         "asset collisions, e.g. c3p-a0.75-10k.")
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    train_np = load_blocks(TRAIN_SEEDS, "train24")
    val_np = load_blocks(VAL_SEEDS, "val2")
    print(f"data: {len(train_np)} train / {len(val_np)} val blocks "
          f"({time.time()-t0:.0f}s)", flush=True)
    data = jnp.asarray(train_np)  # device-resident, int8
    val_data = jnp.asarray(val_np)

    if args.alpha is None:
        args.alpha = 0.75 if args.config == "c3p" else 0.9
    model = build_model(args.config)
    run_id = args.run_id or (args.config if args.alpha == 0.9
                             else f"{args.config}-a{args.alpha:g}")
    prev_state = None
    lambdas = args.lambdas or LAMBDAS[args.config]
    for li, lmbda in enumerate(lambdas):
        cfg = TrainConfig(block_size=64, batch_size=args.batch_size,
                          lmbda=lmbda, alpha=args.alpha)
        run_dir = Path(args.out_dir) / run_id / lmbda_tag(lmbda)
        run_dir.mkdir(parents=True, exist_ok=True)
        resumed = 0
        if (run_dir / "done").exists():
            if not args.extend:
                print(f"λ={lmbda:g}: done marker exists, skipping",
                      flush=True)
                # reload as warm-start source for the next λ
                from pcc_geo_cnn_v2_tpu.cli.common import load_params

                params = load_params(model, run_dir)
                prev_state = create_train_state(
                    model, jax.random.PRNGKey(0), cfg
                ).replace(
                    params=jax.tree_util.tree_map(jnp.asarray, params))
                continue
            state = create_train_state(model, jax.random.PRNGKey(42), cfg)
            state, resumed = restore_ckpt(run_dir, state)
            print(f"λ={lmbda:g}: extending from step {resumed}",
                  flush=True)
            steps = args.extend
        else:
            state = create_train_state(model, jax.random.PRNGKey(42), cfg)
            if prev_state is not None:  # warm-seq from the previous λ
                state = state.replace(params=jax.tree_util.tree_map(
                    jnp.asarray, jax.device_get(prev_state.params)))
            steps = args.base_steps if li == 0 else args.ft_steps
        multi = make_multi_step(model, cfg, len(train_np), K_INNER)
        val_fn = make_val_step(model, cfg, len(val_np))
        base_rng = jax.random.PRNGKey(1234 + li)
        log_path = run_dir / "train_log.jsonl"
        t0 = time.time()
        done_steps = 0
        best_val, best_params, best_step = np.inf, None, 0
        while done_steps < steps:
            state, logs = multi(state, data, base_rng)
            done_steps += K_INNER
            if done_steps % 1000 == 0:
                logs = jax.device_get(logs)
                vloss = float(val_fn(state.params, val_data,
                                     jax.random.PRNGKey(7)))
                rate = done_steps / (time.time() - t0)
                rec = {"step": done_steps, "split": "train",
                       **{k: float(v) for k, v in logs.items()},
                       "val_loss": vloss, "steps_per_sec": rate}
                if args.patience_steps:
                    if vloss < best_val:
                        best_val, best_step = vloss, done_steps
                        best_params = jax.device_get(state.params)
                    elif done_steps - best_step >= args.patience_steps:
                        rec["early_stop"] = done_steps
                        rec["best_step"] = best_step
                        rec["best_val"] = best_val
                with open(log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(f"λ={lmbda:g} step {done_steps}/{steps}: "
                      f"loss {rec['loss']:.1f} mbpov {rec['mbpov']:.3f} "
                      f"val {vloss:.1f} ({rate:.1f} it/s)", flush=True)
                if "early_stop" in rec:
                    print(f"λ={lmbda:g}: early stop at {done_steps} "
                          f"(best val {best_val:.1f} @ {best_step})",
                          flush=True)
                    break
        else:
            # budget exhausted between 1000-step probes: give the tail
            # a final probe so best-val checkpointing can't silently
            # discard it (e.g. --ft_steps 1500 with --patience_steps)
            if args.patience_steps and done_steps % 1000 != 0:
                vloss = float(val_fn(state.params, val_data,
                                     jax.random.PRNGKey(7)))
                with open(log_path, "a") as f:
                    f.write(json.dumps({"step": done_steps,
                                        "split": "final_probe",
                                        "val_loss": vloss}) + "\n")
                if vloss < best_val:
                    best_val, best_step = vloss, done_steps
                    best_params = jax.device_get(state.params)
        if best_params is not None:
            # reference semantics: the checkpoint is the BEST-val model
            # (tr_train.py best-loss Saver), not the last step. The
            # opt_state saved alongside is the final one (resume via
            # --extend restarts Adam moments from there).
            state = state.replace(params=jax.tree_util.tree_map(
                jnp.asarray, best_params))
            save_ckpt(run_dir, state, resumed + best_step)
        else:
            save_ckpt(run_dir, state, resumed + done_steps)
        (run_dir / "done").touch()
        print(f"λ={lmbda:g}: saved to {run_dir}", flush=True)
        prev_state = state


if __name__ == "__main__":
    main()
