"""Train the committed benchmark checkpoint (c3p on synthetic shells).

bench.py loads ``pcc_geo_cnn_v2_tpu/assets/bench_c3p.msgpack.gz`` when
present so benchmark runs measure the codec at a realistic RD operating
point without retraining. Rerun this script to refresh the checkpoint.
"""

import gzip
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from pcc_geo_cnn_v2_tpu.models.configs import build_model
from pcc_geo_cnn_v2_tpu.training import (
    TrainConfig,
    create_train_state,
    make_train_step,
)
from pcc_geo_cnn_v2_tpu.utils.data import BlockDataset, synthetic_blocks

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
OUT = Path(__file__).resolve().parent.parent / (
    "pcc_geo_cnn_v2_tpu/assets/bench_c3p.msgpack.gz"
)


def main():
    print("devices:", jax.devices(), flush=True)
    model = build_model("c3p")
    cfg = TrainConfig(block_size=64, batch_size=8, lmbda=5e-4)
    state = create_train_state(model, jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(model, cfg)
    blocks = synthetic_blocks(512, block_size=64, seed=1, kind="mix")
    ds = BlockDataset(blocks, max_points=8192)
    it = ds.batches(cfg.batch_size, seed=0)
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(1, STEPS + 1):
        rng, k = jax.random.split(rng)
        state, logs = step_fn(state, jnp.asarray(next(it)), k)
        if i % 500 == 0:
            logs = jax.device_get(logs)
            print(f"step {i}: loss {logs['loss']:.3f} "
                  f"fl {logs['focal_loss']:.3f} mbpov {logs['mbpov']:.3f} "
                  f"({i/(time.time()-t0):.2f} it/s)", flush=True)
    params = jax.device_get(state.params)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(OUT, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"saved {OUT} ({OUT.stat().st_size/1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
