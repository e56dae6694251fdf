"""Fresh-process half of tools/aot_export.py: deserialize + run."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from jax.experimental.serialize_executable import deserialize_and_load

    from pcc_geo_cnn_v2_tpu.models.configs import build_model

    t0 = time.time()
    model = build_model("c3p", dtype=jnp.bfloat16)
    params = jax.tree_util.tree_map(
        np.asarray,
        model.init(jax.random.PRNGKey(0),
                   np.zeros((1, 16, 16, 16, 1), np.float32),
                   training=False),
    )
    y = np.zeros((8, 8, 8, 8, 64), np.int8)
    # tree defs must match serialize()'s: rebuild from a traced lower
    dec = jax.jit(lambda p, s: model.apply(p, s, method=model.decode_y))
    lowered = dec.lower(params, y)
    import jax.tree_util as jtu

    args_flat, in_tree = jtu.tree_flatten(((params, y), {}))
    del args_flat
    payload = Path("/tmp/aot_exec.bin").read_bytes()
    t1 = time.time()
    # out_tree: a single array result
    out_tree = jtu.tree_structure(np.zeros(1))
    compiled = deserialize_and_load(payload, in_tree, out_tree)
    t2 = time.time()
    res = np.asarray(compiled(params, y))
    t3 = time.time()
    print(f"setup {t1 - t0:.1f}s deserialize {t2 - t1:.1f}s "
          f"first-run {t3 - t2:.1f}s shape {res.shape}")


if __name__ == "__main__":
    main()
