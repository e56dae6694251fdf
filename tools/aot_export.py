"""AOT executable serialization experiment (VERDICT r2 #6b).

The axon remote compiler bypasses JAX_COMPILATION_CACHE_DIR, so every
fresh process pays the full 1-3 min remote compile set. This tool tests
whether ``jax.experimental.serialize_executable`` round-trips a compiled
executable through disk into a FRESH process, which would make cold
starts cheap:

  phase 1 (this process): build the c3p decode executable, time
    compile, serialize to /tmp/aot_exec.bin
  phase 2 (subprocess):   deserialize + run, time to first result

Writes /tmp/aot_result.json either way — a negative result with the
axon constraint is a recorded outcome, not a failure.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CHILD = Path(__file__).resolve().parent / "_aot_child.py"
EXEC_PATH = "/tmp/aot_exec.bin"
RESULT = "/tmp/aot_result.json"


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from pcc_geo_cnn_v2_tpu.models.configs import build_model

    out = {"backend": None, "serialize_ok": False, "fresh_process_ok": False}
    t0 = time.time()
    out["backend"] = jax.default_backend()
    print("backend:", out["backend"], flush=True)

    model = build_model("c3p", dtype=jnp.bfloat16)
    params = jax.tree_util.tree_map(
        np.asarray,
        model.init(jax.random.PRNGKey(0),
                   np.zeros((1, 16, 16, 16, 1), np.float32),
                   training=False),
    )
    dec = jax.jit(lambda p, s: model.apply(p, s, method=model.decode_y))
    y = np.zeros((8, 8, 8, 8, 64), np.int8)

    t0 = time.time()
    lowered = dec.lower(params, y)
    compiled = lowered.compile()
    out["compile_s"] = round(time.time() - t0, 2)
    print(f"compile {out['compile_s']}s", flush=True)
    t0 = time.time()
    np.asarray(compiled(params, y))  # warm run + fetch
    out["first_run_s"] = round(time.time() - t0, 2)

    try:
        from jax.experimental.serialize_executable import serialize

        t0 = time.time()
        payload, in_tree, out_tree = serialize(compiled)
        Path(EXEC_PATH).write_bytes(payload)
        out["serialize_ok"] = True
        out["serialize_s"] = round(time.time() - t0, 2)
        out["payload_mb"] = round(len(payload) / 1e6, 2)
        print(f"serialized {out['payload_mb']} MB", flush=True)
    except Exception as e:  # noqa: BLE001
        out["serialize_error"] = f"{type(e).__name__}: {e}"
        print("serialize FAILED:", out["serialize_error"], flush=True)

    if out["serialize_ok"]:
        t0 = time.time()
        r = subprocess.run([sys.executable, "-u", str(CHILD)],
                           capture_output=True, text=True, timeout=1200)
        out["fresh_process_s"] = round(time.time() - t0, 2)
        out["fresh_process_ok"] = r.returncode == 0
        out["child_tail"] = (r.stdout + r.stderr)[-1500:]
        print(f"fresh process rc={r.returncode} "
              f"in {out['fresh_process_s']}s", flush=True)

    Path(RESULT).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
