"""Probe the axon TPU backend: init + tiny fetch, retry loop.

Writes status lines to stdout; exits 0 on first success, keeps retrying
(sleep 240) up to --tries attempts otherwise. Run detached:
  setsid nohup python -u tools/tpu_probe.py > /tmp/tpu_probe.log 2>&1 &
"""
import sys
import time


def main() -> int:
    tries = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    for i in range(tries):
        t0 = time.time()
        print(f"[probe] attempt {i + 1}/{tries} at {time.strftime('%H:%M:%S')}", flush=True)
        try:
            import jax
            import numpy as np

            devs = jax.devices()
            print(f"[probe] devices after {time.time() - t0:.1f}s: {devs}", flush=True)
            import jax.numpy as jnp

            x = np.asarray(jnp.zeros(8) + 1.0)
            assert float(x.sum()) == 8.0
            print(f"[probe] OK fetch after {time.time() - t0:.1f}s", flush=True)
            return 0
        except Exception as e:  # noqa: BLE001
            print(f"[probe] FAIL after {time.time() - t0:.1f}s: {type(e).__name__}: {e}", flush=True)
            # jax backend state is process-wide poisoned after a failed init;
            # re-exec ourselves for a clean retry.
            if i + 1 < tries:
                time.sleep(240)
                import os

                os.execv(sys.executable, [sys.executable, "-u", __file__, str(tries - i - 1)])
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
