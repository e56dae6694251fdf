"""Upload/download bandwidth + latency of the axon tunnel (round 3).

profile_eager.py showed fetches at ~2.8 MB/s and fast executables; the
16 s syms-phase gap needs upload bandwidth to explain. Times device_put
(forced through a jit consumer + scalar fetch) and device_get at the
codec's real transfer sizes.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(jnp.zeros(8))
    print(f"tunnel warmup {time.time()-t0:.0f}s", flush=True)

    consume = jax.jit(lambda a: a.ravel()[::65536].astype(jnp.int32).sum())

    for mb, dtype in [(0.001, np.uint8), (0.25, np.uint8), (1, np.uint8),
                      (2, np.uint32), (4, np.uint8), (8, np.uint8)]:
        n = int(mb * 1e6)
        host = np.random.randint(0, 200, n, np.uint8).astype(dtype)
        consume(jax.device_put(host)).block_until_ready()  # warm shape
        reps = 3
        t0 = time.time()
        for i in range(reps):
            host[0] = i  # defeat any caching
            consume(jax.device_put(host)).block_until_ready()
        dt = (time.time() - t0) / reps
        print(f"upload {host.nbytes/1e6:6.2f} MB: {dt*1000:8.0f} ms  "
              f"({host.nbytes/1e6/dt:6.2f} MB/s)", flush=True)

    make = jax.jit(lambda seed, n: (jax.random.randint(
        jax.random.PRNGKey(seed), (n,), 0, 255, jnp.int32)
        .astype(jnp.uint8)), static_argnums=1)
    for mb in (0.001, 0.25, 1, 2.8, 6.7, 8.4):
        n = int(mb * 1e6)
        make(0, n).block_until_ready()
        reps = 3
        t0 = time.time()
        for i in range(reps):
            a = make(i + 1, n).block_until_ready()
            np.asarray(a)
        dt = (time.time() - t0) / reps
        print(f"fetch  {n/1e6:6.2f} MB: {dt*1000:8.0f} ms  "
              f"({n/1e6/dt:6.2f} MB/s)", flush=True)

    # concurrent up+down: does the tunnel full-duplex?
    from concurrent.futures import ThreadPoolExecutor
    n = int(4e6)
    host = np.random.randint(0, 200, n, np.uint8)
    consume(jax.device_put(host)).block_until_ready()
    make(99, n).block_until_ready()
    t0 = time.time()
    with ThreadPoolExecutor(2) as ex:
        f1 = ex.submit(lambda: consume(
            jax.device_put(host)).block_until_ready())
        f2 = ex.submit(lambda: np.asarray(make(100, n).block_until_ready()))
        f1.result(); f2.result()
    print(f"concurrent 4MB up + 4MB down: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
