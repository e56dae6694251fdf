"""Micro-benchmark of axon tunnel dispatch/fetch overheads.

Answers: where do the ~100ms/chunk go in the codec's chunked passes —
per-dispatch RPC, per-array fetch latency, or bandwidth? Drives the
decision between on-device concat-then-one-fetch vs per-chunk fetches.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(label, fn, reps=3):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{label:44s} {min(ts)*1e3:9.1f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    dev = jax.devices()[0]

    # warm the tunnel
    t0 = time.time()
    np.asarray(jnp.zeros((8,), jnp.int8) + 1)
    print(f"tunnel warmup {time.time()-t0:.0f}s", flush=True)

    f = jax.jit(lambda x: x + 1)
    n_chunks = 44
    # mimic the syms pass host-bound payload: int8 [8, 4096] per chunk
    xs = [jax.device_put(np.zeros((8, 4096), np.int8), dev)
          for _ in range(n_chunks)]
    jax.block_until_ready(xs)

    def dispatch_only():
        outs = [f(x) for x in xs]
        jax.block_until_ready(outs[-1])

    t("dispatch x44 (block last only)", dispatch_only)

    def dispatch_block_all():
        outs = [f(x) for x in xs]
        jax.block_until_ready(outs)

    t("dispatch x44 + block_until_ready all", dispatch_block_all)

    def fetch_per_chunk():
        outs = [f(x) for x in xs]
        return jax.device_get(outs)

    t("dispatch x44 + device_get(list of 44)", fetch_per_chunk)

    def fetch_concat():
        outs = [f(x) for x in xs]
        return np.asarray(jnp.concatenate(outs))

    t("dispatch x44 + concat + one fetch", fetch_concat)

    # 6 output keys per chunk, like the real syms pass
    g = jax.jit(lambda x: {k: x + i for i, k in enumerate("abcdef")})

    def six_keys_list():
        outs = [g(x) for x in xs]
        return jax.device_get(outs)

    t("6-key dict x44 device_get(list)", six_keys_list)

    def six_keys_concat():
        outs = [g(x) for x in xs]
        cat = {k: jnp.concatenate([o[k] for o in outs]) for k in "abcdef"}
        return jax.device_get(cat)

    t("6-key dict x44 concat-per-key + fetch", six_keys_concat)

    # single big fetch bandwidth reference: 44*8*4096 int8 = 1.4 MB
    big = jax.device_put(np.zeros((44 * 8, 4096), np.int8), dev)
    jax.block_until_ready(big)
    t("one fetch 1.4MB int8", lambda: np.asarray(f(big)))
    big32 = jax.device_put(np.zeros((44 * 8, 4096), np.float32), dev)
    jax.block_until_ready(big32)
    t("one fetch 5.8MB f32", lambda: np.asarray(f(big32)))


if __name__ == "__main__":
    main()
