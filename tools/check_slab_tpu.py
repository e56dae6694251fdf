"""Mosaic compile + parity + timing check of the fused conv kernels on
real TPU (the slab tail OOMed the default 16 MB scoped-vmem budget;
pallas_conv now passes vmem_limit_bytes=100MB)."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from pcc_geo_cnn_v2_tpu.ops.pallas_conv import (
        _xla_conv,
        fused_residual_tail,
        fused_residual_tail_slab,
    )

    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(jnp.zeros(8))
    print(f"tunnel warmup {time.time()-t0:.0f}s", flush=True)

    k = jax.random.split(jax.random.PRNGKey(0), 5)
    # whole sizes = every ≤MAX_FUSED_ROWS tail stage of the c3p stacks
    for spatial, channels, which in [(8, 64, "whole"), (16, 32, "whole"),
                                     (32, 16, "whole"), (32, 32, "whole"),
                                     (64, 16, "slab")]:
        n = 2
        x = jax.random.uniform(k[0], (n, spatial, spatial, spatial,
                                      channels))
        w1 = jax.random.normal(k[1], (3, 3, 3, channels, channels)) * 0.1
        w2 = jax.random.normal(k[2], (3, 3, 3, channels, channels)) * 0.1
        b1 = jax.random.normal(k[3], (channels,)) * 0.1
        b2 = jax.random.normal(k[4], (channels,)) * 0.1
        fn = (fused_residual_tail if which == "whole"
              else fused_residual_tail_slab)
        try:
            t0 = time.time()
            # parity at HIGHEST matmul precision: the TPU default runs
            # f32 contractions through single-pass bf16 on the MXU, so
            # kernel-vs-XLA differences of ~5e-3 are just contraction-
            # order rounding, not miscompiles (observed r3)
            with jax.default_matmul_precision("highest"):
                got = jax.jit(lambda *a: fn(
                    *a, spatial=spatial, channels=channels,
                    dtype=jnp.float32))(x, w1, b1, w2, b2)
                got.block_until_ready()
            print(f"{which} {spatial}^3x{channels}: compile+run "
                  f"{time.time()-t0:.1f}s", flush=True)
        except Exception as e:
            print(f"{which} {spatial}^3x{channels} FAILED: "
                  f"{str(e)[:2500]}", flush=True)
            continue
        with jax.default_matmul_precision("highest"):
            want = jax.nn.relu(_xla_conv(x, w1, b1, dtype=jnp.float32))
            want = jax.nn.relu(
                _xla_conv(want, w2, b2, dtype=jnp.float32)) + x
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
        print(f"  max err vs XLA: {err:.2e}", flush=True)
        assert err < 1e-3, err
        # bf16 steady-state timing vs XLA chain
        f = jax.jit(lambda *a: fn(*a, spatial=spatial, channels=channels))
        g = jax.jit(lambda *a: jax.nn.relu(_xla_conv(
            jax.nn.relu(_xla_conv(a[0], a[1], a[2])), a[3], a[4])) + a[0])
        for tag, h in (("pallas", f), ("xla   ", g)):
            h(x, w1, b1, w2, b2).block_until_ready()
            t0 = time.time()
            for _ in range(10):
                r = h(x, w1, b1, w2, b2)
            r.block_until_ready()
            print(f"  {tag} bf16: {(time.time()-t0)/10*1000:7.2f} ms "
                  f"/ {n} blocks", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
