"""A/B benchmark for attention kernels at flagship RoFormer shapes.

Sweeps the Pallas whole-sequence kernel's `group` parameter against the
einsum path and (when importable) the stock Pallas flash kernel, at the time-
and freq-attention shapes of the flagship BS-RoFormer demix (B=2 chunk batch,
62 bands, 801 frames, 8 heads x 64). Run on the real TPU:

    python tools/attn_bench.py [reps]

Times are per-call milliseconds, synced via float(sum) (block_until_ready is
unreliable over the axon tunnel).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from audio_separator_tpu.ops.attention import (_einsum_attention,
                                               _pallas_fused_attention)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SHAPES = {
    # (batch*fold, heads, seq, dim_head) at flagship demix shapes
    "time (2x62 bands, 801 frames)": (124, 8, 801, 64),
    "freq (2x801 frames, 62 bands)": (1602, 8, 62, 64),
}


def sync(x):
    return float(jnp.sum(x[..., :1]))


def bench(fn, q, k, v, label):
    try:
        f = jax.jit(fn)
        sync(f(q, k, v))  # compile
        t0 = time.time()
        for _ in range(REPS):
            out = f(q, k, v)
        sync(out)
        ms = (time.time() - t0) / REPS * 1e3
        print(f"{label:48s} {ms:8.2f} ms")
        return ms
    except Exception as e:  # noqa: BLE001 — report and keep sweeping
        print(f"{label:48s} FAILED: {type(e).__name__}: {e}")
        return float("inf")


def main():
    rng = np.random.default_rng(0)
    for name, (b, h, n, d) in SHAPES.items():
        print(f"== {name}: (B={b}, H={h}, N={n}, D={d}) bf16 ==")
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        scale = d ** -0.5

        bench(lambda q, k, v: _einsum_attention(q, k, v, scale), q, k, v,
              "einsum")
        for group in (1, 2, 4, 8, 16, 32):
            if (b * h) % group:
                continue
            bench(lambda q, k, v, g=group:
                  _pallas_fused_attention(q, k, v, scale, group=g),
                  q, k, v, f"pallas whole-seq group={group}")
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention)

            bench(lambda q, k, v: flash_attention(q, k, v, sm_scale=scale),
                  q, k, v, "stock pallas flash")
        except Exception as e:  # noqa: BLE001
            print(f"stock pallas flash unavailable: {e}")


if __name__ == "__main__":
    main()
