#!/usr/bin/env python
"""Measure the axon tether's transfer characteristics and compute/transfer
overlap, to establish the e2e demix floor (VERDICT r2 item 5).

Questions answered, one process, ~2 min on chip:

  1. H2D / D2H bandwidth at stem-sized buffers (8/32/64 MB) and small-op RTT.
  2. Can a D2H fetch overlap device compute? Launch a long matmul loop, then
     immediately fetch a large buffer: if wall(compute || fetch) ~=
     max(compute, fetch) the runtime overlaps DMA with compute; if it is
     ~= compute + fetch the link serialises and the demix e2e floor is
     forward_time + bytes/bandwidth — no amount of pipelining in ops/demix
     can close the measured gap further.
  3. The same for H2D during compute.

Writes LINK_PROFILE.json at the repo root.

Usage: python tools/link_profile.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

T0 = time.time()


def mark(msg):
    print(f"[link +{time.time() - T0:6.1f}s] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    mark(f"devices: {jax.devices()}")
    out = {"device": str(jax.devices()[0])}

    def sync(x):
        # block_until_ready is unreliable over axon; force a scalar readback
        float(jnp.sum(jnp.asarray(x).ravel()[:1]))

    # --- RTT: tiny round trip -------------------------------------------
    small = jnp.zeros((8,), jnp.float32)
    sync(small)
    t = time.time()
    for _ in range(10):
        np.asarray(small)
    out["rtt_ms"] = round((time.time() - t) / 10 * 1e3, 1)
    mark(f"RTT {out['rtt_ms']} ms")

    # --- bandwidth ------------------------------------------------------
    for mb in (8, 32, 64):
        host = np.random.default_rng(0).standard_normal(
            (mb * 1024 * 1024 // 4,)).astype(np.float32)
        t = time.time()
        dev = jnp.asarray(host)
        sync(dev)
        h2d = time.time() - t
        t = time.time()
        np.asarray(dev)
        d2h = time.time() - t
        out[f"h2d_{mb}mb_s"] = round(h2d, 2)
        out[f"d2h_{mb}mb_s"] = round(d2h, 2)
        out[f"h2d_{mb}mb_MBps"] = round(mb / h2d, 1)
        out[f"d2h_{mb}mb_MBps"] = round(mb / d2h, 1)
        mark(f"{mb} MB: H2D {mb/h2d:.1f} MB/s, D2H {mb/d2h:.1f} MB/s")

    # --- compute kernel calibrated to ~2 s ------------------------------
    a = jnp.asarray(np.random.default_rng(1).standard_normal(
        (4096, 4096)).astype(np.float32))

    @jax.jit
    def burn(a, iters):
        def body(_, x):
            return jnp.tanh(x @ a) * 0.999
        return jax.lax.fori_loop(0, iters, body, a)

    sync(burn(a, 1))
    t = time.time()
    sync(burn(a, 20))
    per20 = time.time() - t
    iters = max(20, int(20 * 2.0 / per20))
    t = time.time()
    sync(burn(a, iters))
    compute_s = time.time() - t
    out["compute_iters"] = iters
    out["compute_s"] = round(compute_s, 2)
    mark(f"compute block: {compute_s:.2f}s ({iters} iters)")

    # --- D2H overlap: dispatch compute, fetch an unrelated resident buffer
    big = jnp.asarray(np.random.default_rng(2).standard_normal(
        (32 * 1024 * 1024 // 4,)).astype(np.float32))
    sync(big)
    d2h_alone = out["d2h_32mb_s"]
    fut = burn(a, iters)          # async dispatch
    t = time.time()
    np.asarray(big)               # D2H while the loop runs
    fetch_during = time.time() - t
    sync(fut)
    total = time.time() - t
    out["d2h_32mb_during_compute_s"] = round(fetch_during, 2)
    out["d2h_overlap_total_s"] = round(total, 2)
    serial = compute_s + d2h_alone
    out["d2h_overlap_ratio"] = round(total / serial, 2)  # ~1.0 = serialised
    mark(f"D2H during compute: fetch {fetch_during:.2f}s, "
         f"wall {total:.2f}s vs serial {serial:.2f}s "
         f"(ratio {out['d2h_overlap_ratio']})")

    # --- H2D overlap ----------------------------------------------------
    host = np.asarray(big)
    fut = burn(a, iters)
    t = time.time()
    up = jnp.asarray(host)
    sync(up)
    up_during = time.time() - t
    sync(fut)
    total_up = time.time() - t
    out["h2d_32mb_during_compute_s"] = round(up_during, 2)
    out["h2d_overlap_total_s"] = round(total_up, 2)
    out["h2d_overlap_ratio"] = round(total_up / (compute_s + out["h2d_32mb_s"]), 2)
    mark(f"H2D during compute: upload {up_during:.2f}s, "
         f"wall {total_up:.2f}s (ratio {out['h2d_overlap_ratio']})")

    with open(os.path.join(REPO, "LINK_PROFILE.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
