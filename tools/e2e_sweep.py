#!/usr/bin/env python
"""Single-process e2e demix sweep on the real chip.

Every experiment shares ONE process (and thus one chip claim — claim lag is
10-25 min between processes on the tethered relay, so per-experiment
processes are useless). Sweeps demix knobs that don't change the compiled
program per step (batch size / pipeline depth DO change program shape — each
(batch, depth) pair costs one compile, warm-cached thereafter).

Usage:  python tools/e2e_sweep.py [track_seconds] [pass_count]
Prints one line per config: config, per-pass seconds, RTF.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from audio_separator_tpu.models.init_params import (
        flagship_config, init_roformer_params_device)
    from audio_separator_tpu.models.roformer import apply_roformer
    from audio_separator_tpu.ops.demix import overlap_add_demix
    from audio_separator_tpu.ops.stft import hamming_window

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 240.0
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sr = 44100
    cfg = flagship_config()
    chunk = cfg.stft_hop_length * (801 - 1)
    step = min(8 * sr, chunk)

    print(f"devices: {jax.devices()}", flush=True)
    params = init_roformer_params_device(cfg, seed=0, dtype=jnp.bfloat16)
    jax.block_until_ready(params)
    print("params resident", flush=True)

    def model_fn(p, chunks):
        out = apply_roformer(p, cfg, chunks, compute_dtype=jnp.bfloat16)
        return out[..., : chunks.shape[-1]]

    rng = np.random.default_rng(0)
    mix = (rng.standard_normal((2, int(seconds * sr))) * 0.1).astype(np.float32)
    window = np.asarray(hamming_window(chunk))

    # (batch, pipeline_depth, d2h_fetch, h2d_upload) grid;
    # (4, 4, int16, int16) is the bench default.
    grid = [(4, 4, True, True), (4, 4, "int8", True), (4, 4, "int8", "int8"),
            (4, 6, True, True), (4, 8, True, True),
            (8, 4, True, True), (8, 4, "int8", "int8"), (8, 2, True, True),
            (2, 8, True, True), (6, 4, True, True)]
    for batch, depth, d2h, h2d in grid:
        def run():
            return overlap_add_demix(
                model_fn, mix, chunk, step, window, num_stems=cfg.num_stems,
                batch_size=batch, model_params=params,
                quantized_transfer=d2h, quantized_upload=h2d,
                pipeline_segments=depth)

        t0 = time.time()
        out = run()  # compile + warm
        warm = time.time() - t0
        assert np.isfinite(out).all()
        best = warm
        for _ in range(n_passes):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        print(f"batch={batch} depth={depth} d2h={d2h} h2d={h2d}: "
              f"warm={warm:6.1f}s best={best:6.2f}s "
              f"rtf={seconds / best:6.1f}x", flush=True)


if __name__ == "__main__":
    main()
