#!/usr/bin/env python
"""Phase-level probe of the Demucs batched-shift path at long track lengths.

SHIFT_AB.json showed the batched path LOSING at 240 s (0.55x) despite
fetching half the bytes. Hypothesis: `post_device_fn` forces
pipeline_segments=1 (ops/demix.py), so every upload (mix buffer, dense
window rows — ~115 MB of f32 at 240 s — and the divider) serialises with
compute instead of hiding behind it. This probe times each component on
the real chip:

  * h2d of the dense window rows / mix buffer / divider, alone;
  * d2h of a (4, 2, track) int16 result, alone;
  * the shipped batched call (post fn on — unpipelined before the r5
    device drain, pipelined after it; the key is ``shipped_post_s``);
  * the same layout WITHOUT the post fn (pipelined, full-span fetch).

Usage: python tools/shift_probe.py [--secs 240] [--batch 4] [--passes 2]
"""

import argparse
import json
import logging
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SR = 44100
T0 = time.time()


def _mark(msg):
    print(f"[probe +{time.time() - T0:6.1f}s] {msg}", flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--secs", type=float, default=240.0)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--passes", type=int, default=2)
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import torch

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _mark(f"devices: {jax.devices()}")

    def sync(x):
        return float(jnp.sum(jnp.abs(x).astype(jnp.float32)))

    from ref_shims import load_ref_module
    from audio_separator_tpu.architectures.demucs import DemucsSeparator
    from audio_separator_tpu.models.htdemucs import HTDemucsConfig
    from audio_separator_tpu.ops.demix import overlap_add_demix

    mod = load_ref_module("demucs.htdemucs")
    sources = ["drums", "bass", "other", "vocals"]
    geometry = dict(channels=48, nfft=4096, depth=4, t_layers=5, t_heads=8,
                    segment=7.8, t_dropout=0.0)
    torch.manual_seed(2)
    ref = mod.HTDemucs(sources, **geometry)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    tree: dict = {}
    for key, value in ref.state_dict().items():
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value.detach().numpy()
    params = jax.device_put(tree)
    del ref
    cfg = HTDemucsConfig(sources=tuple(sources), **{
        k: v for k, v in geometry.items() if k != "t_dropout"})
    max_shift = int(0.5 * cfg.samplerate)

    rng = np.random.default_rng(0)
    mix = (rng.standard_normal((2, int(args.secs * SR))) * 0.1
           ).astype(np.float32)
    offsets = [int(rng.integers(0, max_shift + 1)) for _ in range(2)]

    sep = DemucsSeparator.__new__(DemucsSeparator)
    sep.logger = logging.getLogger("probe")
    sep.segments_enabled = True
    sep.overlap = 0.25
    sep.batch_size = args.batch
    sep.shifts = 2
    sep.compute_dtype = jnp.float32

    # --- rebuild the exact batched layout (mirrors _apply_shifts_batched) ---
    length = mix.shape[-1]
    track_len = length + max_shift
    (segment, stride, pad_lead, span, rel_pos, rows,
     div_one) = sep._train_segment_plan(cfg, track_len)
    padded = np.pad(mix, ((0, 0), (max_shift, max_shift)))
    n_shifts = len(offsets)
    buf = np.zeros((2, span * n_shifts), dtype=np.float32)
    divider = np.ones(span * n_shifts, dtype=np.float32)
    positions = np.concatenate([rel_pos + s * span for s in range(n_shifts)])
    all_rows = np.tile(rows, (n_shifts, 1))
    for s, offset in enumerate(offsets):
        buf[:, s * span + pad_lead: s * span + pad_lead + track_len] = \
            padded[:, offset: offset + track_len]
        divider[s * span: (s + 1) * span] = div_one

    out = {"secs": args.secs, "batch": args.batch,
           "n_windows": int(len(positions)), "span": int(span),
           "rows_mb": round(all_rows.nbytes / 1e6, 1),
           "buf_mb": round(buf.nbytes / 1e6, 1),
           "divider_mb": round(divider.nbytes / 1e6, 1),
           "device": str(jax.devices()[0]),
           "run_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}

    # --- raw link timings (interleave passes; keep best) ---
    def h2d(arr):
        d = jnp.asarray(arr)
        sync(d)
        return d

    fetch_i16 = (np.random.default_rng(1).integers(
        -2 ** 14, 2 ** 14, size=(4, 2, length)).astype(np.int16))
    d_fetch = jnp.asarray(fetch_i16)
    sync(d_fetch)

    best = {"h2d_rows_s": np.inf, "h2d_buf_i16_s": np.inf,
            "h2d_divider_s": np.inf, "d2h_stems_i16_s": np.inf}
    buf_i16 = (buf * 32767).astype(np.int16)
    for _ in range(args.passes):
        t = time.time(); h2d(all_rows); best["h2d_rows_s"] = min(
            best["h2d_rows_s"], time.time() - t)
        t = time.time(); h2d(buf_i16); best["h2d_buf_i16_s"] = min(
            best["h2d_buf_i16_s"], time.time() - t)
        t = time.time(); h2d(divider); best["h2d_divider_s"] = min(
            best["h2d_divider_s"], time.time() - t)
        t = time.time(); np.asarray(d_fetch); best["d2h_stems_i16_s"] = min(
            best["d2h_stems_i16_s"], time.time() - t)
    out.update({k: round(v, 2) for k, v in best.items()})
    mb = (all_rows.nbytes / 1e6) / max(best["h2d_rows_s"], 1e-9)
    out["link_mb_s_est"] = round(mb, 1)
    _mark(f"link: {json.dumps({k: out[k] for k in best})} (~{mb:.0f} MB/s)")

    # --- shipped batched call (post fn on) vs no-post pipelined layout ---
    def run_shipped():
        r = sep._apply_shifts_batched(cfg, params, mix, offsets, max_shift)
        assert np.isfinite(r).all()

    def run_nopost():
        r = overlap_add_demix(
            sep._model_fn(cfg), buf, segment, stride, all_rows,
            num_stems=4, batch_size=sep.batch_size,
            positions=positions.astype(np.int32), divider=divider,
            model_params=params)
        # host align/average (sequential-arm semantics)
        outp = np.zeros((4, 2, length), np.float32)
        for s, offset in enumerate(offsets):
            start = s * span + pad_lead + (max_shift - offset)
            outp += r[..., start: start + length]
        outp /= n_shifts
        assert np.isfinite(outp).all()

    _mark("warmups (compile-cached shapes)")
    run_shipped()
    run_nopost()
    # NOTE key name: the "shipped" arm measures whatever the CURRENT
    # engine does for post_device_fn — before the r5 device drain that was
    # the unpipelined whole-buffer scan (SHIFT_PROBE len240s_b4_predrain),
    # after it the pipelined drain (…_postdrain).
    best2 = {"shipped_post_s": np.inf, "nopost_pipelined_s": np.inf}
    for _ in range(args.passes):
        t = time.time(); run_shipped(); best2[
            "shipped_post_s"] = min(
            best2["shipped_post_s"], time.time() - t)
        t = time.time(); run_nopost(); best2["nopost_pipelined_s"] = min(
            best2["nopost_pipelined_s"], time.time() - t)
    out.update({k: round(v, 2) for k, v in best2.items()})
    _mark(json.dumps(best2))

    path = os.path.join(REPO, "SHIFT_PROBE.json")
    prior = {}
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
    prior[f"len{int(args.secs)}s_b{args.batch}"] = out  # overwrites the
    # same-geometry key; rename historical entries (…_predrain) to keep them
    with open(path, "w") as f:
        json.dump(prior, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
