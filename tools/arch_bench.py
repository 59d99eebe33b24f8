#!/usr/bin/env python
"""Per-architecture on-chip RTF records at production geometry.

BASELINE.md names five benchmark configs; bench.py measures the flagship
BS-RoFormer. This tool records the other four on the real TPU chip with
synthetic weights at REAL model shapes, one process for all configs (a chip
claim can lag minutes between processes on the tethered relay):

  mdx_inst_hq3    Conv-TDF ONNX at Inst-HQ3 STFT geometry (n_fft 6144,
                  dim_f 2560, segment 256, hop 1024) through MDXSeparator's
                  full demix (primary + match-mix secondary pass)
  vr_4band_hp2    5_HP-Karaoke-class VR: CascadedASPPNet hp2 capacity over
                  the real 4band_v2 multiband chain, window 512
  htdemucs        real-shape HTDemucs (channels 48, nfft 4096, depth 4,
                  t_layers 5), split overlap-add, shifts=2; also A/Bs the
                  batched single-call shift path vs sequential per-shift
                  passes (VERDICT r2 item 3)
  ensemble_batch  2-model RoFormer-class ensemble (avg_wave) and a 3-track
                  batch-folder steady state on the flagship

Writes BENCH_ARCHES.json incrementally (a stall keeps completed configs).

Usage: python tools/arch_bench.py [track_seconds] [--configs a,b] [--passes N]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

OUT_PATH = os.path.join(REPO, "BENCH_ARCHES.json")
SR = 44100


def _mark(msg):
    print(f"[arch-bench +{time.time() - T0:6.1f}s] {msg}", flush=True)


T0 = time.time()


def _write(records):
    with open(OUT_PATH, "w") as f:
        json.dump(records, f, indent=1, sort_keys=True)
        f.write("\n")


def _measure(fn, warm: bool, passes: int):
    """One warmup (compile) + best-of-N measured passes."""
    if warm:
        t0 = time.time()
        fn()
        warm_s = time.time() - t0
    else:
        warm_s = 0.0
    best = float("inf")
    for _ in range(passes):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best, warm_s


def _synth_mix(seconds, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    return (rng.standard_normal((2, int(seconds * SR))) * 0.1).astype("float32")


# ---------------------------------------------------------------------------


def bench_mdx(tmp, mix, passes):
    import logging

    import numpy as np
    import torch

    from parity_cases import ScalableConvTDF
    from audio_separator_tpu.architectures.mdx import MDXSeparator

    torch.manual_seed(0)
    dim_f, segment = 2560, 256
    model = ScalableConvTDF(dim_f, channels=24, scales=3).eval()
    onnx_path = os.path.join(tmp, "UVR_bench_hq3.onnx")
    try:
        from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

        onnx_proto_utils._add_onnxscript_fn = \
            lambda model_bytes, custom_opsets: model_bytes
    except ImportError:
        pass
    _mark("mdx: exporting HQ3-geometry ONNX (one torch trace forward)")
    torch.onnx.export(model, torch.randn(1, 4, dim_f, segment), onnx_path,
                      input_names=["input"], output_names=["output"],
                      dynamo=False)
    sep = MDXSeparator(
        common_config={
            "logger": logging.getLogger("bench"), "model_name": "bench_hq3",
            "model_path": onnx_path,
            "model_data": {"compensate": 1.022, "mdx_dim_f_set": dim_f,
                           "mdx_dim_t_set": 8, "mdx_n_fft_scale_set": 6144,
                           "primary_stem": "Instrumental"},
            "output_dir": tmp, "output_format": "WAV",
            "normalization_threshold": 0.9, "amplification_threshold": 0.0,
            "sample_rate": SR},
        arch_config={"segment_size": segment, "overlap": 0.25,
                     "batch_size": 4, "hop_length": 1024,
                     "enable_denoise": False})

    def run():
        primary = sep.demix(mix)                      # model pass
        raw = sep.demix(mix, is_match_mix=True)       # secondary match pass
        assert np.isfinite(primary).all() and np.isfinite(raw).all()

    best, warm = _measure(run, True, passes)
    n_params = sum(p.numel() for p in model.parameters())
    from audio_separator_tpu.ops.stft import link_quant_mode

    return {"rtf": round(mix.shape[-1] / SR / best, 2),
            "rtf_link_mode": link_quant_mode() or "off",
            "best_pass_s": round(best, 2), "warm_s": round(warm, 1),
            "geometry": {"n_fft": 6144, "dim_f": dim_f, "segment": segment,
                         "hop": 1024, "params_m": round(n_params / 1e6, 1)},
            "note": "full separate-equivalent: primary + match-mix passes"}


def bench_vr(tmp, mix, passes):
    import logging

    import numpy as np
    import jax

    from parity_cases import _randomize_with_buffers, _write_wav
    from ref_pipeline import load_ref_pipeline_module
    from audio_separator_tpu.architectures.vr import VRSeparator
    from audio_separator_tpu.models.vr_nets import state_dict_to_tree

    nets_mod = load_ref_pipeline_module("separator.uvr_lib_v5.vr_network.nets")
    arch_size = 33966
    n_bins = 672
    import torch

    net = _randomize_with_buffers(
        nets_mod.determine_model_capacity(n_bins * 2, arch_size), seed=1).eval()
    ckpt = os.path.join(tmp, "bench_5hp.pth")
    torch.save(net.state_dict(), ckpt)
    wav_path = _write_wav(mix, tmp)

    sep = VRSeparator(
        common_config={
            "logger": logging.getLogger("bench"), "model_name": "bench_5hp",
            "model_path": ckpt,
            "model_data": {"vr_model_param": "4band_v2",
                           "primary_stem": "Instrumental"},
            "output_dir": tmp, "output_format": "WAV",
            "normalization_threshold": 0.9, "amplification_threshold": 0.0,
            "sample_rate": SR},
        arch_config={"batch_size": 4, "window_size": 512, "aggression": 5,
                     "enable_tta": False, "enable_post_process": False,
                     "post_process_threshold": 0.2, "high_end_process": False})
    sep._params = jax.device_put(state_dict_to_tree(
        {k: v.numpy() for k, v in net.state_dict().items()}))
    sep._arch_size = arch_size
    sep._offset = 128

    def run():
        outputs = sep.separate(wav_path)
        assert len(outputs) == 2

    from audio_separator_tpu.ops.stft import link_quant_mode

    best, warm = _measure(run, True, passes)
    ambient = link_quant_mode() or "off"
    rec = {"rtf": round(mix.shape[-1] / SR / best, 2),
           "rtf_link_mode": (
               "shipped default (int16 on TPU)"
               if (ambient == "int16"
                   and "AUDSEP_LINK_QUANT" not in os.environ) else ambient),
           "best_pass_s": round(best, 2), "warm_s": round(warm, 1),
           "geometry": {"param": "4band_v2", "bins": n_bins,
                        "arch_size": arch_size, "window": 512},
           "note": "full separate() via the DEVICE multiband chain "
                   "(ops/vr_chain.py: one wave H2D, one stems D2H) + writes "
                   "(5_HP-Karaoke-class capacity)"}

    # Link-quant A/B with every mode pinned EXPLICITLY, "off" included (the
    # round-5 int16-on-TPU default means an unset env is NOT float mode).
    # Interleaved in ONE process so all modes see the same link regime. The
    # device chain moves only the wave/stems across the link, so the deltas
    # are small by construction.
    lq = {}
    os.environ["AUDSEP_LINK_QUANT"] = "off"
    try:
        base_out, _ = audio_io_load_stems(tmp, sep, wav_path)
    finally:
        os.environ.pop("AUDSEP_LINK_QUANT", None)
    for mode in ("off", "int16", "int8"):
        os.environ["AUDSEP_LINK_QUANT"] = mode
        try:
            b, w = _measure(run, True, max(1, passes - 1))
            out, _ = audio_io_load_stems(tmp, sep, wav_path)
            import numpy as np

            err = np.linalg.norm(base_out - out)
            snr = (float("inf") if err == 0 else
                   20 * float(np.log10(np.linalg.norm(base_out) / err)))
            lq[mode] = {"rtf": round(mix.shape[-1] / SR / b, 2),
                        "best_pass_s": round(b, 2),
                        "stem_snr_vs_off_db": round(snr, 1)}
        finally:
            os.environ.pop("AUDSEP_LINK_QUANT", None)
    rec["link_quant"] = lq
    return rec


def audio_io_load_stems(tmp, sep, wav_path):
    """Run one separation and load its two stems as one array (A/B
    comparisons under whatever AUDSEP_LINK_QUANT is currently set)."""
    import numpy as np

    from audio_separator_tpu.io import audio as audio_io

    outputs = sep.separate(wav_path)
    stems = [audio_io.load_audio(os.path.join(tmp, p))[0] for p in outputs]
    n = min(s.shape[-1] for s in stems)
    return np.stack([s[..., :n] for s in stems]), outputs


def bench_htdemucs(tmp, mix, passes):
    import numpy as np
    import jax

    from parity_cases import run_our_demucs
    from audio_separator_tpu.models.htdemucs import HTDemucsConfig

    import torch

    from ref_shims import load_ref_module

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
    n_params = sum(p.numel() for p in ref.parameters())
    del ref
    cfg = HTDemucsConfig(sources=tuple(sources), **{
        k: v for k, v in geometry.items() if k != "t_dropout"})

    def run_batched():
        out = run_our_demucs(cfg, params, mix, shifts=2, batch_size=4)
        assert np.isfinite(out).all()

    best, warm = _measure(run_batched, True, passes)

    # A/B: sequential per-shift passes (the pre-r3 semantics) vs the batched
    # single-call path, same offsets.
    from audio_separator_tpu.architectures.demucs import DemucsSeparator
    import jax.numpy as jnp

    sep = DemucsSeparator.__new__(DemucsSeparator)
    import logging

    sep.logger = logging.getLogger("bench")
    sep.segments_enabled = True
    sep.overlap = 0.25
    sep.batch_size = 4
    sep.shifts = 2
    sep.compute_dtype = jnp.float32

    max_shift = int(0.5 * cfg.samplerate)
    rng = np.random.default_rng(0)
    offsets = [int(rng.integers(0, max_shift + 1)) for _ in range(2)]
    padded = np.pad(mix, ((0, 0), (max_shift, max_shift)))

    def run_sequential():
        out = np.zeros((4, 2, mix.shape[-1]), np.float32)
        for offset in offsets:
            shifted = padded[:, offset : offset + mix.shape[-1] + max_shift]
            s_out = sep._apply_split(cfg, params, shifted)
            out += s_out[..., max_shift - offset :][..., : mix.shape[-1]]

    seq_best, seq_warm = _measure(run_sequential, True, max(1, passes - 1))

    track_s = mix.shape[-1] / SR
    rec = {"rtf": round(track_s / best, 2),  # rtf/rtf_link_mode finalised
           "best_pass_s": round(best, 2), "warm_s": round(warm, 1),  # below
           "rtf_sequential_shifts": round(track_s / seq_best, 2),
           "shift_batch_speedup": round(seq_best / best, 3),
           "geometry": {**geometry, "params_m": round(n_params / 1e6, 1),
                        "shifts": 2, "batch": 4},
           "note": "demix_demucs with shift TTA; A/B batched vs sequential "
                   "shift passes"}

    # Link-quant A/B under the SHIPPED policy: the on-chip profile
    # (PERF_PLAYBOOK "htdemucs profile") shows this pass is stem-fetch
    # bound (~169 MB f32 at shifts=2 vs a 197x-realtime forward), so the
    # quantised fetch is where the remaining headroom lives. Modes are
    # interleaved PASS-BY-PASS (off → int16 → int8, repeated) in one
    # process: the tether's bandwidth drifts 2-4x between minutes-long
    # regimes, so consecutive per-mode blocks measure the regime, not the
    # mode (observed live: an off-block at 24.9 s/pass where a healthy
    # regime gives 13 s). Best-of per mode across cycles lets every mode
    # catch the healthiest window that occurs during the run.
    # Every mode is pinned EXPLICITLY ("off" included): with the round-5
    # int16-on-TPU default, an unset env no longer means float transfers,
    # so the un-pinned warmup/headline passes above measure the SHIPPED
    # default and the rows below isolate each mode.
    os.environ["AUDSEP_LINK_QUANT"] = "off"
    try:
        base_out = run_our_demucs(cfg, params, mix, shifts=2, batch_size=4)
    finally:
        os.environ.pop("AUDSEP_LINK_QUANT", None)
    lq_best = {}
    snr = {}
    for mode in ("int16", "int8"):  # one-off quantise-kernel warmups
        os.environ["AUDSEP_LINK_QUANT"] = mode
        try:
            out = run_our_demucs(cfg, params, mix, shifts=2, batch_size=4)
            err = np.linalg.norm(base_out - out)
            snr[mode] = (float("inf") if err == 0 else
                         20 * float(np.log10(np.linalg.norm(base_out) / err)))
        finally:
            os.environ.pop("AUDSEP_LINK_QUANT", None)
    for _ in range(max(2, passes)):
        for mode in ("off", "int16", "int8"):
            os.environ["AUDSEP_LINK_QUANT"] = mode
            try:
                t0 = time.time()
                run_batched()
                lq_best[mode] = min(time.time() - t0,
                                    lq_best.get(mode, float("inf")))
            finally:
                os.environ.pop("AUDSEP_LINK_QUANT", None)
    rec["link_quant"] = {
        mode: {"rtf": round(track_s / b, 2), "best_pass_s": round(b, 2),
               **({"stem_snr_vs_off_db": round(snr[mode], 1)}
                  if mode in snr else {})}
        for mode, b in lq_best.items()}
    # Headline rtf = the AMBIENT mode the main passes ran under (the shipped
    # default unless AUDSEP_LINK_QUANT was set for the whole run). When that
    # mode has a pinned A/B row, fold it in — same mode, different moments
    # of the link regime. The pinned-off number lives in link_quant["off"].
    from audio_separator_tpu.ops.stft import link_quant_mode

    ambient = link_quant_mode() or "off"
    rec["rtf_link_mode"] = (
        "shipped default (int16 on TPU)" if (ambient == "int16"
                                             and "AUDSEP_LINK_QUANT"
                                             not in os.environ)
        else ambient)
    b_def = min(best, lq_best.get(ambient, float("inf")))
    rec["rtf"] = round(track_s / b_def, 2)
    rec["best_pass_s"] = round(b_def, 2)
    return rec


def bench_mel_kim(tmp, mix, passes):
    """Mel-Band RoFormer at Kim-vocal geometry (the second half of the
    BASELINE 'MDXC BS-/Mel-RoFormer vocals' config; bench.py covers BS)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from audio_separator_tpu.models.init_params import (
        init_roformer_params_device, mel_kim_config)
    from audio_separator_tpu.models.roformer import apply_roformer
    from audio_separator_tpu.ops.demix import overlap_add_demix
    from audio_separator_tpu.ops.stft import hamming_window

    cfg = mel_kim_config()
    chunk = cfg.stft_hop_length * 800
    step = min(8 * SR, chunk)
    window = np.asarray(hamming_window(chunk))
    params = init_roformer_params_device(cfg, seed=0, dtype=jnp.bfloat16)
    jax.block_until_ready(params)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    def model_fn(p, chunks):
        out = apply_roformer(p, cfg, chunks, compute_dtype=jnp.bfloat16)
        return out[..., : chunks.shape[-1]]

    def run():
        out = overlap_add_demix(model_fn, mix, chunk, step, window,
                                num_stems=cfg.num_stems, batch_size=4,
                                model_params=params)
        assert np.isfinite(out).all()

    best, warm = _measure(run, True, passes)
    track_s = mix.shape[-1] / SR
    from audio_separator_tpu.ops.stft import link_quant_mode

    return {"rtf": round(track_s / best, 2),
            "rtf_link_mode": link_quant_mode() or "off",
            "best_pass_s": round(best, 2), "warm_s": round(warm, 1),
            "geometry": {"dim": 384, "depth": 6, "num_bands": 60,
                         "n_fft": 2048, "hop": 441,
                         "params_m": round(n_params / 1e6, 1)},
            "note": "full e2e demix (upload + scan + fetch)"}


def bench_ensemble_batch(tmp, mix, passes):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from audio_separator_tpu.models.init_params import (
        flagship_config, init_roformer_params_device)
    from audio_separator_tpu.models.roformer import apply_roformer
    from audio_separator_tpu.ops.demix import overlap_add_demix
    from audio_separator_tpu.ops.stft import hamming_window
    from audio_separator_tpu.separator.ensembler import Ensembler

    cfg = flagship_config()
    chunk = cfg.stft_hop_length * 800
    step = min(8 * SR, chunk)
    window = np.asarray(hamming_window(chunk))
    params_a = init_roformer_params_device(cfg, seed=0, dtype=jnp.bfloat16)
    params_b = init_roformer_params_device(cfg, seed=1, dtype=jnp.bfloat16)
    jax.block_until_ready((params_a, params_b))

    def model_fn(p, chunks):
        out = apply_roformer(p, cfg, chunks, compute_dtype=jnp.bfloat16)
        return out[..., : chunks.shape[-1]]

    def demix_with(p, m=None):
        return overlap_add_demix(model_fn, mix if m is None else m, chunk,
                                 step, window, num_stems=cfg.num_stems,
                                 batch_size=4, model_params=p)

    ens = Ensembler(algorithm="avg_wave", weights=[1.0, 1.0])

    def run_ensemble():
        a = demix_with(params_a)[0]
        b = demix_with(params_b)[0]
        out = ens.ensemble([a, b])
        assert np.isfinite(out).all()

    best, warm = _measure(run_ensemble, True, passes)

    # batch folder: 3 tracks back-to-back on one model — serving steady state
    tracks = [_synth_mix(mix.shape[-1] / SR, seed=s) for s in (10, 11, 12)]

    def run_folder():
        for t in tracks:
            demix_with(params_a, t)

    folder_best, _ = _measure(run_folder, False, max(1, passes - 1))
    track_s = mix.shape[-1] / SR
    from audio_separator_tpu.ops.stft import link_quant_mode

    return {"rtf": round(2 * track_s / best, 2),  # 2 models' audio-seconds
            "rtf_link_mode": link_quant_mode() or "off",
            "best_pass_s": round(best, 2), "warm_s": round(warm, 1),
            "rtf_per_model": round(track_s / (best / 2), 2),
            "batch_folder_rtf_per_track": round(3 * track_s / folder_best, 2),
            "geometry": {"models": 2, "algorithm": "avg_wave",
                         "flagship": "bs_roformer ep317-class"},
            "note": "ensemble of two flagship-geometry models + 3-track "
                    "folder steady state"}


def _timed_audio_io():
    """Context manager: patch io.audio load/save so a measured pass itemises
    codec decode and stem-write time (VERDICT r4 item 2: the product-surface
    record must show decode → demix → write, not just engine time)."""
    import contextlib

    from audio_separator_tpu.io import audio as audio_io

    # Stem writes run sequentially (a threaded write pool was A/B'd and
    # reverted — PERF_PLAYBOOK "Negative result"), so summing per-call
    # durations is the correct phase time. If writes ever overlap again,
    # switch this to a wall-clock union or demix_and_glue goes negative.
    times = {"decode_s": 0.0, "write_s": 0.0}

    @contextlib.contextmanager
    def ctx():
        orig_load, orig_save = audio_io.load_audio, audio_io.save_audio

        def timed_load(*a, **k):
            t0 = time.time()
            try:
                return orig_load(*a, **k)
            finally:
                times["decode_s"] += time.time() - t0

        def timed_save(*a, **k):
            t0 = time.time()
            try:
                return orig_save(*a, **k)
            finally:
                times["write_s"] += time.time() - t0

        audio_io.load_audio, audio_io.save_audio = timed_load, timed_save
        try:
            yield times
        finally:
            audio_io.load_audio, audio_io.save_audio = orig_load, orig_save

    return ctx, times


def bench_separate_e2e(tmp, mix, passes):
    """Official PRODUCT-SURFACE RTF: ``Separator().load_model()`` +
    ``separate()`` on a real ~4-min WAV on disk — codec decode → demix →
    stem writes, through the public facade (the surface users call; the
    number comparable to the reference's "<2 min on a T4",
    ref: audio_separator/remote/README.md:5-7). Flagship BS-RoFormer
    geometry and htdemucs, synthetic weights at real shapes loaded through
    the local-model path (real checkpoints cannot be downloaded here)."""
    import logging

    import numpy as np
    import torch
    import yaml as yaml_mod

    from audio_separator_tpu.io import audio as audio_io
    from audio_separator_tpu.separator.separator import Separator

    # Real-music 4-min input: tile the 20 s fixture (decode cost scales with
    # length either way; content realism matters for normalize/write paths).
    track_s = mix.shape[-1] / SR
    fixture = "/root/reference/tests/inputs/mardy20s.flac"
    music, _ = audio_io.load_audio(fixture, sample_rate=SR, channels=2)
    reps = max(1, int(np.ceil(track_s * SR / music.shape[-1])))
    music = np.tile(music, (1, reps))[:, : int(track_s * SR)].astype("float32")
    wav_path = os.path.join(tmp, "bench_4min.wav")
    audio_io.save_audio(wav_path, music, SR)
    del music

    out = {}

    def product_pass(sep, path):
        ctx, times = _timed_audio_io()
        with ctx():
            t0 = time.time()
            files = sep.separate(path)
            total = time.time() - t0
        assert files, "no stems written"
        return total, times

    def measure(sep, label):
        best, best_phases, warm_s = float("inf"), None, 0.0
        t0 = time.time()
        product_pass(sep, wav_path)  # warm/compile
        warm_s = time.time() - t0
        for _ in range(passes):
            total, phases = product_pass(sep, wav_path)
            if total < best:
                best, best_phases = total, phases
        rec = {"rtf": round(track_s / best, 2),
               "best_pass_s": round(best, 2), "warm_s": round(warm_s, 1),
               "phases_s": {
                   "decode": round(best_phases["decode_s"], 2),
                   "stem_writes": round(best_phases["write_s"], 2),
                   "demix_and_glue": round(
                       best - best_phases["decode_s"]
                       - best_phases["write_s"], 2)},
               "surface": "Separator.load_model + Separator.separate "
                          "(WAV in → stem WAVs out)",
               "link_quant": os.environ.get("AUDSEP_LINK_QUANT")
                             or "int16 (TPU default)"}
        out[label] = rec
        _mark(f"separate_e2e[{label}]: {rec['rtf']}x "
              f"(decode {rec['phases_s']['decode']}s, "
              f"writes {rec['phases_s']['stem_writes']}s)")

    # ---- flagship BS-RoFormer through the facade (local ckpt + yaml) ----
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from parity_cases import build_ref_roformer
    from audio_separator_tpu.models.init_params import FLAGSHIP_FREQS_PER_BANDS

    geom = dict(dim=512, depth=12, stereo=True, num_stems=2,
                time_transformer_depth=1, freq_transformer_depth=1,
                freqs_per_bands=tuple(FLAGSHIP_FREQS_PER_BANDS),
                dim_head=64, heads=8, stft_n_fft=2048, stft_hop_length=441,
                stft_win_length=2048, mask_estimator_depth=2)
    _mark("separate_e2e: building flagship-geometry torch checkpoint "
          "(one-off host work)")
    ref = build_ref_roformer("bs", geom, seed=0)
    ckpt = os.path.join(tmp, "bench_bs_roformer_flagship.ckpt")
    torch.save({"state_dict": ref.state_dict()}, ckpt)
    n_params = sum(p.numel() for p in ref.parameters())
    del ref
    model_entry = {k: (list(v) if k == "freqs_per_bands" else v)
                   for k, v in geom.items()}
    model_entry["sample_rate"] = SR
    with open(os.path.join(tmp, "bench_bs_roformer_flagship.yaml"), "w") as f:
        yaml_mod.safe_dump({
            "audio": {"sample_rate": SR, "hop_length": 441,
                      "chunk_size": 441 * 800},
            "model": model_entry,
            "training": {"instruments": ["vocals", "other"],
                         "target_instrument": None},
            "inference": {"dim_t": 801, "batch_size": 4},
        }, f)

    sep = Separator(
        log_level=logging.WARNING, output_dir=tmp, model_file_dir=tmp,
        output_format="WAV",
        mdxc_params={"segment_size": 801, "override_model_segment_size": False,
                     "batch_size": 4, "overlap": 8, "pitch_shift": 0})
    sep.load_model(os.path.abspath(ckpt))
    measure(sep, "bs_roformer_flagship")
    out["bs_roformer_flagship"]["geometry"] = {
        "dim": 512, "depth": 12, "bands": len(FLAGSHIP_FREQS_PER_BANDS),
        "params_m": round(n_params / 1e6, 1)}

    # ---- htdemucs through the facade (local yaml bag) ----
    import hashlib

    from ref_shims import load_ref_module

    mod = load_ref_module("demucs.htdemucs")
    sources = ["drums", "bass", "other", "vocals"]
    ht_geom = dict(channels=48, nfft=4096, depth=4, t_layers=5, t_heads=8,
                   segment=7.8)
    torch.manual_seed(2)
    ht = mod.HTDemucs(sources, **{**ht_geom, "t_dropout": 0.0})
    with torch.no_grad():
        for p in ht.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    package = {"klass": mod.HTDemucs, "args": (),
               "kwargs": {"sources": sources, "audio_channels": 2, **ht_geom},
               "state": ht.state_dict()}
    ht_params_m = round(sum(p.numel() for p in ht.parameters()) / 1e6, 1)
    del ht
    tmp_th = os.path.join(tmp, "bench.tmp")
    torch.save(package, tmp_th)
    with open(tmp_th, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:8]
    os.rename(tmp_th, os.path.join(tmp, f"beefbeef-{digest}.th"))
    bag_yaml = os.path.join(tmp, "htdemucs_bench.yaml")
    with open(bag_yaml, "w") as f:
        yaml_mod.safe_dump({"models": ["beefbeef"],
                            "weights": [[1.0, 1.0, 1.0, 1.0]],
                            "segment": 7.8}, f)

    sep2 = Separator(
        log_level=logging.WARNING, output_dir=tmp, model_file_dir=tmp,
        output_format="WAV",
        demucs_params={"segment_size": "Default", "shifts": 2,
                       "overlap": 0.25, "segments_enabled": True})
    sep2.load_model(os.path.abspath(bag_yaml))
    measure(sep2, "htdemucs")
    out["htdemucs"]["geometry"] = {**ht_geom, "params_m": ht_params_m,
                                   "shifts": 2}
    return out


# ---------------------------------------------------------------------------


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("seconds", nargs="?", type=float, default=120.0)
    parser.add_argument("--configs", type=str, default="")
    parser.add_argument("--passes", type=int, default=2)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _mark(f"devices: {jax.devices()}")

    benches = {
        "mdx_inst_hq3": bench_mdx,
        "vr_4band_hp2": bench_vr,
        "htdemucs": bench_htdemucs,
        "mel_kim": bench_mel_kim,
        "ensemble_batch": bench_ensemble_batch,
        "separate_e2e": bench_separate_e2e,
    }
    selected = ([c.strip() for c in args.configs.split(",") if c.strip()]
                or list(benches))

    records = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            records = json.load(f)
    # track length is PER CONFIG (different configs get re-run at different
    # lengths across rounds); the legacy top-level field would otherwise
    # mislabel every row measured after the first run.
    records.pop("track_seconds", None)
    records.setdefault("device", str(jax.devices()[0]))
    records.setdefault("configs", {})

    import tempfile

    mix = _synth_mix(args.seconds)
    for name in selected:
        _mark(f"config {name} ...")
        t0 = time.time()
        try:
            with tempfile.TemporaryDirectory() as tmp:
                rec = benches[name](tmp, mix, args.passes)
        except Exception as exc:  # record the failure, keep going
            rec = {"error": f"{type(exc).__name__}: {exc}"}
        rec["wall_s"] = round(time.time() - t0, 1)
        rec.setdefault("track_seconds", args.seconds)
        records["configs"][name] = rec
        _write(records)
        _mark(f"config {name} done: {rec}")

    print(json.dumps(records, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
