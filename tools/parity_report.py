#!/usr/bin/env python
"""Full-production-geometry parity report vs the reference's own code.

Runs the five BASELINE configurations at REAL model geometry on a >=30 s
track, diffing our production separators against the reference's own loop
code (tests/ref_pipeline.py loads the real modules; tests/parity_cases.py
holds the case builders shared with the in-suite small-geometry tier):

  bs_roformer_flagship  62-band / depth-12 / dim-512 ep_317-class BS-RoFormer
  mel_roformer_kim      60-mel-band / dim-384 Kim-vocal-class Mel-RoFormer
  mdx_inst_hq3          Conv-TDF ONNX at Inst-HQ3 STFT geometry
                        (n_fft 6144, dim_f 2560, segment 256, hop 1024)
  vr_4band_v2           CascadedASPPNet (hp2 capacity) over the real
                        4band_v2 multiband chain (672 bins, polyphase)
  htdemucs              real-shape HTDemucs (channels 48, nfft 4096,
                        depth 4, t_layers 5) through split overlap-add

Writes PARITY.json incrementally (a crash keeps completed cases).
tests/test_parity_pipeline.py::test_production_parity_report_committed
asserts the committed report meets the >=40 dB per-stem parity bar.

Runtime: ~1 h on this 1-core host (the torch oracle forwards dominate:
the flagship is ~185 s/chunk). Run with JAX on CPU:
    python tools/parity_report.py [--cases a,b,...] [--seconds 30]

``--quick`` re-derives EVERY case in minutes (reduced depth/width, 8 s
track, same code paths end to end) and writes PARITY_QUICK.json; when a
committed PARITY_QUICK.json exists it asserts each case's worst-stem parity
is within 3 dB of the committed value (seeds are fixed, so healthy runs
reproduce to fractions of a dB) — the cheap between-rounds regression gate
the 4,000 s full-geometry tier cannot be (VERDICT r4 item 7). Opt-in suite
hook: AUDSEP_PARITY_QUICK=1 pytest tests/test_parity_pipeline.py -k quick.
"""

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

REPORT_PATH = os.path.join(REPO, "PARITY.json")


def _write_to(path, report):
    with open(path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seconds", type=float, default=None)
    parser.add_argument("--cases", type=str, default="")
    parser.add_argument("--quick", action="store_true",
                        help="reduced-geometry re-derivation of every case "
                             "(minutes, PARITY_QUICK.json) with a 3 dB "
                             "regression assertion vs the committed record")
    args = parser.parse_args()
    if args.seconds is None:
        args.seconds = 8.0 if args.quick else 30.0

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    torch.set_num_threads(max(os.cpu_count() - 0, 1))

    from parity_cases import htdemucs_case, mdx_case, roformer_case, vr_case
    from audio_separator_tpu.models.init_params import FLAGSHIP_FREQS_PER_BANDS

    quick = args.quick

    def bs_flagship(tmp):
        geom = dict(dim=512, depth=12, stereo=True, num_stems=2,
                    time_transformer_depth=1, freq_transformer_depth=1,
                    freqs_per_bands=tuple(FLAGSHIP_FREQS_PER_BANDS),
                    dim_head=64, heads=8, stft_n_fft=2048,
                    stft_hop_length=441, stft_win_length=2048,
                    mask_estimator_depth=2)
        if quick:
            # same 62-band table, scan, RoPE, mask estimator — the risky
            # code paths — at a depth/width the CPU oracle runs in seconds
            geom.update(dim=192, depth=2)
        return roformer_case("bs", geom, seconds=args.seconds, tmp_dir=tmp)

    def mel_kim(tmp):
        geom = dict(dim=384, depth=6, stereo=True, num_stems=2,
                    time_transformer_depth=1, freq_transformer_depth=1,
                    num_bands=60, sample_rate=44100, dim_head=64, heads=8,
                    stft_n_fft=2048, stft_hop_length=441,
                    stft_win_length=2048, mask_estimator_depth=2)
        if quick:
            geom.update(dim=192, depth=2)
        return roformer_case("mel", geom, seconds=args.seconds, tmp_dir=tmp)

    def mdx_hq3(tmp):
        geom = dict(n_fft=6144, dim_f=2560, dim_t_log2=8, segment_size=256,
                    hop_length=1024, channels=24, scales=3, compensate=1.022)
        if quick:
            geom.update(channels=8, scales=2)
        return mdx_case(geom, seconds=args.seconds, tmp_dir=tmp)

    def _vr_chain(mode):
        """Run a VR case under a pinned multiband-chain implementation and
        record which one in the meta (round 4 made the jitted device chain
        the shipped default; the host chain remains the oracle-exact
        fallback — both deserve a committed production-geometry number)."""
        prev = os.environ.get("AUDSEP_VR_CHAIN")
        os.environ["AUDSEP_VR_CHAIN"] = mode

        def restore():
            if prev is None:
                os.environ.pop("AUDSEP_VR_CHAIN", None)
            else:
                os.environ["AUDSEP_VR_CHAIN"] = prev

        return restore

    def vr_4band(tmp):
        restore = _vr_chain("device")
        try:
            deltas, meta = vr_case(
                "4band_v2", 33966, seconds=args.seconds, tmp_dir=tmp,
                window_size=512, aggression=5, enable_tta=True)
        finally:
            restore()
        meta["chain"] = "device"
        return deltas, meta

    def vr_4band_full(tmp):
        # every post-inference flag on: TTA + artifact post-process +
        # high-end mirroring, at a hotter aggression setting — through the
        # SHIPPED default (the jitted device multiband chain)
        restore = _vr_chain("device")
        try:
            deltas, meta = vr_case(
                "4band_v2", 33966, seconds=args.seconds, tmp_dir=tmp,
                window_size=512, aggression=10, enable_tta=True,
                enable_post_process=True, high_end_process=True)
        finally:
            restore()
        meta["chain"] = "device"
        return deltas, meta

    def vr_4band_full_hostchain(tmp):
        # same flags through the host-numpy chain (AUDSEP_VR_CHAIN=host):
        # pins the algorithmic-exactness story independent of the device
        # chain's float-accumulation noise
        restore = _vr_chain("host")
        try:
            deltas, meta = vr_case(
                "4band_v2", 33966, seconds=args.seconds, tmp_dir=tmp,
                window_size=512, aggression=10, enable_tta=True,
                enable_post_process=True, high_end_process=True)
        finally:
            restore()
        meta["chain"] = "host"
        return deltas, meta

    def mdx_hq3_denoise(tmp):
        geom = dict(n_fft=6144, dim_f=2560, dim_t_log2=8, segment_size=256,
                    hop_length=1024, channels=24, scales=3, compensate=1.022)
        if quick:
            geom.update(channels=8, scales=2)
        return mdx_case(geom, seconds=args.seconds, tmp_dir=tmp,
                        enable_denoise=True)

    def htdemucs(tmp):
        geom = dict(channels=48, nfft=4096, depth=4, t_layers=5, t_heads=8,
                    segment=7.8, t_dropout=0.0)
        if quick:
            geom.update(channels=16, t_layers=2)
        return htdemucs_case(geom, seconds=args.seconds)

    all_cases = {
        "bs_roformer_flagship": bs_flagship,
        "mel_roformer_kim": mel_kim,
        "mdx_inst_hq3": mdx_hq3,
        "vr_4band_v2": vr_4band,
        "vr_4band_full": vr_4band_full,
        "vr_4band_full_hostchain": vr_4band_full_hostchain,
        "mdx_hq3_denoise": mdx_hq3_denoise,
        "htdemucs": htdemucs,
    }
    selected = ([c.strip() for c in args.cases.split(",") if c.strip()]
                or list(all_cases))

    report_path = (os.path.join(REPO, "PARITY_QUICK.json") if args.quick
                   else REPORT_PATH)
    report = {"cases": {}, "seconds": args.seconds,
              "note": ("quick-mode re-derivation: reduced depth/width, same "
                       "code paths; regression gate vs the committed record"
                       if args.quick else
                       "parity vs the reference's own separator loop code at "
                       "production geometry with identical randomized weights; "
                       "parity_sdr_db is ref-vs-ours simple SDR per stem")}
    committed = None
    if os.path.exists(report_path):
        with open(report_path) as f:
            committed = json.load(f)
        if not args.quick:
            report = committed

    failures = []
    for name in selected:
        t0 = time.time()
        print(f"[parity] {name} ...", flush=True)
        with tempfile.TemporaryDirectory() as tmp:
            deltas, meta = all_cases[name](tmp)
        worst = min(d.parity_sdr_db for d in deltas.values())
        report["cases"][name] = {
            "meta": meta,
            "stems": {k: d.as_dict() for k, d in deltas.items()},
            "wall_s": round(time.time() - t0, 1),
        }
        if args.quick and committed is not None:
            ref_case = committed.get("cases", {}).get(name)
            if ref_case:
                ref_worst = min(s["parity_sdr_db"]
                                for s in ref_case["stems"].values())
                if worst < ref_worst - 3.0:
                    failures.append(
                        f"{name}: worst stem {worst:.1f} dB vs committed "
                        f"{ref_worst:.1f} dB (regression > 3 dB)")
        _write_to(report_path, report)
        print(f"[parity] {name} done in {time.time() - t0:.0f}s, "
              f"worst stem parity {worst:.1f} dB", flush=True)

    print(f"wrote {report_path}")
    if failures:
        for f_ in failures:
            print(f"[parity] REGRESSION: {f_}", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
