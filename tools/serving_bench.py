#!/usr/bin/env python
"""Multi-track serving throughput on one chip: jobs/hour vs worker count.

The remote server (remote/server.py SeparatorService) runs jobs from a queue;
the worker count is configurable (AUDSEP_SERVER_WORKERS / serve(workers=)).
Rationale for >1: a single job's e2e demix leaves the chip idle during host
overlap-add, encode, and H2D/D2H gaps (the flagship measures ~25% e2e-vs-
forward loss on a tethered link, BENCH_r02.json), so a second job's device
work can fill those gaps — at the cost of per-job latency. This tool measures
the actual aggregate: submit K identical jobs, time queue-drain, report
jobs/hour and aggregate processed-audio RTF for workers=1 vs workers=2.

Model: a synthetic Mel-RoFormer checkpoint at mid-production geometry
(dim 256 / depth 6 / 60 mel bands / n_fft 2048 @ 44.1 kHz) through the REAL
serving path: SeparatorService.submit → Separator.load_model → separate →
encode → output store. The process-level fn/weight caches (ops/fn_cache.py)
are shared across workers exactly as in production.

Writes SERVING.json. Run on the real TPU host:
    python tools/serving_bench.py [--jobs 6] [--seconds 60] [--workers 1,2]
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

OUT_PATH = os.path.join(REPO, "SERVING.json")
SR = 44100
N_FFT, HOP = 2048, 441
NUM_BANDS = 60
DIM, DEPTH = 256, 6
DIM_T = 256  # chunk = HOP*(DIM_T-1) ≈ 2.55 s


def _make_model(dirpath: str) -> str:
    """Synthetic Mel-RoFormer checkpoint + YAML at mid-production geometry."""
    import numpy as np
    import torch
    import yaml

    from audio_separator_tpu.models.melbands import mel_band_membership
    from torch_oracles.roformer_oracle import RoformerOracle

    torch.manual_seed(0)
    member, _, _, _ = mel_band_membership(SR, N_FFT, NUM_BANDS)
    band_bins = [list(np.nonzero(member[i])[0]) for i in range(NUM_BANDS)]
    oracle = RoformerOracle(
        kind="mel", band_bins=band_bins, dim=DIM, depth=DEPTH, heads=8,
        dim_head=32, stereo=True, num_stems=1, t_depth=1, f_depth=1,
        n_fft=N_FFT, hop=HOP, mask_depth=1,
    ).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    ckpt = os.path.join(dirpath, "serving_mel_band_roformer.ckpt")
    torch.save({"state_dict": oracle.state_dict()}, ckpt)
    config = {
        "audio": {"sample_rate": SR, "hop_length": HOP},
        "model": {
            "dim": DIM, "depth": DEPTH, "stereo": True, "num_stems": 1,
            "time_transformer_depth": 1, "freq_transformer_depth": 1,
            "num_bands": NUM_BANDS, "dim_head": 32, "heads": 8,
            "stft_n_fft": N_FFT, "stft_hop_length": HOP,
            "stft_win_length": N_FFT, "mask_estimator_depth": 1,
            "sample_rate": SR,
        },
        "training": {"instruments": ["vocals", "other"],
                     "target_instrument": "vocals"},
        "inference": {"dim_t": DIM_T, "batch_size": 4},
    }
    with open(os.path.splitext(ckpt)[0] + ".yaml", "w") as f:
        yaml.safe_dump(config, f)
    return os.path.basename(ckpt)


def _make_model_mdx(dirpath: str) -> str:
    """Synthetic Conv-TDF ONNX at mid-production MDX geometry + sidecar
    params json (the offline local-model path, Separator._resolve_model_data).
    Exercises the round-5 MDX cross-job batching through the REAL serving
    coalesce path (MDXSeparator.separate_batch → demix_jobs_layout)."""
    import torch

    from parity_cases import ScalableConvTDF

    try:
        from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

        onnx_proto_utils._add_onnxscript_fn = \
            lambda model_bytes, custom_opsets: model_bytes
    except ImportError:
        pass
    torch.manual_seed(0)
    dim_f, segment = 2048, 256
    model = ScalableConvTDF(dim_f, channels=12, scales=2).eval()
    name = "serving_bench_mdx.onnx"
    torch.onnx.export(model, torch.randn(1, 4, dim_f, segment),
                      os.path.join(dirpath, name),
                      input_names=["input"], output_names=["output"],
                      dynamo=False)
    with open(os.path.join(dirpath, "serving_bench_mdx.json"), "w") as f:
        json.dump({"compensate": 1.022, "mdx_dim_f_set": dim_f,
                   "mdx_dim_t_set": 8, "mdx_n_fft_scale_set": 4096,
                   "primary_stem": "Instrumental"}, f)
    return name


def _make_model_vr(dirpath: str) -> str:
    """Synthetic VR CascadedASPPNet (sp-class caps, arch 31191) + sidecar
    params json. Exercises the round-5 VR cross-job dispatch overlap through
    the REAL serving coalesce path (VRSeparator.separate_batch: every job's
    device chain enqueued before the first stem fetch)."""
    import torch

    from torch_oracles.vr_oracle import CascadedASPPNetOracle

    # sp-class capacity row (matches tests/test_vr.py SP_CAPS); the saved
    # file is small, so the file-size arch sniff resolves to 31191.
    caps = [(2, 16), (2, 16), (18, 8, 1, 1, 0), (8, 16), (34, 16, 1, 1, 0),
            (16, 32), (32, 2, 1), (16, 2, 1), (16, 2, 1)]
    torch.manual_seed(0)
    oracle = CascadedASPPNetOracle(2048, caps, 31191).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    name = "serving_bench_vr.pth"
    torch.save(oracle.state_dict(), os.path.join(dirpath, name))
    with open(os.path.join(dirpath, "serving_bench_vr.json"), "w") as f:
        json.dump({"vr_model_param": "1band_sr44100_hl512",
                   "primary_stem": "Instrumental"}, f)
    return name


def _make_model_demucs(dirpath: str) -> str:
    """Synthetic HTDemucs yaml bag at real geometry (same builder shape as
    arch_bench's separate_e2e htdemucs row). Exercises the r5 pipelined
    device drain (shift-trick post fn) through the REAL serving path."""
    import hashlib

    import torch
    import yaml

    from ref_shims import load_ref_module

    mod = load_ref_module("demucs.htdemucs")
    sources = ["drums", "bass", "other", "vocals"]
    geom = dict(channels=48, nfft=4096, depth=4, t_layers=5, t_heads=8,
                segment=7.8)
    torch.manual_seed(2)
    ht = mod.HTDemucs(sources, **{**geom, "t_dropout": 0.0})
    with torch.no_grad():
        for p in ht.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    package = {"klass": mod.HTDemucs, "args": (),
               "kwargs": {"sources": sources, "audio_channels": 2, **geom},
               "state": ht.state_dict()}
    del ht
    tmp_th = os.path.join(dirpath, "serving.tmp")
    torch.save(package, tmp_th)
    with open(tmp_th, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:8]
    os.rename(tmp_th, os.path.join(dirpath, f"beefbeef-{digest}.th"))
    name = "serving_bench_htdemucs.yaml"
    with open(os.path.join(dirpath, name), "w") as f:
        yaml.safe_dump({"models": ["beefbeef"],
                        "weights": [[1.0, 1.0, 1.0, 1.0]],
                        "segment": 7.8}, f)
    return name


def _drain(service, task_ids, poll=0.5):
    done = {}
    while len(done) < len(task_ids):
        for tid in task_ids:
            if tid in done:
                continue
            st = service.get_status(tid) or {}
            if st.get("status") in ("completed", "error"):
                done[tid] = st
        time.sleep(poll)
    return done


def _run_config(workers, model_dir, model_name, wavs, warm_wav):
    from audio_separator_tpu.remote.server import SeparatorService

    work_dir = tempfile.mkdtemp(prefix=f"serving-bench-w{workers}-")
    service = SeparatorService(work_dir=work_dir, model_file_dir=model_dir,
                               workers=workers)
    fields = {"model": model_name, "output_format": "flac"}

    # Warm: one solo job compiles the un-coalesced demix program and uploads
    # weights, then one full UNMEASURED pass over the same job set compiles
    # every coalesced group-size geometry the measured pass will hit (6 jobs
    # at coalesce 4 → group-4 and group-2 programs; without this the first
    # coalesce config measured ~100 s of XLA compile as queue time). The
    # persistent compile cache (ops/fn_cache.py) makes later processes skip
    # these compiles entirely; the warm pass keeps the record honest even on
    # a cold cache.
    with open(warm_wav, "rb") as f:
        tid = service.submit(os.path.basename(warm_wav), f.read(), dict(fields))
    st = service.wait(tid, timeout=1800)
    assert st and st.get("status") == "completed", st
    warm_ids = []
    for wav in wavs:
        with open(wav, "rb") as f:
            warm_ids.append(service.submit(os.path.basename(wav), f.read(),
                                           dict(fields)))
    for tid in warm_ids:
        st = service.wait(tid, timeout=1800)
        assert st and st.get("status") == "completed", st

    t0 = time.time()
    ids = []
    for wav in wavs:
        with open(wav, "rb") as f:
            ids.append(service.submit(os.path.basename(wav), f.read(),
                                      dict(fields)))
    done = _drain(service, ids)
    wall = time.time() - t0
    errors = [tid for tid, st in done.items()
              if st.get("status") != "completed"]
    assert not errors, {tid: done[tid] for tid in errors}
    return wall


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--jobs", type=int, default=6)
    parser.add_argument("--seconds", type=float, default=60.0)
    parser.add_argument("--workers", type=str, default="1,2")
    parser.add_argument("--coalesce", type=str, default="1,4",
                        help="AUDSEP_SERVER_COALESCE values to sweep per "
                             "worker count (1 = off; >1 = cross-job window "
                             "batching via ops/demix.demix_jobs)")
    parser.add_argument("--arch", type=str, default="mel_roformer",
                        choices=("mel_roformer", "mdx", "vr", "htdemucs"),
                        help="model family for the sweep (mdx exercises the "
                             "non-flagship coalescing path, VERDICT r4 item "
                             "4; vr exercises VRSeparator.separate_batch "
                             "dispatch overlap)")
    args = parser.parse_args()

    import numpy as np

    from audio_separator_tpu.io import audio as audio_io

    t_start = time.time()
    worker_counts = [int(w) for w in args.workers.split(",")]
    coalesce_counts = [int(c) for c in args.coalesce.split(",")]

    model_dir = tempfile.mkdtemp(prefix="serving-bench-models-")
    model_name = {"mdx": _make_model_mdx, "vr": _make_model_vr,
                  "htdemucs": _make_model_demucs,
                  "mel_roformer": _make_model}[args.arch](model_dir)
    print(f"[serving] model built ({time.time() - t_start:.0f}s)", flush=True)

    wav_dir = tempfile.mkdtemp(prefix="serving-bench-wavs-")
    rng = np.random.default_rng(0)
    wavs = []
    for i in range(args.jobs):
        mix = (rng.standard_normal((2, int(args.seconds * SR))) * 0.1
               ).astype("float32")
        path = os.path.join(wav_dir, f"track{i}.wav")
        audio_io.save_audio(path, mix, SR)
        wavs.append(path)
    warm = os.path.join(wav_dir, "warm.wav")
    audio_io.save_audio(
        warm, (rng.standard_normal((2, int(args.seconds * SR))) * 0.1
               ).astype("float32"), SR)

    results = {}
    for w in worker_counts:
        for c in coalesce_counts:
            key = str(w) if c == 1 else f"{w}w_coalesce{c}"
            if args.jobs != 6:  # default job count owns the bare keys;
                key += f"_j{args.jobs}"  # other queue depths get their own
            os.environ["AUDSEP_SERVER_COALESCE"] = str(c)
            print(f"[serving] workers={w} coalesce={c}: "
                  f"{args.jobs} x {args.seconds:.0f}s jobs", flush=True)
            wall = _run_config(w, model_dir, model_name, wavs, warm)
            results[key] = {
                "jobs": args.jobs,
                "track_seconds": args.seconds,
                "coalesce": c,
                "workers": w,
                "wall_s": round(wall, 1),
                "jobs_per_hour": round(args.jobs * 3600.0 / wall, 1),
                "aggregate_rtf": round(args.jobs * args.seconds / wall, 2),
            }
            print(f"[serving] workers={w} coalesce={c}: {wall:.1f}s "
                  f"({results[key]['jobs_per_hour']} jobs/h)", flush=True)

    # One file, one row per arch: the default (mel_roformer) keeps the
    # legacy top-level shape; other arches land under their own key.
    # Results MERGE over a prior sweep's configs (sweeps are extended across
    # runs — a workers=3,4 run must not clobber the 1,2 rows), and best/
    # speedup are recomputed over the union.
    out = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            out = json.load(f)
    prior = out if args.arch == "mel_roformer" else out.get(args.arch, {})
    merged = dict(prior.get("results", {}))
    merged.update(results)
    rec = {
        "model": {"mdx": "mdx conv-tdf dim_f2048 nfft4096",
                  "vr": "vr cascaded-aspp sp-caps arch31191 1band_sr44100",
                  "htdemucs": "htdemucs 48ch nfft4096 depth4 shifts2 bag1",
                  "mel_roformer":
                      f"mel_roformer dim{DIM} depth{DEPTH} bands{NUM_BANDS}",
                  }[args.arch],
        "results": merged,
    }
    # best by jobs/hour — wall_s is not comparable across queue depths
    best_key = max(merged, key=lambda k: merged[k]["jobs_per_hour"])
    rec["best"] = {"config": best_key, **merged[best_key]}
    if "1" in merged:
        rec["best"]["speedup_vs_1worker"] = round(
            merged[best_key]["jobs_per_hour"]
            / merged["1"]["jobs_per_hour"], 3)

    if args.arch == "mel_roformer":
        out.update(rec)
    else:
        out[args.arch] = rec
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT_PATH}")


if __name__ == "__main__":
    main()
