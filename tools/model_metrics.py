#!/usr/bin/env python
"""Offline model-quality harness: run models over MUSDB18HQ and emit
models-scores.json entries (ref: tests/model-metrics/test-all-models.py).

Usage:
    MUSDB_PATH=/path/to/musdb18hq python tools/model_metrics.py \
        --models model_bs_roformer_ep_317_sdr_12.9755.ckpt [...] \
        --output models-scores.json [--limit-tracks 5]

MUSDB18HQ layout expected: <root>/test/<track>/{mixture,vocals,drums,bass,other}.wav
Scores use the framewise BSS Eval implementation in
audio_separator_tpu.utils.metrics (museval-compatible aggregation: median over
frames per track, median over tracks per model).
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from audio_separator_tpu.io import audio as audio_io  # noqa: E402
from audio_separator_tpu.utils.metrics import bss_eval  # noqa: E402

STEM_ALIASES = {
    "vocals": "vocals", "instrumental": "instrumental", "drums": "drums",
    "bass": "bass", "other": "other", "no vocals": "instrumental",
}


def track_references(track_dir: str):
    refs = {}
    for stem in ("vocals", "drums", "bass", "other"):
        path = os.path.join(track_dir, f"{stem}.wav")
        if os.path.exists(path):
            refs[stem], _ = audio_io.load_audio(path, sample_rate=44100)
    if "vocals" in refs and len(refs) >= 2:
        inst = None
        for stem in ("drums", "bass", "other"):
            if stem in refs:
                n = refs[stem].shape[-1]
                inst = refs[stem] if inst is None else inst[..., :n] + refs[stem][..., :n]
        refs["instrumental"] = inst
    return refs


def _sig6(value: float) -> float:
    """Reference files carry 6 significant digits (e.g. 5.24871, 14.8927)."""
    return float(f"{float(value):.6g}")


def friendly_model_name(separator, model_filename: str) -> str:
    """Map a checkpoint filename to its registry friendly name — the
    reference's entries key ``model_name`` that way (models-scores.json)."""
    try:
        for _arch, models in separator.list_supported_model_files().items():
            for name, info in models.items():
                if info.get("filename") == model_filename:
                    return name
    except Exception:
        pass
    return model_filename


def evaluate_model(model_filename: str, musdb_root: str, limit_tracks=None):
    from audio_separator_tpu.separator import Separator

    test_dir = os.path.join(musdb_root, "test")
    tracks = sorted(os.listdir(test_dir))
    if limit_tracks:
        tracks = tracks[:limit_tracks]

    separator = Separator(output_format="WAV")
    separator.load_model(model_filename)

    track_scores = []
    for track in tracks:
        track_dir = os.path.join(test_dir, track)
        mixture = os.path.join(track_dir, "mixture.wav")
        if not os.path.exists(mixture):
            continue
        refs = track_references(track_dir)
        with tempfile.TemporaryDirectory() as tmp:
            separator.output_dir = tmp
            if separator.model_instance:
                separator.model_instance.output_dir = tmp
            outputs = separator.separate(mixture)
            estimates, references, stem_names = [], [], []
            for path in outputs:
                full = path if os.path.isabs(path) else os.path.join(tmp, path)
                name = os.path.basename(full)
                import re

                match = re.search(r"_\(([^)]+)\)", name)
                stem = STEM_ALIASES.get((match.group(1) if match else "").lower())
                if stem and stem in refs:
                    est, _ = audio_io.load_audio(full, sample_rate=44100)
                    estimates.append(est)
                    references.append(refs[stem])
                    stem_names.append(stem)
            if not estimates:
                continue
            results = bss_eval(references, estimates)
            scores = {
                stem: {metric: _sig6(res[metric])
                       for metric in ("SDR", "SIR", "SAR", "ISR")}
                for stem, res in zip(stem_names, results)
            }
            track_scores.append({"track_name": track, "scores": scores})
            print(f"  {track}: " + ", ".join(
                f"{s} SDR={r['SDR']:.2f}" for s, r in scores.items()), flush=True)

    target = getattr(separator.model_instance, "primary_stem_name", None)
    return make_entry(friendly_model_name(separator, model_filename),
                      track_scores,
                      target.lower() if isinstance(target, str) else None)


def make_entry(model_name: str, track_scores: list, target_stem):
    """Assemble one models-scores.json entry in the reference's exact schema
    (ref: models-scores.json / tests/model-metrics/test-all-models.py:30-43):
    {model_name, track_scores: [{track_name, scores: {stem: {SDR,SIR,SAR,ISR}}}],
     median_scores, stems, target_stem}."""
    per_stem = {}
    for rec in track_scores:
        for stem, res in rec["scores"].items():
            per_stem.setdefault(stem, []).append(res)
    median_scores = {
        stem: {metric: _sig6(np.median([r[metric] for r in rows]))
               for metric in ("SDR", "SIR", "SAR", "ISR")}
        for stem, rows in per_stem.items()
    }
    return {
        "model_name": model_name,
        "track_scores": track_scores,
        "median_scores": median_scores,
        "stems": sorted(per_stem),
        "target_stem": target_stem,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--models", nargs="+", required=True)
    parser.add_argument("--musdb", default=os.environ.get("MUSDB_PATH"))
    parser.add_argument("--output", default="models-scores.json")
    parser.add_argument("--limit-tracks", type=int, default=None)
    args = parser.parse_args()
    if not args.musdb:
        sys.exit("Set MUSDB_PATH or pass --musdb")

    existing = {}
    if os.path.exists(args.output):
        with open(args.output, encoding="utf-8") as f:
            existing = json.load(f)
    for model in args.models:
        print(f"Evaluating {model}...", flush=True)
        existing[model] = evaluate_model(model, args.musdb, args.limit_tracks)
        with open(args.output, "w", encoding="utf-8") as f:
            json.dump(existing, f, indent=2)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
