#!/usr/bin/env python
"""Registry data ingestion tool.

Ingests upstream model-registry data (the reference package's ``models.json``
first-party list and ``models-scores.json`` benchmark data, or the same files
fetched from the UVR/audio-separator GitHub repos) and emits this framework's
restructured registry under ``audio_separator_tpu/data/``:

* ``registry.json`` — unified ``{arch: {friendly_name: {filename,
  download_files}}}`` index.
* ``scores.json`` — compact ``{filename: {median_scores, stems, target_stem}}``
  quality table (per-track museval rows are dropped; they are only consumed by
  the offline metrics harness which regenerates them).

Run: python tools/gen_registry.py <upstream_pkg_dir> (defaults to the mounted
reference copy when present).
"""

import json
import os
import sys

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "audio_separator_tpu", "data")


def restructure_models(models: dict) -> dict:
    registry = {"vr": {}, "mdx": {}, "mdxc": {}}
    for name, filename in models.get("vr_download_list", {}).items():
        registry["vr"][name] = {"filename": filename, "download_files": [filename]}
    for name, filename in models.get("mdx_download_list", {}).items():
        registry["mdx"][name] = {"filename": filename, "download_files": [filename]}
    for source_key in ("mdx23c_download_list", "roformer_download_list"):
        for name, files in models.get(source_key, {}).items():
            model_files = list(files.keys())
            config_files = list(files.values())
            registry["mdxc"][name] = {
                "filename": model_files[0],
                "download_files": model_files + config_files,
            }
    return registry


def compact_scores(scores: dict) -> dict:
    out = {}
    for filename, entry in scores.items():
        out[filename] = {
            "median_scores": entry.get("median_scores", {}),
            "stems": entry.get("stems", []),
            "target_stem": entry.get("target_stem"),
        }
    return out


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/audio_separator"
    os.makedirs(OUT_DIR, exist_ok=True)

    with open(os.path.join(src, "models.json"), encoding="utf-8") as f:
        registry = restructure_models(json.load(f))
    with open(os.path.join(OUT_DIR, "registry.json"), "w", encoding="utf-8") as f:
        json.dump(registry, f, indent=1, sort_keys=True)
    print(f"wrote registry.json ({sum(len(v) for v in registry.values())} models)")

    scores_path = os.path.join(src, "models-scores.json")
    if os.path.exists(scores_path):
        with open(scores_path, encoding="utf-8") as f:
            scores = compact_scores(json.load(f))
        with open(os.path.join(OUT_DIR, "scores.json"), "w", encoding="utf-8") as f:
            json.dump(scores, f, indent=0, sort_keys=True)
        print(f"wrote scores.json ({len(scores)} models)")

    # hash→params overrides shipped by the reference (model-data.json)
    md_path = os.path.join(src, "model-data.json")
    if os.path.exists(md_path):
        with open(md_path, encoding="utf-8") as f:
            data = json.load(f)
        with open(os.path.join(OUT_DIR, "model-data-overrides.json"), "w", encoding="utf-8") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        print("wrote model-data-overrides.json")

    # ensemble presets
    ep_path = os.path.join(src, "ensemble_presets.json")
    if os.path.exists(ep_path):
        with open(ep_path, encoding="utf-8") as f:
            presets = json.load(f)
        with open(os.path.join(OUT_DIR, "ensemble_presets.json"), "w", encoding="utf-8") as f:
            json.dump(presets, f, indent=1, sort_keys=True)
        print(f"wrote ensemble_presets.json ({len(presets.get('ensemble_presets', presets))} presets)")


if __name__ == "__main__":
    main()
