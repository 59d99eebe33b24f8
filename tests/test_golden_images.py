"""Golden-image regression: separated stems must stay visually identical.

The reference's integration tier renders every separated stem as
waveform/spectrogram images and SSIM-compares them against committed goldens
(ref: tests/README.md:36-60, tests/utils.py:13-110). The same mechanism here,
made hermetic: a fixed-seed synthetic Mel-RoFormer checkpoint separates a
deterministic test signal, and the rendered spectrograms are compared against
goldens committed under tests/goldens/. Any change to the DSP chain, demix
engine, model math, converter, or writers that shifts the output audibly
shows up as an SSIM drop.

Regenerate (after an *intended* output change — inspect the diff first):

    AUDSEP_REGEN_GOLDENS=1 python -m pytest tests/test_golden_images.py -q
"""

import logging
import os

import numpy as np
import pytest

from audio_separator_tpu.io import audio as audio_io
from test_ensemble_e2e import SR, _make_model
from utils_images import render_spectrogram, render_waveform, ssim, write_png

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REGEN = bool(os.environ.get("AUDSEP_REGEN_GOLDENS"))
# Log-spectrogram SSIM is extremely stable run-to-run (renders of the same
# file differ only through float nondeterminism); 0.98 leaves headroom for
# XLA version drift while still catching any real DSP change.
SSIM_THRESHOLD = 0.98


@pytest.fixture(scope="module")
def separated_stems(tmp_path_factory):
    from audio_separator_tpu.separator import Separator

    tmp_path = tmp_path_factory.mktemp("golden")
    model_dir = str(tmp_path / "models")
    os.makedirs(model_dir)
    model = _make_model(model_dir, "golden", seed=11)

    # Deterministic 2 s test signal: stacked harmonics + AM so the
    # spectrogram has visible structure in both axes.
    t = np.arange(SR * 2) / SR
    left = (np.sin(2 * np.pi * 440 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t))
            + 0.3 * np.sin(2 * np.pi * 1320 * t))
    right = (np.sin(2 * np.pi * 330 * t)
             + 0.3 * np.sin(2 * np.pi * 990 * t) * (0.5 + 0.5 * np.cos(2 * np.pi * 3 * t)))
    mix = np.stack([left, right]).astype(np.float32) * 0.3
    in_path = str(tmp_path / "golden_mix.wav")
    audio_io.save_audio(in_path, mix, SR)

    out_dir = str(tmp_path / "out")
    sep = Separator(log_level=logging.WARNING, model_file_dir=model_dir,
                    output_dir=out_dir, output_format="WAV")
    sep.load_model(model)
    outputs = sep.separate(in_path)
    paths = {}
    for out in outputs:
        full = out if os.path.isabs(out) else os.path.join(out_dir, os.path.basename(out))
        label = "vocals" if "vocals" in os.path.basename(full).lower() else "other"
        paths[label] = full
    assert set(paths) == {"vocals", "other"}
    return paths


@pytest.mark.parametrize("stem", ["vocals", "other"])
@pytest.mark.parametrize("kind", ["spectrogram", "waveform"])
def test_stem_matches_golden_image(separated_stems, stem, kind, tmp_path):
    render = render_spectrogram if kind == "spectrogram" else render_waveform
    img = render(separated_stems[stem])
    golden_path = os.path.join(GOLDEN_DIR, f"golden_{stem}_{kind}.png")

    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        write_png(golden_path, img)
        pytest.skip(f"regenerated {golden_path}")

    assert os.path.exists(golden_path), (
        f"golden missing: run AUDSEP_REGEN_GOLDENS=1 pytest {__file__}")
    golden = _read_png(golden_path)
    score = ssim(img, golden)
    if score <= SSIM_THRESHOLD:  # render the offender for human diffing
        write_png(str(tmp_path / f"actual_{stem}_{kind}.png"), img)
    assert score > SSIM_THRESHOLD, (
        f"{stem} {kind} drifted from golden (SSIM {score:.4f}); actual image "
        f"written to {tmp_path}. If the change is intended, regenerate with "
        f"AUDSEP_REGEN_GOLDENS=1.")


def _read_png(path: str) -> np.ndarray:
    """Minimal grayscale-8bit PNG reader (pairs with utils_images.write_png)."""
    import struct
    import zlib

    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, width = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            width, height, bit_depth, color = struct.unpack(">IIBB", payload[:10])
            assert (bit_depth, color) == (8, 0), "expected 8-bit grayscale"
        elif tag == b"IDAT":
            idat += payload
        pos += length + 12
    raw = zlib.decompress(idat)
    stride = width + 1
    rows = []
    prev = np.zeros(width, np.uint8)
    for y in range(height):
        filt = raw[y * stride]
        row = np.frombuffer(raw[y * stride + 1:(y + 1) * stride], np.uint8).copy()
        if filt == 0:
            pass
        elif filt == 2:  # Up
            row = (row.astype(np.int32) + prev).astype(np.uint8)
        else:
            raise AssertionError(f"unsupported PNG filter {filt}")
        rows.append(row)
        prev = row
    return np.stack(rows)


# ---------------------------------------------------------------------------
# Second family: VR (completely different DSP chain — multiband split, conv
# U-Net mask, aggression curve) pinned by the same golden mechanism.


@pytest.fixture(scope="module")
def vr_stems(tmp_path_factory):
    import logging

    import torch

    import jax

    from audio_separator_tpu.architectures.vr import VRSeparator
    from audio_separator_tpu.models.vr_nets import state_dict_to_tree
    from test_vr import SP_CAPS, _randomize
    from torch_oracles.vr_oracle import CascadedASPPNetOracle

    tmp_path = tmp_path_factory.mktemp("golden_vr")
    oracle = _randomize(CascadedASPPNetOracle(2048, SP_CAPS, 31191), seed=5).eval()
    ckpt = str(tmp_path / "golden_vr.pth")
    torch.save(oracle.state_dict(), ckpt)

    t = np.arange(SR * 2) / SR
    left = np.sin(2 * np.pi * 523 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 1.5 * t))
    right = np.sin(2 * np.pi * 392 * t) + 0.25 * np.sin(2 * np.pi * 1568 * t)
    mix = np.stack([left, right]).astype(np.float32) * 0.3
    in_path = str(tmp_path / "golden_vr_mix.wav")
    audio_io.save_audio(in_path, mix, SR)

    out_dir = str(tmp_path / "out")
    sep = VRSeparator(
        common_config={
            "logger": logging.getLogger("golden_vr"),
            "model_name": "golden_vr", "model_path": ckpt,
            "model_data": {"vr_model_param": "1band_sr44100_hl512",
                           "primary_stem": "Instrumental"},
            "output_dir": out_dir, "output_format": "WAV",
            "normalization_threshold": 0.9, "amplification_threshold": 0.0,
            "sample_rate": 44100,
        },
        arch_config={"batch_size": 2, "window_size": 512, "aggression": 5,
                     "enable_tta": False, "enable_post_process": False,
                     "post_process_threshold": 0.2, "high_end_process": False})
    sep._params = jax.device_put(state_dict_to_tree(
        {k: v.numpy() for k, v in oracle.state_dict().items()}))
    sep._arch_size = 31191
    sep._offset = 128
    outputs = sep.separate(in_path)
    paths = {}
    for out in outputs:
        full = out if os.path.isabs(out) else os.path.join(out_dir, out)
        label = "instrumental" if "instrumental" in os.path.basename(full).lower() else "vocals"
        paths[label] = full
    assert set(paths) == {"instrumental", "vocals"}
    return paths


@pytest.mark.parametrize("stem", ["instrumental", "vocals"])
def test_vr_stem_matches_golden_image(vr_stems, stem, tmp_path):
    img = render_spectrogram(vr_stems[stem])
    golden_path = os.path.join(GOLDEN_DIR, f"golden_vr_{stem}_spectrogram.png")
    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        write_png(golden_path, img)
        pytest.skip(f"regenerated {golden_path}")
    assert os.path.exists(golden_path), (
        f"golden missing: run AUDSEP_REGEN_GOLDENS=1 pytest {__file__}")
    score = ssim(img, _read_png(golden_path))
    if score <= SSIM_THRESHOLD:
        write_png(str(tmp_path / f"actual_vr_{stem}.png"), img)
    assert score > SSIM_THRESHOLD, (
        f"VR {stem} drifted from golden (SSIM {score:.4f}); actual written to "
        f"{tmp_path}. If intended, regenerate with AUDSEP_REGEN_GOLDENS=1.")


# ---------------------------------------------------------------------------
# Third family: Demucs (time-domain + spectrogram hybrid, bag loader,
# triangular overlap-add) — four stems pinned from one synthetic bag.


@pytest.fixture(scope="module")
def demucs_stems(tmp_path_factory):
    import logging
    import sys

    import torch
    import yaml as yaml_mod

    from audio_separator_tpu.architectures.demucs import DemucsSeparator
    from audio_separator_tpu.models.demucs_load import _ensure_stub_modules
    from torch_oracles.htdemucs_oracle import HTDemucsOracle

    tmp_path = tmp_path_factory.mktemp("golden_demucs")
    torch.manual_seed(23)
    sources = ("drums", "bass", "other", "vocals")
    oracle = HTDemucsOracle(sources, channels=8, nfft=1024, depth=3,
                            t_layers=3, t_heads=4, segment=0.5).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn_like(p) * 0.1)

    repo = tmp_path / "repo"
    repo.mkdir()
    _ensure_stub_modules()
    package = {
        "klass": sys.modules["demucs.htdemucs"].HTDemucs,
        "args": (),
        "kwargs": {"sources": list(sources), "channels": 8, "nfft": 1024,
                   "depth": 3, "t_layers": 3, "t_heads": 4, "segment": 0.5},
        "state": oracle.state_dict(),
    }
    torch.save(package, repo / "deadbeef.th")
    with open(repo / "golden_demucs.yaml", "w") as f:
        yaml_mod.safe_dump({"models": ["deadbeef"], "weights": [[1.0] * 4]}, f)

    t = np.arange(SR * 2) / SR
    left = (np.sin(2 * np.pi * 660 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 4 * t))
            + 0.2 * np.sin(2 * np.pi * 110 * t))
    right = np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 880 * t)
    mix = np.stack([left, right]).astype(np.float32) * 0.3
    in_path = str(tmp_path / "golden_demucs_mix.wav")
    audio_io.save_audio(in_path, mix, SR)

    out_dir = str(tmp_path / "out")
    sep = DemucsSeparator(
        common_config={
            "logger": logging.getLogger("golden_demucs"),
            "model_name": "golden_demucs",
            "model_path": str(repo / "golden_demucs.yaml"),
            "model_data": {"primary_stem": "Vocals"},
            "output_dir": out_dir, "output_format": "WAV",
            "normalization_threshold": 0.9, "amplification_threshold": 0.0,
            "sample_rate": 44100,
        },
        arch_config={"segment_size": "Default", "shifts": 0, "overlap": 0.25,
                     "segments_enabled": True, "batch_size": 2})
    outputs = sep.separate(in_path)
    paths = {}
    for out in outputs:
        full = out if os.path.isabs(out) else os.path.join(out_dir, out)
        for label in ("drums", "bass", "other", "vocals"):
            if f"({label}" in os.path.basename(full).lower():
                paths[label] = full
    assert set(paths) == {"drums", "bass", "other", "vocals"}, paths
    return paths


@pytest.mark.parametrize("stem", ["drums", "bass", "other", "vocals"])
def test_demucs_stem_matches_golden_image(demucs_stems, stem, tmp_path):
    img = render_spectrogram(demucs_stems[stem])
    golden_path = os.path.join(GOLDEN_DIR, f"golden_demucs_{stem}_spectrogram.png")
    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        write_png(golden_path, img)
        pytest.skip(f"regenerated {golden_path}")
    assert os.path.exists(golden_path), (
        f"golden missing: run AUDSEP_REGEN_GOLDENS=1 pytest {__file__}")
    score = ssim(img, _read_png(golden_path))
    if score <= SSIM_THRESHOLD:
        write_png(str(tmp_path / f"actual_demucs_{stem}.png"), img)
    assert score > SSIM_THRESHOLD, (
        f"Demucs {stem} drifted from golden (SSIM {score:.4f}); actual "
        f"written to {tmp_path}. If intended, regenerate with "
        f"AUDSEP_REGEN_GOLDENS=1.")
