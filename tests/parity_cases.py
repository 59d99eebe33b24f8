"""Production-geometry parity cases: our pipeline vs the reference's OWN code.

Each case builds a randomized reference torch model at a given geometry,
runs the reference's real separator loop code (loaded via ref_pipeline.py)
as the oracle, runs OUR production path on the same audio, and reports
per-stem deltas. The same builders serve two tiers:

* tests/test_parity_pipeline.py — small geometry, every suite run. These
  replace the previous hand-emulated reference loops with the reference's
  actual loop code as ground truth.
* tools/parity_report.py — FULL production geometry (flagship 62-band
  depth-12 dim-512 BS-RoFormer, Kim-class Mel-RoFormer, Inst-HQ3-class MDX
  ONNX, 4band_v2 VR, real-shape htdemucs) on a >=30 s track, writing the
  committed PARITY.json.

Delta semantics: ``sdr`` is ref-vs-ours (utils.metrics.simple_sdr over the
stem pair). A parity SDR of X dB bounds the museval-SDR drift of any
downstream quality number by ~20·log10-scale; >=40 dB makes the BASELINE
"within 0.1 dB of reference outputs" target comfortably satisfied for
identical weights.

Reference anchors: mdxc_separator.py:257-343,405-468 (RoFormer demix +
stem glue), mdx_separator.py:205-228,293-450 (geometry + Hann OLA +
run_model), vr_separator.py:255-375 (multiband load, tiled inference,
post-process), demucs_separator.py:160-200 + demucs/apply.py:124-294.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import tempfile
from typing import Dict, Optional, Tuple

import numpy as np
import torch

from audio_separator_tpu.io import audio as audio_io
from audio_separator_tpu.utils.metrics import simple_sdr

LOGGER = logging.getLogger("parity")
SR = 44100


@dataclasses.dataclass
class StemDelta:
    max_abs: float
    max_rel: float
    parity_sdr_db: float

    def as_dict(self):
        return {"max_abs": float(self.max_abs), "max_rel": float(self.max_rel),
                "parity_sdr_db": float(self.parity_sdr_db)}


def compare_stems(ref_stems: Dict[str, np.ndarray],
                  got_stems: Dict[str, np.ndarray]) -> Dict[str, StemDelta]:
    """Match stems by (case-insensitive) name containment; compare waveforms."""
    out = {}
    for name, ref in ref_stems.items():
        got = None
        for gname, g in got_stems.items():
            if name.lower() in gname.lower() or gname.lower() in name.lower():
                got = g
                break
        assert got is not None, f"stem {name!r} missing from {list(got_stems)}"
        n = min(ref.shape[-1], got.shape[-1])
        assert abs(ref.shape[-1] - got.shape[-1]) <= 2, (ref.shape, got.shape)
        r, g = ref[..., :n], got[..., :n]
        scale = max(float(np.abs(r).max()), 1e-6)
        out[name] = StemDelta(
            max_abs=float(np.abs(g - r).max()),
            max_rel=float(np.abs(g - r).max() / scale),
            parity_sdr_db=simple_sdr(g, r),
        )
    return out


def _make_mix(seconds: float, seed: int = 5) -> np.ndarray:
    """Deterministic music-ish stereo mix: tones + noise + envelope (pure
    noise under-exercises masks; pure tones under-exercise band splits)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    voices = sum(np.sin(2 * np.pi * f * t + p) * a for f, p, a in
                 [(220, 0.0, 0.3), (330, 1.0, 0.2), (523, 2.0, 0.15),
                  (1847, 0.5, 0.08), (61, 0.1, 0.25)])
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 0.25 * t) ** 2
    left = voices * env + 0.05 * rng.standard_normal(t.shape)
    right = voices * (1 - 0.3 * env) + 0.05 * rng.standard_normal(t.shape)
    return np.stack([left, right]).astype(np.float32) * 0.5


def _write_wav(mix: np.ndarray, directory: str) -> str:
    path = os.path.join(directory, "parity_input.wav")
    # float32 WAV: the input (and therefore the preserved output bit depth)
    # stays lossless so file round-trips don't cap the measurable parity SDR.
    audio_io.save_audio(path, mix, SR, "WAV", bit_depth=32)
    return path


def _read_outputs(out_dir: str, outputs) -> Dict[str, np.ndarray]:
    stems = {}
    for rel in outputs:
        path = rel if os.path.isabs(rel) else os.path.join(out_dir, rel)
        pcm, _sr = audio_io.load_audio(path, sample_rate=None)
        # output naming: {base}_({Stem})_{model}.{ext}
        stem = rel.split("_(")[1].split(")")[0]
        stems[stem] = pcm
    return stems


# ---------------------------------------------------------------------------
# MDXC / RoFormer (BS + Mel) — ref mdxc_separator.py oracle


def build_ref_roformer(kind: str, cfg_kwargs: dict, seed: int = 0,
                       weight_scale: float = 0.1):
    """Instantiate + randomize the reference's own BS/Mel RoFormer."""
    from ref_shims import load_ref_module

    common = dict(cfg_kwargs)
    common.setdefault("attn_dropout", 0.0)
    common.setdefault("ff_dropout", 0.0)
    common.setdefault("flash_attn", False)
    if kind == "bs":
        mod = load_ref_module("roformer.bs_roformer")
        ref = mod.BSRoformer(**common)
    else:
        mod = load_ref_module("roformer.mel_band_roformer")
        ref = mod.MelBandRoformer(**common)
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn_like(p) * weight_scale)
    return ref.eval()


def run_ref_mdxc(ref_model, model_data: dict, mix: np.ndarray,
                 overlap: int = 8, segment_size: int = 256,
                 primary_stem: str = "Vocals") -> Dict[str, np.ndarray]:
    """The reference's OWN MDXCSeparator demix + separate() stem glue
    (ref: mdxc_separator.py:118-227 normalize/transpose glue, :257-343 the
    RoFormer hot loop, :405-468 dict/residual handling)."""
    import ml_collections

    from ref_pipeline import load_ref_pipeline_module

    mdxc_mod = load_ref_pipeline_module("separator.architectures.mdxc_separator")
    su = load_ref_pipeline_module("separator.uvr_lib_v5.spec_utils")

    sep = mdxc_mod.MDXCSeparator.__new__(mdxc_mod.MDXCSeparator)
    sep.logger = LOGGER
    sep.pitch_shift = 0
    sep.is_roformer = True
    sep.override_model_segment_size = False
    sep.segment_size = segment_size
    sep.model_data_cfgdict = ml_collections.ConfigDict(model_data)
    sep.overlap = overlap
    sep.model_run = ref_model
    sep.sample_rate = SR
    sep.batch_size = 1
    sep.torch_device = torch.device("cpu")
    training = model_data["training"]
    sep.is_primary_stem_main_target = bool(training.get("target_instrument"))
    sep.primary_stem_name = primary_stem
    sep.secondary_stem_name = ("Instrumental" if primary_stem == "Vocals"
                               else "Vocals")

    norm = su.normalize(wave=mix, max_peak=0.9, min_peak=0.0)
    source = sep.demix(mix=norm)
    stems: Dict[str, np.ndarray] = {}
    if isinstance(source, dict):
        for key, value in source.items():
            # separate() normalizes then transposes for its writer
            # (mdxc_separator.py:188-200); keep (2, T) for comparison.
            stems[key] = su.normalize(wave=value, max_peak=0.9, min_peak=0.0)
    else:
        stems[primary_stem] = np.asarray(source)
    return stems


def run_our_mdxc(ckpt_path: str, model_data: dict, mix: np.ndarray,
                 out_dir: str, overlap: int = 8, segment_size: int = 256,
                 through_files: bool = True) -> Dict[str, np.ndarray]:
    """OUR production path: full Separator-architecture separate() over a
    written WAV, stems read back from the written float32 files."""
    from audio_separator_tpu.architectures.mdxc import MDXCSeparator

    os.makedirs(out_dir, exist_ok=True)
    common = {
        "logger": LOGGER,
        "model_name": os.path.splitext(os.path.basename(ckpt_path))[0],
        "model_path": ckpt_path,
        "model_data": model_data,
        "output_dir": out_dir,
        "output_format": "WAV",
        "normalization_threshold": 0.9,
        "amplification_threshold": 0.0,
        "sample_rate": SR,
    }
    arch = {"segment_size": segment_size, "override_model_segment_size": False,
            "batch_size": 2, "overlap": overlap, "pitch_shift": 0}
    sep = MDXCSeparator(common_config=common, arch_config=arch)
    if not through_files:
        import importlib

        su_like = importlib.import_module("audio_separator_tpu.ops.spec")
        norm = su_like.normalize(mix, 0.9, 0.0)
        return {k: np.asarray(v) for k, v in sep.demix(norm).items()}
    input_path = _write_wav(mix, out_dir)
    outputs = sep.separate(input_path)
    return _read_outputs(out_dir, outputs)


def roformer_case(kind: str, geometry: dict, seconds: float, tmp_dir: str,
                  seed: int = 0) -> Tuple[Dict[str, StemDelta], dict]:
    """Full case: geometry dict holds the RoFormer kwargs shared by the ref
    constructor and our model_data."""
    ref = build_ref_roformer(kind, geometry, seed=seed)
    ckpt_path = os.path.join(tmp_dir, f"parity_{kind}_roformer.ckpt")
    torch.save({"state_dict": ref.state_dict()}, ckpt_path)

    hop = geometry["stft_hop_length"]
    dim_t = 801 if geometry["dim"] >= 256 else 64
    model_entry = dict(geometry)
    model_entry["sample_rate"] = SR
    if kind == "bs":
        model_entry["freqs_per_bands"] = list(geometry["freqs_per_bands"])
    model_data = {
        "is_roformer": True,
        "audio": {"sample_rate": SR, "hop_length": hop,
                  "chunk_size": hop * (dim_t - 1)},
        "model": model_entry,
        "training": {"instruments": ["vocals", "other"],
                     "target_instrument": None},
        "inference": {"dim_t": dim_t, "batch_size": 2},
    }
    mix = _make_mix(seconds, seed=seed + 1)

    ref_stems = run_ref_mdxc(ref, model_data, mix, segment_size=dim_t)
    got_stems = run_our_mdxc(ckpt_path, model_data, mix,
                             os.path.join(tmp_dir, "out"),
                             segment_size=dim_t)
    deltas = compare_stems(ref_stems, got_stems)
    meta = {"kind": kind, "seconds": seconds, "dim_t": dim_t,
            "params_m": round(sum(p.numel() for p in ref.parameters()) / 1e6, 1),
            **{k: v for k, v in geometry.items() if k != "freqs_per_bands"}}
    return deltas, meta


def _randomize_with_buffers(model, seed=0, scale=0.1):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * scale)
        for name, b in model.named_buffers():
            if name.endswith("running_var"):
                b.copy_(torch.rand_like(b) + 0.5)
            elif name.endswith("running_mean"):
                b.copy_(torch.randn_like(b) * 0.1)
    return model


def vr_case(param_name: str, arch_size: int, seconds: float, tmp_dir: str,
            seed: int = 0, window_size: int = 512, aggression: int = 5,
            enable_tta: bool = False, enable_post_process: bool = False,
            high_end_process: bool = False
            ) -> Tuple[Dict[str, StemDelta], dict]:
    """VR parity at a real band-parameter set (e.g. '4band_v2': every band
    res_type=polyphase, exactly reproducible offline)."""
    from ref_pipeline import load_ref_pipeline_module
    from audio_separator_tpu.models.vr_nets import state_dict_to_tree

    nets_mod = load_ref_pipeline_module("separator.uvr_lib_v5.vr_network.nets")
    mpi_mod = load_ref_pipeline_module(
        "separator.uvr_lib_v5.vr_network.model_param_init")
    param_path = (f"/root/reference/audio_separator/separator/uvr_lib_v5/"
                  f"vr_network/modelparams/{param_name}.json")
    model_params = mpi_mod.ModelParameters(param_path)
    n_bins = model_params.param["bins"]

    ref_net = _randomize_with_buffers(
        nets_mod.determine_model_capacity(n_bins * 2, arch_size),
        seed=seed).eval()
    sd = {k: v.numpy() for k, v in ref_net.state_dict().items()}
    ckpt_path = os.path.join(tmp_dir, "parity_vr.pth")
    torch.save(ref_net.state_dict(), ckpt_path)

    mix = _make_mix(seconds, seed=seed + 4)
    wav_path = _write_wav(mix, tmp_dir)

    ref_stems = run_ref_vr(
        ref_net, model_params, wav_path, window_size=window_size,
        aggression=aggression, enable_tta=enable_tta,
        enable_post_process=enable_post_process,
        high_end_process=high_end_process)
    got_files = run_our_vr(
        ckpt_path, {"vr_model_param": param_name,
                    "primary_stem": "Instrumental"},
        wav_path, os.path.join(tmp_dir, "out_vr"), window_size=window_size,
        aggression=aggression, arch_size=arch_size,
        params_tree=state_dict_to_tree(sd), enable_tta=enable_tta,
        enable_post_process=enable_post_process,
        high_end_process=high_end_process)
    got_stems = {}
    for name, pcm in got_files.items():
        key = "primary" if name.lower() == "instrumental" else "secondary"
        got_stems[key] = pcm
    deltas = compare_stems(
        {k: ref_stems[k] for k in ("primary", "secondary")}, got_stems)
    meta = {"kind": "vr", "param": param_name, "arch_size": arch_size,
            "seconds": seconds, "bins": int(n_bins),
            "window_size": window_size, "aggression": aggression,
            "tta": enable_tta, "post_process": enable_post_process,
            "high_end": high_end_process,
            "params_m": round(sum(p.numel()
                                  for p in ref_net.parameters()) / 1e6, 2)}
    return deltas, meta


# ---------------------------------------------------------------------------
# Demucs v4 — ref demucs/apply.py oracle


def run_ref_demucs(ref_model, mix: np.ndarray, overlap: float = 0.25,
                   shifts: int = 0) -> np.ndarray:
    """The reference's demix_demucs glue around its own apply_model
    (ref: demucs_separator.py:160-200; apply.py:124-294): standardize by the
    mono mean/std, bag/split apply, un-standardize, swap sources 0,1."""
    from ref_pipeline import load_ref_pipeline_module

    apply_mod = load_ref_pipeline_module("separator.uvr_lib_v5.demucs.apply")
    mix_t = torch.tensor(mix, dtype=torch.float32)
    ref_mono = mix_t.mean(0)
    norm = (mix_t - ref_mono.mean()) / ref_mono.std()
    with torch.no_grad():
        sources = apply_mod.apply_model(
            model=ref_model, mix=norm[None], shifts=shifts, split=True,
            overlap=overlap, static_shifts=1 if shifts == 0 else shifts,
            set_progress_bar=None, device=torch.device("cpu"), progress=False,
        )[0]
    sources = (sources * ref_mono.std() + ref_mono.mean()).cpu().numpy()
    sources[[0, 1]] = sources[[1, 0]]
    return sources


def run_our_demucs(cfg, params, mix: np.ndarray, overlap: float = 0.25,
                   shifts: int = 0, batch_size: int = 4) -> np.ndarray:
    import jax.numpy as jnp

    from audio_separator_tpu.architectures.demucs import DemucsSeparator

    sep = DemucsSeparator.__new__(DemucsSeparator)
    sep.logger = LOGGER
    sep.segments_enabled = True
    sep.overlap = overlap
    sep.batch_size = batch_size
    sep.shifts = shifts
    sep.compute_dtype = jnp.float32
    sep._models_cache = ([(cfg, params)], [[1.0] * len(cfg.sources)])
    return sep.demix_demucs(mix)


# ---------------------------------------------------------------------------
# MDX (ONNX Conv-TDF) — ref mdx_separator.py oracle


def run_ref_mdx(torch_model, mix: np.ndarray, *, n_fft: int, hop_length: int,
                dim_f: int, segment_size: int, overlap: float = 0.25,
                compensate: float = 1.0, batch_size: int = 1,
                enable_denoise: bool = False) -> Dict[str, np.ndarray]:
    """The reference's OWN MDXSeparator demix loop + separate() glue
    (ref: mdx_separator.py:135-204 normalize/peak/inversion glue,
    :205-228 geometry, :293-412 Hann OLA hot loop, :414-450 run_model)
    driven by the torch Conv-TDF net."""
    from ref_pipeline import load_ref_pipeline_module

    mdx_mod = load_ref_pipeline_module("separator.architectures.mdx_separator")
    su = load_ref_pipeline_module("separator.uvr_lib_v5.spec_utils")

    sep = mdx_mod.MDXSeparator.__new__(mdx_mod.MDXSeparator)
    sep.logger = LOGGER
    sep.n_fft = n_fft
    sep.hop_length = hop_length
    sep.dim_f = dim_f
    sep.segment_size = segment_size
    sep.overlap = overlap
    sep.batch_size = batch_size
    sep.enable_denoise = enable_denoise
    sep.torch_device = torch.device("cpu")

    def model_run(spek):
        with torch.no_grad():
            return torch_model(spek)

    sep.model_run = model_run

    peak = np.abs(mix).max()
    norm = su.normalize(wave=mix, max_peak=0.9, min_peak=0.0)
    source = sep.demix(norm) * peak
    primary = source.T  # (T, 2)
    raw_mix = sep.demix(norm, is_match_mix=True)
    secondary = (-primary * compensate) + norm.T
    return {"primary": primary.T, "secondary": secondary.T,
            "raw_mix": np.asarray(raw_mix)}


def run_our_mdx(onnx_path: str, model_data: dict, mix: np.ndarray,
                out_dir: str, segment_size: int, overlap: float = 0.25,
                batch_size: int = 2, enable_denoise: bool = False
                ) -> Dict[str, np.ndarray]:
    from audio_separator_tpu.architectures.mdx import MDXSeparator

    os.makedirs(out_dir, exist_ok=True)
    common = {
        "logger": LOGGER,
        "model_name": os.path.splitext(os.path.basename(onnx_path))[0],
        "model_path": onnx_path,
        "model_data": model_data,
        "output_dir": out_dir,
        "output_format": "WAV",
        "normalization_threshold": 0.9,
        "amplification_threshold": 0.0,
        "sample_rate": SR,
    }
    arch = {"segment_size": segment_size, "overlap": overlap,
            "batch_size": batch_size, "hop_length": 1024,
            "enable_denoise": enable_denoise}
    arch["hop_length"] = model_data.get("hop_length", 1024)
    sep = MDXSeparator(common_config=common, arch_config=arch)
    input_path = _write_wav(mix, out_dir)
    outputs = sep.separate(input_path)
    return _read_outputs(out_dir, outputs)


class ScalableConvTDF(torch.nn.Module):
    """Conv-TDF U-Net scalable to Inst-HQ3-class compute: the UVR MDX-NET op
    inventory (Conv/ConvTranspose stride-2 scales, BatchNorm, ReLU, TDF
    linears, skip adds) at parameterizable width/depth so the same class
    builds both the fast-tier toy and the production-geometry model."""

    def __init__(self, dim_f: int, channels: int = 16, scales: int = 2,
                 tdf_bn: int = 8):
        super().__init__()
        import torch.nn as nn

        def block(c, f):
            return nn.ModuleDict({
                "conv": nn.Sequential(nn.Conv2d(c, c, 3, padding=1),
                                      nn.BatchNorm2d(c), nn.ReLU()),
                "tdf": nn.Sequential(nn.Linear(f, max(f // tdf_bn, 4)),
                                     nn.ReLU(),
                                     nn.Linear(max(f // tdf_bn, 4), f)),
            })

        self.first = nn.Sequential(nn.Conv2d(4, channels, 1),
                                   nn.BatchNorm2d(channels), nn.ReLU())
        self.enc, self.down, self.up, self.dec = (nn.ModuleList(),
                                                  nn.ModuleList(),
                                                  nn.ModuleList(),
                                                  nn.ModuleList())
        c, f = channels, dim_f
        for _ in range(scales):
            self.enc.append(block(c, f))
            self.down.append(nn.Sequential(
                nn.Conv2d(c, c * 2, 2, stride=2), nn.BatchNorm2d(c * 2),
                nn.ReLU()))
            c, f = c * 2, f // 2
        self.mid = block(c, f)
        for _ in range(scales):
            self.up.append(nn.Sequential(
                nn.ConvTranspose2d(c, c // 2, 2, stride=2),
                nn.BatchNorm2d(c // 2), nn.ReLU()))
            c, f = c // 2, f * 2
            self.dec.append(block(c, f))
        self.final = nn.Conv2d(channels, 4, 1)

    @staticmethod
    def _apply_block(b, x):
        x = b["conv"](x)
        return x + b["tdf"](x.transpose(-1, -2)).transpose(-1, -2)

    def forward(self, x):
        x = self.first(x)
        skips = []
        for enc, down in zip(self.enc, self.down):
            x = self._apply_block(enc, x)
            skips.append(x)
            x = down(x)
        x = self._apply_block(self.mid, x)
        for up, dec, skip in zip(self.up, self.dec, reversed(skips)):
            x = up(x) + skip
            x = self._apply_block(dec, x)
        return self.final(x)


def mdx_case(geometry: dict, seconds: float, tmp_dir: str, seed: int = 0,
             enable_denoise: bool = False
             ) -> Tuple[Dict[str, StemDelta], dict]:
    """geometry: n_fft, dim_f, dim_t_log2, segment_size, hop_length,
    channels, scales, compensate."""
    torch.manual_seed(seed)
    dim_f = geometry["dim_f"]
    segment = geometry["segment_size"]
    model = ScalableConvTDF(dim_f, channels=geometry.get("channels", 16),
                            scales=geometry.get("scales", 2)).eval()
    onnx_path = os.path.join(tmp_dir, "UVR_parity_mdx.onnx")
    try:  # the onnx package is absent: skip the exporter's onnxscript pass
        from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

        onnx_proto_utils._add_onnxscript_fn = \
            lambda model_bytes, custom_opsets: model_bytes
    except ImportError:
        pass
    torch.onnx.export(model, torch.randn(1, 4, dim_f, segment), onnx_path,
                      input_names=["input"], output_names=["output"],
                      dynamo=False)
    model_data = {
        "compensate": geometry.get("compensate", 1.035),
        "mdx_dim_f_set": dim_f,
        "mdx_dim_t_set": geometry["dim_t_log2"],
        "mdx_n_fft_scale_set": geometry["n_fft"],
        "primary_stem": "Instrumental",
        "hop_length": geometry.get("hop_length", 1024),
    }
    mix = _make_mix(seconds, seed=seed + 3)

    ref_stems = run_ref_mdx(
        model, mix, n_fft=geometry["n_fft"],
        hop_length=model_data["hop_length"], dim_f=dim_f,
        segment_size=segment, overlap=geometry.get("overlap", 0.25),
        compensate=model_data["compensate"], enable_denoise=enable_denoise)
    got_files = run_our_mdx(onnx_path, model_data, mix,
                            os.path.join(tmp_dir, "out_mdx"),
                            segment_size=segment,
                            overlap=geometry.get("overlap", 0.25),
                            enable_denoise=enable_denoise)
    got_stems = {"primary": None, "secondary": None}
    for name, pcm in got_files.items():
        key = "primary" if name.lower() == "instrumental" else "secondary"
        got_stems[key] = pcm
    deltas = compare_stems(
        {k: ref_stems[k] for k in ("primary", "secondary")}, got_stems)
    meta = {"kind": "mdx", "seconds": seconds, "denoise": enable_denoise,
            "params_m": round(sum(p.numel() for p in model.parameters()) / 1e6, 2),
            **geometry}
    return deltas, meta


# ---------------------------------------------------------------------------
# VR (Cascaded ASPP nets, multiband) — ref vr_separator.py oracle


def run_ref_vr(torch_net, model_params, wav_path: str, *, window_size: int,
               aggression: int, primary_stem: str = "Instrumental",
               enable_tta: bool = False, enable_post_process: bool = False,
               post_process_threshold: float = 0.2,
               high_end_process: bool = False,
               batch_size: int = 2, is_v51_model: bool = False
               ) -> Dict[str, np.ndarray]:
    """The reference's OWN VRSeparator pipeline: loading_mix (multiband
    resample+STFT chain), inference_vr (tiled mask, aggression, TTA,
    post-process), spec_to_wav (multiband recombine, optional high-end
    mirroring) — ref: vr_separator.py:175-375."""
    from ref_pipeline import load_ref_pipeline_module

    vr_mod = load_ref_pipeline_module("separator.architectures.vr_separator")

    sep = vr_mod.VRSeparator.__new__(vr_mod.VRSeparator)
    sep.logger = LOGGER
    sep.model_params = model_params
    sep.is_vr_51_model = is_v51_model
    sep.high_end_process = high_end_process
    sep.input_high_end = None
    sep.input_high_end_h = None
    sep.window_size = window_size
    sep.batch_size = batch_size
    sep.enable_tta = enable_tta
    sep.enable_post_process = enable_post_process
    sep.post_process_threshold = post_process_threshold
    sep.primary_stem_name = primary_stem
    sep.torch_device = torch.device("cpu")
    sep.torch_device_mps = None
    sep.wav_subtype = "FLOAT"
    sep.audio_file_path = wav_path
    sep.model_run = torch_net
    sep.model_samplerate = model_params.param["sr"]
    # aggressiveness dict (ref: vr_separator.py:144-150)
    sep.aggressiveness = {
        "value": aggression / 100,
        "split_bin": model_params.param["band"][1]["crop_stop"],
        "aggr_correction": model_params.param.get("aggr_correction"),
    }

    y_spec, v_spec = sep.inference_vr(sep.loading_mix(), sep.torch_device,
                                      sep.aggressiveness)
    y_spec = np.nan_to_num(y_spec, nan=0.0, posinf=0.0, neginf=0.0)
    v_spec = np.nan_to_num(v_spec, nan=0.0, posinf=0.0, neginf=0.0)
    primary = sep.spec_to_wav(y_spec).T  # (T, 2) like separate()
    secondary = sep.spec_to_wav(v_spec).T
    return {"primary": primary.T, "secondary": secondary.T}


def run_our_vr(ckpt_path: str, model_data: dict, wav_path: str, out_dir: str,
               *, window_size: int, aggression: int, arch_size: int,
               params_tree=None, offset: int = 128, batch_size: int = 2,
               enable_tta: bool = False, enable_post_process: bool = False,
               post_process_threshold: float = 0.2,
               high_end_process: bool = False) -> Dict[str, np.ndarray]:
    import jax

    from audio_separator_tpu.architectures.vr import VRSeparator

    os.makedirs(out_dir, exist_ok=True)
    common = {
        "logger": LOGGER,
        "model_name": os.path.splitext(os.path.basename(ckpt_path))[0],
        "model_path": ckpt_path,
        "model_data": model_data,
        "output_dir": out_dir,
        "output_format": "WAV",
        "normalization_threshold": 0.9,
        "amplification_threshold": 0.0,
        "sample_rate": SR,
    }
    arch_cfg = {"batch_size": batch_size, "window_size": window_size,
                "aggression": aggression, "enable_tta": enable_tta,
                "enable_post_process": enable_post_process,
                "post_process_threshold": post_process_threshold,
                "high_end_process": high_end_process}
    sep = VRSeparator(common_config=common, arch_config=arch_cfg)
    if params_tree is not None:
        sep._params = jax.device_put(params_tree)
        sep._arch_size = arch_size
        sep._offset = offset
    outputs = sep.separate(wav_path)
    return _read_outputs(out_dir, outputs)


# ---------------------------------------------------------------------------
# Demucs v4 — ref demucs/apply.py oracle


def htdemucs_case(geometry: dict, seconds: float, seed: int = 0,
                  shifts: int = 0) -> Tuple[Dict[str, StemDelta], dict]:
    import jax

    from ref_shims import load_ref_module
    from audio_separator_tpu.models.htdemucs import config_from_kwargs

    mod = load_ref_module("demucs.htdemucs")
    sources = ["drums", "bass", "other", "vocals"]
    ref = mod.HTDemucs(sources, **geometry).eval()
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn_like(p) * 0.1)

    cfg = config_from_kwargs({"sources": sources, **geometry})
    tree: dict = {}
    for key, value in ref.state_dict().items():
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value.detach().numpy()
    params = jax.device_put(tree)

    mix = _make_mix(seconds, seed=seed + 2)
    want = run_ref_demucs(ref, mix, shifts=shifts)
    got = run_our_demucs(cfg, params, mix, shifts=shifts)
    # both glues swap [0,1]: drums/bass swapped — compare by source list order
    order = ["bass", "drums", "other", "vocals"]
    deltas = compare_stems(
        {name: want[i] for i, name in enumerate(order)},
        {name: got[i] for i, name in enumerate(order)})
    meta = {"kind": "htdemucs", "seconds": seconds, "shifts": shifts,
            "params_m": round(sum(p.numel() for p in ref.parameters()) / 1e6, 1),
            **geometry}
    return deltas, meta
