"""VR architecture separator (cascaded spectrogram U-Nets, multiband).

Behaviour-parity re-design of the reference VRSeparator
(ref: audio_separator/separator/architectures/vr_separator.py): same multiband
load pipeline, size-keyed architecture selection, sliding-window mask
inference with optional TTA, aggression/post-process/high-end-mirroring — the
network forward runs as a single jitted JAX program per patch batch.
"""

from __future__ import annotations

import functools
import json
import math
import os
from importlib import resources
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.convert import load_torch_state_dict
from ..models.vr_nets import predict_mask_v5, predict_mask_v51, state_dict_to_tree
from ..ops.demix import tiled_mask_predict
from ..ops import spec as spec_ops
from ..ops import vr_bands
from ..ops.resample import resample_poly_np
from ..separator.common import BaseSeparator

NN_ARCH_SIZES = [31191, 33966, 56817, 123821, 123812, 129605, 218409, 537238, 537227]
VR_5_1_MODELS = [56817, 218409]


def load_vr_model_params(name: str) -> Dict:
    """Load a band-definition JSON from the packaged modelparams data
    (ref: vr_network/model_param_init.py:44-71)."""
    with resources.files("audio_separator_tpu.data.vr_modelparams").joinpath(
            f"{name}.json").open("r", encoding="utf-8") as f:
        raw = json.load(f)

    def int_keys(d):
        return {int(k) if isinstance(k, str) and k.isdigit() else k: v for k, v in d.items()}

    param = int_keys(raw)
    if "band" in param:
        param["band"] = int_keys(param["band"])
    for key in ("mid_side", "mid_side_b", "mid_side_b2", "stereo_w", "stereo_n", "reverse"):
        param.setdefault(key, False)
    if "n_bins" in param:
        param["bins"] = param["n_bins"]
    return param


class VRSeparator(BaseSeparator):
    def __init__(self, common_config: Dict, arch_config: Dict):
        super().__init__(config=common_config)

        self.model_capacity = (32, 128)
        self.is_vr_51_model = False
        if "nout" in self.model_data and "nout_lstm" in self.model_data:
            self.model_capacity = (self.model_data["nout"], self.model_data["nout_lstm"])
            self.is_vr_51_model = True

        self.mp = load_vr_model_params(self.model_data["vr_model_param"])

        self.enable_tta = arch_config.get("enable_tta", False)
        self.enable_post_process = arch_config.get("enable_post_process", False)
        self.post_process_threshold = arch_config.get("post_process_threshold", 0.2)
        # Device batch default 4 (reference default is 1); explicit
        # vr_params["batch_size"] still wins (same rationale as MDXC).
        self.batch_size = arch_config.get("batch_size") or 4
        self.window_size = arch_config.get("window_size", 512)
        self.high_end_process = arch_config.get("high_end_process", False)
        self.input_high_end_h = None
        self.input_high_end = None
        self.aggression = float(int(arch_config.get("aggression", 5)) / 100)
        self.aggressiveness = {
            "value": self.aggression,
            "split_bin": self.mp["band"][1]["crop_stop"],
            "aggr_correction": self.mp.get("aggr_correction"),
        }
        self.model_samplerate = self.mp["sr"]

        self._params = None
        self._arch_size = None
        self._offset = None
        self._jit_predict = None

    # ------------------------------------------------------------------ model

    def _load_network(self):
        if self._params is not None:
            return
        model_size = math.ceil(os.stat(self.model_path).st_size / 1024)
        arch_size = min(NN_ARCH_SIZES, key=lambda x: abs(x - model_size))
        if arch_size in VR_5_1_MODELS or self.is_vr_51_model:
            self.is_vr_51_model = True
            self._offset = 64
        else:
            self._offset = 128
        self._arch_size = arch_size
        # Process-wide device-resident weights (ops/fn_cache.py): a cache hit
        # skips both the torch checkpoint load and the H2D upload entirely.
        from ..ops.fn_cache import file_key, memoized_device_params

        self._params = memoized_device_params(
            ("vr-params",) + file_key(self.model_path),
            lambda: jax.device_put(state_dict_to_tree(
                load_torch_state_dict(self.model_path))))
        self.logger.debug(f"VR model loaded: arch_size={arch_size}, v51={self.is_vr_51_model}")

    def _predict_fn(self):
        """The un-jitted ``(params, (B, 2, bins, window)) -> (B, 2, bins, roi)``
        mask network — memoized process-wide (ops/fn_cache.py) on the network
        geometry so the tiled engine's jit cache keys stay stable across
        calls AND across Separator instances (serving builds one per job)."""
        if self._jit_predict is None:
            from ..ops.fn_cache import memoized_model_fn

            n_fft_bins = self.mp["bins"] * 2
            is_v51, offset = self.is_vr_51_model, self._offset
            arch, autocast = self._arch_size, self.use_autocast

            def _build():
                if is_v51:
                    base = functools.partial(predict_mask_v51,
                                             n_fft_bins=n_fft_bins, offset=offset)
                else:
                    base = functools.partial(predict_mask_v5, n_fft_bins=n_fft_bins,
                                             arch=arch, offset=offset)
                if autocast:
                    # Net weights follow the input dtype (models/vr_nets.py):
                    # a bf16 input runs the cascade in bf16; mask back in fp32.
                    def fn(params, x):
                        return base(params, x.astype(jnp.bfloat16)).astype(jnp.float32)
                else:
                    fn = base
                return fn

            self._jit_predict = memoized_model_fn(
                ("vr", is_v51, n_fft_bins, arch, offset, autocast), _build)
        return self._jit_predict

    # --------------------------------------------------------------- separate

    def separate(self, audio_file_path: str, custom_output_names: Optional[Dict] = None):
        self.primary_source = None
        self.secondary_source = None
        self.audio_file_path = audio_file_path
        self.audio_file_base = os.path.splitext(os.path.basename(audio_file_path))[0]

        self._load_network()
        x_spec = self.loading_mix()
        y_spec, v_spec = self.inference_vr(x_spec, self.aggressiveness)
        y_spec = np.nan_to_num(y_spec, nan=0.0, posinf=0.0, neginf=0.0)
        v_spec = np.nan_to_num(v_spec, nan=0.0, posinf=0.0, neginf=0.0)

        output_files = []
        if self.output_single_stem and self.output_single_stem.lower() not in (
                self.primary_stem_name.lower(), self.secondary_stem_name.lower()):
            self.logger.warning(
                f"output_single_stem '{self.output_single_stem}' matches neither stem; "
                f"saving both.")
            self.output_single_stem = None

        if (not self.output_single_stem
                or self.output_single_stem.lower() == self.primary_stem_name.lower()):
            if not isinstance(self.primary_source, np.ndarray):
                self.primary_source = self.spec_to_wav(y_spec).T
                if self.model_samplerate != self.sample_rate:
                    # Resample to the *configured* output rate — write_audio
                    # stamps self.sample_rate in the header, so a fixed 44100
                    # here would silently pitch-shift non-default configs.
                    self.primary_source = resample_poly_np(
                        self.primary_source.T, self.model_samplerate,
                        self.sample_rate).T
            path = self.get_stem_output_path(self.primary_stem_name, custom_output_names)
            self.final_process(path, self.primary_source, self.primary_stem_name)
            output_files.append(path)

        if (not self.output_single_stem
                or self.output_single_stem.lower() == self.secondary_stem_name.lower()):
            if not isinstance(self.secondary_source, np.ndarray):
                self.secondary_source = self.spec_to_wav(v_spec).T
                if self.model_samplerate != self.sample_rate:
                    self.secondary_source = resample_poly_np(
                        self.secondary_source.T, self.model_samplerate,
                        self.sample_rate).T
            path = self.get_stem_output_path(self.secondary_stem_name, custom_output_names)
            self.final_process(path, self.secondary_source, self.secondary_stem_name)
            output_files.append(path)
        return output_files

    # ------------------------------------------------------------ data prep

    def loading_mix(self) -> np.ndarray:
        """Per-band resample + STFT + combine (ref: vr_separator.py:255-293)."""
        from ..io import audio as audio_io

        x_wave: Dict[int, np.ndarray] = {}
        x_spec: Dict[int, np.ndarray] = {}
        bands_n = len(self.mp["band"])

        for d in range(bands_n, 0, -1):
            bp = self.mp["band"][d]
            if d == bands_n:  # highest band: load at band sr
                pcm, _ = audio_io.load_audio(self.audio_file_path, sample_rate=bp["sr"])
                self.capture_input_bit_depth(self.audio_file_path)
                if pcm.ndim == 2 and pcm.shape[0] == 1:
                    pcm = pcm[0]  # load_audio returns (1, N) for mono files
                if pcm.ndim == 1:
                    pcm = np.stack([pcm, pcm])
                x_wave[d] = pcm.astype(np.float32)
            else:
                x_wave[d] = resample_poly_np(
                    x_wave[d + 1], self.mp["band"][d + 1]["sr"], bp["sr"])
            x_spec[d] = vr_bands.wave_to_spectrogram(
                x_wave[d], bp["hl"], bp["n_fft"], self.mp, band=d,
                is_v51_model=self.is_vr_51_model)

            if d == bands_n and self.high_end_process:
                self.input_high_end_h = (bp["n_fft"] // 2 - bp["crop_stop"]) + (
                    self.mp["pre_filter_stop"] - self.mp["pre_filter_start"])
                self.input_high_end = x_spec[d][
                    :, bp["n_fft"] // 2 - self.input_high_end_h : bp["n_fft"] // 2, :]

        return vr_bands.combine_spectrograms(x_spec, self.mp,
                                             is_v51_model=self.is_vr_51_model)

    # ------------------------------------------------------------- inference

    def _execute(self, x_mag_pad: np.ndarray, roi_size: int) -> np.ndarray:
        """One device dispatch per pass: the padded magnitudes run through the
        shared tiled scan (ops/demix.py:tiled_mask_predict) instead of the
        reference's host batch loop (ref: vr_separator.py:295-366)."""
        if self.window_size - 2 * self._offset <= 0:
            raise ValueError("Window size error: h1_shape[3] must be greater than h2_shape[3]")
        assert roi_size == self.window_size - 2 * self._offset
        return tiled_mask_predict(
            self._predict_fn(), x_mag_pad.astype(np.float32),
            window=self.window_size, offset=self._offset,
            batch_size=max(1, int(self.batch_size)),
            out_c=2, out_f=x_mag_pad.shape[1],
            model_params=self._params, mesh=self.mesh)

    def inference_vr(self, x_spec: np.ndarray, aggressiveness: Dict):
        """(ref: vr_separator.py:295-366)."""
        x_mag, x_phase = spec_ops.preprocess(x_spec)
        n_frame = x_mag.shape[2]
        pad_l, pad_r, roi_size = spec_ops.make_padding(n_frame, self.window_size,
                                                       self._offset)
        x_mag_pad = np.pad(x_mag, ((0, 0), (0, 0), (pad_l, pad_r)), mode="constant")
        x_mag_pad = x_mag_pad / x_mag_pad.max()
        mask = self._execute(x_mag_pad, roi_size)

        if self.enable_tta:
            pad_l += roi_size // 2
            pad_r += roi_size // 2
            x_mag_pad = np.pad(x_mag, ((0, 0), (0, 0), (pad_l, pad_r)), mode="constant")
            x_mag_pad = x_mag_pad / x_mag_pad.max()
            mask_tta = self._execute(x_mag_pad, roi_size)
            mask_tta = mask_tta[:, :, roi_size // 2 :]
            mask = (mask[:, :, :n_frame] + mask_tta[:, :, :n_frame]) * 0.5
        else:
            mask = mask[:, :, :n_frame]

        is_non_accom_stem = self.primary_stem_name in self.NON_ACCOM_STEMS
        mask = vr_bands.adjust_aggr(mask, is_non_accom_stem, aggressiveness)
        if self.enable_post_process:
            mask = vr_bands.merge_artifacts(mask, thres=self.post_process_threshold)

        phase = np.exp(1.0j * x_phase)
        return mask * x_mag * phase, (1 - mask) * x_mag * phase

    def spec_to_wav(self, spec: np.ndarray) -> np.ndarray:
        if (self.high_end_process and isinstance(self.input_high_end, np.ndarray)
                and self.input_high_end_h):
            high_end = vr_bands.mirroring("mirroring", spec, self.input_high_end, self.mp)
            return vr_bands.cmb_spectrogram_to_wave(
                spec, self.mp, self.input_high_end_h, high_end,
                is_v51_model=self.is_vr_51_model)
        return vr_bands.cmb_spectrogram_to_wave(spec, self.mp,
                                                is_v51_model=self.is_vr_51_model)
