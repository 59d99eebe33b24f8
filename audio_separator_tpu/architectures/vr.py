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
from ..ops.demix import bucket_up, tiled_mask_predict, tiled_mask_predict_dev
from ..ops import spec as spec_ops
from ..ops import vr_bands
from ..ops import vr_chain
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
    # separate_batch sub-group size: bounds simultaneous HBM (each pending
    # job keeps its (2, 2, T) stems + chain intermediates on device until
    # its fetch — ~170 MB+ for a 4-min track) while keeping the dispatch
    # overlap win; matches the serving coalesce scale.
    _BATCH_GROUP = 4

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
        if self._use_device_chain():
            # TPU-first path: wave up once, stems down once, everything
            # between jitted on device (ops/vr_chain.py). Both stems come
            # out of one fused synthesis program.
            y_wave, v_wave = self._inference_device()
            self.primary_source = self._to_output_rate(y_wave).T
            self.secondary_source = self._to_output_rate(v_wave).T
            y_spec = v_spec = None
        else:
            x_spec = self.loading_mix()
            y_spec, v_spec = self.inference_vr(x_spec, self.aggressiveness)
            y_spec = np.nan_to_num(y_spec, nan=0.0, posinf=0.0, neginf=0.0)
            v_spec = np.nan_to_num(v_spec, nan=0.0, posinf=0.0, neginf=0.0)

        return self._write_stems(custom_output_names, y_spec, v_spec)

    def _write_stems(self, custom_output_names: Optional[Dict],
                     y_spec=None, v_spec=None) -> list:
        """Write the (already computed) stems, honoring output_single_stem;
        the spec args serve the lazy host-chain path only."""
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
                self.primary_source = self._to_output_rate(
                    self.spec_to_wav(y_spec)).T
            path = self.get_stem_output_path(self.primary_stem_name, custom_output_names)
            self.final_process(path, self.primary_source, self.primary_stem_name)
            output_files.append(path)

        if (not self.output_single_stem
                or self.output_single_stem.lower() == self.secondary_stem_name.lower()):
            if not isinstance(self.secondary_source, np.ndarray):
                self.secondary_source = self._to_output_rate(
                    self.spec_to_wav(v_spec)).T
            path = self.get_stem_output_path(self.secondary_stem_name, custom_output_names)
            self.final_process(path, self.secondary_source, self.secondary_stem_name)
            output_files.append(path)
        return output_files

    def separate_batch(self, audio_file_paths: list,
                       custom_output_names_list: Optional[list] = None) -> list:
        """Separate several files with the whole group's device work enqueued
        BEFORE the first fetch: JAX dispatch is async, so job k+1's wave
        upload and chain programs overlap job k's compute, and the blocking
        stem fetches all land at the end — the VR analogue of the engine's
        cross-job batching (the chain's bucketed shapes mean same-bucket
        jobs share every compiled program). Outputs match per-file
        separate() exactly (same programs, same order of math).

        Groups are processed in sub-batches of ``_BATCH_GROUP``: each
        pending job holds its full stems array (+ chain intermediates) in
        HBM until its fetch, so an uncapped folder-sized group would OOM
        where per-file separate() ran fine."""
        names = custom_output_names_list or [None] * len(audio_file_paths)
        if len(names) != len(audio_file_paths):
            raise ValueError(
                f"custom_output_names_list has {len(names)} entries for "
                f"{len(audio_file_paths)} files")
        if len(audio_file_paths) <= 1 or not self._use_device_chain():
            return [self.separate(p, n)
                    for p, n in zip(audio_file_paths, names)]
        if len(audio_file_paths) > self._BATCH_GROUP:
            outputs = []
            for i in range(0, len(audio_file_paths), self._BATCH_GROUP):
                outputs.extend(self.separate_batch(
                    audio_file_paths[i: i + self._BATCH_GROUP],
                    names[i: i + self._BATCH_GROUP]))
            return outputs
        self._load_network()

        from ..ops.stft import fetch_real

        pending = []
        for path in audio_file_paths:
            self.audio_file_path = path
            self.audio_file_base = os.path.splitext(os.path.basename(path))[0]
            waves, out_len, lq = self._inference_device_async()
            pending.append((waves, out_len, lq, self.input_bit_depth))

        outputs = []
        for path, custom, (waves, out_len, lq, bit_depth) in zip(
                audio_file_paths, names, pending):
            self.primary_source = None
            self.secondary_source = None
            self.audio_file_path = path
            self.audio_file_base = os.path.splitext(os.path.basename(path))[0]
            self.input_bit_depth = bit_depth  # per-job write metadata
            host = fetch_real(waves, quant=lq)
            host = np.nan_to_num(host, nan=0.0, posinf=0.0, neginf=0.0)
            self.primary_source = self._to_output_rate(
                host[0][..., :out_len]).T
            self.secondary_source = self._to_output_rate(
                host[1][..., :out_len]).T
            outputs.append(self._write_stems(custom))
        return outputs

    def _to_output_rate(self, wave: np.ndarray) -> np.ndarray:
        """Resample ``(2, T)`` from the model rate to the *configured* output
        rate — write_audio stamps self.sample_rate in the header, so skipping
        this for non-default configs would silently pitch-shift."""
        if self.model_samplerate != self.sample_rate:
            return resample_poly_np(wave, self.model_samplerate, self.sample_rate)
        return wave

    # ------------------------------------------------- device-resident chain

    def _use_device_chain(self) -> bool:
        """The on-device multiband chain is the default for EVERY packaged
        geometry (including ``reverse``, handled by a true-prefix flip);
        ``AUDSEP_VR_CHAIN=host`` opts back to the numpy chain (kept for
        parity tests)."""
        mode = os.environ.get("AUDSEP_VR_CHAIN", "device").strip().lower()
        return mode != "host" and vr_chain.supports_device_chain(self.mp)

    def _inference_device(self):
        """Full VR separation with ONE H2D (the wave) and ONE D2H (both
        stems). Blocking wrapper over :meth:`_inference_device_async`."""
        from ..ops.stft import fetch_real

        waves, out_len, lq = self._inference_device_async()
        host = fetch_real(waves, quant=lq)
        host = np.nan_to_num(host, nan=0.0, posinf=0.0, neginf=0.0)
        return host[0][..., :out_len], host[1][..., :out_len]

    def _inference_device_async(self):
        """Enqueue the whole device chain for the current file WITHOUT
        fetching: per-band resample/STFT/combine, tiled mask inference, TTA,
        aggression, optional post-process/high-end, and the istft/resample
        synthesis cascade all run as jitted device programs at bucketed
        static shapes (ops/vr_chain.py). Replaces the reference's host loop
        (ref: vr_separator.py:255-375) rather than translating it. Returns
        ``(stems device array, true output length, link-quant mode)`` so
        callers can overlap several files' device work before blocking."""
        from ..io import audio as audio_io
        from ..ops.fn_cache import memoized_model_fn
        from ..ops.stft import fetch_real, link_quant_mode, put_real

        geom = vr_chain.band_geometry(self.mp, self.is_vr_51_model)
        bands_n = len(self.mp["band"])
        sr_top = self.mp["band"][bands_n]["sr"]

        pcm, _ = audio_io.load_audio(self.audio_file_path, sample_rate=sr_top)
        self.capture_input_bit_depth(self.audio_file_path)
        if pcm.ndim == 2 and pcm.shape[0] == 1:
            pcm = pcm[0]
        if pcm.ndim == 1:
            pcm = np.stack([pcm, pcm])
        pcm = pcm.astype(np.float32)

        t_true = pcm.shape[-1]
        # 1 s bucket quantum: log-many compiled shapes across track lengths,
        # ≤ ~1/3 padding — and NO padded mask-net forwards (the tile count
        # below is the true one; dummy batches are never dispatched).
        t_bucket = bucket_up(t_true, sr_top)
        n_frame = vr_chain.chain_frames(geom, t_true)
        lb = vr_chain.chain_frames(geom, t_bucket)
        wave = np.zeros((2, t_bucket), dtype=np.float32)
        wave[:, :t_true] = pcm

        # The wave is the mask net's input: under int8 link policy it still
        # ships at int16 (same rule as the demix engine's uploads).
        lq = link_quant_mode()
        wave_dev = put_real(wave, quant="int16" if lq == "int8" else lq)
        t_dev = jnp.int32(t_true)
        nf_dev = jnp.int32(n_frame)

        analyze = memoized_model_fn(
            ("vr-chain-analyze", geom, t_bucket),
            lambda: vr_chain.build_analyze(geom, t_bucket))
        spec_c, high_end = analyze(wave_dev, t_dev)

        window, offset = self.window_size, self._offset
        if window - 2 * offset <= 0:
            raise ValueError(
                "Window size error: h1_shape[3] must be greater than h2_shape[3]")
        roi = window - 2 * offset
        n_tiles = n_frame // roi + 1  # == make_padding tiling of n_frame
        want_tta = bool(self.enable_tta)
        pad_key = ("vr-chain-pad", geom, t_bucket, window, offset, want_tta)

        def _build_pad():
            def pad_norm(spec):
                mag = jnp.abs(spec)
                mx = jnp.max(mag)  # reference normalises by the raw max
                base = jnp.pad(mag, ((0, 0), (0, 0), (offset, 0))) / mx
                if not want_tta:
                    return base, base
                tta = jnp.pad(mag, ((0, 0), (0, 0), (offset + roi // 2, 0))) / mx
                return base, tta

            return jax.jit(pad_norm)

        mag_pad, mag_pad_tta = memoized_model_fn(pad_key, _build_pad)(spec_c)

        predict = self._predict_fn()
        batch = max(1, int(self.batch_size))
        mask = tiled_mask_predict_dev(
            predict, mag_pad, window=window, offset=offset, batch_size=batch,
            n_tiles=n_tiles, model_params=self._params, mesh=self.mesh)
        mask_tta = None
        if self.enable_tta:
            mask_tta = tiled_mask_predict_dev(
                predict, mag_pad_tta, window=window, offset=offset,
                batch_size=batch, n_tiles=n_tiles + 1,
                model_params=self._params, mesh=self.mesh)

        is_non_accom = self.primary_stem_name in self.NON_ACCOM_STEMS
        aggr_key = (self.aggressiveness["value"],
                    self.aggressiveness["split_bin"],
                    json.dumps(self.aggressiveness.get("aggr_correction"),
                               sort_keys=True))
        finalize = memoized_model_fn(
            ("vr-chain-finalize", lb, roi, self.enable_tta, aggr_key,
             is_non_accom, mask.shape, None if mask_tta is None else mask_tta.shape),
            lambda: vr_chain.build_finalize(lb, roi, self.enable_tta,
                                            self.aggressiveness, is_non_accom))
        mask = finalize(mask, mask_tta) if self.enable_tta else finalize(mask)

        if self.enable_post_process:
            # merge_artifacts is data-dependent (region discovery) — the one
            # host round trip in this path, only when explicitly enabled.
            m = fetch_real(mask, quant=lq)
            m = vr_bands.merge_artifacts(m, thres=self.post_process_threshold)
            mask = put_real(m, quant="int16" if lq == "int8" else lq)

        use_high_end = bool(self.high_end_process and high_end is not None)
        synthesize = memoized_model_fn(
            ("vr-chain-synth", geom, lb, use_high_end),
            lambda: vr_chain.build_synthesize(geom, lb, use_high_end))
        if use_high_end:
            waves = synthesize(mask, spec_c, nf_dev, high_end)
        else:
            waves = synthesize(mask, spec_c, nf_dev)

        out_len = vr_chain.synth_out_len(geom, n_frame)
        return waves, out_len, lq

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
