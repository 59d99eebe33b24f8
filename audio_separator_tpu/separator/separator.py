"""The public ``Separator`` facade — TPU-native re-design of the reference
orchestrator (ref: audio_separator/separator/separator.py:52-1412).

API-compatible surface: constructor kwargs, ``load_model`` / ``separate`` /
``download_model_and_data`` / model-listing methods, ensemble presets, chunked
processing. Device selection targets JAX (TPU/CPU) instead of
torch-CUDA/ONNXruntime.
"""

from __future__ import annotations

import json
import logging
import os
import re
import shutil
import tempfile
import time
from importlib import resources
from typing import Dict, List, Optional, Union

import numpy as np
import yaml

from .. import __version__
from ..io import audio as audio_io
from .chunking import AudioChunker
from .ensembler import ALGORITHMS as VALID_ENSEMBLE_ALGORITHMS
from .ensembler import Ensembler
from .registry import ModelRegistry

DEFAULT_MODEL = "model_bs_roformer_ep_317_sdr_12.9755.ckpt"

STEM_NAME_MAP = {
    "vocals": "Vocals",
    "instrumental": "Instrumental",
    "inst": "Instrumental",
    "karaoke": "Instrumental",
    "other": "Other",
    "no_vocals": "Instrumental",
    "drums": "Drums",
    "bass": "Bass",
    "guitar": "Guitar",
    "piano": "Piano",
    "synthesizer": "Synthesizer",
    "strings": "Strings",
    "woodwinds": "Woodwinds",
    "brass": "Brass",
    "wind inst": "Wind Inst",
    "lead vocals": "Lead Vocals",
    "backing vocals": "Backing Vocals",
    "primary stem": "Primary Stem",
    "secondary stem": "Secondary Stem",
}

_AUDIO_EXTENSIONS = (".wav", ".flac", ".mp3", ".ogg", ".opus", ".m4a", ".aiff", ".ac3")


class Separator:
    """Audio stem separation orchestrator (JAX/TPU backend)."""

    VALID_ENSEMBLE_ALGORITHMS = VALID_ENSEMBLE_ALGORITHMS

    def __init__(
        self,
        log_level=logging.INFO,
        log_formatter=None,
        model_file_dir=None,
        output_dir=None,
        output_format="WAV",
        output_bitrate=None,
        normalization_threshold=0.9,
        amplification_threshold=0.0,
        output_single_stem=None,
        invert_using_spec=False,
        sample_rate=44100,
        use_soundfile=False,
        use_autocast=False,
        use_directml=False,  # accepted for API parity (ref: separator.py:121);
                             # no DirectML on TPU hosts — ignored with a warning
        chunk_duration=None,
        mdx_params=None,
        vr_params=None,
        demucs_params=None,
        mdxc_params=None,
        ensemble_algorithm=None,
        ensemble_weights=None,
        ensemble_preset=None,
        info_only=False,
        trace_dir=None,
        use_mesh=False,
    ):
        self.logger = logging.getLogger(__name__)
        self.logger.setLevel(log_level)
        self.log_level = log_level
        self.log_formatter = log_formatter

        self.log_handler = logging.StreamHandler()
        if self.log_formatter is None:
            self.log_formatter = logging.Formatter(
                "%(asctime)s - %(levelname)s - %(module)s - %(message)s")
        self.log_handler.setFormatter(self.log_formatter)
        if not self.logger.hasHandlers():
            self.logger.addHandler(self.log_handler)

        if not info_only:
            self.logger.info(f"Separator (TPU) version {__version__} instantiating "
                             f"with output_dir: {output_dir}, output_format: {output_format}")

        if model_file_dir is None:
            env_dir = os.environ.get("AUDIO_SEPARATOR_MODEL_DIR")
            model_file_dir = env_dir or "/tmp/audio-separator-models/"
        self.model_file_dir = model_file_dir
        os.makedirs(self.model_file_dir, exist_ok=True)

        self.output_dir = output_dir
        self.output_format = output_format or "WAV"
        self.output_bitrate = output_bitrate

        if not 0 < normalization_threshold <= 1:
            raise ValueError("The normalization_threshold must be greater than 0 and less than or equal to 1.")
        if not 0 <= amplification_threshold <= 1:
            raise ValueError("The amplification_threshold must be greater than or equal to 0 and less than or equal to 1.")
        self.normalization_threshold = normalization_threshold
        self.amplification_threshold = amplification_threshold

        self.output_single_stem = output_single_stem
        if output_single_stem is not None:
            self.logger.debug(f"Single stem output requested, only one output file "
                              f"({output_single_stem}) will be written")
        self.invert_using_spec = invert_using_spec
        self.sample_rate = int(sample_rate)
        self.use_soundfile = use_soundfile
        self.use_autocast = use_autocast
        if use_directml:
            self.logger.warning(
                "use_directml is ignored: this build targets TPU via JAX/XLA")
        self.chunk_duration = chunk_duration
        self.trace_dir = trace_dir
        self.use_mesh = use_mesh

        # Ensemble configuration (ref: separator.py:227-238).
        self.ensemble_algorithm = ensemble_algorithm
        self.ensemble_weights = ensemble_weights
        self.ensemble_preset = ensemble_preset
        self._ensemble_preset_models = None
        if ensemble_preset is not None:
            preset = self._load_ensemble_preset(ensemble_preset)
            self._ensemble_preset_models = preset["models"]
            if self.ensemble_algorithm is None:
                self.ensemble_algorithm = preset.get("algorithm", "avg_wave")
            if self.ensemble_weights is None:
                self.ensemble_weights = preset.get("weights")
        if self.ensemble_algorithm is not None and self.ensemble_algorithm not in VALID_ENSEMBLE_ALGORITHMS:
            raise ValueError(f"Invalid ensemble algorithm: {self.ensemble_algorithm}. "
                             f"Valid options: {', '.join(VALID_ENSEMBLE_ALGORITHMS)}")

        self.arch_specific_params = {
            "MDX": mdx_params if mdx_params is not None else {
                "hop_length": 1024, "segment_size": 256, "overlap": 0.25,
                "batch_size": 4, "enable_denoise": False},
            "VR": vr_params if vr_params is not None else {
                "batch_size": 4, "window_size": 512, "aggression": 5,
                "enable_tta": False, "enable_post_process": False,
                "post_process_threshold": 0.2, "high_end_process": False},
            "Demucs": demucs_params if demucs_params is not None else {
                "segment_size": "Default", "shifts": 2, "overlap": 0.25,
                "segments_enabled": True},
            "MDXC": mdxc_params if mdxc_params is not None else {
                "segment_size": 256, "override_model_segment_size": False,
                "batch_size": 4, "overlap": 8, "pitch_shift": 0},
        }

        self.registry = ModelRegistry(self.model_file_dir, self.logger)
        self.model_instance = None
        self.model_filename = None
        self.model_filenames: List[str] = []
        self.model_is_uvr_vip = False
        self.model_friendly_name = None
        self.jax_device = None

        if not info_only:
            self.setup_inferencing_device()

    # ----------------------------------------------------------------- device

    def _resolve_mesh(self):
        """Build the chunk-DP device mesh when multi-chip execution is on.

        ``use_mesh=True`` → all local devices on a pure-data mesh (the demix
        engine shards each window batch across them, SURVEY §2.8 mapping); a
        ``jax.sharding.Mesh`` instance is passed through as-is for custom
        dp×tp layouts. Single-device → None (no sharding machinery).
        """
        if not self.use_mesh:
            return None
        if self.use_mesh is not True:  # caller-provided Mesh
            return self.use_mesh
        import jax

        from ..parallel.mesh import make_mesh

        if len(jax.devices()) <= 1:
            self.logger.debug("use_mesh requested but only one device present")
            return None
        mesh = make_mesh()
        self.logger.info(f"demixing over device mesh {dict(mesh.shape)}")
        return mesh

    def _probe_devices_with_watchdog(self):
        """`jax.devices()` guarded against an unresponsive TPU runtime.

        Device discovery talks to the TPU runtime and can block indefinitely
        when that runtime is down (observed: tethered-relay outages wedge any
        device op, including discovery). Probe in a daemon thread: while it
        blocks, log an actionable warning every 30 s; if
        ``AUDSEP_DEVICE_TIMEOUT_S`` is set (the CLI info commands default it),
        raise after that long so callers fail fast instead of hanging.
        """
        import threading

        import jax

        result = {}

        def probe():
            try:
                result["devices"] = jax.devices()
            except Exception as exc:  # noqa: BLE001 — re-raised on the caller
                result["error"] = exc

        thread = threading.Thread(target=probe, daemon=True,
                                  name="audsep-device-probe")
        thread.start()
        try:
            timeout = float(os.environ.get("AUDSEP_DEVICE_TIMEOUT_S", 0) or 0)
        except ValueError:
            self.logger.warning(
                "Ignoring non-numeric AUDSEP_DEVICE_TIMEOUT_S="
                f"{os.environ['AUDSEP_DEVICE_TIMEOUT_S']!r}")
            timeout = 0.0
        waited = 0.0
        while True:
            interval = 30.0 if timeout <= 0 else min(30.0, timeout - waited)
            thread.join(max(interval, 0.1))
            if not thread.is_alive():
                break
            waited += interval
            self.logger.warning(
                f"JAX device discovery blocked for {waited:.0f}s — the TPU "
                f"runtime looks unresponsive. Set JAX_PLATFORMS=cpu to force "
                f"CPU, or AUDSEP_DEVICE_TIMEOUT_S to fail fast.")
            if timeout > 0 and waited >= timeout:
                raise RuntimeError(
                    f"JAX device discovery did not respond within {timeout:.0f}s "
                    f"(TPU runtime outage?). Set JAX_PLATFORMS=cpu to run on CPU.")
        if "error" in result:
            raise result["error"]
        return result["devices"]

    def setup_inferencing_device(self):
        """Select the JAX device (TPU if available, else CPU) — replaces the
        reference's torch-CUDA/MPS/DML selection (ref: separator.py:317-444)."""
        import platform

        self.logger.info(f"Operating System: {platform.system()} {platform.release()}")
        self.logger.info(f"Python Version: {platform.python_version()}")
        from ..ops.fn_cache import enable_persistent_compile_cache

        cache_dir = enable_persistent_compile_cache()
        if cache_dir:
            self.logger.debug(f"Persistent XLA compile cache: {cache_dir}")
        try:
            devices = self._probe_devices_with_watchdog()
            self.jax_device = devices[0]
            kind = getattr(self.jax_device, "platform", "unknown")
            self.logger.info(f"JAX backend: {kind}, devices: {devices}")
            if kind not in ("tpu", "proxy") and "tpu" not in str(self.jax_device).lower():
                self.logger.info("No TPU detected; inference will run on CPU via XLA.")
        except Exception as exc:
            raise RuntimeError(f"Failed to initialise JAX backend: {exc}") from exc
        if not audio_io.native_codec_available():
            self.logger.warning(
                "Native codec library unavailable; only WAV I/O will be supported.")

    # --------------------------------------------------------------- registry

    def list_supported_model_files(self):
        return self.registry.list_supported_model_files()

    def download_model_files(self, model_filename: str):
        result = self.registry.download_model_files(model_filename)
        _, _, friendly_name, _, _ = result
        self.model_is_uvr_vip = "VIP" in (friendly_name or "")
        self.model_friendly_name = friendly_name
        self.print_uvr_vip_message()
        return result

    def get_model_hash(self, model_path: str) -> str:
        from .registry import get_model_hash

        return get_model_hash(model_path)

    def print_uvr_vip_message(self):
        if self.model_is_uvr_vip:
            self.logger.warning(
                f"The model: '{self.model_friendly_name}' is a VIP model, intended by "
                f"Anjok07 for access by paying subscribers only.")
            self.logger.warning(
                "If you are not already subscribed, please consider supporting the "
                "developer of UVR, Anjok07 by subscribing here: https://patreon.com/uvr")

    def load_model_data_from_yaml(self, yaml_config_filename: str) -> dict:
        path = (yaml_config_filename if os.path.exists(yaml_config_filename)
                else os.path.join(self.model_file_dir, yaml_config_filename))
        self.logger.debug(f"Loading model data from YAML at path {path}")
        with open(path, encoding="utf-8") as f:
            model_data = yaml.load(f, Loader=yaml.FullLoader)
        if "roformer" in path.lower():
            model_data["is_roformer"] = True
        return model_data

    def load_model_data_using_hash(self, model_path: str) -> dict:
        return self.registry.load_model_data_using_hash(model_path)

    def _resolve_model_data(self, model_path: str,
                            yaml_config_filename: Optional[str]) -> dict:
        """Model params by priority: companion/explicit YAML → local sidecar
        ``<model>.json`` → UVR hash lookup. The sidecar is the offline
        analogue of MDXC's companion YAML for local custom MDX/VR models
        (dim_f/dim_t/n_fft/compensate, or vr_model_param/primary_stem) —
        the reference has no local-params path at all (unknown hashes are
        fatal, ref: separator.py:779-828)."""
        if yaml_config_filename is not None:
            return self.load_model_data_from_yaml(yaml_config_filename)
        sidecar = os.path.splitext(model_path)[0] + ".json"
        if os.path.exists(sidecar):
            self.logger.debug(f"Loading model data from sidecar {sidecar}")
            with open(sidecar, encoding="utf-8") as f:
                return json.load(f)
        return self.load_model_data_using_hash(model_path)

    # ------------------------------------------------------------------ model

    def load_model(self, model_filename: Union[str, List[str]] = DEFAULT_MODEL):
        """Resolve, download, and instantiate the architecture separator."""
        if self._ensemble_preset_models is not None and model_filename == DEFAULT_MODEL:
            model_filename = self._ensemble_preset_models

        if isinstance(model_filename, list):
            if len(model_filename) > 1:
                self.model_filename = list(model_filename)
                self.model_filenames = list(model_filename)
                self.logger.info(f"Multiple models specified for ensembling: {self.model_filenames}")
                return
            model_filename = model_filename[0]

        self.model_filename = model_filename
        self.model_filenames = [model_filename]
        self.logger.info(f"Loading model {model_filename}...")
        start = time.perf_counter()

        model_filename, model_type, friendly_name, model_path, yaml_config_filename = (
            self.download_model_files(model_filename))
        model_name = model_filename.split(".")[0]

        if model_path.lower().endswith(".yaml"):
            yaml_config_filename = model_path
        model_data = self._resolve_model_data(model_path, yaml_config_filename)

        common_params = {
            "logger": self.logger,
            "log_level": self.log_level,
            "model_name": model_name,
            "model_path": model_path,
            "model_data": model_data,
            "output_format": self.output_format,
            "output_bitrate": self.output_bitrate,
            "output_dir": self.output_dir,
            "normalization_threshold": self.normalization_threshold,
            "amplification_threshold": self.amplification_threshold,
            "output_single_stem": self.output_single_stem,
            "invert_using_spec": self.invert_using_spec,
            "sample_rate": self.sample_rate,
            "use_soundfile": self.use_soundfile,
            "use_autocast": self.use_autocast,
            "mesh": self._resolve_mesh(),
        }

        separator_classes = {
            "MDX": ("audio_separator_tpu.architectures.mdx", "MDXSeparator"),
            "VR": ("audio_separator_tpu.architectures.vr", "VRSeparator"),
            "Demucs": ("audio_separator_tpu.architectures.demucs", "DemucsSeparator"),
            "MDXC": ("audio_separator_tpu.architectures.mdxc", "MDXCSeparator"),
        }
        if model_type not in separator_classes or model_type not in self.arch_specific_params:
            raise ValueError(f"Model type not supported (yet): {model_type}")

        import importlib

        module_name, class_name = separator_classes[model_type]
        module = importlib.import_module(module_name)
        separator_class = getattr(module, class_name)
        self.model_instance = separator_class(
            common_config=common_params,
            arch_config=self.arch_specific_params[model_type])

        self.logger.info(
            f'Load model duration: '
            f'{time.strftime("%H:%M:%S", time.gmtime(int(time.perf_counter() - start)))}')

    def download_model_and_data(self, model_filename: str):
        """Download a model + its config/data without loading it."""
        self.logger.info(f"Downloading model {model_filename}...")
        model_filename, model_type, friendly_name, model_path, yaml_config_filename = (
            self.download_model_files(model_filename))
        if model_path.lower().endswith(".yaml"):
            yaml_config_filename = model_path
        model_data = self._resolve_model_data(model_path, yaml_config_filename)
        self.logger.info(
            f"Model downloaded, type: {model_type}, friendly name: {friendly_name}, "
            f"model_path: {model_path}, model_data: {len(model_data)} items")

    # --------------------------------------------------------------- separate

    def separate(self, audio_file_path, custom_output_names: Optional[Dict] = None) -> List[str]:
        if not (self.model_instance
                or (isinstance(self.model_filename, list) and len(self.model_filename) > 0)):
            raise ValueError(
                "Initialization failed or model not loaded. Please load a model "
                "before attempting to separate.")

        if isinstance(self.model_filename, list) and len(self.model_filename) > 1:
            return self._separate_ensemble(audio_file_path, custom_output_names)

        if isinstance(audio_file_path, str):
            audio_file_path = [audio_file_path]

        output_files: List[str] = []
        for path in audio_file_path:
            if os.path.isdir(path):
                for root, _dirs, files in os.walk(path):
                    for file in files:
                        if file.lower().endswith(_AUDIO_EXTENSIONS):
                            full_path = os.path.join(root, file)
                            self.logger.info(f"Processing file: {full_path}")
                            try:
                                output_files.extend(
                                    self._separate_file(full_path, custom_output_names))
                            except Exception as exc:
                                self.logger.error(f"Failed to process file {full_path}: {exc}")
            else:
                self.logger.info(f"Processing file: {path}")
                if len(audio_file_path) == 1:
                    # Single-input call: surface failures to the caller
                    # instead of silently returning an empty list (the
                    # per-file try/except below exists so one bad file
                    # doesn't kill a *batch*, ref: separator.py:974-987).
                    output_files.extend(self._separate_file(path, custom_output_names))
                    continue
                try:
                    output_files.extend(self._separate_file(path, custom_output_names))
                except Exception as exc:
                    self.logger.error(f"Failed to process file {path}: {exc}")
        return output_files

    def separate_batch(self, audio_file_paths: List[str],
                       custom_output_names_list: Optional[List] = None) -> List[List[str]]:
        """Separate several files, sharing ONE engine pass when the loaded
        architecture supports cross-job window batching (MDXC/RoFormer —
        ops/demix.demix_jobs); otherwise sequential :meth:`separate` calls.
        Returns one output-file list per input path, order-preserving."""
        if not self.model_instance:
            raise ValueError("Load a model before calling separate_batch.")
        names = custom_output_names_list or [None] * len(audio_file_paths)
        if len(names) != len(audio_file_paths):
            raise ValueError("custom_output_names_list length mismatch")
        batch_fn = getattr(self.model_instance, "separate_batch", None)
        # chunk_duration is a memory/compile-shape protection the caller
        # opted into — the batch path runs whole tracks through one engine
        # pass and would silently skip the AudioChunker split that
        # separate() applies, so chunked configs take the sequential path.
        if (batch_fn is not None and len(audio_file_paths) > 1
                and self.chunk_duration is None):
            outputs = batch_fn(audio_file_paths, names)
            self.model_instance.clear_file_specific_paths()
            return outputs
        # Arch without a batch path: sequential, with the full per-file
        # bookkeeping (chunking, tracing, timing) of a normal separate().
        return [self._separate_file(p, n)
                for p, n in zip(audio_file_paths, names)]

    def warmup(self, seconds: float = 8.0) -> float:
        """Pre-compile the loaded model's demix programs; returns elapsed s.

        XLA compiles one program per (track-length bucket, model) pair, and
        without this the first user request pays that compile (tens of
        seconds to minutes on a tethered TPU). Serving deployments call
        ``warmup()`` after ``load_model()`` — pick ``seconds`` near the
        expected track length so the right bucket is primed (buckets grow in
        ~+33% steps, see ops/demix.py:bucket_up). Outputs go to a temp dir
        and are discarded; the jit cache (and the persistent XLA cache, if
        configured) keeps the compiled programs.
        """
        is_ensemble = (isinstance(self.model_filename, list)
                       and len(self.model_filename) > 1)
        if not (self.model_instance or is_ensemble):
            raise ValueError("Load a model before warming up.")
        start = time.perf_counter()
        with tempfile.TemporaryDirectory(prefix="audsep_warmup_") as td:
            path = os.path.join(td, "warmup.wav")
            noise = (np.random.default_rng(0).standard_normal(
                (2, max(1, int(seconds * self.sample_rate)))) * 0.05
            ).astype(np.float32)
            audio_io.save_audio(path, noise, self.sample_rate)
            # Route through the REAL separation path (self.separate) so the
            # warmed programs are exactly the production ones: chunk_duration
            # splitting and ensemble member models included.
            prev_output_dir = self.output_dir
            self.output_dir = td
            if self.model_instance:
                self.model_instance.output_dir = td
            try:
                self.separate(path)
            finally:
                self.output_dir = prev_output_dir
                if self.model_instance:
                    # (ensemble warmup may have swapped the instance)
                    self.model_instance.clear_file_specific_paths()
                    self.model_instance.output_dir = prev_output_dir
        elapsed = time.perf_counter() - start
        self.logger.info(f"Warmup separation compiled in {elapsed:.1f}s "
                         f"({seconds:.0f}s synthetic track)")
        return elapsed

    def _separate_file(self, audio_file_path: str, custom_output_names=None) -> List[str]:
        if self.chunk_duration is not None:
            chunker = AudioChunker(self.chunk_duration, self.logger)
            if chunker.should_chunk(audio_file_path):
                self.logger.info(
                    f"File exceeds chunk size {self.chunk_duration}s, using chunked processing")
                return self._process_with_chunking(audio_file_path, custom_output_names)

        self.logger.info(f"Starting separation process for audio_file_path: {audio_file_path}")
        from ..utils.profiling import device_trace

        start = time.perf_counter()
        with device_trace(self.trace_dir, self.logger):
            output_files = self.model_instance.separate(audio_file_path, custom_output_names)
        self.model_instance.clear_file_specific_paths()
        self.print_uvr_vip_message()
        elapsed = time.perf_counter() - start
        self.logger.info(
            f'Separation duration: '
            f'{time.strftime("%H:%M:%S", time.gmtime(int(elapsed)))}')
        try:
            info = audio_io.probe(audio_file_path)
            if info.frames > 0 and info.sample_rate > 0 and elapsed > 0:
                rtf = (info.frames / info.sample_rate) / elapsed
                self.logger.info(f"Real-time factor: {rtf:.1f}x")
        except Exception:
            pass
        return output_files

    def _process_with_chunking(self, audio_file_path: str, custom_output_names=None) -> List[str]:
        """Split → per-chunk separate → per-stem merge (ref: separator.py:1047-1156)."""
        temp_dir = tempfile.mkdtemp(prefix="audio-separator-chunks-")
        try:
            chunker = AudioChunker(self.chunk_duration, self.logger)
            chunk_paths = chunker.split_audio(audio_file_path, temp_dir)
            chunks_by_stem: Dict[str, List[str]] = {}

            for i, chunk_path in enumerate(chunk_paths):
                self.logger.info(f"Processing chunk {i + 1}/{len(chunk_paths)}: {chunk_path}")
                original_chunk_duration = self.chunk_duration
                original_output_dir = self.output_dir
                self.chunk_duration = None
                self.output_dir = temp_dir
                original_model_output_dir = None
                if self.model_instance:
                    original_model_output_dir = self.model_instance.output_dir
                    self.model_instance.output_dir = temp_dir
                try:
                    outputs = self._separate_file(chunk_path)
                    for stem_index, stem_path in enumerate(outputs):
                        filename = os.path.basename(stem_path)
                        match = re.search(r"_\(([^)]+)\)", filename)
                        # Positional fallback keys stay stable across chunks so
                        # unmatched outputs still merge per stem.
                        stem_name = match.group(1) if match else f"stem_{stem_index}"
                        abs_path = (stem_path if os.path.isabs(stem_path)
                                    else os.path.join(temp_dir, stem_path))
                        chunks_by_stem.setdefault(stem_name, []).append(abs_path)
                finally:
                    self.chunk_duration = original_chunk_duration
                    self.output_dir = original_output_dir
                    if self.model_instance:
                        self.model_instance.output_dir = original_model_output_dir

            base_name = os.path.splitext(os.path.basename(audio_file_path))[0]
            output_files = []
            for stem_name in sorted(chunks_by_stem):
                paths = chunks_by_stem[stem_name]
                if custom_output_names and stem_name in custom_output_names:
                    output_filename = custom_output_names[stem_name]
                else:
                    output_filename = f"{base_name}_({stem_name})"
                output_path = os.path.join(
                    self.output_dir or ".", f"{output_filename}.{self.output_format.lower()}")
                self.logger.info(f"Merging {len(paths)} chunks for stem: {stem_name}")
                chunker.merge_chunks(paths, output_path)
                output_files.append(output_path)
            return output_files
        finally:
            shutil.rmtree(temp_dir, ignore_errors=True)

    # --------------------------------------------------------------- ensemble

    def _separate_ensemble(self, audio_file_path, custom_output_names=None) -> List[str]:
        """Run each model, group stems by canonical name, ensemble, write
        (ref: separator.py:1242-1412)."""
        if isinstance(audio_file_path, str):
            audio_file_path = [audio_file_path]

        output_files: List[str] = []
        original_model_filename = self.model_filename
        original_model_filenames = list(self.model_filenames)

        for path in audio_file_path:
            self.logger.info(f"Ensemble processing for file: {path}")
            temp_dir = tempfile.mkdtemp(prefix="audio-separator-ensemble-")
            try:
                stems_by_type: Dict[str, List[str]] = {}
                original_output_dir = self.output_dir
                for model_filename in original_model_filenames:
                    self.logger.info(f"Processing with model: {model_filename}")
                    self.load_model(model_filename)
                    self.output_dir = temp_dir
                    if self.model_instance:
                        self.model_instance.output_dir = temp_dir
                    try:
                        model_stems = self._separate_file(path, None)
                        stem_names = []
                        for stem_path in model_stems:
                            match = re.search(r"_\(([^)]+)\)", os.path.basename(stem_path))
                            stem_names.append(match.group(1) if match else "Unknown")
                        has_vocal = any("vocal" in s.lower() for s in stem_names)
                        for stem_path, raw_name in zip(model_stems, stem_names):
                            lower = raw_name.lower()
                            if "vocal" in lower and "lead" not in lower and "backing" not in lower:
                                stem_name = "Vocals"
                            elif lower == "other" and len(stem_names) == 2 and has_vocal:
                                stem_name = "Instrumental"
                            elif lower in STEM_NAME_MAP:
                                stem_name = STEM_NAME_MAP[lower]
                            else:
                                stem_name = raw_name.title()
                            abs_path = (stem_path if os.path.isabs(stem_path)
                                        else os.path.join(temp_dir, stem_path))
                            stems_by_type.setdefault(stem_name, []).append(abs_path)
                    finally:
                        self.output_dir = original_output_dir

                ensembler = Ensembler(self.logger, self.ensemble_algorithm or "avg_wave",
                                      self.ensemble_weights)
                base_name = os.path.splitext(os.path.basename(path))[0]
                for stem_name, stem_paths in stems_by_type.items():
                    self.logger.info(f"Ensembling {len(stem_paths)} stems for type: {stem_name}")
                    # Output channel count = max over member stems (a mono
                    # member must not force a stereo ensemble down to mono
                    # just because it was loaded first).
                    waveforms, original_channels = [], 1
                    for sp in stem_paths:
                        wav, _sr = audio_io.load_audio(sp, sample_rate=self.sample_rate)
                        original_channels = max(original_channels, wav.shape[0])
                        if wav.shape[0] == 1:
                            wav = np.vstack([wav, wav])
                        waveforms.append(wav)
                    ensembled = ensembler.ensemble(waveforms)
                    if original_channels == 1 and ensembled.shape[0] > 1:
                        ensembled = ensembled[:1, :]

                    if custom_output_names and stem_name in custom_output_names:
                        output_filename = custom_output_names[stem_name]
                    elif self.ensemble_preset:
                        output_filename = f"{base_name}_({stem_name})_preset_{self.ensemble_preset}"
                    else:
                        slugs = []
                        for mf in original_model_filenames:
                            name = os.path.splitext(mf)[0]
                            for prefix in ("mel_band_roformer_", "melband_roformer_",
                                           "bs_roformer_", "model_bs_roformer_",
                                           "UVR-MDX-NET-", "UVR_MDXNET_"):
                                if name.startswith(prefix):
                                    name = name[len(prefix):]
                                    break
                            slugs.append(name[:12])
                        output_filename = f"{base_name}_({stem_name})_custom_ensemble_{'_'.join(slugs)}"

                    output_path = f"{output_filename}.{self.output_format.lower()}"
                    if self.model_instance:
                        self.model_instance.audio_file_path = path
                        self.model_instance.output_dir = self.output_dir
                        self.model_instance.write_audio(output_path, ensembled.T)
                        output_files.append(os.path.join(self.output_dir or ".", output_path))
                    else:
                        final_path = os.path.join(self.output_dir or ".", output_path)
                        audio_io.save_audio(final_path, ensembled, self.sample_rate,
                                            output_format=self.output_format.lower())
                        output_files.append(final_path)
            finally:
                self.model_filename = original_model_filename
                self.model_filenames = original_model_filenames
                self.model_instance = None
                shutil.rmtree(temp_dir, ignore_errors=True)
        return output_files

    # ---------------------------------------------------------------- presets

    def _load_ensemble_preset(self, preset_name: str) -> dict:
        presets = self.list_ensemble_presets()
        if preset_name not in presets:
            available = ", ".join(sorted(presets.keys()))
            raise ValueError(
                f"Unknown ensemble preset: '{preset_name}'. Available presets: {available}")
        preset = presets[preset_name]
        models = preset.get("models", [])
        if not isinstance(models, list) or len(models) < 2:
            raise ValueError(
                f"Ensemble preset '{preset_name}' must specify at least 2 models")
        algorithm = preset.get("algorithm", "avg_wave")
        if algorithm not in VALID_ENSEMBLE_ALGORITHMS:
            raise ValueError(
                f"Ensemble preset '{preset_name}' has unknown algorithm: '{algorithm}'")
        weights = preset.get("weights")
        if weights is not None and (not isinstance(weights, list) or len(weights) != len(models)):
            raise ValueError(
                f"Ensemble preset '{preset_name}' weights length must match models count")
        self.logger.info(
            f"Loaded ensemble preset '{preset_name}': {preset.get('name', preset_name)} — "
            f"{preset.get('description', '')}")
        return preset

    def list_ensemble_presets(self) -> dict:
        try:
            with resources.files("audio_separator_tpu.data").joinpath(
                    "ensemble_presets.json").open("r", encoding="utf-8") as f:
                data = json.load(f)
        except FileNotFoundError:
            return {}
        return data.get("presets", {})

    # ----------------------------------------------------------- model lists

    def get_simplified_model_list(self, filter_sort_by: Optional[str] = None):
        """Flat {filename: {Name, Type, Stems, SDR}} listing with optional
        sort/filter (ref: separator.py:1178-1240)."""
        model_files = self.list_supported_model_files()
        simplified = {}
        for model_type, models in model_files.items():
            for name, data in models.items():
                filename = data["filename"]
                scores = data.get("scores") or {}
                stems = data.get("stems") or []
                target_stem = data.get("target_stem")
                stems_with_scores, stem_sdr = [], {}
                for stem in stems:
                    stem_scores = scores.get(stem, {})
                    display = f"{stem}*" if stem == target_stem else stem
                    if isinstance(stem_scores, dict) and "SDR" in stem_scores:
                        sdr = round(stem_scores["SDR"], 1)
                        stems_with_scores.append(f"{display} ({sdr})")
                        stem_sdr[stem.lower()] = sdr
                    else:
                        stems_with_scores.append(display)
                        stem_sdr[stem.lower()] = None
                if not stems_with_scores:
                    stems_with_scores = ["Unknown"]
                    stem_sdr["unknown"] = None
                simplified[filename] = {
                    "Name": name, "Type": model_type,
                    "Stems": stems_with_scores, "SDR": stem_sdr,
                }

        if filter_sort_by:
            if filter_sort_by == "name":
                return dict(sorted(simplified.items(), key=lambda x: x[1]["Name"]))
            if filter_sort_by == "filename":
                return dict(sorted(simplified.items()))
            key = filter_sort_by.lower()
            filtered = {k: v for k, v in simplified.items() if key in v["SDR"]}

            def sort_key(item):
                sdr = item[1]["SDR"][key]
                return (0 if sdr is None else 1, sdr if sdr is not None else float("-inf"))

            return dict(sorted(filtered.items(), key=sort_key, reverse=True))
        return simplified
