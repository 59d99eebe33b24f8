"""Demucs v4 architecture separator.

Behaviour-parity re-design of the reference DemucsSeparator + apply_model
(ref: audio_separator/separator/architectures/demucs_separator.py:26-195,
uvr_lib_v5/demucs/apply.py:124-294): bag-of-models with per-source weights,
shift-trick TTA, split mode with triangular-weight overlap-add and centred
context padding — executed through the shared jitted demix engine.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.demucs_load import load_demucs_model_or_bag
from ..models.htdemucs import apply_hdemucs, apply_htdemucs
from ..ops.demix import overlap_add_demix
from ..separator.common import BaseSeparator

DEMUCS_2_SOURCE = ["drums", "bass", "other", "vocals"]  # unused, parity note
DEMUCS_4_SOURCE_MAPPER = {
    BaseSeparator.BASS_STEM: 0,
    BaseSeparator.DRUM_STEM: 1,
    BaseSeparator.OTHER_STEM: 2,
    BaseSeparator.VOCAL_STEM: 3,
}
DEMUCS_2_SOURCE_MAPPER = {
    BaseSeparator.INST_STEM: 0,
    BaseSeparator.VOCAL_STEM: 1,
}
DEMUCS_6_SOURCE_MAPPER = {
    BaseSeparator.BASS_STEM: 0,
    BaseSeparator.DRUM_STEM: 1,
    BaseSeparator.OTHER_STEM: 2,
    BaseSeparator.VOCAL_STEM: 3,
    BaseSeparator.GUITAR_STEM: 4,
    BaseSeparator.PIANO_STEM: 5,
}


class DemucsSeparator(BaseSeparator):
    def __init__(self, common_config: Dict, arch_config: Dict):
        super().__init__(config=common_config)
        self.segment_size = arch_config.get("segment_size", "Default")
        self.shifts = arch_config.get("shifts", 2)
        self.overlap = arch_config.get("overlap", 0.25)
        self.segments_enabled = arch_config.get("segments_enabled", True)
        # Batch 4 windows per scan step like the other architectures: htdemucs
        # per-chunk forward time is nearly flat in batch on the MXU, so fewer,
        # larger dispatches win (same rationale as bench.py's flagship B=4).
        self.batch_size = int(arch_config.get("batch_size", 4) or 4)
        self.compute_dtype = jnp.float32  # demucs is precision-sensitive
        self._models_cache = None  # (models_with_device_params, weights)

    # ------------------------------------------------------------------ model

    def _load_models(self):
        if self._models_cache is not None:
            return self._models_cache
        repo_dir = os.path.dirname(self.model_path)
        models, weights, segment = load_demucs_model_or_bag(self.model_path, repo_dir)
        # CLI segment override (ref: apply.demucs_segments:263-294)
        if self.segment_size != "Default":
            try:
                seg = int(self.segment_size)
                models = [(cfg.__class__(**{**cfg.__dict__, "segment": float(seg)}), p)
                          for cfg, p in models]
            except (TypeError, ValueError):
                pass
        elif segment is not None:
            models = [(cfg.__class__(**{**cfg.__dict__, "segment": float(segment)}), p)
                      for cfg, p in models]
        # Device-resident weights once per PROCESS (ops/fn_cache.py) — a bag
        # re-upload per separated file or per serving job costs seconds/track
        # at hundreds of MB of weights. Keyed per bag member index off the
        # yaml's identity (members are immutable checksum-named downloads, so
        # the yaml key is a sound proxy); the config-only overrides above
        # don't touch the weight trees.
        from ..ops.fn_cache import file_key, memoized_device_params

        base_key = ("demucs-params",) + file_key(self.model_path)
        models = [
            (cfg, memoized_device_params(base_key + (i,),
                                         lambda p=p: jax.device_put(p)))
            for i, (cfg, p) in enumerate(models)
        ]
        self._models_cache = (models, weights)
        return self._models_cache

    # --------------------------------------------------------------- separate

    def separate(self, audio_file_path: str, custom_output_names: Optional[Dict] = None):
        self.audio_file_path = audio_file_path
        self.audio_file_base = os.path.splitext(os.path.basename(audio_file_path))[0]

        mix = self.prepare_mix(audio_file_path)

        models, _ = self._load_models()
        n_sources = len(models[0][0].sources)
        source_map = {2: DEMUCS_2_SOURCE_MAPPER, 6: DEMUCS_6_SOURCE_MAPPER}.get(
            n_sources, DEMUCS_4_SOURCE_MAPPER)

        # output_single_stem: compute all sources on device but fetch only
        # the requested one (fetch_stems in the engine — 1/n_sources of the
        # D2H bytes). Falls back to fetching all when the name matches no
        # source (the skip below then writes nothing, as before).
        wanted = None
        if self.output_single_stem is not None:
            hits = tuple(idx for name, idx in source_map.items()
                         if name.lower() == self.output_single_stem.lower())
            if hits:
                wanted = hits

        source = self.demix_demucs(mix, wanted=wanted)

        output_files = []
        for stem_name, idx in source_map.items():
            if (self.output_single_stem is not None
                    and stem_name.lower() != self.output_single_stem.lower()):
                continue
            row = source[wanted.index(idx)] if wanted is not None else source[idx]
            path = self.get_stem_output_path(stem_name, custom_output_names)
            self.final_process(path, row.T, stem_name)
            output_files.append(path)
        return output_files

    # ------------------------------------------------------------------ demix

    def demix_demucs(self, mix: np.ndarray,
                     wanted: tuple | None = None) -> np.ndarray:
        """(ref: demucs_separator.py:162-195): standardize, bag apply with
        shifts+split, un-standardize, swap sources 0 and 1.

        ``wanted``: optional tuple of POST-swap source indices to compute the
        fetch for — only those rows cross the device→host link (the model
        still computes every source). Returns rows in ``wanted`` order; with
        ``wanted=None`` returns all sources in post-swap order as before."""
        models, weights = self._load_models()
        mix = np.asarray(mix, dtype=np.float32)
        ref_mean = float(mix.mean(axis=0).mean())
        ref_std = float(mix.mean(axis=0).std(ddof=1))
        norm = (mix - ref_mean) / (ref_std + 1e-20)

        n_sources = len(models[0][0].sources)
        if wanted is None:
            fetch = tuple(range(n_sources))
        else:
            # undo the final 0<->1 swap so `fetch` is in model-output order
            fetch = tuple(1 if i == 0 else 0 if i == 1 else i for i in wanted)
        estimates = np.zeros((len(fetch), 2, mix.shape[-1]), dtype=np.float32)
        totals = [0.0] * len(fetch)
        rng = np.random.default_rng(0)
        for (cfg, params), weight in zip(models, weights):
            out = self._apply_one(cfg, params, norm, rng, fetch=fetch)
            for j, k in enumerate(fetch):
                out[j] *= weight[k]
                totals[j] += weight[k]
            estimates += out
        for j in range(len(fetch)):
            estimates[j] /= totals[j]

        sources = estimates * ref_std + ref_mean
        if wanted is None:
            sources[[0, 1]] = sources[[1, 0]]
        return sources

    def _apply_one(self, cfg, params, mix: np.ndarray, rng,
                   fetch: tuple | None = None) -> np.ndarray:
        """apply_model for one sub-model: shift trick over split overlap-add
        (ref: apply.py:200-260). ``fetch`` restricts which model-output
        source rows are fetched from device (engine fetch_stems)."""
        length = mix.shape[-1]
        if fetch is None:
            fetch = tuple(range(len(cfg.sources)))
        if not self.shifts:
            return self._apply_split(cfg, params, mix, fetch=fetch)
        max_shift = int(0.5 * cfg.samplerate)
        offsets = [int(rng.integers(0, max_shift + 1))
                   for _ in range(self.shifts)]
        if cfg.use_train_segment and self.segments_enabled:
            return self._apply_shifts_batched(cfg, params, mix, offsets,
                                              max_shift, fetch=fetch)
        # v3 exact-length path / direct eval: chunk shapes differ per shift
        # position, so shifts stay sequential passes there.
        padded = np.pad(mix, ((0, 0), (max_shift, max_shift)))
        out = np.zeros((len(fetch), 2, length), dtype=np.float32)
        for offset in offsets:
            shifted = padded[:, offset : offset + length + max_shift]
            shifted_out = self._apply_split(cfg, params, shifted, fetch=fetch)
            out += shifted_out[..., max_shift - offset :][..., :length]
        return out / self.shifts

    def _train_segment_plan(self, cfg, track_len: int):
        """Window plan for the use_train_segment split (ref: apply.py:215-250):
        triangular transition weights, centred context for tail chunks
        (TensorChunk.padded semantics), per-position weight rows and the
        overlap divider — all relative to a buffer with ``pad_lead`` leading
        samples and room for the widest centred tail."""
        segment = cfg.training_length
        stride = int((1 - self.overlap) * segment)
        # triangular transition weight (ref: apply.py:226-230)
        tri = np.concatenate([np.arange(1, segment // 2 + 1),
                              np.arange(segment - segment // 2, 0, -1)]
                             ).astype(np.float32)
        tri = tri / tri.max()
        pad_lead = segment  # room for centred context of tail chunks
        span = pad_lead + track_len + pad_lead + segment
        positions, rows = [], []
        divider = np.zeros(span, dtype=np.float32)
        for offset in range(0, track_len, stride):
            chunk_len = min(segment, track_len - offset)
            delta = segment - chunk_len
            start = offset - delta // 2  # centred context (TensorChunk.padded)
            row = np.zeros(segment, dtype=np.float32)
            row[delta // 2 : delta // 2 + chunk_len] = tri[:chunk_len]
            positions.append(pad_lead + start)
            rows.append(row)
            divider[pad_lead + offset : pad_lead + offset + chunk_len] += tri[:chunk_len]
        return (segment, stride, pad_lead, span,
                np.asarray(positions, dtype=np.int32), np.stack(rows),
                np.maximum(divider, 1e-10))

    def _apply_shifts_batched(self, cfg, params, mix: np.ndarray,
                              offsets, max_shift: int,
                              fetch: tuple | None = None) -> np.ndarray:
        """Shift-trick TTA as ONE engine call (SURVEY §2.8: shifts become a
        batch dim): each shift's windows gather from and accumulate into its
        own disjoint region of a single concatenated buffer, so all
        shifts × windows stream through one scanned device program — shared
        compile shape, full window batching, transfer pipelining across the
        whole set — instead of the reference's sequential per-shift passes
        (ref: apply.py:202-214). Per-shift overlap normalisation is exact:
        the regions are disjoint, so the concatenated divider normalises
        each shift by its own window sum before the host aligns + averages."""
        length = mix.shape[-1]
        n_sources = len(cfg.sources)
        if fetch is None:
            fetch = tuple(range(n_sources))
        track_len = length + max_shift  # every shift sees this many samples
        (segment, stride, pad_lead, span, rel_pos, rows,
         div_one) = self._train_segment_plan(cfg, track_len)
        padded = np.pad(mix, ((0, 0), (max_shift, max_shift)))
        n_shifts = len(offsets)
        buf = np.zeros((2, span * n_shifts), dtype=np.float32)
        divider = np.ones(span * n_shifts, dtype=np.float32)
        positions = np.concatenate(
            [rel_pos + s * span for s in range(n_shifts)])
        all_rows = np.tile(rows, (n_shifts, 1))
        for s, offset in enumerate(offsets):
            buf[:, s * span + pad_lead : s * span + pad_lead + track_len] = \
                padded[:, offset : offset + track_len]
            divider[s * span : (s + 1) * span] = div_one

        # Shift alignment + average ON DEVICE (engine post_device_fn): the
        # fetch shrinks from (S, 2, span*n_shifts) — all shifts' buffers,
        # pads included — to (S, 2, length), ~2.4x fewer D2H bytes at
        # shifts=2. Profiled on chip: the htdemucs pass is link-bound (model
        # forward ~197x realtime vs ~7.5x e2e before this), so the fetch IS
        # the pass. With the explicit divider the engine runs this through
        # the pipelined DEVICE drain (segment uploads overlap compute; the
        # r5 probe trail at 240 s: 22.6 s through the old unpipelined scan
        # vs 16.6 s drained — SHIFT_PROBE.json len240s_b4_predrain /
        # _postdrain). Offsets come from a per-call seeded rng, so they are
        # stable across calls — the memo key (and the one compile) holds.
        # The key is per-track (exact lengths), so it lives in the dedicated
        # post-fn LRU: in the shared model_fn registry a varied-length batch
        # folder would evict hot model identities and force scan recompiles.
        from ..ops.fn_cache import memoized_post_fn

        key = ("demucs-shift-post", span, pad_lead, track_len, length,
               max_shift, tuple(offsets))

        def _build_post():
            def post(acc):  # (S, 2, span*n_shifts) normalized stems
                parts = []
                for s, offset in enumerate(offsets):
                    start = s * span + pad_lead + (max_shift - offset)
                    parts.append(jax.lax.dynamic_slice_in_dim(
                        acc, start, length, axis=-1))
                return sum(parts) / n_shifts

            return post

        out = overlap_add_demix(
            self._model_fn(cfg), buf, segment, stride, all_rows,
            num_stems=n_sources, batch_size=self.batch_size,
            positions=positions.astype(np.int32), divider=divider,
            model_params=params, mesh=getattr(self, "mesh", None),
            fetch_stems=fetch if len(fetch) < n_sources else None,
            post_device_fn=memoized_post_fn(key, _build_post))
        return np.asarray(out, dtype=np.float32)

    def _model_fn(self, cfg):
        """Process-level memo (ops/fn_cache.py) keyed on the frozen sub-model
        config + dtype: the demix scan jit-keys on model_fn's identity, so
        a fresh closure per call (per file, per bag model, per shift — or
        per serving job's fresh Separator) would recompile each time."""
        from ..ops.fn_cache import memoized_model_fn

        apply = apply_hdemucs if cfg.arch == "hdemucs" else apply_htdemucs
        compute_dtype = self.compute_dtype

        def _build():
            def model_fn(p, chunks):  # (B, 2, training_len) -> (B, S, 2, training_len)
                return apply(p, cfg, chunks, compute_dtype=compute_dtype)

            return model_fn

        return memoized_model_fn(
            ("demucs", cfg, jnp.dtype(compute_dtype).name), _build)

    def _apply_split(self, cfg, params, mix: np.ndarray,
                     fetch: tuple | None = None) -> np.ndarray:
        length = mix.shape[-1]
        n_sources = len(cfg.sources)
        if fetch is None:
            fetch = tuple(range(n_sources))
        partial = len(fetch) < n_sources
        training_len = cfg.training_length
        apply = apply_hdemucs if cfg.arch == "hdemucs" else apply_htdemucs
        model_fn = self._model_fn(cfg)

        if not self.segments_enabled:
            # direct eval on the full (padded) track; slice the source axis on
            # device so only the fetched rows cross D2H
            target = max(length, training_len) if cfg.use_train_segment else length
            delta = target - length
            padded = np.pad(mix, ((0, 0), (delta // 2, delta - delta // 2)))
            out_dev = model_fn(params, jnp.asarray(padded[None]))[0]
            out = np.asarray(out_dev[jnp.asarray(fetch, dtype=jnp.int32)]
                             if partial else out_dev)
            start = (out.shape[-1] - length) // 2
            return out[..., start : start + length]

        segment = training_len
        stride = int((1 - self.overlap) * segment)
        offsets = list(range(0, length, stride))

        if not cfg.use_train_segment:
            # v3 semantics: the model runs on each chunk at its *exact* length
            # (no valid_length padding, apply.py:252-260). Full windows batch
            # through the engine; the short tail gets one direct call.
            tri_full = np.concatenate([np.arange(1, segment // 2 + 1),
                                       np.arange(segment - segment // 2, 0, -1)]
                                      ).astype(np.float32)
            tri_full /= tri_full.max()
            out = np.zeros((len(fetch), 2, length), np.float32)
            sum_w = np.zeros(length, np.float32)
            full = [o for o in offsets if o + segment <= length]
            if full:
                pad_len = full[-1] + segment
                res = overlap_add_demix(
                    model_fn, mix[:, :pad_len], segment, stride, tri_full,
                    num_stems=n_sources, batch_size=self.batch_size,
                    positions=np.asarray(full, dtype=np.int32),
                    model_params=params, mesh=getattr(self, 'mesh', None),
                    fetch_stems=fetch if partial else None)
                # engine divides by its own divider; rebuild weighted sums
                div = np.zeros(pad_len, np.float32)
                for o in full:
                    div[o : o + segment] += tri_full
                out[..., :pad_len] += res * np.maximum(div, 1e-10)
                sum_w[:pad_len] += div
            for o in offsets:
                if o + segment <= length:
                    continue
                chunk = np.ascontiguousarray(mix[:, o:])
                chunk_len = chunk.shape[-1]
                est_dev = apply(params, cfg, jnp.asarray(chunk[None]),
                                compute_dtype=self.compute_dtype)[0]
                est = np.asarray(est_dev[jnp.asarray(fetch, dtype=jnp.int32)]
                                 if partial else est_dev)
                out[..., o:] += tri_full[:chunk_len] * est[..., :chunk_len]
                sum_w[o:] += tri_full[:chunk_len]
            return out / np.maximum(sum_w, 1e-10)

        (segment, stride, pad_lead, span, positions, rows,
         divider) = self._train_segment_plan(cfg, length)
        buf = np.zeros((2, span), dtype=np.float32)
        buf[:, pad_lead : pad_lead + length] = mix

        out = overlap_add_demix(
            model_fn, buf, segment, stride, rows,
            num_stems=n_sources, batch_size=self.batch_size,
            positions=positions, divider=divider,
            model_params=params, mesh=getattr(self, 'mesh', None),
            fetch_stems=fetch if partial else None,
        )
        return out[..., pad_lead : pad_lead + length]
