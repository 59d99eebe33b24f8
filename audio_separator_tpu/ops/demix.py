"""Windowed overlap-add demixing engine — the shared hot loop.

The reference implements four per-architecture Python chunk loops that bounce
every window through host memory (ref: mdx_separator.py:348-412,
mdxc_separator.py:320-343, vr_separator.py:295-366, demucs/apply.py:215-250).
Here one engine runs the whole track as a single jitted device program:

  gather window batch → model → window-weight → accumulate (scan)

* Window positions are *static* per (track-length, chunk, step) — so XLA sees
  a fixed trip-count ``lax.scan`` with only dynamic-slice adds (no scatters).
* Per-position window rows support the reference's exact tail semantics:
  MDXC clamps the tail start (duplicated trailing positions included), MDX
  windows partial tails with ``np.hanning(actual_len)`` zero-extended.
* Host↔device traffic is minimised for tethered TPUs: when every position
  shares one window only the ``(chunk,)`` vector crosses the wire (plus an
  ``(N,)`` validity row for batch padding), and the overlap divider is
  accumulated **on device** inside the same scan instead of being shipped as
  a track-length float buffer.
* Track length is bucketed by the caller to bound recompiles; chunk batches
  are padded with zero-weight dummy windows.
"""

from __future__ import annotations

import functools
import threading
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def bucket_up(n: int, quantum: int = 1) -> int:
    """Round ``n`` up into a coarse bucket (in units of ``quantum``).

    Schedule: 1..4 exact, then {6, 8, 12, 16, 24, 32, ...} — successive
    +50%/+33% steps, so wasted work is bounded by ~1/3 while the number of
    distinct compiled program shapes stays logarithmic in track length.
    """
    units = -(-n // quantum)
    if units <= 4:
        return units * quantum
    b = 4
    while b < units:  # 6, 8, 12, 16, 24, 32, ... ({4,6} x powers of two)
        b = b * 3 // 2 if (b & (b - 1)) == 0 else b * 4 // 3
    return b * quantum


def window_positions(total: int, chunk: int, step: int) -> np.ndarray:
    """Reference-compatible clamped window start positions
    (mdxc_separator.py:320-341): every ``i`` in range(0, total, step), clamped
    to ``total - chunk`` when the window would overrun (duplicates preserved)."""
    if total <= chunk:
        return np.zeros(1, dtype=np.int32)
    pos = []
    for i in range(0, total, step):
        pos.append(i if i + chunk <= total else total - chunk)
    return np.asarray(pos, dtype=np.int32)


@functools.partial(
    jax.jit,
    static_argnames=("model_fn", "chunk", "batch_size", "num_stems",
                     "out_channels", "quantized_transfer", "has_divider",
                     "normalize", "mesh", "data_axis", "fetch_stems",
                     "post_fn"),
)
def _demix_scan(
    model_fn: Callable,
    model_params,  # pytree threaded to model_fn as a traced argument
    mix: jnp.ndarray,  # (C, T_buf) f32 — or int16/int8 with mix_inv_scale set
    mix_inv_scale: jnp.ndarray,  # () f32 dequant factor (1.0 for f32 mix)
    positions: jnp.ndarray,  # (N,) int32, N % batch_size == 0
    windows: jnp.ndarray,  # (N, chunk) dense rows OR (chunk,) shared window
    row_scale: jnp.ndarray,  # (N,) per-row validity/weight (shared-window path)
    divider: jnp.ndarray,  # (T_buf,) host divider, or (1,) dummy
    chunk: int,
    batch_size: int,
    num_stems: int,
    out_channels: int,
    quantized_transfer: bool | str,
    has_divider: bool,
    normalize: bool = True,
    mesh=None,
    data_axis: str = "data",
    fetch_stems: tuple | None = None,
    post_fn: Callable | None = None,
):
    c, t_buf = mix.shape
    n = positions.shape[0]
    nb = n // batch_size
    shared_window = windows.ndim == 1
    quantized_mix = mix.dtype in (jnp.int16, jnp.int8)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        batch_sharding = NamedSharding(mesh, PartitionSpec(data_axis))

    def gather_one(pos):
        part = jax.lax.dynamic_slice(mix, (0, pos), (c, chunk))
        if quantized_mix:
            part = part.astype(jnp.float32) * mix_inv_scale
        return part

    def body(carry, batch):
        acc, wsum = carry
        if shared_window:
            pos_b, scale_b = batch
            win_b = windows[None, :] * scale_b[:, None]
        else:
            pos_b, win_b = batch
        chunks = jax.vmap(gather_one)(pos_b)  # (B, C, chunk)
        if mesh is not None:
            # Chunk-batch data parallelism: each scan step's window batch
            # shards over the mesh "data" axis; XLA SPMD partitions the model
            # forward and inserts the gathers for the shared accumulator.
            chunks = jax.lax.with_sharding_constraint(chunks, batch_sharding)
        out = (model_fn(model_params, chunks) if model_params is not None
               else model_fn(chunks))  # (B, S, C, chunk)
        out = out.astype(jnp.float32) * win_b[:, None, None, :]
        for i in range(batch_size):
            sl = jax.lax.dynamic_slice(
                acc, (0, 0, pos_b[i]), (num_stems, out_channels, chunk)
            )
            acc = jax.lax.dynamic_update_slice(acc, sl + out[i], (0, 0, pos_b[i]))
            if normalize and not has_divider:
                ws = jax.lax.dynamic_slice(wsum, (pos_b[i],), (chunk,))
                wsum = jax.lax.dynamic_update_slice(wsum, ws + win_b[i], (pos_b[i],))
        return (acc, wsum), None

    track_wsum = normalize and not has_divider
    acc0 = jnp.zeros((num_stems, out_channels, t_buf), dtype=jnp.float32)
    wsum0 = jnp.zeros((t_buf if track_wsum else 1,), dtype=jnp.float32)
    xs = ((positions.reshape(nb, batch_size), row_scale.reshape(nb, batch_size))
          if shared_window
          else (positions.reshape(nb, batch_size),
                windows.reshape(nb, batch_size, -1)))
    (acc, wsum), _ = jax.lax.scan(body, (acc0, wsum0), xs)
    if normalize:
        acc = acc / (divider if has_divider else jnp.maximum(wsum, 1e-10))
    if fetch_stems is not None:
        # Device-side stem selection: only the requested stems cross D2H
        # (output_single_stem on a multi-stem model — e.g. 1/4 the fetch
        # bytes for a 4-stem htdemucs). Static tuple → fixed output shape.
        acc = acc[jnp.asarray(fetch_stems, dtype=jnp.int32)]
    if post_fn is not None:
        # Device-side post-combine BEFORE the transfer: e.g. the Demucs
        # shift-trick alignment + average collapses an n_shifts-wide
        # accumulator to one track's worth of samples, shrinking D2H by
        # ~2.4x for shifts=2 (the measured htdemucs bottleneck).
        acc = post_fn(acc)
    return _quantize_fetch(acc, quantized_transfer)


def _quantize_fetch(acc: jnp.ndarray, quantized_transfer: bool | str):
    """Device-side quantisation shrinks the device→host transfer; the scale
    restores amplitude on host. int16 (the `True` default) is ~90 dB SNR —
    far below model noise. "int8" halves D2H again at ~48 dB SNR vs the
    peak: still ≪ separation error (SDR impact < 1e-3 dB), opt-in for
    bandwidth-starved tethered links. Returns ``(payload, scale)``."""
    if not quantized_transfer:
        return acc, jnp.float32(1.0)
    from .stft import _QSCALE  # single source for the quantiser constants

    peak = jnp.maximum(jnp.max(jnp.abs(acc)), 1e-9)
    if quantized_transfer == "int8":
        scale = _QSCALE["int8"] / peak
        return jnp.round(acc * scale).astype(jnp.int8), scale
    scale = _QSCALE["int16"] / peak
    return jnp.round(acc * scale).astype(jnp.int16), scale


def _quantize_upload(mix_buf: np.ndarray, quantized_upload: bool | str):
    """Host-side mix quantisation for the H2D upload.

    ``True``/``"int16"`` ships scaled int16 (half the float bytes, ~90 dB
    SNR); ``"int8"`` ships scaled int8 (quarter the bytes, ~48 dB SNR vs
    peak — opt-in: unlike the stem *fetch*, this quantises the model's
    input, so keep it for bandwidth-starved links where the measured SDR
    impact (quant noise ≫30 dB below separation error) is acceptable).
    Returns ``(mix_dev, inv_scale)``; the scan dequantises on device.
    """
    if not quantized_upload:
        return mix_buf, np.float32(1.0)
    from .stft import _QSCALE  # single source for the quantiser constants

    peak = max(float(np.max(np.abs(mix_buf))), 1e-9)
    if quantized_upload == "int8":
        up_scale = _QSCALE["int8"] / peak
        return np.round(mix_buf * up_scale).astype(np.int8), np.float32(1.0 / up_scale)
    up_scale = _QSCALE["int16"] / peak
    return np.round(mix_buf * up_scale).astype(np.int16), np.float32(1.0 / up_scale)


def overlap_add_demix(
    model_fn: Callable,
    mix: np.ndarray,
    chunk: int,
    step: int,
    window: np.ndarray,
    num_stems: int,
    batch_size: int = 1,
    positions: np.ndarray | None = None,
    divider: np.ndarray | None = None,
    quantized_transfer: bool | str | None = None,
    model_params=None,
    mesh=None,
    data_axis: str = "data",
    bucket: bool = True,
    pipeline_segments: int | None = None,
    quantized_upload: bool | str | None = None,
    fetch_stems: tuple | None = None,
    mix_token=None,
    post_device_fn=None,
) -> np.ndarray:
    """Demix ``mix (C, T)`` → ``(num_stems, C, T)``.

    ``fetch_stems``: optional tuple of stem indices to bring back to host —
    the model still computes all ``num_stems``, but only the selected rows
    cross the device→host link (the scarce resource on tethered TPUs). The
    result's stem axis has ``len(fetch_stems)`` rows in the given order.
    Used by output_single_stem on multi-stem models.

    ``model_fn``: jax-traceable ``(B, C, chunk) → (B, num_stems, C, chunk)``,
    or ``(model_params, chunks) → …`` when ``model_params`` is given.
    ``window``: either ``(chunk,)`` shared weights (cheapest: only this vector
    crosses host→device and the overlap divider is accumulated on device) or
    ``(N, chunk)`` dense per-position rows for exact tail semantics.
    ``positions`` overrides the default clamped list. ``divider`` overrides
    the device-accumulated weight normaliser. ``quantized_transfer`` fetches
    stems as scaled int16 (``True``: half the device→host bytes; ~90 dB SNR,
    negligible next to model noise) or scaled int8 (``"int8"``: quarter the
    bytes, ~48 dB SNR vs peak — still far below separation error; opt-in for
    bandwidth-starved tethered links).

    ``mesh``: optional ``jax.sharding.Mesh`` for multi-chip execution — each
    scan step's window batch shards over ``data_axis`` (chunk-batch data
    parallelism, SURVEY §2.8); compose with TP-sharded ``model_params`` (see
    ``parallel.mesh.shard_roformer_params``) and XLA SPMD inserts the
    collectives. ``batch_size`` is rounded up to the axis extent.

    ``pipeline_segments > 1`` splits the window list into K contiguous
    same-shaped segments and dispatches one scan per segment *asynchronously*,
    so segment k+1's host→device upload and segment k-1's device→host fetch
    overlap segment k's compute (JAX dispatch is async; the combine +
    overlap normalisation happens on host from unnormalised accumulators and
    a host-computed weight divider). On bandwidth-starved links the transfer
    time hides almost entirely behind compute. ``quantized_upload`` ships the
    mix as scaled int16 (``True``: half the host→device bytes; dequantised on
    device inside the scan, ~90 dB SNR) or scaled int8 (``"int8"``: quarter
    the bytes, ~48 dB SNR — quantises the model's *input*, so opt-in for
    bandwidth-starved links; ``AUDSEP_LINK_QUANT=int8`` deliberately keeps
    the upload at int16 and only drops the fetch to int8).

    ``mix_token``: opaque hashable identifying the mix's content. When a
    separation runs the SAME mix through the engine more than once (MDX
    match-mix second pass, denoise's paired run, ensemble members sharing a
    file), passing the same token lets the engine reuse the already-uploaded
    device-resident mix segments instead of re-crossing the H2D link. The
    token must change whenever the mix bytes change (e.g. derive it from the
    audio path + any preprocessing parameters). ``None`` (default) disables
    reuse.

    ``post_device_fn``: optional jit-traceable ``(stems_device) -> array``
    applied ON DEVICE after normalisation (and ``fetch_stems`` selection),
    before quantisation/transfer — for combines that shrink the D2H payload
    (e.g. the Demucs shift-trick alignment+average, which collapses an
    n_shifts-wide accumulator to one track). Pass a process-stable function
    object (memoize it): the compiled scan keys on its identity. With an
    explicit ``divider`` on a single device this composes with segment
    pipelining via the device drain (per-segment accumulators stay in HBM,
    combine + normalise + post + quantise run as one final device program);
    the sharded / device-wsum variants fall back to the single whole-buffer
    scan, whose shape the post fn owns.

    Always pass the weight pytree via ``model_params`` rather than closing
    over device arrays: closed-over arrays are baked into the jaxpr as
    *constants*, which re-ships the full weight set inside the serialized
    HLO on every compile (hundreds of MB for the flagship models — minutes
    to hours on a tethered TPU) instead of referencing the copy already
    resident in HBM.
    """
    c, total = mix.shape
    if positions is None:
        if total <= chunk:
            positions = np.zeros(1, dtype=np.int32)
        else:
            positions = window_positions(total, chunk, step)
    positions = np.asarray(positions, dtype=np.int32)
    n = len(positions)

    window = np.asarray(window, dtype=np.float32)
    shared_window = window.ndim == 1
    if not shared_window:
        assert window.shape == (n, chunk)

    if quantized_transfer is None or quantized_upload is None:
        # Deployment-wide link policy for callers that don't choose:
        # AUDSEP_LINK_QUANT = off (default) | int16 | int8 (parsed once, in
        # ops/stft.link_quant_mode). Lets tethered / bandwidth-starved hosts
        # get the quantised-transfer win on every production separation
        # without threading a flag through every architecture. Explicit
        # arguments (e.g. bench A/Bs) are unaffected. int8 deliberately
        # keeps the *upload* at int16: the upload quantises the model's
        # input, the fetch only its output.
        from .stft import link_quant_mode

        lq = link_quant_mode()
        if quantized_transfer is None:
            quantized_transfer = {"int16": True, "int8": "int8"}.get(lq, False)
        if quantized_upload is None:
            quantized_upload = lq in ("int16", "int8")

    if pipeline_segments is None:
        # Auto: overlap transfers with compute once the track is long enough
        # for each segment to hold >= 2 window batches. AUDSEP_PIPELINE
        # overrides (1 disables).
        import os

        env = os.environ.get("AUDSEP_PIPELINE")
        try:
            cap = int(env) if env else 8
        except ValueError:
            # A config typo ("off", "auto", "2.5") must not crash every
            # separation — warn and fall back to the default depth.
            import logging

            logging.getLogger(__name__).warning(
                f"ignoring non-integer AUDSEP_PIPELINE={env!r}; using 8")
            cap = 8
        pipeline_segments = _auto_segments(n, batch_size, cap, bucket)
    if mesh is not None:
        # Round the per-step batch up to the data-axis extent so every device
        # holds at least one window per step.
        batch_size = -(-batch_size // mesh.shape[data_axis]) * mesh.shape[data_axis]
    if post_device_fn is not None and (mesh is not None or divider is None):
        # The pipelined device-drain (below) covers the divider-normalised
        # single-device case; the sharded / device-wsum variants still run
        # the whole-buffer scan so the post fn sees one accumulator.
        pipeline_segments = 1
    if pipeline_segments > 1 and n >= 2 * batch_size:
        return _pipelined_demix(
            model_fn, mix, chunk, window, shared_window, positions, divider,
            num_stems, batch_size, quantized_transfer, quantized_upload,
            model_params, pipeline_segments, bucket, mesh, data_axis,
            fetch_stems=fetch_stems, mix_token=mix_token,
            post_device_fn=post_device_fn)

    # Device buffer must fit every gathered/accumulated window.
    t_buf = max(total, int(positions.max()) + chunk)
    if bucket:
        # Quantise the program shape so nearby track lengths reuse one
        # compiled executable (XLA compiles are minutes on a tethered TPU).
        # Exactness is preserved: extra buffer is cropped, extra window rows
        # carry zero weight.
        t_buf = bucket_up(t_buf, chunk)
    mix_buf = np.zeros((c, t_buf), dtype=np.float32)
    mix_buf[:, :total] = mix

    has_divider = divider is not None
    if has_divider:
        if len(divider) < t_buf:
            divider = np.concatenate(
                [divider, np.ones(t_buf - len(divider), np.float32)])
        divider = divider[:t_buf]

    n_pad = (bucket_up(n, batch_size) if bucket
             else -(-n // batch_size) * batch_size)
    positions_padded = np.zeros(n_pad, dtype=np.int32)
    positions_padded[:n] = positions
    row_scale = np.zeros(n_pad, dtype=np.float32)
    row_scale[:n] = 1.0
    if shared_window:
        windows_dev = window
    else:
        windows_dev = np.zeros((n_pad, chunk), dtype=np.float32)
        windows_dev[:n] = window

    mix_seg_cache = _mix_segments_for_token(mix_token)
    up_mode = ("int8" if quantized_upload == "int8"
               else "int16" if quantized_upload else "f32")
    ck = (0, t_buf, up_mode)
    cached = mix_seg_cache.get(ck) if mix_seg_cache is not None else None
    if cached is not None:
        mix_dev, inv_scale = cached
    else:
        mix_q, inv_scale_np = _quantize_upload(mix_buf, quantized_upload)
        mix_dev = jnp.asarray(mix_q)
        inv_scale = jnp.asarray(inv_scale_np)
        if mix_seg_cache is not None:
            mix_seg_cache[ck] = (mix_dev, inv_scale)

    acc, scale = _demix_scan(
        model_fn,
        model_params,
        mix_dev,
        inv_scale,
        jnp.asarray(positions_padded),
        jnp.asarray(windows_dev),
        jnp.asarray(row_scale),
        jnp.asarray(np.maximum(divider, 1e-10), dtype=jnp.float32)
        if has_divider else jnp.zeros((1,), jnp.float32),
        chunk,
        batch_size,
        num_stems,
        c,
        quantized_transfer,
        has_divider,
        normalize=True,
        mesh=mesh,
        data_axis=data_axis,
        fetch_stems=fetch_stems,
        post_fn=post_device_fn,
    )
    # Crop ON DEVICE before fetching: t_buf is bucket-padded (up to ~1/3
    # beyond the track), and D2H bytes are the scarce resource on tethered
    # links — the slice is one cheap device op, the padding never crosses.
    # (post_device_fn owns the shape of its own output.)
    if post_device_fn is None:
        acc = acc[..., :total]
    if quantized_transfer:
        return np.asarray(acc).astype(np.float32) / float(scale)
    return np.array(np.asarray(acc))


@functools.partial(
    jax.jit,
    static_argnames=("model_fn", "window", "roi", "mesh", "data_axis"),
)
def _tile_batch(
    model_fn: Callable,
    model_params,
    spec: jnp.ndarray,  # (C, F, T_pad) f32 padded magnitudes, device-resident
    idx_b: jnp.ndarray,  # (B,) int32 tile indices
    window: int,
    roi: int,
    mesh=None,
    data_axis: str = "data",
):
    """One batch of non-overlapping mask tiles, gathered on device.

    Tile ``i`` reads ``spec[:, :, i*roi : i*roi + window]`` (tiles overlap by
    ``window - roi`` on input) and the model returns the centre ``roi`` frames
    of its mask. The spec stays device-resident across batches and JAX
    dispatch is async, so unlike the reference's host patch loop
    (ref: vr_separator.py:295-366) there is no blocking host round-trip per
    batch — all batches are enqueued back to back and fetched once at the
    end. (Deliberately NOT a ``lax.scan`` over batches: wrapping the cascade
    net in a scan body blew XLA:CPU compile time up by >10x in the test
    environment for zero dispatch benefit once dispatch is async.)
    """
    c, f, _ = spec.shape

    def gather_one(i):
        return jax.lax.dynamic_slice(spec, (0, 0, i * roi), (c, f, window))

    chunks = jax.vmap(gather_one)(idx_b)  # (B, C, F, window)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        chunks = jax.lax.with_sharding_constraint(
            chunks, NamedSharding(mesh, PartitionSpec(data_axis)))
    out = (model_fn(model_params, chunks) if model_params is not None
           else model_fn(chunks))  # (B, out_c, out_f, roi)
    return out.astype(jnp.float32)


def tiled_mask_predict(
    model_fn: Callable,
    spec: np.ndarray,
    window: int,
    offset: int,
    batch_size: int,
    out_c: int,
    out_f: int,
    model_params=None,
    mesh=None,
    data_axis: str = "data",
    bucket: bool = True,
    quantized_transfer: bool | str | None = None,
) -> np.ndarray:
    """Run tiled mask inference over ``spec (C, F, T_pad)`` → mask
    ``(out_c, out_f, n_tiles*roi)`` where ``roi = window - 2*offset`` and
    ``n_tiles = (T_pad - 2*offset) // roi``.

    ``quantized_transfer`` mirrors ``overlap_add_demix``: ``None`` follows the
    deployment-wide ``AUDSEP_LINK_QUANT`` policy, an explicit value overrides
    it for this call (A/B and parity runs must be able to opt back to exact
    transfers in a process with the env var set). The mode is resolved ONCE
    and applied to both directions — the upload (the model's input) never
    drops below int16.

    The tile count is bucketed (``bucket_up``) so nearby track lengths (and a
    TTA pass's half-window shift) reuse one compiled program; dummy tiles
    read zero-padded input and land in cropped-away output tiles. The spec
    buffer is shaped by the *bucketed* count only — the program shape must
    not depend on the raw track length."""
    c, f, t = spec.shape
    roi = window - 2 * offset
    n = (t - 2 * offset) // roi
    if mesh is not None:
        batch_size = -(-batch_size // mesh.shape[data_axis]) * mesh.shape[data_axis]
    n_pad = (bucket_up(n, batch_size) if bucket
             else -(-n // batch_size) * batch_size)
    t_need = (n_pad - 1) * roi + window
    spec_buf = np.zeros((c, f, t_need), dtype=np.float32)
    spec_buf[:, :, : min(t, t_need)] = spec[:, :, : min(t, t_need)]

    from .stft import fetch_real, link_quant_mode, put_real

    # One upload shared by every batch. The mode is resolved ONCE for both
    # directions (the fetch loop must not re-read a mid-run env change).
    # Same policy as overlap_add_demix: the upload is the MODEL'S INPUT, so
    # int8 mode still ships it at int16 (only the mask fetch drops to int8)
    # — magnitudes are bounded after the caller's /max normalisation.
    if quantized_transfer is None:
        lq = link_quant_mode()
    elif quantized_transfer is True:
        lq = "int16"
    else:
        lq = quantized_transfer or ""
    spec_dev = put_real(spec_buf, quant="int16" if lq == "int8" else lq)
    tile_idx = np.arange(n_pad, dtype=np.int32)
    handles = [
        _tile_batch(model_fn, model_params, spec_dev,
                    jnp.asarray(tile_idx[i : i + batch_size]),
                    window, roi, mesh=mesh, data_axis=data_axis)
        # Batches made entirely of bucket-padding dummy tiles (i >= n) are
        # cropped away below — skip their dispatch and D2H outright; the
        # program shape (and so the compile cache) is per-batch and unchanged.
        for i in range(0, n_pad, batch_size) if i < n
    ]  # async: all batches in flight before the first fetch blocks
    mask = np.concatenate(
        [fetch_real(h, quant=lq).transpose(1, 2, 0, 3).reshape(out_c, out_f, -1)
         for h in handles], axis=-1)
    return mask[:, :, : n * roi]


# Max peak spread within one quantised coalesced pass: 4x bounds the SNR
# loss of the quietest job vs its solo quantisation at 20*log10(4) ≈ 12 dB
# (int16 ~90 -> ~78 dB, int8 ~48 -> ~36 dB — both still far below
# separation error). Outliers get their own engine pass.
_QUANT_PEAK_RATIO = 4.0


def _peak_groups(peaks: list) -> list:
    """Group job indices so peaks within a group stay within
    ``_QUANT_PEAK_RATIO`` (ascending-peak greedy sweep). One group ⇒ the
    whole set can share a quantised engine pass."""
    order = sorted(range(len(peaks)), key=peaks.__getitem__)
    groups, cur_g = [], [order[0]]
    cur_floor = peaks[order[0]]
    for i in order[1:]:
        if peaks[i] <= cur_floor * _QUANT_PEAK_RATIO:
            cur_g.append(i)
        else:
            groups.append(cur_g)
            cur_g, cur_floor = [i], peaks[i]
    groups.append(cur_g)
    return groups


def _resolve_link_policy(quantized_transfer, quantized_upload):
    """Fill ``None`` transfer knobs from the deployment-wide
    ``AUDSEP_LINK_QUANT`` policy (same rule as ``overlap_add_demix``)."""
    if quantized_transfer is None or quantized_upload is None:
        from .stft import link_quant_mode

        lq = link_quant_mode()
        if quantized_transfer is None:
            quantized_transfer = {"int16": True, "int8": "int8"}.get(lq, False)
        if quantized_upload is None:
            quantized_upload = bool(lq)
    return quantized_transfer, quantized_upload


def demix_jobs(
    model_fn: Callable,
    mixes: list,
    chunk: int,
    step: int,
    window: np.ndarray,
    num_stems: int,
    batch_size: int,
    model_params=None,
    mesh=None,
    fetch_stems: tuple | None = None,
    quantized_transfer: bool | str | None = None,
    quantized_upload: bool | str | None = None,
) -> list:
    """Cross-job window batching: demix K same-geometry mixes in ONE engine
    pass and return per-job ``(num_stems, C, T_i)`` stems.

    Serving runs concurrent jobs through separate engine calls, leaving the
    chip idle during each job's host/link phases. Here the jobs' windows
    share one scanned program: mixes are laid end to end in a single buffer
    (each spanning ``max(T_i, chunk)`` so a clamped window never reads a
    neighbour), positions are each job's own reference-compatible window
    grid offset by its start, and the divider falls out of the shared
    window-sum — no window or overlap-add crosses a job boundary, so each
    job's slice is EXACTLY what its solo ``overlap_add_demix`` would return
    while batch padding, pipeline ends, and link transfers amortise across
    jobs. (The reference's scale-out answer is one GPU per job,
    ref: remote/deploy_modal.py:152-378; this fills one chip instead.)

    Under link quantisation the transfer scale is peak-derived over a whole
    buffer, so a quiet job sharing a pass with a loud one would quantise to
    a fraction of its solo SNR (a 0.01-peak track next to a 0.9-peak one
    loses ~39 dB). When fetch or upload quantisation is active, jobs are
    therefore grouped so peaks within a group stay within
    ``_QUANT_PEAK_RATIO`` (bounded SNR loss vs solo, ≤12 dB at 4x) and each
    group runs its own engine pass; exact float mode always shares one pass.
    """
    if not mixes:
        return []
    quantized_transfer, quantized_upload = _resolve_link_policy(
        quantized_transfer, quantized_upload)
    if (quantized_transfer or quantized_upload) and len(mixes) > 1:
        # One |mix| scan per track (each is a full-buffer reduction on the
        # serving hot path — don't repeat it in the sort key AND the loop).
        peaks = [max(float(np.max(np.abs(m))), 1e-30) for m in mixes]
        groups = _peak_groups(peaks)
        if len(groups) > 1:
            results: list = [None] * len(mixes)
            for g in groups:
                sub = demix_jobs(
                    model_fn, [mixes[i] for i in g], chunk, step, window,
                    num_stems=num_stems, batch_size=batch_size,
                    model_params=model_params, mesh=mesh,
                    fetch_stems=fetch_stems,
                    quantized_transfer=quantized_transfer,
                    quantized_upload=quantized_upload)
                for i, stems in zip(g, sub):
                    results[i] = stems
            return results
    c = mixes[0].shape[0]
    offs, lens, pos_parts = [], [], []
    cur = 0
    for m in mixes:
        if m.shape[0] != c:
            raise ValueError("demix_jobs: mixes must share channel count")
        t = int(m.shape[1])
        offs.append(cur)
        lens.append(t)
        pos_parts.append(window_positions(t, chunk, step) + cur)
        cur += max(t, chunk)
    mix_cat = np.zeros((c, cur), dtype=np.float32)
    for m, off, t in zip(mixes, offs, lens):
        mix_cat[:, off : off + t] = m
    positions = np.concatenate(pos_parts).astype(np.int32)
    out = overlap_add_demix(
        model_fn, mix_cat, chunk, step, window,
        num_stems=num_stems, batch_size=batch_size, positions=positions,
        model_params=model_params, mesh=mesh, fetch_stems=fetch_stems,
        quantized_transfer=quantized_transfer,
        quantized_upload=quantized_upload,
    )
    return [out[..., off : off + t] for off, t in zip(offs, lens)]


def demix_jobs_layout(
    model_fn: Callable,
    jobs: list,
    chunk: int,
    step: int,
    num_stems: int,
    batch_size: int,
    model_params=None,
    mesh=None,
    fetch_stems: tuple | None = None,
    quantized_transfer: bool | str | None = None,
    quantized_upload: bool | str | None = None,
) -> list:
    """Cross-job window batching for architectures whose demix uses an
    EXPLICIT per-job layout — ``jobs`` is a list of
    ``(mixture (C, total_i), positions_i (N_i,), windows_i (N_i, chunk),
    divider_i (total_i,))`` tuples, e.g. MDX's trim-padded mixtures with
    per-position ``np.hanning(actual)`` tail windows and a host divider
    (architectures/mdx.py). Same guarantee as :func:`demix_jobs`: each job's
    slice is EXACTLY its solo ``overlap_add_demix`` result (windows never
    cross a job boundary; each job's divider normalises only its own span)
    while batch padding, pipeline ends, and link transfers amortise across
    the group. Returns the full per-job accumulator ``(num_stems, C,
    total_i)`` — callers crop their own trim.

    Quantised modes reuse the peak-ratio grouping (``_QUANT_PEAK_RATIO``):
    the transfer scale is peak-derived over the whole shared buffer, so
    quiet jobs are split from loud ones to bound their SNR loss vs solo.
    """
    if not jobs:
        return []
    quantized_transfer, quantized_upload = _resolve_link_policy(
        quantized_transfer, quantized_upload)
    if (quantized_transfer or quantized_upload) and len(jobs) > 1:
        peaks = [max(float(np.max(np.abs(j[0]))), 1e-30) for j in jobs]
        groups = _peak_groups(peaks)
        if len(groups) > 1:
            results: list = [None] * len(jobs)
            for g in groups:
                sub = demix_jobs_layout(
                    model_fn, [jobs[i] for i in g], chunk, step,
                    num_stems=num_stems, batch_size=batch_size,
                    model_params=model_params, mesh=mesh,
                    fetch_stems=fetch_stems,
                    quantized_transfer=quantized_transfer,
                    quantized_upload=quantized_upload)
                for i, stems in zip(g, sub):
                    results[i] = stems
            return results

    c = jobs[0][0].shape[0]
    offs, lens, pos_parts, win_parts, div_parts = [], [], [], [], []
    cur = 0
    for mixture, positions, windows, divider in jobs:
        if mixture.shape[0] != c:
            raise ValueError("demix_jobs_layout: jobs must share channel count")
        t = int(mixture.shape[1])
        positions = np.asarray(positions, dtype=np.int32)
        # Each job spans at least its own widest window so a gather never
        # reads a neighbour's samples.
        span = max(t, int(positions.max()) + chunk)
        offs.append(cur)
        lens.append(t)
        pos_parts.append(positions + cur)
        win_parts.append(np.asarray(windows, dtype=np.float32))
        div = np.ones(span, dtype=np.float32)
        div[: len(divider)] = divider
        div_parts.append(div)
        cur += span
    mix_cat = np.zeros((c, cur), dtype=np.float32)
    for (mixture, *_), off, t in zip(jobs, offs, lens):
        mix_cat[:, off : off + t] = mixture
    out = overlap_add_demix(
        model_fn, mix_cat, chunk, step, np.concatenate(win_parts, axis=0),
        num_stems=num_stems, batch_size=batch_size,
        positions=np.concatenate(pos_parts).astype(np.int32),
        divider=np.concatenate(div_parts),
        model_params=model_params, mesh=mesh, fetch_stems=fetch_stems,
        quantized_transfer=quantized_transfer,
        quantized_upload=quantized_upload,
    )
    return [out[..., off : off + t] for off, t in zip(offs, lens)]


@functools.partial(jax.jit, static_argnames=("t_need",))
def _pad_time_to(spec: jnp.ndarray, t_need: int) -> jnp.ndarray:
    t = spec.shape[-1]
    if t >= t_need:
        return spec[..., :t_need]
    return jnp.pad(spec, [(0, 0)] * (spec.ndim - 1) + [(0, t_need - t)])


def tiled_mask_predict_dev(
    model_fn: Callable,
    spec_dev,  # (C, F, T) f32 DEVICE-RESIDENT padded magnitudes
    window: int,
    offset: int,
    batch_size: int,
    n_tiles: int,
    model_params=None,
    mesh=None,
    data_axis: str = "data",
    bucket: bool = True,
):
    """Device-in/device-out variant of :func:`tiled_mask_predict` for the
    VR on-device chain (ops/vr_chain.py): the spec never leaves HBM and the
    mask ``(out_c, out_f, >= n_tiles*roi)`` is returned as a device array
    for the jitted synthesis stage to consume — zero link bytes.

    ``n_tiles`` is the TRUE tile count for the track (host arithmetic over
    the unpadded frame count): tiles beyond it cover bucket padding only and
    their batches are never dispatched — bucketing must not buy its compile
    reuse with dead mask-net forwards."""
    roi = window - 2 * offset
    n_pad = (bucket_up(n_tiles, batch_size) if bucket
             else -(-n_tiles // batch_size) * batch_size)
    spec_dev = _pad_time_to(spec_dev, (n_pad - 1) * roi + window)
    outs = [
        _tile_batch(model_fn, model_params, spec_dev,
                    jnp.arange(i, i + batch_size, dtype=jnp.int32),
                    window, roi, mesh=mesh, data_axis=data_axis)
        for i in range(0, n_pad, batch_size) if i < n_tiles
    ]
    mask = jnp.concatenate(outs, axis=0)  # (B_total, out_c, out_f, roi)
    b, oc, of, _ = mask.shape
    return mask.transpose(1, 2, 0, 3).reshape(oc, of, b * roi)


def _auto_segments(n: int, batch_size: int, cap: int, bucket: bool) -> int:
    """Pick the pipeline depth that minimises padded window slots.

    Every dummy slot is a full wasted model forward (the dominant cost), so
    the search scores each candidate segment count by the total padded slots
    its batch-aligned grouping produces, tie-breaking toward ~2 batches per
    segment (enough segments to overlap transfers, few enough to bound
    boundary duplication when windows overlap). Example: 30 windows at batch
    4 → 4 segments of [8,8,8,6] (32 slots); at batch 6 → 5 segments of 6
    (30 slots, zero waste) where a fixed "2 batches per segment" rule would
    have padded 30→36.
    """
    pad_n = bucket_up if bucket else (lambda v, q: -(-v // q) * q)
    target = max(1, -(-n // (2 * batch_size)))
    best_k, best_cost = 1, None
    for k in range(1, max(1, min(cap, -(-n // batch_size))) + 1):
        per_seg = batch_size * (-(-n // (batch_size * k)))
        slots = -(-n // per_seg) * pad_n(per_seg, batch_size)
        cost = (slots, abs(k - target))
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    return best_k


def _segment_groups(n: int, batch_size: int, n_segments: int) -> list:
    """Contiguous index groups whose sizes are multiples of ``batch_size``
    (except possibly the last): bucket padding then adds dummy window slots
    only to the final ragged group instead of to every segment. Dummy slots
    are wasted model forwards — with ``array_split`` a 30-window track at
    batch 4 split 3 ways padded 10→12 rows per segment (6 dead forwards);
    aligned groups [8,8,8,6] pad only the tail (2 dead forwards). The ragged
    group lands LAST, which also makes the non-overlapped final D2H fetch the
    smallest one."""
    n_segments = max(1, min(n_segments, -(-n // batch_size)))
    per_seg = batch_size * (-(-n // (batch_size * n_segments)))
    return [np.arange(i, min(i + per_seg, n)) for i in range(0, n, per_seg)]


# Geometry-static host artifacts (overlap divider, per-segment window sums)
# are deterministic in (positions, window, chunk, segmentation) and cost a
# full pass over track-length buffers to rebuild — cache across calls so
# repeated separations (bench passes, batch folders, serving) skip the host
# work. Keyed on content hashes; tiny LRU.
_GEOM_MAX_ENTRIES = 8
_geom_cache: dict = {}
# One lock for both module caches: serving runs several worker threads
# through overlap_add_demix concurrently (remote/server.py, measured up to
# workers=4), and an unlocked insert+evict races — two threads can pop the
# same oldest key and the loser's KeyError fails the job.
_cache_lock = threading.Lock()


def _geom_key(positions: np.ndarray, window: np.ndarray, chunk: int,
              extra: tuple) -> tuple:
    """Key in the ORIGINAL caller order: with per-row (N, chunk) windows the
    artifacts depend on the (position, window-row) pairing, so hashing a
    sorted view would collide two calls whose positions are the same multiset
    paired with different rows."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    h.update(positions.tobytes())
    h.update(window.tobytes())
    return (h.hexdigest(), chunk, window.shape) + extra


# Device-resident geometry cache: the dense window rows and the overlap
# divider are geometry-static but LARGE at track scale (a 240 s htdemucs
# shift layout ships ~115 MB of f32 rows + ~93 MB of divider per call), and
# on a tethered link those uploads are seconds. Entries are jnp arrays keyed
# by the same content hashes as the host geom cache; a small LRU bounds the
# HBM held (single-device only — sharded calls place arrays via their jitted
# consumers). Sized for whole GEOMETRIES, not entries: one 240 s htdemucs
# shift layout is up to 8 per-segment row entries + 1 divider, so a bound
# below ~9 would evict its own geometry mid-call and thrash; 24 holds ~2-3
# track-length geometries (~0.5 GB HBM worst case on a 16 GB part).
_DEV_GEOM_MAX_ENTRIES = 24
_dev_geom_cache: dict = {}


def _dev_geom_memo(key, builder):
    with _cache_lock:
        hit = _dev_geom_cache.pop(key, None)
        if hit is not None:
            _dev_geom_cache[key] = hit  # true LRU: refresh recency on hit
    if hit is not None:
        return hit
    built = builder()  # upload outside the lock (seconds on slow links)
    with _cache_lock:
        hit = _dev_geom_cache.get(key)
        if hit is None:
            hit = _dev_geom_cache[key] = built
            while len(_dev_geom_cache) > _DEV_GEOM_MAX_ENTRIES:
                _dev_geom_cache.pop(next(iter(_dev_geom_cache)))
    return hit


@functools.partial(jax.jit, donate_argnums=(0,))
def _drain_combine(full: jnp.ndarray, seg: jnp.ndarray, lo: jnp.ndarray):
    """Add one segment's raw accumulator into the full device buffer at
    ``lo`` (overlap-add across segment boundaries happens here, in HBM,
    instead of on host). Donation lets XLA update in place."""
    cur = jax.lax.dynamic_slice(full, (0, 0, lo), seg.shape)
    return jax.lax.dynamic_update_slice(full, cur + seg, (0, 0, lo))


@functools.partial(
    jax.jit,
    static_argnames=("post_fn", "quantized_transfer"),
    donate_argnums=(0,),
)
def _drain_finalize(full: jnp.ndarray, inv_div: jnp.ndarray,
                    post_fn: Callable, quantized_transfer: bool | str):
    """Final device program of the pipelined post drain: divider-normalise
    the combined accumulator, apply the caller's post fn, quantise for the
    single D2H fetch."""
    acc = post_fn(full * inv_div)
    return _quantize_fetch(acc, quantized_transfer)


def _geom_memo(key, builder):
    # Build OUTSIDE the lock: the builder does an O(track-length) pass, and
    # this lock is shared with the mix cache — holding it during a cold build
    # would stall every concurrent serving worker, even on unrelated keys.
    # A racing duplicate build is harmless (artifacts are deterministic);
    # the insert re-checks so one winner is kept.
    with _cache_lock:
        hit = _geom_cache.get(key)
    if hit is not None:
        return hit
    built = builder()
    with _cache_lock:
        hit = _geom_cache.get(key)
        if hit is None:
            hit = _geom_cache[key] = built
            while len(_geom_cache) > _GEOM_MAX_ENTRIES:
                _geom_cache.pop(next(iter(_geom_cache)))
    return hit


# Device-resident mix cache: a separation that runs the SAME mix through the
# engine more than once (MDX match-mix/denoise second pass, VR TTA, ensemble
# members sharing one file) re-uploaded the full track each time — on a
# tethered link that is seconds per pass. Callers opt in by passing an
# opaque ``mix_token`` (e.g. the audio path + pitch); entries are the
# quantised device segments keyed by (token, lo, len, mode). Two tracks of
# int8/int16 segments bound the HBM held.
_MIX_MAX_TOKENS = 2
_mix_cache: "dict[tuple, dict]" = {}


def _mix_segments_for_token(mix_token):
    if mix_token is None:
        return None
    with _cache_lock:
        seg = _mix_cache.get(mix_token)
        if seg is None:
            while len(_mix_cache) >= _MIX_MAX_TOKENS:
                _mix_cache.pop(next(iter(_mix_cache)))
            seg = _mix_cache[mix_token] = {}
    return seg


def _pipelined_demix(
    model_fn: Callable,
    mix: np.ndarray,
    chunk: int,
    window: np.ndarray,
    shared_window: bool,
    positions: np.ndarray,
    divider: np.ndarray | None,
    num_stems: int,
    batch_size: int,
    quantized_transfer: bool | str,
    quantized_upload: bool | str,
    model_params,
    n_segments: int,
    bucket: bool,
    mesh=None,
    data_axis: str = "data",
    fetch_stems: tuple | None = None,
    mix_token=None,
    post_device_fn=None,
) -> np.ndarray:
    """Segment-pipelined demix: K contiguous window groups, each run as an
    *unnormalised* device scan over its own mix slice, dispatched back to back
    so JAX's async dispatch overlaps H2D upload / compute / D2H fetch across
    segments. All segments share one program shape (padded window count and
    bucketed buffer length), so XLA compiles exactly once. The overlap-add
    across segment boundaries and the window-weight normalisation happen on
    host, where the divider is a cheap numpy overlap-add of the window rows.

    ``post_device_fn`` (requires an explicit ``divider``; single device)
    switches the drain to DEVICE side: per-segment raw accumulators never
    cross the link — they combine into one HBM buffer, and a final program
    divider-normalises, applies the post fn, and quantises for a single
    fetch of the post fn's (usually much smaller) output. Uploads still
    pipeline exactly as in the host drain. Measured on the htdemucs
    shift-trick layout at 240 s (SHIFT_PROBE.json ``len240s_b4_predrain``):
    the post fn previously forced the unpipelined whole-buffer scan at
    22.6 s while the same layout pipelined (host align, double the fetch
    bytes) took 14.5 s; with this drain the shipped path runs 16.6 s with
    half the fetch (``len240s_b4_postdrain``).

    Pipeline-end engineering (the measured gap between the ~71x model-only
    RTF and the e2e number is almost entirely the non-overlapped ends):
      * each segment's mix slice is quantised on host *inside* the dispatch
        loop, so segment k+1's host prep runs while segment k computes;
      * geometry-static host buffers (divider, per-segment window sums) come
        from a content-keyed cache — repeat separations skip the host pass;
      * when segment spans are disjoint (step >= chunk, the flagship MDXC
        default) and fetches are device-normalised, the host drain is ONE
        fused multiply per segment straight into the output buffer — the
        per-element window re-scale and global divide cancel exactly;
      * every segment's D2H copy is started asynchronously at dispatch time
        and (payload, scale) cross in one device_get, so the drain loop only
        ever blocks on bytes still in flight.
    """
    c, total = mix.shape
    n = len(positions)
    order = np.argsort(positions, kind="stable")
    pos_sorted = positions[order]

    groups = _segment_groups(n, batch_size, n_segments)

    pad_n = bucket_up if bucket else (lambda v, q: -(-v // q) * q)
    seg_n = pad_n(max(len(g) for g in groups), batch_size)
    seg_lo = [int(pos_sorted[g[0]]) for g in groups]
    spans = [int(pos_sorted[g[-1]]) + chunk - lo for g, lo in zip(groups, seg_lo)]
    seg_buf = bucket_up(max(spans), chunk) if bucket else max(spans)

    t_full = max(total, int(pos_sorted[-1]) + chunk)
    pad_to = max(t_full, max(seg_lo) + seg_buf)

    # Quantized fetches are normalised ON DEVICE by the segment's own window
    # sum before quantisation, then re-scaled on host by that (statically
    # known) weight. Rationale: quantising the raw accumulator lets the final
    # host division by small window weights (track edges, lone-window
    # regions) amplify the quantisation step by >10x; normalising first keeps
    # the error uniformly at the quantiser's SNR because the host re-scale
    # weight w_seg never exceeds the global divider it is later divided by.
    device_drain = post_device_fn is not None  # caller guarantees divider
    device_norm = bool(quantized_transfer) and not device_drain
    # Disjoint fast path: segments that don't overlap (step >= chunk) make
    # wseg identical to the global divider on the segment's span, so the
    # host-side "* wseg / div" is the identity — the drain writes each
    # segment's dequantised bytes straight into the output.
    disjoint = (divider is None and device_norm
                and all(seg_lo[k + 1] >= seg_lo[k] + spans[k]
                        for k in range(len(groups) - 1)))

    def _build_geom():
        if divider is not None:
            div = np.asarray(divider, dtype=np.float32)
            if len(div) < pad_to:
                div = np.concatenate(
                    [div, np.ones(pad_to - len(div), np.float32)])
            div = div[:pad_to]
        else:
            div = np.zeros(pad_to, dtype=np.float32)
            for r, p in enumerate(positions):
                div[p : p + chunk] += window if shared_window else window[r]
        inv_div = 1.0 / np.maximum(div, 1e-10)
        wsegs = []
        if device_norm and not disjoint:
            for g, lo, span in zip(groups, seg_lo, spans):
                w = np.zeros(span, dtype=np.float32)
                for r in g:
                    p = int(pos_sorted[r]) - lo
                    w[p : p + chunk] += (window if shared_window
                                         else window[order[r]])
                wsegs.append(w)
        return inv_div, wsegs

    div_key = (None if divider is None
               else hash(np.asarray(divider, np.float32).tobytes()))
    # Group SIZES are part of the key, not just the count: (batch_size,
    # n_segments) pairs can split the same windows as e.g. [10,10,10] vs
    # [12,12,6] — same len(groups)/seg_n/pad_to, different per-segment
    # window sums. Sizes + sorted positions fully determine membership
    # (groups are contiguous in sorted order).
    gk = _geom_key(positions, window, chunk,
                   (tuple(len(g) for g in groups), seg_n, pad_to,
                    device_norm, disjoint, div_key))
    inv_div, wsegs = _geom_memo(gk, _build_geom)

    mix_seg_cache = _mix_segments_for_token(mix_token)
    up_mode = ("int8" if quantized_upload == "int8"
               else "int16" if quantized_upload else "f32")
    # Token cache, two regimes: same-geometry repeats hit the per-segment
    # entries below; a second pass with DIFFERENT window geometry over the
    # same mix (MDX match-mix changes step but not the mixture) would miss
    # every per-segment key — detect that and switch the token to ONE
    # device-resident full-mix buffer that segments slice on device, so the
    # mix crosses the link at most twice per track ever, then never again.
    full_entry = None
    if mix_seg_cache is not None:
        fk = ("full", up_mode)
        full_entry = mix_seg_cache.get(fk)
        if full_entry is not None and full_entry[2] < max(seg_lo) + seg_buf:
            full_entry = None  # too short for this geometry: rebuild below
        if full_entry is None:
            seg_keys = [(lo, seg_buf, up_mode) for lo in seg_lo]
            prior_pass = any(isinstance(k, tuple) and len(k) == 3
                             and k[2] == up_mode for k in mix_seg_cache)
            if prior_pass and any(k not in mix_seg_cache for k in seg_keys):
                mix_full = np.zeros((c, pad_to), dtype=np.float32)
                mix_full[:, :total] = mix
                q, inv = _quantize_upload(mix_full, quantized_upload)
                full_entry = (jnp.asarray(q), jnp.asarray(inv), pad_to)
                mix_seg_cache[fk] = full_entry
    dummy_div = jnp.ones((1,), jnp.float32)
    n_out = len(fetch_stems) if fetch_stems is not None else num_stems
    full_dev = (jnp.zeros((n_out, c, pad_to), jnp.float32)
                if device_drain else None)
    handles = []
    for k_seg, (g, lo, span) in enumerate(zip(groups, seg_lo, spans)):
        # Host-side segment prep (slice/pad/quantise/upload) sits INSIDE the
        # dispatch loop: segment k's device program is already running while
        # this prepares k+1 — the host work and H2D bytes hide behind compute
        # for every segment but the first.
        ck = (lo, seg_buf, up_mode)
        cached = mix_seg_cache.get(ck) if mix_seg_cache is not None else None
        if full_entry is not None:
            # On-device slice of the resident full mix: no link bytes at all.
            mix_dev = jax.lax.dynamic_slice_in_dim(full_entry[0], lo, seg_buf,
                                                   axis=1)
            inv_scale = full_entry[1]
        elif cached is not None:
            mix_dev, inv_scale = cached
        else:
            hi = min(lo + seg_buf, total)
            seg_host = mix[:, lo:hi]
            if hi - lo < seg_buf:
                pad = np.zeros((c, seg_buf), dtype=np.float32)
                pad[:, : hi - lo] = seg_host
                seg_host = pad
            seg_q, inv_scale_np = _quantize_upload(
                np.ascontiguousarray(seg_host), quantized_upload)
            mix_dev = jnp.asarray(seg_q)
            inv_scale = jnp.asarray(inv_scale_np)
            if mix_seg_cache is not None:
                mix_seg_cache[ck] = (mix_dev, inv_scale)
        seg_pos = np.zeros(seg_n, dtype=np.int32)
        seg_pos[: len(g)] = pos_sorted[g] - lo
        row_scale = np.zeros(seg_n, dtype=np.float32)
        row_scale[: len(g)] = 1.0
        if shared_window:
            win_dev = window
        else:
            # Dense rows are geometry-static and LARGE (~115 MB f32 for a
            # 240 s htdemucs shift layout): keep each segment's rows device
            # resident across calls so repeat separations at the same
            # bucketed geometry skip the upload entirely.
            def _build_win(g=g):
                rows_h = np.zeros((seg_n, chunk), dtype=np.float32)
                rows_h[: len(g)] = window[order[g]]
                return jnp.asarray(rows_h)

            win_dev = (_dev_geom_memo((gk, "win", k_seg), _build_win)
                       if mesh is None else _build_win())
        acc, scale = _demix_scan(
            model_fn,
            model_params,
            mix_dev,
            inv_scale,
            jnp.asarray(seg_pos),
            win_dev if not shared_window else jnp.asarray(win_dev),
            jnp.asarray(row_scale),
            dummy_div,
            chunk,
            batch_size,
            num_stems,
            c,
            False if device_drain else quantized_transfer,
            not device_norm,  # has_divider=True skips device wsum (host norm)
            normalize=device_norm,
            mesh=mesh,
            data_axis=data_axis,
            fetch_stems=fetch_stems,
        )
        if device_drain:
            # Raw accumulator stays in HBM: overlap-add it into the full
            # buffer (bucket padding past the span is zeros — adding it is
            # free and keeps ONE combine program shape for all segments).
            full_dev = _drain_combine(full_dev, acc,
                                      jnp.asarray(lo, dtype=jnp.int32))
            continue
        # Crop the bucket padding on device (one cheap async op) so only the
        # segment's true span crosses D2H — the padded tail is zeros. Start
        # the host copy NOW: the drain loop then only blocks on in-flight
        # bytes, never on un-started transfers.
        acc = acc[..., :span]
        for h in (acc, scale):
            try:
                h.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass  # backend without async host copies: fetches stay lazy
        handles.append((lo, span, acc, scale))

    if device_drain:
        def _build_inv_div():
            return jnp.asarray(inv_div)

        inv_div_dev = (_dev_geom_memo((gk, "invdiv"), _build_inv_div)
                       if mesh is None else _build_inv_div())
        payload, scale = _drain_finalize(
            full_dev, inv_div_dev, post_fn=post_device_fn,
            quantized_transfer=quantized_transfer)
        if quantized_transfer:
            return np.asarray(payload).astype(np.float32) / float(scale)
        return np.array(np.asarray(payload))

    if disjoint:
        # Spans may leave gaps only where no window lands (impossible for
        # reference position lists, which tile from 0) — zero-fill is still
        # the correct value there and calloc pages are cheap.
        full = np.zeros((n_out, c, pad_to), dtype=np.float32)
        for lo, span, acc, scale in handles:
            a, s = jax.device_get((acc, scale))
            np.multiply(a, np.float32(1.0 / float(s)),
                        out=full[:, :, lo : lo + span], casting="unsafe")
        return full[..., :total]

    full = np.zeros((n_out, c, pad_to), dtype=np.float32)
    for k, (lo, span, acc, scale) in enumerate(handles):
        if quantized_transfer:
            a, s = jax.device_get((acc, scale))
            # Fold dequant + window re-scale into one broadcast multiply.
            a = a * (wsegs[k] * np.float32(1.0 / float(s)))
        else:
            a = np.asarray(acc).astype(np.float32)
        full[:, :, lo : lo + span] += a
    full *= inv_div
    return full[..., :total]
