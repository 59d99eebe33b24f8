"""Windowed overlap-add demixing engine — the shared hot loop.

The reference implements four per-architecture Python chunk loops that bounce
every window through host memory (ref: mdx_separator.py:348-412,
mdxc_separator.py:320-343, vr_separator.py:295-366, demucs/apply.py:215-250).
Here one engine runs the whole track as a single jitted device program:

  gather window batch → model → window-weight → accumulate (scan)

* Window positions are *static* per (track-length, chunk, step) — so the
  overlap divider is precomputed on host, and XLA sees a fixed trip-count
  ``lax.scan`` with only dynamic-slice adds (no scatters).
* The tail window is re-read at ``T - chunk`` exactly like the reference
  (duplicated trailing positions included) so outputs match sample-for-sample.
* Track length is bucketed by the caller to bound recompiles; chunk batches
  are padded with zero-weight dummy windows.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def window_positions(total: int, chunk: int, step: int) -> np.ndarray:
    """Reference-compatible window start positions (mdxc_separator.py:320-341):
    every ``i`` in range(0, total, step), clamped to ``total - chunk`` when the
    window would overrun (duplicates preserved)."""
    if total <= chunk:
        return np.zeros(1, dtype=np.int32)
    pos = []
    for i in range(0, total, step):
        pos.append(i if i + chunk <= total else total - chunk)
    return np.asarray(pos, dtype=np.int32)


def overlap_divider(total: int, chunk: int, window: np.ndarray,
                    positions: np.ndarray) -> np.ndarray:
    """Host-side accumulation of window weights (static)."""
    div = np.zeros(total, dtype=np.float32)
    for p in positions:
        div[p : p + chunk] += window[: min(chunk, total - p)]
    return np.maximum(div, 1e-10)


@functools.partial(
    jax.jit,
    static_argnames=("model_fn", "chunk", "batch_size", "num_stems", "out_channels"),
)
def _demix_scan(
    model_fn: Callable,
    mix: jnp.ndarray,  # (C, T_pad) — padded so every window fits
    positions: jnp.ndarray,  # (N,) int32, N % batch_size == 0
    weights: jnp.ndarray,  # (N,) float32, 0 for dummy windows
    window: jnp.ndarray,  # (chunk,)
    chunk: int,
    batch_size: int,
    num_stems: int,
    out_channels: int,
) -> jnp.ndarray:
    c, t_pad = mix.shape
    n = positions.shape[0]
    nb = n // batch_size

    def gather_one(pos):
        return jax.lax.dynamic_slice(mix, (0, pos), (c, chunk))

    def body(acc, batch):
        pos_b, w_b = batch
        chunks = jax.vmap(gather_one)(pos_b)  # (B, C, chunk)
        out = model_fn(chunks)  # (B, S, C, chunk)
        out = out.astype(jnp.float32) * (window * w_b[:, None, None, None])
        for i in range(batch_size):
            sl = jax.lax.dynamic_slice(
                acc, (0, 0, pos_b[i]), (num_stems, out_channels, chunk)
            )
            acc = jax.lax.dynamic_update_slice(acc, sl + out[i], (0, 0, pos_b[i]))
        return acc, None

    acc0 = jnp.zeros((num_stems, out_channels, t_pad), dtype=jnp.float32)
    acc, _ = jax.lax.scan(
        body,
        acc0,
        (positions.reshape(nb, batch_size), weights.reshape(nb, batch_size)),
    )
    return acc


def overlap_add_demix(
    model_fn: Callable,
    mix: np.ndarray,
    chunk: int,
    step: int,
    window: np.ndarray,
    num_stems: int,
    batch_size: int = 1,
    positions: np.ndarray | None = None,
) -> np.ndarray:
    """Demix ``mix (C, T)`` → ``(num_stems, C, T)``.

    ``model_fn``: jax-traceable ``(B, C, chunk) → (B, num_stems, C, chunk)``.
    ``positions`` overrides the default reference-style clamped position list
    (used by the MDX23C unfold path which has exact hop-aligned positions).
    """
    c, total = mix.shape
    if positions is not None:
        pad_mix = np.asarray(mix, dtype=np.float32)
        positions = np.asarray(positions, dtype=np.int32)
        t_pad = total
    elif total <= chunk:
        pad_mix = np.zeros((c, chunk), dtype=np.float32)
        pad_mix[:, :total] = mix
        positions = np.zeros(1, dtype=np.int32)
        t_pad = chunk
    else:
        pad_mix = np.asarray(mix, dtype=np.float32)
        positions = window_positions(total, chunk, step)
        t_pad = total

    n = len(positions)
    n_pad = -(-n // batch_size) * batch_size
    weights = np.ones(n_pad, dtype=np.float32)
    weights[n:] = 0.0
    positions_padded = np.zeros(n_pad, dtype=np.int32)
    positions_padded[:n] = positions

    divider = overlap_divider(t_pad, chunk, np.asarray(window), positions)

    acc = _demix_scan(
        model_fn,
        jnp.asarray(pad_mix),
        jnp.asarray(positions_padded),
        jnp.asarray(weights),
        jnp.asarray(window, dtype=jnp.float32),
        chunk,
        batch_size,
        num_stems,
        c,
    )
    out = np.asarray(acc) / divider
    return out[..., :total]
