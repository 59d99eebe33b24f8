"""Multichannel Wiener filtering + EM refinement (norbert-style).

Functional JAX re-implementation of the reference's torch port
(ref: uvr_lib_v5/demucs/filtering.py:153-433). Used by HDemucs (v3) models
whose output head predicts magnitudes (cac=False); complex arithmetic uses
native complex64 instead of the reference's stacked real/imag pairs, and the
2×2 spatial covariance inverses are closed-form.

Shapes follow the reference convention:
    y   (frames, bins, channels, sources)  complex — source estimates
    x   (frames, bins, channels)           complex — mixture STFT
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _invert2(m: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Closed-form inverse of (..., C, C) complex matrices for C in {1, 2}
    (ref: filtering._invert:108-147)."""
    c = m.shape[-1]
    if c == 1:
        return 1.0 / (m + eps)
    if c == 2:
        det = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
        inv_det = 1.0 / (det + eps)
        out = jnp.stack([
            jnp.stack([m[..., 1, 1], -m[..., 0, 1]], axis=-1),
            jnp.stack([-m[..., 1, 0], m[..., 0, 0]], axis=-1),
        ], axis=-2)
        return out * inv_det[..., None, None]
    return jnp.linalg.inv(m)


def expectation_maximization(y: jnp.ndarray, x: jnp.ndarray, iterations: int = 2,
                             eps: float = 1e-10):
    """EM refinement of source estimates (ref: filtering.py:153-311).

    y (T, F, C, S) complex, x (T, F, C) complex → refined y.
    """
    frames, bins, channels = x.shape
    sources = y.shape[-1]
    identity = jnp.eye(channels, dtype=x.dtype)

    # Covariance/gain contractions pin Precision.HIGHEST: the backend's
    # DEFAULT contraction precision is bf16-class on TPU (same trap as
    # ops/resample.py), and the reference computes these statistics in f32.
    # The contracted axes are tiny (C=2, S≤5) — the cost is negligible.
    hi = jax.lax.Precision.HIGHEST

    def em_iter(y, _):
        # power spectral densities: mean |y|^2 over channels → (T, F, S)
        v = jnp.mean(jnp.abs(y) ** 2, axis=2)
        # spatial covariance per source: weighted average over frames
        # cov(t,f) = y y^H → (F, C, C, S)
        cov = jnp.einsum("tfcs,tfds->fcds", y, jnp.conj(y), precision=hi)
        weight = jnp.sum(v, axis=0) + eps  # (F, S)
        r = cov / weight[:, None, None, :]
        # mixture covariance (T, F, C, C)
        cxx = jnp.einsum("tfs,fcds->tfcd", v.astype(x.dtype), r, precision=hi)
        cxx = cxx + jnp.sqrt(eps) * identity
        inv_cxx = _invert2(cxx, eps)
        # Wiener gains per source: v_j R_j inv_Cxx → apply to mixture
        gain = jnp.einsum("fcds,tfde->tfces", r, inv_cxx, precision=hi) \
            * v[..., None, None, :].astype(x.dtype)
        y_new = jnp.einsum("tfces,tfe->tfcs", gain, x, precision=hi)
        return y_new, None

    y, _ = jax.lax.scan(em_iter, y, None, length=iterations)
    return y


def wiener(targets_spectrograms: jnp.ndarray, mix_stft: jnp.ndarray,
           iterations: int = 1, softmask: bool = False, residual: bool = False,
           scale_factor: float = 10.0, eps: float = 1e-10) -> jnp.ndarray:
    """Wiener-based separation (ref: filtering.wiener:312-433).

    targets_spectrograms (T, F, C, S) real magnitudes,
    mix_stft (T, F, C) complex → (T, F, C, S) complex estimates.
    """
    if softmask:
        ratio = targets_spectrograms / (
            eps + jnp.sum(targets_spectrograms, axis=-1, keepdims=True))
        y = mix_stft[..., None] * ratio.astype(mix_stft.dtype)
    else:
        phase = mix_stft / jnp.maximum(jnp.abs(mix_stft), 1e-12)
        y = targets_spectrograms.astype(mix_stft.dtype) * phase[..., None]

    if residual:
        res = mix_stft[..., None] - jnp.sum(y, axis=-1, keepdims=True)
        y = jnp.concatenate([y, res], axis=-1)

    if iterations == 0:
        return y

    max_abs = jnp.maximum(1.0, jnp.max(jnp.abs(mix_stft)) / scale_factor)
    y = expectation_maximization(y / max_abs, mix_stft / max_abs, iterations,
                                 eps=eps)
    return y * max_abs
