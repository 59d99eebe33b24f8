"""Separation quality metrics.

The reference's quality numbers come from museval (BSS Eval v4) over MUSDB18HQ
(ref: tests/model-metrics/test-all-models.py:30-43, models-scores.json).
museval/musdb are not available in this environment, so the framewise BSS Eval
computation is implemented here directly:

* :func:`bss_eval` — framewise SDR/SIR/SAR (BSS Eval "sources" model with
  512-tap distortion filters, 1 s windows/hops like museval defaults), plus
  the images-model ISR (target image vs spatial-distortion energy) computed
  per channel when stereo stems are supplied (NaN for mono, where spatial
  distortion is undefined). Median-over-frames matches how
  models-scores.json aggregates per track.
* :func:`simple_sdr` — plain global (scale-variant) SDR for golden-output
  tests.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
from numpy.fft import irfft, rfft


def simple_sdr(estimate: np.ndarray, reference: np.ndarray, eps: float = 1e-10) -> float:
    """Plain global SDR in dB (no filters, scale-variant):
    10 log10(||ref||² / ||ref − est||²)."""
    reference = np.asarray(reference, dtype=np.float64)
    estimate = np.asarray(estimate, dtype=np.float64)
    n = min(reference.shape[-1], estimate.shape[-1])
    reference = reference[..., :n]
    estimate = estimate[..., :n]
    num = np.sum(reference ** 2)
    den = np.sum((reference - estimate) ** 2)
    return float(10.0 * np.log10((num + eps) / (den + eps)))


def _correlations(refs: np.ndarray, est: np.ndarray, flen: int):
    """Cross/auto correlations needed for the projection Toeplitz system.

    refs: (nsrc, n), est: (n,). Returns (G, D) where G is the
    (nsrc*flen, nsrc*flen) block-Toeplitz Gram matrix of delayed sources and
    D is the (nsrc*flen,) cross-correlation vector with the estimate.
    """
    nsrc, n = refs.shape
    nfft = 1 << int(np.ceil(np.log2(n + flen)))
    sf = rfft(refs, n=nfft)
    ef = rfft(est, n=nfft)

    G = np.empty((nsrc * flen, nsrc * flen))
    lags = np.subtract.outer(np.arange(flen) * -1, np.arange(flen) * -1)
    for i in range(nsrc):
        for j in range(nsrc):
            cij = irfft(sf[i] * np.conj(sf[j]), n=nfft)
            # toeplitz: entry (a,b) = corr(s_i delayed a, s_j delayed b)
            #         = c_ij[b - a] with wraparound negative lags at end
            G[i * flen : (i + 1) * flen, j * flen : (j + 1) * flen] = cij[lags % nfft]
    d_cross = np.empty(nsrc * flen)
    for i in range(nsrc):
        ci = irfft(np.conj(sf[i]) * ef, n=nfft)
        d_cross[i * flen : (i + 1) * flen] = ci[:flen]
    return G, d_cross


def _project(refs: np.ndarray, est: np.ndarray, flen: int) -> np.ndarray:
    """Least-squares projection of est onto the span of flen-tap filtered refs."""
    nsrc, n = refs.shape
    G, D = _correlations(refs, est, flen)
    try:
        coeffs = np.linalg.solve(G + 1e-10 * np.eye(G.shape[0]), D)
    except np.linalg.LinAlgError:
        coeffs = np.linalg.lstsq(G, D, rcond=None)[0]
    coeffs = coeffs.reshape(nsrc, flen)
    out = np.zeros(n + flen - 1)
    for i in range(nsrc):
        out += np.convolve(coeffs[i], refs[i])
    return out[:n]


def _frame_metrics(refs: np.ndarray, est: np.ndarray, j: int, flen: int):
    """SDR/SIR/SAR/ISR for one frame; refs (nsrc, n), est (n,), target j."""
    eps = 1e-12
    s_target = _project(refs[j : j + 1], est, flen)
    p_all = _project(refs, est, flen)
    e_interf = p_all - s_target
    e_artif = est - p_all

    num = np.sum(s_target ** 2)
    sdr = 10 * np.log10((num + eps) / (np.sum((e_interf + e_artif) ** 2) + eps))
    sir = 10 * np.log10((num + eps) / (np.sum(e_interf ** 2) + eps))
    sar = 10 * np.log10((np.sum((s_target + e_interf) ** 2) + eps)
                        / (np.sum(e_artif ** 2) + eps))
    return sdr, sir, sar


def _frame_isr(ref_img: np.ndarray, est_img: np.ndarray, flen: int) -> float:
    """Images-model ISR for one frame: per channel, project the estimate onto
    the target's *single-channel* delayed copies (s_target) and onto the span
    of *all* target channels (the spatial image subspace); e_spat is the
    difference. ISR = 10log10(Σ||s_target||² / Σ||e_spat||²). Undefined
    (NaN) for mono, where the two projections coincide."""
    eps = 1e-12
    channels = ref_img.shape[0]
    if channels < 2:
        return float("nan")
    num = den = 0.0
    for c in range(channels):
        s_t = _project(ref_img[c : c + 1], est_img[c], flen)
        p_img = _project(ref_img, est_img[c], flen)
        num += np.sum(s_t ** 2)
        den += np.sum((p_img - s_t) ** 2)
    return float(10 * np.log10((num + eps) / (den + eps)))


def bss_eval(
    references: Sequence[np.ndarray],
    estimates: Sequence[np.ndarray],
    sample_rate: int = 44100,
    window_seconds: float = 1.0,
    hop_seconds: float = 1.0,
    filter_length: int = 512,
) -> List[Dict[str, float]]:
    """Framewise BSS Eval over (channels, samples) stems.

    Returns one dict per source: {"SDR", "SIR", "SAR", "ISR"} of median
    over frames (museval-style aggregation). Channels are averaged to mono
    for the projection model.
    """
    refs = [np.asarray(r, dtype=np.float64) for r in references]
    ests = [np.asarray(e, dtype=np.float64) for e in estimates]
    if len(refs) != len(ests):
        raise ValueError("references and estimates must have the same count")

    def mono(x):
        return x.mean(axis=0) if x.ndim == 2 else x

    refs_m = np.stack([mono(r) for r in refs])
    ests_m = np.stack([mono(e) for e in ests])
    n = min(refs_m.shape[-1], ests_m.shape[-1])
    refs_m, ests_m = refs_m[:, :n], ests_m[:, :n]
    refs_st = [np.atleast_2d(r)[:, :n] for r in refs]
    ests_st = [np.atleast_2d(e)[:, :n] for e in ests]

    win = int(window_seconds * sample_rate)
    hop = int(hop_seconds * sample_rate)
    results = []
    nsrc = len(refs)
    for j in range(nsrc):
        frames = {"SDR": [], "SIR": [], "SAR": [], "ISR": []}
        for start in range(0, max(n - win + 1, 1), hop):
            sl = slice(start, min(start + win, n))
            ref_frame = refs_m[:, sl]
            if np.sum(ref_frame[j] ** 2) < 1e-10:  # silent target frame
                continue
            sdr, sir, sar = _frame_metrics(ref_frame, ests_m[j, sl], j,
                                           filter_length)
            frames["SDR"].append(sdr)
            frames["SIR"].append(sir)
            frames["SAR"].append(sar)
            isr = _frame_isr(refs_st[j][:, sl], ests_st[j][:, sl],
                             filter_length)
            if np.isfinite(isr):
                frames["ISR"].append(isr)
        results.append({k: float(np.median(v)) if v else float("nan")
                        for k, v in frames.items()})
    return results
