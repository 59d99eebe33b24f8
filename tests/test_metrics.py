"""BSS Eval v4 (museval conventions) tests + stem verification classifier.

The production implementation (utils/metrics.py) uses FFT-based correlation
Grams and global time-invariant filters; the oracle here recomputes the same
BSS Eval v4 images decomposition with an explicit delayed-copy design matrix
and np.linalg.lstsq — an independent formulation that pins the framing,
decomposition, and median conventions museval uses to produce the
reference's models-scores.json (ref: tests/model-metrics/test-all-models.py).
"""

import os

import numpy as np
import pytest

from audio_separator_tpu.utils.metrics import (
    bss_eval, bss_eval_framewise, simple_sdr)


def _tones(n, sr=8000):
    t = np.arange(n) / sr
    s1 = np.sin(2 * np.pi * 440 * t)
    s2 = np.sign(np.sin(2 * np.pi * 123 * t)) * 0.5
    return s1.astype(np.float64), s2.astype(np.float64)


def test_simple_sdr_perfect_and_noisy():
    ref = np.random.default_rng(0).standard_normal(10000)
    assert simple_sdr(ref, ref) > 90
    noisy = ref + 0.1 * np.random.default_rng(1).standard_normal(10000)
    sdr = simple_sdr(noisy, ref)
    assert 15 < sdr < 25  # ~20 dB for 10% noise


def test_bss_eval_perfect_separation():
    s1, s2 = _tones(16000)
    res = bss_eval([s1[None], s2[None]], [s1[None], s2[None]], sample_rate=8000)
    assert res[0]["SDR"] > 40
    assert res[1]["SDR"] > 40


def test_bss_eval_interference_detected():
    s1, s2 = _tones(16000)
    est1 = s1 + 0.3 * s2  # vocal estimate contaminated by source 2
    res = bss_eval([s1[None], s2[None]], [est1[None], s2[None]], sample_rate=8000)
    # projection model: interference explains the bleed → SIR finite & lower
    # than for the clean source; SDR stays high because bleed is interference
    assert res[0]["SIR"] < res[1]["SIR"]
    assert res[0]["SIR"] < 30


def test_bss_eval_filtered_target_images_semantics():
    """museval images model: a short FIR on the target is *spatial
    distortion* — SIR/SAR stay near-perfect (the 512-tap projection absorbs
    the filter exactly) while SDR ≈ ISR reflect the image mismatch. Additive
    noise instead lands in SAR (artifacts)."""
    rng = np.random.default_rng(2)
    s1 = rng.standard_normal(16000)
    s2 = rng.standard_normal(16000)
    fir = np.array([0.9, 0.1, -0.05])
    filtered = np.convolve(s1, fir)[:16000]
    res_f = bss_eval([s1[None], s2[None]], [filtered[None], s2[None]], sample_rate=8000)
    # e_interf = e_artif = 0 (up to fp): SIR and SAR are huge
    assert res_f[0]["SIR"] > 60
    assert res_f[0]["SAR"] > 60
    # SDR == ISR == 10log10(||s||²/||(h−δ)*s||²) ≈ 16.5 dB for this fir
    expected = 10 * np.log10(1.0 / (0.1**2 + 0.1**2 + 0.05**2))
    assert abs(res_f[0]["SDR"] - expected) < 1.0
    assert abs(res_f[0]["ISR"] - res_f[0]["SDR"]) < 0.2

    noisy = s1 + 0.3 * rng.standard_normal(16000)
    res_n = bss_eval([s1[None], s2[None]], [noisy[None], s2[None]], sample_rate=8000)
    assert res_n[0]["SDR"] < 15  # additive noise is distortion
    assert res_n[0]["SAR"] < 15  # ... classified as artifact
    assert res_n[0]["SAR"] < res_f[0]["SAR"]


# ---------------------------------------------------------------------------
# Brute-force oracle: explicit delayed-copy design matrix + lstsq. Pins the
# production FFT/Toeplitz implementation to the v4 images decomposition.


def _oracle_decompose(refs, est_img, j, flen):
    """BSS Eval v4 images decomposition via an explicit design matrix.

    refs: list of (nchan, n); est_img: (nchan, n). Returns the four
    (nchan, n+flen-1) arrays (s_true, e_spat, e_interf, e_artif).
    """
    nsrc = len(refs)
    nchan, n = refs[0].shape
    out_len = n + flen - 1
    cols = []
    for r in refs:
        for c in range(nchan):
            for d in range(flen):
                col = np.zeros(out_len)
                col[d : d + n] = r[c]
                cols.append(col)
    A = np.stack(cols, axis=1)  # (out_len, nsrc*nchan*flen)
    Aj = A[:, j * nchan * flen : (j + 1) * nchan * flen]

    s_true = np.zeros((nchan, out_len))
    e_spat = np.zeros((nchan, out_len))
    e_interf = np.zeros((nchan, out_len))
    e_artif = np.zeros((nchan, out_len))
    for c in range(nchan):
        y = np.zeros(out_len)
        y[:n] = est_img[c]
        p_all = A @ np.linalg.lstsq(A, y, rcond=None)[0]
        p_j = Aj @ np.linalg.lstsq(Aj, y, rcond=None)[0]
        s_true[c, :n] = refs[j][c]
        e_spat[c] = p_j - s_true[c]
        e_interf[c] = p_all - p_j
        e_artif[c] = y - p_all
    return s_true, e_spat, e_interf, e_artif


def _oracle_frames(refs, ests, sr, flen, win_s=1.0, hop_s=1.0):
    n = refs[0].shape[1]
    win = int(win_s * sr)
    hop = int(hop_s * sr)
    nwin = max(int(np.floor((n - win + hop) / hop)), 1)
    out = []
    for j in range(len(refs)):
        s_true, e_spat, e_interf, e_artif = _oracle_decompose(
            refs, ests[j], j, flen)
        frames = {"SDR": [], "ISR": [], "SIR": [], "SAR": []}
        for t in range(nwin):
            sl = slice(t * hop, min(t * hop + win, n))
            if any(not np.any(r[:, sl]) for r in refs):
                for k in frames:
                    frames[k].append(float("nan"))
                continue
            st = np.sum(s_true[:, sl] ** 2)
            frames["SDR"].append(10 * np.log10(
                st / np.sum((e_spat + e_interf + e_artif)[:, sl] ** 2)))
            frames["ISR"].append(10 * np.log10(st / np.sum(e_spat[:, sl] ** 2)))
            frames["SIR"].append(10 * np.log10(
                np.sum((s_true + e_spat)[:, sl] ** 2)
                / np.sum(e_interf[:, sl] ** 2)))
            frames["SAR"].append(10 * np.log10(
                np.sum((s_true + e_spat + e_interf)[:, sl] ** 2)
                / np.sum(e_artif[:, sl] ** 2)))
        out.append(frames)
    return out


@pytest.mark.parametrize("nchan", [1, 2])
def test_bss_eval_matches_bruteforce_oracle(nchan):
    """Production FFT/Toeplitz v4 vs explicit-design-matrix lstsq oracle:
    identical framewise metrics to ≤1e-6 dB on dense random mixtures."""
    rng = np.random.default_rng(7)
    sr, n, flen = 100, 350, 8
    refs = [rng.standard_normal((nchan, n)) for _ in range(2)]
    mix = refs[0] + refs[1]
    ests = [0.8 * refs[0] + 0.25 * mix + 0.02 * rng.standard_normal((nchan, n)),
            0.7 * refs[1] + 0.2 * mix + 0.03 * rng.standard_normal((nchan, n))]

    got = bss_eval_framewise(refs, ests, sample_rate=sr, filter_length=flen)
    want = _oracle_frames(refs, ests, sr, flen)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for k in ("SDR", "ISR", "SIR", "SAR"):
            np.testing.assert_allclose(g[k], w[k], atol=1e-6, rtol=1e-9)


def test_bss_eval_global_filters_not_framewise():
    """v4 computes ONE global distortion filter set (museval mode='v4'), not
    per-frame filters (v3). With an estimate whose filtering *changes* halfway
    through, per-frame filters would absorb both halves (huge SAR everywhere);
    a global filter cannot, so at least one half shows finite artifacts."""
    rng = np.random.default_rng(8)
    sr, n = 100, 1000
    s1 = rng.standard_normal((1, n))
    s2 = rng.standard_normal((1, n))
    est = np.empty((1, n))
    est[0, : n // 2] = s1[0, : n // 2]
    est[0, n // 2 :] = np.convolve(s1[0], [0.2, -0.9])[n // 2 : n]  # other filter
    frames = bss_eval_framewise([s1, s2], [est, s2], sample_rate=sr,
                                filter_length=4)
    sar = np.asarray(frames[0]["SAR"])
    assert np.isfinite(sar).all()
    assert sar.min() < 40  # a framewise-filter implementation would be ~inf


def test_bss_eval_silent_frame_nan_and_framing():
    """museval conventions: nwin = floor((n-win+hop)/hop) frames; a frame in
    which ANY reference source is silent is NaN for every source; the track
    score is the nanmedian over frames."""
    sr = 100
    n = 5 * sr + 37  # 5 full 1s windows, trailing partial dropped
    rng = np.random.default_rng(9)
    s1 = rng.standard_normal((1, n))
    s2 = rng.standard_normal((1, n))
    s2[:, 2 * sr : 3 * sr] = 0.0  # source 2 silent in frame 2
    frames = bss_eval_framewise([s1, s2], [s1.copy(), s2.copy()], sample_rate=sr)
    assert len(frames[0]["SDR"]) == 5
    for j in (0, 1):  # BOTH sources NaN in the silent frame
        assert np.isnan(frames[j]["SDR"][2])
        assert np.isnan(frames[j]["SAR"][2])
    # exact estimates → +inf SDR in non-silent frames (museval keeps ±inf;
    # only the silent frame is NaN)
    assert frames[0]["SDR"][0] > 100
    med = bss_eval([s1, s2], [s1.copy(), s2.copy()], sample_rate=sr)
    assert med[0]["SDR"] > 40  # nanmedian ignores the NaN frame


def test_stem_verification_classifier(fixtures_dir):
    from audio_separator_tpu.utils.audio_verification import (
        classify_audio,
        load_references,
        verify_stem,
    )

    ref_vocal, ref_inst, ref_mix, min_len = load_references(fixtures_dir)
    _, _, corr_mix, _, detected = classify_audio(
        ref_mix, ref_vocal, ref_inst, ref_mix, min_len)
    assert detected == "FULL_MIX" and corr_mix > 0.99

    _, _, _, _, detected_v = classify_audio(
        ref_vocal, ref_vocal, ref_inst, ref_mix, min_len)
    assert detected_v == "VOCALS"

    import os

    result = verify_stem(
        os.path.join(fixtures_dir,
                     "mardy20s_(Instrumental)_mel_band_roformer_karaoke_aufr33_viperx_sdr_10.flac"),
        "Instrumental", ref_vocal, ref_inst, ref_mix, min_len)
    assert result.detected_content == "INSTRUMENTAL"
    assert result.label_matches


def test_isr_images_semantics_stereo_and_mono():
    """ISR is the images-model spatial ratio: distinct from SAR on stereo
    stems, and (per museval) finite for mono too — the single-channel
    delayed-copy projection is not the raw reference image."""
    rng = np.random.default_rng(3)
    n = 44100 * 2
    ref_l = rng.standard_normal(n).astype(np.float64)
    # stereo image: slightly different channels
    ref = np.stack([ref_l, 0.8 * ref_l + 0.2 * rng.standard_normal(n)])
    other = rng.standard_normal((2, n))
    est = ref + 0.1 * rng.standard_normal((2, n))

    res = bss_eval([ref, other], [est, other], window_seconds=1.0)
    r = res[0]
    assert np.isfinite(r["ISR"]) and np.isfinite(r["SAR"])
    assert abs(r["ISR"] - r["SAR"]) > 1e-6

    res_mono = bss_eval([ref.mean(0), other.mean(0)],
                        [est.mean(0), other.mean(0)], window_seconds=1.0)
    assert np.isfinite(res_mono[0]["ISR"])


def test_scores_entry_schema_matches_reference_snapshot():
    """tools/model_metrics.make_entry emits entries byte-compatible in shape
    with the reference's models-scores.json (carried in data/scores.json)."""
    import importlib.util
    import json
    from importlib import resources

    spec = importlib.util.spec_from_file_location(
        "model_metrics",
        os.path.join(os.path.dirname(__file__), "..", "tools", "model_metrics.py"))
    mm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mm)

    with resources.files("audio_separator_tpu.data").joinpath(
            "scores.json").open("r", encoding="utf-8") as f:
        snapshot = json.load(f)
    ref_entry = snapshot["1_HP-UVR.pth"]

    got = mm.make_entry(
        "VR Arch Single Model v5: 1_HP-UVR",
        [{"track_name": "Synth - Track",
          "scores": {"vocals": {"SDR": 5.248713, "SIR": 15.46238,
                                "SAR": 4.833914, "ISR": 8.885696},
                     "instrumental": {"SDR": 14.89268, "SIR": 19.31578,
                                      "SAR": 18.24, "ISR": 18.81073}}}],
        "instrumental")

    # Exact key structure parity, level by level.
    assert list(got) == list(ref_entry)
    assert list(got["track_scores"][0]) == list(ref_entry["track_scores"][0])
    ref_stem_scores = ref_entry["track_scores"][0]["scores"]
    got_stem_scores = got["track_scores"][0]["scores"]
    assert set(got_stem_scores) == set(ref_stem_scores)
    for stem in got_stem_scores:
        assert list(got_stem_scores[stem]) == ["SDR", "SIR", "SAR", "ISR"]
    for stem, metrics in got["median_scores"].items():
        assert list(metrics) == ["SDR", "SIR", "SAR", "ISR"]
        for v in metrics.values():
            assert v == float(f"{v:.6g}")  # 6-significant-digit policy
    assert got["stems"] == ref_entry["stems"]
    assert got["target_stem"] == ref_entry["target_stem"]


def test_packaged_scores_carry_reference_track_scores():
    """data/scores.json carries the reference's full per-track museval data
    (ref models-scores.json: 115 models, track_scores per MUSDB18 track)."""
    import json
    from importlib import resources

    with resources.files("audio_separator_tpu.data").joinpath(
            "scores.json").open("r", encoding="utf-8") as f:
        scores = json.load(f)
    assert len(scores) == 115
    with_tracks = [k for k, v in scores.items() if v.get("track_scores")]
    assert len(with_tracks) >= 90  # 96 of 115 reference entries carry per-track data
    entry = scores[with_tracks[0]]
    assert {"model_name", "track_scores", "median_scores", "stems",
            "target_stem"} <= set(entry)
    rec = entry["track_scores"][0]
    stem_scores = next(iter(rec["scores"].values()))
    assert {"SDR", "SIR", "SAR", "ISR"} <= set(stem_scores)
