"""Device-resident VR multiband chain (ops/vr_chain.py) vs the host numpy
chain (ops/vr_bands.py) — the host chain is itself reference-oracle-pinned
(tests/test_ref_parity.py), so equality here extends the parity argument to
the TPU path."""

import logging
import os

import numpy as np
import pytest

import jax.numpy as jnp

from audio_separator_tpu.ops import vr_bands, vr_chain
from audio_separator_tpu.ops.demix import bucket_up
from audio_separator_tpu.ops.resample import resample_poly_np


def _mp_3band_v5(**over):
    mp = {
        "bins": 430,
        "pre_filter_start": 400,
        "pre_filter_stop": 430,
        "mid_side": False, "mid_side_b2": False, "reverse": False,
        "sr": 44100,
        "band": {
            1: {"sr": 11025, "hl": 128, "n_fft": 512,
                "crop_start": 0, "crop_stop": 100,
                "lpf_start": 80, "lpf_stop": 100},
            2: {"sr": 22050, "hl": 256, "n_fft": 512,
                "crop_start": 20, "crop_stop": 120,
                "hpf_start": 40, "hpf_stop": 20,
                "lpf_start": 100, "lpf_stop": 120},
            3: {"sr": 44100, "hl": 512, "n_fft": 1024,
                "crop_start": 30, "crop_stop": 260,
                "hpf_start": 60, "hpf_stop": 30},
        },
    }
    mp.update(over)
    return mp


def _mp_2band_v51(**over):
    mp = {
        "bins": 290,
        "pre_filter_start": 280,
        "pre_filter_stop": 290,
        "mid_side": False, "mid_side_b2": False, "reverse": False,
        "sr": 32000,
        "band": {
            1: {"sr": 16000, "hl": 256, "n_fft": 1024,
                "crop_start": 0, "crop_stop": 200,
                "lpf_start": 160, "lpf_stop": 200,
                "convert_channels": "mid_side_c"},
            2: {"sr": 32000, "hl": 512, "n_fft": 1024,
                "crop_start": 100, "crop_stop": 190,
                "hpf_start": 140, "hpf_stop": 100,
                "convert_channels": "stereo_n"},
        },
    }
    mp.update(over)
    return mp


def _host_analyze(wave, mp, is_v51):
    """loading_mix without the file IO (architectures/vr.py:197-229)."""
    bands_n = len(mp["band"])
    x_wave, x_spec = {}, {}
    for d in range(bands_n, 0, -1):
        bp = mp["band"][d]
        if d == bands_n:
            x_wave[d] = wave
        else:
            x_wave[d] = resample_poly_np(
                x_wave[d + 1], mp["band"][d + 1]["sr"], bp["sr"])
        x_spec[d] = vr_bands.wave_to_spectrogram(
            x_wave[d], bp["hl"], bp["n_fft"], mp, band=d, is_v51_model=is_v51)
    return vr_bands.combine_spectrograms(x_spec, mp, is_v51_model=is_v51), x_spec


def _snr_db(ref, got):
    err = np.linalg.norm(ref - got)
    sig = np.linalg.norm(ref)
    if err == 0:
        return np.inf
    return 20 * np.log10(sig / err)


@pytest.mark.parametrize("mp_fn,is_v51", [(_mp_3band_v5, False),
                                          (_mp_2band_v51, True)])
def test_analyze_matches_host_chain(mp_fn, is_v51):
    mp = mp_fn()
    geom = vr_chain.band_geometry(mp, is_v51)
    sr_top = mp["band"][len(mp["band"])]["sr"]
    rng = np.random.default_rng(7)
    t_true = int(sr_top * 1.37)
    wave = rng.standard_normal((2, t_true)).astype(np.float32) * 0.3

    ref_spec, _ = _host_analyze(wave, mp, is_v51)
    n_frame = vr_chain.chain_frames(geom, t_true)
    assert ref_spec.shape[2] == n_frame  # host-side length arithmetic agrees

    t_bucket = bucket_up(t_true, sr_top // 4)
    lb = vr_chain.chain_frames(geom, t_bucket)
    padded = np.zeros((2, t_bucket), np.float32)
    padded[:, :t_true] = wave

    analyze = vr_chain.build_analyze(geom, t_bucket)
    spec_c, high_end = analyze(jnp.asarray(padded), jnp.int32(t_true))
    got = np.asarray(spec_c)

    assert got.shape == (2, mp["bins"] + 1, lb)
    assert _snr_db(ref_spec, got[:, :, :n_frame]) > 80
    # bucket-pad frames are exactly zero (they feed the mask-net max)
    np.testing.assert_array_equal(got[:, :, n_frame:], 0)

    bp = mp["band"][len(mp["band"])]
    he_h = (bp["n_fft"] // 2 - bp["crop_stop"]) + (
        mp["pre_filter_stop"] - mp["pre_filter_start"])
    if he_h > 0:
        ref_he = ref_spec  # recompute reference high end from the band spec
        _, x_spec = _host_analyze(wave, mp, is_v51)
        ref_he = x_spec[len(mp["band"])][
            :, bp["n_fft"] // 2 - he_h : bp["n_fft"] // 2, :n_frame]
        assert _snr_db(ref_he, np.asarray(high_end)[:, :, :n_frame]) > 80


@pytest.mark.parametrize("mp_fn,is_v51,high_end,aggr_value",
                         [(_mp_3band_v5, False, False, 0.05),
                          (_mp_3band_v5, False, True, 0.1),
                          (_mp_2band_v51, True, False, 0.0)])
def test_synthesize_matches_host_chain(mp_fn, is_v51, high_end, aggr_value):
    mp = mp_fn()
    geom = vr_chain.band_geometry(mp, is_v51)
    sr_top = mp["band"][len(mp["band"])]["sr"]
    rng = np.random.default_rng(11)
    t_true = int(sr_top * 1.21)
    wave = rng.standard_normal((2, t_true)).astype(np.float32) * 0.3

    ref_spec, x_spec = _host_analyze(wave, mp, is_v51)
    n_frame = ref_spec.shape[2]
    bins = mp["bins"]
    mask_true = rng.uniform(0.0, 1.0, (2, bins + 1, n_frame)).astype(np.float32)

    aggressiveness = {"value": aggr_value, "split_bin": 200,
                      "aggr_correction": None}

    # ---- host reference: adjust_aggr + y/v + (mirroring) + cmb cascade
    mag = np.abs(ref_spec)
    phase = np.exp(1.0j * np.angle(ref_spec))
    m_adj = vr_bands.adjust_aggr(mask_true.copy(), False, aggressiveness)
    y_ref = np.nan_to_num(m_adj * mag * phase)
    v_ref = np.nan_to_num((1 - m_adj) * mag * phase)

    bp = mp["band"][len(mp["band"])]
    he_h = (bp["n_fft"] // 2 - bp["crop_stop"]) + (
        mp["pre_filter_stop"] - mp["pre_filter_start"])
    input_he = x_spec[len(mp["band"])][
        :, bp["n_fft"] // 2 - he_h : bp["n_fft"] // 2, :n_frame]
    if high_end:
        he_y = vr_bands.mirroring("mirroring", y_ref, input_he, mp)
        he_v = vr_bands.mirroring("mirroring", v_ref, input_he, mp)
        wy_ref = vr_bands.cmb_spectrogram_to_wave(y_ref, mp, he_h, he_y, is_v51)
        wv_ref = vr_bands.cmb_spectrogram_to_wave(v_ref, mp, he_h, he_v, is_v51)
    else:
        wy_ref = vr_bands.cmb_spectrogram_to_wave(y_ref, mp, is_v51_model=is_v51)
        wv_ref = vr_bands.cmb_spectrogram_to_wave(v_ref, mp, is_v51_model=is_v51)

    # ---- device chain at a bucketed shape
    t_bucket = bucket_up(t_true, sr_top // 4)
    lb = vr_chain.chain_frames(geom, t_bucket)
    padded = np.zeros((2, t_bucket), np.float32)
    padded[:, :t_true] = wave
    spec_c, high_end_dev = vr_chain.build_analyze(geom, t_bucket)(
        jnp.asarray(padded), jnp.int32(t_true))

    mask_pad = np.zeros((2, bins + 1, lb), np.float32)
    mask_pad[:, :, :n_frame] = mask_true
    roi = 64
    finalize = vr_chain.build_finalize(lb, roi, False, aggressiveness, False)
    mask_dev = finalize(jnp.asarray(mask_pad))

    synth = vr_chain.build_synthesize(geom, lb, high_end)
    if high_end:
        waves = synth(mask_dev, spec_c, jnp.int32(n_frame), high_end_dev)
    else:
        waves = synth(mask_dev, spec_c, jnp.int32(n_frame))
    waves = np.asarray(waves)

    out_len = vr_chain.synth_out_len(geom, n_frame)
    assert wy_ref.shape[-1] == out_len  # length arithmetic mirrors the cascade
    assert _snr_db(wy_ref, waves[0][..., :out_len]) > 75
    assert _snr_db(wv_ref, waves[1][..., :out_len]) > 75


def test_mid_side_v5_variant():
    """mp-level mid_side pre/post transforms survive the device chain."""
    mp = _mp_3band_v5(mid_side=True)
    geom = vr_chain.band_geometry(mp, False)
    sr_top = mp["band"][3]["sr"]
    rng = np.random.default_rng(13)
    t_true = sr_top  # 1 s
    wave = rng.standard_normal((2, t_true)).astype(np.float32) * 0.2

    ref_spec, _ = _host_analyze(wave, mp, False)
    n_frame = ref_spec.shape[2]
    t_bucket = bucket_up(t_true, sr_top // 4)
    lb = vr_chain.chain_frames(geom, t_bucket)
    padded = np.zeros((2, t_bucket), np.float32)
    padded[:, :t_true] = wave
    spec_c, _ = vr_chain.build_analyze(geom, t_bucket)(
        jnp.asarray(padded), jnp.int32(t_true))
    assert _snr_db(ref_spec, np.asarray(spec_c)[:, :, :n_frame]) > 80

    mask = np.ones((2, mp["bins"] + 1, n_frame), np.float32) * 0.7
    mag = np.abs(ref_spec)
    phase = np.exp(1.0j * np.angle(ref_spec))
    wy_ref = vr_bands.cmb_spectrogram_to_wave(
        np.nan_to_num(mask * mag * phase), mp, is_v51_model=False)

    mask_pad = np.zeros((2, mp["bins"] + 1, lb), np.float32)
    mask_pad[:, :, :n_frame] = mask
    waves = vr_chain.build_synthesize(geom, lb, False)(
        jnp.asarray(mask_pad), spec_c, jnp.int32(n_frame))
    out_len = vr_chain.synth_out_len(geom, n_frame)
    assert _snr_db(wy_ref, np.asarray(waves)[0][..., :out_len]) > 75


def test_reverse_config_runs_on_device():
    """The one packaged ``reverse`` geometry class (4band_44100_reverse.json)
    must run the full device chain — analyze AND synthesize — with parity vs
    the host chain (which is itself reference-oracle-pinned). Round 4 fell
    back to the 2.84x-class host chain here; the device chain now implements
    the per-band time-flip as a true-prefix gather."""
    mp = _mp_3band_v5(reverse=True)
    assert vr_chain.supports_device_chain(mp)
    geom = vr_chain.band_geometry(mp, False)
    sr_top = mp["band"][3]["sr"]
    rng = np.random.default_rng(17)
    t_true = int(sr_top * 1.43)
    wave = rng.standard_normal((2, t_true)).astype(np.float32) * 0.3

    ref_spec, _ = _host_analyze(wave, mp, False)
    n_frame = ref_spec.shape[2]
    t_bucket = bucket_up(t_true, sr_top // 4)
    lb = vr_chain.chain_frames(geom, t_bucket)
    padded = np.zeros((2, t_bucket), np.float32)
    padded[:, :t_true] = wave
    spec_c, _ = vr_chain.build_analyze(geom, t_bucket)(
        jnp.asarray(padded), jnp.int32(t_true))
    got = np.asarray(spec_c)
    assert _snr_db(ref_spec, got[:, :, :n_frame]) > 80
    np.testing.assert_array_equal(got[:, :, n_frame:], 0)

    mask = rng.uniform(0.0, 1.0, (2, mp["bins"] + 1, n_frame)).astype(np.float32)
    mag = np.abs(ref_spec)
    phase = np.exp(1.0j * np.angle(ref_spec))
    wy_ref = vr_bands.cmb_spectrogram_to_wave(
        np.nan_to_num(mask * mag * phase), mp, is_v51_model=False)
    wv_ref = vr_bands.cmb_spectrogram_to_wave(
        np.nan_to_num((1 - mask) * mag * phase), mp, is_v51_model=False)

    mask_pad = np.zeros((2, mp["bins"] + 1, lb), np.float32)
    mask_pad[:, :, :n_frame] = mask
    waves = np.asarray(vr_chain.build_synthesize(geom, lb, False)(
        jnp.asarray(mask_pad), spec_c, jnp.int32(n_frame)))
    out_len = vr_chain.synth_out_len(geom, n_frame)
    assert _snr_db(wy_ref, waves[0][..., :out_len]) > 75
    assert _snr_db(wv_ref, waves[1][..., :out_len]) > 75


def test_vr_separate_batch_matches_solo(fixtures_dir, tmp_path, monkeypatch):
    """VRSeparator.separate_batch enqueues every job's device chain before
    the first fetch (cross-job dispatch overlap); outputs must equal the
    per-file separate() exactly (same programs, same math order)."""
    import logging

    import jax

    from audio_separator_tpu.architectures.vr import VRSeparator
    from audio_separator_tpu.io import audio as audio_io
    from audio_separator_tpu.models.vr_nets import state_dict_to_tree
    from torch_oracles.vr_oracle import CascadedASPPNetOracle

    from test_vr import SP_CAPS, _randomize

    monkeypatch.setenv("AUDSEP_VR_CHAIN", "device")
    oracle = _randomize(CascadedASPPNetOracle(2048, SP_CAPS, 31191), seed=21).eval()
    params = jax.device_put(state_dict_to_tree(
        {k: v.numpy() for k, v in oracle.state_dict().items()}))

    rng = np.random.default_rng(5)
    paths = []
    for i, secs in enumerate((1.2, 2.3)):
        p = str(tmp_path / f"in{i}.wav")
        audio_io.save_audio(p, (rng.standard_normal(
            (2, int(44100 * secs))) * 0.2).astype(np.float32), 44100)
        paths.append(p)

    def make_sep(out_name):
        common = {
            "logger": logging.getLogger("test"),
            "model_name": "batch-test", "model_path": str(tmp_path / "m.pth"),
            "model_data": {"vr_model_param": "1band_sr44100_hl512",
                           "primary_stem": "Instrumental"},
            "output_dir": str(tmp_path / out_name), "output_format": "WAV",
            "normalization_threshold": 0.9, "amplification_threshold": 0.0,
            "sample_rate": 44100,
        }
        arch = {"batch_size": 2, "window_size": 512, "aggression": 5,
                "enable_tta": False, "enable_post_process": False,
                "post_process_threshold": 0.2, "high_end_process": False}
        sep = VRSeparator(common_config=common, arch_config=arch)
        sep._params = params
        sep._arch_size = 31191
        sep._offset = 128
        return sep

    solo = [make_sep("solo").separate(p) for p in paths]
    batch = make_sep("batch").separate_batch(paths)
    assert [sorted(map(os.path.basename, o)) for o in batch] == \
        [sorted(map(os.path.basename, o)) for o in solo]
    for s_files, b_files in zip(solo, batch):
        for s, b in zip(sorted(s_files), sorted(b_files)):
            a, _ = audio_io.load_audio(os.path.join(str(tmp_path / "solo"), s))
            c, _ = audio_io.load_audio(os.path.join(str(tmp_path / "batch"), b))
            assert a.shape == c.shape
            np.testing.assert_allclose(a, c, atol=1e-6, rtol=0)


def test_separator_device_vs_host_end_to_end(fixtures_dir, tmp_path, monkeypatch):
    """Full separate() A/B: AUDSEP_VR_CHAIN=host vs the device default must
    produce near-identical stems (same net, same file, real 1-band params)."""
    import torch

    import jax

    from audio_separator_tpu.architectures.vr import VRSeparator
    from audio_separator_tpu.io import audio as audio_io
    from audio_separator_tpu.models.vr_nets import state_dict_to_tree
    from torch_oracles.vr_oracle import CascadedASPPNetOracle

    from test_vr import SP_CAPS, _randomize

    oracle = _randomize(CascadedASPPNetOracle(2048, SP_CAPS, 31191), seed=9).eval()
    params = jax.device_put(state_dict_to_tree(
        {k: v.numpy() for k, v in oracle.state_dict().items()}))

    def run(mode, out_name):
        monkeypatch.setenv("AUDSEP_VR_CHAIN", mode)
        out_dir = str(tmp_path / out_name)
        common = {
            "logger": logging.getLogger("test"),
            "model_name": "ab-test", "model_path": str(tmp_path / "m.pth"),
            "model_data": {"vr_model_param": "1band_sr44100_hl512",
                           "primary_stem": "Instrumental"},
            "output_dir": out_dir, "output_format": "WAV",
            "normalization_threshold": 0.9, "amplification_threshold": 0.0,
            "sample_rate": 44100,
        }
        arch_cfg = {"batch_size": 2, "window_size": 512, "aggression": 5,
                    "enable_tta": True, "enable_post_process": False,
                    "post_process_threshold": 0.2, "high_end_process": False}
        sep = VRSeparator(common_config=common, arch_config=arch_cfg)
        sep._params = params
        sep._arch_size = 31191
        sep._offset = 128
        outs = sep.separate(os.path.join(fixtures_dir, "mardy20s.flac"))
        return {os.path.basename(p): os.path.join(out_dir, p) for p in outs}

    host_outs = run("host", "host")
    dev_outs = run("device", "device")
    assert set(host_outs) == set(dev_outs)
    for name in host_outs:
        a, _ = audio_io.load_audio(host_outs[name])
        b, _ = audio_io.load_audio(dev_outs[name])
        n = min(a.shape[-1], b.shape[-1])
        # same length modulo the final partial frame the two paths round
        assert abs(a.shape[-1] - b.shape[-1]) <= 1024
        snr = _snr_db(a[..., :n], b[..., :n])
        assert snr > 45, f"{name}: device chain SNR {snr:.1f} dB vs host"


def test_vr_separate_batch_groups_and_validates(fixtures_dir, tmp_path,
                                                monkeypatch):
    """Oversized groups process in _BATCH_GROUP sub-batches (bounding HBM
    held by pending jobs) with identical outputs, and a mismatched
    custom_output_names_list is rejected instead of silently dropping
    trailing jobs."""
    import logging

    import jax
    import pytest

    from audio_separator_tpu.architectures.vr import VRSeparator
    from audio_separator_tpu.io import audio as audio_io
    from audio_separator_tpu.models.vr_nets import state_dict_to_tree
    from torch_oracles.vr_oracle import CascadedASPPNetOracle

    from test_vr import SP_CAPS, _randomize

    monkeypatch.setenv("AUDSEP_VR_CHAIN", "device")
    oracle = _randomize(CascadedASPPNetOracle(2048, SP_CAPS, 31191),
                        seed=23).eval()
    params = jax.device_put(state_dict_to_tree(
        {k: v.numpy() for k, v in oracle.state_dict().items()}))

    rng = np.random.default_rng(11)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"in{i}.wav")
        audio_io.save_audio(p, (rng.standard_normal(
            (2, int(44100 * 1.1))) * 0.2).astype(np.float32), 44100)
        paths.append(p)

    def make_sep(out_name):
        common = {
            "logger": logging.getLogger("test"),
            "model_name": "grp-test", "model_path": str(tmp_path / "m.pth"),
            "model_data": {"vr_model_param": "1band_sr44100_hl512",
                           "primary_stem": "Instrumental"},
            "output_dir": str(tmp_path / out_name), "output_format": "WAV",
            "normalization_threshold": 0.9, "amplification_threshold": 0.0,
            "sample_rate": 44100,
        }
        arch = {"batch_size": 2, "window_size": 512, "aggression": 5,
                "enable_tta": False, "enable_post_process": False,
                "post_process_threshold": 0.2, "high_end_process": False}
        sep = VRSeparator(common_config=common, arch_config=arch)
        sep._params = params
        sep._arch_size = 31191
        sep._offset = 128
        return sep

    with pytest.raises(ValueError, match="2 entries for 3 files"):
        make_sep("x").separate_batch(paths, [None, None])

    sep = make_sep("grouped")
    monkeypatch.setattr(VRSeparator, "_BATCH_GROUP", 2)
    grouped = sep.separate_batch(paths)
    solo = [make_sep("solo").separate(p) for p in paths]
    assert len(grouped) == 3
    for s_files, g_files in zip(solo, grouped):
        for s, g in zip(sorted(s_files), sorted(g_files)):
            a, _ = audio_io.load_audio(os.path.join(str(tmp_path / "solo"), s))
            c, _ = audio_io.load_audio(
                os.path.join(str(tmp_path / "grouped"), g))
            np.testing.assert_allclose(a, c, atol=1e-6, rtol=0)
