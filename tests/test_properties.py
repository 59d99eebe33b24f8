"""Property-based invariants (hypothesis) for the DSP core and demix engine.

Shapes are drawn from small bounded sets: every distinct shape costs an
XLA:CPU compile, so strategies sample geometry from a handful of values and
put the randomness into signal content and length arithmetic instead.
"""

import numpy as np
from hypothesis import example, given, settings, strategies as st

import jax.numpy as jnp

from audio_separator_tpu.ops.demix import bucket_up, overlap_add_demix, window_positions
from audio_separator_tpu.ops.resample import resample_poly_np
from audio_separator_tpu.ops.stft import hamming_window, hann_window, istft, stft

COMMON = dict(deadline=None, max_examples=20)


# ---------------------------------------------------------------------------
# STFT round trip: any length, the torch-compatible pair reconstructs.


@settings(**COMMON)
@given(
    seed=st.integers(0, 2**31 - 1),
    geometry=st.sampled_from([(256, 64), (256, 128), (512, 128)]),
    length=st.integers(300, 2000),
)
# Hypothesis-discovered: at these lengths the final frame's overlap
# normalisation divides by a small window sum, amplifying fp32 rounding
# (length 379: ~2.9e-5 abs; length 893: 6.0e-5 abs on an O(1) sample,
# 5.0e-5 relative — torch.istft shows the same order at those samples).
# Tolerance calibration, not a reconstruction bug: near-zero samples are
# bounded by atol 5e-5, large samples by rtol 4e-4 (~24x f32 eps; the
# seed-3/length-1279 example reached 2.9e-4 relative on ONE sample via the
# same end-frame OLA-divide amplification). A genuine reconstruction
# regression is orders of magnitude above either bound; the pinned
# length-379 case below keeps the original atol-only sensitivity.
@example(seed=0, geometry=(256, 128), length=379)
@example(seed=0, geometry=(256, 128), length=893)
@example(seed=3, geometry=(256, 128), length=1279)
def test_stft_istft_roundtrip(seed, geometry, length):
    n_fft, hop = geometry
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((1, length)).astype(np.float32)
    win = hann_window(n_fft)
    spec = stft(jnp.asarray(x), n_fft, hop, win)
    y = np.asarray(istft(spec, n_fft, hop, win, length=length))
    np.testing.assert_allclose(y[0], x[0], atol=5e-5, rtol=4e-4)


def test_stft_istft_roundtrip_pinned_tight():
    """The original pinned length-379 case at the pre-r3 atol-only bound:
    keeps the tight sensitivity the property test traded for rtol headroom."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 379)).astype(np.float32)
    win = hann_window(256)
    spec = stft(jnp.asarray(x), 256, 128, win)
    y = np.asarray(istft(spec, 256, 128, win, length=379))
    np.testing.assert_allclose(y[0], x[0], atol=5e-5)


# ---------------------------------------------------------------------------
# Resampler: up then back down preserves a band-limited signal.


@settings(**COMMON)
@given(
    seed=st.integers(0, 2**31 - 1),
    rates=st.sampled_from([(44100, 48000), (44100, 32000), (44100, 22050)]),
)
def test_resample_roundtrip_preserves_bandlimited(seed, rates):
    sr, sr2 = rates
    rng = np.random.default_rng(seed)
    # Band-limited: sum of tones well below the lower Nyquist.
    t = np.arange(sr // 4) / sr
    freqs = rng.uniform(100, min(sr, sr2) * 0.3, size=4)
    x = np.sum([np.sin(2 * np.pi * f * t) for f in freqs], axis=0)[None]
    x = (x / np.abs(x).max()).astype(np.float32)
    y = resample_poly_np(resample_poly_np(x, sr, sr2), sr2, sr)
    n = min(x.shape[1], y.shape[1]) - sr // 50  # ignore edge transients
    lo = sr // 100
    corr = np.corrcoef(x[0, lo:n], y[0, lo:n])[0, 1]
    assert corr > 0.999, (rates, corr)


# ---------------------------------------------------------------------------
# Demix engine: with an identity model and full coverage, output == input for
# ANY (length, chunk, step) combination — windowing, bucketing, batching,
# tail clamping, pipelining and normalisation must all cancel exactly.


def _identity(chunks):
    return chunks[:, None]  # (B, C, L) -> (B, 1, C, L)


@settings(deadline=None, max_examples=15)
@given(
    seed=st.integers(0, 2**31 - 1),
    chunk=st.sampled_from([1024, 2048]),
    step_frac=st.sampled_from([2, 3, 4]),
    extra=st.integers(0, 3000),
    pipeline=st.sampled_from([1, 3]),
)
def test_identity_model_reconstructs_exactly(seed, chunk, step_frac, extra, pipeline):
    rng = np.random.default_rng(seed)
    total = chunk + extra  # always >= one chunk
    mix = rng.standard_normal((2, total)).astype(np.float32)
    step = chunk // step_frac
    # Hamming (nonzero at the edges) like the production MDXC path: a window
    # that is zero at its endpoints (hann) leaves the first/last sample with
    # zero total weight, which the engine maps to silence by contract.
    window = np.asarray(hamming_window(chunk))
    out = overlap_add_demix(_identity, mix, chunk, step, window, num_stems=1,
                            batch_size=2, pipeline_segments=pipeline)
    assert out.shape == (1, 2, total)
    np.testing.assert_allclose(out[0], mix, atol=3e-5)


# ---------------------------------------------------------------------------
# Window positions + buckets: structural invariants.


@settings(**COMMON)
@given(total=st.integers(1, 10**6), chunk=st.sampled_from([1024, 4096]),
       step=st.integers(100, 5000))
def test_window_positions_cover_track(total, chunk, step):
    # Production invariant (every caller clamps, matching the reference's
    # loop): step never exceeds the chunk.
    step = min(step, chunk)
    pos = window_positions(total, chunk, step)
    assert pos[0] == 0 and (np.diff(pos) >= 0).all()
    if total > chunk:
        assert pos[-1] == total - chunk  # tail always reaches the end
        assert (pos + chunk <= total).all()
    # consecutive positions never leave a gap
    assert (np.diff(pos) <= step).all()


@settings(**COMMON)
@given(n=st.integers(1, 10**6), quantum=st.sampled_from([1, 7, 64]))
def test_bucket_up_bounds(n, quantum):
    b = bucket_up(n, quantum)
    assert b >= n and b % quantum == 0
    # wasted work is bounded by ~50%
    assert b <= max(2 * n, 4 * quantum)


# ---------------------------------------------------------------------------
# Ensembler: algebraic invariants across all 11 algorithms.


@settings(**COMMON)
@given(
    seed=st.integers(0, 2**31 - 1),
    algorithm=st.sampled_from(
        ["avg_wave", "median_wave", "min_wave", "max_wave", "avg_fft",
         "median_fft", "min_fft", "max_fft", "uvr_max_spec", "uvr_min_spec",
         "ensemble_wav"]),
    n_members=st.integers(2, 4),
)
def test_ensemble_of_identical_members_is_identity(seed, algorithm, n_members):
    """Every algorithm must return (approximately) the common waveform when
    all members are identical — combination can't invent content."""
    from audio_separator_tpu.separator.ensembler import Ensembler

    rng = np.random.default_rng(seed)
    wav = rng.standard_normal((2, 8192)).astype(np.float32) * 0.3
    out = Ensembler(algorithm=algorithm).ensemble([wav.copy() for _ in range(n_members)])
    assert out.shape == wav.shape
    # fft/spec algorithms round-trip an STFT — allow its reconstruction error
    np.testing.assert_allclose(out, wav, atol=2e-4)


@settings(**COMMON)
@given(seed=st.integers(0, 2**31 - 1), n_members=st.integers(2, 4))
def test_wave_ensembles_respect_envelope(seed, n_members):
    """min/max/avg_wave stay inside the members' pointwise envelope."""
    from audio_separator_tpu.separator.ensembler import Ensembler

    rng = np.random.default_rng(seed)
    wavs = [rng.standard_normal((2, 4096)).astype(np.float32)
            for _ in range(n_members)]
    stack = np.stack(wavs)
    avg = Ensembler(algorithm="avg_wave").ensemble(wavs)
    lo, hi = stack.min(axis=0), stack.max(axis=0)
    assert (avg >= lo - 1e-6).all() and (avg <= hi + 1e-6).all()


# ---------------------------------------------------------------------------
# WAV writer/reader: lossless-path round trip at random lengths/bit depths.


@settings(**COMMON)
@given(
    seed=st.integers(0, 2**31 - 1),
    length=st.integers(1, 50000),
    bit_depth=st.sampled_from([16, 24, 32]),
    channels=st.sampled_from([1, 2]),
)
def test_wav_roundtrip_any_length(seed, length, bit_depth, channels, tmp_path_factory):
    from audio_separator_tpu.io import audio as audio_io

    rng = np.random.default_rng(seed)
    pcm = (rng.standard_normal((channels, length)) * 0.5).astype(np.float32)
    pcm = np.clip(pcm, -1.0, 1.0)
    path = str(tmp_path_factory.mktemp("wavprop") / "x.wav")
    audio_io.save_audio(path, pcm, 44100, bit_depth=bit_depth)
    back, sr = audio_io.load_audio(path)
    assert sr == 44100 and back.shape == pcm.shape
    np.testing.assert_allclose(back, pcm, atol=2.0 ** -(bit_depth - 2))


# ---------------------------------------------------------------------------
# RoFormer config normalizer: encoding-independence and idempotency
# (counterpart of the reference's 2.4k-LoC validation subsystem contract).


_ALIAS_CHOICES = {
    "stft_n_fft": ["n_fft", "stft_n_fft"],
    "stft_hop_length": ["hop_length", "stft_hop_length"],
    "heads": ["heads", "n_heads", "num_heads"],
    "dim_head": ["dim_head", "head_dim"],
}


@settings(**COMMON)
@given(
    alias_pick=st.tuples(*(st.sampled_from(v) for v in _ALIAS_CHOICES.values())),
    as_string=st.booleans(),
    stereo_repr=st.sampled_from([True, "true", "1", "yes", 1]),
)
def test_normalizer_is_encoding_independent(alias_pick, as_string, stereo_repr):
    """Whatever alias names and value encodings (int vs numeric string vs
    bool spellings) a YAML uses, normalisation lands the same canonical
    typed dict — and is idempotent."""
    from audio_separator_tpu.separator.roformer_config import (
        normalize_roformer_params)

    canonical_keys = list(_ALIAS_CHOICES)
    values = [2048, 512, 8, 64]
    cfg = {}
    for key, alias, value in zip(canonical_keys, alias_pick, values):
        cfg[alias] = str(value) if as_string else value
    cfg["stereo"] = stereo_repr
    cfg["dim"] = "384" if as_string else 384

    out = normalize_roformer_params(cfg)
    for key, value in zip(canonical_keys, values):
        assert out[key] == value and isinstance(out[key], int), (key, out)
    assert out["stereo"] is True
    assert out["dim"] == 384
    assert normalize_roformer_params(out) == out  # idempotent


@settings(**COMMON)
@given(hop_alias_value=st.integers(1, 10000))
def test_canonical_key_beats_alias(hop_alias_value):
    from audio_separator_tpu.separator.roformer_config import (
        normalize_roformer_params)

    out = normalize_roformer_params(
        {"hop_length": hop_alias_value, "stft_hop_length": 441})
    assert out["stft_hop_length"] == 441


@settings(**COMMON)
@given(
    freqs=st.lists(st.integers(1, 256), min_size=2, max_size=8),
    encoding=st.sampled_from(["list", "tuple", "str", "paren_str"]),
)
def test_freqs_per_bands_encodings(freqs, encoding):
    from audio_separator_tpu.separator.roformer_config import (
        normalize_roformer_params)

    value = {
        "list": list(freqs),
        "tuple": tuple(freqs),
        "str": ",".join(map(str, freqs)),
        "paren_str": "(" + ", ".join(map(str, freqs)) + ")",
    }[encoding]
    out = normalize_roformer_params({"freqs_per_bands": value})
    assert out["freqs_per_bands"] == tuple(freqs), (encoding, out)


# ---------------------------------------------------------------------------
# Pipelined device drain: for any shift-style layout (dense rows, explicit
# divider, a post fn that slices/averages disjoint regions), the drained
# pipelined path must equal the whole-buffer scan.


@settings(deadline=None, max_examples=12)
@given(
    seed=st.integers(0, 2**31 - 1),
    span_windows=st.sampled_from([6, 9]),
    n_regions=st.sampled_from([2, 3]),
    pipeline=st.sampled_from([2, 4]),
)
def test_pipelined_post_drain_matches_whole_scan(seed, span_windows,
                                                 n_regions, pipeline):
    import jax

    rng = np.random.default_rng(seed)
    chunk, step = 1024, 700
    span = step * span_windows + chunk  # region span, windows fully inside
    length = step * (span_windows - 2)  # post-slice length, < span
    lead = int(rng.integers(0, chunk // 2))
    offsets = [int(rng.integers(0, 64)) for _ in range(n_regions)]

    mix = np.zeros((2, span * n_regions), np.float32)
    track = rng.standard_normal((2, length + 64)).astype(np.float32)
    for s, off in enumerate(offsets):
        lo = s * span + lead
        mix[:, lo: lo + length + 64] = track
    pos_one = window_positions(span - chunk, chunk, step)
    positions = np.concatenate(
        [pos_one + s * span for s in range(n_regions)]).astype(np.int32)
    windows = np.tile(np.asarray(hamming_window(chunk))[None],
                      (len(positions), 1))
    divider = np.ones(span * n_regions, np.float32)
    for r, p in enumerate(positions):
        divider[p: p + chunk] += windows[r]

    def post(acc):
        parts = [jax.lax.dynamic_slice_in_dim(
            acc, s * span + lead + (63 - off), length, axis=-1)
            for s, off in enumerate(offsets)]
        return sum(parts) / n_regions

    common = dict(num_stems=1, batch_size=2, positions=positions,
                  divider=divider, post_device_fn=post)
    base = overlap_add_demix(_identity, mix, chunk, step, windows,
                             pipeline_segments=1, **common)
    piped = overlap_add_demix(_identity, mix, chunk, step, windows,
                              pipeline_segments=pipeline, **common)
    assert piped.shape == base.shape == (1, 2, length)
    np.testing.assert_allclose(piped, base, atol=1e-5)
