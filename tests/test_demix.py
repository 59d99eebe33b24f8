"""Demix engine vs a numpy emulation of the reference chunk loop
(mdxc_separator.py:320-343 semantics: clamped tail, Hamming window,
counter-normalised overlap-add)."""

import numpy as np

import jax.numpy as jnp

from audio_separator_tpu.ops.demix import overlap_add_demix, window_positions
from audio_separator_tpu.ops.stft import hamming_window


def _model(chunks):
    """Toy separable 'model': stem0 = 0.5x, stem1 = -0.25x (shape-preserving)."""
    return jnp.stack([chunks * 0.5, chunks * -0.25], axis=1)


def _reference_loop(mix, chunk, step, window, num_stems):
    c, total = mix.shape
    result = np.zeros((num_stems, c, total), dtype=np.float32)
    counter = np.zeros((num_stems, c, total), dtype=np.float32)
    for i in range(0, total, step):
        start = i if i + chunk <= total else total - chunk
        part = mix[:, start : start + chunk]
        out = np.stack([part * 0.5, part * -0.25])
        result[..., start : start + chunk] += out * window
        counter[..., start : start + chunk] += window
    return result / np.maximum(counter, 1e-10)


def test_demix_matches_reference_loop():
    rng = np.random.default_rng(0)
    mix = rng.standard_normal((2, 10000)).astype(np.float32)
    chunk, step = 2048, 1500
    window = np.asarray(hamming_window(chunk))
    got = overlap_add_demix(_model, mix, chunk, step, window, num_stems=2, batch_size=2)
    ref = _reference_loop(mix, chunk, step, window, 2)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_demix_clamped_tail_duplicates():
    # step much smaller than chunk → many trailing clamped positions
    pos = window_positions(total=5000, chunk=4096, step=500)
    assert pos[0] == 0 and (pos[-1] == 5000 - 4096)
    assert (pos[2:] == 5000 - 4096).all()


def test_demix_short_input_pads():
    mix = np.ones((2, 1000), dtype=np.float32)
    window = np.ones(2048, dtype=np.float32)
    out = overlap_add_demix(_model, mix, 2048, 1024, window, num_stems=2)
    assert out.shape == (2, 2, 1000)
    np.testing.assert_allclose(out[0], 0.5 * mix, atol=1e-6)


def test_demix_sharded_matches_single_device():
    """Mesh path (chunk-batch DP over the 'data' axis) is numerically identical
    to the single-device scan."""
    import jax
    from audio_separator_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    mix = rng.standard_normal((2, 40000)).astype(np.float32)
    chunk, step = 4096, 3000
    window = np.asarray(hamming_window(chunk))

    base = overlap_add_demix(_model, mix, chunk, step, window,
                             num_stems=2, batch_size=2)
    mesh = make_mesh(n_devices=4, dp=4, tp=1)
    sharded = overlap_add_demix(_model, mix, chunk, step, window,
                                num_stems=2, batch_size=2, mesh=mesh)
    np.testing.assert_allclose(sharded, base, atol=1e-5)


def test_demix_sharded_with_tp_params():
    """DP demix composes with TP-sharded model params (dp=2 x tp=2 mesh)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from audio_separator_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(8)
    mix = rng.standard_normal((2, 30000)).astype(np.float32)
    chunk, step = 4096, 4096
    w = rng.standard_normal((chunk, 2 * chunk)).astype(np.float32) * 0.01
    w2 = rng.standard_normal((2 * chunk, chunk)).astype(np.float32) * 0.01

    def model(params, chunks):  # (B, C, chunk) -> (B, 2, C, chunk)
        h = jnp.maximum(chunks @ params["w1"], 0.0)
        y = h @ params["w2"]
        return jnp.stack([y, chunks - y], axis=1)

    window = np.ones(chunk, dtype=np.float32)
    base = overlap_add_demix(model, mix, chunk, step, window, num_stems=2,
                             batch_size=2, model_params={"w1": w, "w2": w2})

    mesh = make_mesh(n_devices=4, dp=2, tp=2)
    params = {
        "w1": jax.device_put(w, NamedSharding(mesh, P(None, "model"))),
        "w2": jax.device_put(w2, NamedSharding(mesh, P("model", None))),
    }
    sharded = overlap_add_demix(model, mix, chunk, step, window, num_stems=2,
                                batch_size=2, model_params=params, mesh=mesh)
    np.testing.assert_allclose(sharded, base, atol=1e-4)


def test_bucket_up_schedule():
    from audio_separator_tpu.ops.demix import bucket_up

    assert [bucket_up(i) for i in range(1, 8)] == [1, 2, 3, 4, 6, 6, 8]
    assert bucket_up(9) == 12 and bucket_up(13) == 16 and bucket_up(17) == 24
    assert bucket_up(5, quantum=4) == 8  # 2 units of 4
    assert bucket_up(33, quantum=2) == 24 * 2


def test_demix_bucketing_exact_across_lengths():
    """Shape bucketing (compile-cache reuse) never changes the output."""
    rng = np.random.default_rng(3)
    chunk, step = 2048, 1500
    window = np.asarray(hamming_window(chunk))
    for total in (3000, 9999, 10000, 17777, 26000):
        mix = rng.standard_normal((2, total)).astype(np.float32)
        exact = overlap_add_demix(_model, mix, chunk, step, window,
                                  num_stems=2, batch_size=2, bucket=False)
        bucketed = overlap_add_demix(_model, mix, chunk, step, window,
                                     num_stems=2, batch_size=2, bucket=True)
        np.testing.assert_allclose(bucketed, exact, atol=1e-6), total


def test_demix_pipelined_matches_single_scan():
    """Segment-pipelined dispatch (async H2D/compute/D2H overlap) is
    numerically equivalent to the one-scan path, for overlapping windows
    whose contributions straddle segment boundaries."""
    rng = np.random.default_rng(11)
    mix = rng.standard_normal((2, 50000)).astype(np.float32)
    chunk, step = 4096, 2500  # step < chunk: cross-segment overlap-add
    window = np.asarray(hamming_window(chunk))
    base = overlap_add_demix(_model, mix, chunk, step, window,
                             num_stems=2, batch_size=2)
    for k in (2, 3, 5):
        piped = overlap_add_demix(_model, mix, chunk, step, window,
                                  num_stems=2, batch_size=2,
                                  pipeline_segments=k)
        np.testing.assert_allclose(piped, base, atol=1e-5)


def test_demix_pipelined_dense_windows_and_divider():
    """Pipelined path with per-position window rows and an explicit host
    divider (the MDX tail semantics)."""
    rng = np.random.default_rng(12)
    mix = rng.standard_normal((2, 30000)).astype(np.float32)
    chunk, step = 4096, 3000
    positions = window_positions(30000, chunk, step)
    n = len(positions)
    windows = np.tile(np.asarray(hamming_window(chunk))[None], (n, 1))
    windows[-1, chunk // 2:] = 0.0  # uneven tail row
    divider = np.zeros(30000 + chunk, np.float32)
    for r, p in enumerate(positions):
        divider[p:p + chunk] += windows[r]
    divider = np.maximum(divider, 1e-10)
    base = overlap_add_demix(_model, mix, chunk, step, windows, num_stems=2,
                             batch_size=2, positions=positions, divider=divider)
    piped = overlap_add_demix(_model, mix, chunk, step, windows, num_stems=2,
                              batch_size=2, positions=positions,
                              divider=divider, pipeline_segments=3)
    np.testing.assert_allclose(piped, base, atol=1e-5)


def test_demix_fetch_stems_matches_full():
    """fetch_stems returns exactly the selected rows of the full result, in
    the requested order, through both the one-scan and pipelined paths and
    with quantized transfers (the single-stem D2H optimisation)."""
    rng = np.random.default_rng(17)
    mix = rng.standard_normal((2, 40000)).astype(np.float32)
    chunk, step = 4096, 2500
    window = np.asarray(hamming_window(chunk))
    full = overlap_add_demix(_model, mix, chunk, step, window,
                             num_stems=2, batch_size=2, pipeline_segments=1)
    for pipeline in (1, 3):
        for sel in ((0,), (1,), (1, 0)):
            got = overlap_add_demix(_model, mix, chunk, step, window,
                                    num_stems=2, batch_size=2,
                                    pipeline_segments=pipeline,
                                    fetch_stems=sel)
            assert got.shape == (len(sel), 2, 40000)
            np.testing.assert_allclose(got, full[list(sel)], atol=1e-5)
    # quantized transfer composes (device-side peak is over fetched rows only,
    # so compare within quantisation tolerance)
    q = overlap_add_demix(_model, mix, chunk, step, window, num_stems=2,
                          batch_size=2, pipeline_segments=3,
                          quantized_transfer=True, fetch_stems=(0,))
    assert np.abs(q[0] - full[0]).max() < 5e-4


def test_demix_quantized_upload_and_transfer():
    """int16 mix upload + int16 stem fetch stay within quantisation noise."""
    rng = np.random.default_rng(13)
    mix = rng.standard_normal((2, 20000)).astype(np.float32)
    chunk, step = 2048, 1500
    window = np.asarray(hamming_window(chunk))
    base = overlap_add_demix(_model, mix, chunk, step, window,
                             num_stems=2, batch_size=2)
    for k in (1, 3):
        q = overlap_add_demix(_model, mix, chunk, step, window,
                              num_stems=2, batch_size=2, pipeline_segments=k,
                              quantized_upload=True, quantized_transfer=True)
        err = np.abs(q - base).max()
        assert err < 5e-4, (k, err)


def test_demix_pipelined_composes_with_mesh():
    """Segment pipelining composes with chunk-batch DP over the mesh."""
    from audio_separator_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(21)
    mix = rng.standard_normal((2, 60000)).astype(np.float32)
    chunk, step = 4096, 3000
    window = np.asarray(hamming_window(chunk))
    base = overlap_add_demix(_model, mix, chunk, step, window,
                             num_stems=2, batch_size=2, pipeline_segments=1)
    mesh = make_mesh(n_devices=4, dp=4, tp=1)
    piped = overlap_add_demix(_model, mix, chunk, step, window,
                              num_stems=2, batch_size=4, mesh=mesh,
                              pipeline_segments=3)
    np.testing.assert_allclose(piped, base, atol=1e-5)


def test_tiled_mask_predict_tiles_and_padding():
    """Spectrogram tile engine (VR path): exact tiling, batch padding via
    dummy tail tiles, bucketed program shape."""
    import jax.numpy as jnp

    from audio_separator_tpu.ops.demix import tiled_mask_predict

    window, offset = 8, 2
    roi = window - 2 * offset

    def model(params, chunks):  # (B, C, F, window) -> (B, C, F, roi)
        return chunks[..., offset : window - offset] * 2.0

    c, f, n_tiles = 2, 3, 5
    t = 2 * offset + n_tiles * roi
    spec = np.arange(c * f * t, dtype=np.float32).reshape(c, f, t)
    mask = tiled_mask_predict(model, spec, window, offset, batch_size=2,
                              out_c=c, out_f=f, model_params={})
    want = np.concatenate(
        [spec[:, :, i * roi + offset : i * roi + offset + roi] * 2.0
         for i in range(n_tiles)], axis=-1)
    np.testing.assert_allclose(mask, want)

    # A longer track that buckets to the same padded count reuses the same
    # program shape; results still exact.
    n2 = 7
    t2 = 2 * offset + n2 * roi
    spec2 = np.linspace(-1, 1, c * f * t2, dtype=np.float32).reshape(c, f, t2)
    mask2 = tiled_mask_predict(model, spec2, window, offset, batch_size=2,
                               out_c=c, out_f=f, model_params={})
    want2 = np.concatenate(
        [spec2[:, :, i * roi + offset : i * roi + offset + roi] * 2.0
         for i in range(n2)], axis=-1)
    np.testing.assert_allclose(mask2, want2)


def test_demix_int8_transfer_within_tolerance():
    """Opt-in int8 stem fetch: quarter the D2H bytes, error bounded by the
    ~48 dB quantisation step (|err| <= peak/120 per sample, pre-normalise)."""
    rng = np.random.default_rng(17)
    mix = rng.standard_normal((2, 20000)).astype(np.float32)
    chunk, step = 2048, 1500
    window = np.asarray(hamming_window(chunk))
    base = overlap_add_demix(_model, mix, chunk, step, window,
                             num_stems=2, batch_size=2)
    peak = np.abs(base).max()
    for k in (1, 3):  # single-scan and pipelined paths
        q = overlap_add_demix(_model, mix, chunk, step, window,
                              num_stems=2, batch_size=2, pipeline_segments=k,
                              quantized_transfer="int8")
        err = np.abs(q - base).max()
        assert err < peak / 50, (k, err, peak)
        # int8 must actually differ from the int16 path (i.e. the branch ran)
        assert err > 1e-6, "int8 quantisation appears to be a no-op"


def test_demix_int8_upload_within_tolerance():
    """Opt-in int8 mix upload: quarter the H2D bytes; quantises the model's
    INPUT, so the error bound is the input step (peak/120) propagated through
    the (linear, bounded-gain) test model rather than an output-side step."""
    rng = np.random.default_rng(19)
    mix = rng.standard_normal((2, 20000)).astype(np.float32)
    chunk, step = 2048, 1500
    window = np.asarray(hamming_window(chunk))
    base = overlap_add_demix(_model, mix, chunk, step, window,
                             num_stems=2, batch_size=2)
    peak = np.abs(base).max()
    for k in (1, 3):  # single-scan and pipelined paths
        q = overlap_add_demix(_model, mix, chunk, step, window,
                              num_stems=2, batch_size=2, pipeline_segments=k,
                              quantized_upload="int8",
                              quantized_transfer="int8")
        err = np.abs(q - base).max()
        assert err < peak / 40, (k, err, peak)
        assert err > 1e-6, "int8 upload quantisation appears to be a no-op"


def test_link_quant_env_policy(monkeypatch):
    """AUDSEP_LINK_QUANT drives default transfer quantisation for callers
    that don't choose (production separations on bandwidth-starved hosts)."""
    rng = np.random.default_rng(23)
    mix = rng.standard_normal((2, 12000)).astype(np.float32)
    chunk, step = 2048, 1500
    window = np.asarray(hamming_window(chunk))

    def run():
        return overlap_add_demix(_model, mix, chunk, step, window,
                                 num_stems=2, batch_size=2)

    monkeypatch.delenv("AUDSEP_LINK_QUANT", raising=False)
    base = run()
    monkeypatch.setenv("AUDSEP_LINK_QUANT", "int8")
    q8 = run()
    err8 = np.abs(q8 - base).max()
    assert 1e-6 < err8 < np.abs(base).max() / 50  # quantised, within int8 bound
    monkeypatch.setenv("AUDSEP_LINK_QUANT", "int16")
    q16 = run()
    err16 = np.abs(q16 - base).max()
    assert 0 < err16 < 5e-4
    monkeypatch.setenv("AUDSEP_LINK_QUANT", "nonsense")
    np.testing.assert_array_equal(run(), base)  # unknown value = off


def test_auto_segments_minimises_padding():
    from audio_separator_tpu.ops.demix import _auto_segments, _segment_groups

    # 30 windows, batch 4: 4 segments of [8,8,8,6] -> 32 padded slots.
    k = _auto_segments(30, 4, cap=8, bucket=True)
    groups = _segment_groups(30, 4, k)
    assert [len(g) for g in groups] == [8, 8, 8, 6]
    # 30 windows, batch 6: 5 segments of 6 -> zero waste (a fixed
    # 2-batches-per-segment rule would pad 30 -> 36).
    k = _auto_segments(30, 6, cap=8, bucket=True)
    groups = _segment_groups(30, 6, k)
    assert [len(g) for g in groups] == [6] * 5
    # exact-divisor preference at larger n
    k = _auto_segments(100, 4, cap=8, bucket=True)
    groups = _segment_groups(100, 4, k)
    assert sum(len(g) for g in groups) == 100
    assert all(len(g) % 4 == 0 for g in groups)


def test_demix_disjoint_fast_drain_matches_general():
    """step == chunk (the flagship bench geometry): segments are disjoint and
    the quantized drain takes the direct-write fast path — results must match
    the unpipelined scan within quantisation noise."""
    rng = np.random.default_rng(29)
    chunk = 2048
    mix = rng.standard_normal((2, chunk * 10 + 123)).astype(np.float32)
    window = np.asarray(hamming_window(chunk))
    base = overlap_add_demix(_model, mix, chunk, chunk, window,
                             num_stems=2, batch_size=2, pipeline_segments=1)
    piped = overlap_add_demix(_model, mix, chunk, chunk, window,
                              num_stems=2, batch_size=2, pipeline_segments=3,
                              quantized_transfer=True, quantized_upload=True)
    assert np.abs(piped - base).max() < 5e-4
    # exact-cover case (total a multiple of chunk)
    mix2 = rng.standard_normal((2, chunk * 8)).astype(np.float32)
    base2 = overlap_add_demix(_model, mix2, chunk, chunk, window,
                              num_stems=2, batch_size=2, pipeline_segments=1)
    piped2 = overlap_add_demix(_model, mix2, chunk, chunk, window,
                               num_stems=2, batch_size=2, pipeline_segments=4,
                               quantized_transfer="int8",
                               quantized_upload="int8")
    assert np.abs(piped2 - base2).max() < np.abs(base2).max() / 40


def test_demix_mix_token_reuses_uploaded_segments():
    """Passing the same mix_token reuses device-resident mix segments (no
    re-quantise/re-upload) and yields identical results; a different token
    re-uploads. Guards the MDX match-mix / ensemble shared-file win."""
    from audio_separator_tpu.ops import demix as demix_mod

    rng = np.random.default_rng(31)
    mix = rng.standard_normal((2, 40000)).astype(np.float32)
    chunk, step = 4096, 2500
    window = np.asarray(hamming_window(chunk))
    demix_mod._mix_cache.clear()
    kw = dict(num_stems=2, batch_size=2, pipeline_segments=3,
              quantized_upload=True, quantized_transfer=True)
    first = overlap_add_demix(_model, mix, chunk, step, window,
                              mix_token=("t", 1), **kw)
    cache = demix_mod._mix_cache[("t", 1)]
    n_entries = len(cache)
    assert n_entries > 0
    cached_ids = {id(v[0]) for v in cache.values()}
    second = overlap_add_demix(_model, mix, chunk, step, window,
                               mix_token=("t", 1), **kw)
    assert {id(v[0]) for v in demix_mod._mix_cache[("t", 1)].values()} == cached_ids
    np.testing.assert_array_equal(first, second)
    # no token: nothing cached beyond the existing entry
    overlap_add_demix(_model, mix, chunk, step, window, **kw)
    assert list(demix_mod._mix_cache) == [("t", 1)]
    # LRU bound: a flood of tokens keeps at most _MIX_MAX_TOKENS entries
    for i in range(4):
        overlap_add_demix(_model, mix, chunk, step, window,
                          mix_token=("flood", i), **kw)
    assert len(demix_mod._mix_cache) <= demix_mod._MIX_MAX_TOKENS
    demix_mod._mix_cache.clear()


def test_demix_jobs_matches_solo_runs():
    """Cross-job window batching (demix_jobs): each job's slice equals its
    solo overlap_add_demix result — no window or OLA crosses a job boundary.
    Covers a short track (< chunk, clamped single window) in the middle."""
    from audio_separator_tpu.ops.demix import demix_jobs

    rng = np.random.default_rng(37)
    chunk, step = 2048, 1500
    window = np.asarray(hamming_window(chunk))
    mixes = [rng.standard_normal((2, n)).astype(np.float32)
             for n in (10000, 1200, 7321)]  # 1200 < chunk
    batched = demix_jobs(_model, mixes, chunk, step, window,
                         num_stems=2, batch_size=2)
    assert len(batched) == 3
    for mix, got in zip(mixes, batched):
        solo = overlap_add_demix(_model, mix, chunk, step, window,
                                 num_stems=2, batch_size=2)
        assert got.shape == solo.shape == (2, 2, mix.shape[1])
        np.testing.assert_allclose(got, solo, atol=2e-5)


def test_demix_jobs_single_and_empty():
    from audio_separator_tpu.ops.demix import demix_jobs

    assert demix_jobs(_model, [], 512, 256, np.ones(512, np.float32),
                      num_stems=2, batch_size=2) == []
    rng = np.random.default_rng(38)
    mix = rng.standard_normal((2, 3000)).astype(np.float32)
    window = np.asarray(hamming_window(512))
    one = demix_jobs(_model, [mix], 512, 256, window, num_stems=2, batch_size=2)
    solo = overlap_add_demix(_model, mix, 512, 256, window, num_stems=2,
                             batch_size=2)
    np.testing.assert_allclose(one[0], solo, atol=2e-5)


def test_demix_jobs_quant_peak_grouping():
    """Under link quantisation, jobs only share a pass with peak-compatible
    jobs: a quiet track (peak 0.004) next to a loud one (0.9) would other-
    wise quantise against the loud peak and lose ~47 dB vs its solo SNR.
    Each job must match its solo quantised run bit-for-bit (own group) or
    within the bounded-ratio tolerance (shared group)."""
    from audio_separator_tpu.ops.demix import demix_jobs

    rng = np.random.default_rng(11)
    chunk, step = 2048, 2048
    window = np.asarray(hamming_window(chunk))
    loud = (rng.standard_normal((2, 8000)) * 0.3).astype(np.float32)
    quiet = (rng.standard_normal((2, 6000)) * 0.001).astype(np.float32)
    batched = demix_jobs(_model, [loud, quiet], chunk, step, window,
                         num_stems=2, batch_size=2,
                         quantized_transfer="int8", quantized_upload="int8")
    for mix, got in zip([loud, quiet], batched):
        solo = overlap_add_demix(_model, mix, chunk, step, window,
                                 num_stems=2, batch_size=2,
                                 quantized_transfer="int8",
                                 quantized_upload="int8")
        err = np.linalg.norm(got - solo)
        ref = np.linalg.norm(solo)
        # disparate peaks -> own group -> identical quantisation grid
        assert err <= 1e-6 * max(ref, 1e-30), (err, ref)


def test_demix_jobs_similar_peaks_share_one_pass(monkeypatch):
    """Peak-compatible jobs still coalesce into ONE engine pass (the whole
    point); the quant grouping must not degrade that case."""
    from audio_separator_tpu.ops import demix as demix_mod

    calls = []
    orig = demix_mod.overlap_add_demix

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(demix_mod, "overlap_add_demix", counting)
    rng = np.random.default_rng(12)
    chunk, step = 2048, 2048
    window = np.asarray(hamming_window(chunk))
    mixes = [(rng.standard_normal((2, n)) * 0.3).astype(np.float32)
             for n in (8000, 6000, 7000)]
    out = demix_mod.demix_jobs(_model, mixes, chunk, step, window,
                               num_stems=2, batch_size=2,
                               quantized_transfer="int8",
                               quantized_upload="int8")
    assert len(out) == 3 and len(calls) == 1


def test_demix_geom_cache_keys_on_position_row_pairing():
    """Per-row windows: two calls with the same positions multiset but a
    different (position, window-row) pairing must NOT share a geometry-cache
    entry — the divider/window sums differ. Before the round-4 fix the key
    hashed sorted positions, so the second call silently reused the first's
    normalisation."""
    rng = np.random.default_rng(13)
    chunk, step = 1024, 700
    total = 4000
    mix = rng.standard_normal((2, total)).astype(np.float32)
    positions = window_positions(total, chunk, step)
    rows = np.stack([np.asarray(hamming_window(chunk)) * (0.5 + 0.5 * i)
                     for i in range(len(positions))]).astype(np.float32)
    perm = np.argsort(-positions, kind="stable")  # reversed pairing order

    def _nonpointwise(chunks):
        # a pointwise model cancels the window weights exactly (numerator
        # and divider scale together); rolling makes the pairing observable
        rolled = jnp.roll(chunks, 7, axis=-1)
        return jnp.stack([rolled * 0.5, rolled * -0.25], axis=1)

    def run(pos, win):
        return overlap_add_demix(_nonpointwise, mix, chunk, step, win,
                                 num_stems=2, batch_size=2,
                                 positions=pos.astype(np.int32))

    a = run(positions, rows)
    b = run(positions[perm], rows[perm])  # same pairing, permuted order
    np.testing.assert_allclose(a, b, atol=2e-5)
    c = run(positions, rows[perm])  # genuinely different pairing
    assert not np.allclose(a, c, atol=1e-3)


def test_demix_geom_cache_keys_on_group_layout():
    """Two calls over the SAME positions/window but different batch sizes
    split the windows into different contiguous groups (e.g. [10,10,10] at
    batch 2 x 3 segments vs [12,12,6] at batch 4 x 3 segments) with the same
    group COUNT — the geometry key must carry the group sizes, not just the
    count, or the second call reuses the first's per-segment window sums."""
    from audio_separator_tpu.ops import demix as demix_mod

    rng = np.random.default_rng(17)
    chunk, step = 1024, 700
    total = 21000  # exactly 30 windows
    mix = rng.standard_normal((2, total)).astype(np.float32)
    window = np.asarray(hamming_window(chunk))
    ref = _reference_loop(mix, chunk, step, window, 2)

    demix_mod._geom_cache.clear()
    for bs in (2, 4):
        out = overlap_add_demix(
            _model, mix, chunk, step, window, num_stems=2, batch_size=bs,
            quantized_transfer=True,  # device_norm path: wsegs are live
            pipeline_segments=3)
        np.testing.assert_allclose(out, ref, atol=5e-3)  # int16-link tol

    # the two layouts must occupy DISTINCT cache entries
    layouts = {key[3] for key in demix_mod._geom_cache}
    assert (10, 10, 10) in layouts, sorted(layouts)
    assert (12, 12, 6) in layouts, sorted(layouts)


def test_demix_pipelined_post_device_drain_matches_unpipelined():
    """post_device_fn with an explicit divider now rides the pipelined
    DEVICE drain (per-segment accumulators combine in HBM; one final
    normalise→post→quantise program, one fetch). Must equal the whole-buffer
    scan (pipeline_segments=1) exactly in f32 and within link tolerance in
    the quantised modes — this is the htdemucs shift-trick layout."""
    import jax
    import jax.numpy as jnp_

    rng = np.random.default_rng(23)
    span, n_shifts = 16000, 2
    offsets = [120, 900]
    length, pad_lead = 12000, 1500
    chunk, step = 2048, 1500
    mix = np.zeros((2, span * n_shifts), np.float32)
    track = rng.standard_normal((2, length + 1000)).astype(np.float32)
    for s, off in enumerate(offsets):
        mix[:, s * span + pad_lead: s * span + pad_lead + length + 1000] = \
            track
    pos_one = window_positions(span - chunk, chunk, step)
    positions = np.concatenate([pos_one + s * span for s in range(n_shifts)])
    n = len(positions)
    windows = np.tile(np.asarray(hamming_window(chunk))[None], (n, 1))
    divider = np.ones(span * n_shifts, np.float32)
    for r, p in enumerate(positions):
        divider[p:p + chunk] += windows[r]

    def post(acc):  # align + average the two shift regions (demucs trick)
        parts = []
        for s, off in enumerate(offsets):
            start = s * span + pad_lead + (900 - off)
            parts.append(jax.lax.dynamic_slice_in_dim(
                acc, start, length, axis=-1))
        return sum(parts) / n_shifts

    common = dict(num_stems=2, batch_size=2, positions=positions,
                  divider=divider, post_device_fn=post)
    base = overlap_add_demix(_model, mix, chunk, step, windows,
                             pipeline_segments=1, **common)
    piped = overlap_add_demix(_model, mix, chunk, step, windows,
                              pipeline_segments=4, **common)
    assert piped.shape == (2, 2, length)
    np.testing.assert_allclose(piped, base, atol=1e-5)

    # quantised modes keep the string/bool distinction through the drain
    for mode, tol in ((True, 5e-3), ("int8", 5e-2)):
        q = overlap_add_demix(_model, mix, chunk, step, windows,
                              pipeline_segments=4, quantized_transfer=mode,
                              quantized_upload=False, **common)
        np.testing.assert_allclose(q, base, atol=tol)

    # fetch_stems composes: selection happens before the post fn
    one = overlap_add_demix(_model, mix, chunk, step, windows,
                            pipeline_segments=4, fetch_stems=(1,), **common)
    np.testing.assert_allclose(one[0], base[1], atol=1e-5)


def test_demix_dev_geom_cache_reuses_uploads():
    """Dense window rows and the drain's inverse divider are device-cached
    across calls at the same geometry (they are ~100 MB-scale uploads at
    track lengths); a second call must hit the cache, and different
    geometry must miss."""
    from audio_separator_tpu.ops import demix as demix_mod

    rng = np.random.default_rng(29)
    mix = rng.standard_normal((2, 30000)).astype(np.float32)
    chunk, step = 2048, 1500
    positions = window_positions(30000, chunk, step)
    n = len(positions)
    windows = np.tile(np.asarray(hamming_window(chunk))[None], (n, 1))
    divider = np.ones(30000 + chunk, np.float32)
    for r, p in enumerate(positions):
        divider[p:p + chunk] += windows[r]

    def post(acc):
        return acc[..., :30000]

    demix_mod._dev_geom_cache.clear()
    kw = dict(num_stems=2, batch_size=2, positions=positions,
              divider=divider, post_device_fn=post, pipeline_segments=3)
    a = overlap_add_demix(_model, mix, chunk, step, windows, **kw)
    keys_after_first = set(demix_mod._dev_geom_cache)
    assert any(k[-1] == "invdiv" for k in keys_after_first)
    assert any(k[-2] == "win" for k in keys_after_first if len(k) > 2)
    b = overlap_add_demix(_model, mix, chunk, step, windows, **kw)
    assert set(demix_mod._dev_geom_cache) == keys_after_first  # pure hits
    np.testing.assert_allclose(a, b, atol=0)


def test_demix_post_fn_mesh_and_no_divider_fall_back():
    """The pipelined device drain requires an explicit divider on a single
    device; with a mesh, or without a divider, a post_device_fn must still
    run (whole-buffer scan) and match the drained result."""
    import jax
    from audio_separator_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(31)
    mix = rng.standard_normal((2, 30000)).astype(np.float32)
    chunk, step = 2048, 1500
    positions = window_positions(30000, chunk, step)
    n = len(positions)
    windows = np.tile(np.asarray(hamming_window(chunk))[None], (n, 1))
    divider = np.ones(30000 + chunk, np.float32)
    for r, p in enumerate(positions):
        divider[p:p + chunk] += windows[r]

    def post(acc):
        return acc[..., :30000]

    kw = dict(num_stems=2, batch_size=2, positions=positions,
              post_device_fn=post, pipeline_segments=4)
    drained = overlap_add_demix(_model, mix, chunk, step, windows,
                                divider=divider, **kw)
    mesh = make_mesh(n_devices=4, dp=4, tp=1)
    meshed = overlap_add_demix(_model, mix, chunk, step, windows,
                               divider=divider, mesh=mesh, **kw)
    np.testing.assert_allclose(meshed, drained, atol=1e-5)

    # no divider: post fn runs after the device-wsum normalisation
    shared = np.asarray(hamming_window(chunk))
    no_div = overlap_add_demix(_model, mix, chunk, step, shared,
                               num_stems=2, batch_size=2,
                               post_device_fn=post, pipeline_segments=4)
    plain = overlap_add_demix(_model, mix, chunk, step, shared,
                              num_stems=2, batch_size=2)
    np.testing.assert_allclose(no_div, plain[..., :30000], atol=1e-5)


def test_drain_concurrent_callers_share_device_cache_safely():
    """Serving workers run the engine concurrently: two threads driving the
    SAME drained geometry must share the device geometry cache (non-donated
    inputs) without corrupting each other's donated accumulators."""
    import threading

    rng = np.random.default_rng(41)
    chunk, step = 2048, 1500
    total = 30000
    positions = window_positions(total, chunk, step)
    n = len(positions)
    windows = np.tile(np.asarray(hamming_window(chunk))[None], (n, 1))
    divider = np.ones(total + chunk, np.float32)
    for r, p in enumerate(positions):
        divider[p:p + chunk] += windows[r]

    def post(acc):
        return acc[..., :total]

    mixes = [rng.standard_normal((2, total)).astype(np.float32)
             for _ in range(4)]
    kw = dict(num_stems=2, batch_size=2, positions=positions,
              divider=divider, post_device_fn=post, pipeline_segments=3)
    expected = [overlap_add_demix(_model, m, chunk, step, windows, **kw)
                for m in mixes]

    results = [None] * len(mixes)
    errors = []

    def worker(i):
        try:
            results[i] = overlap_add_demix(_model, mixes[i], chunk, step,
                                           windows, **kw)
        except Exception as exc:  # pragma: no cover - failure reporting
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(mixes))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    for got, want in zip(results, expected):
        np.testing.assert_allclose(got, want, atol=1e-5)
