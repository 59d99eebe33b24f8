"""Process-level model_fn registry: identity stability across instances."""

import os

import numpy as np

from audio_separator_tpu.ops.fn_cache import memoized_model_fn


def test_same_key_same_identity():
    built = []

    def builder():
        fn = lambda p, x: x  # noqa: E731
        built.append(fn)
        return fn

    a = memoized_model_fn(("k", 1), builder)
    b = memoized_model_fn(("k", 1), builder)
    assert a is b and len(built) == 1
    c = memoized_model_fn(("k", 2), builder)
    assert c is not a and len(built) == 2


def test_lru_eviction_rebuilds():
    from audio_separator_tpu.ops import fn_cache

    calls = []
    for i in range(fn_cache._MAX_ENTRIES + 5):
        memoized_model_fn(("evict", i), lambda i=i: calls.append(i) or (lambda: i))
    # oldest keys evicted; rebuilding one calls the builder again
    n = len(calls)
    memoized_model_fn(("evict", 0), lambda: calls.append("rebuilt") or (lambda: 0))
    assert calls[-1] == "rebuilt" and len(calls) == n + 1


def test_separators_share_model_fn_identity(tmp_path):
    """Two fresh Separator instances loading the same checkpoint (the remote
    server's per-job pattern) must share one model_fn object — otherwise the
    demix program recompiles per job."""
    import logging
    import os

    from audio_separator_tpu.separator import Separator
    from test_ensemble_e2e import _make_model

    model_dir = str(tmp_path / "models")
    os.makedirs(model_dir)
    name = _make_model(model_dir, "shared", seed=2)

    def load():
        sep = Separator(log_level=logging.WARNING, model_file_dir=model_dir,
                        output_dir=str(tmp_path / "out"), output_format="WAV")
        sep.load_model(name)
        return sep

    s1, s2 = load(), load()
    assert s1.model_instance is not s2.model_instance
    assert s1.model_instance._model_fn() is s2.model_instance._model_fn()


def test_persistent_compile_cache_config(tmp_path, monkeypatch):
    """enable_persistent_compile_cache points jax at a durable dir (so serving
    cold-start skips re-compiling every demix geometry per process), honours
    the off switch, and is idempotent."""
    import jax

    from audio_separator_tpu.ops import fn_cache

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_flag = fn_cache._cache_configured
    monkeypatch.setenv("AUDSEP_COMPILE_CACHE", "off")
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    try:
        # off switch: no config touched
        fn_cache._cache_configured = False
        assert fn_cache.enable_persistent_compile_cache() is None

        # explicit path wins, dir is created, config applied, idempotent after
        fn_cache._cache_configured = False
        target = str(tmp_path / "xla_cache")
        assert fn_cache.enable_persistent_compile_cache(target) == target
        assert os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == target
        other = str(tmp_path / "other")
        assert fn_cache.enable_persistent_compile_cache(other) == target
        assert not os.path.exists(other)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        fn_cache._cache_configured = prev_flag


def test_separators_share_device_params(tmp_path):
    """Weights upload once per process for a given checkpoint — fresh
    Separator instances reuse the device-resident tree."""
    import logging
    import os

    import jax

    from audio_separator_tpu.separator import Separator
    from test_ensemble_e2e import _make_model

    model_dir = str(tmp_path / "models")
    os.makedirs(model_dir)
    name = _make_model(model_dir, "devshare", seed=6)

    def load():
        sep = Separator(log_level=logging.WARNING, model_file_dir=model_dir,
                        output_dir=str(tmp_path / "out"), output_format="WAV")
        sep.load_model(name)
        return sep

    s1, s2 = load(), load()
    leaves1 = jax.tree.leaves(s1.model_instance.params)
    leaves2 = jax.tree.leaves(s2.model_instance.params)
    assert all(a is b for a, b in zip(leaves1, leaves2))
