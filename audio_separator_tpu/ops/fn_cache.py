"""Process-level model_fn registry: stable jit identities across Separators.

The demix engines take ``model_fn`` as a *static* jit argument, so the
compiled-program cache keys on the function's identity. Memoizing the
closure per separator instance (the original design) is enough for one
`Separator` separating many files — but serving builds a fresh `Separator`
per job (remote/server.py) and ensembles reload models, and every fresh
closure for the *same* model re-traced and re-compiled the whole program
(30 s-minutes per job on a tethered TPU).

This registry keys builders on the model's semantic identity (config
dataclass / checkpoint path + execution dtype + geometry) so any number of
separator instances share one function object — and therefore one compiled
executable per program shape. Builders must only close over values derived
from the key (configs, dtypes, parsed graphs), never over the separator
instance or its parameter tree (params are threaded through the jit as
arguments; capturing them would both pin memory and bake weights into the
HLO).

Bounded LRU: evicting a function only drops the *identity*; jax's own jit
cache keeps the compiled executable until it is itself evicted, so a
re-built fn for a hot model merely costs one re-trace.
"""

from __future__ import annotations

from collections import OrderedDict
from threading import Lock
from typing import Any, Callable, Hashable

_MAX_ENTRIES = 32
_cache: "OrderedDict[Hashable, Callable]" = OrderedDict()
_lock = Lock()


def _memoize(cache: OrderedDict, max_entries: int, key: Hashable,
             builder: Callable[[], Any]) -> Any:
    with _lock:
        hit = cache.get(key)
        if hit is not None:
            cache.move_to_end(key)
            return hit
    value = builder()
    with _lock:
        existing = cache.get(key)
        if existing is not None:  # lost a race: keep the first identity
            return existing
        cache[key] = value
        while len(cache) > max_entries:
            cache.popitem(last=False)
    return value


def memoized_model_fn(key: Hashable, builder: Callable[[], Callable]) -> Callable:
    """Return the process-wide function for ``key``, building it on miss."""
    return _memoize(_cache, _MAX_ENTRIES, key, builder)


# Per-track device-post closures (e.g. the demucs shift-average, keyed on
# exact track geometry) churn far faster than model fns on varied-length
# workloads — a 30-track batch folder would flush the whole model_fn LRU
# above, and every evicted model_fn identity costs a full demix-scan
# recompile (minutes on a tethered link). Separate small LRU.
_MAX_POST_ENTRIES = 8
_post_cache: "OrderedDict[Hashable, Callable]" = OrderedDict()


def memoized_post_fn(key: Hashable, builder: Callable[[], Callable]) -> Callable:
    """Stable identity for per-track ``post_device_fn`` closures."""
    return _memoize(_post_cache, _MAX_POST_ENTRIES, key, builder)


# ---------------------------------------------------------------------------
# Device-resident parameter cache. load_model device_puts the whole weight
# tree; serving (a fresh Separator per job) re-shipped ~0.5 GB over the link
# for every job of the same model. Keyed on (path, size, mtime) so an updated
# checkpoint invalidates; small LRU bounds HBM held by idle models. Evicted
# trees free as soon as no live separator references them.

_MAX_PARAM_ENTRIES = 8  # a demucs bag alone holds 4 member trees
_param_cache: "OrderedDict[Hashable, Any]" = OrderedDict()


def file_key(path: str) -> Hashable:
    """(abspath, size, mtime) — a cheap content identity for a checkpoint."""
    import os

    st = os.stat(path)
    return (os.path.abspath(path), st.st_size, int(st.st_mtime))


def memoized_device_params(key: Hashable, builder: Callable[[], Any]) -> Any:
    """Process-wide device-resident weight tree for ``key``."""
    return _memoize(_param_cache, _MAX_PARAM_ENTRIES, key, builder)


# ---------------------------------------------------------------------------
# Persistent (on-disk) XLA compile cache. The two caches above make compiled
# programs survive across Separator instances *within* a process; this makes
# them survive across processes. Serving cold-start without it pays the full
# XLA compile of every demix geometry per worker process (measured: the
# first coalesced-batch geometry cost ~100 s inside a serving window —
# /tmp/serving_sweep_r4.log workers=1 coalesce=4). The reference has no
# equivalent (torch/ORT manage their own kernel caches); for an XLA-backed
# framework this is part of the runtime's job.

_cache_configured = False


def enable_persistent_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    Resolution order: explicit ``path`` arg → ``JAX_COMPILATION_CACHE_DIR``
    (jax's own env, honoured by leaving config alone) → ``AUDSEP_COMPILE_CACHE``
    (a path, or ``off``/``0`` to disable) → ``~/.cache/audio_separator_tpu/xla``.
    Idempotent; returns the directory in use (None when disabled). Safe to
    call after jax is initialised — only affects compiles that haven't
    happened yet.
    """
    global _cache_configured
    import os

    if _cache_configured:
        return _cache_configured if isinstance(_cache_configured, str) else None
    if path is None:
        if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            _cache_configured = os.environ["JAX_COMPILATION_CACHE_DIR"]
            return _cache_configured  # jax reads its own env var itself
        env = os.environ.get("AUDSEP_COMPILE_CACHE", "")
        if env.lower() in ("off", "0", "none"):
            _cache_configured = True
            return None
        path = env or os.path.join(
            os.path.expanduser("~"), ".cache", "audio_separator_tpu", "xla")
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Demix programs take seconds-to-minutes to compile and are worth
        # persisting; sub-second utility compiles would only bloat the dir.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _cache_configured = path
        return path
    except Exception:  # pragma: no cover - unwritable dir / old jax
        _cache_configured = True
        return None
