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
from typing import Callable, Hashable

_MAX_ENTRIES = 32
_cache: "OrderedDict[Hashable, Callable]" = OrderedDict()
_lock = Lock()


def memoized_model_fn(key: Hashable, builder: Callable[[], Callable]) -> Callable:
    """Return the process-wide function for ``key``, building it on miss."""
    with _lock:
        fn = _cache.get(key)
        if fn is not None:
            _cache.move_to_end(key)
            return fn
    fn = builder()
    with _lock:
        existing = _cache.get(key)
        if existing is not None:  # lost a race: keep the first identity
            return existing
        _cache[key] = fn
        while len(_cache) > _MAX_ENTRIES:
            _cache.popitem(last=False)
    return fn
