"""Structured timing + optional device tracing.

The reference's observability is wall-clock log lines around model load and
separation (ref: audio_separator/separator/separator.py:852,933,1016,1043)
plus tqdm bars in the demix loops. The TPU-native equivalent adds:

* :class:`PhaseTimer` — named phase accounting (load / decode / demix /
  encode) with a machine-readable summary, so RTF regressions can be
  attributed to a phase instead of a single opaque duration.
* :func:`device_trace` — optional ``jax.profiler`` trace context writing a
  TensorBoard-loadable trace directory when enabled (``AUDIO_SEPARATOR_TRACE``
  env var or the ``trace_dir`` argument). Zero overhead when disabled.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Dict, Optional

__all__ = ["PhaseTimer", "device_trace"]


class PhaseTimer:
    """Accumulates named wall-clock phases.

    Usage::

        timer = PhaseTimer(logger)
        with timer.phase("demix"):
            ...
        logger.info(timer.summary())
    """

    def __init__(self, logger: Optional[logging.Logger] = None):
        self.logger = logger
        self.durations: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.durations[name] = self.durations.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            if self.logger:
                self.logger.debug(f"phase {name}: {dt*1e3:.1f} ms")

    def summary(self) -> str:
        total = sum(self.durations.values())
        parts = [f"{k}={v*1e3:.0f}ms" for k, v in sorted(
            self.durations.items(), key=lambda kv: -kv[1])]
        return f"phases: {' '.join(parts)} (total {total*1e3:.0f}ms)"

    def as_dict(self) -> Dict[str, float]:
        return dict(self.durations)

    def dump_json(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump({"durations_s": self.durations, "counts": self.counts}, f)


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str] = None,
                 logger: Optional[logging.Logger] = None):
    """Optionally capture a ``jax.profiler`` device trace.

    Enabled when ``trace_dir`` is given or ``AUDIO_SEPARATOR_TRACE`` is set;
    otherwise a no-op. The trace directory loads in TensorBoard's profile
    plugin (XLA op-level timeline for the jitted demix programs).
    """
    target = trace_dir or os.environ.get("AUDIO_SEPARATOR_TRACE")
    if not target:
        yield
        return
    import jax

    os.makedirs(target, exist_ok=True)
    if logger:
        logger.info(f"capturing jax profiler trace to {target}")
    with jax.profiler.trace(target):
        yield
