"""Structured timing + device trace hook (SURVEY §5 observability plan)."""

import logging
import os

import numpy as np

from audio_separator_tpu.utils.profiling import PhaseTimer, device_trace


def test_phase_timer_accumulates_and_summarises():
    t = PhaseTimer(logging.getLogger("t"))
    with t.phase("demix"):
        pass
    with t.phase("demix"):
        pass
    with t.phase("encode"):
        pass
    assert t.counts["demix"] == 2
    assert set(t.as_dict()) == {"demix", "encode"}
    s = t.summary()
    assert "demix=" in s and "total" in s


def test_phase_timer_dump_json(tmp_path):
    t = PhaseTimer()
    with t.phase("x"):
        pass
    p = str(tmp_path / "phases.json")
    t.dump_json(p)
    import json
    data = json.load(open(p))
    assert "x" in data["durations_s"]


def test_device_trace_noop_when_disabled():
    env = os.environ.pop("AUDIO_SEPARATOR_TRACE", None)
    try:
        with device_trace(None):
            x = np.ones(4).sum()
        assert x == 4.0
    finally:
        if env is not None:
            os.environ["AUDIO_SEPARATOR_TRACE"] = env


def test_device_trace_writes_trace_dir(tmp_path):
    import jax
    import jax.numpy as jnp

    target = str(tmp_path / "trace")
    with device_trace(target, logging.getLogger("t")):
        jnp.asarray(np.ones(8)).sum().block_until_ready()
    # jax writes plugins/profile/<timestamp>/ under the trace dir
    assert os.path.isdir(target)
    found = []
    for root, _dirs, files in os.walk(target):
        found.extend(files)
    assert found, "trace produced no files"


def test_separator_accepts_trace_dir(tmp_path):
    from audio_separator_tpu.separator import Separator

    sep = Separator(trace_dir=str(tmp_path / "tr"), info_only=True)
    assert sep.trace_dir
