"""Execution options for the TPU compute path.

Round 1 read ``AUDSEP_*`` env knobs *inside* jitted functions: the values got
baked into the trace, so flipping an env var after the first forward of a
given shape silently had no effect (jit cache). Here every knob is parsed
ONCE at import into ``DEFAULT_EXEC`` and threaded explicitly; code under jit
only ever consults the (hashable, frozen) options object it was handed.

Knobs (all optional; ``None`` = built-in heuristic):

* ``block``    — RoFormer layer fusion: ``"pallas_full"`` (default on TPU:
                 attention + FF halves as fused Pallas kernels), ``"pallas"``
                 (attention half only), ``"off"`` (plain XLA).
* ``qkv``      — QKV projection layout: ``"einsum"`` | ``"matmul"``.
* ``norm``     — RMSNorm activation dtype: ``"fp32"`` (default) | ``"bf16"``.
* ``seq_pad``  — token-axis padding granularity for the fused kernels
                 (rounded up to a 64-multiple).
* ``attn``     — attention impl override: ``"einsum"`` | ``"pallas"``.
* ``stft``     — rfft backend: ``"fft"`` (default) | ``"matmul"``.

Env compatibility: ``AUDSEP_BLOCK`` / ``AUDSEP_QKV`` / ``AUDSEP_NORM`` /
``AUDSEP_SEQ_PAD`` / ``AUDSEP_ATTN`` / ``AUDSEP_STFT_IMPL`` seed the import-
time default, so process-level A/B switching keeps working — set them before
the process starts (as the perf tooling always did).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class ExecutionOptions:
    block: Optional[str] = None
    qkv: Optional[str] = None
    norm: str = "fp32"
    seq_pad: int = 64
    attn: Optional[str] = None
    stft: str = "fft"


def _from_env() -> ExecutionOptions:
    try:
        seq_pad = int(os.environ.get("AUDSEP_SEQ_PAD", "0")) or 64
    except ValueError:
        seq_pad = 64
    return ExecutionOptions(
        block=os.environ.get("AUDSEP_BLOCK") or None,
        qkv=os.environ.get("AUDSEP_QKV") or None,
        norm=os.environ.get("AUDSEP_NORM") or "fp32",
        seq_pad=seq_pad,
        attn=os.environ.get("AUDSEP_ATTN") or None,
        stft=os.environ.get("AUDSEP_STFT_IMPL") or "fft",
    )


DEFAULT_EXEC = _from_env()
