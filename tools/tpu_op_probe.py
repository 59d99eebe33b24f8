#!/usr/bin/env python
"""Bisect which VR-path op raises UNIMPLEMENTED on the axon TPU backend.

Round-3 finding: the 5_HP-class VR bench (CascadedASPPNet hp2 over 4band_v2)
died with `JaxRuntimeError: UNIMPLEMENTED: TPU backend error` on the real
chip while every CPU test passes. This probe runs each suspect primitive in
isolation, one jit per op, so the failing lowering is identified by name.

Usage: python tools/tpu_op_probe.py
"""

import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def probe(name, fn, *args, jit=True):
    try:
        out = (jax.jit(fn) if jit else fn)(*args)
        jax.block_until_ready(out)
        # axon: block_until_ready is unreliable; force a scalar readback
        float(jnp.sum(jnp.asarray(out).ravel()[:1]))
        print(f"  OK   {name}", flush=True)
        return True
    except Exception as exc:
        msg = str(exc).splitlines()[0][:120]
        print(f"  FAIL {name}: {type(exc).__name__}: {msg}", flush=True)
        return False


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 32, 96, 128)).astype(np.float32))
    w33 = jnp.asarray(rng.standard_normal((32, 32, 3, 3)).astype(np.float32))
    w11 = jnp.asarray(rng.standard_normal((32, 32, 1, 1)).astype(np.float32))
    wdw = jnp.asarray(rng.standard_normal((32, 1, 3, 3)).astype(np.float32))

    def conv(x, w, *, dil=1, groups=1, pad=0):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(pad, pad)] * 2, rhs_dilation=(dil, dil),
            feature_group_count=groups, preferred_element_type=jnp.float32)

    probe("conv3x3", conv, x, w33)
    probe("conv1x1", conv, x, w11)
    probe("conv3x3_dil4", lambda a, b: conv(a, b, dil=4, pad=4), x, w33)
    probe("conv3x3_dil16", lambda a, b: conv(a, b, dil=16, pad=16), x, w33)
    probe("depthwise3x3", lambda a, b: conv(a, b, groups=32, pad=1), x, wdw)
    probe("depthwise3x3_dil4",
          lambda a, b: conv(a, b, groups=32, dil=4, pad=4), x, wdw)
    probe("depthwise3x3_dil16",
          lambda a, b: conv(a, b, groups=32, dil=16, pad=16), x, wdw)

    h_lo = jnp.asarray(np.arange(96, dtype=np.int32))
    probe("gather_rows", lambda a, i: a[:, :, i, :], x, h_lo)
    from audio_separator_tpu.models.vr_nets import bilinear_align_corners
    probe("bilinear_x2", lambda a: bilinear_align_corners(a, 192, 256), x)
    probe("mean_pool_axis2", lambda a: jnp.mean(a, axis=2, keepdims=True), x)

    # transposed conv (VR v51 decoders use ConvTranspose2d)
    wt = jnp.asarray(rng.standard_normal((32, 32, 2, 2)).astype(np.float32))
    probe("conv_transpose2x2",
          lambda a, b: jax.lax.conv_transpose(
              a, b, (2, 2), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")),
          x, wt)

    # Complex transfers — the actual round-3 culprit: the axon runtime
    # rejects complex64 in BOTH directions (compute on device is fine), and
    # the first failed transfer poisons every later op in the process. Probe
    # LAST for that reason. Product code crosses the link via
    # ops/stft.fetch_complex / put_complex (stacked float32 real/imag).
    def _fetch_complex_roundtrip(a):
        import jax.numpy as jnp
        from audio_separator_tpu.ops.stft import fetch_complex

        c = jax.jit(lambda v: jax.lax.complex(v, -v))(a)
        host = fetch_complex(c)
        assert host.dtype == np.complex64
        return jnp.zeros(())

    probe("fetch_complex(split-ri)", _fetch_complex_roundtrip, x[0, 0], jit=False)

    # LSTM-style matmul scan (VR v51 bridge)
    def scan_mm(a):
        def step(c, t):
            c = jnp.tanh(c @ jnp.ones((128, 128), a.dtype)) + t
            return c, c
        return jax.lax.scan(step, jnp.zeros((8, 128), a.dtype),
                            jnp.ones((16, 8, 128), a.dtype))[1]
    probe("scan_matmul", scan_mm, x)

    # Raw complex transfers, LAST: on axon these fail with UNIMPLEMENTED and
    # poison the process — nothing below them would be trustworthy.
    def _complex_d2h(a):
        c = jax.jit(lambda v: jax.lax.complex(v, v))(a)
        np.asarray(c)  # D2H of complex64
        return jnp.zeros(())

    def _complex_h2d(a):
        up = jnp.asarray(np.zeros((4, 4), np.complex64))  # H2D of complex64
        return jnp.sum(jnp.abs(up))

    # Slice the operand BEFORE the poisoning probes: an eager x[0, 0]
    # between them would itself die on the poisoned process.
    row = x[0, 0] + 0.0
    float(jnp.sum(row.ravel()[:1]))
    probe("complex64_D2H", _complex_d2h, row, jit=False)
    probe("complex64_H2D", _complex_h2d, row, jit=False)


if __name__ == "__main__":
    main()
