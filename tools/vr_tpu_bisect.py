#!/usr/bin/env python
"""Bisect the VR CascadedASPPNet TPU UNIMPLEMENTED failure at bench geometry.

tools/tpu_op_probe.py shows every individual primitive lowers; this runs the
real hp2 (arch 33966) network at the arch_bench shapes, sub-network by
sub-network, to find which composition the axon backend rejects.

Usage: python tools/vr_tpu_bisect.py [batch=4] [window=512]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

T0 = time.time()


def mark(msg):
    print(f"[vr-bisect +{time.time() - T0:6.1f}s] {msg}", flush=True)


def probe(name, fn, *args):
    import jax
    import jax.numpy as jnp

    try:
        t0 = time.time()
        out = jax.jit(fn)(*args)
        float(jnp.sum(jnp.asarray(out).ravel()[:1]))
        mark(f"  OK   {name} ({time.time() - t0:.1f}s)")
        return True
    except Exception as exc:
        msg = str(exc).splitlines()[0][:140]
        mark(f"  FAIL {name}: {type(exc).__name__}: {msg}")
        return False


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import torch

    from parity_cases import _randomize_with_buffers
    from ref_pipeline import load_ref_pipeline_module
    from audio_separator_tpu.models import vr_nets
    from audio_separator_tpu.models.vr_nets import state_dict_to_tree

    nets_mod = load_ref_pipeline_module("separator.uvr_lib_v5.vr_network.nets")
    arch_size = 33966
    n_bins = 672
    net = _randomize_with_buffers(
        nets_mod.determine_model_capacity(n_bins * 2, arch_size), seed=1).eval()
    tree = state_dict_to_tree({k: v.numpy() for k, v in net.state_dict().items()})
    del net

    import jax
    import jax.numpy as jnp

    mark(f"devices: {jax.devices()}")
    params = jax.device_put(tree)
    jax.block_until_ready(params)
    mark("params resident")

    rng = np.random.default_rng(0)
    f = n_bins + 1  # spec rows as produced by the multiband chain
    x = jnp.asarray(rng.random((batch, 2, f, window), np.float32))
    n_fft_bins = n_bins * 2
    max_bin = n_fft_bins // 2
    xin = x[:, :, :max_bin]
    bw = max_bin // 2

    probe("enc1_low", lambda p, a: vr_nets._encoder_v5(p, a, 2)[0],
          params["stg1_low_band_net"]["enc1"], xin[:, :, :bw])
    probe("base_low", lambda p, a: vr_nets._base_aspp_net(p, a, arch_size),
          params["stg1_low_band_net"], xin[:, :, :bw])
    probe("base_high", lambda p, a: vr_nets._base_aspp_net(p, a, arch_size),
          params["stg1_high_band_net"], xin[:, :, bw:])

    def stg12(p, a):
        low = vr_nets._base_aspp_net(p["stg1_low_band_net"], a[:, :, :bw], arch_size)
        high = vr_nets._base_aspp_net(p["stg1_high_band_net"], a[:, :, bw:], arch_size)
        aux1 = jnp.concatenate([low, high], axis=2)
        h = jnp.concatenate([a, aux1], axis=1)
        return vr_nets._base_aspp_net(
            p["stg2_full_band_net"], vr_nets._cba(p["stg2_bridge"], h), arch_size)

    probe("stg1+2", stg12, params, xin)
    probe("full_net",
          lambda p, a: vr_nets.apply_cascaded_aspp_net(p, a, n_fft_bins, arch_size),
          params, x)
    probe("full_net_b1",
          lambda p, a: vr_nets.apply_cascaded_aspp_net(p, a, n_fft_bins, arch_size),
          params, x[:1])

    # the exact bench path: tiled_mask_predict over a padded spec
    from audio_separator_tpu.ops.demix import tiled_mask_predict
    import functools

    spec = rng.random((2, f, 4096), np.float32).astype(np.float32)
    fn = functools.partial(vr_nets.predict_mask_v5, n_fft_bins=n_fft_bins,
                           arch=arch_size)
    try:
        out = tiled_mask_predict(lambda p, c: fn(p, c), spec, window=window,
                                 offset=128, batch_size=batch, out_c=2,
                                 out_f=f, model_params=params)
        mark(f"  OK   tiled_mask_predict {out.shape}")
    except Exception as exc:
        mark(f"  FAIL tiled_mask_predict: {type(exc).__name__}: "
             f"{str(exc).splitlines()[0][:140]}")


if __name__ == "__main__":
    main()
