#!/usr/bin/env python
"""Runnable fine-tuning demo for the RoFormer family (synthetic data).

Shows the intended loop around audio_separator_tpu.training.make_train_step:
real use replaces `_synthetic_batches` with (mix, stems) pairs cut into
training segments, and passes a converted checkpoint pytree instead of the
random init. `--mesh` shards the batch over all local devices and the
weights Megatron-style (dp×tp) — the same layouts the inference engine uses.

    python tools/finetune.py --steps 20                 # single device
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python tools/finetune.py --mesh --tp 2
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The axon TPU plugin (sitecustomize) ignores the JAX_PLATFORMS env var —
# honour it explicitly so the documented CPU-mesh invocation works.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--lr", type=float, default=3e-3)
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--depth", type=int, default=2)
    parser.add_argument("--mesh", action="store_true",
                        help="shard over all local devices (dp×tp)")
    parser.add_argument("--tp", type=int, default=1)
    parser.add_argument("--save", default=None,
                        help="write the fine-tuned pytree here (.npz — the "
                             "same format the checkpoint converter caches, "
                             "loadable with models.convert.load_params)")
    args = parser.parse_args()

    import optax

    import jax.numpy as jnp

    from audio_separator_tpu.models.init_params import init_roformer_params
    from audio_separator_tpu.models.roformer import RoformerConfig
    from audio_separator_tpu.parallel.mesh import make_mesh
    from audio_separator_tpu.training import make_train_step

    cfg = RoformerConfig(
        kind="bs", dim=args.dim, depth=args.depth, stereo=True, num_stems=2,
        time_transformer_depth=1, freq_transformer_depth=1,
        freqs_per_bands=(2, 2, 4, 8, 16, 32, 64, 129),
        dim_head=16, heads=4, stft_n_fft=512, stft_hop_length=128,
        stft_win_length=512, mask_estimator_depth=1,
    )
    chunk = cfg.stft_hop_length * 31
    mesh = make_mesh(tp=args.tp) if args.mesh else None
    params = init_roformer_params(cfg, seed=0)
    step, opt_state = make_train_step(
        cfg, optax.adam(args.lr), params, mesh=mesh,
        stft_n_fft=256, window_sizes=(256, 128), hop_length=64)

    rng = np.random.default_rng(0)

    def batches():
        while True:
            mix = rng.standard_normal((args.batch, 2, chunk)).astype(np.float32) * 0.2
            tgt = rng.standard_normal(
                (args.batch, cfg.num_stems, 2, chunk)).astype(np.float32) * 0.2
            yield jnp.asarray(mix), jnp.asarray(0.5 * tgt + 0.5 * mix[:, None])

    print(f"mesh={dict(mesh.shape) if mesh else None} chunk={chunk} "
          f"params_dim={args.dim}x{args.depth}", flush=True)
    it = batches()
    for i in range(args.steps):
        t0 = time.time()
        mix, tgt = next(it)
        params, opt_state, loss = step(params, opt_state, mix, tgt)
        print(f"step {i:3d}: loss={float(loss):.4f} ({time.time() - t0:.2f}s)",
              flush=True)

    if args.save:
        import jax

        from audio_separator_tpu.models.convert import save_params

        save_params(args.save, jax.tree.map(np.asarray, params))
        print(f"saved fine-tuned params to {args.save}", flush=True)


if __name__ == "__main__":
    main()
