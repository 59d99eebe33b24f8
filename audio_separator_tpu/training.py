"""Fine-tuning support: sharded jitted train steps for the RoFormer family
and HTDemucs.

The reference is inference-only; models are trained elsewhere and shipped as
checkpoints. Here training is a first-class (if auxiliary) capability of the
framework because everything needed already exists TPU-natively: the
functional forwards (models/roformer.py, models/htdemucs.py), the
torch-parity multi-resolution STFT loss (ops/losses.py, ref
bs_roformer.py:519-562 formula; HTDemucs trains on time-domain L1, the
demucs recipe), and the Megatron TP / chunk-DP sharding policies
(parallel/mesh.py: roformer_param_shardings / htdemucs_param_shardings).
Each step is one jitted program: forward → loss → grads → optax update,
with parameter shardings pinned on the outputs so the updated tree keeps
the TP layout across steps (no silent replication drift).

Typical use (see tools/finetune.py for a runnable demo):

    cfg = ...RoformerConfig... (or models.htdemucs.HTDemucsConfig)
    params = init_roformer_params(cfg, seed=0)
    tx = optax.adamw(1e-4)
    step, opt_state = make_train_step(cfg, tx, params, mesh=mesh)
    for mix, target in batches:          # (B,C,T), (B,S,C,T)
        params, opt_state, loss = step(params, opt_state, mix, target)
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from .models.htdemucs import HTDemucsConfig, apply_hdemucs, apply_htdemucs
from .models.roformer import RoformerConfig, apply_roformer
from .ops.losses import roformer_training_loss


def make_train_step(
    cfg,  # RoformerConfig | models.htdemucs.HTDemucsConfig
    optimizer,  # optax.GradientTransformation
    params,
    mesh=None,
    data_axis: str = "data",
    compute_dtype=jnp.float32,
    stft_n_fft: int = 2048,
    window_sizes: Tuple[int, ...] = (4096, 2048, 1024, 512, 256),
    hop_length: int = 147,
    multi_stft_weight: float = 1.0,
) -> Tuple[Any, Any]:
    """Build ``(step, opt_state)`` for ``cfg`` (RoFormer or HTDemucs).

    ``step(params, opt_state, mix, target) -> (params, opt_state, loss)`` is
    a single jitted program. With ``mesh``, the batch shards over
    ``data_axis`` and params/optimizer state keep the family's Megatron TP
    layout (``parallel.mesh.roformer_param_shardings`` /
    ``htdemucs_param_shardings``); XLA SPDM inserts the gradient
    all-reduces. RoFormer trains on the reference's L1 + multi-resolution
    STFT objective (``window_sizes`` must each be ≤ the training segment
    length — shrink for short synthetic segments); HTDemucs trains on
    time-domain L1 over stems (the demucs recipe; the STFT-loss kwargs are
    ignored there)."""
    is_roformer = isinstance(cfg, RoformerConfig)
    batch_sharding = None
    param_shardings = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.mesh import (htdemucs_param_shardings,
                                    roformer_param_shardings)

        batch_sharding = NamedSharding(mesh, P(data_axis))
        param_shardings = (roformer_param_shardings(params, mesh) if is_roformer
                           else htdemucs_param_shardings(params, mesh))
        params = jax.tree.map(jax.device_put, params, param_shardings)

    opt_state = optimizer.init(params)

    if is_roformer:
        def loss_fn(p, mix, target):
            out = apply_roformer(p, cfg, mix, compute_dtype=compute_dtype)
            out = out[..., : target.shape[-1]]
            total, (l1, multi) = roformer_training_loss(
                out, target, stft_n_fft=stft_n_fft, window_sizes=window_sizes,
                hop_length=hop_length, multi_stft_weight=multi_stft_weight)
            return total
    else:
        apply = apply_hdemucs if cfg.arch == "hdemucs" else apply_htdemucs

        def loss_fn(p, mix, target):
            out = apply(p, cfg, mix, compute_dtype=compute_dtype)
            out = out[..., : target.shape[-1]]
            return jnp.mean(jnp.abs(out - target))

    def _step(p, state, mix, target):
        if batch_sharding is not None:
            mix = jax.lax.with_sharding_constraint(mix, batch_sharding)
            target = jax.lax.with_sharding_constraint(target, batch_sharding)
        loss, grads = jax.value_and_grad(loss_fn)(p, mix, target)
        updates, state = optimizer.update(grads, state, p)
        p = jax.tree.map(lambda w, u: w + u, p, updates)
        return p, state, loss

    if param_shardings is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(mesh, P())
        # opt_state's per-param leaves follow the param layout; everything
        # else (step counters, scalars) replicates. Resolve by structure:
        # any leaf whose shape matches a param leaf inherits its sharding.
        flat_params, treedef = jax.tree.flatten(params)
        flat_shard = jax.tree.leaves(param_shardings)
        shape_to_shard = {}
        for leaf, sh in zip(flat_params, flat_shard):
            shape_to_shard.setdefault((leaf.shape, leaf.dtype), sh)

        def opt_shard_for(leaf):
            return shape_to_shard.get(
                (getattr(leaf, "shape", ()), getattr(leaf, "dtype", None)),
                replicated)

        opt_state = jax.device_put(opt_state)  # materialise before inspecting
        opt_out_shardings = jax.tree.map(opt_shard_for, opt_state)
        step = jax.jit(_step, out_shardings=(
            param_shardings, opt_out_shardings, replicated))
        opt_state = jax.tree.map(jax.device_put, opt_state, opt_out_shardings)
    else:
        step = jax.jit(_step)

    return step, opt_state
