"""Device-mesh construction and sharding policies.

The reference is strictly single-process/single-device (SURVEY §2.8: no
DP/TP/collectives anywhere); its only parallelism is per-chunk batching. Here
multi-chip scaling is first-class and idiomatic JAX SPMD:

* ``data`` axis — chunk-batch data parallelism: the windows of a track (or
  windows of many tracks) are independent, so the demix batch dimension
  shards cleanly with zero communication.
* ``model`` axis — tensor parallelism inside the RoFormer blocks: QKV/FF
  weights are sharded on their output feature dim and the output projections
  on their input dim, so XLA's SPMD partitioner inserts the single
  all-reduce per block that Megatron-style TP requires — over ICI, chosen by
  the compiler, not hand-written NCCL.

Everything routes through ``NamedSharding`` + ``jax.jit`` in/out shardings;
no host-side communication code exists (XLA emits the collectives).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_distributed_initialized = False


def init_distributed_from_env(timeout_s: int = 120) -> bool:
    """Multi-host (DCN) wiring: join a ``jax.distributed`` cluster when the
    environment says so, making :func:`make_mesh` span PROCESSES — each host
    contributes its local chips and ``jax.devices()`` becomes the global
    device list, so the same NamedSharding/pjit programs scale from one host
    to a pod slice with zero code change (collectives ride ICI within a
    host, DCN across — XLA picks, we only lay out the mesh).

    Env contract (all three required to activate; a bare single process is
    the default and costs nothing):

    * ``AUDSEP_COORDINATOR``   — ``host:port`` of process 0
    * ``AUDSEP_NUM_PROCESSES`` — total process count
    * ``AUDSEP_PROCESS_ID``    — this process's rank (0-based)

    The standard JAX variables (``JAX_COORDINATOR_ADDRESS`` etc.) keep
    working too — ``jax.distributed.initialize`` reads them natively; this
    wrapper only adds the AUDSEP_* spelling and idempotence. Returns True
    when a multi-process cluster was joined. Scale-out ABOVE the mesh stays
    the HTTP job layer (remote/server.py): jobs fan out across serving
    replicas; one mesh spans the chips a single model instance uses
    (replaces the reference's per-GPU cloud jobs,
    ref: audio_separator/remote/deploy_modal.py:152-378).
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    coord = os.environ.get("AUDSEP_COORDINATOR")
    nproc = os.environ.get("AUDSEP_NUM_PROCESSES")
    pid = os.environ.get("AUDSEP_PROCESS_ID")
    if not (coord and nproc and pid):
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nproc),
        process_id=int(pid),
        initialization_timeout=timeout_s,
    )
    _distributed_initialized = True
    return True


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("data", "model") mesh over the available devices.

    Defaults to pure data parallelism (tp=1); pass ``tp`` to carve a tensor-
    parallel minor axis (minor = contiguous devices → ICI-adjacent on TPU).
    In a multi-process deployment (see :func:`init_distributed_from_env`,
    joined here automatically when the env contract is set) the mesh spans
    every process's devices.
    """
    if devices is None:
        init_distributed_from_env()
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if tp is None and dp is None:
        dp, tp = n, 1
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != device count ({n})")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, rank: int, batch_axis: int = 0) -> NamedSharding:
    spec = [None] * rank
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def shard_array(x, sharding: NamedSharding):
    return jax.device_put(x, sharding)


# ---------------------------------------------------------------------------
# RoFormer parameter sharding policy (Megatron-style TP on the "model" axis)


def roformer_param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """PartitionSpec tree matching models/roformer.py's params pytree.

    Transformer stacks carry leading (depth, inner_depth) axes, so feature
    dims sit at the trailing positions:
      wqkv (D, L, dim, 3*h*dh)   → shard last (column-parallel QKV)
      wo   (D, L, h*dh, dim)     → shard -2   (row-parallel out-proj, psum)
      ff_w1(D, L, dim, hidden)   → shard last (column-parallel)
      ff_w2(D, L, hidden, dim)   → shard -2   (row-parallel, psum)
    The mask-estimator MLP is the parameter-count heavyweight (the flagship's
    hidden layer is (2, 62, 512, 2048) = 130M params, over half the model) —
    it shards the same Megatron way: hidden ``w`` column-parallel on its
    output feature dim, the final val/gate projections row-parallel on their
    hidden input dim (psum inserted by XLA SPMD). Gates/norms/biases and the
    (tiny) band split replicate.
    """
    col = {"wqkv", "ff_w1"}
    row = {"wo", "ff_w2"}

    def spec_for(path: tuple, leaf) -> NamedSharding:
        key = path[-1] if path else ""
        rank = np.ndim(leaf)
        in_mask_est = "mask_est" in path
        spec = [None] * rank
        if key in col or (in_mask_est and key == "w"):
            spec[-1] = "model"
            return NamedSharding(mesh, P(*spec))
        if key in row or (in_mask_est and key in ("val_w", "gate_w")):
            spec[-2] = "model"
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(walk(v, path) for v in tree)
        return spec_for(path, tree)

    return walk(params)


def shard_roformer_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    shardings = roformer_param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


# ---------------------------------------------------------------------------
# HTDemucs/HDemucs parameter sharding policy


def htdemucs_param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """PartitionSpec tree for the HTDemucs params pytree
    (models/htdemucs.py, torch-layout leaves: Linear weight is (out, in)).

    The cross-transformer feed-forwards shard Megatron-style on the "model"
    axis: ``linear1`` column-parallel (out dim), ``linear2`` row-parallel
    (in dim) with XLA SPMD inserting the one all-reduce per block. Attention
    stays replicated on purpose: torch's packed ``in_proj_weight`` is
    ``[q; k; v]`` stacked on the out dim, so any sharding of that axis cuts
    across the q/k/v slice boundaries taken inside ``_mha`` and XLA has to
    reshard (gather) each projection per layer — more collective bytes than
    the ~0.8 M-param matmuls it would parallelise are worth. The U-Net
    conv encoders/decoders also replicate (conv channel TP pays one
    halo/all-reduce per layer for tiny per-layer FLOPs; the batch "data"
    axis already covers them).
    """

    def spec_for(path: tuple, leaf) -> NamedSharding:
        rank = np.ndim(leaf)
        if "crosstransformer" in path and len(path) >= 2:
            parent, key = path[-2], path[-1]
            if parent == "linear1":
                # Column-parallel: weight (hidden, E) on axis 0, bias (hidden,)
                if key == "weight" and rank == 2:
                    return NamedSharding(mesh, P("model", None))
                if key == "bias" and rank == 1:
                    return NamedSharding(mesh, P("model"))
            if parent == "linear2" and key == "weight" and rank == 2:
                # Row-parallel: weight (E, hidden) on axis 1; bias replicated
                # (added once after the partial-sum all-reduce).
                return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(walk(v, path) for v in tree)
        return spec_for(path, tree)

    return walk(params)


def shard_htdemucs_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    shardings = htdemucs_param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
