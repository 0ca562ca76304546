"""Device mesh construction and sharding specs.

The reference is single-process single-device (SURVEY.md §2 parallelism
table); this framework's distribution layer is XLA collectives over a
``jax.sharding.Mesh`` — no NCCL/MPI analog exists or is needed. The mesh is
2-D ``(data, model)``:

  * ``data`` — batch sharding for DP training/inference; gradient psum rides
    ICI, inserted automatically by SPMD partitioning.
  * ``model`` — reserved for channel-sharded convs (TP); size 1 in v1 per
    SURVEY.md §2 ("design mesh axes so it can be added").

Multi-host: call :func:`initialize_distributed` first (wraps
``jax.distributed.initialize``), then build the mesh over the global device
list; per-host data loading shards by ``jax.process_index()``.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (no-op on a single host)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def create_mesh(devices=None, model_parallelism: int = 1) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if n % model_parallelism:
        raise ValueError(f"{n} devices not divisible by model={model_parallelism}")
    arr = np.asarray(devices).reshape(n // model_parallelism, model_parallelism)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def model_sharded(mesh: Mesh, tree):
    """Sharding pytree for a params-like tree with TP on the ``model`` axis.

    Rank >= 2 leaves whose trailing (output-channel) dim is divisible by the
    ``model`` axis size are channel-sharded — conv kernels ``(H, W, I, O)``
    split on O, so each model shard computes a slice of the output feature
    map and GSPMD inserts the all-gather before the next layer's contraction.
    Everything else (biases, BN stats, depthwise kernels with O=1, scalars)
    is replicated. Applied uniformly to params AND optimizer state so the
    momentum/adam buffers live alongside their kernels.
    """
    msize = mesh.shape[MODEL_AXIS]

    def rule(x):
        shape = getattr(x, "shape", ())
        if (msize > 1 and len(shape) >= 2 and shape[-1] >= 2 * msize
                and shape[-1] % msize == 0):
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1)), MODEL_AXIS)
            )
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, tree)


def fsdp_sharded(mesh: Mesh, tree, min_elements: int = 2 ** 11,
                 base=None):
    """ZeRO-3-style sharding pytree: large leaves shard over the DATA axis.

    Each leaf with at least ``min_elements`` elements is sharded along its
    LARGEST dim divisible by the data-axis size (ties: the earliest dim).
    GSPMD then all-gathers parameters just-in-time for each layer's use in
    fwd/bwd and reduce-scatters gradients straight into the sharded
    optimizer update, so per-chip parameter + optimizer-state memory falls
    ~1/data-axis while the compute stays identical to pure DP. Small
    leaves (biases, BN scales, scalars) stay replicated — sharding them
    would cost more collective latency than the bytes saved.

    Applied uniformly to params, optimizer state, and EMA (the
    TrainState tree): momentum/adam moments live alongside their shards.

    ``base``: an optional sharding pytree to COMPOSE with (e.g.
    :func:`model_sharded` channel-TP): each leaf keeps its base axes and
    additionally shards its largest still-unsharded divisible dim over
    ``data`` — a conv kernel TP-sharded on its output channels gains a
    data-axis shard on its input channels, the standard fsdp x tp layout.
    """
    dsize = mesh.shape[DATA_AXIS]

    def rule(x, base_s=None):
        shape = getattr(x, "shape", ())
        size = int(np.prod(shape)) if shape else 0
        spec = list(base_s.spec) if base_s is not None else []
        spec += [None] * (len(shape) - len(spec))
        if dsize > 1 and size >= min_elements:
            divisible = [
                d for d in range(len(shape))
                if spec[d] is None
                and shape[d] >= 2 * dsize and shape[d] % dsize == 0
            ]
            if divisible:
                best = max(divisible, key=lambda d: shape[d])
                spec[best] = DATA_AXIS
                return NamedSharding(mesh, P(*spec))
        return (base_s if base_s is not None
                else NamedSharding(mesh, P()))

    if base is None:
        return jax.tree_util.tree_map(rule, tree)
    return jax.tree_util.tree_map(rule, tree, base)


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host-side batch dict onto the mesh, sharded on dim 0.

    Multi-host: each process passes its LOCAL slice of the global batch
    (the pipeline's host sharding already makes streams disjoint);
    ``make_array_from_process_local_data`` assembles the global array —
    ``device_put`` alone cannot target non-addressable devices.
    """
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(s, x), batch
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def local_rows(x) -> np.ndarray:
    """This process's rows of a dim-0-sharded global array, in the order
    the local batch was fed to :func:`shard_batch`.

    Inverse of the device feed for OUTPUTS of a sharded computation: each
    host reads only its addressable shards (sorted by global row offset)
    so host-local postprocessing (e.g. the eval stat accumulation) pairs
    detections with the host's own ground truth. Single-process this is
    just ``np.asarray(x)``.
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    shards = sorted(
        x.addressable_shards,
        key=lambda sh: sh.index[0].start if sh.index[0].start else 0,
    )
    return np.concatenate([np.asarray(sh.data) for sh in shards], axis=0)
