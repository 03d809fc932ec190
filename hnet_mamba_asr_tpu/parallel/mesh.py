"""Device mesh + sharding helpers: the data-parallel plane over ICI.

The reference's only device-parallelism strategy is DDP over NCCL (reference:
SURVEY.md §2.10); the TPU-native equivalent is a 1-axis ``jax.sharding.Mesh``
over all local/global devices with batches sharded on the leading axis and
parameters replicated. Gradient averaging is implicit in SPMD (the loss is a
global mean, XLA inserts the reduce); there is no backend management, no
collective-matching choreography, and scaling to N chips is config-only.

A second (currently trivial) "tp" axis is laid out so tensor sharding can be
annotated later without restructuring call sites.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, dp_axis: str = "dp") -> Mesh:
    """1-axis data-parallel mesh over the first n (default: all) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (dp_axis,))


def batch_sharding(mesh: Mesh, dp_axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(dp_axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, dp_axis: str = "dp",
                batch_axis: int = 0) -> dict:
    """Place every array leaf of a host batch with its batch axis sharded.

    ``batch_axis=1`` handles step-stacked batches [K, B, ...] (the Trainer's
    scan_steps path): the scan axis stays replicated, B shards over the mesh.
    Non-array entries (utterance id lists) pass through on host.
    """
    spec = P(*([None] * batch_axis + [dp_axis]))
    sh = NamedSharding(mesh, spec)
    rep = replicate(mesh)
    n_dev = mesh.devices.size

    def place(v):
        if isinstance(v, (np.ndarray, jax.Array)):
            if (getattr(v, "ndim", 0) > batch_axis
                    and v.shape[batch_axis] % n_dev == 0):
                return jax.device_put(v, sh)
            return jax.device_put(v, rep)
        return v

    return {k: place(v) for k, v in batch.items()}
