"""Device-mesh construction for multi-chip runs.

The MLProbs workload has one natural parallel axis: the N(N-1)/2
sequence pairs of the posterior/consistency stages (SURVEY §2.9).  We
shard batches of pairs over a 1-D `pairs` mesh; the consistency
transform all-gathers z-rows over the same axis (the role the reference's
OpenMP loops + OpenCL sectors play on a single node).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pairs_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("pairs",))


def pair_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-of-pairs arrays: leading axis split over the pairs axis."""
    return NamedSharding(mesh, P("pairs"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
