"""Device mesh and sharding helpers.

The reference has no parallelism (SURVEY.md §2.3); scale-out here is corpus
sharding over a `jax.sharding.Mesh` with per-shard top-k merged over ICI.
These helpers centralize mesh construction so single-chip and virtual-CPU
test meshes use the same code path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CORPUS_AXIS = "corpus"
DATA_AXIS = "data"


def make_mesh(
    num_corpus_shards: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 1-D corpus-sharding mesh over the given (or all) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    n = num_corpus_shards or len(devs)
    if n > len(devs):
        raise ValueError(f"Requested {n} shards but only {len(devs)} devices")
    return Mesh(np.array(devs[:n]), axis_names=(CORPUS_AXIS,))


def corpus_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (corpus-row) axis across the corpus mesh axis."""
    return NamedSharding(mesh, P(CORPUS_AXIS))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
