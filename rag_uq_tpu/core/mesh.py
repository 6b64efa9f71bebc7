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


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host (DCN) seam: join this process to a JAX process group.

    On a multi-host pod slice (e.g. v5e-16+ spanning hosts), each host
    process calls this before any jax API; afterwards `jax.devices()`
    returns the GLOBAL device list and every mesh built by `make_mesh` /
    `make_multihost_mesh` spans hosts, with XLA routing collectives over
    ICI within a slice and DCN across slices. With no arguments, reads the
    standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, or the TPU pod metadata that jax.distributed resolves
    automatically on Cloud TPU).

    Returns True if distributed mode was initialized, False when running
    single-process (no coordinator configured) — callers need no branch:
    the same mesh code works in both modes. This environment exposes one
    chip and one process, so this seam is exercised only as a no-op here;
    it is the documented entry point for multi-host deployments
    (SURVEY.md §5 distributed comm backend).
    """
    import os

    coordinator = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    n_proc = num_processes if num_processes is not None else (
        int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_NUM_PROCESSES" in os.environ else None
    )
    pid = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ else None
    )
    if coordinator is None and n_proc is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=n_proc,
        process_id=pid,
    )
    return True


def make_multihost_mesh(
    shards_per_host: Optional[int] = None,
) -> Mesh:
    """Corpus mesh over all processes' devices (host-major device order).

    The corpus axis is laid out host-major: consecutive shard ranges live
    on the same host's chips, so the per-shard top-k all-gather merge does
    most of its reduction over ICI before anything crosses DCN. Falls back
    to the single-host mesh when jax.process_count() == 1.
    """
    if jax.process_count() == 1:
        return make_mesh(shards_per_host)
    devs = sorted(
        jax.devices(), key=lambda d: (d.process_index, d.id)
    )
    per_host = shards_per_host or (len(devs) // jax.process_count())
    take = per_host * jax.process_count()
    return Mesh(np.array(devs[:take]), axis_names=(CORPUS_AXIS,))


def corpus_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (corpus-row) axis across the corpus mesh axis."""
    return NamedSharding(mesh, P(CORPUS_AXIS))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
