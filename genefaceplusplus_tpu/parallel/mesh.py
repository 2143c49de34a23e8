"""Device-mesh and sharding helpers.

TPU-native replacement for the reference's parallelism layer (NCCL DDP,
/root/reference/utils/commons/trainer.py:571-600, ddp_utils.py:18-60 — see
SURVEY.md §2.8). The honest equivalent on TPU:

  * one mesh axis ``rays`` — the hot parallel dimension of this workload is
    rays/points per frame (the CUDA kernels' thread axis). Rendering and
    training shard the ray batch across chips; params are replicated;
    gradient/metric reduction is an XLA-inserted psum (not hand-written).
  * audio2motion training uses the same axis as a plain data axis
    (batch of sequences).

No hand-rolled collectives: annotate in/out shardings, let XLA insert
all-gathers/psums over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(n_devices: Optional[int] = None, axis: str = RAY_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def ray_sharding(mesh: Mesh, ndim: int = 2, axis: str = RAY_AXIS) -> NamedSharding:
    """Shard dim 0 (the ray/batch dim) across the mesh; rest replicated."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rays(mesh: Mesh, *arrays):
    """Device-put arrays with dim-0 sharded over the ray axis."""
    out = tuple(
        jax.device_put(a, ray_sharding(mesh, np.ndim(a))) for a in arrays
    )
    return out if len(out) > 1 else out[0]


def pad_to_multiple(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host initialisation over DCN (SURVEY §2.8: the honest
    equivalent of the reference's NCCL rendezvous,
    utils/commons/trainer.py:579-600 — TCP/NFS rendezvous + world_size/rank
    flags). On TPU pods the arguments come from the environment and can be
    omitted entirely; returns the global device count.

    After this, `make_mesh()` over `jax.devices()` spans all hosts and the
    same pjit-ed step runs unchanged — collectives ride ICI within a slice
    and DCN across slices, inserted by XLA.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        # single-process / already-initialised: proceed on local devices
        print(f"| jax.distributed.initialize skipped: {e}")
    return len(jax.devices())
