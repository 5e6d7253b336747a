"""Device mesh helpers — the batch/data-parallel axis (SURVEY.md §2).

The reference scales horizontally by Pub/Sub fan-out to Cloud Run worker
instances (backend/app.py:84-90 → worker/main.py:16-50): N jobs → N
processes.  The TPU-native equivalent is a ``tracks`` mesh axis: an album
is a padded batch of tracks sharded across chips over ICI, processed by one
``jit``-compiled batched mastering call.  Multi-host slices extend the same
mesh over DCN; the job queue survives at the serving layer (serving/).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "make_mesh_2d", "tracks_sharding",
           "replicated_sharding"]


def make_mesh(axis_name: str = "tracks", devices=None) -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis_name,))


def make_mesh_2d(tracks: int = 0, axis_names=("tracks", "seq"),
                 devices=None) -> Mesh:
    """A 2-D (tracks × frames) mesh: data parallelism over tracks composed
    with sequence parallelism within each track.

    ``tracks``: size of the tracks axis (0 = pick the largest divisor of
    the device count ≤ its square root, e.g. 8 devices → 2×4).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if tracks <= 0:
        tracks = max(d for d in range(1, int(n ** 0.5) + 1) if n % d == 0)
    if n % tracks:
        raise ValueError(f"{n} devices not divisible by tracks={tracks}")
    return Mesh(devices.reshape(tracks, n // tracks), tuple(axis_names))


def tracks_sharding(mesh: Mesh, axis_name: str = "tracks") -> NamedSharding:
    """Shard the leading (tracks) axis; everything else replicated."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
