"""Device mesh construction for data-parallel read processing.

Resquiggling is embarrassingly parallel over reads, so the canonical mesh is
one-dimensional: axis "reads" spans every chip (ICI within a slice, DCN
across hosts via jax.distributed). Training adds psum collectives over the
same axis to pool Baum-Welch statistics (the TPU-native equivalent of the
reference pooling per-read estimates on the driver host, ref:
src/python/segmentation/train.py:236-247).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

READS_AXIS = "reads"


def make_mesh(n_devices: int | None = None, axis: str = READS_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up (one process per host). No-op when single-process
    args are absent; mirrors jax.distributed.initialize auto-detection."""
    if coordinator is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process / unsupported environment
    else:
        jax.distributed.initialize(coordinator, num_processes, process_id)
