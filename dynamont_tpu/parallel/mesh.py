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
                     process_id: int | None = None, required: bool = False) -> None:
    """Multi-host bring-up (one process per host).

    Cluster parameters come from arguments, the DYNAMONT_COORDINATOR /
    DYNAMONT_NUM_PROCESSES / DYNAMONT_PROCESS_ID environment variables, or
    jax.distributed auto-detection (TPU pods, SLURM), in that order. With
    required=True (the CLIs' --distributed flag) a failed bring-up raises
    instead of silently degrading to a single-process run.
    """
    import os

    coordinator = coordinator or os.environ.get("DYNAMONT_COORDINATOR")
    if num_processes is None and os.environ.get("DYNAMONT_NUM_PROCESSES"):
        num_processes = int(os.environ["DYNAMONT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("DYNAMONT_PROCESS_ID"):
        process_id = int(os.environ["DYNAMONT_PROCESS_ID"])
    try:
        if coordinator is not None:
            jax.distributed.initialize(coordinator, num_processes, process_id)
        else:
            jax.distributed.initialize()
    except Exception as e:
        if required:
            raise RuntimeError(
                "distributed run requested but jax.distributed bring-up "
                f"failed: {e}"
            ) from e
        # single-process / unsupported environment: proceed standalone
