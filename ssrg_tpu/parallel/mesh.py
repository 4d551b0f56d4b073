"""Device-mesh helpers.

The reference is single-process/single-device (SURVEY.md §2.14: no DP/TP/PP,
no collectives). This module is the TPU-native scaling layer it lacks: a
``jax.sharding.Mesh`` with a ``graph`` axis over which adjacency rows and
node features are partitioned (1-D row/edge partition, halo exchange via
collectives inside ``shard_map``) and an optional ``data`` axis for
minibatch parallelism in the dense training phase.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("graph",),
    devices=None,
) -> Mesh:
    """Build a mesh over available devices.

    ``shape=None`` uses all devices on one ``graph`` axis. On real hardware
    ``mesh_utils.create_device_mesh`` picks an ICI-friendly ordering; on the
    CPU fake-device harness it falls back to a plain reshape.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(
            f"mesh shape {shape} does not cover {len(devices)} devices"
        )
    if len(shape) != len(axis_names):
        raise ValueError("shape and axis_names rank mismatch")
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)
