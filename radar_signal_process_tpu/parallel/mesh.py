"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def best_mesh_shape(n_devices: int, n_axes: int = 2) -> Tuple[int, ...]:
    """Factor ``n_devices`` into ``n_axes`` as near-square as possible.

    E.g. 8 -> (2, 4), 4 -> (2, 2), 1 -> (1, 1), 6 -> (2, 3).
    """
    if n_axes == 1:
        return (n_devices,)
    best = (1, n_devices)
    for a in range(1, int(np.sqrt(n_devices)) + 1):
        if n_devices % a == 0:
            best = (a, n_devices // a)
    if n_axes == 2:
        return best
    return (1,) * (n_axes - 2) + best  # degenerate leading axes


def make_mesh(
    axis_names: Sequence[str] = ("dp", "sp"),
    shape: Sequence[int] | None = None,
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    With ``shape=None`` the device count is factored across the axes
    (data-parallel x sequence/range-parallel by default).
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = best_mesh_shape(len(devices), len(axis_names))
    dev_mesh = mesh_utils.create_device_mesh(tuple(shape), devices=devices)
    return Mesh(dev_mesh, tuple(axis_names))
