"""Device-mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a Mesh over available devices.

    Defaults to a 1-D 'data' mesh over all devices. For multi-host pods,
    axis order keeps 'data' innermost so camera-parallel collectives ride
    ICI within a host before crossing DCN.
    """
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    arr = np.asarray(devices).reshape(axis_sizes)
    return Mesh(arr, axis_names)
