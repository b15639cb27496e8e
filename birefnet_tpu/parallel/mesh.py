"""Device mesh construction for multi-chip execution.

The reference has no parallelism of any kind (single Metal device,
single-threaded; see SURVEY.md §2.3). This subsystem is new TPU-native
capability: XLA collectives over ICI surfaced through `jax.sharding.Mesh`.

Axes:
  "data":    batch data parallelism (throughput scaling).
  "spatial": activation/spatial sharding along image height (HR configs).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    n_devices: Optional[int] = None,
    spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, spatial) mesh over the available devices.

    With spatial=1 this is pure batch DP. The spatial axis is laid out as the
    minor (fastest-varying) axis so halo exchanges between spatial neighbors
    ride adjacent ICI links.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % spatial != 0:
        raise ValueError(f"{n} devices not divisible by spatial={spatial}")
    arr = np.array(devs).reshape(n // spatial, spatial)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))
