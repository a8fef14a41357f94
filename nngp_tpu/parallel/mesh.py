"""Device-mesh helpers.

The reference has no distributed runtime at all (SURVEY.md section 2.3) —
its only scaling hook is neural-tangents' blocked Gram (`nt.batch`,
`/root/reference/train.py:166-168`). Here the mesh is the first-class scaling
construct: one `jax.sharding.Mesh` with a `data` axis carries the Gram
block-rows over ICI.
"""

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))
