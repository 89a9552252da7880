"""Device-mesh construction helpers.

The reference's entire distribution story is a dead MPI→NCCL bootstrap
(/root/reference/src/models/guided_diffusion/dist_util.py:21-42). Here the
communication backend is a `jax.sharding.Mesh` over ICI: batch/sample sweeps
shard over 'dp', pullback probe directions over 'probe', parameters over
'fsdp' when training — XLA emits the psum/all-gather collectives.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int, axes: Sequence[str]) -> Dict[str, int]:
    """Factor ``n_devices`` across ``axes``, biggest factor to the first axis.

    E.g. 8 devices over ('dp', 'probe') → {'dp': 4, 'probe': 2}; a single
    device maps every axis to 1.
    """
    shape = {a: 1 for a in axes}
    remaining = n_devices
    for i, a in enumerate(axes):
        if i == len(axes) - 1:
            shape[a] = remaining
            break
        # peel off the largest power-of-two factor that leaves room
        f = 1
        while remaining % 2 == 0 and remaining // 2 >= 1 and f < int(
            math.isqrt(n_devices)
        ) + 1:
            f *= 2
            remaining //= 2
        shape[a] = f
    assert math.prod(shape.values()) == n_devices, shape
    return shape


def make_mesh(
    axes: Sequence[str] = ("dp",),
    shape: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over the available devices.

    With no explicit ``shape``, devices are factored over ``axes`` via
    `mesh_shape_for`. Works identically on real TPU slices and on the
    xla_force_host_platform_device_count CPU fake used in tests.
    """
    explicit_devices = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = mesh_shape_for(len(devices), axes)
    dims = [shape[a] for a in axes]
    if math.prod(dims) != len(devices):
        # an explicit shape smaller than the machine (e.g. --mesh_axes tp:2
        # on an 8-chip host) takes a device prefix; anything else is a
        # genuine mismatch
        if not explicit_devices and 0 < math.prod(dims) < len(devices):
            print(f"[mesh] shape {shape} uses the first {math.prod(dims)} "
                  f"of {len(devices)} devices; the rest stay idle")
            devices = devices[: math.prod(dims)]
        else:
            raise ValueError(
                f"mesh shape {shape} does not cover {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(dims)
    return Mesh(dev_array, axis_names=tuple(axes))
