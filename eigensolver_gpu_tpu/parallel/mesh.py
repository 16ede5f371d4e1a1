"""Device-mesh construction for sharded solves."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices=None, dp=1):
    """A ('dp', 'tp') mesh over the first n_devices.

    'tp' shards the matrix dimension of a single large solve (tensor
    parallel over ICI); 'dp' shards a batch of independent solves
    (QE k-points). Defaults to all tp.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    if n_devices % dp != 0:
        raise ValueError(f"n_devices={n_devices} not divisible by dp={dp}")
    tp = n_devices // dp
    arr = np.array(devs[:n_devices]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
