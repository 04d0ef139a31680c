"""SPMD domain decomposition for the dense canonical model.

The reference distributes boxes over MPI ranks; the dense model's natural
multi-chip layout is a spatial shard: every level array
[ncomp, X, Y, Z] is sharded along one spatial axis over a 1-D
jax.sharding mesh.  Fills and stencils are slice/concat/pad arithmetic, so
GSPMD lowers the level-boundary reads to halo collective-permutes over ICI —
the FillBoundary/MPI analog with no hand-written communication.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

X_AXIS = "x"


def make_spatial_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (X_AXIS,))


def dense_sharding(mesh: Mesh) -> NamedSharding:
    """[ncomp, X, Y, Z] sharded along X."""
    return NamedSharding(mesh, P(None, X_AXIS))


def shard_dense_state(dstate, mesh: Mesh):
    """Place every level's dense array (and masks) with the X axis sharded.
    Levels whose X extent does not divide the mesh stay replicated (GSPMD
    handles mixed layouts; the collectives ride ICI either way)."""
    sh = dense_sharding(mesh)
    rep = NamedSharding(mesh, P())
    ndev = mesh.devices.size
    new_data = []
    for lev, arr in enumerate(dstate.data):
        target = sh if arr.shape[1] % ndev == 0 else rep
        new_data.append(jax.device_put(arr, target))
    out = dstate.with_data(dstate.names, new_data)
    for lev in range(dstate.meta.n_levels):
        m = dstate.in_level_mask(lev)
        msh = (NamedSharding(mesh, P(X_AXIS))
               if m.shape[0] % ndev == 0 else rep)
        out._in_level[lev] = jax.device_put(m, msh)
    return out
