"""SPMD domain decomposition for the dense canonical model.

The reference distributes boxes over MPI ranks; the dense model's natural
multi-chip layout is a spatial shard: every level array
[ncomp, X, Y, Z] is sharded along one spatial axis over a 1-D
jax.sharding mesh.  Fills and stencils are slice/concat/pad arithmetic, so
GSPMD lowers the level-boundary reads to halo collective-permutes over ICI —
the FillBoundary/MPI analog with no hand-written communication
(tests/test_halo.py proves the sharded pipeline bit-equal to unsharded;
parallel/halo.py is the explicit shard_map+ppermute alternative).

Levels whose X extent does not divide the mesh are PADDED, not replicated:
the level bounding box grows on the hi-x side and the pad cells are ordinary
"hole" cells (in_level False), which ghost fills overwrite with coarse
upsampled values — semantically exact by construction.  Level 0 must span
the domain, so a non-divisible level-0 X stays replicated (its data is the
coarsest = smallest; the fine levels carry the memory).
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


def pad_state_divisible(dstate, ndev: int):
    """Grow each level's (lev>0) bounding box on the hi-x side until its X
    extent divides ndev.  Pad cells are holes (in_level False): fills give
    them coarse values, valid masks exclude them, to_batched never reads
    them.  Returns a new DenseAmrState (masks rebuilt lazily)."""
    import jax.numpy as jnp

    from ..amr.box import Box
    from ..amr.dense import DenseAmrState, DenseLevelMeta

    meta = dstate.meta
    new_data, new_lmeta, changed = [], [], False
    for lev in range(meta.n_levels):
        arr = dstate.data[lev]
        bbox = dstate.lmeta[lev].bbox
        padx = (-arr.shape[1]) % ndev
        if padx == 0 or lev == 0:
            new_data.append(arr)
            new_lmeta.append(dstate.lmeta[lev])
            continue
        changed = True
        new_bbox = Box(bbox.lo, (bbox.hi[0] + padx,) + bbox.hi[1:])
        new_lmeta.append(DenseLevelMeta(
            new_bbox, meta.geoms[lev],
            meta.bas[lev].total_cells() / new_bbox.size))
        new_data.append(jnp.pad(arr, ((0, 0), (0, padx), (0, 0), (0, 0))))
    if not changed:
        return dstate
    return DenseAmrState(meta, dstate.names, new_data, new_lmeta)


def shard_dense_state(dstate, mesh: Mesh):
    """Place every level's dense array (and masks) with the X axis sharded,
    padding non-divisible levels first (see pad_state_divisible)."""
    ndev = mesh.devices.size
    dstate = pad_state_divisible(dstate, ndev)
    sh = dense_sharding(mesh)
    rep = NamedSharding(mesh, P())
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
