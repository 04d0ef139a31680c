"""Fine-to-coarse restriction (amrex::average_down analog) on dense levels.

The reference relies on AMReX's average_down to keep covered coarse data
consistent with the fine solution (and MLMG uses it inside composite
solves); here it is a reshape-mean over ratio blocks + a masked overlay —
pure slicing arithmetic like the rest of the dense model.
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np


def average_down_level(meta, lmeta, x_crse: jnp.ndarray, x_fine: jnp.ndarray,
                       covered_crse: jnp.ndarray, lev_crse: int
                       ) -> jnp.ndarray:
    """Overwrite covered cells of the coarse dense array with the block mean
    of their fine children.  x_crse [C, *bbox_c], x_fine [C, *bbox_f]."""
    r = meta.ref_ratio[lev_crse]
    bbox_c = lmeta[lev_crse].bbox
    bbox_f = lmeta[lev_crse + 1].bbox
    # fine bbox in coarse index space (fine bboxes are ratio-aligned in
    # AMReX hierarchies; guard with an interior crop if not)
    flo_c = [bbox_f.lo[d] // r for d in range(3)]
    fshape = x_fine.shape[1:]
    nc = [fshape[d] // r for d in range(3)]
    crop = x_fine[:, : nc[0] * r, : nc[1] * r, : nc[2] * r]
    down = crop.reshape(x_fine.shape[0], nc[0], r, nc[1], r,
                        nc[2], r).mean(axis=(2, 4, 6))
    sl = tuple(slice(flo_c[d] - bbox_c.lo[d], flo_c[d] - bbox_c.lo[d] + nc[d])
               for d in range(3))
    sub = x_crse[(slice(None),) + sl]
    cov = covered_crse[sl]
    out = x_crse.at[(slice(None),) + sl].set(
        jnp.where(cov[None], down, sub))
    return out


def average_down_all(meta, lmeta, x_list: List[jnp.ndarray],
                     covered_list) -> List[jnp.ndarray]:
    """Fine-to-coarse sweep over the whole hierarchy."""
    out = list(x_list)
    for lev in range(meta.n_levels - 2, -1, -1):
        out[lev] = average_down_level(meta, lmeta, out[lev], out[lev + 1],
                                      covered_list[lev], lev)
    return out
