"""High-level fill helpers over AmrState (FillPatchTwoLevels analog)."""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..amr.hierarchy import AmrState
from .fill import BCSpec, apply_fill, get_fill_plan


def fill_grown(
    state: AmrState,
    lev: int,
    ngrow: int,
    comps: Optional[Sequence[int]] = None,
    bc: Optional[BCSpec] = None,
    interp: str = "pc",
) -> jnp.ndarray:
    """Return level `lev` data grown by `ngrow` ghost cells, filled from
    same-level neighbors, periodic images, physical BCs, and (lev>0) the
    coarser level.  Output: [nbox, ncomp_sel, *grown_shape]."""
    meta = state.meta
    ba = meta.bas[lev]
    geom = meta.geoms[lev]
    if lev > 0:
        ba_c = meta.bas[lev - 1]
        pshape_c = meta.pad_shape(lev - 1)
        ratio = meta.ref_ratio[lev - 1]
    else:
        ba_c = pshape_c = None
        ratio = 2
    plan = get_fill_plan(ba, geom, ngrow, meta.pad_shape(lev), ba_c, pshape_c,
                         ratio, bc, interp)
    data = state.data[lev]
    if comps is not None:
        data = data[:, np.asarray(comps)]
    crse = None
    if lev > 0:
        crse = state.data[lev - 1]
        if comps is not None:
            crse = crse[:, np.asarray(comps)]
    return apply_fill(plan, data, crse)
