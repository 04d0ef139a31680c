"""``flattenAMRFile`` — flatten a plotfile to one uniform level
(/root/reference/Src/flattenAMRFile.cpp, 102 LoC: output_level +
output_max_grid_size, PltFileManager interpolation).

Produces the FULL domain at output_level resolution: level 0 is upsampled
level-by-level (linear), each finer level's data overlaid where it exists.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..amr.box import BoxArray, decompose
from ..amr.dense import DenseAmrState
from ..amr.hierarchy import AmrState
from ..io.plotfile import write_plotfile
from ..ops.dense_fill import _upsample_axis
from ..parmparse import ParmParse


def flatten_to_level(st: AmrState, output_level: int,
                     interp: str = "linear") -> jnp.ndarray:
    """Dense [ncomp, *domain_shape(output_level)] covering the full domain."""
    ds = DenseAmrState.from_batched(st)
    meta = st.meta
    import jax

    def build(data_list, mask_list):
        cur = data_list[0]  # level 0 covers the domain
        for lev in range(1, output_level + 1):
            r = meta.ref_ratio[lev - 1]
            for d in range(3):
                cur = _upsample_axis(cur, d, r, interp == "linear")
            bbox = ds.lmeta[lev].bbox
            dom = meta.geoms[lev].domain
            # overlay fine data where the level covers
            sl = tuple(slice(bbox.lo[d] - dom.lo[d],
                             bbox.hi[d] - dom.lo[d] + 1) for d in range(3))
            sub = cur[(slice(None),) + sl]
            sub = jnp.where(mask_list[lev][None], data_list[lev], sub)
            cur = cur.at[(slice(None),) + sl].set(sub)
        return cur

    masks = [ds.in_level_mask(l) for l in range(meta.n_levels)]
    return jax.jit(build)(list(ds.data), masks)


def main(args: dict) -> None:
    """CLI: flattenAMRFile infile= outfile= [output_level=finest]
    [output_max_grid_size=32] [interp=linear|pc]"""
    pp = ParmParse(args)
    infile = pp.get_str("infile")
    from ..session import load_state
    st = load_state(args, infile, dtype=np.float64, widen_ok=True)
    lev = pp.query_int("output_level", st.meta.n_levels - 1)
    mgs = pp.query_int("output_max_grid_size", 32)
    dense = np.asarray(flatten_to_level(st, lev,
                                        pp.query_str("interp", "linear")),
                       dtype=np.float64)
    geom = st.meta.geoms[lev]
    dom = geom.domain
    ba = decompose(dom, mgs)
    fabs = []
    for b in ba:
        sl = (slice(None),) + tuple(
            slice(b.lo[d] - dom.lo[d], b.hi[d] - dom.lo[d] + 1)
            for d in range(3))
        fabs.append(np.ascontiguousarray(dense[sl]))
    outfile = pp.query_str("outfile", infile + "_flat")
    write_plotfile(outfile, st.names, st.meta.time, [geom], [], [ba], [fabs])
    print(f"wrote {outfile}")
