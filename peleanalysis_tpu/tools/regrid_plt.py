"""``regridPlt`` — re-grid a plotfile onto a new BoxArray layout
(/root/reference/Src/regridPlt.cpp, 151 LoC).  The dense canonical arrays
make this trivial: assemble each level densely, re-chunk the union with a
new max_grid_size, scatter back out.
"""
from __future__ import annotations

import numpy as np

from ..amr.box import Box, BoxArray, decompose
from ..amr.dense import DenseAmrState
from ..amr.hierarchy import AmrState
from ..io.plotfile import write_plotfile
from ..parmparse import ParmParse


def regrid(st: AmrState, max_grid_size: int):
    ds = DenseAmrState.from_batched(st)
    meta = st.meta
    geoms, bas, data = [], [], []
    for lev in range(meta.n_levels):
        bbox = ds.lmeta[lev].bbox
        mask = ds.in_level_mask_np(lev)
        dense = np.asarray(ds.data[lev], dtype=np.float64)
        # chunk the union bbox; keep only chunks fully covered by the level
        # (reference keeps the covered region; partially-covered chunks are
        # intersected down to their covered sub-boxes via per-axis trim)
        boxes = []
        fabs = []
        for b in decompose(bbox, max_grid_size):
            sl = tuple(slice(b.lo[d] - bbox.lo[d], b.hi[d] - bbox.lo[d] + 1)
                       for d in range(3))
            m = mask[sl]
            if not m.any():
                continue
            if not m.all():
                # trim to the bounding box of covered cells in this chunk
                idx = np.argwhere(m)
                lo = idx.min(axis=0)
                hi = idx.max(axis=0)
                b = Box(tuple(b.lo[d] + lo[d] for d in range(3)),
                        tuple(b.lo[d] + hi[d] for d in range(3)))
                sl = tuple(slice(b.lo[d] - bbox.lo[d],
                                 b.hi[d] - bbox.lo[d] + 1) for d in range(3))
            boxes.append(b)
            fabs.append(np.ascontiguousarray(dense[(slice(None),) + sl]))
        geoms.append(meta.geoms[lev])
        bas.append(BoxArray(boxes))
        data.append(fabs)
    return geoms, bas, data


def main(args: dict) -> None:
    """CLI: regridPlt infile= outfile= [max_grid_size=32]"""
    pp = ParmParse(args)
    infile = pp.get_str("infile")
    mgs = pp.query_int("max_grid_size", 32)
    from ..session import load_state
    st = load_state(args, infile, dtype=np.float64, widen_ok=True)
    geoms, bas, data = regrid(st, mgs)
    outfile = pp.query_str("outfile", infile + "_rg")
    write_plotfile(outfile, st.names, st.meta.time, geoms, st.meta.ref_ratio,
                   bas, data)
    print(f"wrote {outfile}")
