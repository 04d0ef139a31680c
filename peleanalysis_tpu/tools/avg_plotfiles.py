"""``avgPlotfiles`` — ensemble average of N plotfiles with possibly
non-matching AMR hierarchies (/root/reference/Src/avgPlotfiles.cpp, 205 LoC;
docs: Docs/source/averagePlotfile.rst "averagePlotfileFlexible").

Output hierarchy: refined wherever ANY input is refined (union of level
footprints); each input is interpolated onto that hierarchy with the dense
fill (interp_type: "pc" = PCInterp, "linear" = cell-cons-linear analog,
avgPlotfiles.cpp:68-70) and the results averaged.
"""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..amr.box import Box, BoxArray, decompose
from ..amr.dense import DenseAmrState, DenseLevelMeta
from ..amr.geometry import Geometry
from ..amr.hierarchy import AmrMeta, AmrState
from ..io.plotfile import write_plotfile
from ..ops.dense_fill import fill_dense
from ..parmparse import ParmParse


def average_states(states: Sequence[AmrState], names: Sequence[str],
                   interp: str = "linear",
                   output_max_level: int = None):
    """Average per level on the union footprint.  Returns a DenseAmrState
    whose in_level masks are the unions."""
    metas = [st.meta for st in states]
    n_lev = min(m.n_levels for m in metas)
    if output_max_level is not None:
        n_lev = min(n_lev, output_max_level + 1)
    for m in metas:
        if m.geoms[0].domain != metas[0].geoms[0].domain:
            raise ValueError("avgPlotfiles: domains differ")
        if m.ref_ratio[: n_lev - 1] != metas[0].ref_ratio[: n_lev - 1]:
            raise ValueError("avgPlotfiles: ref ratios differ")

    denses = [DenseAmrState.from_batched(st) for st in states]
    out_data = []
    out_masks = []
    lmeta = []
    for lev in range(n_lev):
        # union bounding box + union footprint
        bbs = [ds.lmeta[lev].bbox for ds in denses]
        ubox = Box(tuple(min(b.lo[d] for b in bbs) for d in range(3)),
                   tuple(max(b.hi[d] for b in bbs) for d in range(3)))
        union = np.zeros(ubox.shape, dtype=bool)
        acc = np.zeros((len(names),) + ubox.shape)
        for ds in denses:
            bbox = ds.lmeta[lev].bbox
            comps = [ds.comp(n) for n in names]
            # grow this input's fill so it spans the union bbox; cells beyond
            # the input's own refinement get its coarse-interpolated values
            g = max([0] + [bbox.lo[d] - ubox.lo[d] for d in range(3)]
                    + [ubox.hi[d] - bbox.hi[d] for d in range(3)])
            filled = np.asarray(fill_dense(ds, lev, g, comps=comps,
                                           interp=interp))
            gb = bbox.grow(g)
            sl = tuple(slice(ubox.lo[d] - gb.lo[d],
                             ubox.hi[d] - gb.lo[d] + 1) for d in range(3))
            acc += filled[(slice(None),) + sl]
            msl = tuple(slice(bbox.lo[d] - ubox.lo[d],
                              bbox.hi[d] - ubox.lo[d] + 1) for d in range(3))
            union[msl] |= ds.in_level_mask_np(lev)
        acc /= len(denses)
        out_data.append(jnp.asarray(acc))
        out_masks.append(union)
        lmeta.append((ubox, union))
    return out_data, lmeta, metas[0], n_lev


def write_averaged(path: str, out_data, lmeta, meta0, n_lev,
                   names, time, max_grid_size: int = 32) -> None:
    geoms, bas, fabs_all = [], [], []
    for lev in range(n_lev):
        ubox, union = lmeta[lev]
        dense = np.asarray(out_data[lev], dtype=np.float64)
        boxes, fabs = [], []
        for b in decompose(ubox, max_grid_size):
            sl = tuple(slice(b.lo[d] - ubox.lo[d], b.hi[d] - ubox.lo[d] + 1)
                       for d in range(3))
            m = union[sl]
            if not m.any():
                continue
            if not m.all():
                idx = np.argwhere(m)
                lo, hi = idx.min(axis=0), idx.max(axis=0)
                b = Box(tuple(b.lo[d] + lo[d] for d in range(3)),
                        tuple(b.lo[d] + hi[d] for d in range(3)))
                sl = tuple(slice(b.lo[d] - ubox.lo[d],
                                 b.hi[d] - ubox.lo[d] + 1) for d in range(3))
            boxes.append(b)
            fabs.append(np.ascontiguousarray(dense[(slice(None),) + sl]))
        geoms.append(meta0.geoms[lev])
        bas.append(BoxArray(boxes))
        fabs_all.append(fabs)
    write_plotfile(path, names, time, geoms, meta0.ref_ratio[: n_lev - 1],
                   bas, fabs_all)


def main(args: dict) -> None:
    """CLI: avgPlotfiles infile=<plt>... [vars=all] [interp_type=1|2]
    [output_max_level=] [output_max_grid_size=32] outfile="""
    pp = ParmParse(args)
    infiles = pp.get_str_list("infiles" if pp.contains("infiles") else "infile")
    itype = pp.query_int("interp_type", 2)
    interp = "pc" if itype == 1 else "linear"
    from ..session import load_state
    states = [load_state(args, f, dtype=np.float64) for f in infiles]
    names = (pp.query_str_list("variables", None)
             or pp.query_str_list("vars", None))
    if names is None:
        # cross-check shared variables (avgPlotfiles.cpp:77-115)
        names = [n for n in states[0].names
                 if all(n in st.names for st in states)]
    out_data, lmeta, meta0, n_lev = average_states(
        states, names, interp, pp.query_int("output_max_level", None))
    outfile = pp.query_str("outfile", infiles[0] + "_avg")
    write_averaged(outfile, out_data, lmeta, meta0, n_lev, names,
                   states[0].meta.time,
                   pp.query_int("output_max_grid_size", 32))
    print(f"wrote {outfile}")
