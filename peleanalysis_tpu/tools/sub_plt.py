"""``subPlt`` — subset a plotfile in space (coarse-level int bbox) and
components (/root/reference/Src/subPlt.cpp, 189 LoC; float32 output per
subPlt.cpp:48 FAB_IEEE_32).
"""
from __future__ import annotations

import numpy as np

from ..amr.box import Box, BoxArray
from ..amr.geometry import Geometry
from ..amr.hierarchy import AmrMeta, AmrState
from ..io.plotfile import write_plotfile
from ..parmparse import ParmParse


def sub_plotfile(st: AmrState, sub_box0: Box, names=None):
    """Crop hierarchy to the refinement images of sub_box0 (given at level 0).
    Returns (geoms, bas, ratios, names, level_data) ready for write_plotfile.
    The physical prob_lo/hi shrink to the sub-box extents (subPlt semantics).
    """
    meta = st.meta
    names = list(names) if names is not None else st.names
    ci = [st.comp(n) for n in names]
    sub = sub_box0
    geom0 = meta.geoms[0]
    dx0 = geom0.dx
    plo = tuple(geom0.prob_lo[d] + (sub.lo[d] - geom0.domain.lo[d]) * dx0[d]
                for d in range(3))
    phi = tuple(geom0.prob_lo[d] + (sub.hi[d] + 1 - geom0.domain.lo[d]) * dx0[d]
                for d in range(3))
    geoms, bas, data = [], [], []
    ratios = []
    for lev in range(meta.n_levels):
        if lev > 0:
            sub = sub.refine(meta.ref_ratio[lev - 1])
            ratios.append(meta.ref_ratio[lev - 1])
        boxes, fabs = [], []
        arr = np.asarray(st.data[lev])
        for i, b in enumerate(meta.bas[lev]):
            isect = b.intersect(sub)
            if isect.is_empty():
                continue
            boxes.append(isect)
            sl = (i, np.asarray(ci)) + tuple(
                slice(isect.lo[d] - b.lo[d], isect.hi[d] - b.lo[d] + 1)
                for d in range(3))
            fabs.append(np.ascontiguousarray(arr[sl], dtype=np.float64))
        if not boxes:
            break
        geoms.append(Geometry(sub, plo, phi, geom0.is_periodic))
        bas.append(BoxArray(boxes))
        data.append(fabs)
    return geoms, bas, ratios[: len(geoms) - 1], names, data


def main(args: dict) -> None:
    """CLI: subPlt infile= outfile= box=lox loy loz hix hiy hiz [comps=all]"""
    pp = ParmParse(args)
    infile = pp.get_str("infile")
    b = pp.get_int_list("box")
    from ..session import load_state
    st = load_state(args, infile, dtype=np.float64, widen_ok=True,
                                max_level=pp.query_int("finestLevel", None))
    if getattr(st.meta, "ndim2", False) and len(b) == 4:
        # 2-D plotfile: box=lox loy hix hiy (z promoted to the unit cell)
        sub = Box((b[0], b[1], 0), (b[2], b[3], 0))
    else:
        sub = Box(tuple(b[:3]), tuple(b[3:6]))
    names = pp.query_str_list("comps", st.names)
    if pp.contains("sComp") or pp.contains("nComp"):
        s = pp.query_int("sComp", 0)          # comp range (subPlt.cpp:82-84)
        names = st.names[s: s + pp.query_int("nComp", 1)]
    geoms, bas, ratios, names, data = sub_plotfile(st, sub, names)
    outfile = pp.query_str("outfile", infile + "_sub")
    write_plotfile(outfile, names, st.meta.time, geoms, ratios, bas, data,
                   dtype=np.float32)  # FAB_IEEE_32 per subPlt.cpp:48
    print(f"wrote {outfile}")
