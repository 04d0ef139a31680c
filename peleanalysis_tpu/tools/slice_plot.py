"""``slicePlot`` — axis-aligned slice of one variable at the finest level,
rendered as PPM/PGM image or FAB (/root/reference/Src/slicePlot.cpp, 244 LoC:
degenerate-box FillVar + palette render, slicePlot.cpp:29-56).

The slice is taken from the flattened finest-resolution field (coarser data
interpolated up where the finest level doesn't cover — the degenerate-box
FillVar semantics).
"""
from __future__ import annotations

import numpy as np

from ..amr.box import Box
from ..amr.hierarchy import AmrState
from ..io.fab import write_fab
from ..parmparse import ParmParse
from .flatten_amr import flatten_to_level
from .integral import write_ppm


def slice_field(st: AmrState, var: str, direction: int, loc: float
                ) -> np.ndarray:
    """2-D slice at physical coordinate ``loc`` along ``direction``."""
    lev = st.meta.n_levels - 1
    geom = st.meta.geoms[lev]
    dense = np.asarray(flatten_to_level(st, lev))
    ic = st.comp(var)
    i = int((loc - geom.prob_lo[direction]) / geom.dx[direction])
    i = int(np.clip(i, 0, geom.domain.shape[direction] - 1))
    sl = [slice(None)] * 3
    sl[direction] = i
    return dense[(ic,) + tuple(sl)]


def main(args: dict) -> None:
    """CLI: slicePlot infile= var=temp dir=2 [loc=<center>]
    [format=ppm|pgm|fab] [outfile=]"""
    pp = ParmParse(args)
    infile = pp.get_str("infile")
    var = pp.query_str("var", "temp")
    direction = pp.query_int("dir", 2)
    st = AmrState.from_plotfile(infile, names=[var])
    geom = st.meta.geoms[0]
    loc = pp.query_float(
        "loc", 0.5 * (geom.prob_lo[direction] + geom.prob_hi[direction]))
    fmt = pp.query_str("format", "ppm")
    img = slice_field(st, var, direction, loc)
    outfile = pp.query_str("outfile", f"{infile}_{var}_d{direction}.{fmt}")
    if fmt in ("ppm", "pgm"):
        write_ppm(outfile, img)
    else:
        with open(outfile, "wb") as f:
            write_fab(f, Box((0, 0, 0),
                             (img.shape[0] - 1, img.shape[1] - 1, 0)),
                      np.asarray(img, dtype=np.float64)[None, :, :, None])
    print(f"wrote {outfile}")
