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
from .integral import write_pgm, write_ppm


def slice_field(st: AmrState, var: str, direction: int, idx: int
                ) -> np.ndarray:
    """2-D slice at finest-level cell index ``idx`` along ``direction``."""
    lev = st.meta.n_levels - 1
    geom = st.meta.geoms[lev]
    dense = np.asarray(flatten_to_level(st, lev))
    ic = st.comp(var)
    i = int(np.clip(idx, 0, geom.domain.shape[direction] - 1))
    sl = [slice(None)] * 3
    sl[direction] = i
    return dense[(ic,) + tuple(sl)]


def read_amrvis_palette(path: str) -> np.ndarray:
    """amrvis .pal file: 256 (or fewer) R,G,B byte triples (the format the
    reference loads at slicePlot.cpp:76 via loadPalette)."""
    raw = np.fromfile(path, dtype=np.uint8)
    n = len(raw) // 3
    return raw[: 3 * n].reshape(n, 3)


def main(args: dict) -> None:
    """CLI (reference keys, slicePlot.cpp:28-90): slicePlot file= varname=
    slicedir= sliceloc=<finest cell index> [finestLevel=] [outtype=image|
    gray|fab] [min=] [max=] [palette=<amrvis .pal>] [outfile=]
    Aliases kept from earlier revisions: infile= var= dir= loc=<physical>.
    """
    pp = ParmParse(args)
    infile = pp.query_str("file", None) or pp.get_str("infile")
    var = pp.query_str("varname", None) or pp.query_str("var", "temp")
    direction = pp.query_int("slicedir", pp.query_int("dir", 2))
    finest = pp.query_int("finestLevel", None)
    from ..session import load_state
    st = load_state(args, infile, names=[var], max_level=finest)
    lev = st.meta.n_levels - 1
    geom = st.meta.geoms[lev]
    if pp.contains("sliceloc"):
        idx = pp.get_int("sliceloc")
    else:
        loc = pp.query_float(
            "loc", 0.5 * (geom.prob_lo[direction] + geom.prob_hi[direction]))
        idx = int((loc - geom.prob_lo[direction]) / geom.dx[direction])

    out_type = pp.query_str("outtype", None)
    if out_type is None:
        fmt = pp.query_str("format", "ppm")
        out_type = {"ppm": "image", "pgm": "gray"}.get(fmt, fmt)
    img = slice_field(st, var, direction, idx)
    ext = {"image": "ppm", "gray": "pgm"}.get(out_type, "fab")
    outfile = pp.query_str(
        "outfile", f"{infile}_{var}_d{direction}_{idx}.{ext}")
    if out_type in ("image", "gray"):
        vmin = pp.query_float("min", None)
        vmax = pp.query_float("max", None)
        if out_type == "gray":
            # true P5 grayscale like the reference's STORE_PGM_STR
            # (slicePlot.cpp:86-88,137-138), not a P6 with equal channels
            write_pgm(outfile, img, vmin=vmin, vmax=vmax)
        else:
            pal = "rainbow"
            if pp.contains("palette"):
                pal = read_amrvis_palette(pp.get_str("palette"))
            write_ppm(outfile, img, vmin=vmin, vmax=vmax, palette=pal)
    else:
        with open(outfile, "wb") as f:
            write_fab(f, Box((0, 0, 0),
                             (img.shape[0] - 1, img.shape[1] - 1, 0)),
                      np.asarray(img, dtype=np.float64)[None, :, :, None])
    print(f"wrote {outfile}")
