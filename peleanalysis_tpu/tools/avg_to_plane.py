"""``avgToPlane`` — average plotfile variables along one axis onto a plane
(/root/reference/Src/avgToPlane.cpp, 382 LoC — flagged BROKEN in the
reference's own GNUmakefile:32; this is a working re-implementation with the
same surface: PPM/PGM/FAB plane images via STORE_PPM_STR-style helpers,
avgToPlane.cpp:8-16).

Built on the integral engine: avg-along-dir = integrate1d with avg=1.
"""
from __future__ import annotations

import numpy as np

from ..amr.box import Box
from ..amr.dense import DenseAmrState
from ..amr.hierarchy import AmrState
from ..io.fab import write_fab
from ..parmparse import ParmParse
from .integral import integrate_along, write_dat_2d, write_ppm


def main(args: dict) -> None:
    """CLI: avgToPlane infile= vars=<names> dir=2 [format=ppm|fab|dat]
    [outfile_base=]"""
    pp = ParmParse(args)
    infile = pp.get_str("infile")
    var_names = pp.get_str_list("vars")
    direction = pp.query_int("dir", 2)
    fmt = pp.query_str("format", "fab")
    base = pp.query_str("outfile_base", infile + "_avgplane")

    from ..session import load_state
    st = load_state(args, infile, names=var_names)
    ds = DenseAmrState.from_batched(st)
    coords, w, fields = integrate_along(ds, var_names, [direction], avg=True)
    for n, v in zip(var_names, fields):
        if fmt == "ppm":
            write_ppm(f"{base}_{n}.ppm", v)
        elif fmt == "dat":
            write_dat_2d(f"{base}_{n}.dat", v)
        else:
            with open(f"{base}_{n}.fab", "wb") as f:
                write_fab(f, Box((0, 0, 0),
                                 (v.shape[0] - 1, v.shape[1] - 1, 0)),
                          np.asarray(v, dtype=np.float64)[None, :, :, None])
    print(f"wrote {base}*")
