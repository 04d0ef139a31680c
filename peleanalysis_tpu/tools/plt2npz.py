"""``plt2npz`` — export a plotfile to a NumPy ``.npz`` archive.

No reference analog; the bridge out of the AMReX format into
numpy/ML-pipeline tooling.  Modes:

  * per-level dense arrays (``mode=levels``): ``lev<k>`` is
    ``[ncomp, nx, ny, nz]`` over that level's union bounding box with a
    companion ``lev<k>_valid`` mask (uncovered & in-level), plus
    ``lev<k>_lo`` (bbox origin in level index space);
  * single flattened field (``mode=flat``): one array at the finest
    level's resolution over the whole domain, coarse regions upsampled
    (pc or linear).

Metadata arrays: ``names`` (comp names), ``time``, ``prob_lo``/``prob_hi``,
``dx<k>`` per level.
"""
from __future__ import annotations

import numpy as np

from ..amr.dense import DenseAmrState
from ..amr.hierarchy import AmrState
from ..parmparse import ParmParse


def main(args: dict) -> None:
    """CLI: plt2npz infile= [outfile=<infile>.npz] [vars=all]
    [mode=levels|flat] [interp=pc|linear] [finestLevel=]"""
    pp = ParmParse(args)
    infile = pp.get_str("infile")
    outfile = pp.query_str("outfile", infile.rstrip("/") + ".npz")
    mode = pp.query_str("mode", "levels")
    finest = pp.query_int("finestLevel", None)

    st = AmrState.from_plotfile(infile, max_level=finest, dtype=np.float64)
    names = pp.query_str_list("vars", st.names)
    idx = np.asarray([st.comp(n) for n in names])
    out = {
        "names": np.array(names),
        "time": np.float64(st.meta.time),
        "prob_lo": np.asarray(st.meta.geoms[0].prob_lo),
        "prob_hi": np.asarray(st.meta.geoms[0].prob_hi),
    }
    ds = DenseAmrState.from_batched(st)
    for lev in range(st.meta.n_levels):
        out[f"dx{lev}"] = np.asarray(st.meta.geoms[lev].dx)
    if mode == "flat":
        from .flatten_amr import flatten_to_level
        interp = pp.query_str("interp", "linear")
        fin = st.meta.n_levels - 1
        out["data"] = np.asarray(
            flatten_to_level(st, fin, interp=interp))[idx]
    elif mode == "levels":
        for lev in range(st.meta.n_levels):
            out[f"lev{lev}"] = np.asarray(ds.data[lev])[idx]
            out[f"lev{lev}_valid"] = np.asarray(ds.valid_mask(lev))
            out[f"lev{lev}_lo"] = np.asarray(ds.lmeta[lev].bbox.lo)
    else:
        raise ValueError(f"mode={mode!r}: expected levels or flat")
    np.savez_compressed(outfile, **out)
    print(f"wrote {outfile} ({mode}, {len(names)} comps, "
          f"{st.meta.n_levels} levels)")
