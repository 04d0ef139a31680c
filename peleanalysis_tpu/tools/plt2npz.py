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
    [mode=levels|flat] [interp=pc|linear] [finestLevel=]
         npz2plt infile=<npz|npy> outfile= [vars=] [prob_lo/hi=] [time=]"""
    if args.get("_tool", ["plt2npz"])[0] == "npz2plt":
        return npz2plt(args)
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
    for lev in range(st.meta.n_levels):
        out[f"dx{lev}"] = np.asarray(st.meta.geoms[lev].dx)
    if mode == "flat":
        from .flatten_amr import flatten_to_level
        interp = pp.query_str("interp", "linear")
        fin = st.meta.n_levels - 1
        out["data"] = np.asarray(
            flatten_to_level(st, fin, interp=interp))[idx]
    elif mode == "levels":
        ds = DenseAmrState.from_batched(st)
        for lev in range(st.meta.n_levels):
            out[f"lev{lev}"] = np.asarray(ds.data[lev])[idx]
            out[f"lev{lev}_valid"] = np.asarray(ds.valid_mask(lev))
            out[f"lev{lev}_lo"] = np.asarray(ds.lmeta[lev].bbox.lo)
    else:
        raise ValueError(f"mode={mode!r}: expected levels or flat")
    np.savez_compressed(outfile, **out)
    print(f"wrote {outfile} ({mode}, {len(names)} comps, "
          f"{st.meta.n_levels} levels)")


def npz2plt(args: dict) -> None:
    """CLI: npz2plt infile=<npz|npy> outfile= [vars=v0 v1 ...]
    [prob_lo=0 0 0] [prob_hi=1 1 1] [time=0] [max_grid_size=64]

    Writes a single-level plotfile from a dense [ncomp, nx, ny, nz] (or
    [nx, ny, nz]) array — a plt2npz mode=flat archive round-trips, and any
    ML-generated field becomes visible to the whole toolchain."""
    from ..amr.box import Box, BoxArray, decompose
    from ..amr.geometry import Geometry
    from ..io.plotfile import write_plotfile

    pp = ParmParse(args)
    infile = pp.get_str("infile")
    outfile = pp.get_str("outfile")
    if infile.endswith(".npy"):
        data = np.load(infile)
        names = None
        plo = phi = None
        time = 0.0
    else:
        z = np.load(infile)
        data = z["data"] if "data" in z else z["lev0"]
        names = [str(n) for n in z["names"]] if "names" in z else None
        plo = z["prob_lo"] if "prob_lo" in z else None
        phi = z["prob_hi"] if "prob_hi" in z else None
        time = float(z["time"]) if "time" in z else 0.0
    if data.ndim == 3:
        data = data[None]
    if data.ndim != 4:
        raise ValueError(f"expected [ncomp, nx, ny, nz] data, got "
                         f"{data.shape}")
    ncomp = data.shape[0]
    names = pp.query_str_list(
        "vars", names or [f"comp_{i}" for i in range(ncomp)])
    if len(names) != ncomp:
        raise ValueError(f"{len(names)} names for {ncomp} comps")
    plo = tuple(pp.query_float_list(
        "prob_lo", list(plo) if plo is not None else [0.0, 0.0, 0.0]))
    phi = tuple(pp.query_float_list(
        "prob_hi", list(phi) if phi is not None else [1.0, 1.0, 1.0]))
    time = pp.query_float("time", time)
    dom = Box((0, 0, 0), tuple(s - 1 for s in data.shape[1:]))
    geom = Geometry(dom, plo, phi, (False,) * 3)
    ba = decompose(dom, pp.query_int("max_grid_size", 64))
    fabs = [np.ascontiguousarray(
        data[(slice(None),) + tuple(slice(b.lo[d], b.hi[d] + 1)
                                    for d in range(3))]) for b in ba]
    write_plotfile(outfile, list(names), time, [geom], [], [ba], [fabs])
    print(f"wrote {outfile} ({ncomp} comps, {dom.shape} cells)")
