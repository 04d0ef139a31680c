"""``sCO2`` — supercritical-CO2 jet analysis one-off
(/root/reference/Src/ModelSpecificAnalysis/sCO2/main.cpp): slab-wise
statistics along ``planeCoord`` at the finest level.

Per slab of ``nBinPlanes`` planes: a 2-D (adv_0, adv_1) volume-weighted
conditional mean of Var1 on [0,1]^2 bins, a radial profile of Var1 vs
r = sqrt(y^2+z^2)/R, slab volume-weighted averages of Var1..Var3
("mean.dat": planeLoc avg1 avg2 avg3), and the max of the radial-profile
means ("mcmt.dat": planeLoc mcmt) — main.cpp:160-260 semantics.
comps = 6 variable indices/names: adv_0 adv_1 Var1 Var2 Var3 vfrac.
"""
from __future__ import annotations

import os

import numpy as np

from ..amr.hierarchy import AmrState
from ..parmparse import ParmParse
from .flatten_amr import flatten_to_level


def main(args: dict) -> None:
    from ..io.plotfile import PlotfileReader

    pp = ParmParse(args)
    infile = pp.get_str("infile")
    var_names = PlotfileReader(infile).var_names
    toks = pp.get_str_list("comps")
    if len(toks) != 6:
        raise ValueError("comps must list 6 entries: adv_0 adv_1 Var1 Var2 "
                         "Var3 vfrac")
    names = [var_names[int(t)] if t.lstrip("-").isdigit() else t
             for t in toks]
    plane_coord = pp.get_int("planeCoord")
    nbins = pp.query_int("nBins", 64)
    n_planes = pp.query_int("nBinPlanes", 10)

    st = AmrState.from_plotfile(infile, names=names,
                                max_level=pp.query_int("finestLevel", None),
                                dtype=np.float64)
    lev = st.meta.n_levels - 1
    geom = st.meta.geoms[lev]
    dense = np.asarray(flatten_to_level(st, lev))
    dense = np.moveaxis(dense, 1 + plane_coord, 1)  # [6, plane, a, b]
    na = [d for d in range(3) if d != plane_coord]
    plo = geom.prob_lo
    dx = geom.dx
    R = geom.prob_hi[na[0]]
    ya = plo[na[0]] + (np.arange(dense.shape[2]) + 0.5) * dx[na[0]]
    za = plo[na[1]] + (np.arange(dense.shape[3]) + 0.5) * dx[na[1]]
    r = np.sqrt(ya[:, None] ** 2 + za[None, :] ** 2)
    rbin = np.clip(((nbins - 1) * r / R).astype(int), 0, nbins)

    out_dir = pp.query_str("output_dir", "Output")
    os.makedirs(out_dir, exist_ok=True)
    mean_f = open(pp.query_str("out_mean_file", f"{out_dir}/mean.dat"), "w")
    mcmt_f = open(pp.query_str("out_mcmt_file", f"{out_dir}/mcmt.dat"), "w")

    n_pl = dense.shape[1]
    for c0 in range(0, n_pl, n_planes):
        c1 = min(c0 + n_planes, n_pl)
        slab = dense[:, c0:c1]
        f0, f1, val = slab[0], slab[1], slab[2]
        vol = slab[5]
        # 2-D (adv0, adv1) conditional mean of val
        b0 = np.clip(((nbins - 1) * f0).astype(int), 0, nbins - 1)
        b1 = np.clip(((nbins - 1) * f1).astype(int), 0, nbins - 1)
        flat = (b0 * nbins + b1).ravel()
        wsum = np.bincount(flat, weights=(val * vol).ravel(),
                           minlength=nbins * nbins)
        w = np.bincount(flat, weights=vol.ravel(), minlength=nbins * nbins)
        bins2d = np.where(w > 0, wsum / np.maximum(w, 1e-300), 0.0)
        # radial profile
        rb = np.broadcast_to(rbin[None], val.shape).ravel()
        rws = np.bincount(rb, weights=(val * vol).ravel(),
                          minlength=nbins + 1)
        rw = np.bincount(rb, weights=vol.ravel(), minlength=nbins + 1)
        rprof = np.where(rw > 0, rws / np.maximum(rw, 1e-300), 0.0)
        # slab volume-weighted means of Var1..Var3
        vtot = max(vol.sum(), 1e-300)
        avgs = [(slab[k] * vol).sum() / vtot for k in (2, 3, 4)]
        loc = plo[plane_coord] + (0.5 * (c0 + c1 - 1) + 0.5) * dx[plane_coord]
        mean_f.write(f"{loc:e} " + " ".join(f"{a:e}" for a in avgs) + "\n")
        mcmt_f.write(f"{loc:e} {rprof.max():e}\n")
        np.save(f"{out_dir}/bins2d_{c0:05d}.npy", bins2d.reshape(nbins,
                                                                 nbins))
    mean_f.close()
    mcmt_f.close()
    print(f"wrote {out_dir}/mean.dat, mcmt.dat")
