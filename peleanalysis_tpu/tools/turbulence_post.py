"""HIT post-processing pipeline — the Turbulence_analysis analog.

Replaces /root/reference/Src/PythonScripts/Turbulence_analysis/ (yt + FFTW2
+ AmrDeriveSpectrum + AMReX AugmentPlotfile) with tools over this
framework's own reader and stencils:

  augmentPlotfile    add vorticity components/magvort and divu to a plotfile
                     (the AMReX Tools/C_util/AugmentPlotfile step of post.sh)
  turbulenceTseries  volume-weighted <kin_energy>, <|omega|^2>, <T'^2>,
                     <divu^2> per plotfile in a run directory, nondimension-
                     alized from ic.txt -> tseries.csv
                     (yt_post_scrape_tseries.py + yt_post_scrape_common.py)
  turbulenceSlice    mid-plane slice + x-line profiles of the slice fields
                     (yt_post_scrape_slice.py; line at the domain midpoint)
  varfieldAverage    cell-mass-weighted average of one variable
                     (solution_varfield_average.py)

Spectra come from the existing ``turbulenceSpectra`` tool; scripts/post_hit.py
chains all stages like post.sh.  No yt: plotfiles load through io/plotfile;
gradients come from ops/stencil on the dense model (valid-cell masked, so
multilevel plotfiles are handled where yt would require covering grids).
"""
from __future__ import annotations

import glob
import os
import re
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..parmparse import ParmParse

GAMMA = 1.4   # yt_post_scrape_common.py:25


def load_dim_consts(rootdir: str) -> Dict[str, float]:
    """Parse ic.txt (headings line + values line, comma separated —
    yt_post_scrape_common.py load_dim_consts)."""
    with open(os.path.join(rootdir, "ic.txt")) as f:
        lines = f.read().replace(" ", "").split("\n")
    headings = lines[0].split(",")
    vals = [float(v) for v in lines[1].split(",") if v]
    return dict(zip(headings, vals))


def _list_plotfiles(root: str) -> List[str]:
    out = []
    for p in sorted(glob.glob(os.path.join(root, "plt*"))):
        if os.path.isdir(p) and re.search(r"plt[0-9]+$", p):
            out.append(p)
    return out


def _dense(path, names, dtype=np.float64, is_periodic=(True, True, True)):
    # HIT boxes are periodic (the reference pipeline is written for the
    # PeleC HIT regression case); plotfile headers don't store periodicity,
    # so default to periodic — tools expose is_per to override
    from ..amr.dense import DenseAmrState
    from ..amr.hierarchy import AmrState
    return DenseAmrState.from_batched(
        AmrState.from_plotfile(path, names=names, dtype=dtype,
                               is_periodic=list(is_periodic)))


def _vort_divu(ds):
    """Vorticity components + divergence from velocity gradients (the
    vort_*_func / dilatation_func definitions,
    yt_post_scrape_common.py:71-120).  Returns per-level lists."""
    import jax.numpy as jnp

    from ..ops.dense_fill import fill_dense_multilevel
    from ..ops.stencil import centered_gradient

    meta = ds.meta
    masks = [ds.in_level_mask(l) for l in range(meta.n_levels)]
    comps = [ds.comp(n) for n in ("x_velocity", "y_velocity", "z_velocity")]
    vel = [d[np.asarray(comps)] for d in ds.data]
    grown = fill_dense_multilevel(meta, ds.lmeta, vel, masks, 1,
                                  None, "linear")
    out = []
    for lev, g in enumerate(grown):
        dx = meta.geoms[lev].dx
        gU = [centered_gradient(g[d][None], dx, 1) for d in range(3)]
        # gU[i][j] = d u_i / d x_j, each [1, *bbox]
        wx = gU[2][1][0] - gU[1][2][0]
        wy = gU[0][2][0] - gU[2][0][0]
        wz = gU[1][0][0] - gU[0][1][0]
        divu = gU[0][0][0] + gU[1][1][0] + gU[2][2][0]
        magv = jnp.sqrt(wx * wx + wy * wy + wz * wz)
        out.append((wx, wy, wz, magv, divu))
    return out


def _wavg(ds, per_level_vals, weight_levels=None) -> float:
    """Volume-weighted average over valid cells of all levels (the
    yt weighted_average_quantity(..., 'cell_volume') analog)."""
    import jax.numpy as jnp
    num = den = 0.0
    for lev in range(ds.meta.n_levels):
        vol = float(np.prod(ds.meta.geoms[lev].dx))
        m = ds.valid_mask(lev)
        w = jnp.where(m, vol, 0.0)
        if weight_levels is not None:
            w = w * weight_levels[lev]
        num += float(jnp.sum(w * per_level_vals[lev]))
        den += float(jnp.sum(w))
    return num / max(den, 1e-300)


def augment_plotfile(infile: str, outfile: str, add_vorticity: bool = True,
                     add_divergence: bool = True,
                     is_periodic=(True, True, True)) -> None:
    """AugmentPlotfile analog: append x/y/z_vorticity, magvort and divu
    components computed from the velocity field."""
    ds = _dense(infile, None, is_periodic=is_periodic)
    vd = _vort_divu(ds)
    names = list(ds.names)
    new_names = []
    if add_vorticity:
        new_names += ["x_vorticity", "y_vorticity", "z_vorticity", "magvort"]
    if add_divergence:
        new_names += ["divu"]
    import jax.numpy as jnp
    out_levels = []
    for lev in range(ds.meta.n_levels):
        wx, wy, wz, magv, divu = vd[lev]
        extra = []
        if add_vorticity:
            extra += [wx, wy, wz, magv]
        if add_divergence:
            extra += [divu]
        out_levels.append(jnp.concatenate(
            [ds.data[lev]] + [e[None] for e in extra], axis=0))
    ds.with_data(names + new_names, out_levels).to_plotfile(outfile)


def scrape_tseries(root: str, method: str = "UnknownMethod") -> str:
    """Per-plotfile volume-weighted averages + ic.txt nondimensionalization
    -> <root>/tseries.csv (column layout like yt_post_scrape_tseries.py:
    tau column first, one column per quantity, one row per time)."""
    dc = load_dim_consts(root)
    plts = _list_plotfiles(root)
    if not plts:
        raise ValueError(f"no plt[0-9]* plotfiles under {root}")
    rows = []
    import jax.numpy as jnp
    for plt in plts:
        from ..io.plotfile import PlotfileReader
        r = PlotfileReader(plt)
        temp_field = next((n for n in r.var_names if "temp" in n.lower()),
                          None)
        need = ["x_velocity", "y_velocity", "z_velocity"]
        if temp_field:
            need.append(temp_field)
        ds = _dense(plt, need)
        vd = _vort_divu(ds)
        ke = [sum(ds.data[l][ds.comp(n)] ** 2 for n in need[:3])
              for l in range(ds.meta.n_levels)]
        res = {
            "time": ds.meta.time,
            "kin_energy_avg": _wavg(ds, ke),
            "magvort_sq_avg": _wavg(ds, [v[3] ** 2 for v in vd]),
            "divu_sq_avg": _wavg(ds, [v[4] ** 2 for v in vd]),
        }
        if temp_field:
            it = ds.comp(temp_field)
            t_avg = _wavg(ds, [d[it] for d in ds.data])
            res["temp_var_sq_avg"] = _wavg(
                ds, [(d[it] - t_avg) ** 2 for d in ds.data])
        else:
            res["temp_var_sq_avg"] = 0.0
        # nondimensionalization (yt_post_scrape_tseries.py:120-133)
        res.update({
            "time_adim": res["time"] / dc["tau"],
            "kin_energy_avg_adim": res["kin_energy_avg"]
            / (3 * dc["urms0"] ** 2),
            "urms_computed": float(np.sqrt(res["kin_energy_avg"] / 3)),
            "Mach_t_computed": float(np.sqrt(res["kin_energy_avg"])
                                     / dc["c_s0"]),
            "magvort_sq_avg_adim": res["magvort_sq_avg"]
            / (dc["urms0"] / dc["lambda0"]) ** 2,
            "temp_var_sq_avg_adim": res["temp_var_sq_avg"]
            / ((GAMMA - 1) * dc["T0"] * dc["Mach"] ** 2) ** 2,
            "divu_sq_avg_adim": res["divu_sq_avg"]
            / (dc["urms0"] / dc["lambda0"]) ** 2,
        })
        rows.append(res)
    keys = ["time_adim", "kin_energy_avg_adim", "urms_computed",
            "Mach_t_computed", "magvort_sq_avg_adim",
            "temp_var_sq_avg_adim", "divu_sq_avg_adim"]
    out = os.path.join(root, "tseries.csv")
    with open(out, "w") as f:
        f.write(",".join(["tau"] + keys[1:]) + "\n")
        for r_ in rows:
            f.write(",".join(str(r_[k]) for k in keys) + "\n")
    return out


def scrape_slice(root: str, plotfile: str) -> str:
    """Mid-plane (z) slice of kin_energy/temp'/divu/magvort + x-line
    profiles through the domain midpoint -> <plotfile>_slice.dat
    (the yt_post_scrape_slice.py ortho_ray + SlicePlot scrape)."""
    dc = load_dim_consts(root)
    path = plotfile if os.path.isdir(plotfile) \
        else os.path.join(root, plotfile)
    from ..io.plotfile import PlotfileReader
    r = PlotfileReader(path)
    temp_field = next((n for n in r.var_names if "temp" in n.lower()), None)
    need = ["x_velocity", "y_velocity", "z_velocity"]
    if temp_field:
        need.append(temp_field)
    ds = _dense(path, need)
    vd = _vort_divu(ds)
    lev = 0
    g = ds.meta.geoms[lev]
    shp = ds.lmeta[lev].bbox.shape
    jmid, kmid = shp[1] // 2, shp[2] // 2
    d0 = np.asarray(ds.data[lev])
    ke = sum(d0[ds.comp(n)] ** 2 for n in need[:3])
    magv = np.asarray(vd[lev][3])
    divu = np.asarray(vd[lev][4])
    if temp_field:
        it = ds.comp(temp_field)
        t_avg = _wavg(ds, [d[it] for d in ds.data])
        tvar = d0[it] - t_avg
    else:
        tvar = np.zeros_like(ke)
    x = g.prob_lo[0] + (np.arange(shp[0]) + 0.5) * g.dx[0]
    out = path + "_slice.dat"
    with open(out, "w") as f:
        f.write("# x-line profiles through the domain midpoint; adim "
                "factors from ic.txt\n")
        f.write("# x divu_adim temp_var_adim magvort_adim kin_energy_adim\n")
        dil = dc["urms0"] / dc["lambda0"]
        tv = (GAMMA - 1) * dc["T0"] * dc["Mach"] ** 2
        for i in range(shp[0]):
            f.write(f"{x[i]:.9g} {divu[i, jmid, kmid] / dil:.9g} "
                    f"{tvar[i, jmid, kmid] / tv:.9g} "
                    f"{magv[i, jmid, kmid] / dil:.9g} "
                    f"{ke[i, jmid, kmid] / (3 * dc['urms0'] ** 2):.9g}\n")
        f.write(f"\n# z-midplane slice of kin_energy [{shp[0]}x{shp[1]}]\n")
        np.savetxt(f, ke[:, :, kmid], fmt="%.9g")
    return out


def varfield_average(plotfile: str, var: str) -> float:
    """Cell-mass-weighted (density * volume) average of one variable
    (solution_varfield_average.py)."""
    ds = _dense(plotfile, [var, "density"])
    idv = ds.comp("density")
    iv = ds.comp(var)
    avg = _wavg(ds, [d[iv] for d in ds.data],
                weight_levels=[d[idv] for d in ds.data])
    print(f"Average {var} (weighted by cell_mass) is {avg:0.3e}")
    return avg


def main(args: dict) -> None:
    """CLI: augmentPlotfile infile= outfile= [add_vorticity=1]
    [add_divergence=1] | turbulenceTseries root_dir= [method=] |
    turbulenceSlice root_dir= plotfile= | varfieldAverage plotfile= var="""
    pp = ParmParse(args)
    tool = args.get("_tool", ["?"])[0]
    if tool == "augmentPlotfile":
        infile = pp.get_str("infile")
        augment_plotfile(infile, pp.query_str("outfile", infile + "_aug"),
                         pp.query_bool("add_vorticity", True),
                         pp.query_bool("add_divergence", True),
                         is_periodic=tuple(
                             bool(p) for p in
                             pp.query_int_list("is_per", [1, 1, 1])))
        print(f"wrote {pp.query_str('outfile', infile + '_aug')}")
    elif tool == "turbulenceTseries":
        out = scrape_tseries(pp.get_str("root_dir"),
                             pp.query_str("method", "UnknownMethod"))
        print(f"wrote {out}")
    elif tool == "turbulenceSlice":
        out = scrape_slice(pp.get_str("root_dir"), pp.get_str("plotfile"))
        print(f"wrote {out}")
    elif tool == "varfieldAverage":
        varfield_average(pp.get_str("plotfile"), pp.get_str("var"))
    else:
        raise ValueError(f"unknown turbulence tool {tool}")
