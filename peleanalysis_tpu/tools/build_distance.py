"""``buildDistance`` — signed-distance plotfile from an MEF surface
(/root/reference/Src/buildDistance.cpp, 175 LoC: SDFGen per box, same inline
path as isosurface.cpp:1595-1654; distances clamped to dmax).
"""
from __future__ import annotations

import numpy as np

from ..amr.dense import DenseAmrState
from ..amr.hierarchy import AmrState
from ..geom.sdf import signed_distance_dense
from ..io.mef import read_mef
from ..parmparse import ParmParse


def main(args: dict) -> None:
    """CLI: buildDistance infile=<plt> isoFile=<mef> [dmax=<4*dx_finest>]
    [signComp=<field> isoVal=] outfile="""
    pp = ParmParse(args)
    infile = pp.get_str("infile")
    mef = read_mef(pp.get_str("isoFile"))
    sign_field = pp.query_str("signComp", None)
    names = [sign_field] if sign_field else None
    st = AmrState.from_plotfile(infile, names=names,
                                max_level=pp.query_int("finestLevel", None),
                                dtype=np.float64)
    ds = DenseAmrState.from_batched(st)
    fin = st.meta.n_levels - 1
    dmax = pp.query_float("dmax", 4.0 * st.meta.geoms[fin].dx[0])
    iso_val = pp.query_float("isoVal", 0.0)

    out_levels = []
    for lev in range(st.meta.n_levels):
        phi = signed_distance_dense(ds, mef, lev, dmax, sign_field, iso_val)
        out_levels.append(np.asarray(phi)[None])
    import jax.numpy as jnp
    out = ds.with_data(["distance"], [jnp.asarray(d) for d in out_levels])
    outfile = pp.query_str("outfile", infile + "_dist")
    out.to_plotfile(outfile)
    print(f"wrote {outfile}")
