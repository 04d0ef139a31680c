"""``filterPlt`` — apply a box/Gaussian filter to plotfile components
(/root/reference/Src/filterPlt.cpp, 230 LoC).

Filter-to-grid ratio handling per filterPlt.cpp:22-31,70-85:
  * same_fgr_all_levels=1: constant fgr on every level (filter width shrinks
    with dx)
  * same_fgr_all_levels=0: constant ABSOLUTE width — fgr on the coarsest
    level, scaled by the accumulated ref ratio on finer levels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..amr.dense import DenseAmrState
from ..amr.hierarchy import AmrState
from ..ops.dense_fill import fill_dense_multilevel
from ..ops.filter import filter_weights, separable_filter
from ..parmparse import ParmParse


def filter_state(dstate: DenseAmrState, kind: str = "box", fgr: int = 2,
                 same_fgr_all_levels: bool = True,
                 names=None) -> DenseAmrState:
    meta = dstate.meta
    names = list(names) if names is not None else list(dstate.names)
    comps = [dstate.comp(n) for n in names]
    masks = [dstate.in_level_mask(l) for l in range(meta.n_levels)]
    data = [d[np.asarray(comps)] for d in dstate.data]

    weights = []
    fgr_lev = fgr
    for lev in range(meta.n_levels):
        if lev > 0 and not same_fgr_all_levels:
            fgr_lev = fgr_lev * meta.ref_ratio[lev - 1]
        weights.append(filter_weights(kind, fgr_lev))
    halves = [(len(w) - 1) // 2 for w in weights]

    def all_levels(data_list, mask_list):
        grown = fill_dense_multilevel(meta, dstate.lmeta, data_list,
                                      mask_list, halves)
        return [separable_filter(g, w) for g, w in zip(grown, weights)]

    out = jax.jit(all_levels)(data, masks)
    return dstate.with_data(names, out)


def main(args: dict) -> None:
    """CLI: filterPlt infile= outfile= [filter_type=box|gaussian] [fgr=2]
    [same_fgr_all_levels=1] [vars=all]"""
    pp = ParmParse(args)
    infile = pp.get_str("infile")
    from ..session import load_state
    st = load_state(
        args, infile, max_level=pp.query_int("max_filter_level", None))
    from ..session import dense_state
    ds = dense_state(args, st)
    names = pp.query_str_list(
        "variables", None) or pp.query_str_list("vars", st.names)
    # filter_type: PelePhysics integer codes (filterPlt.cpp:80; Filter.H
    # box=1, gaussian=2) or the spelled-out name
    kind = pp.query_str("filter_type", "box")
    kind = {"1": "box", "2": "gaussian"}.get(kind, kind)
    out = filter_state(
        ds,
        kind=kind,
        fgr=pp.query_int("base_fgr", pp.query_int("fgr", 2)),
        # reference default: fgr is per-level relative to each grid
        # (same_fgr_all_levels=false, filterPlt.cpp:75)
        same_fgr_all_levels=pp.query_bool("same_fgr_all_levels", False),
        names=names)
    outfile = pp.query_str("outfile", infile + "_filt")
    from ..session import get_session, stage_write_plotfile
    sess = get_session(args)
    if sess is not None:
        sess.put_plotfile(outfile, out)
    if stage_write_plotfile(args, out, outfile):
        print(f"wrote {outfile}")
