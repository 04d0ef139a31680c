"""``fcompare`` / ``fextrema`` — plotfile diff and extrema reporting.

Not part of PeleAnalysis itself, but every Pele workflow leans on AMReX's
``fcompare``/``fextrema`` executables (amrex/Tools/Plotfile) for regression
diffs, and a standalone framework needs them: fcompare reports per-comp
absolute and relative L-inf/L-2 differences of two plotfiles on matching
hierarchies; fextrema reports per-comp min/max over valid (uncovered)
cells.  Computed on device in one jitted reduction per plotfile.
"""
from __future__ import annotations

import numpy as np

from ..amr.dense import DenseAmrState
from ..amr.hierarchy import AmrState
from ..parmparse import ParmParse


def compare_states(a: DenseAmrState, b: DenseAmrState, names):
    """Per-comp (abs_linf, rel_linf, abs_l2) over valid cells, all levels.
    rel uses |a| as the denominator (fcompare convention)."""
    import jax
    import jax.numpy as jnp

    ia = np.asarray([a.comp(n) for n in names])
    ib = np.asarray([b.comp(n) for n in names])

    @jax.jit
    def red(da, db, masks):
        linf = 0.0
        l2 = 0.0
        amax = 0.0
        for lev in range(len(da)):
            d = jnp.abs(da[lev][ia] - db[lev][ib])
            m = masks[lev][None]
            d = jnp.where(m, d, 0.0)
            linf = jnp.maximum(linf, d.reshape(len(ia), -1).max(axis=1))
            l2 = l2 + (d * d).reshape(len(ia), -1).sum(axis=1)
            amax = jnp.maximum(
                amax, jnp.where(m, jnp.abs(da[lev][ia]),
                                0.0).reshape(len(ia), -1).max(axis=1))
        return linf, jnp.sqrt(l2), amax

    masks = [a.valid_mask(l) for l in range(a.meta.n_levels)]
    linf, l2, amax = (np.asarray(v) for v in
                      red(list(a.data), list(b.data), masks))
    rel = linf / np.maximum(amax, 1e-300)
    return linf, rel, l2


def extrema_state(ds: DenseAmrState, names):
    import jax
    import jax.numpy as jnp

    ia = np.asarray([ds.comp(n) for n in names])

    @jax.jit
    def red(data, masks):
        lo = jnp.inf
        hi = -jnp.inf
        for lev in range(len(data)):
            v = data[lev][ia].reshape(len(ia), -1)
            m = masks[lev].ravel()[None]
            lo = jnp.minimum(lo, jnp.where(m, v, jnp.inf).min(axis=1))
            hi = jnp.maximum(hi, jnp.where(m, v, -jnp.inf).max(axis=1))
        return lo, hi

    masks = [ds.valid_mask(l) for l in range(ds.meta.n_levels)]
    lo, hi = red(list(ds.data), masks)
    return np.asarray(lo), np.asarray(hi)


def main(args: dict) -> None:
    """CLI: fcompare infile1= infile2= [vars=common] [rtol=] [atol=]
         | fextrema infile= [vars=all]
    fcompare exits nonzero when any comp exceeds rtol/atol (if given)."""
    import jax

    # diff/extrema math must run in true float64: the exact regressions
    # fcompare exists to catch (1e-9-relative drifts) vanish at f32.
    # TPUs have no native f64 — pin the host backend (the reductions are
    # trivial and skipping the device roundtrip is faster anyway)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    pp = ParmParse(args)
    tool = args.get("_tool", ["fcompare"])[0]
    if tool == "fextrema":
        infile = pp.get_str("infile")
        st = AmrState.from_plotfile(infile, dtype=np.float64)
        names = pp.query_str_list("vars", st.names)
        ds = DenseAmrState.from_batched(st)
        lo, hi = extrema_state(ds, names)
        w = max(len(n) for n in names)
        print(f" plotfile = {infile}")
        print(f" time     = {st.meta.time}")
        print(f" {'variable'.ljust(w)}   {'minimum value':>20} "
              f"{'maximum value':>20}")
        for n, a, b in zip(names, lo, hi):
            print(f" {n.ljust(w)}   {a:20.10e} {b:20.10e}")
        return

    f1, f2 = pp.get_str("infile1"), pp.get_str("infile2")
    st1 = AmrState.from_plotfile(f1, dtype=np.float64)
    st2 = AmrState.from_plotfile(f2, dtype=np.float64)
    names = pp.query_str_list(
        "vars", [n for n in st1.names if n in st2.names])
    if not names:
        raise ValueError(f"fcompare: no common comps between {f1} and {f2}")
    for fn, st in ((f1, st1), (f2, st2)):
        missing = [n for n in names if n not in st.names]
        if missing:
            raise ValueError(f"fcompare: comps not in {fn}: {missing}")
    # AMReX fcompare aborts unless the BoxArrays agree; matching minimal
    # bboxes with different box unions would diff valid cells against holes
    m1, m2 = st1.meta, st2.meta
    if len(m1.bas) != len(m2.bas) or any(
            ba != bb for ba, bb in zip(m1.bas, m2.bas)):
        raise ValueError("fcompare: BoxArrays are not the same")
    a = DenseAmrState.from_batched(st1)
    b = DenseAmrState.from_batched(st2)
    linf, rel, l2 = compare_states(a, b, names)
    w = max(len(n) for n in names)
    print(f" {'variable'.ljust(w)}   {'absolute error':>16} "
          f"{'relative error':>16} {'L2 error':>16}")
    for n, ai, ri, l2i in zip(names, linf, rel, l2):
        print(f" {n.ljust(w)}   {ai:16.8e} {ri:16.8e} {l2i:16.8e}")
    rtol = pp.query_float("rtol", None)
    atol = pp.query_float("atol", None)
    if rtol is not None and (rel > rtol).any():
        raise SystemExit(f"fcompare: relative error exceeds rtol={rtol}")
    if atol is not None and (linf > atol).any():
        raise SystemExit(f"fcompare: absolute error exceeds atol={atol}")
    if (linf == 0).all():
        print(" PLOTFILES AGREE")
