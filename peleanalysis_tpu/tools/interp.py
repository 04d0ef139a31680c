"""interp: trilinear point-sampling of plotfile fields.

The reference ships this tool only as a never-finished 39-line sketch
(/root/reference/Src/interp.cpp:1-39 — uninitialized members, comment
placeholders where the interpolation math should be; it is excluded from
GNUmakefile builds).  Its clear intent: evaluate a cell-centered MultiFab
(there, a signed-distance field) at arbitrary physical points, trilinearly
interpolating between cell centers with a coarse-level fallback where the
fine level has no data.  This implements that contract, completed:

  * each point is assigned to the FINEST level whose valid region contains
    it (the coarse-fallback semantics the sketch comments ask for,
    interp.cpp:18-24), reusing the streamline engine's owner assignment;
  * sampling is the same cell-centered dual-grid trilinear math the
    streamline sampler uses (``floor((x-plo)/dx - 0.5)`` with clamping,
    stream_nd.f90:153-206) — one jitted gather per level;
  * points outside every level clamp to the domain edge (matching the
    sketch's ``index()`` clamp-free floor, made total).

CLI keys::

  interp infile=<plt> vars=<v1 v2 ...> points=<file>  out=<dat>
         [fmt=dat|csv]

``points``: text file, one ``x y z`` per line ('#' comments allowed).
Output columns: x y z v1 v2 ... (header line with names).
"""
from __future__ import annotations

import numpy as np

from ..parmparse import ParmParse


def sample_at_points(dstate, names, pts: np.ndarray) -> np.ndarray:
    """[npts, len(names)] trilinear samples at the finest level owning each
    point (coarse fallback below the finest valid region)."""
    import jax
    import jax.numpy as jnp

    from ..stream.trace import assign_seeds_to_levels, push_nodes_inside

    meta = dstate.meta
    pts = push_nodes_inside(np.asarray(pts, np.float64), meta.geoms[0])
    owner = assign_seeds_to_levels(dstate, pts)
    comps = [dstate.comp(n) for n in names]
    data = [d[np.asarray(comps)] for d in dstate.data]
    masks = [dstate.in_level_mask(l) for l in range(meta.n_levels)]
    out = np.zeros((len(pts), len(names)))
    lmeta = dstate.lmeta

    for lev in range(meta.n_levels):
        sel = np.nonzero(owner == lev)[0]
        if len(sel) == 0:
            continue
        geom = meta.geoms[lev]
        dx = np.array(geom.dx)
        gbox = lmeta[lev].bbox.grow(1)
        plo_g = (np.array(geom.prob_lo)
                 + (np.array(gbox.lo) - np.array(geom.domain.lo)) * dx)
        # static level index via a per-level jit cache on the state
        cache = getattr(dstate, "_interp_fns", None)
        if cache is None:
            cache = dstate._interp_fns = {}
        key = (lev, len(comps))
        if key not in cache:
            import functools
            cache[key] = jax.jit(functools.partial(
                _sample_level, meta, lmeta, lev))
        vals = cache[key](data, masks, jnp.asarray(pts[sel]),
                          jnp.asarray(plo_g), jnp.asarray(dx))
        out[sel] = np.asarray(vals)
    return out


def _sample_level(meta, lmeta, lev, dl, ml, p, plo_g, dx):
    from ..ops.dense_fill import fill_dense_arrays
    from ..stream.trace import _sample_fields

    grown = fill_dense_arrays(meta, lmeta, dl, ml, lev, 1, None, "linear")
    return _sample_fields(grown, plo_g, dx, p)


def main(args: dict) -> None:
    from ..amr.dense import DenseAmrState
    from ..amr.hierarchy import AmrState

    pp = ParmParse(args)
    infile = pp.get_str("infile")
    names = pp.get_str_list("vars")
    pts_file = pp.get_str("points")
    outfile = pp.query_str("out", "interp.dat")
    fmt = pp.query_str("fmt", "dat")

    pts = np.loadtxt(pts_file, comments="#", ndmin=2)[:, :3]
    state = AmrState.from_plotfile(infile, names=list(names))
    dstate = DenseAmrState.from_batched(state)
    vals = sample_at_points(dstate, names, pts)

    sep = "," if fmt == "csv" else " "
    with open(outfile, "w") as f:
        f.write(("# " if fmt != "csv" else "")
                + sep.join(["x", "y", "z"] + list(names)) + "\n")
        for p, v in zip(pts, vals):
            f.write(sep.join(f"{x:.17g}" for x in list(p) + list(v)) + "\n")
    print(f"wrote {outfile}  ({len(pts)} points, {len(names)} vars)")
