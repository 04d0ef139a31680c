"""``amrToFE`` — flatten the valid AMR hierarchy to an unstructured
finite-element mesh (/root/reference/Src/amrToFE.cpp, 900 LoC).

Nodes sit at valid-cell centers (``connect_cc=1``, amrToFE.cpp:93-113);
elements are the 8-node bricks (4-node quads in 2D) of each level's dual
grid wherever all corners are valid (uncovered) cells — coarse-fine seams
are left open exactly like the reference's per-level meshing.  Output:
Tecplot ASCII FEBRICK (outType=tec) or raw "flt" tables; integer-bbox
subsetting via ``box=`` (amrToFE.cpp:374-387).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..native import savetxt_fast

from ..amr.box import Box
from ..amr.dense import DenseAmrState
from ..amr.hierarchy import AmrState
from ..parmparse import ParmParse


def level_fe_mesh(ds: DenseAmrState, lev: int, names: Sequence[str],
                  sub: Optional[Box] = None, connect_cc: bool = True,
                  n_grow_per: int = 0):
    """Returns (nodes[N, 3+ncomp], bricks[M, 8]) for one level.

    connect_cc=1 (default): nodes at cell centers, bricks between adjacent
    valid cells (amrToFE.cpp:93-113).  connect_cc=0: nodes at cell corners
    with values averaged from adjacent valid cells, one brick per valid
    cell.  n_grow_per grows the level periodically before meshing
    (amrToFE.cpp nGrowPer)."""
    meta = ds.meta
    geom = meta.geoms[lev]
    bbox = ds.lmeta[lev].bbox
    valid = np.asarray(ds.valid_mask(lev))
    data = np.asarray(ds.data[lev])
    if n_grow_per > 0:
        pads = [(n_grow_per, n_grow_per) if geom.is_periodic[d] else (0, 0)
                for d in range(3)]
        valid = np.pad(valid, pads, mode="wrap")
        data = np.pad(data, [(0, 0)] + pads, mode="wrap")
        bbox = Box(tuple(bbox.lo[d] - pads[d][0] for d in range(3)),
                   tuple(bbox.hi[d] + pads[d][1] for d in range(3)))
    if sub is not None:
        s = sub
        for l in range(lev):
            s = s.refine(meta.ref_ratio[l])
        box_mask = np.zeros_like(valid)
        isect = bbox.intersect(s)
        if not isect.is_empty():
            sl = tuple(slice(isect.lo[d] - bbox.lo[d],
                             isect.hi[d] - bbox.lo[d] + 1) for d in range(3))
            box_mask[sl] = True
        valid = valid & box_mask
    ci = [ds.comp(n) for n in names]
    two_d = valid.shape[2] == 1     # promoted DIM=2 plotfile (nz == 1)
    if not connect_cc:
        return _corner_mesh(valid, data[np.asarray(ci)], bbox, geom, two_d)
    node_id = np.full(valid.shape, -1, dtype=np.int64)
    idx = np.argwhere(valid)
    node_id[valid] = np.arange(len(idx))
    dx = geom.dx
    pos = (idx + np.array(bbox.lo) - np.array(geom.domain.lo)
           + 0.5) * np.array(dx) + np.array(geom.prob_lo)
    comps = [data[c][valid] for c in ci]
    nodes = np.column_stack([pos] + comps)

    def nid(base, o):
        return node_id[base[:, 0] + o[0], base[:, 1] + o[1],
                       base[:, 2] + o[2]]

    if two_d:
        # 4-node quads in the z=0 plane (r5 review fix: the 2x2x2 brick
        # stencil has zero z-extent on a promoted 2-D plotfile, so the
        # docstring's "4-node quads in 2D" never materialized)
        ok = valid[:-1, :-1, :]
        for off in ((1, 0, 0), (0, 1, 0), (1, 1, 0)):
            ok = ok & valid[off[0]:valid.shape[0] - 1 + off[0],
                            off[1]:valid.shape[1] - 1 + off[1], :]
        base = np.argwhere(ok)
        if len(base) == 0:
            return nodes, np.zeros((0, 4), dtype=np.int64)
        quads = np.column_stack([
            nid(base, (0, 0, 0)), nid(base, (1, 0, 0)),
            nid(base, (1, 1, 0)), nid(base, (0, 1, 0))])
        return nodes, quads
    # bricks: 2x2x2 corners all valid
    ok = valid[:-1, :-1, :-1]
    for off in ((1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0), (1, 0, 1),
                (0, 1, 1), (1, 1, 1)):
        ok = ok & valid[off[0]:valid.shape[0] - 1 + off[0],
                        off[1]:valid.shape[1] - 1 + off[1],
                        off[2]:valid.shape[2] - 1 + off[2]]
    base = np.argwhere(ok)
    if len(base) == 0:
        return nodes, np.zeros((0, 8), dtype=np.int64)
    # Tecplot FEBRICK corner ordering
    bricks = np.column_stack([
        nid(base, (0, 0, 0)), nid(base, (1, 0, 0)), nid(base, (1, 1, 0)),
        nid(base, (0, 1, 0)), nid(base, (0, 0, 1)), nid(base, (1, 0, 1)),
        nid(base, (1, 1, 1)), nid(base, (0, 1, 1))])
    return nodes, bricks


def _corner_mesh(valid, data, bbox, geom, two_d=False):
    """connect_cc=0: one brick (quad in 2D) per valid cell; nodes at cell
    corners with values averaged from the adjacent valid cells."""
    shp = valid.shape
    z_offs = (0,) if two_d else (0, 1)
    nshape = (shp[0] + 1, shp[1] + 1, shp[2] + (0 if two_d else 1))
    # corner adjacency: accumulate cell values/counters onto the corners
    ncomp = data.shape[0]
    acc = np.zeros((ncomp,) + nshape)
    cnt = np.zeros(nshape)
    v = valid.astype(np.float64)
    for oi in (0, 1):
        for oj in (0, 1):
            for ok in z_offs:
                sl = (slice(oi, shp[0] + oi), slice(oj, shp[1] + oj),
                      slice(ok, shp[2] + ok))
                cnt[sl] += v
                acc[(slice(None),) + sl] += data * v
    used = cnt > 0
    vals = acc / np.maximum(cnt, 1.0)
    node_id = np.full(nshape, -1, dtype=np.int64)
    idx = np.argwhere(used)
    node_id[used] = np.arange(len(idx))
    dx = np.array(geom.dx)
    pos = ((idx + np.array(bbox.lo) - np.array(geom.domain.lo)) * dx
           + np.array(geom.prob_lo))
    if two_d:   # cell-center z for the single plane
        pos[:, 2] += 0.5 * dx[2]
    nodes = np.column_stack([pos] + [vals[c][used] for c in range(ncomp)])
    base = np.argwhere(valid)
    npe = 4 if two_d else 8
    if len(base) == 0:
        return nodes, np.zeros((0, npe), dtype=np.int64)

    def nid(o):
        return node_id[base[:, 0] + o[0], base[:, 1] + o[1],
                       base[:, 2] + o[2]]

    if two_d:
        return nodes, np.column_stack([
            nid((0, 0, 0)), nid((1, 0, 0)), nid((1, 1, 0)), nid((0, 1, 0))])
    bricks = np.column_stack([
        nid((0, 0, 0)), nid((1, 0, 0)), nid((1, 1, 0)), nid((0, 1, 0)),
        nid((0, 0, 1)), nid((1, 0, 1)), nid((1, 1, 1)), nid((0, 1, 1))])
    return nodes, bricks


def write_tec_febrick(path: str, names: Sequence[str], zones) -> None:
    with open(path, "w") as f:
        f.write("VARIABLES = X Y Z " + " ".join(names) + "\n")
        for zi, (nodes, bricks) in enumerate(zones):
            if len(nodes) == 0:
                continue
            npe = bricks.shape[1] if bricks.ndim == 2 else 8
            et = "QUADRILATERAL" if npe == 4 else "BRICK"
            f.write(f'ZONE T="level{zi}" N={len(nodes)} E={max(len(bricks),1)}'
                    f" F=FEPOINT ET={et}\n")
            savetxt_fast(f, nodes, fmt="%.9g")
            if len(bricks) == 0:
                f.write(" ".join(["1"] * npe) + "\n")
            else:
                savetxt_fast(f, bricks + 1, fmt="%d")


def write_flt(path: str, names: Sequence[str], zones) -> None:
    """Raw float table: per zone, node rows then element rows
    (amrToFE.cpp "flt" output analog)."""
    with open(path, "wb") as f:
        nz = np.int32(len(zones))
        nz.tofile(f)
        for nodes, bricks in zones:
            np.array([nodes.shape[0], nodes.shape[1], bricks.shape[0]],
                     dtype=np.int32).tofile(f)
            nodes.astype(np.float32).tofile(f)
            bricks.astype(np.int32).tofile(f)


def main(args: dict) -> None:
    """CLI: amrToFE infile= [vars=all] [outType=tec|flt] [connect_cc=1]
    [box=lo... hi...] [finestLevel=] outfile="""
    pp = ParmParse(args)
    infile = pp.get_str("infile")
    from ..io.plotfile import PlotfileReader
    from ..session import load_state
    avail = PlotfileReader(infile).var_names
    names = pp.query_str_list(
        "comps", None) or pp.query_str_list("vars", avail)
    if pp.contains("sComp") or pp.contains("nComp"):
        s = pp.query_int("sComp", 0)        # comp range (amrToFE.cpp:365-367)
        names = avail[s: s + pp.query_int("nComp", 1)]
    # load only the selected comps (r5 review fix: a vars= subset still
    # parsed+uploaded every component of the plotfile)
    st = load_state(args, infile,
                    names=None if set(names) == set(avail) else list(names),
                    max_level=pp.query_int("finestLevel", None))
    if pp.query_bool("doBin", False):
        print("amrToFE: doBin=1 (binary Tecplot, USE_TEC_BIN_IO build "
              "option) is not supported — writing ASCII")
    ds = DenseAmrState.from_batched(st)
    sub = None
    if pp.contains("box"):
        b = pp.get_int_list("box")
        sub = Box(tuple(b[:3]), tuple(b[3:6]))
    connect_cc = pp.query_bool("connect_cc", True)
    n_grow_per = pp.query_int("nGrowPer", 0)
    zones = [level_fe_mesh(ds, lev, names, sub, connect_cc, n_grow_per)
             for lev in range(st.meta.n_levels)]
    out_type = pp.query_str("outType", "tec")
    outfile = pp.query_str("outfile",
                           infile + (".dat" if out_type == "tec" else ".flt"))
    if out_type == "tec":
        write_tec_febrick(outfile, names, zones)
    else:
        write_flt(outfile, names, zones)
    print(f"wrote {outfile}")
