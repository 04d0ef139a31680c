"""``sampleStreamlines`` — re-sample plotfile fields onto existing
streamlines (/root/reference/Src/sampleStreamlines.cpp +
sampleStreamlines_nd.f90 interpstream).

Each line is sampled in the level that owns its seed with a grown dense
array covering the line extents (the reference's nGrow strategy); the
trilinear sampling is the same ntrpv math as tracing.  Memory-limited
component groups (nCompsPerPass, Docs/source/sampleStreamlines.rst) are
honored by chunking the sampled variable list.
"""
from __future__ import annotations

import numpy as np

from ..amr.dense import DenseAmrState
from ..amr.hierarchy import AmrState
from ..io.stream_data import read_stream_data, StreamData, write_stream_data
from ..ops.dense_fill import fill_dense_arrays
from ..parmparse import ParmParse
from ..stream.trace import _sample_fields, assign_seeds_to_levels


def sample_onto_lines(ds: DenseAmrState, lines: np.ndarray,
                      names) -> np.ndarray:
    """Sample components `names` of ds at every line point.
    Returns [nl, npts, len(names)]."""
    import jax.numpy as jnp

    meta = ds.meta
    comps = [ds.comp(n) for n in names]
    masks = [ds.in_level_mask(l) for l in range(meta.n_levels)]
    data = [d[np.asarray(comps)] for d in ds.data]
    seeds = lines[:, (lines.shape[1] - 1) // 2, :3]
    owner = assign_seeds_to_levels(ds, seeds)
    out = np.zeros(lines.shape[:2] + (len(names),))
    for lev in range(meta.n_levels):
        sel = np.nonzero(owner == lev)[0]
        if len(sel) == 0:
            continue
        geom = meta.geoms[lev]
        dx = np.array(geom.dx)
        bbox = ds.lmeta[lev].bbox
        # ghost radius covering the selected lines' extents
        pts = lines[sel][:, :, :3].reshape(-1, 3)
        lo_need = pts.min(axis=0)
        hi_need = pts.max(axis=0)
        plo = np.array(geom.prob_lo)
        lo_cell = np.floor((lo_need - plo) / dx).astype(int) \
            + np.array(geom.domain.lo)
        hi_cell = np.floor((hi_need - plo) / dx).astype(int) \
            + np.array(geom.domain.lo)
        g = int(max(np.maximum(np.array(bbox.lo) - lo_cell, 0).max(),
                    np.maximum(hi_cell - np.array(bbox.hi), 0).max())) + 2
        grown = fill_dense_arrays(meta, ds.lmeta, data, masks, lev, g,
                                  None, "linear")
        gbox = bbox.grow(g)
        plo_g = plo + (np.array(gbox.lo) - np.array(geom.domain.lo)) * dx
        vals = _sample_fields(grown, jnp.asarray(plo_g), jnp.asarray(dx),
                              jnp.asarray(lines[sel][:, :, :3]))
        out[sel] = np.asarray(vals)
    return out


def sample_onto_lines_sparse(state, lines: np.ndarray, names) -> np.ndarray:
    """Sparse-refinement sampling: lines partitioned by seed like
    trace_streamlines_sparse (clusters separated by each line's full
    extent radius, so per-cluster grown fills are exact)."""
    from ..amr.cluster import cluster_substates

    meta = state.meta
    fin = meta.n_levels - 1
    if lines.shape[0] == 0:
        return np.zeros(lines.shape[:2] + (len(names),))
    seeds = lines[:, (lines.shape[1] - 1) // 2, :3]
    # separation: the largest distance any selected line wanders from its
    # seed, in finest cells
    reach = np.abs(lines[:, :, :3] - seeds[:, None]).max() \
        / min(meta.geoms[fin].dx)
    groups, subs, base = cluster_substates(
        state, dist=int(np.ceil(reach)) + 3)
    geom_f = meta.geoms[fin]
    idxf = np.floor((seeds - np.array(geom_f.prob_lo))
                    / np.array(geom_f.dx)).astype(np.int64) \
        + np.array(geom_f.domain.lo)
    cluster_of = np.full(len(seeds), -1, np.int64)
    boxes = list(meta.bas[fin])
    for gi, g in enumerate(groups):
        for i in g:
            b = boxes[i]
            inb = np.all((idxf >= np.array(b.lo))
                         & (idxf <= np.array(b.hi)), axis=1)
            cluster_of[inb] = gi
    out = np.zeros(lines.shape[:2] + (len(names),))
    sel0 = np.nonzero(cluster_of < 0)[0]
    if len(sel0):
        out[sel0] = sample_onto_lines(subs[0], lines[sel0], names)
    for gi in range(len(groups)):
        sel = np.nonzero(cluster_of == gi)[0]
        if len(sel):
            out[sel] = sample_onto_lines(subs[gi], lines[sel], names)
    return out


def main(args: dict) -> None:
    """CLI: sampleStreamlines plotfile= pathFile= [comps=... | sComp= nComp=]
    [nCompsPerPass=-1] [streamSampleFile= | outFile=]"""
    from ..io.plotfile import PlotfileReader
    from .stream import write_tecplot_lines

    pp = ParmParse(args)
    plotfile = pp.get_str("plotfile")
    path_file = pp.get_str("pathFile")
    from ..session import read_stream
    sd = read_stream(args, path_file)

    r = PlotfileReader(plotfile)
    if pp.contains("comps"):
        names = [r.var_names[int(c)] if c.isdigit() else c
                 for c in pp.get_str_list("comps")]
    else:
        s = pp.query_int("sComp", 0)
        n = pp.query_int("nComp", len(r.var_names))
        names = r.var_names[s : s + n]

    per_pass = pp.query_int("nCompsPerPass", -1)
    if per_pass <= 0:
        per_pass = len(names)
    sampled = []
    for i in range(0, len(names), per_pass):
        grp = names[i : i + per_pass]
        from ..session import load_state
        # reference default: periodic in every dim
        # (sampleStreamlines.cpp:163 'Vector<int> is_per(BL_SPACEDIM,1)';
        # r5 review fix — this defaulted non-periodic)
        st = load_state(args, plotfile, names=grp,
                                    max_level=pp.query_int("finestLevel",
                                                           None),
                                    is_periodic=[bool(p) for p in
                                                 pp.query_int_list(
                                                     "is_per", [1, 1, 1])],
                                    dtype=np.float64)
        from ..amr.cluster import needs_clustering
        if (st.meta.n_levels > 1 and needs_clustering(st.meta.bas[-1])
                and not pp.query_bool("force_dense", False)):
            print("sampleStreamlines: sparse refinement -> clustered path")
            sampled.append(sample_onto_lines_sparse(st, sd.lines, grp))
        else:
            ds = DenseAmrState.from_batched(st)
            sampled.append(sample_onto_lines(ds, sd.lines, grp))
    # the reference schema is X,Y,Z, distance_from_seed, <vars>
    # (sampleStreamlines.cpp:145,203 set_sample_distance; r5 review fix:
    # the distance component was dropped, mis-indexing reference-schema
    # consumers by one): signed arclength, zero at the seed station
    from ..stream.surface import arc_length
    s = arc_length(sd.lines)
    mid = (sd.lines.shape[1] - 1) // 2
    dist = (s - s[:, mid:mid + 1])[:, :, None]
    new_lines = np.concatenate([sd.lines[:, :, :3], dist] + sampled, axis=2)
    new_names = ["X", "Y", "Z", "distance_from_seed"] + names
    out_sd = StreamData(new_names, sd.elements, sd.inside_nodes, new_lines)
    if pp.contains("streamSampleFile") or pp.contains("outfile"):
        dst = pp.query_str("streamSampleFile", None) \
            or pp.get_str("outfile")   # reference key (sampleStreamlines.cpp:130)
        write_stream_data(dst, out_sd)
        print(f"wrote {dst}")
    elif pp.contains("outFile"):
        write_tecplot_lines(pp.get_str("outFile"), new_names, new_lines)
        print(f"wrote {pp.get_str('outFile')}")
    else:
        raise ValueError("Must specify streamSampleFile or outFile")
