"""``streamTubeStats`` — statistics over triangular-prism "stream tubes"
bounded by 3 neighboring streamlines
(/root/reference/Src/streamTubeStats.cpp, 1763 LoC — serial-only in the
reference, streamTubeStats.cpp:306-307; fully vectorized here).

Per element (a seed-surface triangle whose corners are streamlines):
  * volume: sum over arclength stations of the wedge volumes (3-tet
    decomposition of each triangular prism; wedge_volume_int analog,
    streamTubeStats.cpp:666-686)
  * area: seed-triangle area (wedge_surf_area at the seed station, :665)
  * per intComp: volume integral of the field, divided by the seed area
    (:694-698); area_wtAvg accumulates int*mid-area for the first intComp
  * smoothedInt: nSmooth passes of area-weighted node-neighbor averaging of
    the first intComp (smoothVals, :275-299, 784-790)
  * per avgComp: mean of the 3 lines' SEED values (:703-712)
  * per gradComp: mean over corners of each line's max |d(comp)/ds|
  * per peakComp: mean over corners of each line's max value, with a
    "<name>_peakOK" flag = 1 when every corner's peak is interior
  * compsAtPeakFCR: line values at the FCRComp peak station, averaged
Output: MEF with element-centered values duplicated at the element's nodes
(Docs/source/streamTubeStats.rst), and/or Tecplot.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from ..io.mef import MEF, write_mef, write_mef_tecplot, read_mef
from ..parmparse import ParmParse
from ..stream.surface import arc_length


def _tet_vol(a, b, c, d):
    return np.einsum("ij,ij->i", np.cross(b - a, c - a), d - a) / 6.0


def wedge_volumes_ints(lines: np.ndarray, elements: np.ndarray,
                       comp_idx: Sequence[int]):
    """Per element: total tube volume and per-comp volume integrals.
    lines [nl, npts, nv]; elements [ne, 3]."""
    P = lines[:, :, :3]
    ne = len(elements)
    vol = np.zeros(ne)
    ints = np.zeros((ne, len(comp_idx)))
    wa = np.zeros(ne)
    l0, l1, l2 = elements[:, 0], elements[:, 1], elements[:, 2]
    npts = lines.shape[1]
    for j in range(npts - 1):
        p = [P[l0, j], P[l1, j], P[l2, j]]
        q = [P[l0, j + 1], P[l1, j + 1], P[l2, j + 1]]
        tets = [(p[0], p[1], p[2], q[0]),
                (p[1], p[2], q[0], q[1]),
                (p[2], q[0], q[1], q[2])]
        tet_corners = [((l0, j), (l1, j), (l2, j), (l0, j + 1)),
                       ((l1, j), (l2, j), (l0, j + 1), (l1, j + 1)),
                       ((l2, j), (l0, j + 1), (l1, j + 1), (l2, j + 1))]
        vjs = [np.abs(_tet_vol(*t)) for t in tets]
        vol += sum(vjs)
        if comp_idx:
            a_mid = 0.5 * (_tri_area(p[0], p[1], p[2])
                           + _tri_area(q[0], q[1], q[2]))
        for kk, c in enumerate(comp_idx):
            for vj, corners in zip(vjs, tet_corners):
                mean = sum(lines[li, jj, c] for (li, jj) in corners) / 4.0
                ints[:, kk] += vj * mean
                if kk == 0:
                    # area_wtAvg: int * mid-area for the first intComp
                    # (:680-686); accumulated in the same pass (the corner
                    # means were recomputed in a second loop before r5)
                    wa += vj * mean * a_mid
    return vol, ints, wa


def _tri_area(a, b, c):
    return 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)


def element_adjacency_pairs(elements: np.ndarray,
                            n_nodes: int) -> Tuple[np.ndarray, np.ndarray]:
    """Deduplicated element-adjacency pair list (a, b): element b shares at
    least one node with element a (self included once).  Fully vectorized:
    group node→element incidence, emit all within-group pairs, unique.
    Pair count ≈ ne × mean 1-ring size (~13 for a manifold triangulation)."""
    ne = len(elements)
    k = elements.shape[1]
    inc_n = elements.ravel()
    inc_e = np.repeat(np.arange(ne, dtype=np.int32), k)
    order = np.argsort(inc_n, kind="stable")
    n_sorted = inc_n[order]
    e_sorted = inc_e[order]
    counts = np.bincount(n_sorted, minlength=n_nodes)
    starts = (np.concatenate([[0], np.cumsum(counts)])[:-1]
              .astype(np.int64))
    # pair (a, b) construction without div/mod: each incidence slot t (node
    # g, element a) contributes a run of that node's full element list —
    # a = slot's element repeated s times, b = the group's slot range.
    rep = counts[n_sorted]                       # per-slot group size
    tot = int(rep.sum(dtype=np.int64))
    a = np.repeat(e_sorted, rep)
    run_off = np.concatenate([[0], np.cumsum(rep)[:-1]]).astype(np.int64)
    idx = (np.arange(tot, dtype=np.int64)
           - np.repeat(run_off, rep) + np.repeat(starts[n_sorted], rep))
    b = e_sorted[idx]
    # dedup (a,b) across shared nodes — the reference's per-element `seen`
    # set (streamTubeStats.cpp:284-293) counts each neighbor once even
    # when it shares 2-3 nodes
    key = np.unique(a.astype(np.int64) * ne + b)
    return (key // ne), (key % ne)


def smooth_values(vals: np.ndarray, areas: np.ndarray,
                  elements: np.ndarray, n_nodes: int,
                  n_smooth: int) -> np.ndarray:
    """Area-weighted node-neighbor elemental smoothing (smoothVals,
    streamTubeStats.cpp:275-299): each element averages over elements
    sharing any of its nodes, each neighbor counted ONCE even when it
    shares 2-3 nodes (the reference's per-element `seen` set).

    Vectorized by inclusion–exclusion over segment sums: a neighbor
    sharing m nodes appears m times in the node-incidence sum, C(m,2)
    times in the edge-incidence sum, and C(m,3) times in the
    same-triple sum, and m − C(m,2) + C(m,3) = 1 for m ∈ {1,2,3} — so
    acc = Σ_nodes S_n − Σ_edges S_e + S_triple, three bincount/gather
    passes, O(ne) per iteration with no pair list at all (the same
    segment-sum shape the device stats path uses, SURVEY §2.7.6).
    Degenerate elements (repeated nodes) fall back to an explicit
    deduplicated pair list."""
    if n_smooth <= 0:
        return vals.copy()
    ne = len(elements)
    e = np.asarray(elements, dtype=np.int64)
    degenerate = ((e[:, 0] == e[:, 1]) | (e[:, 1] == e[:, 2])
                  | (e[:, 0] == e[:, 2])).any()
    if degenerate:
        pa, pb = element_adjacency_pairs(elements, n_nodes)
        wacc = np.maximum(np.bincount(pa, weights=areas[pb], minlength=ne),
                          1e-300)
        out = vals.copy()
        for _ in range(n_smooth):
            acc = np.bincount(pa, weights=out[pb] * areas[pb], minlength=ne)
            out = acc / wacc
        return out
    # segment ids: nodes (given), undirected edges, sorted node triples
    es = np.sort(e, axis=1)
    edge_keys = np.stack([es[:, 0] * n_nodes + es[:, 1],
                          es[:, 1] * n_nodes + es[:, 2],
                          es[:, 0] * n_nodes + es[:, 2]], axis=1)
    ue, edge_id = np.unique(edge_keys, return_inverse=True)
    edge_id = edge_id.reshape(ne, 3)
    pair12 = np.unique(es[:, 0] * n_nodes + es[:, 1], return_inverse=True)
    tri_keys = pair12[1].astype(np.int64) * n_nodes + es[:, 2]
    ut, tri_id = np.unique(tri_keys, return_inverse=True)

    def one_ring_sum(w):
        s_node = np.bincount(e.ravel(), weights=np.repeat(w, 3),
                             minlength=n_nodes)
        s_edge = np.bincount(edge_id.ravel(), weights=np.repeat(w, 3),
                             minlength=len(ue))
        s_tri = np.bincount(tri_id, weights=w, minlength=len(ut))
        return (s_node[e].sum(axis=1) - s_edge[edge_id].sum(axis=1)
                + s_tri[tri_id])

    wacc = np.maximum(one_ring_sum(areas), 1e-300)
    out = vals.copy()
    for _ in range(n_smooth):
        out = one_ring_sum(out * areas) / wacc
    return out


def main(args: dict) -> None:
    """CLI: streamTubeStats infile=<StreamData> [intComps=] [avgComps=]
    [gradComps=] [peakComp=] [FCRComp= compsAtPeakFCR= namesAtPeakFCR=]
    [aux_mef= aux_mef_comps=] [nSmooth=0] [write_mef=1] [write_tec=0]
    [outfile=]"""
    pp = ParmParse(args)
    infile = pp.get_str("infile")
    from ..session import read_stream
    sd = read_stream(args, infile)
    names = sd.names
    lines = sd.lines
    elements = sd.elements
    if len(elements) == 0:
        raise ValueError("streamTubeStats requires element connectivity")
    mid = (lines.shape[1] - 1) // 2
    if pp.contains("jlo"):
        # restrict stations to j in [jlo, -jlo] around the seed
        # (streamTubeStats.cpp:566-567: nPts = -2*jlo + 1)
        jlo = pp.get_int("jlo")
        if jlo > 0:
            jlo = -jlo
        if -jlo < mid:
            lines = lines[:, mid + jlo: mid - jlo + 1]
            mid = (lines.shape[1] - 1) // 2

    def resolve(toks):
        return [names[int(t)] if t.isdigit() else t for t in toks]

    int_names = resolve(pp.query_str_list("intComps", []))
    avg_names = resolve(pp.query_str_list("avgComps", []))
    grad_names = resolve(pp.query_str_list("gradComps", []))
    peak_names = resolve(pp.query_str_list("peakComp", []))
    fcr = pp.query_int("FCRComp", -1)
    pfcr_names = resolve(pp.query_str_list("compsAtPeakFCR", []))
    pfcr_out = pp.query_str_list("namesAtPeakFCR", pfcr_names)
    n_smooth = pp.query_int("nSmooth", 0)

    ci_int = [names.index(n) for n in int_names]
    vol, ints, wa = wedge_volumes_ints(lines, elements, ci_int)
    p = lines[:, mid, :3]
    area = _tri_area(p[elements[:, 0]], p[elements[:, 1]], p[elements[:, 2]])
    ints_n = ints / np.maximum(area[:, None], 1e-300)

    # per-line quantities
    s = arc_length(lines)
    ds = np.maximum(np.diff(s, axis=1), 1e-300)
    per_line = {}
    for n in grad_names:
        c = names.index(n)
        g = np.abs(np.diff(lines[:, :, c], axis=1)) / ds
        per_line[("grad", n)] = g.max(axis=1)
    for n in peak_names:
        c = names.index(n)
        jpk = np.argmax(lines[:, :, c], axis=1)
        per_line[("peak", n)] = lines[np.arange(len(lines)), jpk, c]
        per_line[("peakOK", n)] = ((jpk > 0)
                                   & (jpk < lines.shape[1] - 1)).astype(float)
    if fcr >= 0:
        jf = np.argmax(lines[:, :, fcr], axis=1)
        for n in pfcr_names:
            c = names.index(n)
            per_line[("pfcr", n)] = lines[np.arange(len(lines)), jf, c]

    aux_vals = {}
    if pp.contains("aux_mef") and pp.query_str("aux_mef", "null") != "null":
        aux = read_mef(pp.get_str("aux_mef"))
        for t in pp.get_str_list("aux_mef_comps"):
            n = aux.names[int(t)] if t.isdigit() else t
            aux_vals[n] = aux.field(n)

    out_names = ["volume", "area", "area_wtAvg", "smoothedInt"]
    cols = [vol, area, wa]
    sm = smooth_values(ints_n[:, 0] if ci_int else vol, area, elements,
                       lines.shape[0], n_smooth) if n_smooth > 0 else \
        (ints_n[:, 0] if ci_int else vol)
    cols.append(sm)
    for i, n in enumerate(int_names):
        out_names.append(n + "_int")
        cols.append(ints_n[:, i])
    e3 = elements
    for n in avg_names:
        c = names.index(n)
        out_names.append(n + "_avg")
        cols.append(lines[:, mid, c][e3].mean(axis=1))
    for n in aux_vals:
        out_names.append(n + "_avg")
        cols.append(aux_vals[n][e3].mean(axis=1))
    for n in grad_names:
        out_names.append(n + "_gradMax")
        cols.append(per_line[("grad", n)][e3].mean(axis=1))
    for n in peak_names:
        out_names.append(n + "_peak")
        cols.append(per_line[("peak", n)][e3].mean(axis=1))
    for n in peak_names:
        out_names.append(n + "_peakOK")
        cols.append(per_line[("peakOK", n)][e3].min(axis=1))
    for n, on in zip(pfcr_names, pfcr_out):
        out_names.append(on + "_at_peakFCR")
        cols.append(per_line[("pfcr", n)][e3].mean(axis=1))

    # element-centered MEF: duplicate values at each element's 3 nodes
    ne = len(elements)
    pos = p[elements.reshape(-1)]                       # [3*ne, 3]
    evals = np.stack(cols, axis=1)                       # [ne, ncomp]
    nodes = np.concatenate([pos, np.repeat(evals, 3, axis=0)], axis=1)
    conn = np.arange(3 * ne, dtype=np.int32).reshape(ne, 3)
    mef = MEF("streamTubeStats", ["X", "Y", "Z"] + out_names, nodes, conn)
    outfile = pp.query_str("outfile", infile + "_tubeStats")
    if pp.query_bool("write_mef", True):
        write_mef(outfile + ".mef", mef)
        print(f"wrote {outfile}.mef")
    if pp.query_bool("write_tec", False):
        write_mef_tecplot(outfile + ".dat", mef)
        print(f"wrote {outfile}.dat")
