"""``stream2plt`` — gather selected streamlines into a single FAB
(/root/reference/Src/stream2plt.cpp, 752 LoC).

Selects comps, downsamples to nLines, applies per-line filters —
cylindrical radius RXY with sign, per-comp Max/Min/at-value predicates
with sign strings (stream2plt.cpp:371-481) — appends the auxiliary
``distance_from_<comp>_eq_<val>`` component when distComp/distVal are
given (arclength from the line start, shifted to zero at the first
crossing of the selected comp through distVal; 2x-total-length marker
on lines with no crossing — stream2plt.cpp:654-713; r5 review fix: this
was wrongly implemented as a keep-filter), and writes the surviving
lines as one FAB on Box (0:nKeep-1, slo:shi, 0)
(stream2plt.cpp:498-560).
"""
from __future__ import annotations

import numpy as np

from ..amr.box import Box
from ..io.fab import write_fab
from ..io.stream_data import read_stream_data
from ..parmparse import ParmParse


def _cmp(vals: np.ndarray, val: float, sgn: str) -> np.ndarray:
    if sgn in ("+", "gt", ">"):
        return vals > val
    if sgn in ("-", "lt", "<"):
        return vals < val
    raise ValueError(f"bad sign string {sgn!r}")


def select_lines(lines: np.ndarray, names, pp: ParmParse,
                 sel_ci=None) -> np.ndarray:
    """Boolean keep-mask over lines applying the stream2plt filters.
    Integer comp tokens index the SELECTED comp list when ``sel_ci`` is
    given (the reference's maxComps etc. index into comps[],
    stream2plt.cpp:464-471); name tokens index the raw variable list."""
    nl, npts, _ = lines.shape
    keep = np.ones(nl, dtype=bool)
    if pp.query_bool("no_filter", False):
        return keep
    mid = (npts - 1) // 2

    def cidx(tok):
        if tok.lstrip("-").isdigit():
            i = int(tok)
            return sel_ci[i] if sel_ci is not None else i
        return names.index(tok)

    rxy = pp.query_float("RXY", -1.0)
    if rxy > 0:
        sgn = pp.query_str("RXYsgn", "+")
        r = np.sqrt(lines[:, mid, 0] ** 2 + lines[:, mid, 1] ** 2)
        keep &= _cmp(r, rxy, sgn)
    if pp.contains("maxComps"):
        comps = [cidx(t) for t in pp.get_str_list("maxComps")]
        vals = pp.get_float_list("maxVals")
        sgns = pp.get_str_list("maxSgns")
        for c, v, s in zip(comps, vals, sgns):
            keep &= _cmp(lines[:, :, c].max(axis=1), v, s)
    if pp.contains("minComps"):
        comps = [cidx(t) for t in pp.get_str_list("minComps")]
        vals = pp.get_float_list("minVals")
        sgns = pp.get_str_list("minSgns")
        for c, v, s in zip(comps, vals, sgns):
            keep &= _cmp(lines[:, :, c].min(axis=1), v, s)
    if pp.contains("atComps"):
        from ..stream.surface import _crossings_from_mid, _interp_at
        comp_at = [cidx(t) for t in pp.get_str_list("compAt")]
        at_comps = [cidx(t) for t in pp.get_str_list("atComps")]
        val_at = pp.get_float_list("valAt")
        at_val = pp.get_float_list("atVal")
        at_sgns = pp.get_str_list("atSgns")
        for ca, cc, va, vv, s in zip(comp_at, at_comps, val_at, at_val,
                                     at_sgns):
            jlo, frac, found = _crossings_from_mid(lines[:, :, ca], va)
            sampled = _interp_at(lines, jlo, frac)[:, cc]
            keep &= found & _cmp(sampled, vv, s)
    return keep


def main(args: dict) -> None:
    """CLI: stream2plt infile=<StreamData> outfile= [comps=|sComp= nComp=]
    [nLines=0(all)] [filters...] """
    pp = ParmParse(args)
    infile = pp.get_str("infile")
    outfile = pp.get_str("outfile")
    from ..session import read_stream
    sd = read_stream(args, infile)
    if pp.contains("comps"):
        names = [sd.names[int(c)] if c.isdigit() else c
                 for c in pp.get_str_list("comps")]
    else:
        s = pp.query_int("sComp", 0)
        n = pp.query_int("nComp", len(sd.names))
        names = sd.names[s : s + n]
    ci = [sd.names.index(n) for n in names]
    lines = sd.lines
    if pp.contains("finestLevel"):
        # keep only lines owned by levels <= finestLevel
        # (stream2plt.cpp:343: levels beyond finest are not read)
        fin = pp.get_int("finestLevel")
        ids = [i - 1 for lev in range(min(fin + 1, sd.n_levels))
               for per_box in sd.inside_nodes[lev] for i in per_box]
        sel = np.zeros(lines.shape[0], bool)
        sel[np.asarray(sorted(ids), np.int64)] = True
        lines = lines[sel]
        print(f"stream2plt: finestLevel={fin} keeps {sel.sum()} of "
              f"{len(sel)} lines")
    n_lines = pp.query_int("nLines", 0)
    if n_lines and n_lines < lines.shape[0]:
        stride = lines.shape[0] // n_lines
        lines = lines[::stride][:n_lines]  # downsampleStreamData analog
    keep = select_lines(lines, sd.names, pp, sel_ci=ci)
    out = lines[keep][:, :, ci]
    if out.shape[0] == 0:
        raise ValueError("stream2plt: no lines survive the filters "
                         "(check finestLevel=/predicates)")
    out_names = list(names)
    dcomp = pp.query_int("distComp", -1)
    if dcomp >= 0:
        # auxiliary distance component (stream2plt.cpp:654-713): arclength
        # from the line start, shifted to zero at the first strict crossing
        # of selected comp dcomp through distVal; lines with no crossing get
        # a constant 2x-total-length "off the line" marker
        dval = pp.get_float("distVal")
        if dcomp >= len(out_names) or len(out_names) <= 3:
            raise ValueError(
                f"distComp={dcomp} must index the selected comps (have "
                f"{len(out_names)}, first three must be X,Y,Z)")
        seg = np.sqrt(((out[:, 1:, :3] - out[:, :-1, :3]) ** 2).sum(-1))
        dist = np.concatenate(
            [np.zeros((out.shape[0], 1)), np.cumsum(seg, axis=1)], axis=1)
        v = out[:, :, dcomp]
        vlo, vhi = v[:, :-1], v[:, 1:]
        cross = ((vlo > dval) & (vhi < dval)) | ((vlo < dval) & (vhi > dval))
        found = cross.any(axis=1)
        j = np.argmax(cross, axis=1)
        r = np.arange(out.shape[0])
        denom = np.where(vhi[r, j] != vlo[r, j], vhi[r, j] - vlo[r, j], 1.0)
        alpha = (dval - vlo[r, j]) / denom
        off = dist[r, j] + alpha * (dist[r, j + 1] - dist[r, j])
        d = dist - np.where(found, off, 0.0)[:, None]
        d[~found] = 2.0 * dist[~found, -1:]
        out = np.concatenate([out, d[:, :, None]], axis=2)
        out_names.append(f"distance_from_{out_names[dcomp]}_eq_{dval:g}")
        print(f"stream2plt: appended {out_names[-1]}")
    n_half = (out.shape[1] - 1) // 2
    box = Box((0, -n_half, 0), (max(out.shape[0] - 1, 0), n_half, 0))
    with open(outfile, "wb") as f:
        write_fab(f, box, np.transpose(out, (2, 0, 1))[..., None])
    print(f"wrote {outfile} ({out.shape[0]} lines kept of {lines.shape[0]})")
