"""``streamSub`` — extract streamline subsets by element ids and comps
(/root/reference/Src/streamSub.cpp, 534 LoC; Docs/source/streamSub.rst).
Connectivity is dropped in the output (streamSub.cpp:86-126).
"""
from __future__ import annotations

import numpy as np

from ..io.stream_data import StreamData, write_stream_data
from ..parmparse import ParmParse


def main(args: dict) -> None:
    """CLI: streamSub infile=<StreamData> [outfile=<infile>_new]
    [eltIDs=... | sElt= nElt=] [comps=...]"""
    pp = ParmParse(args)
    infile = pp.get_str("infile")
    outfile = pp.query_str("outfile", infile + "_new")
    from ..session import read_stream
    sd = read_stream(args, infile)

    if pp.contains("eltIDs"):
        elt_ids = np.array(pp.get_int_list("eltIDs"))
    else:
        s = pp.query_int("sElt", 0)
        n = pp.query_int("nElt", len(sd.elements))
        elt_ids = np.arange(s, min(s + n, len(sd.elements)))
    if pp.contains("comps"):
        names = [sd.names[int(c)] if c.isdigit() else c
                 for c in pp.get_str_list("comps")]
        # coordinates always lead, in X,Y,Z order (r5 review fix: a
        # prepend-in-order loop produced [Z,Y,X,...] — every StreamData
        # consumer treats comps 0-2 as X,Y,Z)
        names = [c for c in ("X", "Y", "Z") if c not in names] + names
    else:
        names = list(sd.names)
    ci = [sd.names.index(n) for n in names]

    used = np.unique(sd.elements[elt_ids].ravel())
    lines = sd.lines[used][:, :, ci]
    # all kept lines in one level-0 box: connectivity (and with it the
    # original level ownership) is dropped per reference semantics
    # (streamSub.cpp:86-126)
    inside = [[np.arange(1, len(used) + 1, dtype=np.int64)]]
    out = StreamData(names, np.zeros((0, 3), np.int32), inside, lines)
    write_stream_data(outfile, out)
    print(f"wrote {outfile} ({len(used)} lines from {len(elt_ids)} elements)")
