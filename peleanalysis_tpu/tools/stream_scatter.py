"""``streamScatter`` — scatter data from streamline peak points
(/root/reference/Src/streamScatter.cpp, 460 LoC): per line, find the point
of peak condComp/condVar scanning from the line midpoint
(streamScatter.cpp:120-143); if the peak lies in
[condValMoreThan, condValLessThan), print the selected vars at that point
(streamScatter.cpp:145-155).
"""
from __future__ import annotations

import numpy as np

from ..io.stream_data import read_stream_data
from ..parmparse import ParmParse


def scatter_rows(lines: np.ndarray, names, var_names, cond_name: str,
                 lo: float, hi: float):
    cc = names.index(cond_name)
    vi = [names.index(v) for v in var_names]
    jpk = np.argmax(lines[:, :, cc], axis=1)
    nl = lines.shape[0]
    pk = lines[np.arange(nl), jpk, cc]
    keep = (pk >= lo) & (pk < hi)
    return lines[np.arange(nl)[keep], jpk[keep]][:, vi], keep


def main(args: dict) -> None:
    """CLI: streamScatter infile=<StreamData> vars=... [condComp=i|condVar=n]
    condValMoreThan= condValLessThan= [outfileBase=]"""
    pp = ParmParse(args)
    infile = pp.get_str("infile")
    from ..session import read_stream
    sd = read_stream(args, infile)
    var_names = [sd.names[int(v)] if v.isdigit() else v
                 for v in pp.get_str_list("vars")]
    if pp.contains("condVar") and pp.get_str("condVar"):
        cond = pp.get_str("condVar")
    else:
        cond = sd.names[pp.query_int("condComp", 0)]
    lo = pp.query_float("condValMoreThan", -np.inf)
    hi = pp.query_float("condValLessThan", np.inf)
    rows, keep = scatter_rows(sd.lines, sd.names, var_names, cond, lo, hi)
    base = pp.query_str("outfileBase", infile + "_scatter")
    out = base + ".dat"
    with open(out, "w") as f:
        f.write("# " + " ".join(var_names) + "\n")
        np.savetxt(f, rows, fmt="%.9g")
    print(f"wrote {out} ({keep.sum()} of {len(keep)} lines)")
