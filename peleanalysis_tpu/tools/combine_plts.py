"""``combinePlts`` — new plotfile from selected comps of two plotfiles with
identical hierarchies (/root/reference/Src/combinePlts.cpp, 149 LoC).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..amr.hierarchy import AmrState
from ..parmparse import ParmParse


def combine(st1: AmrState, st2: AmrState, comps1, comps2) -> AmrState:
    m1, m2 = st1.meta, st2.meta
    if len(m1.bas) != len(m2.bas) or any(a != b for a, b in
                                         zip(m1.bas, m2.bas)):
        raise ValueError("combinePlts: plotfiles have different hierarchies")
    i1 = [st1.comp(n) for n in comps1]
    i2 = [st2.comp(n) for n in comps2]
    data = []
    for lev in range(m1.n_levels):
        import numpy as np
        data.append(jnp.concatenate(
            [st1.data[lev][:, np.asarray(i1)], st2.data[lev][:, np.asarray(i2)]],
            axis=1))
    return st1.with_data(list(comps1) + list(comps2), data)


def main(args: dict) -> None:
    """CLI: combinePlts infile1= infile2= [comps1=all] [comps2=all] outfile=
    — or the reference surface (combinePlts.cpp:29-37): infiles=<N files>
    vars=<names> [finestLevel=] [is_per=] outfile= (each var taken from the
    FIRST listed file that has it)."""
    pp = ParmParse(args)
    import numpy as np
    if pp.contains("infiles"):
        from ..io.plotfile import PlotfileReader
        files = pp.get_str_list("infiles")
        remaining = list(pp.get_str_list("vars"))
        finest = pp.query_int("finestLevel", None)
        pp.query_int_list("is_per", [1, 1, 1])   # accepted; metadata-only
        sts = []
        for f in files:
            have = [v for v in remaining
                    if v in PlotfileReader(f).var_names]
            if have:
                sts.append(AmrState.from_plotfile(
                    f, names=have, dtype=np.float64, max_level=finest))
                remaining = [v for v in remaining if v not in have]
        if remaining:
            raise ValueError("combinePlts: comps not found: "
                             + " ".join(remaining))
        out = sts[0]
        for st2 in sts[1:]:
            out = combine(out, st2, out.names, st2.names)
        outfile = pp.get_str("outfile")
        out.to_plotfile(outfile)
        print(f"wrote {outfile}")
        return
    f1 = pp.get_str("infile1")
    f2 = pp.get_str("infile2")
    st1 = AmrState.from_plotfile(f1, dtype=np.float64)
    st2 = AmrState.from_plotfile(f2, dtype=np.float64)
    comps1 = pp.query_str_list("comps1", st1.names)
    comps2 = pp.query_str_list("comps2", [n for n in st2.names
                                          if n not in comps1])
    out = combine(st1, st2, comps1, comps2)
    outfile = pp.query_str("outfile", f1 + "_comb")
    out.to_plotfile(outfile)
    print(f"wrote {outfile}")
