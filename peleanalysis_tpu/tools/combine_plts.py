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

    from ..session import get_session, load_state, stage_write_plotfile
    sess = get_session(args)

    def _vars_of(f):
        # in-session outputs of earlier pipeline stages shadow the path
        if sess is not None and f in sess.plotfiles:
            return sess.plotfiles[f].names
        from ..io.plotfile import PlotfileReader
        return PlotfileReader(f).var_names

    if pp.contains("infiles"):
        files = pp.get_str_list("infiles")
        remaining = list(pp.get_str_list("vars"))
        finest = pp.query_int("finestLevel", None)
        pp.query_int_list("is_per", [1, 1, 1])   # accepted; metadata-only
        sts = []
        for f in files:
            have = [v for v in remaining if v in _vars_of(f)]
            if have:
                # a session-registered state may carry MORE comps than
                # requested: keep the selected list alongside
                sts.append((load_state(args, f, names=have,
                                       dtype=np.float64, widen_ok=True,
                                       max_level=finest), have))
                remaining = [v for v in remaining if v not in have]
        if remaining:
            raise ValueError("combinePlts: comps not found: "
                             + " ".join(remaining))
        out, sel0 = sts[0]
        if list(out.names) != list(sel0):       # crop to the selection
            idx = np.asarray([out.comp(n) for n in sel0])
            out = out.with_data(list(sel0), [d[:, idx] for d in out.data])
        for st2, sel2 in sts[1:]:
            out = combine(out, st2, out.names, sel2)
        outfile = pp.get_str("outfile")
    else:
        f1 = pp.get_str("infile1")
        f2 = pp.get_str("infile2")
        st1 = load_state(args, f1, dtype=np.float64, widen_ok=True)
        st2 = load_state(args, f2, dtype=np.float64, widen_ok=True)
        comps1 = pp.query_str_list("comps1", st1.names)
        comps2 = pp.query_str_list("comps2", [n for n in st2.names
                                              if n not in comps1])
        out = combine(st1, st2, comps1, comps2)
        outfile = pp.query_str("outfile", f1 + "_comb")
    if sess is not None:
        sess.put_plotfile(outfile, out)
    if stage_write_plotfile(args, out, outfile):
        print(f"wrote {outfile}")
