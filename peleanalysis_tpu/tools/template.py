"""``template`` — canonical skeleton for a new analysis tool
(/root/reference/Src/template.cpp, 127 LoC: open plotfile, loop levels,
write plotfile).  Copy this file to start a new tool.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..amr.hierarchy import AmrState
from ..parmparse import ParmParse


def main(args: dict) -> None:
    """CLI: template infile= [outfile=] [vars=all]"""
    pp = ParmParse(args)
    infile = pp.get_str("infile")
    import numpy as np
    st = AmrState.from_plotfile(infile, dtype=np.float64)
    names = pp.query_str_list("vars", st.names)
    comps = [st.comp(n) for n in names]
    # --- per-level computation goes here (identity by default) -------------
    import numpy as np
    out_data = [d[:, np.asarray(comps)] for d in st.data]
    # ------------------------------------------------------------------------
    out = st.with_data(names, out_data)
    outfile = pp.query_str("outfile", infile + "_new")
    out.to_plotfile(outfile)
    print(f"wrote {outfile}")
