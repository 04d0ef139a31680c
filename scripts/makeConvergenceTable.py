#!/usr/bin/env python
"""Convergence-order table from a grid-refinement study.

Analog of the reference's Turbulence_analysis/makeConvergenceTable.py
(/root/reference/Src/PythonScripts/Turbulence_analysis/makeConvergenceTable.py):
given errors at successive resolutions, print L1/Linf orders
``p = log(e_prev/e) / log(N/N_prev)`` as LaTeX (default) or ASCII.

Study file format (one row per resolution, '#' comments allowed):
    N  L1_error  Linf_error

Usage: makeConvergenceTable.py study.txt [--ascii]
"""
import signal
import sys
from math import log

signal.signal(signal.SIGPIPE, signal.SIG_DFL)


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 1
    ascii_out = "--ascii" in argv
    rows = []
    with open(argv[1]) as f:
        for line in f:
            line = line.split("#")[0].strip()
            if not line:
                continue
            n, e1, einf = line.split()[:3]
            rows.append((float(n), float(e1), float(einf)))
    if len(rows) < 2:
        print("need at least two resolutions")
        return 1

    header = ["N", "L1 error", "L1 order", "Linf error", "Linf order"]
    table = []
    prev = None
    for n, e1, einf in rows:
        if prev is None:
            o1 = oinf = ""
        else:
            pn, pe1, peinf = prev
            r = log(n / pn)
            o1 = f"{log(pe1 / e1) / r:.2f}" if e1 > 0 and pe1 > 0 else "-"
            oinf = (f"{log(peinf / einf) / r:.2f}"
                    if einf > 0 and peinf > 0 else "-")
        table.append([f"{int(n)}", f"{e1:.3e}", o1, f"{einf:.3e}", oinf])
        prev = (n, e1, einf)

    if ascii_out:
        widths = [max(len(h), *(len(r[i]) for r in table))
                  for i, h in enumerate(header)]
        print("  ".join(h.ljust(w) for h, w in zip(header, widths)))
        for r in table:
            print("  ".join(c.ljust(w) for c, w in zip(r, widths)))
    else:
        print(" & ".join([r"\( N \)", r"\( L_1 \) Error", r"\( L_1 \) Order",
                          r"\( L_\infty \) Error", r"\( L_\infty \) Order"])
              + r" \\\hline\hline")
        for r in table:
            print(" & ".join(c if c else "--" for c in r) + r" \\")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
