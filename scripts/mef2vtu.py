#!/usr/bin/env python
"""MEF -> XML VTU converter (reference: Src/PythonScripts/mef2vtu.py).
Usage: mef2vtu.py infile [outfile]"""
import sys

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
from peleanalysis_tpu.io.mef import read_mef, read_mef_tecplot  # noqa: E402
from peleanalysis_tpu.io.vtk import write_vtu                          # noqa: E402

src = sys.argv[1]
mef = read_mef_tecplot(src) if src.endswith(".dat") else read_mef(src)
dst = (sys.argv[2] if len(sys.argv) > 2
       else src.rsplit(".", 1)[0] + ".vtu")
write_vtu(dst, mef)
print(f"wrote {dst}")
