#!/usr/bin/env python
"""Tecplot DAT / MEF -> XML VTP converter (reference: Src/PythonScripts/datToVTP.py).
Usage: datToVTP.py infile [outfile]"""
import sys

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
from peleanalysis_tpu.io.mef import read_mef, read_mef_tecplot  # noqa: E402
from peleanalysis_tpu.io.vtk import write_vtp                          # noqa: E402

src = sys.argv[1]
mef = read_mef_tecplot(src) if src.endswith(".dat") else read_mef(src)
dst = (sys.argv[2] if len(sys.argv) > 2
       else src.rsplit(".", 1)[0] + ".vtp")
write_vtp(dst, mef)
print(f"wrote {dst}")
