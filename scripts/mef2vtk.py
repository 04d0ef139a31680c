#!/usr/bin/env python
"""MEF -> legacy VTK converter (reference: Src/PythonScripts/mef2vtk.py,
which needs meshio; this one is dependency-free).
Usage: mef2vtk.py surface.mef [out.vtk]"""
import sys

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
from peleanalysis_tpu.io.mef import read_mef            # noqa: E402
from peleanalysis_tpu.io.vtk import write_vtk_legacy    # noqa: E402

src = sys.argv[1]
dst = sys.argv[2] if len(sys.argv) > 2 else src.replace(".mef", "") + ".vtk"
write_vtk_legacy(dst, read_mef(src))
print(f"wrote {dst}")
