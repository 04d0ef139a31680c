#!/usr/bin/env python
"""Quick-look renderer for Tecplot DAT / MEF surfaces: writes a PPM preview
(reference: Src/PythonScripts/datToView.py, which opens a vtk window — this
headless version rasterizes an orthographic projection instead).
Usage: datToView.py infile [out.ppm] [comp]"""
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
from peleanalysis_tpu.io.mef import read_mef, read_mef_tecplot  # noqa: E402

src = sys.argv[1]
mef = read_mef_tecplot(src) if src.endswith(".dat") else read_mef(src)
out = sys.argv[2] if len(sys.argv) > 2 else src.rsplit(".", 1)[0] + ".ppm"
comp = sys.argv[3] if len(sys.argv) > 3 else (
    mef.names[mef.ndim] if len(mef.names) > mef.ndim else mef.names[2])
pos = mef.positions()
val = mef.field(comp)
n = 512
lo = pos[:, :2].min(axis=0)
hi = pos[:, :2].max(axis=0)
span = np.maximum(hi - lo, 1e-12)
ij = ((pos[:, :2] - lo) / span * (n - 1)).astype(int)
img = np.zeros((n, n))
cnt = np.zeros((n, n))
np.add.at(img, (ij[:, 1], ij[:, 0]), val)
np.add.at(cnt, (ij[:, 1], ij[:, 0]), 1)
img = np.where(cnt > 0, img / np.maximum(cnt, 1), np.nan)
v = np.nan_to_num(img, nan=np.nanmin(img))
x = (v - v.min()) / max(v.max() - v.min(), 1e-300)
rgb = (np.stack([x, x, x], -1) * 255).astype(np.uint8)[::-1]
with open(out, "wb") as f:
    f.write(f"P6\n{n} {n}\n255\n".encode())
    rgb.tofile(f)
print(f"wrote {out}")
