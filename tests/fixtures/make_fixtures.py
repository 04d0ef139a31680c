"""Golden byte-layout fixture generator.

Hand-assembles tiny MEF / StreamData / VisMF files following the REFERENCE
writer code paths byte for byte — independent of peleanalysis_tpu's own
writers — so the readers are tested against reference-written layouts:

  MEF:        /root/reference/Src/isosurface.cpp:2122-2130 (label line,
              vars line, "nElts nodesPerElt", FArrayBox::writeOn node FAB
              [node-major per the reference's own parser, mef2vtk.py:40-45],
              raw int32 1-based connectivity)
  StreamData: /root/reference/Src/stream.cpp:2107-2224 (format-1.0 Header,
              ELEMENT_DATA_ASCII Elements with inside_nodes distribution,
              Level_%d/Str VisMF)
  VisMF:      AMReX VisMF::Write header + FAB records (Str_H / Str_D_00000)

Run from the repo root:  python tests/fixtures/make_fixtures.py
"""
import os
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
F64_DESC = "FAB ((8, (64 11 52 0 1 12 0 1023)),(8, (8 7 6 5 4 3 2 1)))"


def box_str(lo, hi):
    t = ",".join("0" for _ in lo)
    return (f"(({','.join(map(str, lo))}) ({','.join(map(str, hi))}) ({t}))")


def make_mef():
    # 4 nodes, 2 triangles; fields X Y Z temp
    nodes = np.array([
        [0.0, 0.0, 0.0, 300.0],
        [1.0, 0.0, 0.0, 400.0],
        [0.0, 1.0, 0.0, 500.0],
        [1.0, 1.0, 0.5, 600.0],
    ])
    elts = np.array([[1, 2, 3], [2, 4, 3]], dtype=np.int32)   # 1-based
    with open(os.path.join(HERE, "golden.mef"), "wb") as f:
        f.write(b"0.0025\n")                       # label = plotfile time
        f.write(b"X Y Z temp\n")
        f.write(b"2 3\n")                          # nElts nodesPerElt
        hdr = F64_DESC + box_str((0, 0, 0), (3, 0, 0)) + " 4\n"
        f.write(hdr.encode("ascii"))
        nodes.astype("<f8").tofile(f)              # node-major
        elts.astype("<i4").tofile(f)


def write_fab_bytes(f, lo, hi, data):
    """FArrayBox::writeOn: header + Fortran-order (x fastest), comp
    outermost.  data: [ncomp, nx, ny, nz] C-indexed."""
    ncomp = data.shape[0]
    hdr = F64_DESC + box_str(lo, hi) + f" {ncomp}\n"
    f.write(hdr.encode("ascii"))
    np.ascontiguousarray(
        np.transpose(data, (0, 3, 2, 1)), dtype="<f8").tofile(f)


def make_stream_data():
    """2 lines x 5 stations (nRKh=2), 4 comps (X,Y,Z,temp), 1 level, 1 box;
    1 line element connecting them; line 0 and 1 seeded in box 0."""
    out = os.path.join(HERE, "golden_stream")
    os.makedirs(os.path.join(out, "Level_0"), exist_ok=True)
    names = ["X", "Y", "Z", "temp"]
    with open(os.path.join(out, "Header"), "w") as f:
        f.write("Oddball-multilevel-connected-data-format-1.0\n")
        f.write("1\n")                             # levels
        f.write(f"{len(names)}\n")
        for n in names:
            f.write(n + "\n")
        f.write("Elements\n")
        f.write("ELEMENT_DATA_ASCII\n")
        f.write("0 0 0 \n")                        # probLo
        f.write("1 1 1 \n")                        # probHi
        f.write(box_str((0, 0, 0), (15, 15, 15)) + "\n")   # probDomain lev 0
        f.write("(1 0\n" + box_str((0, 0, 0), (15, 15, 15)) + "\n)\n")
    with open(os.path.join(out, "Elements"), "w") as f:
        f.write("1\n2\n")                          # nElts nodesPerElt
        f.write("1 2 \n")                          # 1-based element nodes
        # inside_nodes: level 0 has 1 non-empty box: box 0 owns lines 1,2
        f.write("1\n")
        f.write("0 2 1 2\n")
    # Level_0/Str: one FAB, Box (0:1, -2:2, 0), 4 comps
    nl, npts = 2, 5
    data = np.zeros((4, nl, npts, 1))
    for l in range(nl):
        for j in range(npts):
            s = (j - 2) * 0.01
            data[0, l, j, 0] = 0.25 + 0.5 * l + s    # X
            data[1, l, j, 0] = 0.5
            data[2, l, j, 0] = 0.5 + s
            data[3, l, j, 0] = 1000.0 + 100 * l + j  # temp
    with open(os.path.join(out, "Level_0", "Str_D_00000"), "wb") as f:
        write_fab_bytes(f, (0, -2, 0), (1, 2, 0), data)
    with open(os.path.join(out, "Level_0", "Str_H"), "w") as f:
        f.write("1\n1\n4\n0\n")
        f.write("(1 0\n" + box_str((0, -2, 0), (1, 2, 0)) + "\n)\n")
        f.write("1\n")
        f.write("FabOnDisk: Str_D_00000 0\n")
        f.write("\n1,4\n")
        f.write(",".join(f"{data[c].min():.17g}" for c in range(4)) + ",\n")
        f.write("\n1,4\n")
        f.write(",".join(f"{data[c].max():.17g}" for c in range(4)) + ",\n")


if __name__ == "__main__":
    make_mef()
    make_stream_data()
    print("fixtures written to", HERE)
