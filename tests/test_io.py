import numpy as np
import pytest

from peleanalysis_tpu.amr.box import Box, BoxArray, decompose, parse_box
from peleanalysis_tpu.io.mef import MEF, read_mef, write_mef, read_mef_tecplot, write_mef_tecplot
from peleanalysis_tpu.io.plotfile import PlotfileReader, write_plotfile


def test_box_basics():
    b = Box((0, 0, 0), (15, 7, 31))
    assert b.shape == (16, 8, 32)
    assert b.size == 16 * 8 * 32
    assert b.grow(2).shape == (20, 12, 36)
    assert b.refine(2).shape == (32, 16, 64)
    assert b.refine(2).coarsen(2) == b
    assert parse_box(repr(b)) == b
    neg = Box((-4, -4, -4), (3, 3, 3))
    assert neg.coarsen(2) == Box((-2, -2, -2), (1, 1, 1))


def test_decompose_covers():
    dom = Box((0, 0, 0), (31, 31, 47))
    ba = decompose(dom, 16)
    assert ba.total_cells() == dom.size
    assert all(max(b.shape) <= 16 for b in ba)
    assert ba.minimal_box() == dom


def test_plotfile_roundtrip(synthetic_plotfile):
    sp = synthetic_plotfile
    r = PlotfileReader(sp["path"])
    assert r.var_names == sp["names"]
    assert r.meta.finest_level == 2
    assert r.meta.ref_ratio == [2, 2]
    for lev in range(3):
        ba = r.box_array(lev)
        assert ba == sp["bas"][lev]
        got = r.read_level(lev)
        for g, want in zip(got, sp["data"][lev]):
            np.testing.assert_array_equal(g, want)


def test_plotfile_component_subset(synthetic_plotfile):
    sp = synthetic_plotfile
    r = PlotfileReader(sp["path"])
    i_t = r.var_index("temp")
    got = r.read_box(1, 0, comps=[i_t])
    np.testing.assert_array_equal(got[0], sp["data"][1][0][i_t])


def test_mef_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n, ne = 57, 90
    nodes = rng.normal(size=(n, 5))
    elems = rng.integers(0, n, size=(ne, 3)).astype(np.int32)
    mef = MEF("0.123", ["X", "Y", "Z", "temp", "c"], nodes, elems)
    p = str(tmp_path / "s.mef")
    write_mef(p, mef)
    back = read_mef(p)
    assert back.names == mef.names
    assert back.label == "0.123"
    np.testing.assert_array_equal(back.elements, elems)
    np.testing.assert_allclose(back.nodes, nodes)
    assert back.ndim == 3


def test_mef_tecplot_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    nodes = rng.normal(size=(12, 4))
    elems = rng.integers(0, 12, size=(9, 3)).astype(np.int32)
    mef = MEF("surf", ["X", "Y", "Z", "v"], nodes, elems)
    p = str(tmp_path / "s.dat")
    write_mef_tecplot(p, mef)
    back = read_mef_tecplot(p)
    assert back.names == mef.names
    np.testing.assert_array_equal(back.elements, elems)
    np.testing.assert_allclose(back.nodes, nodes, rtol=1e-10)


def test_mef_validate():
    nodes = np.zeros((4, 3))
    bad = MEF("x", ["X", "Y", "Z"], nodes, np.array([[0, 1, 7]], dtype=np.int32))
    with pytest.raises(ValueError):
        bad.validate()


def test_triangle_area():
    nodes = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    mef = MEF("t", ["X", "Y", "Z"], nodes, np.array([[0, 1, 2]], dtype=np.int32))
    assert abs(mef.total_area() - 0.5) < 1e-14


def test_vtk_writers(tmp_path):
    from peleanalysis_tpu.io.vtk import write_vtk_legacy, write_vtp, write_vtu
    rng = np.random.default_rng(2)
    nodes = rng.normal(size=(9, 4))
    elems = rng.integers(0, 9, size=(5, 3)).astype(np.int32)
    mef = MEF("t", ["X", "Y", "Z", "v"], nodes, elems)
    write_vtk_legacy(str(tmp_path / "a.vtk"), mef)
    txt = open(tmp_path / "a.vtk").read()
    assert "POINTS 9 double" in txt and "POLYGONS 5" in txt
    write_vtu(str(tmp_path / "a.vtu"), mef)
    assert "UnstructuredGrid" in open(tmp_path / "a.vtu").read()
    write_vtp(str(tmp_path / "a.vtp"), mef)
    assert "PolyData" in open(tmp_path / "a.vtp").read()


def test_xdmf_writer(tmp_path):
    from peleanalysis_tpu.io.xdmf import write_xdmf
    rng = np.random.default_rng(3)
    nodes = rng.normal(size=(7, 5))
    elems = rng.integers(0, 7, size=(4, 3)).astype(np.int32)
    mef = MEF("t", ["X", "Y", "Z", "temp", "c"], nodes, elems)
    base = str(tmp_path / "surf")
    write_xdmf(base, mef, "temp", 1000.0, 0.5)
    xmf = open(base + ".xmf").read()
    assert 'TopologyType="Triangle"' in xmf and 'Name="temp"' in xmf
    blob = open(base + ".mesh", "rb").read()
    assert len(blob) == 4 * 12 + 8 * 21 + 8 * 14


def test_xdmf_writer_3d_segments(tmp_path):
    # r5 review fix: a 3-D MEF with 2-node elements (assembled lines) must
    # size the connectivity block by nodes_per_elt, not assume triangles —
    # and declare a Polyline topology
    from peleanalysis_tpu.io.xdmf import write_xdmf
    rng = np.random.default_rng(4)
    nodes = rng.normal(size=(6, 4))
    segs = np.array([[0, 1], [1, 2], [3, 4]], dtype=np.int32)
    mef = MEF("l", ["X", "Y", "Z", "v"], nodes, segs)
    base = str(tmp_path / "lines")
    write_xdmf(base, mef)
    xmf = open(base + ".xmf").read()
    assert 'TopologyType="Polyline"' in xmf
    blob = open(base + ".mesh", "rb").read()
    assert len(blob) == 4 * 6 + 8 * 18 + 8 * 6
    # geometry seek points at the coordinates, not 4*n_elts past them
    assert f'Seek="{4 * 6}"' in xmf


def test_mef_tecplot_zone_title_with_equals_and_spaces(tmp_path):
    # r5 review fix: dict(kv.split('=')) crashed on T="t=0.00125" and
    # truncated titles with spaces
    from peleanalysis_tpu.io.mef import read_mef_tecplot, write_mef_tecplot
    rng = np.random.default_rng(5)
    nodes = rng.normal(size=(5, 4))
    elems = np.array([[0, 1, 2], [2, 3, 4]], dtype=np.int32)
    mef = MEF("t", ["X", "Y", "Z", "v"], nodes, elems)
    p = str(tmp_path / "z.dat")
    write_mef_tecplot(p, mef)
    txt = open(p).read().splitlines()
    txt[1] = 'ZONE T="iso t=0.00125 surface", N=5, E=2, ' \
             'F=FEPOINT ET=TRIANGLE'
    open(p, "w").write("\n".join(txt) + "\n")
    back = read_mef_tecplot(p)
    assert back.label == "iso t=0.00125 surface"
    assert back.n_nodes == 5 and back.n_elts == 2
    np.testing.assert_allclose(back.nodes, mef.nodes, rtol=1e-9)


def test_converter_scripts(tmp_path):
    """Smoke-test the scripts/ converters (reference PythonScripts parity)."""
    import subprocess
    import sys
    from peleanalysis_tpu.io.mef import write_mef
    rng = np.random.default_rng(4)
    nodes = rng.normal(size=(10, 4))
    elems = rng.integers(0, 10, size=(6, 3)).astype(np.int32)
    mef = MEF("s", ["X", "Y", "Z", "v"], nodes, elems)
    src = str(tmp_path / "s.mef")
    write_mef(src, mef)
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for script, out in (("mef2vtk.py", "s.vtk"), ("mef2vtu.py", "s.vtu"),
                        ("datToVTP.py", "s.vtp"), ("datToView.py", "s.ppm")):
        r = subprocess.run(
            [sys.executable, os.path.join(root, "scripts", script), src,
             str(tmp_path / out)], capture_output=True, text=True, env=env)
        assert r.returncode == 0, (script, r.stderr[-500:])
        assert (tmp_path / out).exists()


def test_native_fab_loader_parity(tmp_path):
    """native/vismf_io.cpp parallel loader returns bit-identical arrays to
    the pure-python per-box reader, including out-of-order comp selection."""
    from peleanalysis_tpu.io.plotfile import PlotfileReader
    from peleanalysis_tpu.testing import write_synthetic_plotfile

    path = str(tmp_path / "plt")
    write_synthetic_plotfile(path, n_cell=32, n_levels=2, max_grid_size=16,
                             fields={"a": lambda x, y, z: x + 2 * y,
                                     "b": lambda x, y, z: np.sin(5 * z),
                                     "c": lambda x, y, z: x * y * z})
    r = PlotfileReader(path)
    pytest.importorskip("ctypes")
    try:
        from peleanalysis_tpu.native import load_fabs  # noqa: F401 (build)
    except Exception:
        pytest.skip("native toolchain unavailable")
    for lev in range(2):
        nat = r.read_level(lev)
        ref = [r.read_box(lev, i)
               for i in range(len(r._index(lev)["boxes"]))]
        for a, b in zip(nat, ref):
            np.testing.assert_array_equal(a, b)
    nat = r.read_level(0, [2, 0])
    ref = [r.read_box(0, i, [2, 0])
           for i in range(len(r._index(0)["boxes"]))]
    for a, b in zip(nat, ref):
        np.testing.assert_array_equal(a, b)


def test_native_fab_loader_2d(tmp_path):
    """2-tuple (DIM=2) box shapes must not corrupt the native loader ABI
    (regression: dims array was [nbox,2] while C++ read 3 ints per job)."""
    from peleanalysis_tpu.io.plotfile import PlotfileReader
    from peleanalysis_tpu.testing import write_synthetic_plotfile

    path = str(tmp_path / "plt2")
    write_synthetic_plotfile(path, n_cell=32, n_levels=2, ndim=2,
                             fields={"a": lambda x, y: x - 3 * y})
    r = PlotfileReader(path)
    for lev in range(2):
        nat = r.read_level(lev)
        ref = [r.read_box(lev, i)
               for i in range(len(r._index(lev)["boxes"]))]
        for a, b in zip(nat, ref):
            np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# Golden byte-layout fixtures: files hand-assembled following the REFERENCE
# writer code paths (tests/fixtures/make_fixtures.py) — the readers must
# parse reference-written layouts exactly, not just round-trip our writers.
# ---------------------------------------------------------------------------

def _fixture(name):
    import os
    return os.path.join(os.path.dirname(__file__), "fixtures", name)


def test_golden_mef_fixture():
    """isosurface.cpp:2122-2130 MEF layout parses bit-exactly."""
    from peleanalysis_tpu.io.mef import read_mef
    m = read_mef(_fixture("golden.mef"))
    assert m.label.strip() == "0.0025"
    assert m.names == ["X", "Y", "Z", "temp"]
    assert m.n_nodes == 4 and m.n_elts == 2
    np.testing.assert_array_equal(
        m.nodes, np.array([[0, 0, 0, 300], [1, 0, 0, 400],
                           [0, 1, 0, 500], [1, 1, .5, 600.]]))
    # connectivity 0-based in memory, 1-based on disk
    np.testing.assert_array_equal(m.elements, [[0, 1, 2], [1, 3, 2]])


def test_golden_stream_data_fixture():
    """stream.cpp:2107-2224 StreamData-1.0 (Header + ELEMENT_DATA_ASCII
    Elements + Level_0/Str VisMF) parses exactly, including the j=-2..2
    station layout and inside_nodes distribution."""
    from peleanalysis_tpu.io.stream_data import read_stream_data
    sd = read_stream_data(_fixture("golden_stream"))
    assert sd.names == ["X", "Y", "Z", "temp"]
    lines = np.asarray(sd.lines)
    assert lines.shape == (2, 5, 4)
    # X of line l station j: 0.25 + 0.5 l + 0.01 (j-2)
    for l in range(2):
        np.testing.assert_allclose(
            lines[l, :, 0], 0.25 + 0.5 * l + 0.01 * (np.arange(5) - 2))
        np.testing.assert_allclose(lines[l, :, 3],
                                   1000.0 + 100 * l + np.arange(5))
    np.testing.assert_array_equal(np.asarray(sd.elements), [[0, 1]])
    assert np.array_equal(np.asarray(sd.inside_nodes[0][0]), [1, 2])


def test_golden_vismf_fab_header():
    """The raw FAB record inside the VisMF (AMReX FArrayBox::writeOn) reads
    back with the right box/ncomp/dtype and Fortran data order."""
    from peleanalysis_tpu.io.fab import read_fab
    with open(_fixture("golden_stream/Level_0/Str_D_00000"), "rb") as f:
        box, data = read_fab(f)
    assert box.lo == (0, -2, 0) and box.hi == (1, 2, 0)
    assert data.shape == (4, 2, 5, 1)
    np.testing.assert_allclose(data[3, 1, :, 0], 1100.0 + np.arange(5))


def test_big_endian_fab(tmp_path):
    """Generic RealDescriptor parsing (the AMReX FPC 'normal order'
    big-endian descriptor a plotfile from an old big-endian system carries):
    ascending byte-order list => '>f8'/'>f4', payload byteswapped on read."""
    from peleanalysis_tpu.io.fab import read_fab
    d = np.arange(24, dtype=">f8").reshape(2, 3, 2, 2)  # [comp,x,y,z]
    hdr = (b"FAB ((8, (64 11 52 0 1 12 0 1023)),(8, (1 2 3 4 5 6 7 8)))"
           b"((0,0,0) (2,1,1) (0,0,0)) 2\n")
    p = tmp_path / "be.fab"
    with open(p, "wb") as f:
        f.write(hdr)
        # disk layout: comp outermost then z,y,x (x fastest)
        np.ascontiguousarray(np.transpose(d, (0, 3, 2, 1))).tofile(f)
    with open(p, "rb") as f:
        box, back = read_fab(f)
    assert box.shape == (3, 2, 2) and back.dtype.byteorder in ("=", "<", "|")
    np.testing.assert_array_equal(back, d.astype(np.float64))
    # f32 variant
    hdr32 = (b"FAB ((4, (32 8 23 0 1 9 0 127)),(4, (1 2 3 4)))"
             b"((0,0,0) (1,0,0) (0,0,0)) 1\n")
    with open(tmp_path / "be32.fab", "wb") as f:
        f.write(hdr32)
        np.array([1.5, -2.25], dtype=">f4").tofile(f)
    with open(tmp_path / "be32.fab", "rb") as f:
        box, back = read_fab(f)
    np.testing.assert_array_equal(back.ravel(), [1.5, -2.25])


def test_big_endian_plotfile(tmp_path):
    """A whole plotfile rewritten big-endian loads identically (the native
    loader declines and the python path byteswaps)."""
    import os
    from peleanalysis_tpu.io.fab import read_fab_header
    from peleanalysis_tpu.testing import write_synthetic_plotfile
    from peleanalysis_tpu.amr.hierarchy import AmrState

    plt = str(tmp_path / "plt")
    write_synthetic_plotfile(plt, n_cell=16, n_levels=2)
    ref = AmrState.from_plotfile(plt, dtype=np.float64)
    # rewrite every Cell_D file with the big-endian descriptor + payload
    for lev_dir in sorted(p for p in os.listdir(plt) if p.startswith("Level_")):
        for fn in sorted(os.listdir(os.path.join(plt, lev_dir))):
            if "_D_" not in fn:
                continue
            path = os.path.join(plt, lev_dir, fn)
            recs = []
            with open(path, "rb") as f:
                end = os.fstat(f.fileno()).st_size
                while f.tell() < end:
                    box, ncomp, dtype = read_fab_header(f)
                    n = int(np.prod(box.shape)) * ncomp
                    payload = np.fromfile(f, dtype=dtype, count=n)
                    recs.append((box, ncomp, payload))
            with open(path, "wb") as f:
                for box, ncomp, payload in recs:
                    f.write(b"FAB ((8, (64 11 52 0 1 12 0 1023)),"
                            b"(8, (1 2 3 4 5 6 7 8)))"
                            + repr(box).encode() + b" %d\n" % ncomp)
                    payload.astype(">f8").tofile(f)
    be = AmrState.from_plotfile(plt, dtype=np.float64)
    for lev in range(ref.meta.n_levels):
        np.testing.assert_array_equal(np.asarray(ref.data[lev]),
                                      np.asarray(be.data[lev]))


def test_f32_fab_descriptor_interop(tmp_path):
    """Our float32 FAB header must carry AMReX's Native32RealDescriptor
    (byte count 4) so reference tools parse our files."""
    from peleanalysis_tpu.io.fab import fab_header_str, read_fab, write_fab
    from peleanalysis_tpu.amr.box import Box
    hdr = fab_header_str(Box((0, 0, 0), (1, 1, 1)), 2, np.float32)
    assert b"((4, (32 8 23 0 1 9 0 127)),(4, (4 3 2 1)))" in hdr
    d = np.arange(16, dtype=np.float32).reshape(2, 2, 2, 2)
    p = tmp_path / "t.fab"
    with open(p, "wb") as f:
        write_fab(f, Box((0, 0, 0), (1, 1, 1)), d, dtype=np.float32)
    with open(p, "rb") as f:
        box, back = read_fab(f)
    np.testing.assert_array_equal(back, d)
