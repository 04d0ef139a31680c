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
