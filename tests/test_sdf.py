import numpy as np
import pytest

from peleanalysis_tpu.geom.sdf import (parity_sign, point_tri_distance,
                                       unsigned_distance_grid)
from tests.test_mef_tools import make_sphere_mef


def test_point_tri_distance_regions():
    a = np.array([0.0, 0.0, 0.0])
    b = np.array([1.0, 0.0, 0.0])
    c = np.array([0.0, 1.0, 0.0])
    # above the face
    assert abs(point_tri_distance(np.array([0.2, 0.2, 0.5]), a, b, c)
               - 0.5) < 1e-12
    # nearest vertex
    assert abs(point_tri_distance(np.array([-1.0, -1.0, 0.0]), a, b, c)
               - np.sqrt(2)) < 1e-12
    # nearest edge ab
    assert abs(point_tri_distance(np.array([0.5, -2.0, 0.0]), a, b, c)
               - 2.0) < 1e-12
    # batch broadcasting
    p = np.random.default_rng(0).normal(size=(100, 3))
    d = point_tri_distance(p, a[None], b[None], c[None])
    assert d.shape == (100,)


def test_sphere_sdf():
    mef = make_sphere_mef(28, r=0.3)
    tri = mef.positions()[mef.elements]
    n = 40
    dx = np.array([2.0 / n] * 3)
    origin = np.array([-1.0, -1.0, -1.0])
    dmax = 0.4
    phi, _ = unsigned_distance_grid(tri, origin, dx, (n, n, n), dmax)
    sgn = parity_sign(tri, origin, dx, (n, n, n))
    cs = origin[0] + (np.arange(n) + 0.5) * dx[0]
    X, Y, Z = np.meshgrid(cs, cs, cs, indexing="ij")
    r = np.sqrt(X**2 + Y**2 + Z**2)
    want = np.clip(np.abs(r - 0.3), 0, dmax)
    sel = want < dmax - 2 * dx[0]
    # unsigned distance accurate to ~h (faceted sphere + grid resolution)
    err = np.abs(phi - want)[sel]
    assert err.max() < 1.2 * dx[0]
    # sign: inside negative
    inside = r < 0.3 - dx[0]
    outside = (r > 0.3 + dx[0]) & sel
    assert (sgn[inside] == -1).all()
    assert (sgn[outside] == 1).all()


def test_build_distance_cli(tmp_path, monkeypatch):
    from peleanalysis_tpu.cli import main
    from peleanalysis_tpu.io.plotfile import PlotfileReader
    from peleanalysis_tpu.testing import write_synthetic_plotfile
    monkeypatch.chdir(tmp_path)
    plt = str(tmp_path / "plt")
    write_synthetic_plotfile(plt, n_cell=16, n_levels=2)
    assert main(["isosurface", f"infile={plt}", "isoCompName=progress",
                 "isoVal=0.5", "outfile_base=surf"]) == 0
    assert main(["buildDistance", f"infile={plt}", "isoFile=surf.mef",
                 "signComp=progress", "isoVal=0.5",
                 "outfile=dist"]) == 0
    r = PlotfileReader("dist")
    assert r.var_names == ["distance"]
    # distance is negative where progress < 0.5 (outside the hot ball)
    d0 = r.read_level(0)
    vals = np.concatenate([f.ravel() for f in d0])
    assert vals.min() < 0 < vals.max()
