import numpy as np
import pytest

from peleanalysis_tpu.amr.dense import DenseAmrState
from peleanalysis_tpu.amr.hierarchy import AmrState
from peleanalysis_tpu.geom.marching_squares import extract_isolines
from peleanalysis_tpu.io.plotfile import PlotfileReader
from peleanalysis_tpu.testing import write_synthetic_plotfile


def fields_2d():
    c, w = 0.5, 0.15

    def prog(x, y):
        return np.exp(-((x - c) ** 2 + (y - c) ** 2) / w**2)

    return {"progress": prog,
            "temp": lambda x, y: 300 + 1500 * prog(x, y)}


@pytest.fixture(scope="module")
def plt2d(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("p2") / "plt")
    write_synthetic_plotfile(path, n_cell=64, n_levels=2, ndim=2,
                             fields=fields_2d(),
                             is_periodic=(False, False))
    return path


def test_2d_plotfile_roundtrip(plt2d, tmp_path):
    r = PlotfileReader(plt2d)
    assert r.meta.ndim == 2
    st = AmrState.from_plotfile(plt2d, dtype=np.float64)
    assert st.meta.ndim2
    # promoted: nz = 1
    assert st.data[0].shape[-1] == 1
    out = str(tmp_path / "plt2_out")
    st.to_plotfile(out)
    r2 = PlotfileReader(out)
    assert r2.meta.ndim == 2
    for i in range(len(r.box_array(0))):
        np.testing.assert_allclose(r2.read_box(0, i), r.read_box(0, i))


def test_2d_grad(plt2d):
    from peleanalysis_tpu.tools.grad import compute_grad_dense
    st = AmrState.from_plotfile(plt2d, names=["progress"], dtype=np.float64)
    ds = DenseAmrState.from_batched(st)
    out = compute_grad_dense(ds, "progress")
    gz = np.asarray(out.data[0][out.comp("progress_gz")])
    np.testing.assert_allclose(gz, 0.0, atol=1e-14)  # no z variation
    # radial gradient magnitude sane on level 1
    mag = np.asarray(out.data[1][out.comp("||gradprogress||")])
    assert mag.max() > 1.0


def test_2d_isolines_circle(plt2d):
    st = AmrState.from_plotfile(plt2d, names=["progress", "temp"],
                                dtype=np.float64)
    ds = DenseAmrState.from_batched(st)
    iso = 0.5
    r = 0.15 * np.sqrt(np.log(1 / iso))
    mef = extract_isolines(ds, "progress", iso, extra_names=("temp",))
    assert mef.names == ["X", "Y", "progress", "temp"]
    assert mef.n_elts > 20
    # nodes on the circle of radius r
    pos = mef.nodes[:, :2]
    rr = np.linalg.norm(pos - 0.5, axis=1)
    h = ds.meta.geoms[-1].dx[0]
    assert np.abs(rr - r).max() < h
    # total length = circumference
    length = mef.total_area()
    assert abs(length - 2 * np.pi * r) < 0.03 * 2 * np.pi * r
    # interpolated field values exact
    np.testing.assert_allclose(mef.field("progress"), iso, atol=1e-12)
    np.testing.assert_allclose(mef.field("temp"), 300 + 1500 * iso,
                               rtol=1e-9)
    # closed loop: every node belongs to exactly 2 segments
    cnt = np.bincount(mef.elements.ravel())
    assert (cnt == 2).all()


def test_2d_isosurface_cli(plt2d, tmp_path, monkeypatch):
    from peleanalysis_tpu.cli import main
    from peleanalysis_tpu.io.mef import read_mef
    monkeypatch.chdir(tmp_path)
    rc = main(["isosurface", f"infile={plt2d}", "isoCompName=temp",
               "isoVal=1000", "outfile_base=c2", "writeLines=1"])
    assert rc == 0
    mef = read_mef("c2.mef")
    assert mef.nodes_per_elt == 2
    assert mef.ndim == 2
    import os
    assert os.path.exists("c2_lines.dat")


def test_2d_curvature_circle(plt2d):
    from peleanalysis_tpu.tools.curvature import compute_curvature_dense
    st = AmrState.from_plotfile(plt2d, names=["progress"], dtype=np.float64)
    ds = DenseAmrState.from_batched(st)
    # 2D: Gaussian curvature is meaningless (reference compiles it out);
    # mean curvature = 0.5*div(N) with N_z = 0
    out = compute_curvature_dense(ds, "progress", prog_min=0.0, prog_max=1.0,
                                  do_gauss=False)
    lev = 1
    km = np.asarray(out.data[lev][out.comp("MeanCurvature_progress")])[..., 0]
    geom = ds.meta.geoms[lev]
    bbox = ds.lmeta[lev].bbox
    cs = [geom.prob_lo[d] + (np.arange(bbox.lo[d], bbox.hi[d] + 1) + 0.5)
          * geom.dx[d] for d in range(2)]
    X, Y = np.meshgrid(*cs, indexing="ij")
    r = np.sqrt((X - 0.5) ** 2 + (Y - 0.5) ** 2)
    sel = (r > 0.08) & (r < 0.17)
    sel[:2] = sel[-2:] = False
    sel[:, :2] = sel[:, -2:] = False
    # 2D level-set "mean curvature" 0.5*div(n) of a circle = 0.5/r
    np.testing.assert_allclose(km[sel], 0.5 / r[sel], rtol=0.1)


def test_2d_conditional_mean(plt2d, tmp_path, monkeypatch):
    from peleanalysis_tpu.cli import main
    monkeypatch.chdir(tmp_path)
    rc = main(["conditionalMean", f"infile={plt2d}", "binComp=progress",
               "avgComps=temp", "nBins=8", "binMin=0", "binMax=1"])
    assert rc == 0
    import os
    assert os.path.exists("CM_progress.dat")


def test_2d_stream_rotation(tmp_path):
    """2D plotfile streamline tracing: planar rotation stays on a circle."""
    from peleanalysis_tpu.stream.trace import trace_streamlines
    fields = {
        "x_velocity": lambda x, y: -(y - 0.5),
        "y_velocity": lambda x, y: (x - 0.5),
    }
    plt = str(tmp_path / "plt2v")
    write_synthetic_plotfile(plt, n_cell=32, n_levels=1, ndim=2,
                             fields=fields)
    ds = DenseAmrState.from_batched(
        AmrState.from_plotfile(plt, dtype=np.float64))
    seeds = np.array([[0.65, 0.5, 0.5]])
    lines = trace_streamlines(ds, seeds, 40, 0.5, trace_field=None)
    r = np.linalg.norm(lines[0, :, :2] - 0.5, axis=1)
    assert np.abs(r - 0.15).max() < 0.01
    # no z drift
    np.testing.assert_allclose(lines[0, :, 2], 0.5, atol=1e-9)


def test_2d_integral_and_weights(plt2d):
    from peleanalysis_tpu.tools.conditional_mean import (
        accumulate_conditional_mean, refinement_weights)
    from peleanalysis_tpu.tools.integral import integrate_along
    assert refinement_weights([2, 2], 3, ndim=2) == [16, 4, 1]
    st = AmrState.from_plotfile(plt2d, dtype=np.float64)
    ds = DenseAmrState.from_batched(st)
    # volume integral in a promoted-2D state (dz=1 -> area integral)
    _, w, fields = integrate_along(ds, ["progress"], [0, 1, 2])
    assert abs(float(w) - 1.0) < 1e-12
    # integral along y -> profile over (x, z=1)
    coords, w1, f1 = integrate_along(ds, ["progress"], [1])
    assert f1[0].shape == (128, 1)
    np.testing.assert_allclose(w1, 1.0, rtol=1e-12)
    # conditional mean weights: total = finest-equivalent 2D cell count
    hits, sums, _, _, _ = accumulate_conditional_mean(
        ds, "progress", ["temp"], 8, -0.1, 1.1)
    np.testing.assert_allclose(hits.sum(), 128 * 128, rtol=1e-12)


@pytest.fixture(scope="module")
def plt2d_vel(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("p2v") / "plt")
    write_synthetic_plotfile(
        path, n_cell=32, n_levels=2, ndim=2,
        fields={"temp": lambda x, y: 300 + x,
                "x_velocity": lambda x, y: -(y - .5),
                "y_velocity": lambda x, y: (x - .5)},
        is_periodic=(False, False))
    return path


def test_2d_rms_vel(plt2d_vel, tmp_path, monkeypatch):
    """rmsVel on a 2-D plotfile averages over the two in-plane components
    (was: hardcoded z_velocity load -> ValueError)."""
    monkeypatch.chdir(tmp_path)
    from peleanalysis_tpu.tools import rms_vel
    rms_vel.main({"infile": plt2d_vel, "outfile": "rms.dat"})
    t, u = np.loadtxt("rms.dat")
    # solid rotation: per-comp variance of uniform coord over the finest
    # level's [0.25,0.75] span = 0.5^2/12
    assert abs(u - np.sqrt(0.25 / 12)) < 5e-3


def test_2d_turbulence_spectra(plt2d_vel, tmp_path, monkeypatch):
    """2-D spectra: ring-binned E(k) with Parseval, w omitted."""
    monkeypatch.chdir(tmp_path)
    from peleanalysis_tpu.tools import turbulence_spectra
    turbulence_spectra.main({"infile": plt2d_vel, "outfile_base": "t2"})
    E = np.loadtxt("t2_plt_spectrum.dat")
    from peleanalysis_tpu.tools.flatten_amr import flatten_to_level
    st = AmrState.from_plotfile(plt2d_vel,
                                names=["x_velocity", "y_velocity"],
                                dtype=np.float64)
    d = np.asarray(flatten_to_level(st, 1))[..., 0]
    tke = 0.5 * sum(float(np.mean((a - a.mean()) ** 2)) for a in d)
    # %e file formatting rounds each row at ~1e-7 relative
    assert abs(E[:, 1].sum() - tke) < 1e-5 * max(tke, 1e-30)
    stats = open("t2_stats.dat").read()
    assert "urms_iso" in stats or len(stats.splitlines()) == 2


def test_2d_sub_plt(plt2d, tmp_path, monkeypatch):
    """subPlt accepts a 4-int box on 2-D plotfiles."""
    monkeypatch.chdir(tmp_path)
    from peleanalysis_tpu.tools import sub_plt
    sub_plt.main({"infile": plt2d, "box": "16 16 47 47",
                  "outfile": "sub2d"})
    st = AmrState.from_plotfile("sub2d")
    assert st.meta.geoms[0].domain.shape[:2] == (32, 32)
    full = AmrState.from_plotfile(plt2d, dtype=np.float64)
    ic = full.names.index("temp")
    ds_f = DenseAmrState.from_batched(full)
    ds_s = DenseAmrState.from_batched(AmrState.from_plotfile(
        "sub2d", dtype=np.float64))
    a = np.asarray(ds_f.data[0][ic])[16:48, 16:48, 0]
    b = np.asarray(ds_s.data[0][ds_s.comp("temp")])[..., 0]
    np.testing.assert_allclose(b, a, rtol=1e-6)


def test_2d_curvature_strain(plt2d_vel, tmp_path, monkeypatch):
    """2-D strain: planar velocity with zero-z promotion; solid rotation has
    exactly zero divergence and zero tangential strain."""
    monkeypatch.chdir(tmp_path)
    from peleanalysis_tpu.tools import curvature as ct
    ct.main({"infile": plt2d_vel, "progressName": "temp", "do_gaussCurv": "0",
             "do_strain": "1", "getStrainTensor": "1", "outfile": "c2s"})
    ds = DenseAmrState.from_batched(AmrState.from_plotfile(
        "c2s", dtype=np.float64))
    sr_name = [n for n in ds.names if n.startswith("StrainRate")][0]
    for lev in range(2):
        sr = np.asarray(ds.data[lev][ds.comp(sr_name)])
        m = np.asarray(ds.valid_mask(lev))
        assert np.isfinite(sr).all()
        assert np.abs(sr[m]).max() < 1e-10
    assert any("ROST_dUzdx" == n for n in ds.names)  # zero-z promoted tensor
