"""f64 end-to-end: the global ``dtype=float64`` CLI key gives the
reference's double-precision compute on the headline tools (VERDICT r2 #6;
the reference computes in double everywhere, e.g. amrex::Real in
/root/reference/Src/grad.cpp, curvature.cpp)."""
import numpy as np
import pytest

import peleanalysis_tpu.config as config
from peleanalysis_tpu.amr.hierarchy import AmrState
from peleanalysis_tpu.cli import main
from peleanalysis_tpu.testing import write_synthetic_plotfile


@pytest.fixture(autouse=True)
def _restore_dtype():
    import jax.numpy as jnp
    yield
    config.set_compute_dtype(jnp.float32)


@pytest.fixture(scope="module")
def plt(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pltf64") / "plt")
    write_synthetic_plotfile(p, n_cell=32, n_levels=2)
    return p


def test_grad_f64_cli(plt, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert main(["grad", f"infile={plt}", "gradVar=temp",
                 "outfile=g32"]) == 0
    assert main(["grad", f"infile={plt}", "gradVar=temp",
                 "dtype=float64", "outfile=g64"]) == 0
    a32 = AmrState.from_plotfile("g32", dtype=np.float64)
    a64 = AmrState.from_plotfile("g64", dtype=np.float64)
    # f64 CLI output matches the float64 numpy oracle far tighter than f32
    from peleanalysis_tpu.amr.dense import DenseAmrState
    from peleanalysis_tpu.tools.grad import compute_grad_dense
    st = AmrState.from_plotfile(plt, names=["temp"], dtype=np.float64,
                                is_periodic=[True] * 3)
    ref = compute_grad_dense(DenseAmrState.from_batched(st), "temp",
                             interp="quadratic")
    for lev in range(st.meta.n_levels):
        want_d = np.asarray(ref.data[lev], np.float64)
        bbox = ref.lmeta[lev].bbox
        scale = np.abs(want_d).max()
        err64 = err32 = 0.0
        for i, b in enumerate(a64.meta.bas[lev]):
            sl = (slice(None),) + tuple(
                slice(b.lo[d] - bbox.lo[d], b.hi[d] - bbox.lo[d] + 1)
                for d in range(3))
            cut = (i, slice(None)) + tuple(slice(0, s) for s in b.shape)
            err64 = max(err64, np.abs(
                np.asarray(a64.data[lev])[cut] - want_d[sl]).max())
            err32 = max(err32, np.abs(
                np.asarray(a32.data[lev])[cut] - want_d[sl]).max())
        assert err64 / scale < 1e-12, err64 / scale  # true double compute
        assert err32 / scale > 1e-9                  # f32 visibly coarser


def test_curvature_f64_cli(plt, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert main(["curvature", f"infile={plt}", "progressName=temp",
                 "do_gaussCurv=1", "dtype=float64", "outfile=K64"]) == 0
    from peleanalysis_tpu.amr.dense import DenseAmrState
    from peleanalysis_tpu.tools.curvature import compute_curvature_dense
    ds = DenseAmrState.from_batched(
        AmrState.from_plotfile(plt, names=["temp"], dtype=np.float64))
    ref = compute_curvature_dense(ds, "temp", do_gauss=True,
                                  interp="quadratic")
    a64 = AmrState.from_plotfile("K64", dtype=np.float64)
    ic = a64.names.index("MeanCurvature_temp")
    jc = ref.names.index("MeanCurvature_temp")
    for lev in range(ds.meta.n_levels):
        got = np.asarray(a64.data[lev][:, ic])
        bbox = ds.lmeta[lev].bbox
        ba = a64.meta.bas[lev]
        want_d = np.asarray(ref.data[lev][jc], np.float64)
        scale = np.abs(want_d).max()
        for i, b in enumerate(ba):
            sl = tuple(slice(b.lo[d] - bbox.lo[d], b.hi[d] - bbox.lo[d] + 1)
                       for d in range(3))
            w = want_d[sl]
            g = got[i][tuple(slice(0, s) for s in b.shape)]
            m = ~np.isnan(g)
            assert np.abs(g[m] - w[m]).max() / scale < 1e-12


def test_isosurface_stream_f64_cli(plt, tmp_path, monkeypatch):
    """isosurface + stream run under dtype=float64 and produce sane
    artifacts (node positions on the isotherm to f64-grade tolerance)."""
    monkeypatch.chdir(tmp_path)
    assert main(["isosurface", f"infile={plt}", "isoCompName=temp",
                 "isoVal=800", "dtype=float64", "outfile_base=iso64"]) == 0
    from peleanalysis_tpu.io.mef import read_mef
    surf = read_mef("iso64.mef")
    assert surf.nodes.shape[0] > 100
    # nodes lie on the 800-isotherm of the synthetic Gaussian ball:
    # T = 300 + 1500 exp(-r^2/w^2), so r* = w sqrt(ln(1500/500))
    xyz = surf.nodes[:, :3]
    r = np.linalg.norm(xyz - 0.5, axis=1)
    rstar = 0.15 * np.sqrt(np.log(1500.0 / 500.0))
    # linear interpolation error on the 64^3 fine grid dominates (~1e-4);
    # the point is the f64 path runs end-to-end and stays accurate
    assert np.abs(r - rstar).max() < 5e-3
    assert main(["stream", f"plotfile={plt}", "isoFile=iso64.mef",
                 "nRKsteps=10", "dtype=float64",
                 "outFile=sl64"]) == 0
