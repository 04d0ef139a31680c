import numpy as np
import pytest

from peleanalysis_tpu.amr.dense import DenseAmrState
from peleanalysis_tpu.amr.hierarchy import AmrState
from peleanalysis_tpu.testing import cell_centers, write_synthetic_plotfile
from peleanalysis_tpu.tools.curvature import compute_curvature_dense


@pytest.fixture(scope="module")
def sphere_state(tmp_path_factory):
    # Gaussian ball: level sets are spheres centered at (.5,.5,.5)
    path = str(tmp_path_factory.mktemp("pltc") / "plt")
    write_synthetic_plotfile(path, n_cell=32, n_levels=2)
    st = AmrState.from_plotfile(path, dtype=np.float64)
    return DenseAmrState.from_batched(st)


def radial(lev_state, lev, fieldvals):
    """Return r at every cell of the dense bbox of level lev."""
    geom = lev_state.meta.geoms[lev]
    bbox = lev_state.lmeta[lev].bbox
    cs = [geom.prob_lo[d] + (np.arange(bbox.lo[d], bbox.hi[d] + 1) + 0.5)
          * geom.dx[d] for d in range(3)]
    X, Y, Z = np.meshgrid(*cs, indexing="ij")
    return np.sqrt((X - 0.5) ** 2 + (Y - 0.5) ** 2 + (Z - 0.5) ** 2)


def test_sphere_curvatures(sphere_state):
    ds = sphere_state
    out = compute_curvature_dense(ds, "progress", do_gauss=True)
    assert f"MeanCurvature_progress" in out.names
    lev = 1
    km = np.asarray(out.data[lev][out.comp("MeanCurvature_progress")])
    kg = np.asarray(out.data[lev][out.comp("GaussianCurvature_progress")])
    nx = np.asarray(out.data[lev][out.comp("FlameNormalX_progress")])
    r = radial(ds, lev, None)
    geom = ds.meta.geoms[lev]
    bbox = ds.lmeta[lev].bbox
    cs = [geom.prob_lo[d] + (np.arange(bbox.lo[d], bbox.hi[d] + 1) + 0.5)
          * geom.dx[d] for d in range(3)]
    X, Y, Z = np.meshgrid(*cs, indexing="ij")
    # test shell away from center (grad=0) and bbox edges
    sel = (r > 0.08) & (r < 0.17)
    # keep 2 cells off the bbox faces
    inner = np.zeros_like(sel)
    inner[2:-2, 2:-2, 2:-2] = True
    sel &= inner
    assert sel.sum() > 1000
    h = geom.dx[0]
    # mean curvature of the sphere r: Km = 1/r
    np.testing.assert_allclose(km[sel], 1.0 / r[sel], rtol=0.08)
    # Gaussian curvature: Kg = 1/r^2
    np.testing.assert_allclose(kg[sel], 1.0 / r[sel] ** 2, rtol=0.12)
    # flame normal points outward (toward fresh gas = low progress)
    want_nx = (X - 0.5) / np.maximum(r, 1e-9)
    np.testing.assert_allclose(nx[sel], want_nx[sel], atol=0.03)


def test_progress_normalization(sphere_state):
    out = compute_curvature_dense(sphere_state, "progress", do_gauss=False)
    for lev in range(2):
        p = np.asarray(out.data[lev][out.comp("Progress")])
        v = np.asarray(sphere_state.valid_mask(lev))
        assert p[v].min() > -1e-12 and p[v].max() < 1 + 1e-12


def test_smoothing_reduces_noise(tmp_path):
    rng = np.random.default_rng(0)

    def noisy(x, y, z):
        base = np.exp(-((x - .5) ** 2 + (y - .5) ** 2 + (z - .5) ** 2) / 0.15**2)
        return base + 0.02 * np.sin(40 * x) * np.sin(40 * y) * np.sin(40 * z)

    path = str(tmp_path / "plt")
    write_synthetic_plotfile(path, n_cell=32, n_levels=1,
                             fields={"temp": noisy})
    ds = DenseAmrState.from_batched(AmrState.from_plotfile(path,
                                                           dtype=np.float64))
    out_raw = compute_curvature_dense(ds, "temp", do_gauss=False,
                                      do_smooth=False)
    out_sm = compute_curvature_dense(ds, "temp", do_gauss=False,
                                     do_smooth=True, smooth_time=1e-3,
                                     smooth_iters=100)
    raw = np.asarray(out_raw.data[0][out_raw.comp("SmoothedProgress")])
    sm = np.asarray(out_sm.data[0][out_sm.comp("SmoothedProgress")])
    # smoothing kills high-frequency content
    def hf_energy(a):
        d = a[2:] - 2 * a[1:-1] + a[:-2]
        return float(np.mean(d * d))
    assert hf_energy(sm) < 0.5 * hf_energy(raw)
    # but preserves the mean
    assert abs(sm.mean() - raw.mean()) < 1e-3


def test_strain_and_velnormal(sphere_state):
    out = compute_curvature_dense(
        sphere_state, "progress", do_gauss=False, do_strain=True,
        get_strain_tensor=True, do_velnormal=True)
    # velocity field: u=(-(y-c)+.1 sin(2pi x), (x-c)+.1 cos(2pi y), 0.25)
    # => du/dx = .2 pi cos(2pi x); divu = .2 pi (cos - sin terms)
    lev = 0
    geom = sphere_state.meta.geoms[lev]
    bbox = sphere_state.lmeta[lev].bbox
    cs = [geom.prob_lo[d] + (np.arange(bbox.lo[d], bbox.hi[d] + 1) + 0.5)
          * geom.dx[d] for d in range(3)]
    X, Y, Z = np.meshgrid(*cs, indexing="ij")
    dudx = np.asarray(out.data[lev][out.comp("ROST_dUxdx")])
    want = 0.1 * 2 * np.pi * np.cos(2 * np.pi * X)
    inner = (slice(2, -2),) * 3
    np.testing.assert_allclose(dudx[inner], want[inner], atol=0.02)
    # ROST_dUxdy = -1 (solid rotation)
    dudy = np.asarray(out.data[lev][out.comp("ROST_dUxdy")])
    np.testing.assert_allclose(dudy[inner], -1.0, atol=0.01)
    assert "StrainRate_progress" in out.names
    assert "VelFlameNormal" in out.names


def test_strain_bug_parity(sphere_state):
    out_fix = compute_curvature_dense(sphere_state, "progress",
                                      do_gauss=False, do_strain=True)
    out_bug = compute_curvature_dense(sphere_state, "progress",
                                      do_gauss=False, do_strain=True,
                                      replicate_strain_bug=True)
    a = np.asarray(out_fix.data[0][out_fix.comp("StrainRate_progress")])
    b = np.asarray(out_bug.data[0][out_bug.comp("StrainRate_progress")])
    # bug mode = divu only; fixed mode adds -NN:gradU, so they differ
    assert not np.allclose(a, b)
    # PIN the bug semantics (curvature.cpp:745: the second assignment
    # overwrites the first): bug-mode output == div(u) exactly, computed
    # from the strain-tensor components
    out_t = compute_curvature_dense(sphere_state, "progress",
                                    do_gauss=False, do_strain=True,
                                    get_strain_tensor=True)
    divu = sum(np.asarray(out_t.data[0][out_t.comp(f"ROST_dU{d}d{d}")])
               for d in ("x", "y", "z"))
    np.testing.assert_allclose(b, divu, rtol=1e-12, atol=1e-12)


def test_composite_smoothing(tmp_path):
    """Composite multilevel smoothing (the MLMG-analog solve): smooths the
    fine level while keeping coarse/fine consistent across the c-f seam."""
    def noisy(x, y, z):
        base = np.exp(-((x - .5)**2 + (y - .5)**2 + (z - .5)**2) / 0.15**2)
        return base + 0.02 * np.sin(40 * x) * np.sin(37 * y)

    path = str(tmp_path / "plt")
    write_synthetic_plotfile(path, n_cell=32, n_levels=2,
                             fields={"temp": noisy})
    ds = DenseAmrState.from_batched(AmrState.from_plotfile(path,
                                                           dtype=np.float64))
    out = compute_curvature_dense(ds, "temp", do_gauss=False,
                                  do_smooth=True, smooth_time=1e-3,
                                  smooth_iters=80, smooth_composite=True)
    raw = compute_curvature_dense(ds, "temp", do_gauss=False,
                                  do_smooth=False)
    for lev in range(2):
        sm = np.asarray(out.data[lev][out.comp("SmoothedProgress")])
        rw = np.asarray(raw.data[lev][raw.comp("SmoothedProgress")])
        m = np.asarray(ds.valid_mask(lev))
        def hf(a):
            d = a[2:] - 2 * a[1:-1] + a[:-2]
            return float(np.mean(d * d))
        assert hf(sm) < 0.7 * hf(rw)
        # mean approximately preserved on valid cells (FOEXTRAP edges leak)
        assert abs(sm[m].mean() - rw[m].mean()) < 1e-2


def test_average_down(tmp_path):
    from peleanalysis_tpu.ops.restrict import average_down_all
    import jax.numpy as jnp
    # analytic linear field: block mean of children == coarse cell value
    path = str(tmp_path / "plt")
    write_synthetic_plotfile(
        path, n_cell=16, n_levels=2,
        fields={"f": lambda x, y, z: 2 * x - y + 3 * z})
    ds = DenseAmrState.from_batched(AmrState.from_plotfile(path,
                                                           dtype=np.float64))
    x = [ds.data[l][ds.comp("f")][None] for l in range(2)]
    covered = [ds.covered_mask(l) for l in range(2)]
    out = average_down_all(ds.meta, ds.lmeta, x, covered)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x[0]),
                               rtol=1e-12)


def test_use_file_minmax_combines(sphere_state):
    """useFileMinMax=1 (default) combines user progMin/progMax with the file
    scan via min/max (curvature.cpp:139-148): user values LESS extreme than
    the file's must not narrow the normalization range."""
    ds = sphere_state
    # narrow user window inside the file's range -> ignored under the default
    out_comb = compute_curvature_dense(ds, "progress", do_gauss=False,
                                       prog_min=0.4, prog_max=0.6)
    out_scan = compute_curvature_dense(ds, "progress", do_gauss=False)
    a = np.asarray(out_comb.data[0][out_comb.comp("Progress")])
    b = np.asarray(out_scan.data[0][out_scan.comp("Progress")])
    np.testing.assert_allclose(a, b, rtol=1e-12)
    # use_file_minmax=False trusts the user bounds verbatim
    out_raw = compute_curvature_dense(ds, "progress", do_gauss=False,
                                      prog_min=0.4, prog_max=0.6,
                                      use_file_minmax=False)
    c = np.asarray(out_raw.data[0][out_raw.comp("Progress")])
    assert not np.allclose(a, c)
    v0 = np.asarray(ds.valid_mask(0))
    # the narrow window stretches [0,1] data to ~5x the span
    assert (c[v0].max() - c[v0].min()) > 3 * (b[v0].max() - b[v0].min())
    # user bounds WIDER than the file's do take effect even with the scan
    out_wide = compute_curvature_dense(ds, "progress", do_gauss=False,
                                       prog_min=-1.0, prog_max=2.0)
    w = np.asarray(out_wide.data[0][out_wide.comp("Progress")])
    v = np.asarray(ds.valid_mask(0))
    assert w[v].max() < 0.7  # range [-1,2] compresses [0,1] data


def test_curvature_cli_sharded_matches(tmp_path, monkeypatch):
    """curvature ndevices=8 over the virtual mesh == unsharded (the second
    major tool pinned multi-chip, after grad in dryrun and isosurface in
    test_isosurface)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from peleanalysis_tpu.amr.hierarchy import AmrState
    from peleanalysis_tpu.cli import main
    from peleanalysis_tpu.testing import write_synthetic_plotfile

    monkeypatch.chdir(tmp_path)
    write_synthetic_plotfile("plt", n_cell=32, n_levels=2)
    assert main(["curvature", "infile=plt", "progressName=temp",
                 "do_gaussCurv=1", "outfile=K1"]) == 0
    assert main(["curvature", "infile=plt", "progressName=temp",
                 "do_gaussCurv=1", "ndevices=8", "outfile=K8"]) == 0
    a = AmrState.from_plotfile("K1", dtype=np.float64)
    b = AmrState.from_plotfile("K8", dtype=np.float64)
    assert a.names == b.names
    for lev in range(a.meta.n_levels):
        da, db = np.asarray(a.data[lev]), np.asarray(b.data[lev])
        # hole/covered cells carry NaN in both outputs — patterns must match
        np.testing.assert_array_equal(np.isnan(da), np.isnan(db))
        m = ~np.isnan(da)
        denom = max(np.abs(da[m]).max(), 1e-30)
        # channel-batched fills partition differently under GSPMD:
        # f32-ulp-grade FMA regrouping, not a semantic difference
        assert np.abs(da[m] - db[m]).max() / denom < 5e-7
