import numpy as np
import pytest

from peleanalysis_tpu.amr.dense import DenseAmrState
from peleanalysis_tpu.amr.hierarchy import AmrState
from peleanalysis_tpu.io.plotfile import PlotfileReader
from peleanalysis_tpu.testing import write_synthetic_plotfile
from peleanalysis_tpu.tools.grad import compute_grad


def analytic_temp_grad(x, y, z):
    c, w = 0.5, 0.15
    r2 = (x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2
    f = 1500.0 * np.exp(-r2 / w**2)
    gx = -2 * (x - c) / w**2 * f
    gy = -2 * (y - c) / w**2 * f
    gz = -2 * (z - c) / w**2 * f
    return gx, gy, gz


def test_grad_matches_analytic(synthetic_plotfile):
    sp = synthetic_plotfile
    st = AmrState.from_plotfile(sp["path"], names=["temp"], dtype=np.float64)
    out = compute_grad(st, "temp")
    assert out.names == ["temp", "temp_gx", "temp_gy", "temp_gz",
                         "||gradtemp||"]
    # check on the finest level (dx smallest => tightest h^2 error)
    lev = 2
    geom = st.meta.geoms[lev]
    ba = st.meta.bas[lev]
    from peleanalysis_tpu.testing import cell_centers

    got = np.asarray(out.data[lev])
    dx = geom.dx[0]
    union = ba.minimal_box()
    gscale = 1500.0 / 0.15 * np.sqrt(2 / np.e)  # max |grad| of the Gaussian
    for i, b in enumerate(ba):
        cs = cell_centers(b, geom)
        mesh = np.meshgrid(*cs, indexing="ij")
        gx, gy, gz = analytic_temp_grad(*mesh)
        mag = np.sqrt(gx**2 + gy**2 + gz**2)
        sl = tuple(slice(0, s) for s in b.shape)
        # cells >=2 cells inside the fine union: pure centered-difference
        # O(h^2) truncation; cells at the coarse-fine ring see the linearly
        # interpolated ghost (O(h) gradient error there, localized — the
        # reference's MLMG flux-matching analog is a later milestone).
        inner = np.ones(b.shape, dtype=bool)
        for d in range(3):
            idx = np.arange(b.lo[d], b.hi[d] + 1)
            okd = (idx >= union.lo[d] + 2) & (idx <= union.hi[d] - 2)
            shape = [1, 1, 1]
            shape[d] = -1
            inner &= okd.reshape(shape)
        tol_h2 = 50 * dx**2 * gscale / (0.15**2)
        tol_cf = 25 * dx * gscale
        for ci, want in zip(range(1, 5), (gx, gy, gz, mag)):
            err = np.abs(got[(i, ci) + sl] - want)
            assert err[inner].max() < tol_h2, (i, ci, err[inner].max(), tol_h2)
            assert err.max() < tol_cf, (i, ci, err.max(), tol_cf)


def test_grad_exact_for_linear_field(tmp_path):
    from peleanalysis_tpu.testing import write_synthetic_plotfile

    fields = {"temp": lambda x, y, z: 2.0 * x - 3.0 * y + 0.5 * z + 1.0}
    path = str(tmp_path / "plt_lin")
    write_synthetic_plotfile(path, n_cell=16, n_levels=2, fields=fields)
    st = AmrState.from_plotfile(path, dtype=np.float64)
    out = compute_grad(st, "temp")
    for lev in range(2):
        ba = st.meta.bas[lev]
        got = np.asarray(out.data[lev])
        for i, b in enumerate(ba):
            sl = tuple(slice(0, s) for s in b.shape)
            # interior cells: exactly the linear coefficients. boundary cells
            # use foextrap ghosts (gradient halves there) -> test interior.
            inner = tuple(slice(1, s - 1) for s in b.shape)
            glob_in_dom = all(b.lo[d] > st.meta.geoms[lev].domain.lo[d]
                              for d in range(3))
            np.testing.assert_allclose(got[(i, 1) + inner], 2.0, atol=1e-11)
            np.testing.assert_allclose(got[(i, 2) + inner], -3.0, atol=1e-11)
            np.testing.assert_allclose(got[(i, 3) + inner], 0.5, atol=1e-11)


def test_grad_aux_passthrough(synthetic_plotfile):
    sp = synthetic_plotfile
    st = AmrState.from_plotfile(sp["path"], names=["temp", "density"],
                                dtype=np.float64)
    out = compute_grad(st, "temp", aux=("density",))
    assert out.names[:2] == ["temp", "density"]
    np.testing.assert_array_equal(np.asarray(out.data[0][:, 1]),
                                  np.asarray(st.data[0][:, 1]))


def test_grad_cli_roundtrip(synthetic_plotfile, tmp_path):
    from peleanalysis_tpu.cli import main

    outfile = str(tmp_path / "plt_grad")
    rc = main(["grad", f"infile={synthetic_plotfile['path']}",
               "gradVar=temp", f"outfile={outfile}", "is_per=0 0 0"])
    assert rc == 0
    r = PlotfileReader(outfile)
    assert "||gradtemp||" in r.var_names
    assert r.meta.finest_level == 2


def test_grad_periodic_domain(tmp_path):
    """Fully periodic domain: centered gradients are exact-to-h^2 right up to
    the domain faces (wrap fill instead of foextrap)."""
    from peleanalysis_tpu.amr.dense import DenseAmrState
    from peleanalysis_tpu.tools.grad import compute_grad_dense
    from peleanalysis_tpu.testing import write_synthetic_plotfile

    k = 2 * np.pi
    fields = {"f": lambda x, y, z: np.sin(k * x) * np.cos(k * y) + 0 * z}
    path = str(tmp_path / "pltp")
    write_synthetic_plotfile(path, n_cell=32, n_levels=1, fields=fields,
                             is_periodic=(True, True, True))
    st = AmrState.from_plotfile(path, is_periodic=(True, True, True),
                                dtype=np.float64)
    ds = DenseAmrState.from_batched(st)
    out = compute_grad_dense(ds, "f")
    geom = st.meta.geoms[0]
    cs = [(np.arange(32) + 0.5) * geom.dx[d] for d in range(3)]
    X, Y, Z = np.meshgrid(*cs, indexing="ij")
    want = k * np.cos(k * X) * np.cos(k * Y)
    got = np.asarray(out.data[0][out.comp("f_gx")])
    h = geom.dx[0]
    # uniform h^2 error INCLUDING boundary cells (wrap ghosts)
    tol = k**3 * h**2 / 6 * 1.5
    assert np.abs(got - want).max() < tol


def test_flux_matched_gradient(tmp_path):
    """MLMG-style flux matching (grad.cpp:178-219 analog): the c-f interface
    face flux is the transverse mean of fine face fluxes; away from the
    interface the result is the plain centered difference."""
    import jax.numpy as jnp
    from peleanalysis_tpu.ops.dense_fill import fill_dense_multilevel
    from peleanalysis_tpu.ops.restrict import flux_matched_gradient
    from peleanalysis_tpu.ops.stencil import centered_gradient

    # transverse variation makes restricted fine flux differ from the
    # coarse difference: u = x * y^2
    path = str(tmp_path / "plt")
    write_synthetic_plotfile(path, n_cell=32, n_levels=2,
                             fields={"u": lambda x, y, z: x * y * y})
    ds = DenseAmrState.from_batched(AmrState.from_plotfile(path,
                                                           dtype=np.float64))
    meta, lmeta = ds.meta, ds.lmeta
    data = [d[ds.comp("u")][None] for d in ds.data]
    masks = [ds.in_level_mask(l) for l in range(2)]
    covered = [ds.covered_mask(l) for l in range(2)]
    grown = fill_dense_multilevel(meta, lmeta, data, masks, 1, None,
                                  "quadratic")
    gfm = flux_matched_gradient(meta, lmeta, grown, covered)
    gcd = [centered_gradient(g, meta.geoms[l].dx, 1) for l, g in
           enumerate(grown)]

    cov = np.asarray(covered[0])
    # cells NOT adjacent to the covered region: identical to centered diff
    near = cov.copy()
    for d in range(3):
        near |= np.roll(cov, 1, axis=d) | np.roll(cov, -1, axis=d)
    far = ~near
    for d in range(3):
        a, b = np.asarray(gfm[0][d][0]), np.asarray(gcd[0][d][0])
        np.testing.assert_allclose(a[far], b[far], rtol=1e-12)

    # oracle: x-face flux on the lo-x interface = transverse mean of fine
    # face fluxes; check one interface-adjacent coarse cell's gx
    r = meta.ref_ratio[0]
    gf = np.asarray(grown[1][0])          # fine grown scalar
    gc = np.asarray(grown[0][0])
    dxf = meta.geoms[1].dx[0]
    dxc = meta.geoms[0].dx[0]
    # find a lo-x boundary face of the covered region
    covp = np.pad(cov, ((1, 1), (0, 0), (0, 0)))
    bnd = covp[:-1] ^ covp[1:]            # faces along x, [nx+1, ny, nz]
    fx, fy, fz = [int(v[0]) for v in np.nonzero(bnd)]
    # coarse cell on the valid side (left of the face if not covered)
    ci = fx - 1 if not cov[fx - 1, fy, fz] else fx
    assert not cov[ci, fy, fz]
    bbox_f = lmeta[1].bbox
    # fine face plane for coarse face fx (coarse index space -> fine)
    fxf = fx * r - bbox_f.lo[0]
    y0, z0 = fy * r - bbox_f.lo[1], fz * r - bbox_f.lo[2]
    fine_flux = np.mean([
        (gf[1 + fxf, 1 + y0 + a, 1 + z0 + b]
         - gf[fxf, 1 + y0 + a, 1 + z0 + b]) / dxf
        for a in range(r) for b in range(r)])
    # the valid cell's NON-interface face: lo face for the left cell,
    # hi face for the right cell
    other = fx - 1 if ci == fx - 1 else fx + 1
    coarse_other = (gc[other + 1, 1 + fy, 1 + fz]
                    - gc[other, 1 + fy, 1 + fz]) / dxc
    expect = 0.5 * (fine_flux + coarse_other)
    got = float(np.asarray(gfm[0][0][0])[ci, fy, fz])
    np.testing.assert_allclose(got, expect, rtol=1e-12)
    # and it must differ from the plain centered difference (u = x*y^2 has
    # transverse curvature)
    assert abs(got - float(np.asarray(gcd[0][0][0])[ci, fy, fz])) > 1e-8


def test_flux_match_shared_engine_across_instances(tmp_path):
    """fluxMatch engines share across fingerprint-equal states; the
    numpy-captured covered masks give identical results for a second
    instance (r3 self-review: closure capture must not go stale)."""
    from peleanalysis_tpu.amr.dense import DenseAmrState
    from peleanalysis_tpu.tools.grad import compute_grad_dense

    path = str(tmp_path / "plt")
    write_synthetic_plotfile(path, n_cell=16, n_levels=2)
    ds_a = DenseAmrState.from_batched(
        AmrState.from_plotfile(path, names=["temp"], dtype=np.float64))
    ds_b = DenseAmrState.from_batched(
        AmrState.from_plotfile(path, names=["temp"], dtype=np.float64))
    a = compute_grad_dense(ds_a, "temp", flux_match=True)
    b = compute_grad_dense(ds_b, "temp", flux_match=True)
    for lev in range(2):
        np.testing.assert_array_equal(np.asarray(a.data[lev]),
                                      np.asarray(b.data[lev]))
