"""CG solver convergence control (the MLMG::solve tolerance analog,
/root/reference/Src/curvature.cpp:336-406)."""
import numpy as np
import jax.numpy as jnp
import pytest

from peleanalysis_tpu.amr.dense import DenseAmrState
from peleanalysis_tpu.amr.hierarchy import AmrState
from peleanalysis_tpu.ops.solve import (cg_iterations_to_tol, cg_solve,
                                        cg_solve_composite)
from peleanalysis_tpu.testing import write_synthetic_plotfile


def _helmholtz(beta, h):
    """(I - beta lap) with periodic rolls — pure-array Helmholtz operator."""
    def apply_A(x):
        lap = 0.0
        for ax in range(3):
            lap = lap + (jnp.roll(x, 1, ax) + jnp.roll(x, -1, ax) - 2 * x)
        return x - beta * lap / h ** 2
    return apply_A


def test_cg_helmholtz_rtol_converges():
    n = 24
    h = 1.0 / n
    beta = 5e-4
    x = (np.arange(n) + 0.5) * h
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    x_true = jnp.asarray(np.sin(2 * np.pi * X) * np.sin(2 * np.pi * Y)
                         * np.sin(2 * np.pi * Z))
    A = _helmholtz(beta, h)
    b = A(x_true)
    sol = cg_solve(A, b, jnp.zeros_like(b), None, n_iter=500, rtol=1e-10)
    err = float(jnp.max(jnp.abs(sol - x_true)))
    assert err < 1e-8
    # residual check (the solve really hit the tolerance, not the cap)
    r = float(jnp.linalg.norm((b - A(sol)).ravel()))
    r0 = float(jnp.linalg.norm(b.ravel()))
    assert r <= 1.1e-10 * r0


def test_cg_rtol_stops_early():
    # a loose tolerance must give a worse answer than a tight one (i.e. the
    # while_loop actually stops early rather than running to the cap)
    n = 16
    h = 1.0 / n
    A = _helmholtz(1e-2, h)
    rng = np.random.default_rng(3)
    x_true = jnp.asarray(rng.standard_normal((n, n, n)))
    b = A(x_true)
    loose = cg_solve(A, b, jnp.zeros_like(b), None, n_iter=400, rtol=1e-2)
    tight = cg_solve(A, b, jnp.zeros_like(b), None, n_iter=400, rtol=1e-12)
    e_loose = float(jnp.max(jnp.abs(loose - x_true)))
    e_tight = float(jnp.max(jnp.abs(tight - x_true)))
    assert e_tight < 1e-9
    assert e_loose > 10 * max(e_tight, 1e-14)


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("slv") / "plt")
    write_synthetic_plotfile(path, n_cell=16, n_levels=2)
    return DenseAmrState.from_batched(
        AmrState.from_plotfile(path, dtype=np.float64))


def _curvature_smoothing_operator(ds, smooth_time):
    """The exact apply_A the curvature composite smoothing solve uses."""
    from peleanalysis_tpu.ops.dense_fill import fill_dense_multilevel
    from peleanalysis_tpu.ops.restrict import average_down_all
    from peleanalysis_tpu.ops.stencil import laplacian
    from peleanalysis_tpu.tools.curvature import grad_bc

    meta, lmeta = ds.meta, ds.lmeta
    bc = grad_bc([False] * 3, None)
    masks = [ds.in_level_mask(l) for l in range(meta.n_levels)]
    covered = [ds.covered_mask(l) for l in range(meta.n_levels)]

    def apply_A(x_list):
        xd = average_down_all(meta, lmeta, x_list, covered)
        grown = fill_dense_multilevel(meta, lmeta, xd, masks, 1, bc, "linear")
        return [xd[l] - smooth_time * laplacian(grown[l], meta.geoms[l].dx, 1)
                for l in range(meta.n_levels)]
    return apply_A


def test_composite_smoothing_iteration_count(ds):
    """Documents the iteration budget of the curvature smoothing defaults:
    with smoothing_time=1e-7 (the CLI default) the composite solve converges
    to rtol=1e-10 in a handful of iterations — far below the smooth_iters=50
    cap; a stiff smoothing time (1e-3) needs more but still < 50."""
    meta = ds.meta
    ic = ds.comp("temp")
    prog = [d[ic:ic + 1] for d in ds.data]
    valid = [jnp.asarray(ds.valid_mask(l))[None] for l in range(meta.n_levels)]
    vols = [meta.geoms[l].cell_volume() for l in range(meta.n_levels)]

    n_default = cg_iterations_to_tol(
        _curvature_smoothing_operator(ds, 1e-7), prog, prog, valid, vols,
        rtol=1e-10)
    n_stiff = cg_iterations_to_tol(
        _curvature_smoothing_operator(ds, 1e-3), prog, prog, valid, vols,
        rtol=1e-10)
    assert n_default <= 10, n_default
    assert n_stiff < 50, n_stiff
    assert n_stiff > n_default

    # and the while_loop solve agrees with the eager diagnostic's answer
    A = _curvature_smoothing_operator(ds, 1e-3)
    sol = cg_solve_composite(A, prog, prog, valid, vols, 100, rtol=1e-10)
    res = [b - a for b, a in zip(prog, A(sol))]
    num = sum(float(jnp.sum(r * r * v)) for r, v in zip(res, valid))
    den = sum(float(jnp.sum(b * b * v)) for b, v in zip(prog, valid))
    assert np.sqrt(num / den) < 1e-9
