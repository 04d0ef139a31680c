import numpy as np
import pytest

from peleanalysis_tpu.amr.box import Box, BoxArray, decompose
from peleanalysis_tpu.amr.geometry import Geometry
from peleanalysis_tpu.amr.hierarchy import AmrMeta, AmrState
from peleanalysis_tpu.ops.fillpatch import fill_grown
from peleanalysis_tpu.testing import eval_on_box


def linear_field(a=(1.0, 2.0, 3.0), b=0.25):
    return {"f": lambda x, y, z: a[0] * x + a[1] * y + a[2] * z + b}


def make_single_level(n=16, mgs=8, periodic=False):
    dom = Box((0, 0, 0), (n - 1, n - 1, n - 1))
    geom = Geometry(dom, (0.0,) * 3, (1.0,) * 3, (periodic,) * 3)
    ba = decompose(dom, mgs)
    return geom, ba


def ghost_centers(box, geom, ngrow):
    dx = geom.dx
    return [
        geom.prob_lo[d]
        + (np.arange(box.lo[d] - ngrow, box.hi[d] + ngrow + 1)
           - geom.domain.lo[d] + 0.5) * dx[d]
        for d in range(3)
    ]


def analytic_grown(box, geom, ngrow, fn):
    cs = ghost_centers(box, geom, ngrow)
    mesh = np.meshgrid(*cs, indexing="ij")
    return fn(*mesh)


def test_same_level_interior_ghosts():
    geom, ba = make_single_level()
    fields = linear_field()
    fabs = [eval_on_box(b, geom, fields) for b in ba]
    meta = AmrMeta([geom], [ba], [])
    st = AmrState.from_arrays(meta, ["f"], [fabs], dtype=np.float64)
    g = 2
    grown = np.asarray(fill_grown(st, 0, g))
    fn = fields["f"]
    for i, b in enumerate(ba):
        want = analytic_grown(b, geom, g, fn)
        got = grown[i, 0, : b.shape[0] + 2 * g, : b.shape[1] + 2 * g,
                    : b.shape[2] + 2 * g]
        # interior-of-domain ghost cells must be exact (copied from neighbors)
        glob = [np.arange(b.lo[d] - g, b.hi[d] + g + 1) for d in range(3)]
        inside = np.ones(want.shape, bool)
        for d in range(3):
            ok = (glob[d] >= 0) & (glob[d] <= geom.domain.hi[d])
            shape = [1, 1, 1]
            shape[d] = -1
            inside &= ok.reshape(shape)
        np.testing.assert_allclose(got[inside], want[inside], rtol=1e-12)


def test_periodic_ghosts():
    geom, ba = make_single_level(periodic=True)
    # periodic-consistent field
    fields = {"f": lambda x, y, z: np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y) + z * 0}
    fabs = [eval_on_box(b, geom, fields) for b in ba]
    meta = AmrMeta([geom], [ba], [])
    st = AmrState.from_arrays(meta, ["f"], [fabs], dtype=np.float64)
    g = 3
    grown = np.asarray(fill_grown(st, 0, g))
    fn = fields["f"]
    for i, b in enumerate(ba):
        # wrap analytic evaluation
        cs = ghost_centers(b, geom, g)
        cs = [c % 1.0 for c in cs]
        mesh = np.meshgrid(*cs, indexing="ij")
        want = fn(*mesh)
        got = grown[i, 0]
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_foextrap_boundary():
    geom, ba = make_single_level(n=8, mgs=8)
    fields = linear_field()
    fabs = [eval_on_box(b, geom, fields) for b in ba]
    meta = AmrMeta([geom], [ba], [])
    st = AmrState.from_arrays(meta, ["f"], [fabs], dtype=np.float64)
    grown = np.asarray(fill_grown(st, 0, 1))[0, 0]
    interior = fabs[0][0]
    # low-x ghost plane equals first interior plane (first-order extrap)
    np.testing.assert_allclose(grown[0, 1:-1, 1:-1], interior[0], rtol=1e-12)
    np.testing.assert_allclose(grown[-1, 1:-1, 1:-1], interior[-1], rtol=1e-12)


def test_reflect_odd():
    from peleanalysis_tpu.ops.fill import REFLECT_ODD, FOEXTRAP
    geom, ba = make_single_level(n=8, mgs=8)
    fields = linear_field()
    fabs = [eval_on_box(b, geom, fields) for b in ba]
    meta = AmrMeta([geom], [ba], [])
    st = AmrState.from_arrays(meta, ["f"], [fabs], dtype=np.float64)
    bc = ((REFLECT_ODD, FOEXTRAP), (FOEXTRAP, FOEXTRAP), (FOEXTRAP, FOEXTRAP))
    grown = np.asarray(fill_grown(st, 0, 1, bc=bc))[0, 0]
    interior = fabs[0][0]
    np.testing.assert_allclose(grown[0, 1:-1, 1:-1], -interior[0], rtol=1e-12)


def two_level_state(fields, n=16, mgs=8, interp_box=None):
    dom0 = Box((0, 0, 0), (n - 1, n - 1, n - 1))
    geom0 = Geometry(dom0, (0.0,) * 3, (1.0,) * 3, (False,) * 3)
    ba0 = decompose(dom0, mgs)
    geom1 = geom0.refine(2)
    sub = interp_box or Box((8, 8, 8), (23, 23, 23))
    ba1 = decompose(sub, mgs)
    meta = AmrMeta([geom0, geom1], [ba0, ba1], [2])
    fabs0 = [eval_on_box(b, geom0, fields) for b in ba0]
    fabs1 = [eval_on_box(b, geom1, fields) for b in ba1]
    return AmrState.from_arrays(meta, list(fields), [fabs0, fabs1],
                                dtype=np.float64), geom1, ba1


def test_two_level_pc_interp():
    fields = linear_field()
    st, geom1, ba1 = two_level_state(fields)
    g = 2
    grown = np.asarray(fill_grown(st, 1, g, interp="pc"))
    fn = fields["f"]
    geom0 = st.meta.geoms[0]
    for i, b in enumerate(ba1):
        got = grown[i, 0]
        # ghost cells outside the fine union take the coarse parent value
        glob = [np.arange(b.lo[d] - g, b.hi[d] + g + 1) for d in range(3)]
        fine_lo, fine_hi = 8, 23
        for d, off in ((0, 0),):
            pass
        # check a lo-x ghost plane (outside fine union when b.lo[0]==8)
        if b.lo[0] == 8:
            crse_i = (b.lo[0] - 1) // 2
            cs = [np.array([geom0.prob_lo[0] + (crse_i + 0.5) * geom0.dx[0]])]
            ys = 0.5 * (glob[1] + 0.5) * geom1.dx[1] * 2  # center of coarse?
            # evaluate expected: coarse cell value at coarsened index
            for jj in range(got.shape[1]):
                for kk in range(got.shape[2]):
                    gy = glob[1][jj] // 2
                    gz = glob[2][kk] // 2
                    want = fn(
                        geom0.prob_lo[0] + (crse_i + 0.5) * geom0.dx[0],
                        geom0.prob_lo[1] + (gy + 0.5) * geom0.dx[1],
                        geom0.prob_lo[2] + (gz + 0.5) * geom0.dx[2],
                    )
                    assert abs(got[g - 1, jj, kk] - want) < 1e-12


def test_two_level_linear_interp_exact_for_linear_field():
    fields = linear_field()
    st, geom1, ba1 = two_level_state(fields)
    g = 2
    grown = np.asarray(fill_grown(st, 1, g, interp="linear"))
    fn = fields["f"]
    for i, b in enumerate(ba1):
        want = analytic_grown(b, geom1, g, fn)
        got = grown[i, 0]
        # linear interp reproduces a linear field exactly everywhere the
        # stencil stays inside the coarse domain (true here: fine union is
        # well inside)
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_fill_multicomp():
    fields = {
        "a": lambda x, y, z: x + 2 * y,
        "b": lambda x, y, z: 3 * z - x,
    }
    st, geom1, ba1 = two_level_state(fields)
    grown = np.asarray(fill_grown(st, 1, 1, interp="linear"))
    assert grown.shape[1] == 2
    for i, b in enumerate(ba1):
        np.testing.assert_allclose(
            grown[i, 1], analytic_grown(b, geom1, 1, fields["b"]), rtol=1e-12)


def test_dense_fill_sharded_matches_unsharded():
    """Spatial SPMD shard of the dense model must be bit-identical to the
    single-device result (the FillBoundary/collective-permute analog)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from peleanalysis_tpu.amr.dense import DenseAmrState
    from peleanalysis_tpu.ops.dense_fill import fill_dense_multilevel
    from peleanalysis_tpu.parallel.dense_shard import (make_spatial_mesh,
                                                       shard_dense_state)

    st = make_two_level_state()
    ds = DenseAmrState.from_batched(st)
    meta = ds.meta
    masks = [ds.in_level_mask(l) for l in range(meta.n_levels)]
    data = [d[0:1] for d in ds.data]
    ref = [np.asarray(g) for g in fill_dense_multilevel(
        meta, ds.lmeta, data, masks, 2, None, "linear")]

    mesh = make_spatial_mesh(8)
    dss = shard_dense_state(ds, mesh)
    sdata = [d[0:1] for d in dss.data]
    smasks = [dss.in_level_mask(l) for l in range(meta.n_levels)]
    got = jax.jit(lambda dl, ml: fill_dense_multilevel(
        meta, ds.lmeta, dl, ml, 2, None, "linear"))(sdata, smasks)
    for lev in range(meta.n_levels):
        # 1-ULP tolerance: jit fuses multiply-adds the eager path doesn't
        np.testing.assert_allclose(np.asarray(got[lev]), ref[lev],
                                   rtol=0, atol=1e-14)


def make_two_level_state():
    fields = {"f": lambda x, y, z: np.sin(3 * x) + y * z}
    dom0 = Box((0, 0, 0), (15, 15, 15))
    geom0 = Geometry(dom0, (0.0,) * 3, (1.0,) * 3, (False,) * 3)
    ba0 = decompose(dom0, 8)
    geom1 = geom0.refine(2)
    ba1 = decompose(Box((8, 8, 8), (23, 23, 23)), 8)
    meta = AmrMeta([geom0, geom1], [ba0, ba1], [2])
    fabs = [[eval_on_box(b, g, fields) for b in ba]
            for g, ba in zip([geom0, geom1], [ba0, ba1])]
    return AmrState.from_arrays(meta, ["f"], fabs, dtype=np.float64)
