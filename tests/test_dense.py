import numpy as np
import pytest

from peleanalysis_tpu.amr.box import Box, BoxArray, decompose
from peleanalysis_tpu.amr.dense import DenseAmrState
from peleanalysis_tpu.amr.geometry import Geometry
from peleanalysis_tpu.amr.hierarchy import AmrMeta, AmrState
from peleanalysis_tpu.ops.dense_fill import fill_dense
from peleanalysis_tpu.ops.fillpatch import fill_grown
from peleanalysis_tpu.testing import eval_on_box


def linear_field():
    return {"f": lambda x, y, z: 1.5 * x - 2.0 * y + 3.0 * z + 0.125}


def make_two_level(fields, n=16, mgs=8, periodic=False):
    dom0 = Box((0, 0, 0), (n - 1, n - 1, n - 1))
    geom0 = Geometry(dom0, (0.0,) * 3, (1.0,) * 3, (periodic,) * 3)
    ba0 = decompose(dom0, mgs)
    geom1 = geom0.refine(2)
    sub = Box((8, 8, 8), (23, 23, 23))
    ba1 = decompose(sub, mgs)
    meta = AmrMeta([geom0, geom1], [ba0, ba1], [2])
    fabs = [[eval_on_box(b, g, fields) for b in ba]
            for g, ba in zip([geom0, geom1], [ba0, ba1])]
    st = AmrState.from_arrays(meta, list(fields), fabs, dtype=np.float64)
    return st


def test_dense_roundtrip(synthetic_plotfile):
    sp = synthetic_plotfile
    st = AmrState.from_plotfile(sp["path"], dtype=np.float64)
    ds = DenseAmrState.from_batched(st)
    back = ds.to_batched()
    for lev in range(st.meta.n_levels):
        np.testing.assert_array_equal(np.asarray(back.data[lev]),
                                      np.asarray(st.data[lev]))


def test_dense_fill_matches_gather_fill():
    st = make_two_level(linear_field())
    ds = DenseAmrState.from_batched(st)
    g = 2
    dense_grown = np.asarray(fill_dense(ds, 1, g))
    batched_grown = np.asarray(fill_grown(st, 1, g, interp="linear"))
    bbox = ds.lmeta[1].bbox
    for i, b in enumerate(st.meta.bas[1]):
        off = tuple(b.lo[d] - bbox.lo[d] for d in range(3))
        sl = tuple(slice(off[d], off[d] + b.shape[d] + 2 * g)
                   for d in range(3))
        got = dense_grown[(0,) + sl]
        want = batched_grown[i, 0][tuple(slice(0, b.shape[d] + 2 * g)
                                         for d in range(3))]
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_dense_fill_linear_exact():
    st = make_two_level(linear_field())
    ds = DenseAmrState.from_batched(st)
    g = 2
    grown = np.asarray(fill_dense(ds, 1, g))
    geom1 = st.meta.geoms[1]
    bbox = ds.lmeta[1].bbox.grow(g)
    fn = linear_field()["f"]
    cs = [geom1.prob_lo[d] + (np.arange(bbox.lo[d], bbox.hi[d] + 1) + 0.5)
          * geom1.dx[d] for d in range(3)]
    mesh = np.meshgrid(*cs, indexing="ij")
    want = fn(*mesh)
    # all ghost cells stay inside the domain here -> linear interp is exact
    np.testing.assert_allclose(grown[0], want, rtol=1e-12)


def test_dense_level0_periodic_fill():
    fields = {"f": lambda x, y, z: np.sin(2 * np.pi * x) + 0 * y + 0 * z}
    st = make_two_level(fields, periodic=True)
    ds = DenseAmrState.from_batched(st)
    g = 2
    grown = np.asarray(fill_dense(ds, 0, g))
    n = 16
    interior = np.asarray(ds.data[0][0])
    np.testing.assert_allclose(grown[0, :g, g:-g, g:-g],
                               interior[-g:, :, :], rtol=1e-13)
    np.testing.assert_allclose(grown[0, -g:, g:-g, g:-g],
                               interior[:g, :, :], rtol=1e-13)


def _edge_pair_state(periodic=(True, False, False)):
    """Two-level hierarchy whose FINE level touches both x faces, so fine
    ghost cells past a periodic x edge have fine-covered periodic images."""
    n = 16
    dom0 = Box((0, 0, 0), (n - 1, n - 1, n - 1))
    geom0 = Geometry(dom0, (0.0,) * 3, (1.0,) * 3, periodic)
    geom1 = geom0.refine(2)
    ba0 = decompose(dom0, 8)
    ba1 = BoxArray([Box((0, 8, 8), (7, 23, 23)),
                    Box((24, 8, 8), (31, 23, 23))])
    meta = AmrMeta([geom0, geom1], [ba0, ba1], [2])
    # NOT smooth across the wrap: a coarse interpolation cannot reproduce it
    fields = {"f": lambda x, y, z: np.sin(37.0 * x) * (1 + y) + z * z}
    fabs = [[eval_on_box(b, g, fields) for b in ba]
            for g, ba in zip([geom0, geom1], [ba0, ba1])]
    return AmrState.from_arrays(meta, list(fields), fabs, dtype=np.float64)


def test_dense_fill_fine_periodic_wrap_uses_same_level_data():
    """Fine-level ghosts past a periodic edge must take the SAME-LEVEL data
    at the periodic image when it is fine-covered (AMReX FillBoundary
    periodic copies precede coarse interpolation) — not a coarse interp."""
    st = _edge_pair_state()
    ds = DenseAmrState.from_batched(st)
    g = 2
    grown = np.asarray(fill_dense(ds, 1, g))  # covers bbox.grow(g)
    dense = np.asarray(ds.data[1])            # covers bbox x[0..31] yz[8..23]
    # ghost planes x=-2,-1 wrap to x=30,31; y,z restricted to the covered
    # band [8..23] -> grown index y - (8 - g)
    ys = slice(g, 16 + g)
    np.testing.assert_allclose(grown[0, 0, ys, ys], dense[0, 30],
                               rtol=0, atol=0)
    np.testing.assert_allclose(grown[0, 1, ys, ys], dense[0, 31],
                               rtol=0, atol=0)
    # hi side: x=32,33 wrap to 0,1
    np.testing.assert_allclose(grown[0, -2, ys, ys], dense[0, 0],
                               rtol=0, atol=0)
    np.testing.assert_allclose(grown[0, -1, ys, ys], dense[0, 1],
                               rtol=0, atol=0)


def test_dense_fill_matches_gather_fill_periodic_edges():
    """Dense and gather-plan fills agree on a layout whose fine level
    touches both sides of a periodic dim (2 levels: the coarse union spans
    the domain, so both engines' c-f interpolation sources coincide)."""
    st = _edge_pair_state()
    ds = DenseAmrState.from_batched(st)
    g = 1
    dense_grown = np.asarray(fill_dense(ds, 1, g))
    batched_grown = np.asarray(fill_grown(st, 1, g, interp="linear"))
    bbox = ds.lmeta[1].bbox
    for i, b in enumerate(st.meta.bas[1]):
        off = tuple(b.lo[d] - bbox.lo[d] for d in range(3))
        sl = tuple(slice(off[d], off[d] + b.shape[d] + 2 * g)
                   for d in range(3))
        np.testing.assert_allclose(
            dense_grown[(0,) + sl],
            batched_grown[i, 0][tuple(slice(0, b.shape[d] + 2 * g)
                                      for d in range(3))], rtol=1e-12)


def test_dense_masks(synthetic_plotfile):
    sp = synthetic_plotfile
    st = AmrState.from_plotfile(sp["path"], dtype=np.float64)
    ds = DenseAmrState.from_batched(st)
    # level 0: fully covered by boxes; covered_mask matches lev-1 footprint
    assert bool(np.all(np.asarray(ds.in_level_mask(0))))
    cov = np.asarray(ds.covered_mask(0))
    ba1c = st.meta.bas[1].coarsen(2)
    want = np.zeros_like(cov)
    for b in ba1c:
        want[tuple(slice(b.lo[d], b.hi[d] + 1) for d in range(3))] = True
    np.testing.assert_array_equal(cov, want)
    # composite cell counts: valid cells weighted by volume = domain volume
    tot = 0.0
    for lev in range(st.meta.n_levels):
        vol = st.meta.geoms[lev].cell_volume()
        tot += float(np.sum(np.asarray(ds.valid_mask(lev)))) * vol
    assert abs(tot - 1.0) < 1e-12


def test_quadratic_interp_exact_for_quadratic_field():
    """3-point c-f interpolation reproduces quadratics exactly, so centered
    gradients stay 2nd-order THROUGH the coarse-fine ring (the MLMG-grade
    accuracy upgrade; linear interp is O(h) there)."""
    fields = {"f": lambda x, y, z: x**2 + 2 * y**2 - z**2 + x * 0.5 - y}
    st = make_two_level_q(fields)
    ds = DenseAmrState.from_batched(st)
    g = 2
    grown = np.asarray(fill_dense(ds, 1, g, interp="quadratic"))
    geom1 = st.meta.geoms[1]
    bbox = ds.lmeta[1].bbox.grow(g)
    fn = fields["f"]
    cs = [geom1.prob_lo[d] + (np.arange(bbox.lo[d], bbox.hi[d] + 1) + 0.5)
          * geom1.dx[d] for d in range(3)]
    mesh = np.meshgrid(*cs, indexing="ij")
    want = fn(*mesh)
    # separable quadratic: exact for this (no cross terms beyond products
    # that the tensor-product stencil handles? x*y terms would also be exact
    # since tensor-product of linears) — pure quadratic field is exact
    np.testing.assert_allclose(grown[0], want, rtol=1e-11, atol=1e-12)


def test_grad_quadratic_cf_is_second_order():
    from peleanalysis_tpu.tools.grad import compute_grad_dense
    errs = {}
    for interp in ("linear", "quadratic"):
        fields = {"f": lambda x, y, z:
                  np.sin(2 * x) * np.cos(1.5 * y) + z**2}
        st = make_two_level_q(fields, n=32, mgs=16)
        ds = DenseAmrState.from_batched(st)
        out = compute_grad_dense(ds, "f", interp=interp)
        lev = 1
        geom = st.meta.geoms[lev]
        bbox = ds.lmeta[lev].bbox
        cs = [geom.prob_lo[d] + (np.arange(bbox.lo[d], bbox.hi[d] + 1) + 0.5)
              * geom.dx[d] for d in range(3)]
        X, Y, Z = np.meshgrid(*cs, indexing="ij")
        want_gx = 2 * np.cos(2 * X) * np.cos(1.5 * Y)
        got = np.asarray(out.data[lev][out.comp("f_gx")])
        errs[interp] = np.abs(got - want_gx).max()
    # quadratic c-f ghosts cut the ring error substantially
    assert errs["quadratic"] < 0.35 * errs["linear"]


def make_two_level_q(fields, n=16, mgs=8):
    """Two-level hierarchy with a centered half-width fine union (distinct
    from the module-level make_two_level, which this must not shadow)."""
    from peleanalysis_tpu.amr.box import Box, decompose
    from peleanalysis_tpu.amr.geometry import Geometry
    dom0 = Box((0, 0, 0), (n - 1, n - 1, n - 1))
    geom0 = Geometry(dom0, (0.0,) * 3, (1.0,) * 3, (False,) * 3)
    ba0 = decompose(dom0, mgs)
    geom1 = geom0.refine(2)
    q = n // 2
    ba1 = decompose(Box((q, q, q), (3 * q - 1, 3 * q - 1, 3 * q - 1)), mgs)
    meta = AmrMeta([geom0, geom1], [ba0, ba1], [2])
    fabs = [[eval_on_box(b, g, fields) for b in ba]
            for g, ba in zip([geom0, geom1], [ba0, ba1])]
    return AmrState.from_arrays(meta, list(fields), fabs, dtype=np.float64)


def test_ratio4_fill_and_grad():
    """ref_ratio=4 hierarchies (used by some Pele runs): linear upsample
    phases and fills must stay exact for linear fields."""
    from peleanalysis_tpu.tools.grad import compute_grad_dense
    fields = {"f": lambda x, y, z: 2 * x - y + 0.5 * z}
    dom0 = Box((0, 0, 0), (15, 15, 15))
    geom0 = Geometry(dom0, (0.0,) * 3, (1.0,) * 3, (False,) * 3)
    ba0 = decompose(dom0, 8)
    geom1 = geom0.refine(4)
    ba1 = decompose(Box((16, 16, 16), (47, 47, 47)), 16)
    meta = AmrMeta([geom0, geom1], [ba0, ba1], [4])
    fabs = [[eval_on_box(b, g, fields) for b in ba]
            for g, ba in zip([geom0, geom1], [ba0, ba1])]
    st = AmrState.from_arrays(meta, ["f"], fabs, dtype=np.float64)
    ds = DenseAmrState.from_batched(st)
    grown = np.asarray(fill_dense(ds, 1, 2, interp="linear"))
    bbox = ds.lmeta[1].bbox.grow(2)
    cs = [geom1.prob_lo[d] + (np.arange(bbox.lo[d], bbox.hi[d] + 1) + 0.5)
          * geom1.dx[d] for d in range(3)]
    mesh = np.meshgrid(*cs, indexing="ij")
    np.testing.assert_allclose(grown[0], fields["f"](*mesh), rtol=1e-12)
    out = compute_grad_dense(ds, "f")
    inner = (slice(2, -2),) * 3
    np.testing.assert_allclose(
        np.asarray(out.data[1][out.comp("f_gx")])[inner], 2.0, atol=1e-10)
    # conditionalMean weights for r=4
    from peleanalysis_tpu.tools.conditional_mean import refinement_weights
    assert refinement_weights([4], 2) == [64, 1]
