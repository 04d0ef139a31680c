"""Padded level-0 semantics (shape buckets / mesh sharding).

pad_state_to grows level-0 bboxes past the physical domain; every fill must
then grow from the TRUE domain edge so pad positions carry exact BC/wrap
values (ops/dense_fill._grow_level0).  Covers the r3 advisor medium finding
(stream/curvature crashed on bucketed states) and VERDICT r3 #8 (periodic
non-divisible level-0 dims are padded, not replicated).  Reference model:
any BoxArray decomposes over any rank count, /root/reference/Src/grad.cpp:160-163.
"""
import numpy as np

from peleanalysis_tpu.amr.box import Box, BoxArray
from peleanalysis_tpu.amr.dense import DenseAmrState
from peleanalysis_tpu.amr.geometry import Geometry
from peleanalysis_tpu.amr.hierarchy import AmrMeta, AmrState
from peleanalysis_tpu.parallel.dense_shard import (make_spatial_mesh,
                                                   pad_state_to,
                                                   shard_dense_state)
from peleanalysis_tpu.testing import make_level_data


def _two_level(nx=32, ny=32, nz=32, periodic=(False,) * 3, fields=None,
               prob_hi=(1., 1., 1.), fine=((8, 8, 8), (23, 23, 23))):
    dom0 = Box((0, 0, 0), (nx - 1, ny - 1, nz - 1))
    geom0 = Geometry(dom0, (0., 0., 0.), prob_hi, tuple(periodic))
    geoms = [geom0, geom0.refine(2)]
    bas = [BoxArray([dom0]), BoxArray([Box(*fine)])]
    meta = AmrMeta(geoms, bas, [2])
    if fields is None:
        fields = {"temp": lambda x, y, z: 300 + 1500 * np.exp(
            -((x - .5) ** 2 + (y - .5) ** 2 + (z - .5) ** 2) / 0.15 ** 2)}
    names, data = make_level_data(geoms, bas, fields)
    return DenseAmrState.from_batched(
        AmrState.from_arrays(meta, names, data, dtype=np.float64))


def test_stream_on_bucketed_state():
    """Advisor r3 medium: trace_streamlines on a shape-bucketed state (level
    0 padded to a non-divisor granule) must run and match the unpadded run
    (fill_dense_arrays used to raise 'level 0 must cover the domain')."""
    from peleanalysis_tpu.stream.trace import trace_streamlines

    fields = {
        "x_velocity": lambda x, y, z: -(y - 0.5),
        "y_velocity": lambda x, y, z: (x - 0.5),
        "z_velocity": lambda x, y, z: 0.05 + 0.0 * z,
    }
    ds = _two_level(16, 16, 16, fields=fields,
                    fine=((4, 4, 4), (11, 11, 11)))
    pa = pad_state_to(ds, (6, 6, 6))
    assert pa.data[0].shape[1] == 18        # padded past the 16-wide domain
    seeds = np.array([[0.65, 0.5, 0.5], [0.5, 0.3, 0.45]])
    ref = trace_streamlines(ds, seeds, 21, 0.5, trace_field=None)
    out = trace_streamlines(pa, seeds, 21, 0.5, trace_field=None)
    np.testing.assert_allclose(out, ref, atol=1e-12)


def test_curvature_smooth_on_bucketed_state():
    """The non-composite curvature smooth path also calls fill_dense_arrays
    at level 0 (second advisor repro)."""
    from peleanalysis_tpu.tools.curvature import compute_curvature_dense

    ds = _two_level(16, 16, 16, fine=((4, 4, 4), (11, 11, 11)))
    pa = pad_state_to(ds, (6, 6, 6))
    ref = compute_curvature_dense(ds, "temp", do_smooth=True,
                                  smooth_composite=False)
    out = compute_curvature_dense(pa, "temp", do_smooth=True,
                                  smooth_composite=False)
    for lev in range(2):
        a = np.asarray(ref.data[lev])
        b = np.asarray(out.data[lev])[:, :a.shape[1], :a.shape[2],
                                      :a.shape[3]]
        m = np.asarray(ds.valid_mask(lev))
        for c in range(a.shape[0]):
            np.testing.assert_allclose(b[c][m], a[c][m], atol=1e-9)


def test_fill_padded_lev0_periodic_exact():
    """Periodic non-divisible level 0: pad positions and ghost layers get
    true wrap values computed from the real domain edge at fill time."""
    from peleanalysis_tpu.ops.dense_fill import fill_dense

    fields = {"temp": lambda x, y, z: (
        300 + 50 * np.sin(2 * np.pi * x / 1.125) * np.cos(2 * np.pi * y)
        + 20 * np.cos(2 * np.pi * z))}
    ds = _two_level(36, 32, 32, periodic=(True,) * 3,
                    prob_hi=(1.125, 1., 1.), fine=((16, 8, 8), (31, 23, 23)))
    pa = pad_state_to(ds, (8, 8, 8))
    assert pa.data[0].shape[1:] == (40, 32, 32)
    g = 2
    ref = np.asarray(fill_dense(ds, 0, g))          # covers [-2, 37]
    out = np.asarray(fill_dense(pa, 0, g))          # covers [-2, 41]
    np.testing.assert_allclose(out[:, :ref.shape[1]], ref, atol=0)
    # the wrap values really wrap: ghost at x=-1 equals interior x=35
    np.testing.assert_allclose(out[:, g - 1, g:-g, g:-g],
                               out[:, g + 35, g:-g, g:-g], atol=0)


def test_fill_padded_lev0_reflect_exact():
    """Non-foextrap BCs on a padded side: positions beyond the domain within
    ngrow of a real cell must carry the true reflected values, not edge
    copies of edge copies."""
    from peleanalysis_tpu.ops.dense_fill import fill_dense
    from peleanalysis_tpu.ops.fill import REFLECT_EVEN

    ds = _two_level(20, 16, 16, fine=((4, 4, 4), (11, 11, 11)))
    pa = pad_state_to(ds, (8, 8, 8))
    assert pa.data[0].shape[1] == 24
    bc = tuple(((REFLECT_EVEN, REFLECT_EVEN),) * 3)
    g = 2
    ref = np.asarray(fill_dense(ds, 0, g, bc=bc))
    out = np.asarray(fill_dense(pa, 0, g, bc=bc))
    np.testing.assert_allclose(out[:, :ref.shape[1]], ref, atol=0)
    # reflected ghost beyond the REAL hi edge (x=20 mirrors x=19)
    np.testing.assert_allclose(out[:, g + 20], out[:, g + 19], atol=0)


def test_sharded_grad_periodic_nondivisible_lev0():
    """VERDICT r3 #8 done criterion: a periodic level 0 that does not divide
    the 8-device mesh is PADDED (sharded), and sharded grad == unsharded."""
    from peleanalysis_tpu.tools.grad import compute_grad_dense

    fields = {"temp": lambda x, y, z: (
        300 + 50 * np.sin(2 * np.pi * x / 1.125) * np.cos(2 * np.pi * y))}
    ds = _two_level(36, 32, 32, periodic=(True,) * 3,
                    prob_hi=(1.125, 1., 1.), fine=((16, 8, 8), (31, 23, 23)))
    ref = compute_grad_dense(ds, "temp")
    mesh = make_spatial_mesh(8)
    shs = shard_dense_state(ds, mesh)
    assert shs.data[0].shape[1] == 40            # padded, NOT replicated
    assert len(shs.data[0].sharding.device_set) == 8
    out = compute_grad_dense(shs, "temp")
    for lev in range(2):
        a = np.asarray(ref.data[lev])
        b = np.asarray(out.data[lev])[:, :a.shape[1], :a.shape[2],
                                      :a.shape[3]]
        m = np.asarray(ds.valid_mask(lev))
        for c in range(1, a.shape[0]):
            rel = (np.abs(a[c][m] - b[c][m]).max()
                   / max(np.abs(a[c][m]).max(), 1e-30))
            assert rel < 1e-12, (lev, c, rel)

def test_enum_iso_padded_periodic_lev0_exact():
    """Enum isosurface on a bucket-padded PERIODIC level 0: seam nodes must
    fold exactly as unpadded (the span gate accepts lo-aligned padded
    bboxes; pad slots carry wrap values and unwrap as periodic images)."""
    from peleanalysis_tpu.geom import marching_cubes as mc
    from peleanalysis_tpu.parallel.dense_shard import pad_state_to

    def fld(x, y, z):
        dx_ = np.minimum(np.abs(x - 0.0), np.abs(x - 1.125))  # seam blob
        return np.exp(-(dx_ ** 2 + (y - .5) ** 2 + (z - .5) ** 2) / 0.02)

    def canon(m):
        n = np.round(m.nodes, 9)
        order = np.lexsort(n.T[::-1])
        rank = np.empty(len(n), np.int64)
        rank[order] = np.arange(len(n))
        tris = np.sort(rank[m.elements], axis=1)
        return n[order], tris[np.lexsort(tris.T[::-1])]

    ds = _two_level(36, 32, 32, periodic=(True,) * 3, fields={"blob": fld})
    m_ref = mc.extract_isosurface(ds, "blob", 0.5, classify="enum")
    dsp = pad_state_to(
        _two_level(36, 32, 32, periodic=(True,) * 3, fields={"blob": fld}),
        (8, 8, 8))
    m_pad = mc.extract_isosurface(dsp, "blob", 0.5, classify="enum")
    assert len(m_ref.nodes) == len(m_pad.nodes) > 100
    n1, t1 = canon(m_ref)
    n2, t2 = canon(m_pad)
    np.testing.assert_allclose(n1, n2, atol=1e-12)
    np.testing.assert_array_equal(t1, t2)


def test_wide_wrap_pad_exceeds_domain_extent():
    """Bucket pads can exceed a small periodic level-0 extent (12 wide,
    bucket 32 -> pad 20): the wrap ghosts then wind around the domain more
    than once, which a single slice would silently CLIP (review finding) —
    the mod-index gather must reproduce the unpadded run exactly."""
    from peleanalysis_tpu.parallel.dense_shard import pad_state_to
    from peleanalysis_tpu.tools.grad import compute_grad_dense

    mk = lambda: _two_level(12, 12, 12, periodic=(True,) * 3,
                            fine=((6, 6, 6), (17, 17, 17)))
    ds = mk()
    ref = compute_grad_dense(ds, "temp")
    pad = compute_grad_dense(pad_state_to(mk(), (32, 32, 32)), "temp")
    for lev in range(2):
        a = np.asarray(ref.data[lev])
        b = np.asarray(pad.data[lev])[:, :a.shape[1], :a.shape[2],
                                      :a.shape[3]]
        m = np.asarray(ds.valid_mask(lev))
        for c in range(1, a.shape[0]):
            rel = (np.abs(a[c][m] - b[c][m]).max()
                   / max(np.abs(a[c][m]).max(), 1e-30))
            assert rel < 1e-12, (lev, c, rel)


def test_reflect_bc_wide_ghost_raises():
    """Non-periodic reflect BCs cannot synthesize ghosts wider than the
    domain — must raise a named error, not silently clip."""
    import jax.numpy as jnp
    import pytest
    from peleanalysis_tpu.ops.dense_fill import _grow_axis_asym

    a = jnp.ones((4, 4, 4))
    with pytest.raises(ValueError, match="reflect"):
        _grow_axis_asym(a, 0, 0, 6, "reflect_even", "reflect_even", False)
