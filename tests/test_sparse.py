"""Sparse-refinement memory scaling (r1 verdict gap #1): a hierarchy whose
finest level covers a few % of the domain in scattered regions must run
grad + isosurface with a footprint proportional to VALID cells, not the
union bounding box (the reference gets this from per-rank box ownership,
Src/grad.cpp:160-163; here from dense clusters, amr/cluster.py)."""
import numpy as np
import pytest

from peleanalysis_tpu.amr.box import Box, BoxArray
from peleanalysis_tpu.amr.cluster import (cluster_boxes,
                                          connected_components,
                                          needs_clustering)
from peleanalysis_tpu.amr.dense import DenseAmrState
from peleanalysis_tpu.amr.geometry import Geometry
from peleanalysis_tpu.amr.hierarchy import AmrMeta, AmrState
from peleanalysis_tpu.geom.marching_cubes import (extract_isosurface,
                                                  extract_isosurface_sparse,
                                                  _cluster_substates)
from peleanalysis_tpu.testing import make_level_data


def _blob(x, y, z):
    r1 = np.sqrt((x - .25) ** 2 + (y - .25) ** 2 + (z - .25) ** 2)
    r2 = np.sqrt((x - .75) ** 2 + (y - .75) ** 2 + (z - .75) ** 2)
    return np.exp(-(r1 / 0.06) ** 2) + np.exp(-(r2 / 0.06) ** 2)


def _box_at(n, c, half):
    return Box(tuple(int((ci - half) * n) for ci in c),
               tuple(int((ci + half) * n) - 1 for ci in c))


@pytest.fixture(scope="module")
def sparse_state():
    """3 levels; the finest covers <3% of the domain in two far regions."""
    n0 = 48
    dom0 = Box((0, 0, 0), (n0 - 1,) * 3)
    geom0 = Geometry(dom0, (0., 0., 0.), (1., 1., 1.), (False,) * 3)
    geoms = [geom0, geom0.refine(2), geom0.refine(2).refine(2)]
    ba0 = BoxArray([dom0])
    # finest bbox must exceed needs_clustering's min_cells (1<<21) so the
    # CLI sparse gates actually fire in the routing tests below (a 127^3
    # bbox silently fell under the gate and compared dense vs dense)
    ba1 = BoxArray([_box_at(96, (.2,) * 3, .13), _box_at(96, (.8,) * 3, .13)])
    ba2 = BoxArray([_box_at(192, (.2,) * 3, .09), _box_at(192, (.8,) * 3, .09)])
    meta = AmrMeta(geoms, [ba0, ba1, ba2], [2, 2])
    names, data = make_level_data(geoms, [ba0, ba1, ba2],
                              {"blob": _blob,
                               "xc": lambda x, y, z: x})
    return AmrState.from_arrays(meta, names, data, dtype=np.float64)


def _canon(m):
    n = np.round(m.nodes, 9)
    order = np.lexsort(n.T[::-1])
    rank = np.empty(len(n), np.int64)
    rank[order] = np.arange(len(n))
    tris = np.sort(rank[m.elements], axis=1)
    return n[order], tris[np.lexsort(tris.T[::-1])]


def test_clustering_basics(sparse_state):
    ba2 = sparse_state.meta.bas[2]
    assert needs_clustering(ba2, min_cells=1 << 14)
    comps = connected_components(ba2)
    assert len(comps) == 2
    groups = cluster_boxes(ba2)
    assert len(groups) == 2
    assert sorted(i for g in groups for i in g) == list(range(len(ba2)))


def test_sparse_footprint(sparse_state):
    subs, _ = _cluster_substates(sparse_state)
    dense_bbox = sparse_state.meta.bas[2].minimal_box().size
    cluster_cells = sum(s.lmeta[2].bbox.size for s in subs)
    valid = sparse_state.meta.bas[2].total_cells()
    # footprint ~ valid cells (here exactly: clusters are the box regions)
    assert cluster_cells == valid
    assert cluster_cells < 0.05 * dense_bbox


def test_sparse_isosurface_parity(sparse_state):
    ds = DenseAmrState.from_batched(sparse_state)
    for iso in (0.5, 0.05):     # inside fine region / crossing both seams
        m_ref = extract_isosurface(ds, "blob", iso, classify="enum")
        m_sp = extract_isosurface_sparse(sparse_state, "blob", iso)
        assert len(m_ref.nodes) == len(m_sp.nodes) > 100
        assert len(m_ref.elements) == len(m_sp.elements)
        n1, t1 = _canon(m_ref)
        n2, t2 = _canon(m_sp)
        np.testing.assert_allclose(n1, n2, atol=1e-12)
        np.testing.assert_array_equal(t1, t2)


def test_sparse_grad_routes_batched(sparse_state, capsys):
    """The grad CLI path must route sparse hierarchies through the
    batched-box model (footprint ~ boxes) and match the dense output."""
    from peleanalysis_tpu.tools.grad import compute_grad, compute_grad_dense

    out_b = compute_grad(sparse_state, "blob")
    ds = DenseAmrState.from_batched(sparse_state)
    out_d = compute_grad_dense(ds, "blob")
    meta = sparse_state.meta
    for lev in range(meta.n_levels):
        bbox = ds.lmeta[lev].bbox
        dense = np.asarray(out_d.data[lev])
        batched = np.asarray(out_b.data[lev])
        for i, b in enumerate(meta.bas[lev]):
            sl_d = tuple(slice(b.lo[d] - bbox.lo[d],
                               b.hi[d] - bbox.lo[d] + 1) for d in range(3))
            sl_b = tuple(slice(0, s) for s in b.shape)
            np.testing.assert_allclose(
                dense[(4,) + sl_d], batched[(i, 4) + sl_b],
                rtol=1e-10, atol=1e-12)


def test_sparse_cli_grad_iso(sparse_state, tmp_path, monkeypatch):
    """End-to-end CLI: both tools detect the sparse hierarchy and route to
    the scalable paths; outputs parse and are sane."""
    from peleanalysis_tpu.cli import main
    from peleanalysis_tpu.io.mef import read_mef

    plt = str(tmp_path / "plt_sparse")
    sparse_state.to_plotfile(plt)
    monkeypatch.chdir(tmp_path)
    rc = main(["grad", f"infile={plt}", "gradVar=blob", "outfile=plt_g"])
    assert rc == 0
    g = AmrState.from_plotfile("plt_g")
    assert "||gradblob||" in g.names
    rc = main(["isosurface", f"infile={plt}", "isoCompName=blob",
               "isoVal=0.5", "outfile_base=surf_sp"])
    assert rc == 0
    m = read_mef("surf_sp.mef")
    assert m.n_elts > 100
    # both blobs present: nodes near r=0.05 of both centers
    pos = m.positions()
    r1 = np.linalg.norm(pos - 0.25, axis=1)
    r2 = np.linalg.norm(pos - 0.75, axis=1)
    assert (r1 < 0.08).any() and (r2 < 0.08).any()


def test_sparse_stats_parity(sparse_state, tmp_path, monkeypatch):
    """conditionalMean / jpdf on the clustered path must reproduce the
    dense-path numbers exactly (coarse part once with the global covered
    mask + per-cluster fine parts; weight rescale ratio^ndim)."""
    from peleanalysis_tpu.cli import main

    plt = str(tmp_path / "plt_sp")
    sparse_state.to_plotfile(plt)
    monkeypatch.chdir(tmp_path)
    for mode, outf in (([], "cm_sparse.dat"),
                       (["force_dense=1"], "cm_dense.dat")):
        rc = main(["conditionalMean", f"infile={plt}", "binComp=blob",
                   "avgComps=blob", "nBins=8", "binMin=0", "binMax=1",
                   "dtype=float64", f"outfile={outf}"] + mode)
        assert rc == 0
    a = np.loadtxt("cm_sparse.dat", skiprows=2)
    b = np.loadtxt("cm_dense.dat", skiprows=2)
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(a[:, -2], b[:, -2])   # N exact

    for mode, suf in (([], "_sp"), (["force_dense=1"], "_dn")):
        rc = main(["jpdf", f"infile={plt}", "vars=blob xc", "nBins=8",
                   "output_gnuplot=1", "output_plotfile=0",
                   "dtype=float64", f"outSuffix={suf}"] + mode)
        assert rc == 0
    ga = np.loadtxt(plt + "_sp/Pdf_blob_xc.gpd")
    gb = np.loadtxt(plt + "_dn/Pdf_blob_xc.gpd")
    np.testing.assert_allclose(ga, gb, rtol=1e-9, atol=1e-12)


def test_sparse_stats_bounds_parity(sparse_state, tmp_path, monkeypatch,
                                    capsys):
    """bounds= on the clustered path == force_dense=1 with the same bounds:
    the sub-box is snapped to TRUE level-0 faces before the parts see it
    (the cluster parts' own 'level 0' is the fine geometry, so naive
    rounding there selected different cells — r2 review finding)."""
    from peleanalysis_tpu.cli import main

    plt = str(tmp_path / "plt_spb")
    sparse_state.to_plotfile(plt)
    monkeypatch.chdir(tmp_path)
    # deliberately NOT aligned to any cell face
    bounds = "bounds=0.2137 0.0 0.0 0.7913 1.0 1.0"
    for mode, outf in (([], "cmb_sparse.dat"),
                       (["force_dense=1"], "cmb_dense.dat")):
        rc = main(["conditionalMean", f"infile={plt}", "binComp=blob",
                   "avgComps=xc", "nBins=8", "binMin=0", "binMax=1",
                   "dtype=float64", bounds, f"outfile={outf}"] + mode)
        assert rc == 0
        seen = capsys.readouterr().out
        assert ("clustered path" in seen) == (not mode)
    a = np.loadtxt("cmb_sparse.dat", skiprows=2)
    b = np.loadtxt("cmb_dense.dat", skiprows=2)
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(a[:, -2], b[:, -2])
    # and the box actually bites: differs from the unbounded run
    rc = main(["conditionalMean", f"infile={plt}", "binComp=blob",
               "avgComps=xc", "nBins=8", "binMin=0", "binMax=1",
               "outfile=cmb_all.dat"])
    assert rc == 0
    c = np.loadtxt("cmb_all.dat", skiprows=2)
    assert not np.allclose(a, c)


def test_sparse_curvature_clustered_matches_dense(sparse_state, tmp_path,
                                                  monkeypatch, capsys):
    """curvature (no smoothing: pure 1-ghost stencils) on the clustered
    path == force_dense=1 on every cell of every output comp."""
    from peleanalysis_tpu.cli import main
    from peleanalysis_tpu.amr.hierarchy import AmrState

    plt = str(tmp_path / "plt_spc")
    sparse_state.to_plotfile(plt)
    monkeypatch.chdir(tmp_path)
    for mode, outf in (([], "Kc"), (["force_dense=1"], "Kd")):
        rc = main(["curvature", f"infile={plt}", "progressName=blob",
                   "do_gaussCurv=1", "Aux_Variables=xc",
                   f"outfile={outf}"] + mode)
        assert rc == 0
        seen = capsys.readouterr().out
        # the gate must actually route (this fixture sat under min_cells
        # once, silently comparing dense vs dense)
        assert ("clustered path" in seen) == (not mode)
    a = AmrState.from_plotfile("Kc", dtype=np.float64)
    b = AmrState.from_plotfile("Kd", dtype=np.float64)
    assert a.names == b.names
    for lev in range(a.meta.n_levels):
        da, db = np.asarray(a.data[lev]), np.asarray(b.data[lev])
        # holes carry NaN/inf in both outputs; infs must match exactly
        np.testing.assert_allclose(da, db, rtol=1e-12, atol=0,
                                   equal_nan=True,
                                   err_msg=f"lev {lev} mismatch")


def test_sparse_stream_clustered_matches_dense(sparse_state, tmp_path,
                                               monkeypatch):
    """trace_streamlines_sparse == the dense union-bbox trace for seeds on
    coarse levels, on each cluster, and marching beyond cluster bounds."""
    from peleanalysis_tpu.amr.dense import DenseAmrState
    from peleanalysis_tpu.stream.trace import (trace_streamlines,
                                               trace_streamlines_sparse)

    # gradient tracing up the blob field; seeds near both fine regions
    rng = np.random.default_rng(5)
    seeds = np.concatenate([
        0.25 + 0.1 * (rng.random((8, 3)) - 0.5),   # cluster 1
        0.75 + 0.1 * (rng.random((8, 3)) - 0.5),   # cluster 2
        np.stack([rng.uniform(0.4, 0.6, 8)] * 3, axis=1),  # coarse middle
    ])
    dense = DenseAmrState.from_batched(sparse_state)
    ref = trace_streamlines(dense, seeds, 11, 0.5, trace_field="blob",
                            sample_names=("xc",))
    got = trace_streamlines_sparse(sparse_state, seeds, 11, 0.5,
                                   trace_field="blob",
                                   sample_names=("xc",))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_sparse_sample_streamlines_matches_dense(sparse_state):
    from peleanalysis_tpu.amr.dense import DenseAmrState
    from peleanalysis_tpu.stream.trace import trace_streamlines
    from peleanalysis_tpu.tools.sample_streamlines import (
        sample_onto_lines, sample_onto_lines_sparse)

    rng = np.random.default_rng(7)
    seeds = np.concatenate([
        0.25 + 0.08 * (rng.random((6, 3)) - 0.5),
        0.75 + 0.08 * (rng.random((6, 3)) - 0.5),
        np.stack([rng.uniform(0.45, 0.55, 6)] * 3, axis=1),
    ])
    dense = DenseAmrState.from_batched(sparse_state)
    lines = trace_streamlines(dense, seeds, 9, 0.5, trace_field="blob")
    a = sample_onto_lines(dense, lines, ["xc", "blob"])
    b = sample_onto_lines_sparse(sparse_state, lines, ["xc", "blob"])
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_sparse_stats_parts_bucket_pad():
    """Unequal cluster extents pad to ONE bucket shape (stats jits key on
    array shapes: equal shapes share one compiled contraction), and the
    padded parts accumulate exactly the same statistic."""
    from peleanalysis_tpu.amr.cluster import sparse_stats_parts
    from peleanalysis_tpu.amr.dense import DenseAmrState
    from peleanalysis_tpu.tools.conditional_mean import (
        accumulate_conditional_mean)

    n0 = 48
    dom0 = Box((0, 0, 0), (n0 - 1,) * 3)
    geom0 = Geometry(dom0, (0., 0., 0.), (1., 1., 1.), (False,) * 3)
    geoms = [geom0, geom0.refine(2), geom0.refine(2).refine(2)]
    # deliberately UNEQUAL cluster extents
    ba1 = BoxArray([_box_at(96, (.2,) * 3, .13), _box_at(96, (.8,) * 3, .1)])
    ba2 = BoxArray([_box_at(192, (.2,) * 3, .09), _box_at(192, (.8,) * 3, .06)])
    meta = AmrMeta(geoms, [BoxArray([dom0]), ba1, ba2], [2, 2])
    names, data = make_level_data(geoms, [BoxArray([dom0]), ba1, ba2],
                                  {"blob": _blob, "xc": lambda x, y, z: x})
    st = AmrState.from_arrays(meta, names, data, dtype=np.float64)
    ds_c, clusters, r = sparse_stats_parts(st)
    shp = {tuple(c.lmeta[0].bbox.shape) for c in clusters}
    assert len(shp) == 1, f"cluster parts not bucket-padded: {shp}"
    # padded accumulation == dense accumulation
    dense = DenseAmrState.from_batched(st)
    h_ref, s_ref, s2_ref, _, _ = accumulate_conditional_mean(
        dense, "blob", ["xc"], 32, 0.0, 1.0)
    h = s = s2 = 0.0
    parts = [(ds_c, float(r ** 3))] + [(c, 1.0) for c in clusters]
    for ds, scale in parts:
        hh, ss, ss2, _, _ = accumulate_conditional_mean(
            ds, "blob", ["xc"], 32, 0.0, 1.0)
        h = h + scale * hh
        s = s + scale * ss
        s2 = s2 + scale * ss2
    np.testing.assert_allclose(h, h_ref, rtol=1e-12)
    np.testing.assert_allclose(s, s_ref, rtol=1e-9, atol=1e-12)
