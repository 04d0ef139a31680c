"""Randomized sparse==dense parity fuzz for the canonical cluster frames.

Random scattered fine layouts — interior, face-, edge-, and corner-adjacent
clusters, random extents, ratio 2 and 4 — must produce EXACTLY the dense
run's answers through the canonical path (pinned/anchored boundary frames,
amr/canonical.py).  This is the broad-coverage net behind the targeted
cases in test_canonical.py; the reference gets the equivalent guarantee
from per-box ownership (/root/reference/Src/grad.cpp:160-163 + MFIter).
"""
import numpy as np
import pytest

from peleanalysis_tpu.amr.box import Box, BoxArray
from peleanalysis_tpu.amr.dense import DenseAmrState
from peleanalysis_tpu.amr.geometry import Geometry
from peleanalysis_tpu.amr.hierarchy import AmrMeta, AmrState
from peleanalysis_tpu.testing import make_level_data


def _random_state(seed, ratio):
    """Random scattered 2-level hierarchy; boxes may hug any domain face."""
    rng = np.random.default_rng(seed)
    n0 = 24 if ratio == 2 else 16
    nf = n0 * ratio
    dom0 = Box((0, 0, 0), (n0 - 1,) * 3)
    geom0 = Geometry(dom0, (0., 0., 0.), (1., 1., 1.), (False,) * 3)
    geoms = [geom0, geom0.refine(ratio)]
    boxes = []
    # up to 3 well-separated clusters at random (possibly boundary) spots
    anchors = rng.permutation([(0, 0, 0), (1, 1, 1), (2, 0, 2),
                               (0, 2, 1), (2, 2, 2), (1, 0, 0)])[:3]
    for a in anchors:
        ext = int(rng.integers(4, 9)) * ratio // 2
        lo = []
        for d in range(3):
            third = nf // 3
            base = a[d] * third
            # bias toward the domain edges so pinning paths fire often
            if a[d] == 0 and rng.random() < 0.5:
                lo.append(0)
            elif a[d] == 2 and rng.random() < 0.5:
                lo.append(nf - ext)
            else:
                lo.append(int(rng.integers(base, base + third - ext)))
        lo = [(v // ratio) * ratio for v in lo]
        boxes.append(Box(tuple(lo), tuple(v + ext - 1 for v in lo)))
    ba1 = BoxArray(boxes)
    meta = AmrMeta(geoms, [BoxArray([dom0]), ba1], [ratio])
    names, data = make_level_data(
        geoms, meta.bas,
        {"temp": lambda x, y, z: 300 + 1500 * (
            np.exp(-((x - .3) ** 2 + (y - .4) ** 2 + (z - .3) ** 2) / .02)
            + np.exp(-((x - .7) ** 2 + (y - .6) ** 2
                       + (z - .8) ** 2) / .02)) + 10 * x + 5 * y * z})
    return AmrState.from_arrays(meta, names, data, dtype=np.float64), ba1


@pytest.mark.parametrize("seed,ratio", [(0, 2), (1, 2), (2, 4), (3, 2),
                                        (4, 4), (5, 2)])
def test_fuzz_sparse_grad_iso_match_dense(seed, ratio):
    from peleanalysis_tpu.amr.canonical import (canonical_cluster_substates,
                                                global_frame)
    from peleanalysis_tpu.geom import marching_cubes as mc
    from peleanalysis_tpu.tools.grad import compute_grad_dense

    st, ba1 = _random_state(seed, ratio)
    ds = DenseAmrState.from_batched(st)

    # --- grad: every cluster, every box, exact ---------------------------
    ref = compute_grad_dense(ds, "temp", interp="quadratic")
    groups, subs, _, infos = canonical_cluster_substates(
        st, ngrow_max=1, interp_stencil=1)
    assert all(i.canonical for i in infos)   # non-periodic: all canonical
    rb = ref.lmeta[1].bbox
    boxes = list(ba1)
    c = ref.comp("||gradtemp||")
    for g, sub, info in zip(groups, subs, infos):
        out = global_frame(compute_grad_dense(sub, "temp",
                                              interp="quadratic"), info)
        wb = out.lmeta[1].bbox
        co = out.comp("||gradtemp||")
        for bi in g:
            bx = boxes[bi]
            slw = tuple(slice(bx.lo[d] - wb.lo[d], bx.hi[d] - wb.lo[d] + 1)
                        for d in range(3))
            slr = tuple(slice(bx.lo[d] - rb.lo[d], bx.hi[d] - rb.lo[d] + 1)
                        for d in range(3))
            a = np.asarray(out.data[1][co])[slw]
            b = np.asarray(ref.data[1][c])[slr]
            np.testing.assert_allclose(a, b, atol=1e-12,
                                       err_msg=f"seed={seed} box={bi}")

    # --- isosurface: node/element set equality ---------------------------
    m_ref = mc.extract_isosurface(ds, "temp", 800.0, classify="enum")
    m_sp = mc.extract_isosurface_sparse(st, "temp", 800.0)
    assert m_sp.n_nodes == m_ref.n_nodes

    def canon(m):
        n = np.asarray(m.nodes)
        e = np.asarray(m.elements)
        order = np.lexsort(n.T[::-1])
        inv = np.empty(len(n), np.int64)
        inv[order] = np.arange(len(n))
        tri = np.sort(inv[e - 1], axis=1)
        return n[order], tri[np.lexsort(tri.T[::-1])]

    n1, t1 = canon(m_ref)
    n2, t2 = canon(m_sp)
    np.testing.assert_allclose(n1, n2, atol=1e-12)
    np.testing.assert_array_equal(t1, t2)
