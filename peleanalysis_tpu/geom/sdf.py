"""Signed-distance fields from triangulated surfaces — the SDFGen
replacement (/root/reference/Tools/SDFGen/makelevelset3.{h,cpp}, vendored
from christopherbatty/SDFGen; used per-box by isosurface.cpp:1595-1654 and
buildDistance.cpp).

Same algorithmic skeleton, re-implemented vectorized:
  1. exact point-triangle distances seeded in a band around each triangle
     (makelevelset3.cpp:20-41 exact_band)
  2. eight directional fast sweeps propagating closest-triangle ids, with
     exact re-evaluation against the propagated triangle
     (makelevelset3.cpp:58-81,163-172)
  3. sign via per-x-row triangle-crossing parity counts
     (makelevelset3.cpp:84-99,125-186) — or overridden by field<isoVal like
     the isosurface tool does (isosurface.cpp:1644)
  4. distances clamped to ±dmax (isosurface.cpp:1614-1646)
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import numpy as np


def point_tri_distance(p: np.ndarray, a: np.ndarray, b: np.ndarray,
                       c: np.ndarray, xp=np) -> np.ndarray:
    """Exact unsigned distance from points p[...,3] to triangles a/b/c[...,3]
    (broadcasting).  Standard region-based closest-point computation.
    Pass xp=jax.numpy to run the same math on device."""
    np = xp  # noqa: shadowing on purpose — one source for host and device
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = np.sum(ab * ap, -1)
    d2 = np.sum(ac * ap, -1)
    bp = p - b
    d3 = np.sum(ab * bp, -1)
    d4 = np.sum(ac * bp, -1)
    cp = p - c
    d5 = np.sum(ab * cp, -1)
    d6 = np.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = np.where(np.abs(va + vb + vc) > 1e-300, va + vb + vc, 1.0)
    v = vb / denom
    w = vc / denom
    closest = a + v[..., None] * ab + w[..., None] * ac

    # vertex regions
    cond_a = (d1 <= 0) & (d2 <= 0)
    cond_b = (d3 >= 0) & (d4 <= d3)
    cond_c = (d6 >= 0) & (d5 <= d6)
    # edge regions
    v_ab = np.where(np.abs(d1 - d3) > 1e-300, d1 / (d1 - d3), 0.0)
    cond_ab = (~cond_a) & (~cond_b) & (d1 >= 0) & (d3 <= 0) & (vc <= 0)
    v_ac = np.where(np.abs(d2 - d6) > 1e-300, d2 / (d2 - d6), 0.0)
    cond_ac = (~cond_a) & (~cond_c) & (d2 >= 0) & (d6 <= 0) & (vb <= 0)
    t_bc = np.where(np.abs((d4 - d3) + (d5 - d6)) > 1e-300,
                    (d4 - d3) / ((d4 - d3) + (d5 - d6)), 0.0)
    cond_bc = (~cond_b) & (~cond_c) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0) \
        & (va <= 0)

    closest = np.where(cond_bc[..., None],
                       b + t_bc[..., None] * (c - b), closest)
    closest = np.where(cond_ac[..., None],
                       a + v_ac[..., None] * ac, closest)
    closest = np.where(cond_ab[..., None],
                       a + v_ab[..., None] * ab, closest)
    closest = np.where(cond_c[..., None], c, closest)
    closest = np.where(cond_b[..., None], b, closest)
    closest = np.where(cond_a[..., None], a, closest)
    return np.linalg.norm(p - closest, axis=-1)


def _cell_centers_1d(lo, n, dx, plo):
    return plo + (np.arange(lo, lo + n) + 0.5) * dx


@partial(jax.jit, static_argnames=("span", "shape"))
def _band_distances_dev(tri: "jnp.ndarray", tlo: "jnp.ndarray",
                        origin, dx, span: Tuple[int, int, int],
                        shape: Tuple[int, int, int]):
    """Device (vmapped) exact-band evaluation: distances from every cell in
    each triangle's span window to that triangle — the FLOP-heavy part of
    SDFGen's seeding (makelevelset3.cpp:20-41), one fused kernel over
    [T, span^3] instead of a host python loop.  Returns (d [T,M], flat [T,M],
    ok [T,M]); the host min-reduces into the grid."""
    import jax.numpy as jnp
    T = tri.shape[0]
    offs = np.stack(np.meshgrid(*[np.arange(s) for s in span],
                                indexing="ij"), -1).reshape(-1, 3)
    offs_j = jnp.asarray(offs, jnp.int32)                  # [M,3]
    idx = tlo[:, None, :] + offs_j[None, :, :]             # [T,M,3]
    shp = jnp.asarray(shape, jnp.int32)
    ok = jnp.all((idx >= 0) & (idx < shp[None, None]), axis=-1)
    idxc = jnp.clip(idx, 0, shp[None, None] - 1)
    p = jnp.asarray(origin)[None, None] + (idxc + 0.5) * jnp.asarray(dx)
    d = point_tri_distance(p, tri[:, None, 0], tri[:, None, 1],
                           tri[:, None, 2], xp=jnp)
    flat = (idxc[..., 0] * shape[1] + idxc[..., 1]) * shape[2] + idxc[..., 2]
    return d, flat, ok


def band_seed_device(tri_verts: np.ndarray, origin, dx,
                     shape: Tuple[int, int, int], dmax: float,
                     exact_band: int = 1, chunk: int = 16384):
    """Exact-band seeding with device distance evaluation + host min-reduce.
    Returns (phi, closest) like the host seeding loop."""
    import jax.numpy as jnp
    nx, ny, nz = shape
    dxa = np.asarray(dx, np.float64)
    oa = np.asarray(origin, np.float64)
    phi = np.full(shape, dmax, dtype=np.float64)
    closest = np.full(shape, -1, dtype=np.int64)
    if len(tri_verts) == 0:
        return phi, closest
    tlo_all = np.floor((tri_verts.min(axis=1) - oa) / dxa - 0.5).astype(int)
    thi_all = np.floor((tri_verts.max(axis=1) - oa) / dxa - 0.5).astype(int)
    # per-dim pow2 SPAN BUCKETS (r5 review fix: a single global max span
    # made the window O(T x max_span^3) — one large facet blew the device
    # arrays up to the big triangle's window for EVERY small triangle);
    # equal-bucket groups still share one compiled kernel each
    spans_i = thi_all - tlo_all + 1 + 2 * exact_band
    keys = 1 << np.ceil(np.log2(np.maximum(spans_i, 1))).astype(int)
    phi_f = phi.reshape(-1)
    cls_f = closest.reshape(-1)
    ukeys, kinv = np.unique(keys, axis=0, return_inverse=True)
    for ki in range(len(ukeys)):
        sel = np.nonzero(kinv == ki)[0]
        span = tuple(int(v) for v in ukeys[ki])
        # bound the per-dispatch working set to ~2^20 window cells
        chunk_eff = max(16, min(chunk, (1 << 20) // max(
            int(np.prod(span)), 1)))
        for s in range(0, len(sel), chunk_eff):
            ids = sel[s: s + chunk_eff]
            tri_c = tri_verts[ids]
            tlo_c = tlo_all[ids] - exact_band
            d, flat, ok = _band_distances_dev(
                jnp.asarray(tri_c, jnp.float32),
                jnp.asarray(tlo_c, jnp.int32),
                tuple(oa), tuple(dxa), span, tuple(int(v) for v in shape))
            d = np.asarray(d, np.float64).ravel()
            flat = np.asarray(flat).ravel()
            okv = np.asarray(ok).ravel() & (d < dmax)
            d, flat = d[okv], flat[okv]
            tid = np.repeat(ids, int(np.prod(span)))[okv]
            # min-reduce per cell: first row in (flat, d) order wins
            order = np.lexsort((d, flat))
            flat_o, d_o, t_o = flat[order], d[order], tid[order]
            first = np.concatenate([[True], flat_o[1:] != flat_o[:-1]])
            flat_u, d_u, t_u = flat_o[first], d_o[first], t_o[first]
            upd = d_u < phi_f[flat_u]
            phi_f[flat_u[upd]] = d_u[upd]
            cls_f[flat_u[upd]] = t_u[upd]
    return phi, closest


def unsigned_distance_grid(tri_verts: np.ndarray, origin, dx,
                           shape: Tuple[int, int, int],
                           dmax: float, exact_band: int = 1,
                           engine: str = "device"):
    """|phi| on a uniform grid: exact distances in a band around each
    triangle, then 8 fast sweeps propagating closest-triangle ids.
    engine="device" evaluates the band distances as one fused jitted kernel
    over [T, span^3] (band_seed_device); "host" keeps the numpy loop."""
    nx, ny, nz = shape
    dx = np.asarray(dx, dtype=np.float64)
    origin = np.asarray(origin, dtype=np.float64)
    ntri = len(tri_verts)
    A, B, C = (tri_verts[:, 0], tri_verts[:, 1], tri_verts[:, 2]) \
        if ntri else (None, None, None)
    if ntri == 0:
        return (np.full(shape, dmax, dtype=np.float64),
                np.full(shape, -1, dtype=np.int64))

    if engine == "device":
        phi, closest = band_seed_device(tri_verts, origin, dx, shape, dmax,
                                        exact_band)
    else:
        phi = np.full(shape, dmax, dtype=np.float64)
        closest = np.full(shape, -1, dtype=np.int64)
        # --- exact band seeding, vectorized over (triangle, band offsets),
        # grouped by per-dim pow2 span buckets (r5: a single global max
        # span made this O(T x max_span^3) when one facet was large) ---
        tlo_a = np.floor((tri_verts.min(axis=1) - origin) / dx
                         - 0.5).astype(int)
        thi_a = np.floor((tri_verts.max(axis=1) - origin) / dx
                         - 0.5).astype(int)
        spans_i = thi_a - tlo_a + 1 + 2 * exact_band
        keys = 1 << np.ceil(np.log2(np.maximum(spans_i, 1))).astype(int)
        ukeys, kinv = np.unique(keys, axis=0, return_inverse=True)
        for ki in range(len(ukeys)):
            sel = np.nonzero(kinv == ki)[0]
            tlo, thi = tlo_a[sel], thi_a[sel]
            Ag, Bg, Cg = A[sel], B[sel], C[sel]
            span = ukeys[ki]
            offs = np.stack(np.meshgrid(*[np.arange(s) for s in span],
                                        indexing="ij"), -1).reshape(-1, 3)
            for o in offs:
                idx = tlo - exact_band + o[None, :]
                ok = np.all((idx >= 0) & (idx < np.array(shape)), axis=1) \
                    & np.all(idx <= thi + exact_band, axis=1)
                if not ok.any():
                    continue
                ii = idx[ok]
                p = origin + (ii + 0.5) * dx
                d = point_tri_distance(p, Ag[ok], Bg[ok], Cg[ok])
                flat = (ii[:, 0] * ny + ii[:, 1]) * nz + ii[:, 2]
                # resolve duplicates within this batch deterministically
                order = np.argsort(d)
                flat_o = flat[order]
                d_o = d[order]
                t_o = sel[np.nonzero(ok)[0][order]]
                first = np.unique(flat_o, return_index=True)[1]
                flat_u, d_u, t_u = flat_o[first], d_o[first], t_o[first]
                cur = phi.reshape(-1)[flat_u]
                upd = d_u < cur
                phi.reshape(-1)[flat_u[upd]] = d_u[upd]
                closest.reshape(-1)[flat_u[upd]] = t_u[upd]

    # --- directional sweeps ---------------------------------------------------
    # AXIS-SEQUENTIAL plane sweeps (r5 review fix — the previous version
    # applied single-cell Jacobi shifts a fixed number of times, so ids
    # propagated only ~30 cells and everything farther silently stayed at
    # dmax): each of the 6 axis directions walks its planes in order,
    # carrying candidate ids from the just-updated previous plane under the
    # 9 perpendicular shifts and re-evaluating the EXACT point-triangle
    # distance, exactly like the reference's Gauss-Seidel sweeps
    # (makelevelset3.cpp:58-81).  Repeated until a full 6-direction round
    # changes nothing (information only ever flows "downhill", so this
    # terminates; 1-2 rounds typical).  Cells whose source phi >= dmax are
    # skipped — the output is clamped at dmax (isosurface.cpp:1643), so
    # propagation past the dmax band is wasted work.
    centers = [origin[d] + (np.arange(shape[d]) + 0.5) * dx[d]
               for d in range(3)]

    def sweep_axis(axis: int, step: int) -> bool:
        n_ax = shape[axis]
        perp = [d for d in range(3) if d != axis]
        # in-plane physical coordinates [n1, n2, 3] for a given plane index
        g1, g2 = np.meshgrid(centers[perp[0]], centers[perp[1]],
                             indexing="ij")
        changed = False
        rng = range(1, n_ax) if step == 1 else range(n_ax - 2, -1, -1)
        for i in rng:
            prev = i - step

            def plane(arr, j):
                sl = [slice(None)] * 3
                sl[axis] = j
                return arr[tuple(sl)]

            src_cl = plane(closest, prev)
            src_ph = plane(phi, prev)
            cur_phi = plane(phi, i).copy()
            cur_cl = plane(closest, i).copy()
            p = np.empty(cur_phi.shape + (3,))
            p[..., axis] = centers[axis][i]
            p[..., perp[0]] = g1
            p[..., perp[1]] = g2
            any_upd = False
            for d1 in (-1, 0, 1):
                for d2 in (-1, 0, 1):
                    cand = np.full_like(cur_cl, -1)
                    s1 = slice(max(d1, 0), cand.shape[0] + min(d1, 0)
                               or None)
                    s0 = slice(max(-d1, 0), cand.shape[0] + min(-d1, 0)
                               or None)
                    t1 = slice(max(d2, 0), cand.shape[1] + min(d2, 0)
                               or None)
                    t0 = slice(max(-d2, 0), cand.shape[1] + min(-d2, 0)
                               or None)
                    cand[s0, t0] = src_cl[s1, t1]
                    keep = np.full(cand.shape, False)
                    keep[s0, t0] = src_ph[s1, t1] < dmax
                    have = (cand >= 0) & keep
                    if not have.any():
                        continue
                    t = np.where(have, cand, 0)
                    d = point_tri_distance(p, A[t], B[t], C[t])
                    d = np.where(have, d, np.inf)
                    upd = d < cur_phi
                    if upd.any():
                        cur_phi = np.where(upd, d, cur_phi)
                        cur_cl = np.where(upd, t, cur_cl)
                        any_upd = True
            if any_upd:
                sl = [slice(None)] * 3
                sl[axis] = i
                phi[tuple(sl)] = cur_phi
                closest[tuple(sl)] = cur_cl
                changed = True
        return changed

    for _ in range(8):          # converges in 1-2 full rounds typically
        round_changed = False
        for axis in range(3):
            for step in (1, -1):
                round_changed |= sweep_axis(axis, step)
        if not round_changed:
            break
    np.clip(phi, 0.0, dmax, out=phi)
    return phi, closest


def parity_sign(tri_verts: np.ndarray, origin, dx,
                shape: Tuple[int, int, int]) -> np.ndarray:
    """-1 inside / +1 outside via x-row crossing parity
    (makelevelset3.cpp:84-99,176-186)."""
    nx, ny, nz = shape
    dx = np.asarray(dx, dtype=np.float64)
    origin = np.asarray(origin, dtype=np.float64)
    cnt = np.zeros((nx, ny, nz), dtype=np.int64)
    # consistent symbolic perturbation of the QUERY rows (the reference
    # breaks edge/vertex ties with simulation-of-simplicity orientation
    # tests, makelevelset3.cpp:125-160; r5 review fix: a ray exactly
    # through an edge shared by two triangles satisfied w>=0 in BOTH and
    # double-counted, sign-flipping whole x-rows on axis-aligned meshes).
    # The same perturbed (y,z) is used against every triangle, so a tie on
    # a shared edge resolves strictly inside exactly one of the two.
    yc = origin[1] + (np.arange(ny) + 0.5 + 1.3e-7) * dx[1]
    zc = origin[2] + (np.arange(nz) + 0.5 + 2.9e-7) * dx[2]
    xc = origin[0] + (np.arange(nx) + 0.5) * dx[0]
    for (a, b, c) in tri_verts:
        ylo = max(int(np.ceil((min(a[1], b[1], c[1]) - origin[1]) / dx[1]
                              - 0.5)), 0)
        yhi = min(int(np.floor((max(a[1], b[1], c[1]) - origin[1]) / dx[1]
                               - 0.5)), ny - 1)
        zlo = max(int(np.ceil((min(a[2], b[2], c[2]) - origin[2]) / dx[2]
                              - 0.5)), 0)
        zhi = min(int(np.floor((max(a[2], b[2], c[2]) - origin[2]) / dx[2]
                               - 0.5)), nz - 1)
        if ylo > yhi or zlo > zhi:
            continue
        Yg, Zg = np.meshgrid(yc[ylo : yhi + 1], zc[zlo : zhi + 1],
                             indexing="ij")
        # barycentric in the (y,z) projection
        d = ((b[1] - a[1]) * (c[2] - a[2]) - (b[2] - a[2]) * (c[1] - a[1]))
        if abs(d) < 1e-300:
            continue
        w1 = ((Yg - a[1]) * (c[2] - a[2]) - (Zg - a[2]) * (c[1] - a[1])) / d
        w2 = ((b[1] - a[1]) * (Zg - a[2]) - (b[2] - a[2]) * (Yg - a[1])) / d
        w0 = 1.0 - w1 - w2
        hit = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not hit.any():
            continue
        xh = w0 * a[0] + w1 * b[0] + w2 * c[0]
        jj, kk = np.nonzero(hit)
        for j, k, x in zip(jj + ylo, kk + zlo, xh[hit]):
            cnt[xc < x, j, k] += 1
    return np.where(cnt % 2 == 1, -1.0, 1.0)


def signed_distance_dense(dstate, mef, lev: int, dmax: float,
                          sign_field: Optional[str] = None,
                          iso_val: float = 0.0) -> np.ndarray:
    """Signed distance on one dense level's bbox grid."""
    geom = dstate.meta.geoms[lev]
    bbox = dstate.lmeta[lev].bbox
    dx = np.array(geom.dx)
    origin = np.array(geom.prob_lo) + (np.array(bbox.lo)
                                       - np.array(geom.domain.lo)) * dx
    tri = mef.positions()[mef.elements]
    phi, _ = unsigned_distance_grid(tri, origin, dx, bbox.shape, dmax)
    if sign_field is not None:
        f = np.asarray(dstate.data[lev][dstate.comp(sign_field)])
        sgn = np.where(f < iso_val, -1.0, 1.0)
    else:
        sgn = parity_sign(tri, origin, dx, bbox.shape)
    return phi * sgn
