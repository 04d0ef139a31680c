"""Ghost fill for the dense canonical level representation.

Everything here lowers to slices, concats and fixed-weight separable
upsamples — no gathers — so XLA fuses fills straight into downstream stencils
at HBM bandwidth.  Semantics follow FillPatchTwoLevels + PCInterp /
CellBilinear and the physical-BC conventions of the reference
(/root/reference/Src/grad.cpp:136-144, Src/isosurface.cpp:1509-1527,
Src/stream.cpp:860-874); see ops/fill.py for the general gather-based path.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..amr.box import Box
from ..amr.dense import DenseAmrState
from ..amr.geometry import Geometry
from .fill import BCSpec, FOEXTRAP, REFLECT_EVEN, REFLECT_ODD, default_bc


def _ax(a: jnp.ndarray, d: int) -> int:
    return a.ndim - 3 + d


def _slc(a: jnp.ndarray, d: int, sl: slice) -> jnp.ndarray:
    idx = [slice(None)] * a.ndim
    idx[_ax(a, d)] = sl
    return a[tuple(idx)]


def _grow_axis(a: jnp.ndarray, d: int, g: int, lo_mode: str, hi_mode: str,
               periodic: bool) -> jnp.ndarray:
    """Extend array by g ghost layers along spatial dim d (level-0 BC fill).
    Assumes the array spans the full domain along periodic dims."""
    return _grow_axis_asym(a, d, g, g, lo_mode, hi_mode, periodic)


def _grow_axis_asym(a: jnp.ndarray, d: int, g_lo: int, g_hi: int,
                    lo_mode: str, hi_mode: str,
                    periodic: bool) -> jnp.ndarray:
    """Like _grow_axis but with independent lo/hi ghost widths (used to grow
    a shape-bucket/mesh-padded level 0 from the TRUE domain edge: pad
    positions then carry exact BC/wrap values — see _grow_level0)."""
    if g_lo == 0 and g_hi == 0:
        return a
    ax = _ax(a, d)
    n = a.shape[ax]
    if periodic:
        # a ghost band wider than the domain extent (bucket/mesh pads on a
        # small level 0) wraps around more than once — a single slice would
        # silently CLIP; gather by mod index instead
        def wrap(g, is_lo):
            if g <= n:
                return _slc(a, d, slice(-g, None) if is_lo else slice(0, g))
            idx = (np.arange(-g, 0) if is_lo else np.arange(n, n + g)) % n
            return jnp.take(a, jnp.asarray(idx), axis=ax)

        lo = wrap(g_lo, True) if g_lo else None
        hi = wrap(g_hi, False) if g_hi else None
    else:
        def side(mode, g, is_lo):
            if mode == FOEXTRAP:
                edge = _slc(a, d, slice(0, 1) if is_lo else slice(-1, None))
                reps = [1] * a.ndim
                reps[ax] = g
                return jnp.tile(edge, reps)
            if mode in (REFLECT_EVEN, REFLECT_ODD):
                if g > n:
                    raise ValueError(
                        f"reflecting BC needs ghost width {g} <= the "
                        f"level-0 extent {n} along dim {d} (shrink "
                        f"shape_bucket/mesh padding or ngrow)")
                blk = _slc(a, d, slice(0, g) if is_lo else slice(-g, None))
                blk = jnp.flip(blk, axis=ax)
                return -blk if mode == REFLECT_ODD else blk
            raise ValueError(f"unknown BC mode {mode}")

        lo = side(lo_mode, g_lo, True) if g_lo else None
        hi = side(hi_mode, g_hi, False) if g_hi else None
    parts = [p for p in (lo, a, hi) if p is not None]
    return jnp.concatenate(parts, axis=ax) if len(parts) > 1 else a


def _grow_level0(data: jnp.ndarray, bbox: Box, geom: Geometry, g: int,
                 bc: BCSpec) -> jnp.ndarray:
    """Grow a level-0 array by g ghost layers, honouring a bucket/mesh-padded
    bbox (pad_state_to): the array is sliced back to the true domain first
    and grown from the REAL edges, so every position beyond the domain —
    pad cells and ghost cells alike — receives the exact BC value (foextrap/
    reflect copy, or wrap for periodic dims).  The stored pad cells are
    edge-copy placeholders with in_level False; outputs never read them, but
    stencils at real boundary cells read the filled positions this produces.
    Result covers bbox.grow(g)."""
    dom = geom.domain
    out = data
    for d in range(3):
        pad_lo = dom.lo[d] - bbox.lo[d]
        pad_hi = bbox.hi[d] - dom.hi[d]
        if pad_lo < 0 or pad_hi < 0:
            raise ValueError("level 0 must cover the domain")
        if pad_lo or pad_hi:
            ax = _ax(out, d)
            out = _slc(out, d, slice(pad_lo, out.shape[ax] - pad_hi))
        out = _grow_axis_asym(out, d, g + pad_lo, g + pad_hi,
                              bc[d][0], bc[d][1], geom.is_periodic[d])
    return out


def _upsample_axis(c: jnp.ndarray, d: int, r: int, interp) -> jnp.ndarray:
    """Refine along dim d by factor r.  Fine center sits at coarse coord
    (p+0.5)/r - 0.5 relative to its parent.
      pc:        repeat (PCInterp)
      linear:    2-point lerp (CellBilinear weights)
      quadratic: 3-point Lagrange through parent±1 (CellQuadratic analog —
                 upgrades ghost accuracy to O(h^3) so c-f ring gradients
                 stay 2nd order)
    Edges are clamped; callers provide one spare coarse cell so clamped
    values are sliced away."""
    ax = _ax(c, d)
    linear = interp is True or interp == "linear"
    quad = interp == "quadratic"
    if not (linear or quad):
        return jnp.repeat(c, r, axis=ax)
    c_m1 = jnp.concatenate([_slc(c, d, slice(0, 1)),
                            _slc(c, d, slice(0, -1))], axis=ax)
    c_p1 = jnp.concatenate([_slc(c, d, slice(1, None)),
                            _slc(c, d, slice(-1, None))], axis=ax)
    phases = []
    for p in range(r):
        off = (p + 0.5) / r - 0.5
        if quad:
            wl = off * (off - 1.0) / 2.0
            wc = (1.0 - off) * (1.0 + off)
            wr = off * (off + 1.0) / 2.0
            phases.append(c_m1 * jnp.asarray(wl, c.dtype)
                          + c * jnp.asarray(wc, c.dtype)
                          + c_p1 * jnp.asarray(wr, c.dtype))
        elif off < 0:
            w = off + 1.0  # weight on c; (1-w) on c[i-1]
            phases.append(c * jnp.asarray(w, c.dtype)
                          + c_m1 * jnp.asarray(1.0 - w, c.dtype))
        else:
            w = off      # weight on c[i+1]
            phases.append(c * jnp.asarray(1.0 - w, c.dtype)
                          + c_p1 * jnp.asarray(w, c.dtype))
    out = jnp.stack(phases, axis=ax + 1)
    shape = list(c.shape)
    shape[ax] = shape[ax] * r
    return out.reshape(shape)


def _apply_exterior_bc(grown: jnp.ndarray, gbox: Box, geom: Geometry,
                       bc: BCSpec) -> jnp.ndarray:
    """Overwrite layers of `grown` (covering gbox) that lie outside the
    physical domain with BC-mapped copies of in-domain data.  Periodic dims
    are skipped (they wrapped at the coarse level already)."""
    dom = geom.domain
    for d in range(3):
        if geom.is_periodic[d]:
            continue
        n_lo = max(0, dom.lo[d] - gbox.lo[d])
        n_hi = max(0, gbox.hi[d] - dom.hi[d])
        ax = _ax(grown, d)
        if n_lo > 0:
            inner = _slc(grown, d, slice(n_lo, None))
            blk = _bc_block(inner, d, n_lo, bc[d][0], True, ax)
            grown = jnp.concatenate([blk, inner], axis=ax)
        if n_hi > 0:
            inner = _slc(grown, d, slice(0, grown.shape[ax] - n_hi))
            blk = _bc_block(inner, d, n_hi, bc[d][1], False, ax)
            grown = jnp.concatenate([inner, blk], axis=ax)
    return grown


def _bc_block(inner: jnp.ndarray, d: int, n: int, mode: str, is_lo: bool,
              ax: int) -> jnp.ndarray:
    if mode == FOEXTRAP:
        edge = _slc(inner, d, slice(0, 1) if is_lo else slice(-1, None))
        reps = [1] * inner.ndim
        reps[ax] = n
        return jnp.tile(edge, reps)
    if mode in (REFLECT_EVEN, REFLECT_ODD):
        blk = _slc(inner, d, slice(0, n) if is_lo else slice(-n, None))
        blk = jnp.flip(blk, axis=ax)
        return -blk if mode == REFLECT_ODD else blk
    raise ValueError(f"unknown BC mode {mode}")


def _merge_fine_level(data, mask, up, gbox: Box, geom: Geometry,
                      ngrow: int) -> jnp.ndarray:
    """where(mask, fine, coarse-upsample) over gbox, honouring SAME-LEVEL
    periodic images: a grown position outside the domain along periodic
    dims takes the fine value at its wrapped image whenever that image lies
    inside the level's stored extent and is covered by the level's boxes
    (AMReX FillBoundary periodic copies run before coarse interpolation —
    reference Src/grad.cpp:136-144 FillPatchTwoLevels semantics).  Images
    outside the stored extent or uncovered fall through to the coarse
    upsample, exactly as a hole would.  Levels whose grown box stays inside
    the domain (every interior AMR level) skip the remap entirely."""
    pad = [(0, 0)] + [(ngrow, ngrow)] * 3
    fine_p = jnp.pad(data, pad)
    mask_p = jnp.pad(mask, pad[1:])
    dom = geom.domain
    for d in range(3):
        if not geom.is_periodic[d]:
            continue
        pos = np.arange(gbox.lo[d], gbox.hi[d] + 1)
        w = dom.lo[d] + (pos - dom.lo[d]) % dom.shape[d]
        if np.array_equal(w, pos):
            continue                   # grown box inside the domain: free
        idx = w - gbox.lo[d]
        valid = (idx >= 0) & (idx < len(pos))
        take = jnp.asarray(np.where(valid, idx, 0))
        fine_p = jnp.take(fine_p, take, axis=_ax(fine_p, d))
        vshape = [1, 1, 1]
        vshape[d] = len(pos)
        mask_p = (jnp.take(mask_p, take, axis=d)
                  & jnp.asarray(valid).reshape(vshape))
    return jnp.where(mask_p[None], fine_p, up)


def _combine_two_level(meta, lmeta, lev: int, ngrow: int, data, mask,
                       crse_grown: jnp.ndarray, crse_g: int,
                       bc: BCSpec, interp: str) -> jnp.ndarray:
    """One two-level fill: combine level data with a coarse grown array that
    already has crse_g ghosts."""
    geom = meta.geoms[lev]
    r = meta.ref_ratio[lev - 1]
    stencil = 1 if interp in ("linear", "quadratic") else 0
    bbox = lmeta[lev].bbox
    gbox = bbox.grow(ngrow)
    cbox = gbox.coarsen(r).grow(stencil)
    bbox_c = lmeta[lev - 1].bbox
    cg_box = bbox_c.grow(crse_g)
    if not cg_box.contains_box(cbox):
        raise ValueError("coarse grown array too small for this fill")
    sl = tuple(slice(cbox.lo[d] - cg_box.lo[d],
                     cbox.hi[d] - cg_box.lo[d] + 1) for d in range(3))
    c = crse_grown[(slice(None),) + sl]
    for d in range(3):
        c = _upsample_axis(c, d, r, interp)
    sl = tuple(slice(gbox.lo[d] - cbox.lo[d] * r,
                     gbox.hi[d] + 1 - cbox.lo[d] * r) for d in range(3))
    up = c[(slice(None),) + sl]
    grown = _merge_fine_level(data, mask, up, gbox, geom, ngrow)
    return _apply_exterior_bc(grown, gbox, geom, bc)


def coarse_ghost_requirement(meta, lmeta, lev: int, ngrow: int,
                             interp: str) -> int:
    """Ghost width the coarse level must carry to serve this level's fill."""
    r = meta.ref_ratio[lev - 1]
    gbox = lmeta[lev].bbox.grow(ngrow)
    cbox = gbox.coarsen(r).grow(1 if interp in ("linear", "quadratic")
                                else 0)
    bbox_c = lmeta[lev - 1].bbox
    gc = 0
    for d in range(3):
        gc = max(gc, bbox_c.lo[d] - cbox.lo[d], cbox.hi[d] - bbox_c.hi[d])
    return max(gc, 0)


def fill_dense_multilevel(meta, lmeta, data_list, mask_list, ngrow,
                          bc: Optional[BCSpec] = None,
                          interp: str = "linear"):
    """Grown dense arrays for ALL levels in one bottom-up pass — each level
    filled exactly once (the recursive helper re-fills the whole coarse
    stack per call, which explodes the XLA graph for derived-field
    pipelines like curvature).  ngrow: int or per-level list.  Returns a
    list of [ncomp, *(bbox.grow(ngrow).shape)] arrays."""
    L = meta.n_levels
    if bc is None:
        bc = default_bc(3)
    if np.isscalar(ngrow):
        ngrow = [int(ngrow)] * L
    need = [int(g) for g in ngrow]
    for lev in range(L - 1, 0, -1):
        gc = coarse_ghost_requirement(meta, lmeta, lev, need[lev], interp)
        need[lev - 1] = max(need[lev - 1], gc)

    grown = [None] * L
    grown[0] = _grow_level0(data_list[0], lmeta[0].bbox, meta.geoms[0],
                            need[0], bc)
    for lev in range(1, L):
        grown[lev] = _combine_two_level(meta, lmeta, lev, need[lev],
                                        data_list[lev], mask_list[lev],
                                        grown[lev - 1], need[lev - 1],
                                        bc, interp)
    # shrink to the requested ghost widths
    outs = []
    for lev in range(L):
        extra = need[lev] - ngrow[lev]
        if extra > 0:
            sl = (slice(None),) + tuple(slice(extra, grown[lev].shape[1 + d]
                                              - extra) for d in range(3))
            outs.append(grown[lev][sl])
        else:
            outs.append(grown[lev])
    return outs


def fill_dense_arrays(meta, lmeta, data_list, mask_list, lev: int, ngrow: int,
                      bc: Optional[BCSpec] = None,
                      interp: str = "linear") -> jnp.ndarray:
    """Functional core of the dense fill (jit-friendly: data and masks are
    traced arguments, never closure constants — huge boolean constants make
    XLA constant-folding pathologically slow).

    data_list[lev]: [ncomp, *bbox_shape]; mask_list[lev]: bool [*bbox_shape]
    (True where the level's boxes cover).  Returns the grown dense array
    [ncomp, *(bbox.grow(ngrow).shape)].
    """
    geom = meta.geoms[lev]
    if bc is None:
        bc = default_bc(3)
    data = data_list[lev]
    bbox = lmeta[lev].bbox

    if lev == 0:
        return _grow_level0(data, bbox, geom, ngrow, bc)

    r = meta.ref_ratio[lev - 1]
    stencil = 1 if interp in ("linear", "quadratic") else 0
    gbox = bbox.grow(ngrow)
    cbox = gbox.coarsen(r).grow(stencil)
    bbox_c = lmeta[lev - 1].bbox
    gc = 0
    for d in range(3):
        gc = max(gc, bbox_c.lo[d] - cbox.lo[d], cbox.hi[d] - bbox_c.hi[d])
    gc = max(gc, 0)
    crse_grown = fill_dense_arrays(meta, lmeta, data_list, mask_list,
                                   lev - 1, gc, bc, interp)
    cg_box = bbox_c.grow(gc)
    # slice coarse region cbox out of the grown coarse array
    sl = tuple(slice(cbox.lo[d] - cg_box.lo[d],
                     cbox.hi[d] - cg_box.lo[d] + 1) for d in range(3))
    c = crse_grown[(slice(None),) + sl]
    for d in range(3):
        c = _upsample_axis(c, d, r, interp)
    # c now covers [cbox.lo*r, (cbox.hi+1)*r); slice to gbox
    sl = tuple(slice(gbox.lo[d] - cbox.lo[d] * r,
                     gbox.hi[d] + 1 - cbox.lo[d] * r) for d in range(3))
    up = c[(slice(None),) + sl]

    grown = _merge_fine_level(data, mask_list[lev], up, gbox, geom, ngrow)
    return _apply_exterior_bc(grown, gbox, geom, bc)


def fill_dense(state: DenseAmrState, lev: int, ngrow: int,
               comps: Optional[Sequence[int]] = None,
               bc: Optional[BCSpec] = None,
               interp: str = "linear") -> jnp.ndarray:
    """Grown dense level array [ncomp, *(bbox.grow(ngrow).shape)].

    Hole/ghost cells take coarse-upsampled values; same-level data is used
    wherever the level's boxes cover; out-of-domain layers get physical BCs.
    (Convenience wrapper; jitted tools should use fill_dense_arrays with data
    and masks passed as arguments.)
    """
    data_list = list(state.data)
    if comps is not None:
        data_list = [d[np.asarray(comps)] for d in data_list]
    mask_list = [state.in_level_mask(l) for l in range(state.meta.n_levels)]
    return fill_dense_arrays(state.meta, state.lmeta, data_list, mask_list,
                             lev, ngrow, bc, interp)
