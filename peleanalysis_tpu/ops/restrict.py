"""Fine-to-coarse restriction (amrex::average_down analog) on dense levels.

The reference relies on AMReX's average_down to keep covered coarse data
consistent with the fine solution (and MLMG uses it inside composite
solves); here it is a reshape-mean over ratio blocks + a masked overlay —
pure slicing arithmetic like the rest of the dense model.
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np


def average_down_level(meta, lmeta, x_crse: jnp.ndarray, x_fine: jnp.ndarray,
                       covered_crse: jnp.ndarray, lev_crse: int
                       ) -> jnp.ndarray:
    """Overwrite covered cells of the coarse dense array with the block mean
    of their fine children.  x_crse [C, *bbox_c], x_fine [C, *bbox_f]."""
    r = meta.ref_ratio[lev_crse]
    bbox_c = lmeta[lev_crse].bbox
    bbox_f = lmeta[lev_crse + 1].bbox
    # fine bbox in coarse index space (fine bboxes are ratio-aligned in
    # AMReX hierarchies; guard with an interior crop if not)
    flo_c = [bbox_f.lo[d] // r for d in range(3)]
    fshape = x_fine.shape[1:]
    nc = [fshape[d] // r for d in range(3)]
    crop = x_fine[:, : nc[0] * r, : nc[1] * r, : nc[2] * r]
    down = crop.reshape(x_fine.shape[0], nc[0], r, nc[1], r,
                        nc[2], r).mean(axis=(2, 4, 6))
    sl = tuple(slice(flo_c[d] - bbox_c.lo[d], flo_c[d] - bbox_c.lo[d] + nc[d])
               for d in range(3))
    sub = x_crse[(slice(None),) + sl]
    cov = covered_crse[sl]
    out = x_crse.at[(slice(None),) + sl].set(
        jnp.where(cov[None], down, sub))
    return out


def average_down_all(meta, lmeta, x_list: List[jnp.ndarray],
                     covered_list) -> List[jnp.ndarray]:
    """Fine-to-coarse sweep over the whole hierarchy."""
    out = list(x_list)
    for lev in range(meta.n_levels - 2, -1, -1):
        out[lev] = average_down_level(meta, lmeta, out[lev], out[lev + 1],
                                      covered_list[lev], lev)
    return out


def _faces_along(g: jnp.ndarray, d: int, dxd: float) -> jnp.ndarray:
    """Face gradients along axis d of a 1-ghost grown array [1, X+2, Y+2,
    Z+2] -> [1, ..S+1 along d.., S transverse] (faces of the bbox cells)."""
    hi = [slice(1, -1)] * 3
    lo = [slice(1, -1)] * 3
    hi[d] = slice(1, None)
    lo[d] = slice(0, -1)
    return (g[(slice(None),) + tuple(hi)]
            - g[(slice(None),) + tuple(lo)]) / dxd


def flux_matched_gradient(meta, lmeta, grown_list, covered_list):
    """Cell-centered gradients with MLMG-style flux matching: on every
    coarse face bounding the fine-covered region, the coarse face flux is
    replaced by the transverse mean of the fine face fluxes before the
    face->cell average (the composite MLPoisson/MLMG::apply + getFluxes +
    average_face_to_cellcenter pipeline of grad.cpp:178-219).  Away from
    interfaces the face->cell average IS the centered difference, so this
    only changes interface-adjacent cells.

    grown_list: per-level [1, *bbox+2] (one filled ghost ring);
    covered_list: per-level bool [bbox] covered-by-finer masks.
    Returns [lev][d] -> [1, *bbox] gradient components."""
    n_lev = meta.n_levels
    out = []
    for lev in range(n_lev):
        g = grown_list[lev]
        dx = meta.geoms[lev].dx
        grads = []
        for d in range(3):
            F = _faces_along(g, d, dx[d])
            if lev + 1 < n_lev:
                bbox_c = lmeta[lev].bbox
                bbox_f = lmeta[lev + 1].bbox
                r = meta.ref_ratio[lev]
                # per-dim ratio: promoted-2D z axis has extent 1 (ratio 1)
                rt = [1 if bbox_f.shape[j] == 1 else r for j in range(3)]
                if rt[d] > 1:
                    gf = grown_list[lev + 1]
                    Ff = _faces_along(gf, d, meta.geoms[lev + 1].dx[d])
                    # coarse-aligned planes along d, then transverse
                    # block-mean restriction
                    sl = [slice(None)] * 4
                    sl[1 + d] = slice(None, None, rt[d])
                    Fr = Ff[tuple(sl)]
                    # transverse block-mean: split each transverse axis into
                    # (coarse, ratio) and average the ratio sub-axes
                    shp, new_shape, red, pos = Fr.shape, [Fr.shape[0]], [], 1
                    for j in range(3):
                        if j == d:
                            new_shape.append(shp[1 + j])
                            pos += 1
                        else:
                            new_shape += [shp[1 + j] // rt[j], rt[j]]
                            red.append(pos + 1)
                            pos += 2
                    Fr = Fr.reshape(new_shape).mean(axis=tuple(red))
                    # overlay region of coarse faces covering the fine bbox
                    flo = [bbox_f.lo[j] // rt[j] - bbox_c.lo[j]
                           for j in range(3)]
                    nc = [bbox_f.shape[j] // rt[j] for j in range(3)]
                    reg = [slice(flo[j], flo[j] + nc[j]) for j in range(3)]
                    reg[d] = slice(flo[d], flo[d] + nc[d] + 1)
                    reg = (slice(None),) + tuple(reg)
                    # boundary faces of the covered region (host/static)
                    cov = np.asarray(covered_list[lev])
                    covp = np.concatenate([
                        np.zeros_like(np.take(cov, [0], axis=d)), cov,
                        np.zeros_like(np.take(cov, [0], axis=d))], axis=d)
                    bnd = np.logical_xor(
                        np.take(covp, range(0, covp.shape[d] - 1), axis=d),
                        np.take(covp, range(1, covp.shape[d]), axis=d))
                    bnd_sub = jnp.asarray(bnd[tuple(reg[1:])])
                    F = F.at[reg].set(
                        jnp.where(bnd_sub[None], Fr, F[reg]))
            lo = [slice(None)] * 4
            hi = [slice(None)] * 4
            lo[1 + d] = slice(0, -1)
            hi[1 + d] = slice(1, None)
            grads.append(0.5 * (F[tuple(lo)] + F[tuple(hi)]))
        out.append(grads)
    return out
