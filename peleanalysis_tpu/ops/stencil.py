"""Finite-difference stencils over batched grown FABs.

These replace the reference's MLMG-based machinery: the reference uses
composite ``MLPoisson::getFluxes`` face gradients + ``average_face_to_
cellcenter`` purely as a way to get coarse-fine-consistent 2nd-order cell
gradients (/root/reference/Src/grad.cpp:172-219, Src/curvature.cpp:426-546).
For interior cells that pipeline is algebraically identical to a centered
difference on ghost-filled data:

    avg(face flux) = ((f[i+1]-f[i]) + (f[i]-f[i-1])) / (2 dx)
                   = (f[i+1]-f[i-1]) / (2 dx)

so with our FillPatch supplying linearly-interpolated coarse-fine ghosts and
foextrap/periodic/reflect physical ghosts, plain centered differences
reproduce the reference's gradients to 2nd order everywhere (documented
parity decision per SURVEY.md §7 "MLMG-equivalence").

All functions map ``[nbox, ncomp, X+2g, Y+2g, Z+2g]`` grown arrays to
``[nbox, ..., X', Y', Z']`` arrays shrunk by the stencil radius; they are
pure jnp slicing arithmetic that XLA fuses into single HBM passes.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def _sh(a: jnp.ndarray, axis: int, off: int, shrink: int) -> jnp.ndarray:
    """Slice `a` along spatial axis (counted from the last ndim dims) with
    offset `off`, shrinking by `shrink` cells per side overall."""
    ndim_sp = 3  # batched layout always carries 3 trailing spatial axes
    ax = a.ndim - ndim_sp + axis
    idx = [slice(None)] * a.ndim
    for d in range(ndim_sp):
        dd = a.ndim - ndim_sp + d
        if dd == ax:
            idx[dd] = slice(shrink + off, a.shape[dd] - shrink + off)
        else:
            idx[dd] = slice(shrink, a.shape[dd] - shrink)
    return a[tuple(idx)]


def centered_gradient(grown: jnp.ndarray, dx: Sequence[float],
                      shrink: int = 1) -> Tuple[jnp.ndarray, ...]:
    """2nd-order centered gradient.  grown: [..., X+2s, Y+2s, Z+2s] ->
    D arrays [..., X, Y, Z]."""
    return tuple(
        (_sh(grown, d, +1, shrink) - _sh(grown, d, -1, shrink))
        / jnp.asarray(2.0 * dx[d], grown.dtype)
        for d in range(3)
    )


def magnitude(*comps: jnp.ndarray) -> jnp.ndarray:
    s = comps[0] * comps[0]
    for c in comps[1:]:
        s = s + c * c
    return jnp.sqrt(s)


def divergence(vec: Sequence[jnp.ndarray], dx: Sequence[float],
               shrink: int = 1) -> jnp.ndarray:
    """Divergence of a vector field given as D grown arrays."""
    out = 0.0
    for d in range(3):
        out = out + (
            _sh(vec[d], d, +1, shrink) - _sh(vec[d], d, -1, shrink)
        ) / jnp.asarray(2.0 * dx[d], vec[d].dtype)
    return out


def hessian(grown: jnp.ndarray, dx: Sequence[float],
            shrink: int = 1) -> Tuple[Tuple[jnp.ndarray, ...], ...]:
    """All 6 unique 2nd derivatives from a (2*shrink)-ghost grown array.
    Returns H[d1][d2] (symmetric). Requires shrink>=1 and ghosts>=shrink."""
    s = shrink
    H = [[None] * 3 for _ in range(3)]
    for d in range(3):
        c0 = _sh(grown, d, 0, s)
        H[d][d] = (
            _sh(grown, d, +1, s) - 2.0 * c0 + _sh(grown, d, -1, s)
        ) / jnp.asarray(dx[d] ** 2, grown.dtype)
    for d1 in range(3):
        for d2 in range(d1 + 1, 3):
            # mixed: centered in both dims
            pp = _sh2(grown, d1, +1, d2, +1, s)
            pm = _sh2(grown, d1, +1, d2, -1, s)
            mp = _sh2(grown, d1, -1, d2, +1, s)
            mm = _sh2(grown, d1, -1, d2, -1, s)
            H[d1][d2] = H[d2][d1] = (pp - pm - mp + mm) / jnp.asarray(
                4.0 * dx[d1] * dx[d2], grown.dtype)
    return tuple(tuple(row) for row in H)


def _sh2(a: jnp.ndarray, ax1: int, off1: int, ax2: int, off2: int,
         shrink: int) -> jnp.ndarray:
    """Two-axis offset slice, shrinking by `shrink` per side on all axes."""
    offs = {ax1: off1, ax2: off2}
    idx = [slice(None)] * a.ndim
    for d in range(3):
        dd = a.ndim - 3 + d
        o = offs.get(d, 0)
        idx[dd] = slice(shrink + o, a.shape[dd] - shrink + o)
    return a[tuple(idx)]


def laplacian(grown: jnp.ndarray, dx: Sequence[float],
              shrink: int = 1) -> jnp.ndarray:
    out = 0.0
    s = shrink
    for d in range(3):
        out = out + (
            _sh(grown, d, +1, s) - 2.0 * _sh(grown, d, 0, s)
            + _sh(grown, d, -1, s)
        ) / jnp.asarray(dx[d] ** 2, grown.dtype)
    return out


def interior(grown: jnp.ndarray, shrink: int) -> jnp.ndarray:
    """Strip `shrink` ghost cells from the 3 trailing spatial axes."""
    if shrink == 0:
        return grown
    idx = [slice(None)] * grown.ndim
    for d in range(3):
        dd = grown.ndim - 3 + d
        idx[dd] = slice(shrink, grown.shape[dd] - shrink)
    return grown[tuple(idx)]
