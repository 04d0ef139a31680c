"""Pure-numpy float64 reference implementations (CPU baseline + parity
oracle).

These mirror the reference's CPU numerics (centered-difference gradients on
ghost-filled data, /root/reference/Src/grad.cpp:211-235) and serve two roles:
the parity oracle for tests and the single-process CPU baseline that bench.py
compares the TPU pipeline against.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def numpy_apply_fill(plan, fine: np.ndarray,
                     crse: Optional[np.ndarray] = None) -> np.ndarray:
    """Numpy mirror of ops.fill.apply_fill (same gather plan)."""
    same_src = np.asarray(plan.same_src)
    nbox, ncomp = fine.shape[0], fine.shape[1]
    fine_flat = np.moveaxis(fine, 1, 0).reshape(ncomp, -1)
    vals = fine_flat[:, same_src.reshape(-1)].reshape(
        (ncomp, nbox) + plan.grown_shape)
    if plan.crse_src is not None:
        crse_flat = np.moveaxis(crse, 1, 0).reshape(ncomp, -1)
        crse_src = np.asarray(plan.crse_src)
        use = np.asarray(plan.use_crse)
        if plan.crse_wt is None:
            cvals = crse_flat[:, crse_src.reshape(-1)].reshape(
                (ncomp, nbox) + plan.grown_shape)
        else:
            wt = np.asarray(plan.crse_wt, dtype=fine.dtype)
            cvals = 0.0
            for k in range(crse_src.shape[-1]):
                g = crse_flat[:, crse_src[..., k].reshape(-1)].reshape(
                    (ncomp, nbox) + plan.grown_shape)
                cvals = cvals + g * wt[..., k]
        vals = np.where(use[None], cvals, vals)
    if plan.sign is not None:
        vals = vals * np.asarray(plan.sign, dtype=fine.dtype)[None]
    return np.moveaxis(vals, 0, 1)


def numpy_centered_gradient(grown: np.ndarray, dx: Sequence[float]):
    g = grown
    c = (slice(None),) * (g.ndim - 3)
    i = slice(1, -1)
    gx = (g[c + (slice(2, None), i, i)] - g[c + (slice(0, -2), i, i)]) / (2 * dx[0])
    gy = (g[c + (i, slice(2, None), i)] - g[c + (i, slice(0, -2), i)]) / (2 * dx[1])
    gz = (g[c + (i, i, slice(2, None))] - g[c + (i, i, slice(0, -2))]) / (2 * dx[2])
    return gx, gy, gz


def numpy_grad_level(plan, data: np.ndarray, crse: Optional[np.ndarray],
                     dx) -> np.ndarray:
    grown = numpy_apply_fill(plan, data, crse)
    gx, gy, gz = numpy_centered_gradient(grown, dx)
    mag = np.sqrt(gx * gx + gy * gy + gz * gz)
    return np.concatenate([gx, gy, gz, mag], axis=1)


def numpy_multilevel_grad(plans, fields, dxs):
    """Per-level gradients of a multi-level scalar, coarse-fine ghosts from
    the coarser level of the same field (curvature's derived-field pattern)."""
    grads = []
    for lev, f in enumerate(fields):
        crse = fields[lev - 1] if lev > 0 else None
        grown = numpy_apply_fill(plans[lev], f, crse)
        grads.append(numpy_centered_gradient(grown, dxs[lev]))
    return grads


def numpy_curvature(plans, prog_levels, dxs):
    """CPU mirror of the curvature pipeline numerics (mean + Gaussian
    curvature of a progress field; /root/reference/Src/curvature.cpp flow):
    gradient, flame normal, div(normal), grad-of-grad Hessian, adjugate."""
    n_lev = len(prog_levels)
    g = numpy_multilevel_grad(plans, prog_levels, dxs)
    G = [np.concatenate(g[lev], axis=1) for lev in range(n_lev)]
    normg = [-np.maximum(1e-14, np.sqrt((G[lev] ** 2).sum(axis=1,
                                                          keepdims=True)))
             for lev in range(n_lev)]
    N = [G[lev] / normg[lev] for lev in range(n_lev)]
    out = []
    for lev in range(n_lev):
        div = 0.0
        for d in range(3):
            comp = [N[l][:, d : d + 1] for l in range(n_lev)]
            gl = numpy_multilevel_grad(plans, comp, dxs)
            div = div + gl[lev][d]
        Km = 0.5 * div
        H = []
        for i in range(3):
            comp = [G[l][:, i : i + 1] for l in range(n_lev)]
            gl = numpy_multilevel_grad(plans, comp, dxs)
            H.append([gl[lev][j][:, 0] for j in range(3)])
        adj = [[H[(i + 1) % 3][(j + 1) % 3] * H[(i + 2) % 3][(j + 2) % 3]
                - H[(i + 1) % 3][(j + 2) % 3] * H[(i + 2) % 3][(j + 1) % 3]
                for j in range(3)] for i in range(3)]
        Gl = G[lev]
        num = 0.0
        for i in range(3):
            for j in range(3):
                num = num + Gl[:, i] * adj[i][j] * Gl[:, j]
        Kg = num / normg[lev][:, 0] ** 4
        out.append((Km, Kg))
    return out
