"""Masked, weighted binning primitives — the device-side replacement for the
reference's per-cell binning loops (+MPI reductions) in conditionalMean /
jpdf / integral (/root/reference/Src/conditionalMean.cpp:260-303,
Src/jpdf.cpp:427-537).

Each level contributes a scatter-add over bin indices; XLA lowers the
.at[].add onto the TPU and the per-level results are summed — the psum /
ReduceRealSum analog happens implicitly when the box axis is sharded.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("nbins", "clamp", "with_minmax"))
def binned_stats(bin_vals: jnp.ndarray, avg_vals: jnp.ndarray,
                 weight: jnp.ndarray, mask: jnp.ndarray,
                 bmin: float, bmax: float, nbins: int,
                 clamp: bool = False, with_minmax: bool = False):
    """1-D conditional binning (conditionalMean semantics).

    bin_vals: [*shape]; avg_vals: [ncomp, *shape]; weight: scalar or [*shape];
    mask: bool [*shape].  Out-of-range cells are dropped (clamp=False,
    conditionalMean.cpp:270-275) or clamped to edge bins (clamp=True, jpdf
    semantics).  Returns (hits[nbins], sums[nbins,ncomp], sumsq[nbins,ncomp],
    mins, maxs).
    """
    ncomp = avg_vals.shape[0]
    x = (bin_vals - bmin) / (bmax - bmin) * nbins
    idx = jnp.floor(x).astype(jnp.int32)
    if clamp:
        ok = mask
        idx = jnp.clip(idx, 0, nbins - 1)
    else:
        ok = mask & (idx >= 0) & (idx < nbins)
        idx = jnp.clip(idx, 0, nbins - 1)
    w = jnp.where(ok, jnp.broadcast_to(weight, bin_vals.shape), 0.0)
    idxf = idx.reshape(-1)
    wf = w.reshape(-1)
    hits = jnp.zeros(nbins, w.dtype).at[idxf].add(wf)
    vf = avg_vals.reshape(ncomp, -1)
    sums = jnp.zeros((nbins, ncomp), w.dtype).at[idxf].add((vf * wf).T)
    sumsq = jnp.zeros((nbins, ncomp), w.dtype).at[idxf].add((vf * vf * wf).T)
    mins = maxs = None
    if with_minmax:
        big = jnp.asarray(jnp.inf, vf.dtype)
        okf = ok.reshape(-1)
        vmin = jnp.where(okf[None], vf, big)
        vmax = jnp.where(okf[None], vf, -big)
        mins = jnp.full((nbins, ncomp), big).at[idxf].min(vmin.T)
        maxs = jnp.full((nbins, ncomp), -big).at[idxf].max(vmax.T)
    return hits, sums, sumsq, mins, maxs


@partial(jax.jit, static_argnames=("nbins",))
def joint_pdf(v1: jnp.ndarray, v2: jnp.ndarray, vol: jnp.ndarray,
              mask: jnp.ndarray,
              v1min: float, v1max: float, v2min: float, v2max: float,
              nbins: int):
    """2-D volume-weighted joint histogram (jpdf semantics: out-of-range
    values are clamped into the edge bins, jpdf.cpp:489-496).
    Returns (bin[nbins,nbins], binX1, binX2) flattened row-major [v1, v2]."""
    i1 = jnp.clip(jnp.floor((v1 - v1min) / (v1max - v1min) * nbins)
                  .astype(jnp.int32), 0, nbins - 1)
    i2 = jnp.clip(jnp.floor((v2 - v2min) / (v2max - v2min) * nbins)
                  .astype(jnp.int32), 0, nbins - 1)
    w = jnp.where(mask, jnp.broadcast_to(vol, v1.shape), 0.0).reshape(-1)
    idx = (i1 * nbins + i2).reshape(-1)
    n2 = nbins * nbins
    b = jnp.zeros(n2, w.dtype).at[idx].add(w)
    bx1 = jnp.zeros(n2, w.dtype).at[idx].add(w * v1.reshape(-1))
    bx2 = jnp.zeros(n2, w.dtype).at[idx].add(w * v2.reshape(-1))
    return b.reshape(nbins, nbins), bx1.reshape(nbins, nbins), \
        bx2.reshape(nbins, nbins)


def masked_sum(vals: jnp.ndarray, mask: jnp.ndarray,
               weight) -> jnp.ndarray:
    return jnp.sum(jnp.where(mask, vals, 0.0) * weight)


@partial(jax.jit, static_argnames=("axes",))
def directional_sum(vals: jnp.ndarray, mask: jnp.ndarray, weight,
                    axes: Tuple[int, ...]) -> jnp.ndarray:
    """Sum value*weight over masked cells along the given spatial axes
    (integral's integrate1d analog, Src/integral.cpp:13-60)."""
    return jnp.sum(jnp.where(mask, vals, 0.0) * weight, axis=axes)
