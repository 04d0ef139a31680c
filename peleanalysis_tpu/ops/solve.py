"""Linear solves on dense levels — the MLMG/MLABecLaplacian replacement.

The reference's only real solve is the implicit smoothing step
``(I - beta ∇²) c~ = c`` in curvature (/root/reference/Src/curvature.cpp:
328-406, MLABecLaplacian + MLMG::solve).  Here each level is solved with
matrix-free conjugate gradient under jit (fixed iteration count — XLA-friendly
static control flow); coarse-fine coupling is handled by solving coarse →
fine with the fine level's ghost/hole cells pinned to the coarse solution
(the ``setCoarseFineBC`` analog).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def cg_solve(apply_A: Callable, b: jnp.ndarray, x0: jnp.ndarray,
             mask: Optional[jnp.ndarray], n_iter: int) -> jnp.ndarray:
    """Masked conjugate gradient: solves A x = b on cells where mask=True
    (off-mask cells keep x0; apply_A must treat them as boundary values)."""
    m = (mask.astype(b.dtype) if mask is not None
         else jnp.ones_like(b))

    def dot(u, v):
        return jnp.sum(u * v * m)

    tiny = jnp.finfo(b.dtype).tiny  # 1e-300 underflows to 0 in float32

    def body(carry, _):
        x, r, p, rs = carry
        Ap = apply_A(p) * m
        den = dot(p, Ap)
        alpha = jnp.where(jnp.abs(den) > tiny, rs / jnp.where(den == 0, 1., den), 0.0)
        x = x + alpha * p * m
        r = r - alpha * Ap
        rs_new = dot(r, r)
        beta = jnp.where(rs > tiny, rs_new / jnp.where(rs == 0, 1., rs), 0.0)
        p = (r + beta * p) * m
        return (x, r, p, rs_new), rs_new

    r0 = (b - apply_A(x0)) * m
    (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, r0, dot(r0, r0)),
                                   None, length=n_iter)
    return x


def cg_solve_composite(apply_A: Callable, b_list, x0_list, mask_list,
                       vol_list, n_iter: int):
    """Composite-hierarchy CG: unknowns are the VALID cells of every level
    at once (the MLMG composite-solve analog, curvature.cpp:328-406).
    apply_A maps a list of per-level arrays to a list; dots are
    volume-weighted over valid cells so levels contribute consistently."""
    import jax.numpy as jnp

    ms = [m.astype(b_list[0].dtype) * v for m, v in zip(mask_list, vol_list)]

    def dot(us, vs):
        return sum(jnp.sum(u * v * m) for u, v, m in zip(us, vs, ms))

    def mask_mul(us):
        return [u * (m > 0) for u, m in zip(us, mask_list)]

    tiny = jnp.finfo(b_list[0].dtype).tiny  # 1e-300 underflows in float32

    def body(carry, _):
        x, r, p, rs = carry
        Ap = mask_mul(apply_A(p))
        den = dot(p, Ap)
        alpha = jnp.where(jnp.abs(den) > tiny,
                          rs / jnp.where(den == 0, 1., den), 0.0)
        x = [xi + alpha * pi * mi for xi, pi, mi in zip(x, p, mask_list)]
        r = [ri - alpha * api for ri, api in zip(r, Ap)]
        rs_new = dot(r, r)
        beta = jnp.where(rs > tiny, rs_new / jnp.where(rs == 0, 1., rs), 0.0)
        p = [(ri + beta * pi) * mi for ri, pi, mi in zip(r, p, mask_list)]
        return (x, r, p, rs_new), None

    r0 = mask_mul([bi - ai for bi, ai in
                   zip(b_list, apply_A(x0_list))])
    init = (list(x0_list), r0, list(r0), dot(r0, r0))
    (x, _, _, _), _ = jax.lax.scan(body, init, None, length=n_iter)
    return x
