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
             mask: Optional[jnp.ndarray], n_iter: int,
             rtol: Optional[float] = None) -> jnp.ndarray:
    """Masked conjugate gradient: solves A x = b on cells where mask=True
    (off-mask cells keep x0; apply_A must treat them as boundary values).

    rtol=None: fixed n_iter iterations (lax.scan — cheapest compile).
    rtol>0: iterate until ||r|| <= rtol*||r0|| or n_iter, via lax.while_loop
    (the MLMG::solve tolerance semantics, curvature.cpp:336-406)."""
    m = (mask.astype(b.dtype) if mask is not None
         else jnp.ones_like(b))

    def dot(u, v):
        return jnp.sum(u * v * m)

    tiny = jnp.finfo(b.dtype).tiny  # 1e-300 underflows to 0 in float32

    def step(x, r, p, rs):
        Ap = apply_A(p) * m
        den = dot(p, Ap)
        alpha = jnp.where(jnp.abs(den) > tiny,
                          rs / jnp.where(den == 0, 1., den), 0.0)
        x = x + alpha * p * m
        r = r - alpha * Ap
        rs_new = dot(r, r)
        beta = jnp.where(rs > tiny, rs_new / jnp.where(rs == 0, 1., rs), 0.0)
        p = (r + beta * p) * m
        return x, r, p, rs_new

    r0 = (b - apply_A(x0)) * m
    rs0 = dot(r0, r0)
    if rtol is None:
        def body(carry, _):
            return step(*carry), None
        (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, r0, rs0),
                                       None, length=n_iter)
        return x

    target = rs0 * (rtol * rtol)

    def cond(carry):
        _, _, _, rs, it = carry
        return (rs > target) & (it < n_iter)

    def wbody(carry):
        x, r, p, rs, it = carry
        x, r, p, rs = step(x, r, p, rs)
        return (x, r, p, rs, it + 1)

    x, _, _, _, _ = jax.lax.while_loop(
        cond, wbody, (x0, r0, r0, rs0, jnp.asarray(0, jnp.int32)))
    return x


def cg_solve_composite(apply_A: Callable, b_list, x0_list, mask_list,
                       vol_list, n_iter: int, rtol: Optional[float] = None):
    """Composite-hierarchy CG: unknowns are the VALID cells of every level
    at once (the MLMG composite-solve analog, curvature.cpp:328-406).
    apply_A maps a list of per-level arrays to a list; dots are
    volume-weighted over valid cells so levels contribute consistently.

    rtol=None: fixed n_iter (lax.scan).  rtol>0: run until
    ||r|| <= rtol*||r0|| with n_iter as the cap (MLMG::solve semantics)."""
    import jax.numpy as jnp

    ms = [m.astype(b_list[0].dtype) * v for m, v in zip(mask_list, vol_list)]

    def dot(us, vs):
        return sum(jnp.sum(u * v * m) for u, v, m in zip(us, vs, ms))

    def mask_mul(us):
        return [u * (m > 0) for u, m in zip(us, mask_list)]

    tiny = jnp.finfo(b_list[0].dtype).tiny  # 1e-300 underflows in float32

    def step(x, r, p, rs):
        Ap = mask_mul(apply_A(p))
        den = dot(p, Ap)
        alpha = jnp.where(jnp.abs(den) > tiny,
                          rs / jnp.where(den == 0, 1., den), 0.0)
        x = [xi + alpha * pi * mi for xi, pi, mi in zip(x, p, mask_list)]
        r = [ri - alpha * api for ri, api in zip(r, Ap)]
        rs_new = dot(r, r)
        beta = jnp.where(rs > tiny, rs_new / jnp.where(rs == 0, 1., rs), 0.0)
        p = [(ri + beta * pi) * mi for ri, pi, mi in zip(r, p, mask_list)]
        return x, r, p, rs_new

    r0 = mask_mul([bi - ai for bi, ai in
                   zip(b_list, apply_A(x0_list))])
    rs0 = dot(r0, r0)
    if rtol is None:
        def body(carry, _):
            return step(*carry), None
        init = (list(x0_list), r0, list(r0), rs0)
        (x, _, _, _), _ = jax.lax.scan(body, init, None, length=n_iter)
        return x

    target = rs0 * (rtol * rtol)

    def cond(carry):
        _, _, _, rs, it = carry
        return (rs > target) & (it < n_iter)

    def wbody(carry):
        x, r, p, rs, it = carry
        x, r, p, rs = step(x, r, p, rs)
        return (x, r, p, rs, it + 1)

    x, _, _, _, _ = jax.lax.while_loop(
        cond, wbody,
        (list(x0_list), r0, list(r0), rs0, jnp.asarray(0, jnp.int32)))
    return x


def cg_iterations_to_tol(apply_A: Callable, b_list, x0_list, mask_list,
                         vol_list, rtol: float, max_iter: int = 500) -> int:
    """Diagnostic: run composite CG step-by-step (eager) and return the
    iteration count needed to reach rtol — used by tests to document the
    curvature-smoothing defaults."""
    import jax.numpy as jnp

    ms = [m.astype(b_list[0].dtype) * v for m, v in zip(mask_list, vol_list)]

    def dot(us, vs):
        return sum(float(jnp.sum(u * v * m)) for u, v, m in zip(us, vs, ms))

    def mask_mul(us):
        return [u * (m > 0) for u, m in zip(us, mask_list)]

    x = list(x0_list)
    r = mask_mul([bi - ai for bi, ai in zip(b_list, apply_A(x))])
    p = list(r)
    rs = dot(r, r)
    rs0 = rs
    for it in range(max_iter):
        if rs <= rs0 * rtol * rtol:
            return it
        Ap = mask_mul(apply_A(p))
        den = dot(p, Ap)
        alpha = 0.0 if den == 0 else rs / den
        x = [xi + alpha * pi * (mi > 0) for xi, pi, mi in zip(x, p, mask_list)]
        r = [ri - alpha * api for ri, api in zip(r, Ap)]
        rs_new = dot(r, r)
        beta = 0.0 if rs == 0 else rs_new / rs
        p = [(ri + beta * pi) * (mi > 0) for ri, pi, mi in zip(r, p, mask_list)]
        rs = rs_new
    return max_iter
