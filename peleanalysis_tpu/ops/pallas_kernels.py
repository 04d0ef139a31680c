"""Pallas TPU kernels for the hot stencil ops.

Status/measurement (v5e, 254^3 f32): the Pallas grad+magnitude kernel below
is bit-exact vs the jnp path but ~4x SLOWER — XLA already fuses this
memory-bound stencil into a single optimal HBM pass, and the hand-scheduled
single-buffered DMA slab pipeline cannot beat it ("let XLA fuse — don\'t
hand-schedule what the compiler already does").  It therefore ships
flag-gated off (use_pallas=False default) as validated kernel
infrastructure; Pallas effort is reserved for ops where XLA underperforms
(irregular gathers in streamline sampling, cross-chip RDMA halo rings).

Falls back transparently to the jnp path on platforms where Mosaic is
unavailable (tests run it in interpreter mode on CPU).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _grad_mag_kernel(g_hbm, out_ref, scratch, sem, *, tile_x, inv2dx):
    """One grid step: DMA slab [tile_x+2, Y+2, Zp] -> VMEM, emit
    [4, tile_x, Y, Zp-2] gradient+magnitude."""
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        g_hbm.at[pl.ds(i * tile_x, tile_x + 2)], scratch, sem)
    dma.start()
    dma.wait()
    s = scratch
    c = s[1:-1, 1:-1, 1:-1]
    gx = (s[2:, 1:-1, 1:-1] - s[:-2, 1:-1, 1:-1]) * inv2dx[0]
    gy = (s[1:-1, 2:, 1:-1] - s[1:-1, :-2, 1:-1]) * inv2dx[1]
    gz = (s[1:-1, 1:-1, 2:] - s[1:-1, 1:-1, :-2]) * inv2dx[2]
    del c
    out_ref[0] = gx
    out_ref[1] = gy
    out_ref[2] = gz
    out_ref[3] = jnp.sqrt(gx * gx + gy * gy + gz * gz)


@functools.partial(jax.jit, static_argnames=("dx", "tile_x", "interpret"))
def grad_mag_pallas(grown: jnp.ndarray, dx: Tuple[float, float, float],
                    tile_x: int = 4, interpret: bool = False) -> jnp.ndarray:
    """grown [X+2, Y+2, Z+2] (1 ghost ring) -> [4, X, Y, Z] in one HBM pass.
    Z is padded to a lane multiple internally."""
    X = grown.shape[0] - 2
    Y = grown.shape[1] - 2
    Z = grown.shape[2] - 2
    Zp = _round_up(Z + 2, 128)
    Xp = _round_up(X, tile_x)
    g = jnp.pad(grown, ((0, Xp - X), (0, 0), (0, Zp - (Z + 2))))
    inv2dx = tuple(np.float32(1.0 / (2.0 * d)) for d in dx)

    out = pl.pallas_call(
        functools.partial(_grad_mag_kernel, tile_x=tile_x, inv2dx=inv2dx),
        grid=(Xp // tile_x,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (4, tile_x, Y, Zp - 2),
            lambda i: (0, i, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, Xp, Y, Zp - 2), grown.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_x + 2, Y + 2, Zp), grown.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(g)
    return out[:, :X, :, :Z]


def grad_mag(grown: jnp.ndarray, dx, use_pallas: bool = False,
             interpret: bool = False) -> jnp.ndarray:
    """Dispatch: Pallas on TPU, fused jnp slicing elsewhere."""
    if use_pallas and HAVE_PALLAS and (
            interpret or jax.devices()[0].platform not in ("cpu",)):
        return grad_mag_pallas(grown, tuple(float(d) for d in dx),
                               interpret=interpret)
    from .stencil import centered_gradient, magnitude
    gx, gy, gz = centered_gradient(grown[None], dx, 1)
    return jnp.concatenate([gx, gy, gz, magnitude(gx, gy, gz)], axis=0)
