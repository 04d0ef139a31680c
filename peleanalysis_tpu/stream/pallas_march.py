"""Pallas TPU kernel for the RK4 streamline march.

The XLA path (stream/trace.py) is gathered-bytes bound: 4 RK4 stages x
n_steps sequential 8-corner random gathers cost ~0.5-1 GB/s on TPU
(NOTES.md r1 measurements).  This kernel removes the per-stage gathers
entirely:

  * lines are processed in chunks of L; each line DMAs ONE field block from
    HBM into VMEM that covers every trilinear stencil the line can touch for
    the next K steps;
  * Mosaic DMA windows on tiled HBM memrefs must be (8,128)-tile aligned in
    the last two dims, so the block is [BX=8 (dim0: free), BY=16 (8-aligned),
    BZL=256 lanes (128-aligned) of the z*C-fused minor dim] — z margins are
    generous, x/y margins set K = floor(3/h_cells) - 1 steps per fetch;
  * the march runs K steps on the VPU with separable hat-weight
    contractions over the resident block — the hat weights
    max(0, 1-|xc - lane|) reproduce the XLA path's (1-t, t) trilinear
    weights exactly on interior stencils (stream_nd.f90:153-206 ntrpv);
  * rounds are chained pallas_calls inside one jit: each round's final
    positions produce the next round's block bases, which enter the next
    call as an SMEM block (the canonical scalar-prefetch DMA pattern).

Alive/freeze semantics match _trace_level: a step is rejected (position
frozen) when any stage's stencil base leaves the grown volume.

Replaces the hot loop of /root/reference/Src/stream_nd.f90:53-151 (vtrace:
per-seed RK4 + ntrpv) the TPU way.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BX = 8       # x extent of the resident block (dim 0: freely sliceable)
BY = 16      # y extent (sublane dim: 8-aligned start, 8-multiple size)
BZL = 256    # z*C lanes (lane dim: 128-aligned start, 128-multiple size)

# field padding so block bases NEVER clip at volume edges: the start offset
# of every line inside its block is then an exact invariant (x in [3,4),
# y in [4,12), z*C in [64,192) lanes), which lets the kernel statically
# skip block slices whose hat weight is provably zero (see interp()).
PADX = (4, 4)        # free dim
PADY = (8, 16)       # lo pad must stay 8-aligned for by
PADZ = (128, 192)    # lanes; lo pad 128-aligned for bzl


def _block_bases(pos, plo, dx, S, C):
    """Aligned per-line block bases (padded-field indices) from positions —
    same formula in XLA and in-kernel so the chained rounds agree.
    pos [N,3] -> [N,3] int32 (bx, by, bzl).  Bases derived from any ok
    (or earlier-frozen) position are in-bounds by construction of the pads:
    floor(xc) in [0, S-2] => bx in [PADX[0]-3, S-5+PADX[0]]."""
    xc = [(pos[:, d] - plo[d]) / dx[d] - 0.5 for d in range(3)]
    bx = jnp.floor(xc[0]).astype(jnp.int32) - 3 + PADX[0]
    by = (jnp.floor((xc[1] - 4.0) / 8.0) * 8).astype(jnp.int32) + PADY[0]
    bzl = (jnp.floor((C * xc[2] - 64.0) / 128.0)
           * 128).astype(jnp.int32) + PADZ[0]
    # clamp defensively for dead lines frozen at out-of-range positions
    bx = jnp.clip(bx, 0, S[0] + sum(PADX) - BX)
    by = jnp.clip(by // 8 * 8, 0, (S[1] + sum(PADY) - BY) // 8 * 8)
    bzl = jnp.clip(bzl // 128 * 128,
                   0, (C * S[2] + sum(PADZ) - BZL) // 128 * 128)
    return jnp.stack([bx, by, bzl], axis=1)


def _round_kernel(C: int, L: int, K: int, S: Tuple[int, int, int],
                  plo, dx, h, block_dtype=jnp.float32):
    """Kernel body for one K-step round."""
    tiny = float(np.finfo(np.float32).tiny)

    def kernel(bases_smem, field, pos_ref, alive_ref, dirs_ref, basev_ref,
               traj_ref, npos_ref, nalive_ref, nbase_ref, blocks, sems):
        # ---- fetch every line's block: L DMAs in flight, then wait all ----
        def get_dma(l):
            bx = bases_smem[l, 0]
            by = pl.multiple_of(bases_smem[l, 1], 8)
            bz = pl.multiple_of(bases_smem[l, 2], 128)
            return pltpu.make_async_copy(
                field.at[pl.ds(bx, BX), pl.ds(by, BY), pl.ds(bz, BZL)],
                blocks.at[l], sems.at[l])

        def issue(l, _):
            get_dma(l).start()
            return _

        def wait(l, _):
            get_dma(l).wait()
            return _

        jax.lax.fori_loop(0, L, issue, None)
        jax.lax.fori_loop(0, L, wait, None)

        # unpadded-grid coordinates of the block lattice (bases are padded
        # indices; subtract the pads once here — as an iota-derived vector,
        # pallas kernels may not capture array constants)
        col = jax.lax.broadcasted_iota(jnp.int32, (L, 3), 1)
        pads = ((col == 0) * PADX[0] + (col == 1) * PADY[0]
                + (col == 2) * PADZ[0])
        base_u = basev_ref[:] - pads                       # [L,3]
        base_f = base_u.astype(jnp.float32)
        basez = base_u[:, 2:3]                             # [L,1] int32
        dirs = dirs_ref[:]                                 # [L,1]
        lane_x = jax.lax.broadcasted_iota(
            jnp.int32, (L, BX), 1).astype(jnp.float32)
        lane_y = jax.lax.broadcasted_iota(
            jnp.int32, (L, BY), 1).astype(jnp.float32)
        lane_zc = jax.lax.broadcasted_iota(jnp.int32, (L, BZL), 1) + basez
        z_of_lane = (lane_zc // C).astype(jnp.float32)     # [L,BZL]
        c_of_lane = lane_zc % C
        c_masks = [(c_of_lane == c).astype(jnp.float32) for c in range(C)]

        h_cells = float(h) / float(min(dx))

        def interp(x, reach):
            """Separable hat-weight trilinear sample of the resident blocks.
            x: [L,3] -> (v [L,C], ok [L]).

            `reach` (static, in finest cells) bounds |x - round start|: the
            hat weight of block slice i is provably zero outside
            (start_offset - reach - 1, start_offset + reach + 1), so early
            steps of a round skip the slices they cannot touch — EXACTLY
            (dropping zero terms leaves the remaining sum order unchanged).
            The kernel is VMEM-read bound (measured: compute-only 81 ms vs
            dma-only 37 ms at 8192x25), so block reads are the march.
            """
            xc = [(x[:, d] - plo[d]) / dx[d] - 0.5 for d in range(3)]
            b = [jnp.floor(xc[d]) for d in range(3)]
            ok = ((b[0] >= 0) & (b[0] + 1 <= S[0] - 1)
                  & (b[1] >= 0) & (b[1] + 1 <= S[1] - 1)
                  & (b[2] >= 0) & (b[2] + 1 <= S[2] - 1))
            wx = jnp.maximum(
                0.0, 1.0 - jnp.abs(xc[0][:, None] - (base_f[:, 0:1]
                                                     + lane_x)))
            wy = jnp.maximum(
                0.0, 1.0 - jnp.abs(xc[1][:, None] - (base_f[:, 1:2]
                                                     + lane_y)))
            wz = jnp.maximum(0.0, 1.0 - jnp.abs(xc[2][:, None] - z_of_lane))

            # nonzero-slice windows: x start offset in [3,4), y in [4,12)
            # (see _block_bases); both conservatively widened by `reach`
            ilo = max(0, int(np.floor(2.0 - reach)) + 1)
            ihi = min(BX - 1, int(np.ceil(5.0 + reach)) - 1)
            jlo = max(0, int(np.floor(3.0 - reach)) + 1)
            jhi = min(BY - 1, int(np.ceil(13.0 + reach)) - 1)

            # separable contraction (a fully fused 128-term x*y loop ran out
            # of VMEM at compile; the two-pass form compiles and runs)
            acc = None                                     # x-contract
            for i in range(ilo, ihi + 1):
                # bf16 blocks halve the VMEM read bytes (the kernel's
                # bound); the multiply upconverts to f32 on the VPU
                blk = blocks[:, i].astype(jnp.float32)
                term = blk * wx[:, i][:, None, None]           # [L,BY,BZL]
                acc = term if acc is None else acc + term
            acc2 = None                                    # y-contract
            for j in range(jlo, jhi + 1):
                term = acc[:, j] * wy[:, j][:, None]       # [L,BZL]
                acc2 = term if acc2 is None else acc2 + term
            t3 = acc2 * wz                                 # [L,BZL]
            v = jnp.stack([jnp.sum(t3 * m, axis=1) for m in c_masks],
                          axis=1)                          # [L,C]
            return v, ok

        def unit(x, reach):
            v, ok = interp(x, reach)
            n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
            return dirs * v / jnp.maximum(n, tiny), ok

        pos = pos_ref[:]                                   # [L,3]
        alive = alive_ref[:, 0] > 0                        # [L]
        for k in range(K):
            # step-k stage evals stay within (k+1) unit-speed steps of the
            # round start (frozen lines keep an earlier, closer position)
            r = (k + 1) * h_cells + 1e-6
            k1, o1 = unit(pos, r)
            k2, o2 = unit(pos + 0.5 * h * k1, r)
            k3, o3 = unit(pos + 0.5 * h * k2, r)
            k4, o4 = unit(pos + h * k3, r)
            xn = pos + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            okk = o1 & o2 & o3 & o4
            alive = alive & okk
            pos = jnp.where(alive[:, None], xn, pos)
            traj_ref[:, k, :] = pos

        npos_ref[:] = pos
        nalive_ref[:] = alive[:, None].astype(jnp.int32)
        # next round's block bases from the final positions (same padded
        # formula as _block_bases)
        xc = [(pos[:, d] - plo[d]) / dx[d] - 0.5 for d in range(3)]
        nbx = jnp.clip(
            jnp.floor(xc[0]).astype(jnp.int32) - 3 + PADX[0],
            0, S[0] + sum(PADX) - BX)
        nby = jnp.clip(
            (jnp.floor((xc[1] - 4.0) / 8.0) * 8).astype(jnp.int32)
            + PADY[0], 0, (S[1] + sum(PADY) - BY) // 8 * 8)
        nbz = jnp.clip(
            (jnp.floor((C * xc[2] - 64.0) / 128.0) * 128).astype(jnp.int32)
            + PADZ[0], 0, (C * S[2] + sum(PADZ) - BZL) // 128 * 128)
        nbase_ref[:] = jnp.stack([nbx, nby, nbz], axis=1)

    return kernel


@partial(jax.jit, static_argnames=("K", "L", "consts", "interpret"))
def _march_round(field_zc, pos, alive, bases, dirs, K: int, L: int,
                 consts, interpret: bool = False):
    """One K-step round over all lines (grid over L-line chunks)."""
    S, plo, dx, h, C, bdt = consts
    N = pos.shape[0]
    kernel = _round_kernel(C, L, K, S, plo, dx, h, bdt)
    grid = (N // L,)

    def blockL(*tail):
        nt = len(tail)
        return pl.BlockSpec((L,) + tail, lambda i: (i,) + (0,) * nt)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 3), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            blockL(3),
            blockL(1),
            blockL(1),
            blockL(3),
        ],
        out_specs=(blockL(K, 3), blockL(3), blockL(1), blockL(3)),
        out_shape=(
            jax.ShapeDtypeStruct((N, K, 3), jnp.float32),
            jax.ShapeDtypeStruct((N, 3), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, 3), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((L, BX, BY, BZL), jnp.dtype(bdt)),
            pltpu.SemaphoreType.DMA((L,)),
        ],
        interpret=interpret,
    )(bases, field_zc, pos, alive, dirs, bases)
    return out


def prepare_field(vec: jnp.ndarray, block_dtype=jnp.float32) -> jnp.ndarray:
    """Lay out [C,SX,SY,SZ] -> the kernel's padded z*C-fused field.

    Jittable and separable from the march so a chunked caller pays the
    transpose+pad ONCE per level instead of once per chunk (the layout
    moves the whole field through HBM; chunks reuse the result via
    ``march_pallas(..., prepared_shape=vec.shape)``).

    comp-minor z-fused layout: one contiguous [BX,BY,BZL] box per DMA;
    edge-padded so bases never clip (pad values are read only with weight
    exactly 0, but must be finite — edge mode guarantees it)."""
    C, SX, SY, SZ = vec.shape
    field_zc = jnp.transpose(vec, (1, 2, 3, 0)).reshape(
        SX, SY, SZ * C).astype(block_dtype)
    return jnp.pad(field_zc, (PADX, PADY, PADZ), mode="edge")


def march_pallas(vec: jnp.ndarray, plo, dx, h, seeds: jnp.ndarray,
                 n_steps: int, dirs: jnp.ndarray,
                 L: int = 32, interpret: bool = False,
                 block_dtype=jnp.float32, prepared_shape=None) -> jnp.ndarray:
    """March seeds n_steps (RK4, normalized vector = arclength steps).

    vec: [C, SX, SY, SZ] traced vector field; seeds [N,3]; dirs [N] (+-1).
    Returns pos [n_steps+1, N, 3] matching _trace_level's layout.
    block_dtype=jnp.bfloat16 stores the resident VMEM blocks (and DMAs)
    in bf16 — half the bytes on the kernel's VMEM-read bound; the same
    accuracy class as the XLA path's default bfloat16 field marching.
    prepared_shape: pass the ORIGINAL [C,SX,SY,SZ] shape when ``vec`` is
    already the output of :func:`prepare_field` (chunked callers).
    """
    if prepared_shape is not None:
        C, SX, SY, SZ = prepared_shape
        field_zc = vec
    else:
        C, SX, SY, SZ = vec.shape
    S = (SX, SY, SZ)
    if SY < BY or C * SZ < BZL or SX < BX:
        raise ValueError("field too small for the pallas march block; "
                         "use the XLA path")
    if prepared_shape is None:
        field_zc = prepare_field(vec, block_dtype)
    N = seeds.shape[0]
    pad = (-N) % L
    if pad:
        seeds = jnp.concatenate(
            [seeds, jnp.broadcast_to(seeds[:1], (pad, 3))])
        dirs = jnp.concatenate([dirs, jnp.zeros((pad,), dirs.dtype)])
    Np = seeds.shape[0]
    seeds32 = seeds.astype(jnp.float32)
    dirs32 = dirs.astype(jnp.float32).reshape(Np, 1)

    h_cells = float(h) / float(min(dx))
    if h_cells > 3.0:
        raise ValueError(
            f"march step {h_cells:.2f} cells exceeds the resident-block "
            "margin (3 cells/round); use the XLA engine for this step size")
    K = max(int(np.floor(3.0 / h_cells - 1.0 + 1e-9)), 1)
    consts = (S, tuple(float(v) for v in plo),
              tuple(float(v) for v in dx), float(h), C,
              jnp.dtype(block_dtype).name)

    bases = _block_bases(seeds32, consts[1], consts[2], S, C)
    pos = seeds32
    alive = jnp.ones((Np, 1), jnp.int32)

    # rounds as ONE lax.scan over a single pallas_call instance: a Python
    # round-loop inlined `rounds` copies of the kernel into the graph and
    # multiplied Mosaic compile time; the trailing partial round is padded
    # to K steps and sliced off (extra stations are computed then dropped —
    # kept stations are bit-identical, steps are sequential)
    rounds = -(-n_steps // K)

    def body(carry, _):
        p, a, b = carry
        traj, p, a, b = _march_round(field_zc, p, a, b, dirs32, K, L,
                                     consts, interpret)
        return (p, a, b), traj                            # [Np, K, 3]

    _, trajs = jax.lax.scan(body, (pos, alive, bases), None, length=rounds)
    stations = jnp.transpose(trajs, (0, 2, 1, 3)).reshape(
        rounds * K, Np, 3)
    out = jnp.concatenate([seeds32[None], stations[:n_steps]], axis=0)
    return out[:, :N]
