"""Benchmark: the BASELINE.json composite — grad + curvature + isosurface on
a 3-level synthetic Pele-style plotfile.  TPU (jax float32, dense canonical
levels) vs the CPU reference numerics (numpy float64, single process — one
rank of the reference's MPI build).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = TPU composite wall-clock (ms); vs_baseline = cpu_ms / tpu_ms.

Timing notes: this container's tunnel runtime executes lazily with ~30 ms
fetch latency, so device phases are timed as K-step on-device dependency
chains with one scalar fetch (fetch latency measured separately and
subtracted); the isosurface is timed end-to-end (device classify + host
compaction), like a user running the tool.
"""
from __future__ import annotations

import json
import time

import numpy as np


def build_case(n_cell=64, n_levels=3, max_grid_size=32):
    from peleanalysis_tpu.amr.hierarchy import AmrMeta, AmrState
    from peleanalysis_tpu.testing import (default_fields, make_amr_hierarchy,
                                          make_level_data)

    geoms, bas, ratios = make_amr_hierarchy(
        n_cell=n_cell, n_levels=n_levels, max_grid_size=max_grid_size)
    names, data = make_level_data(geoms, bas, default_fields(3))
    meta = AmrMeta(geoms, bas, ratios)
    return AmrState.from_arrays(meta, names, data, dtype=np.float32), data


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from peleanalysis_tpu.amr.dense import DenseAmrState
    from peleanalysis_tpu.geom.marching_cubes import extract_isosurface
    from peleanalysis_tpu.ops.dense_fill import fill_dense_multilevel
    from peleanalysis_tpu.ops.fill import get_fill_plan
    from peleanalysis_tpu.ops.stencil import centered_gradient, magnitude
    from peleanalysis_tpu.reference_impl import (numpy_curvature,
                                                 numpy_grad_level)

    state, raw = build_case()
    meta = state.meta
    n_lev = meta.n_levels
    ic = state.comp("temp")
    ip = state.comp("progress")
    dstate = DenseAmrState.from_batched(state)
    masks = [dstate.in_level_mask(l) for l in range(n_lev)]
    lmeta = dstate.lmeta

    def mlgrad_all(fields, mask_list):
        grown = fill_dense_multilevel(meta, lmeta, fields, mask_list, 1,
                                      None, "linear")
        return [centered_gradient(g, meta.geoms[lev].dx, 1)
                for lev, g in enumerate(grown)]

    def grad_chain(levels, mask_list):
        outs = []
        for lev, (gx, gy, gz) in enumerate(mlgrad_all(levels, mask_list)):
            outs.append(magnitude(gx, gy, gz))
        return [o / (jnp.max(o) + 1.0) for o in outs]

    def curv_chain(levels, mask_list):
        # gradient -> normal -> div(normal) + grad-of-grad Hessian -> Kg
        g = mlgrad_all(levels, mask_list)
        G = [jnp.concatenate(gl, 0) for gl in g]
        normg = [-jnp.maximum(1e-14, jnp.sqrt(jnp.sum(Gl**2, 0, keepdims=True)))
                 for Gl in G]
        N = [G[l] / normg[l] for l in range(n_lev)]
        gN = [mlgrad_all([N[l][d][None] for l in range(n_lev)], mask_list)
              for d in range(3)]
        gG = [mlgrad_all([G[l][i][None] for l in range(n_lev)], mask_list)
              for i in range(3)]
        outs = []
        for lev in range(n_lev):
            div = sum(gN[d][lev][d][0] for d in range(3))
            H = [[gG[i][lev][j][0] for j in range(3)] for i in range(3)]
            adj_num = 0.0
            for i in range(3):
                for j in range(3):
                    a = (H[(i + 1) % 3][(j + 1) % 3] * H[(i + 2) % 3][(j + 2) % 3]
                         - H[(i + 1) % 3][(j + 2) % 3] * H[(i + 2) % 3][(j + 1) % 3])
                    adj_num = adj_num + G[lev][i] * a * G[lev][j]
            Kg = adj_num / normg[lev][0] ** 4
            Km = 0.5 * div
            outs.append(Km + 1e-6 * Kg)
        return [o[None] / (jnp.max(jnp.abs(o)) + 1.0) for o in outs]

    data_t = [d[ic : ic + 1] for d in dstate.data]
    data_p = [d[ip : ip + 1] for d in dstate.data]

    def timed_chain(fn, data, K):
        step = jax.jit(fn)
        fetch = jax.jit(lambda ls: sum(jnp.sum(x) for x in ls))
        cur = step(data, masks)
        _ = float(fetch(cur))
        fl = min(_fetch_lat(fetch, data) for _ in range(3))
        t0 = time.perf_counter()
        cur = data
        for _ in range(K):
            cur = step(cur, masks)
        _ = float(fetch(cur))
        return max(time.perf_counter() - t0 - fl, 1e-9) / K * 1e3

    def _fetch_lat(fetch, data):
        t0 = time.perf_counter()
        _ = float(fetch(data))
        return time.perf_counter() - t0

    grad_ms = timed_chain(grad_chain, data_t, 60)
    curv_ms = timed_chain(curv_chain, data_p, 20)

    # isosurface: end-to-end tool wall-clock (device classify + host phases)
    iso_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        mef = extract_isosurface(dstate, "temp", 1000.0)
        iso_times.append(time.perf_counter() - t0)
    iso_ms = min(iso_times) * 1e3
    tpu_ms = grad_ms + curv_ms + iso_ms

    # ---- CPU baseline: same numerics in numpy float64 ----------------------
    plans = []
    for lev in range(n_lev):
        ba_c = meta.bas[lev - 1] if lev > 0 else None
        ps_c = meta.pad_shape(lev - 1) if lev > 0 else None
        ratio = meta.ref_ratio[lev - 1] if lev > 0 else 2
        plans.append(get_fill_plan(meta.bas[lev], meta.geoms[lev], 1,
                                   meta.pad_shape(lev), ba_c, ps_c, ratio,
                                   None, "linear"))
    np_t, np_p = [], []
    for lev in range(n_lev):
        for arrs, comp in ((np_t, ic), (np_p, ip)):
            a = np.zeros((len(meta.bas[lev]), 1) + meta.pad_shape(lev))
            for i, f in enumerate(raw[lev]):
                sl = (i, 0) + tuple(slice(0, s) for s in f.shape[1:])
                a[sl] = f[comp]
            arrs.append(a)
    dxs = [meta.geoms[lev].dx for lev in range(n_lev)]

    t0 = time.perf_counter()
    for lev in range(n_lev):
        numpy_grad_level(plans[lev], np_t[lev],
                         np_t[lev - 1] if lev > 0 else None, dxs[lev])
    cpu_grad = time.perf_counter() - t0
    t0 = time.perf_counter()
    numpy_curvature(plans, np_p, dxs)
    cpu_curv = time.perf_counter() - t0
    t0 = time.perf_counter()
    extract_isosurface(dstate, "temp", 1000.0, classify="numpy")
    cpu_iso = time.perf_counter() - t0
    cpu_ms = (cpu_grad + cpu_curv + cpu_iso) * 1e3

    print(json.dumps({
        "metric": "grad_curv_iso_3level_ms",
        "value": round(tpu_ms, 3),
        "unit": "ms",
        "vs_baseline": round(cpu_ms / tpu_ms, 2),
        "detail": {
            "grad_ms": round(grad_ms, 3),
            "curvature_ms": round(curv_ms, 3),
            "isosurface_ms": round(iso_ms, 3),
            "cpu_grad_ms": round(cpu_grad * 1e3, 1),
            "cpu_curvature_ms": round(cpu_curv * 1e3, 1),
            "cpu_isosurface_ms": round(cpu_iso * 1e3, 1),
        },
    }))


if __name__ == "__main__":
    main()
