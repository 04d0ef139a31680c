"""Benchmark: derived-field pipeline on a 3-level synthetic Pele-style
plotfile, TPU (jax, float32) vs the CPU reference numerics (numpy, float64,
single process — the per-rank workload of the reference's MPI build).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = TPU pipeline wall-clock (ms); vs_baseline = cpu_time / tpu_time.
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
    import jax.numpy as jnp

    from peleanalysis_tpu.ops.fill import apply_fill, get_fill_plan
    from peleanalysis_tpu.ops.stencil import centered_gradient, magnitude
    from peleanalysis_tpu.reference_impl import numpy_grad_level

    state, raw = build_case()
    meta = state.meta
    ic = state.comp("temp")

    plans = []
    for lev in range(meta.n_levels):
        ba_c = meta.bas[lev - 1] if lev > 0 else None
        ps_c = meta.pad_shape(lev - 1) if lev > 0 else None
        ratio = meta.ref_ratio[lev - 1] if lev > 0 else 2
        plans.append(get_fill_plan(meta.bas[lev], meta.geoms[lev], 1,
                                   meta.pad_shape(lev), ba_c, ps_c, ratio,
                                   None, "linear"))

    def tpu_step(levels):
        outs = []
        for lev in range(meta.n_levels):
            crse = levels[lev - 1] if lev > 0 else None
            grown = apply_fill(plans[lev], levels[lev], crse)
            gx, gy, gz = centered_gradient(grown, meta.geoms[lev].dx, 1)
            outs.append(jnp.concatenate([gx, gy, gz, magnitude(gx, gy, gz)],
                                        axis=1))
        return outs

    data = [state.data[lev][:, ic : ic + 1] for lev in range(meta.n_levels)]
    step = jax.jit(tpu_step)
    outs = step(data)  # compile
    jax.block_until_ready(outs)

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        outs = step(data)
    jax.block_until_ready(outs)
    tpu_ms = (time.perf_counter() - t0) / n_iter * 1e3

    # CPU baseline: identical numerics, numpy float64 (reference precision)
    np_data = []
    for lev in range(meta.n_levels):
        arr = np.zeros((len(meta.bas[lev]), 1) + meta.pad_shape(lev))
        for i, f in enumerate(raw[lev]):
            sl = (i, 0) + tuple(slice(0, s) for s in f.shape[1:])
            arr[sl] = f[ic]
        np_data.append(arr)
    cpu_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for lev in range(meta.n_levels):
            crse = np_data[lev - 1] if lev > 0 else None
            numpy_grad_level(plans[lev], np_data[lev], crse,
                             meta.geoms[lev].dx)
        cpu_times.append(time.perf_counter() - t0)
    cpu_ms = min(cpu_times) * 1e3

    print(json.dumps({
        "metric": "grad_3level_pipeline_ms",
        "value": round(tpu_ms, 3),
        "unit": "ms",
        "vs_baseline": round(cpu_ms / tpu_ms, 2),
    }))


if __name__ == "__main__":
    main()
