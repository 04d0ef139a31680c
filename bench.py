"""Benchmark: the BASELINE.json composite — grad + curvature + isosurface on
a 3-level synthetic Pele-style plotfile.  TPU (jax float32, dense canonical
levels) vs the CPU reference numerics (numpy float64, single process — one
rank of the reference's MPI build).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = TPU composite wall-clock (ms); vs_baseline = cpu_ms / tpu_ms, where
cpu_ms comes from the PINNED oracle timings in BASELINE_CPU.json (the live
numbers swing 2-3x with container host load; PELE_BENCH_LIVE_CPU=1
re-measures them — detail.cpu_source says which was used).

WEATHER-PROOFING (VERDICT r4 #1 — the round-4 driver metric was LOST to an
rc=124 timeout): every section after the core composite is optional and
budget-guarded; partial results checkpoint to BENCH_PARTIAL.json after each
section; a watchdog thread hard-emits the summary line and exits 0 when
PELE_BENCH_BUDGET_S (default 780 s) expires, and SIGTERM does the same — so
the JSON line prints from whatever completed under ANY compile-service
weather.  The reference's per-run self-timers always print
(/root/reference/Src/isosurface.cpp:1756-1772); so must ours.

Timing notes: this container's tunnel runtime executes lazily with ~30 ms
fetch latency, so device phases are timed as K-step on-device dependency
chains with one scalar fetch (fetch latency measured separately and
subtracted); the isosurface is timed end-to-end (device classify + host
compaction), like a user running the tool.
"""
from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

import numpy as np

_T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("PELE_BENCH_BUDGET_S", "780"))
_LOCK = threading.Lock()
_EMITTED = False
RESULT = {
    "metric": "grad_curv_iso_3level_ms",
    "value": None,
    "unit": "ms",
    "vs_baseline": None,
    "detail": {"sections": {}},
}
DETAIL = RESULT["detail"]


def _elapsed() -> float:
    return time.perf_counter() - _T_START


def _remaining() -> float:
    return BUDGET_S - _elapsed()


def _save_partial() -> None:
    try:
        tmp = "BENCH_PARTIAL.json.tmp"
        with open(tmp, "w") as f:
            json.dump(RESULT, f, indent=1)
        os.replace(tmp, "BENCH_PARTIAL.json")
    except Exception:
        pass


def _emit() -> None:
    """Print the single summary JSON line exactly once, from whatever has
    completed.  If the core composite never finished, fall back to the last
    recorded round's numbers FLAGGED as stale (never a silent fresh-looking
    value)."""
    global _EMITTED
    with _LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        if RESULT["value"] is None:
            stale = None
            try:
                import glob
                recs = sorted(glob.glob("BENCH_r*.json"))
                for rec in reversed(recs):
                    with open(rec) as f:
                        p = json.load(f).get("parsed")
                    if p and p.get("value") is not None:
                        stale = p
                        break
            except Exception:
                stale = None
            if stale:
                RESULT["value"] = stale.get("value")
                RESULT["vs_baseline"] = stale.get("vs_baseline")
                DETAIL["stale_core"] = (
                    "core composite did not finish this run; value/"
                    "vs_baseline reuse the last recorded round (stale)")
        DETAIL["bench_elapsed_s"] = round(_elapsed(), 1)
        print(json.dumps(RESULT), flush=True)
        _save_partial()


def _watchdog() -> None:
    while True:
        left = BUDGET_S - _elapsed()
        if left <= 0:
            break
        time.sleep(min(left, 5.0))
    DETAIL["budget_expired_in"] = DETAIL.get("_section", "?")
    DETAIL.pop("_section", None)
    _emit()
    os._exit(0)


def _install_guards() -> None:
    threading.Thread(target=_watchdog, daemon=True).start()

    def on_term(signum, frame):
        DETAIL["killed_in"] = DETAIL.get("_section", "?")
        DETAIL.pop("_section", None)
        _emit()
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, on_term)
        except Exception:
            pass


def section(name: str, est_s: float, fn, ctx) -> None:
    """Run one optional section iff the budget still has ``est_s`` headroom;
    record elapsed/skip/error and checkpoint the partial JSON either way."""
    rem = _remaining()
    if rem < est_s:
        DETAIL["sections"][name] = {
            "skipped": f"budget: {rem:.0f}s left < {est_s:.0f}s estimate"}
        _save_partial()
        return
    DETAIL["_section"] = name
    t0 = time.perf_counter()
    try:
        fn(ctx)
        DETAIL["sections"][name] = {
            "elapsed_s": round(time.perf_counter() - t0, 1)}
    except Exception as e:
        DETAIL["sections"][name] = {
            "elapsed_s": round(time.perf_counter() - t0, 1),
            "error": repr(e)[:300]}
        print(f"# section {name} failed: {e!r}", flush=True)
    DETAIL.pop("_section", None)
    _save_partial()


def build_case(n_cell=64, n_levels=3, max_grid_size=32):
    from peleanalysis_tpu.amr.hierarchy import AmrMeta, AmrState
    from peleanalysis_tpu.testing import (default_fields, make_amr_hierarchy,
                                          make_level_data)

    geoms, bas, ratios = make_amr_hierarchy(
        n_cell=n_cell, n_levels=n_levels, max_grid_size=max_grid_size)
    names, data = make_level_data(geoms, bas, default_fields(3))
    meta = AmrMeta(geoms, bas, ratios)
    return AmrState.from_arrays(meta, names, data, dtype=np.float32), data


def _backend_available(timeout_s: float = 150.0) -> bool:
    """Probe backend registration in a SUBPROCESS with a hard timeout.

    The container's axon (tunneled TPU) backend has had outages where
    ``jax.devices()`` itself blocks forever (NOTES r4) — run in-process
    that would hang the driver's end-of-round bench.  The probe is
    deliberately compile-free (``jax.devices()`` only): the remote compile
    service has separate congestion spikes (a tiny graph has compiled in
    1 s and in 10 min an hour apart), and a compile-based probe would
    false-negative on a merely-congested but healthy backend.
    """
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True)
        return r.returncode == 0 and "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


# --------------------------------------------------------------------------
# sections
# --------------------------------------------------------------------------

def sec_core(ctx) -> None:
    """The driver metric: grad + curvature + isosurface composite, roofline
    accounting, tunnel characterization, pinned-CPU vs_baseline."""
    import jax
    import jax.numpy as jnp

    from peleanalysis_tpu.amr.dense import DenseAmrState
    from peleanalysis_tpu.geom.marching_cubes import extract_isosurface
    from peleanalysis_tpu.ops.dense_fill import fill_dense_multilevel
    from peleanalysis_tpu.ops.stencil import centered_gradient, magnitude

    state, raw = build_case()
    meta = state.meta
    n_lev = meta.n_levels
    ic = state.comp("temp")
    ip = state.comp("progress")
    dstate = DenseAmrState.from_batched(state)
    masks = [dstate.in_level_mask(l) for l in range(n_lev)]
    lmeta = dstate.lmeta
    ctx.update(state=state, raw=raw, meta=meta, n_lev=n_lev, ic=ic, ip=ip,
               dstate=dstate, masks=masks)

    def mlgrad_all(fields, mask_list):
        grown = fill_dense_multilevel(meta, lmeta, fields, mask_list, 1,
                                      None, "linear")
        return [centered_gradient(g, meta.geoms[lev].dx, 1)
                for lev, g in enumerate(grown)]

    def grad_chain(levels, mask_list):
        outs = []
        for lev, (gx, gy, gz) in enumerate(mlgrad_all(levels, mask_list)):
            outs.append(magnitude(gx, gy, gz))
        # K-chaining stabilizer: tanh is elementwise, so it FUSES into the
        # magnitude write; the old max-normalize added a full reduction +
        # rescale pass per level that the real tool doesn't have (r4
        # measured: harness overhead, not pipeline traffic)
        return [jnp.tanh(o) for o in outs]

    def curv_chain(levels, mask_list):
        # gradient -> normal -> div(normal) + grad-of-grad Hessian -> Kg
        # (per-component fills — measured faster than channel-batched, r3)
        g = mlgrad_all(levels, mask_list)
        G = [jnp.concatenate(gl, 0) for gl in g]
        normg = [-jnp.maximum(1e-14,
                              jnp.sqrt(jnp.sum(Gl**2, 0, keepdims=True)))
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
                    a = (H[(i + 1) % 3][(j + 1) % 3]
                         * H[(i + 2) % 3][(j + 2) % 3]
                         - H[(i + 1) % 3][(j + 2) % 3]
                         * H[(i + 2) % 3][(j + 1) % 3])
                    adj_num = adj_num + G[lev][i] * a * G[lev][j]
            # f32-safe: normg**4 underflows to 0 below |g|~1e-10, and the
            # resulting inf/nan (flat corners of the synthetic field) would
            # poison the chain's scalar reduction; the floor fuses for free
            Kg = adj_num / jnp.maximum(normg[lev][0] ** 4, 1e-30)
            Km = 0.5 * div
            outs.append(Km + 1e-6 * Kg)
        # tanh stabilizer fuses into the combine (see grad_chain note)
        return [jnp.tanh(o[None]) for o in outs]

    data_t = [d[ic: ic + 1] for d in dstate.data]
    data_p = [d[ip: ip + 1] for d in dstate.data]
    ctx.update(grad_chain=grad_chain, curv_chain=curv_chain,
               data_t=data_t, data_p=data_p)

    def _fetch_lat(fetch, data):
        t0 = time.perf_counter()
        _ = float(fetch(data))
        return time.perf_counter() - t0

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

    grad_ms = timed_chain(grad_chain, data_t, 60)
    curv_ms = timed_chain(curv_chain, data_p, 20)

    # ---- roofline accounting (v5e: HBM ~819 GB/s, MXU f32 ~98.5 TFLOP/s —
    # half the 197 TFLOP/s bf16 rate; VPU ~1.9 T lane-op/s) ----------------
    HBM_PEAK = 819e9
    cells = [int(np.prod(dstate.lmeta[l].bbox.shape)) for l in range(n_lev)]
    tot_cells = sum(cells)
    # traffic models (f32): grad chain touches ~9 arrays/cell (fill read,
    # 3 flux writes+reads, magnitude, normalize r/w); curvature ~45
    # (13-field pipeline: grad, N, 3x gN, 3x gG, Hessian/adjugate combines)
    grad_bytes = tot_cells * 4 * 9
    curv_bytes = tot_cells * 4 * 45
    roofline = {
        "grad": {"model_gb": round(grad_bytes / 1e9, 3),
                 "gb_s": round(grad_bytes / (grad_ms * 1e-3) / 1e9, 1),
                 "pct_hbm_peak": round(100 * grad_bytes
                                       / (grad_ms * 1e-3) / HBM_PEAK, 1)},
        "curvature": {"model_gb": round(curv_bytes / 1e9, 3),
                      "gb_s": round(curv_bytes / (curv_ms * 1e-3) / 1e9, 1),
                      "pct_hbm_peak": round(100 * curv_bytes
                                            / (curv_ms * 1e-3) / HBM_PEAK,
                                            1)},
    }
    ctx["tot_cells"] = tot_cells
    # tunnel characterization: every end-to-end tool number below includes
    # host<->device transfers through this container's tunnel
    probe = jnp.arange(1 << 20, dtype=jnp.int32) + 1
    probe.block_until_ready()
    t0 = time.perf_counter()
    _ = np.asarray(probe)
    dt = time.perf_counter() - t0
    tiny = jnp.zeros((8,), jnp.int32) + 1
    t0 = time.perf_counter()
    _ = np.asarray(tiny)
    lat = time.perf_counter() - t0
    roofline["tunnel"] = {
        "latency_ms": round(lat * 1e3, 1),
        "mb_s": round(probe.nbytes / max(dt - lat, 1e-9) / 1e6, 1)}
    ctx["lat"] = lat

    # isosurface: end-to-end tool wall-clock (device enum engine + fetch)
    iso_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        mef = extract_isosurface(dstate, "temp", 1000.0, classify="enum")
        iso_times.append(time.perf_counter() - t0)
    iso_ms = min(iso_times) * 1e3
    # device-vs-transfer split: re-run the cached enum fn with a scalar
    # reduction (device chain + latency only, no payload)
    try:
        from peleanalysis_tpu.geom import marching_cubes as _mc
        fn = dstate._mc_enum_fns[
            [k for k in dstate._mc_enum_fns if k[0] != "counts"][-1]]
        coord = _mc._coord_levels(dstate)
        dls = [jnp.concatenate([coord[l],
                                dstate.data[l][np.asarray([ic])]], axis=0)
               for l in range(n_lev)]
        okd = [_mc._ok_mask_dev(dstate, l)[0] for l in range(n_lev)]
        red = jax.jit(lambda *a: jnp.sum(fn(*a)[:8]))
        _ = float(red(dls, masks, dstate._mc_inlev_dev, okd, 1000.0))
        t0 = time.perf_counter()
        _ = float(red(dls, masks, dstate._mc_inlev_dev, okd, 1000.0))
        iso_dev_ms = (time.perf_counter() - t0) * 1e3
        roofline["isosurface"] = {
            "device_plus_latency_ms": round(iso_dev_ms, 1),
            "fetch_ms": round(iso_ms - iso_dev_ms, 1),
            "nodes": int(mef.n_nodes), "tris": int(mef.n_elts)}
    except Exception:
        pass
    tpu_ms = grad_ms + curv_ms + iso_ms

    # ---- CPU baseline: PINNED by default (VERDICT r3 #9) ------------------
    # the live numpy numbers swing 2-3x with container host load, which made
    # vs_baseline noise; BASELINE_CPU.json pins the min-across-rounds oracle
    # timings of the identical numerics.  PELE_BENCH_LIVE_CPU=1 re-measures
    # (sec_cpu_live).
    pinned = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE_CPU.json")) as f:
            pinned = json.load(f)
    except Exception:
        pass
    ctx["pinned"] = pinned
    live_cpu = os.environ.get("PELE_BENCH_LIVE_CPU") == "1" or pinned is None
    ctx["live_cpu"] = live_cpu
    if pinned is not None:
        cpu_grad = pinned["cpu_grad_ms"] / 1e3
        cpu_curv = pinned["cpu_curvature_ms"] / 1e3
        cpu_iso = pinned["cpu_isosurface_ms"] / 1e3
        cpu_ms = (cpu_grad + cpu_curv + cpu_iso) * 1e3
        RESULT["vs_baseline"] = round(cpu_ms / tpu_ms, 2)
        DETAIL.update(cpu_grad_ms=round(cpu_grad * 1e3, 1),
                      cpu_curvature_ms=round(cpu_curv * 1e3, 1),
                      cpu_isosurface_ms=round(cpu_iso * 1e3, 1),
                      cpu_stream_ms=pinned.get("cpu_stream_ms"),
                      cpu_condmean_jpdf_ms=pinned.get(
                          "cpu_condmean_jpdf_ms"),
                      cpu_source="pinned")
    RESULT["value"] = round(tpu_ms, 3)
    DETAIL.update(grad_ms=round(grad_ms, 3),
                  curvature_ms=round(curv_ms, 3),
                  isosurface_ms=round(iso_ms, 3),
                  roofline=roofline)


def sec_cpu_live(ctx) -> None:
    """PELE_BENCH_LIVE_CPU=1: re-measure the CPU oracle numerics live
    (otherwise the pinned BASELINE_CPU.json numbers stand)."""
    from peleanalysis_tpu.geom.marching_cubes import extract_isosurface
    from peleanalysis_tpu.ops.fill import get_fill_plan
    from peleanalysis_tpu.reference_impl import (numpy_curvature,
                                                 numpy_grad_level)

    meta, raw, n_lev = ctx["meta"], ctx["raw"], ctx["n_lev"]
    ic, ip, dstate = ctx["ic"], ctx["ip"], ctx["dstate"]
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
    # warm once so the device->host transfer of the filled arrays (cached
    # on the state) doesn't count against the CPU engine's compute time
    extract_isosurface(dstate, "temp", 1000.0, classify="numpy")
    t0 = time.perf_counter()
    extract_isosurface(dstate, "temp", 1000.0, classify="numpy")
    cpu_iso = time.perf_counter() - t0
    cpu_ms = (cpu_grad + cpu_curv + cpu_iso) * 1e3
    DETAIL.update(cpu_grad_ms=round(cpu_grad * 1e3, 1),
                  cpu_curvature_ms=round(cpu_curv * 1e3, 1),
                  cpu_isosurface_ms=round(cpu_iso * 1e3, 1),
                  cpu_source="live")
    if RESULT["value"]:
        RESULT["vs_baseline"] = round(cpu_ms / RESULT["value"], 2)

    # stream CPU oracle (config 4)
    def numpy_trace(field, plo, dxs, seeds, n_half, h):
        pos = seeds.copy()
        out = [pos.copy()]
        for _ in range(n_half):
            x = pos
            for stage in range(4):
                xc = (x - plo) / dxs - 0.5
                b = np.clip(np.floor(xc).astype(int), 0,
                            np.array(field.shape[1:]) - 2)
                t = np.clip(xc - b, 0, 1)
                i, j, k = b[:, 0], b[:, 1], b[:, 2]
                v = 0
                for oi in (0, 1):
                    for oj in (0, 1):
                        for ok in (0, 1):
                            w = (np.where(oi, t[:, 0], 1 - t[:, 0])
                                 * np.where(oj, t[:, 1], 1 - t[:, 1])
                                 * np.where(ok, t[:, 2], 1 - t[:, 2]))
                            v = v + w[:, None] * field[:, i + oi, j + oj,
                                                       k + ok].T
                v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True),
                                1e-300)
                if stage == 0:
                    k1 = v
                    x = pos + 0.5 * h * k1
                elif stage == 1:
                    k2 = v
                    x = pos + 0.5 * h * k2
                elif stage == 2:
                    k3 = v
                    x = pos + h * k3
                else:
                    k4 = v
            pos = pos + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            out.append(pos.copy())
        return np.stack(out)

    state, dstate, meta = ctx["state"], ctx["dstate"], ctx["meta"]
    fin = ctx["n_lev"] - 1
    geom_f = meta.geoms[fin]
    vel = np.asarray(dstate.data[fin][
        np.asarray([state.comp(n) for n in
                    ("x_velocity", "y_velocity", "z_velocity")])],
        dtype=np.float64)
    bboxf = dstate.lmeta[fin].bbox
    plo_f = (np.array(geom_f.prob_lo)
             + (np.array(bboxf.lo) - np.array(geom_f.domain.lo))
             * np.array(geom_f.dx))
    seeds = ctx.get("seeds")
    if seeds is None:
        rng = np.random.default_rng(0)
        seeds = 0.5 + 0.12 * (rng.random((4096, 3)) - 0.5)
    t0 = time.perf_counter()
    numpy_trace(vel, plo_f, np.array(geom_f.dx), seeds, 25,
                0.5 * geom_f.dx[0])
    DETAIL["cpu_stream_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

    # stats CPU oracle (config 5)
    t0 = time.perf_counter()
    w = [64, 8, 1]
    for lev in range(ctx["n_lev"]):
        p = np.asarray(dstate.data[lev][state.comp("temp")])
        d = np.asarray(dstate.data[lev][state.comp("density")])
        m = np.asarray(dstate.valid_mask(lev))
        idx = np.clip(((p - 300.0) / 1501.0 * 64).astype(int), 0, 63)
        np.add.at(np.zeros(64), idx[m], w[lev])
        np.add.at(np.zeros(64), idx[m], w[lev] * d[m])
        q = np.asarray(dstate.data[lev][state.comp("progress")])
        i2 = np.clip(((q + 0.1) / 1.2 * 64).astype(int), 0, 63)
        flat = idx[m] * 64 + i2[m]
        np.add.at(np.zeros(64 * 64), flat, 1.0)
    DETAIL["cpu_condmean_jpdf_ms"] = round(
        (time.perf_counter() - t0) * 1e3, 1)


def sec_stream(ctx) -> None:
    """BASELINE config 4: RK4 streamlines; plus the march-precision artifact
    (VERDICT r4 #5 — f32 is now the march default, bf16 the opt-in)."""
    import jax
    import jax.numpy as jnp

    from peleanalysis_tpu.stream.trace import trace_streamlines

    dstate, meta, state, n_lev = (ctx["dstate"], ctx["meta"], ctx["state"],
                                  ctx["n_lev"])
    rng = np.random.default_rng(0)
    seeds = 0.5 + 0.12 * (rng.random((4096, 3)) - 0.5)
    ctx["seeds"] = seeds
    trace_streamlines(dstate, seeds, 51, 0.5, trace_field=None)  # warm
    t0 = time.perf_counter()
    lines = trace_streamlines(dstate, seeds, 51, 0.5, trace_field=None)
    stream_ms = (time.perf_counter() - t0) * 1e3
    DETAIL["stream_4096lines_ms"] = round(stream_ms, 1)

    # march precision artifact: default (f32) vs bf16 opt-in — wall-clock
    # and max path deviation in finest cells, so the lossy option's cost/
    # benefit is measured, not asserted
    try:
        lb = trace_streamlines(dstate, seeds, 51, 0.5, trace_field=None,
                               march_dtype="bfloat16")         # warm
        t0 = time.perf_counter()
        lb = trace_streamlines(dstate, seeds, 51, 0.5, trace_field=None,
                               march_dtype="bfloat16")
        bf16_ms = (time.perf_counter() - t0) * 1e3
        dxf = float(min(meta.geoms[n_lev - 1].dx))
        dev = float(np.max(np.abs(
            np.asarray(lb[:, :, :3], np.float64)
            - np.asarray(lines[:, :, :3], np.float64)))) / dxf
        DETAIL["march_precision"] = {
            "f32_ms": round(stream_ms, 1), "bf16_ms": round(bf16_ms, 1),
            "max_dev_finest_cells": round(dev, 4),
            "note": "f32 default (reference is double everywhere, "
                    "stream_nd.f90); bf16 opt-in via march_dtype"}
    except Exception as e:
        print(f"# march precision probe skipped: {e!r}")

    # march-only device time (scalar fetch) + DMA traffic of the pallas
    # engine: 8192 doubled lines x ceil(25/K) rounds x [8,16,256]-f32 blocks
    try:
        from peleanalysis_tpu.stream.pallas_march import march_pallas
        fin_l = n_lev - 1
        geom_f = meta.geoms[fin_l]
        vel32 = dstate.data[fin_l][np.asarray(
            [state.comp(n) for n in ("x_velocity", "y_velocity",
                                     "z_velocity")])].astype(jnp.float32)
        bboxf = dstate.lmeta[fin_l].bbox
        plo_f = tuple(float(geom_f.prob_lo[d])
                      + (bboxf.lo[d] - geom_f.domain.lo[d]) * geom_f.dx[d]
                      for d in range(3))
        h_m = float(0.5 * geom_f.dx[0])
        sd = jnp.asarray(np.concatenate([seeds, seeds]), jnp.float32)
        dd = jnp.concatenate([jnp.ones(4096), -jnp.ones(4096)])
        # jit the whole march (incl. field layout prep): eager per-call
        # transposes/pads cost extra tunnel dispatches and overstate
        # march time vs the in-tool (fully jitted) path
        mfn = jax.jit(lambda v, s, d: jnp.sum(march_pallas(
            v, plo_f, geom_f.dx, h_m, s, 25, d)))
        _ = float(mfn(vel32, sd, dd))
        t0 = time.perf_counter()
        _ = float(mfn(vel32, sd, dd))
        march_ms = (time.perf_counter() - t0) * 1e3
        h_cells = 0.5
        K = max(int(np.floor(3.0 / h_cells - 1.0 + 1e-9)), 1)
        rounds = int(np.ceil(25 / K))
        dma_gb = 8192 * rounds * 8 * 16 * 256 * 4 / 1e9
        DETAIL["roofline"]["stream_march"] = {
            "device_ms": round(march_ms, 1),
            "dma_gb": round(dma_gb, 2),
            "dma_gb_s": round(dma_gb / (march_ms * 1e-3), 1),
            "fetch_ms": round(stream_ms - march_ms, 1)}
    except Exception as e:
        print(f"# pallas march probe skipped: {e!r}")


def sec_stats(ctx) -> None:
    """BASELINE config 5: conditionalMean + jpdf as ONE fused dispatch +
    ONE fetch (r3 measured: each standalone tool is ~5 ms device + ~30 ms
    tunnel latency, so the fused path halves the chained e2e)."""
    import jax
    import jax.numpy as jnp

    from peleanalysis_tpu.tools.conditional_mean import (
        _accumulate_all, accumulate_stats_fused, refinement_weights)
    from peleanalysis_tpu.tools.jpdf import _jpdf_all

    dstate, state, meta, n_lev = (ctx["dstate"], ctx["state"], ctx["meta"],
                                  ctx["n_lev"])
    lat, tot_cells = ctx["lat"], ctx["tot_cells"]
    MXU_F32_PEAK = 98.5e12
    pair_b = (300.0, 1801.0, -0.1, 1.1)
    accumulate_stats_fused(dstate, "temp", ["density"], 64, 300.0, 1801.0,
                           ("temp", "progress"), pair_b, 64)   # warm
    t0 = time.perf_counter()
    accumulate_stats_fused(dstate, "temp", ["density"], 64, 300.0, 1801.0,
                           ("temp", "progress"), pair_b, 64)
    stats_ms = (time.perf_counter() - t0) * 1e3
    DETAIL["condmean_jpdf_ms"] = round(stats_ms, 1)
    # device-only split: K back-to-back fused dispatches, 2 scalar fetches
    svols = tuple(float(np.prod(meta.geoms[lev].dx))
                  for lev in range(n_lev))
    sweights = tuple(refinement_weights(meta.ref_ratio, n_lev, 3))
    smasks = [dstate.valid_mask(lev) for lev in range(n_lev)]
    ibs, ias = state.comp("temp"), (state.comp("density"),)
    f1 = [dstate.data[l][state.comp("temp")] for l in range(n_lev)]
    f2 = [dstate.data[l][state.comp("progress")] for l in range(n_lev)]

    def _fused_dev(dl, ml, g1, g2, tok):
        cm = _accumulate_all(dl, ml, ibs, ias, sweights, 300.0, 1801.0, 64,
                             False)
        jp = _jpdf_all(g1, g2, ml, svols, pair_b, 64)
        # tok threads a data dependency so K calls form one executed chain
        return tok + sum(jnp.sum(x) for x in cm) \
            + sum(jnp.sum(x) for x in jp)

    fused_dev = jax.jit(_fused_dev)
    acc = fused_dev(list(dstate.data), smasks, f1, f2, jnp.zeros(()))
    _ = float(acc)
    # adaptive chain: grow K until the chain dominates the fetch latency
    # (r3 recorded device_ms=0.5 from a chain barely past the 2x-lat
    # threshold — subtraction noise), bounded by the section budget
    K, chain_s = 8, 0.0
    while True:
        t0 = time.perf_counter()
        acc = jnp.zeros(())
        for _ in range(K):
            acc = fused_dev(list(dstate.data), smasks, f1, f2, acc)
        _ = float(acc)
        chain_s = time.perf_counter() - t0
        if chain_s > max(4.0 * lat, 0.15) or K >= 256 or _remaining() < 20:
            break
        K *= 2
    # MXU accounting for the one-hot contractions (r5 FIX: the jpdf einsums
    # are [C,64]x[C,64] -> 2*C*nbins^2 FLOPs each; r3 counted 2*C*nbins and
    # under-stated the achieved MXU fraction 64x on the jpdf side):
    # condMean = one [64,C]@[C,3] fused matmul (hits+sum+sumsq, ncomp=1);
    # jpdf = one batched 3x [64,C]@[C,64].  Onehot build not counted.
    stats_gflop = (2 * tot_cells * 64 * 3
                   + 2 * tot_cells * 64 * 64 * 3) / 1e9
    rl = {"gflop": round(stats_gflop, 1), "chain_len": K}
    if chain_s > 2.0 * lat:
        stats_dev_ms = (chain_s - lat) / K * 1e3
        rl.update(
            device_ms=round(stats_dev_ms, 2),
            fetch_ms=round(stats_ms - stats_dev_ms, 1),
            gflop_s=round(stats_gflop / (stats_dev_ms * 1e-3), 1),
            pct_mxu_f32_peak=round(100 * stats_gflop * 1e9
                                   / (stats_dev_ms * 1e-3) / MXU_F32_PEAK,
                                   2))
    else:
        # the K-chain finished inside the tunnel-latency noise floor — a
        # subtracted per-step time would be garbage (r5: a run recorded
        # device_ms=0.0 -> 1.4e10 GFLOP/s); report the bound instead
        rl["device_ms_upper_bound"] = round(chain_s / K * 1e3, 2)
        rl["note"] = (f"{K}-step chain ({chain_s*1e3:.0f} ms) within 2x "
                      f"fetch latency ({lat*1e3:.0f} ms); per-step device "
                      "time below the measurement floor this run")
    DETAIL["roofline"]["stats_matmul"] = rl

    # all-pairs jpdf (r5, VERDICT r4 #6): 3 vars -> 3 pairs sharing
    # per-variable one-hots in one dispatch (tools/jpdf.compute_jpdf_pairs)
    if _remaining() > 30:
        from peleanalysis_tpu.tools.jpdf import _jpdf_multi_all
        f3 = [dstate.data[l][state.comp("density")] for l in range(n_lev)]
        vals_list = [jnp.stack([f1[l], f2[l], f3[l]]) for l in range(n_lev)]
        mlo = np.asarray([300.0, -0.1, 0.05], np.float32)
        mhi = np.asarray([1801.0, 1.1, 1.3], np.float32)
        mpairs = ((0, 1), (0, 2), (1, 2))

        def _multi_dev(vl, ml, tok):
            b, bx1, bx2, _sh = _jpdf_multi_all(vl, ml, svols, mlo, mhi,
                                               64, mpairs)
            return tok + jnp.sum(b) + jnp.sum(bx1) + jnp.sum(bx2)

        multi_dev = jax.jit(_multi_dev)
        _ = float(multi_dev(vals_list, smasks, jnp.zeros(())))
        K2, chain2 = 8, 0.0
        while True:
            t0 = time.perf_counter()
            acc = jnp.zeros(())
            for _ in range(K2):
                acc = multi_dev(vals_list, smasks, acc)
            _ = float(acc)
            chain2 = time.perf_counter() - t0
            if chain2 > max(4.0 * lat, 0.15) or K2 >= 256 \
                    or _remaining() < 15:
                break
            K2 *= 2
        gf_multi = 3 * 2 * tot_cells * 64 * 64 * 3 / 1e9
        rl2 = {"gflop": round(gf_multi, 1), "chain_len": K2,
               "case": "3 vars -> 3 pairs, shared one-hots, one dispatch"}
        if chain2 > 2.0 * lat:
            dev2_ms = (chain2 - lat) / K2 * 1e3
            rl2.update(
                device_ms=round(dev2_ms, 2),
                device_ms_per_pair=round(dev2_ms / 3, 2),
                gflop_s=round(gf_multi / (dev2_ms * 1e-3), 1),
                pct_mxu_f32_peak=round(100 * gf_multi * 1e9
                                       / (dev2_ms * 1e-3) / MXU_F32_PEAK,
                                       2))
        else:
            rl2["device_ms_upper_bound"] = round(chain2 / K2 * 1e3, 2)
        DETAIL["roofline"]["stats_jpdf_multi"] = rl2


def sec_chain(ctx) -> None:
    """Device-resident chained composite (pipeline mode): grad -> curvature
    -> isosurface(defer: counts-only fetch) -> stream seeded from the
    surface's xyz columns; only final artifacts fetched (seed xyz +
    compressed lines).  This is what `pipeline ... write=0` buys."""
    import jax
    import jax.numpy as jnp

    from peleanalysis_tpu.geom.marching_cubes import extract_isosurface
    from peleanalysis_tpu.stream.trace import trace_streamlines

    dstate = ctx["dstate"]
    masks, data_t, data_p = ctx["masks"], ctx["data_t"], ctx["data_p"]
    seeds = ctx["seeds"]
    gfn = jax.jit(ctx["grad_chain"])
    cfn = jax.jit(ctx["curv_chain"])
    # grad+curv reduce to TWO scalars shipped inside the stream fetch —
    # the chain pays exactly 2 tunnel roundtrips: the deferred surface's
    # head+xyz (overlapping the queued grad/curv/enum device work) and
    # DeferredLines.finish's single packed lines+scalars vector
    scal = jax.jit(lambda a, b: jnp.stack(
        [sum(jnp.sum(x) for x in a),
         sum(jnp.sum(x) for x in b)]).astype(jnp.float32))
    dsurf = extract_isosurface(dstate, "temp", 1000.0, classify="enum",
                               defer=True)
    seeds_c = np.ascontiguousarray(dsurf.positions()[:4096])
    if len(seeds_c) < 4096:
        seeds_c = np.concatenate(
            [seeds_c, seeds[: 4096 - len(seeds_c)]])
    dl = trace_streamlines(dstate, seeds_c, 51, 0.5, trace_field=None,
                           defer=True)                             # warm
    dl.finish(extra=[scal(gfn(data_t, masks), cfn(data_p, masks))])
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        g1 = gfn(data_t, masks)          # queued on device
        c1 = cfn(data_p, masks)          # queued on device
        dsurf = extract_isosurface(dstate, "temp", 1000.0,
                                   classify="enum", defer=True)
        sc = np.ascontiguousarray(dsurf.positions()[:4096])
        if len(sc) < 4096:
            sc = np.concatenate([sc, seeds[: 4096 - len(sc)]])
        dl = trace_streamlines(dstate, sc, 51, 0.5, trace_field=None,
                               defer=True)
        lines_c, ex = dl.finish(extra=[scal(g1, c1)])
        assert np.isfinite(ex[0]).all()
        times.append(time.perf_counter() - t0)
    DETAIL["pipeline_chain_ms"] = round(min(times) * 1e3, 1)


def sec_sparse512(ctx) -> None:
    """Sparse-refinement scale story (VERDICT r4 #3): scattered 512^3 finest
    level, <1% coverage, 16 clusters.  Canonical frames let equal-bucket
    clusters share ONE compiled engine (amr/canonical.py; r4: cold sparse
    iso 327.7 s -> ~40 s), so this is where the clustered design wins —
    cold AND warm numbers, plus the cluster/frame build split."""
    from peleanalysis_tpu.amr.canonical import canonical_cluster_substates
    from peleanalysis_tpu.geom.marching_cubes import (
        extract_isosurface_sparse)
    from peleanalysis_tpu.testing import default_fields, make_scattered_state

    blk: dict = {"case": "128^3 coarse + 16 scattered 32^3 clusters on a "
                         "512^3 finest index space (ratio 4, <1% coverage)"}
    DETAIL["sparse_512"] = blk
    t0 = time.perf_counter()
    st, ba1 = make_scattered_state(fields=default_fields(3))
    blk["build_host_s"] = round(time.perf_counter() - t0, 1)
    blk["coverage_pct"] = round(100 * ba1.total_cells() / 512**3, 3)

    # clustering + canonical frame construction (same args the sparse iso
    # uses, so the iso timings below exclude this host phase)
    t0 = time.perf_counter()
    groups, subs, base, infos = canonical_cluster_substates(
        st, ngrow_max=1, interp_stencil=0, waste_factor=4.0)
    blk["cluster_frames_s"] = round(time.perf_counter() - t0, 1)
    blk["n_clusters"] = len(groups)
    blk["n_canonical"] = sum(1 for i in infos if i.canonical)

    t0 = time.perf_counter()
    mef = extract_isosurface_sparse(st, "temp", 800.0, [])
    blk["iso_cold_s"] = round(time.perf_counter() - t0, 1)
    blk["iso_nodes"] = int(mef.n_nodes)
    blk["iso_tris"] = int(mef.n_elts)
    if _remaining() > 30:
        t0 = time.perf_counter()
        mef2 = extract_isosurface_sparse(st, "temp", 900.0, [])
        blk["iso_warm_new_value_s"] = round(time.perf_counter() - t0, 2)
        blk["iso_warm_tris"] = int(mef2.n_elts)
    if _remaining() > 120:
        from peleanalysis_tpu.stream.trace import trace_streamlines_sparse
        seeds = mef.positions()[
            np.random.default_rng(1).choice(mef.n_nodes,
                                            min(2048, mef.n_nodes),
                                            replace=False)]
        t0 = time.perf_counter()
        lines = trace_streamlines_sparse(st, seeds, 31, 0.5,
                                         trace_field=None)
        blk["stream_cold_s"] = round(time.perf_counter() - t0, 1)
        blk["stream_lines"] = int(lines.shape[0])
        t0 = time.perf_counter()
        trace_streamlines_sparse(st, seeds, 31, 0.5, trace_field=None)
        blk["stream_warm_s"] = round(time.perf_counter() - t0, 2)


def sec_cli32(ctx) -> None:
    """CLI-level: file-chained tools vs pipeline mode — the user-facing win
    of `pipeline ... -- ...`: shared plotfile loads, dense conversions and
    engine builds, in-session intermediate artifacts.  Real on-disk
    plotfile (32^3 x 3 levels, ~2.4M cells)."""
    import shutil
    import tempfile

    from peleanalysis_tpu.cli import main as cli_main
    from peleanalysis_tpu.testing import write_synthetic_plotfile
    td = tempfile.mkdtemp()
    pltf = os.path.join(td, "plt")
    write_synthetic_plotfile(pltf, n_cell=32, n_levels=3)

    def run_seq(tag):
        b = os.path.join(td, tag)
        cli_main(["grad", f"infile={pltf}", "gradVar=temp",
                  f"outfile={b}_g"])
        cli_main(["curvature", f"infile={pltf}", "progressName=temp",
                  f"outfile={b}_K"])
        cli_main(["isosurface", f"infile={pltf}", "isoCompName=temp",
                  "isoVal=800", f"outfile_base={b}_iso"])
        cli_main(["stream", f"plotfile={pltf}", "traceAlongV=1",
                  f"isoFile={b}_iso.mef", "nRKsteps=21",
                  f"outFile={b}_lines.dat"])

    def run_pipe(tag):
        b = os.path.join(td, tag)
        cli_main(["pipeline",
                  "grad", f"infile={pltf}", "gradVar=temp",
                  f"outfile={b}_g", "--",
                  "curvature", f"infile={pltf}", "progressName=temp",
                  f"outfile={b}_K", "--",
                  "isosurface", f"infile={pltf}", "isoCompName=temp",
                  "isoVal=800", f"outfile_base={b}_iso", "write=0",
                  "--",
                  "stream", f"plotfile={pltf}", "traceAlongV=1",
                  f"isoFile={b}_iso.mef", "nRKsteps=21",
                  f"outFile={b}_lines.dat"])

    try:
        run_seq("w1")        # warm compiles/caches for both paths
        run_pipe("w2")
        seqs, pipes = [], []
        for i in range(2):   # interleaved min-of-2: tunnel weather moves
            t0 = time.perf_counter()
            run_seq(f"s{i}")
            seqs.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run_pipe(f"p{i}")
            pipes.append(time.perf_counter() - t0)
        DETAIL["cli_sequential_ms"] = round(min(seqs) * 1e3, 1)
        DETAIL["cli_pipeline_ms"] = round(min(pipes) * 1e3, 1)
    finally:
        shutil.rmtree(td, ignore_errors=True)


def sec_server(ctx) -> None:
    """Server mode: same 4-tool chain through the persistent server
    (peleanalysis_tpu serve) — one resident Session, warm engines across
    commands; the AOT-binary startup-cost analog.  Short per-command socket
    timeouts (VERDICT r4 #1: the 600 s default let r4's bench hang past the
    driver's wall clock)."""
    import shutil
    import tempfile
    import threading as _th

    from peleanalysis_tpu.server import send_command, serve
    from peleanalysis_tpu.testing import write_synthetic_plotfile
    td = tempfile.mkdtemp()
    pltf = os.path.join(td, "plt")
    write_synthetic_plotfile(pltf, n_cell=32, n_levels=3)
    sock = os.path.join(td, "s.sock")
    th = _th.Thread(target=serve, args=({"socket": [sock]},), daemon=True)
    th.start()
    for _ in range(100):
        if os.path.exists(sock):
            break
        time.sleep(0.05)
    # per-command timeout: generous for a warm 32^3 command, but bounded by
    # the section's remaining budget so a wedged compile can't eat the run
    cmd_to = max(10.0, min(60.0, _remaining() / 4))

    def run_srv(tag):
        b = os.path.join(td, tag)
        for argv in (
            ["grad", f"infile={pltf}", "gradVar=temp",
             f"outfile={b}_g"],
            ["curvature", f"infile={pltf}", "progressName=temp",
             f"outfile={b}_K"],
            ["isosurface", f"infile={pltf}", "isoCompName=temp",
             "isoVal=800", f"outfile_base={b}_iso"],
            ["stream", f"plotfile={pltf}", "traceAlongV=1",
             f"isoFile={b}_iso.mef", "nRKsteps=21",
             f"outFile={b}_lines.dat"]):
            rep = send_command(sock, argv=argv, timeout=cmd_to)
            assert rep["rc"] == 0, rep["err"]

    try:
        run_srv("sw")                       # warm
        ts = []
        for i in range(2):
            t0 = time.perf_counter()
            run_srv(f"sv{i}")
            ts.append(time.perf_counter() - t0)
        DETAIL["cli_server_ms"] = round(min(ts) * 1e3, 1)
    finally:
        try:
            send_command(sock, cmd="shutdown", timeout=10.0)
            th.join(timeout=10)
        except Exception:
            pass
        shutil.rmtree(td, ignore_errors=True)


def sec_e2e_512(ctx) -> None:
    """Dense scale pair (VERDICT r4 #3): 128^3 x 3 levels (finest 512^3
    index space, ~21M padded cells) — isosurface and stream end-to-end at
    the scale where payloads dominate tunnel latency (the r2 scale proof,
    NOTES: 169k tris ~500 ms e2e)."""
    from peleanalysis_tpu.amr.dense import DenseAmrState
    from peleanalysis_tpu.geom.marching_cubes import extract_isosurface
    from peleanalysis_tpu.stream.trace import trace_streamlines

    blk: dict = {"case": "128^3 x 3 levels dense (finest 512^3 index "
                         "space), iso + 4096-line stream e2e"}
    DETAIL["e2e_512"] = blk
    t0 = time.perf_counter()
    state, _ = build_case(n_cell=128, n_levels=3, max_grid_size=64)
    dstate = DenseAmrState.from_batched(state)
    blk["build_upload_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    mef = extract_isosurface(dstate, "temp", 1000.0, classify="enum")
    blk["iso_cold_s"] = round(time.perf_counter() - t0, 1)
    blk["iso_nodes"], blk["iso_tris"] = int(mef.n_nodes), int(mef.n_elts)
    if _remaining() > 30:
        t0 = time.perf_counter()
        extract_isosurface(dstate, "temp", 1000.0, classify="enum")
        blk["iso_warm_ms"] = round((time.perf_counter() - t0) * 1e3, 0)
    if _remaining() > 60:
        seeds = np.ascontiguousarray(mef.positions()[:4096])
        t0 = time.perf_counter()
        trace_streamlines(dstate, seeds, 51, 0.5, trace_field=None)
        blk["stream_cold_s"] = round(time.perf_counter() - t0, 1)
        if _remaining() > 30:
            t0 = time.perf_counter()
            trace_streamlines(dstate, seeds, 51, 0.5, trace_field=None)
            blk["stream_warm_ms"] = round(
                (time.perf_counter() - t0) * 1e3, 0)


def sec_large(ctx) -> None:
    """LARGE-scale pipeline vs sequential (96^3 x 3, ~8M cells): the scale
    where shared loads/uploads/fills dominate per-invocation Python.  One
    timed pass each (a pass moves ~190 MB through the tunnel)."""
    import shutil
    import tempfile

    from peleanalysis_tpu.cli import main as cli_main
    from peleanalysis_tpu.testing import write_synthetic_plotfile
    td = tempfile.mkdtemp()
    pltf = os.path.join(td, "plt")
    write_synthetic_plotfile(pltf, n_cell=96, n_levels=3)

    def seq_l(tag):
        b = os.path.join(td, tag)
        cli_main(["grad", f"infile={pltf}", "gradVar=temp",
                  f"outfile={b}_g"])
        cli_main(["curvature", f"infile={pltf}",
                  "progressName=temp", f"outfile={b}_K"])
        cli_main(["isosurface", f"infile={pltf}",
                  "isoCompName=temp", "isoVal=800",
                  f"outfile_base={b}_iso"])
        cli_main(["stream", f"plotfile={pltf}", "traceAlongV=1",
                  f"isoFile={b}_iso.mef", "nRKsteps=21",
                  f"outFile={b}_lines.dat"])

    def pipe_l(tag):
        b = os.path.join(td, tag)
        cli_main(["pipeline",
                  "grad", f"infile={pltf}", "gradVar=temp",
                  f"outfile={b}_g", "write=0", "--",
                  "curvature", f"infile={pltf}",
                  "progressName=temp", f"outfile={b}_K",
                  "write=0", "--",
                  "isosurface", f"infile={pltf}",
                  "isoCompName=temp", "isoVal=800",
                  f"outfile_base={b}_iso", "write=0", "--",
                  "stream", f"plotfile={pltf}", "traceAlongV=1",
                  f"isoFile={b}_iso.mef", "nRKsteps=21",
                  f"outFile={b}_lines.dat"])

    try:
        pipe_l("lw")                    # warm compiles for this shape
        t0 = time.perf_counter()
        seq_l("ls")
        seq_large = time.perf_counter() - t0
        t0 = time.perf_counter()
        pipe_l("lp")
        pipe_large = time.perf_counter() - t0
        DETAIL["cli_pipeline_large"] = {
            "cli_sequential_ms": round(seq_large * 1e3, 0),
            "cli_pipeline_ms": round(pipe_large * 1e3, 0),
            "speedup": round(seq_large / pipe_large, 2),
            "case": "96^3 x 3 levels, 4-tool chain"}
    finally:
        shutil.rmtree(td, ignore_errors=True)


def main():
    _install_guards()
    _save_partial()
    if not _backend_available(timeout_s=min(150.0, max(BUDGET_S / 4, 20.0))):
        DETAIL["backend_unavailable"] = True
        DETAIL["note"] = ("jax.devices() did not answer within the probe "
                          "timeout; value/vs_baseline are the last recorded "
                          "round's (stale), not a fresh measurement")
        _emit()
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    ctx: dict = {}
    # the core composite is the driver metric: always attempted (the
    # watchdog emits stale-flagged numbers if compile weather eats it)
    section("core", 0, sec_core, ctx)
    if RESULT["value"] is None:
        _emit()          # core failed outright: report what we know
        return
    if ctx.get("live_cpu"):
        section("cpu_live", 60, sec_cpu_live, ctx)
    section("stream", 45, sec_stream, ctx)
    section("stats", 45, sec_stats, ctx)
    section("chain", 45, sec_chain, ctx)
    # e2e_512 before the CLI chains: the scale story (VERDICT r4 #3) is
    # worth more than warm-chain timings when the budget is tight
    section("sparse_512", 240, sec_sparse512, ctx)
    section("e2e_512", 200, sec_e2e_512, ctx)
    section("cli32", 150, sec_cli32, ctx)
    section("server", 120, sec_server, ctx)
    if os.environ.get("PELE_BENCH_LARGE", "1") != "0":
        section("large", 240, sec_large, ctx)
    _emit()


if __name__ == "__main__":
    main()
