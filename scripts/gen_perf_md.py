#!/usr/bin/env python
"""Regenerate docs/perf.md from the newest BENCH_r*.json.

One canonical, generated performance table — NOTES.md / PARITY.md cite this
file instead of embedding numbers, so the copies cannot drift (VERDICT r2
#10).  Run:  python scripts/gen_perf_md.py
"""
from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.join(os.path.dirname(__file__), "..")


def main() -> None:
    benches = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not benches:
        raise SystemExit("no BENCH_r*.json found")
    latest = benches[-1]
    rnd = re.search(r"BENCH_r(\d+)", latest).group(1)
    raw = json.load(open(latest))
    d = raw.get("parsed", raw)
    det = d.get("detail", {})
    roof = det.get("roofline", {})

    lines = [
        "# Performance (generated)",
        "",
        f"Source: `{os.path.basename(latest)}` (round {int(rnd)}); one TPU"
        " v5e chip through this container's tunnel vs a single-process"
        " numpy float64 run of the same numerics.  Regenerate with"
        " `python scripts/gen_perf_md.py` — do not hand-edit.",
        "",
        f"**Headline**: `{d['metric']}` = **{d['value']} {d['unit']}**"
        f" ({d['vs_baseline']}x vs CPU baseline).",
        "",
        "| stage | TPU ms | CPU ms | speedup |",
        "|---|---|---|---|",
    ]
    pairs = [("grad", "grad_ms", "cpu_grad_ms"),
             ("curvature", "curvature_ms", "cpu_curvature_ms"),
             ("isosurface (e2e)", "isosurface_ms", "cpu_isosurface_ms"),
             ("stream 4096 lines (e2e)", "stream_4096lines_ms",
              "cpu_stream_ms"),
             ("conditionalMean+jpdf (e2e)", "condmean_jpdf_ms",
              "cpu_condmean_jpdf_ms")]
    for name, k, ck in pairs:
        if k in det and ck in det:
            t, c = det[k], det[ck]
            lines.append(f"| {name} | {t} | {c} | {c / max(t, 1e-9):.0f}x |")
    extra = [(k, v) for k, v in det.items()
             if k not in {p[1] for p in pairs}
             and k not in {p[2] for p in pairs} and k != "roofline"
             and isinstance(v, (int, float))]
    for k, v in extra:
        lines.append(f"| {k} | {v} |  |  |")
    if roof:
        lines += ["", "## Roofline / split detail", "", "```json",
                  json.dumps(roof, indent=2), "```", ""]
    # r5: dict-valued detail blocks (sparse_512 scale story, e2e_512,
    # march_precision parity, server/CLI chains, section ledger)
    blocks = {k: v for k, v in det.items()
              if isinstance(v, dict) and k != "roofline"}
    if blocks:
        lines += ["", "## Case blocks", "", "```json",
                  json.dumps(blocks, indent=2), "```", ""]
    lines += [
        "Tunnel weather (latency/bandwidth in the `tunnel` entry above)"
        " moves the e2e numbers run to run; the device-only splits are the"
        " stable quantities.",
        "",
    ]
    out = os.path.join(ROOT, "docs", "perf.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote docs/perf.md from {os.path.basename(latest)}")


if __name__ == "__main__":
    main()
