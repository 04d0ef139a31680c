"""``doctor`` — environment diagnostics for support and bug reports.

No reference analog (the reference's build system surfaces configuration
at compile time); a JIT-compiled framework needs a runtime equivalent:
which backend will execute, how many devices, whether the persistent
compile cache is active, and whether the native helper library builds.
"""
from __future__ import annotations

import os


def main(args: dict) -> None:
    import jax

    import peleanalysis_tpu

    print("peleanalysis_tpu doctor")
    print(f"  package:   {os.path.dirname(peleanalysis_tpu.__file__)}")
    print(f"  jax:       {jax.__version__}")
    import numpy as np
    print(f"  numpy:     {np.__version__}")
    # probe registration in a SUBPROCESS with a hard timeout: the tunneled
    # TPU backend has had outages where jax.devices() blocks FOREVER
    # (NOTES r4) — a diagnostic tool must never hang on the condition it
    # exists to diagnose.  probe_timeout= overrides (seconds; 0 probes
    # in-process).
    from ..parmparse import ParmParse
    probe_s = ParmParse(args).query_float("probe_timeout", 60.0)
    alive = True
    if probe_s > 0:
        import subprocess
        import sys
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                timeout=probe_s, capture_output=True, text=True)
            alive = r.returncode == 0 and "ok" in r.stdout
        except subprocess.TimeoutExpired:
            alive = False
        if not alive:
            print(f"  backend:   UNAVAILABLE (jax.devices() did not answer "
                  f"within {probe_s:g}s — tunnel outage?)")
    devs = []
    if alive:
        try:
            devs = jax.devices()
            print(f"  backend:   {jax.default_backend()} "
                  f"({len(devs)} device(s): {devs[0].device_kind})")
        except Exception as e:  # no usable backend
            print(f"  backend:   UNAVAILABLE ({type(e).__name__}: {e})")
    print(f"  x64:       {jax.config.jax_enable_x64}")
    cache = os.environ.get("PELE_JAX_CACHE",
                           os.path.expanduser("~/.cache/peleanalysis_tpu"))
    state = "disabled" if cache == "0" else (
        f"{cache} ({'exists' if os.path.isdir(cache) else 'will be created'})")
    print(f"  compile cache: {state}")
    try:
        from ..native import get_lib
        get_lib()
        print("  native lib: OK (qem + vismf loader)")
    except Exception as e:
        print(f"  native lib: build failed ({type(e).__name__}: {e})")
    if devs:
        import time

        import jax.numpy as jnp
        x = jnp.ones((256, 256))
        t0 = time.perf_counter()
        _ = float(jnp.sum(x @ x))
        print(f"  smoke matmul: OK ({(time.perf_counter()-t0)*1e3:.0f} ms "
              "incl. first compile)")
