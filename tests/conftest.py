import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (SURVEY.md §4 "Implication for the TPU build").
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_plotfile(tmp_path_factory):
    from peleanalysis_tpu.testing import write_synthetic_plotfile

    path = str(tmp_path_factory.mktemp("plt") / "plt00000")
    geoms, bas, ratios, names, data = write_synthetic_plotfile(path)
    return {
        "path": path, "geoms": geoms, "bas": bas, "ratios": ratios,
        "names": names, "data": data,
    }


@pytest.fixture(scope="session")
def periodic_plotfile(tmp_path_factory):
    from peleanalysis_tpu.testing import write_synthetic_plotfile

    path = str(tmp_path_factory.mktemp("pltper") / "plt00000")
    out = write_synthetic_plotfile(path, is_periodic=(True, True, True))
    geoms, bas, ratios, names, data = out
    return {
        "path": path, "geoms": geoms, "bas": bas, "ratios": ratios,
        "names": names, "data": data,
    }
