"""The reference's shipped InputsSamples files must drive our CLI
unmodified (Src/InputsSamples/inputs.{grad,condMean,jpdf}) — the strongest
ParmParse-surface parity check available."""
import os

import numpy as np
import pytest

from peleanalysis_tpu.testing import write_synthetic_plotfile

REF = "/root/reference/Src/InputsSamples"


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("refinputs")
    fields = {
        "temp": lambda x, y, z: 300 + 1500 * np.exp(
            -((x - .5) ** 2 + (y - .5) ** 2 + (z - .5) ** 2) / 0.05),
        "density": lambda x, y, z: 1.0 + 0.1 * x,
        "x_velocity": lambda x, y, z: 1.0 + y,
        "y_velocity": lambda x, y, z: x,
        "z_velocity": lambda x, y, z: 0.3 + z,
        "Y(CH4)": lambda x, y, z: 0.05 * (1 - x),
    }
    for i in range(34):   # inputs.condMean uses integer comp indices up to 38
        fields[f"Y(S{i})"] = (lambda k: (lambda x, y, z: 0.01 * k + 0 * x))(i)
    write_synthetic_plotfile(str(d / "plt00005"), n_cell=16, n_levels=3,
                             fields=fields)
    return d


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
@pytest.mark.parametrize("tool,inputs,extra", [
    ("grad", "inputs.grad", []),
    ("conditionalMean", "inputs.condMean", ["infile=plt00005"]),
    ("jpdf", "inputs.jpdf", ["infile=plt00005"]),
])
def test_reference_inputs_verbatim(workdir, tool, inputs, extra,
                                   monkeypatch):
    from peleanalysis_tpu.cli import main as cli
    monkeypatch.chdir(workdir)
    assert cli([tool, os.path.join(REF, inputs)] + extra) == 0
    if tool == "grad":
        from peleanalysis_tpu.amr.hierarchy import AmrState
        st = AmrState.from_plotfile(str(workdir / "pltgrad"))
        # gradVar + Aux_Variables passthrough + 4 gradient comps
        assert st.names[:3] == ["temp", "density", "x_velocity"]
        assert "||gradtemp||" in "".join(st.names) or len(st.names) == 7
