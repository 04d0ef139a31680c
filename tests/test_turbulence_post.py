"""Turbulence_analysis pipeline analogs (r1 verdict gap #5): tseries scrape,
slice scrape, plotfile augmentation, varfield average, and the post.sh
driver — over the framework's own reader, no yt/FFTW."""
import os
import subprocess
import sys

import numpy as np
import pytest

from peleanalysis_tpu.cli import main
from peleanalysis_tpu.testing import write_synthetic_plotfile

FIELDS = {
    "x_velocity": lambda x, y, z: np.sin(2 * np.pi * y),
    "y_velocity": lambda x, y, z: np.sin(2 * np.pi * z),
    "z_velocity": lambda x, y, z: np.sin(2 * np.pi * x),
    "temp": lambda x, y, z: 300.0 + 10 * np.cos(2 * np.pi * x),
    "density": lambda x, y, z: 1.0 + 0 * x,
}


@pytest.fixture(scope="module")
def hit_run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hit"))
    for i, t in enumerate([0.0, 0.1]):
        write_synthetic_plotfile(f"{root}/plt{i:05d}", n_cell=16,
                                 n_levels=1, fields=FIELDS, time=t,
                                 is_periodic=(True, True, True))
    with open(f"{root}/ic.txt", "w") as f:
        f.write("urms0, lambda0, tau, T0, Mach, c_s0\n")
        f.write("1.0, 0.5, 0.2, 300.0, 0.1, 340.0\n")
    return root


def test_tseries_scrape_values(hit_run):
    """Volume-weighted HIT statistics match the analytic field (with the
    centered-difference attenuation factor on vorticity)."""
    assert main(["turbulenceTseries", f"root_dir={hit_run}"]) == 0
    lines = open(f"{hit_run}/tseries.csv").read().splitlines()
    assert len(lines) == 3                   # header + 2 plotfiles
    vals = dict(zip(["tau"] + lines[0].split(",")[1:],
                    map(float, lines[1].split(","))))
    # <|u|^2> of three unit sines = 1.5; adim by 3*urms0^2 -> 0.5
    assert abs(vals["kin_energy_avg_adim"] - 0.5) < 1e-6
    assert abs(vals["urms_computed"] - np.sqrt(0.5)) < 1e-6
    # curl u = -2pi(cos 2pi z, cos 2pi x, cos 2pi y): <|w|^2> = 3(2pi)^2/2,
    # discrete centered difference attenuates each derivative by sin(kh)/kh
    kh = 2 * np.pi / 16
    w2 = 3 * (2 * np.pi) ** 2 * 0.5 * (np.sin(kh) / kh) ** 2
    assert abs(vals["magvort_sq_avg_adim"] - w2 / 4) / (w2 / 4) < 1e-6
    # solenoidal field: divu = 0
    assert vals["divu_sq_avg_adim"] < 1e-12
    # <T'^2> = 50; adim by ((gamma-1) T0 Mach^2)^2 = 1.44
    assert abs(vals["temp_var_sq_avg_adim"] - 50.0 / 1.44) < 1e-3


def test_augment_plotfile(hit_run, tmp_path):
    out = str(tmp_path / "aug")
    assert main(["augmentPlotfile", f"infile={hit_run}/plt00001",
                 f"outfile={out}"]) == 0
    from peleanalysis_tpu.io.plotfile import PlotfileReader
    r = PlotfileReader(out)
    for n in ("x_vorticity", "y_vorticity", "z_vorticity", "magvort",
              "divu"):
        assert n in r.var_names


def test_slice_and_varfield_average(hit_run, capsys):
    assert main(["turbulenceSlice", f"root_dir={hit_run}",
                 "plotfile=plt00001"]) == 0
    assert os.path.exists(f"{hit_run}/plt00001_slice.dat")
    assert main(["varfieldAverage", f"plotfile={hit_run}/plt00001",
                 "var=temp"]) == 0
    outp = capsys.readouterr().out
    # mass-weighted <temp> with uniform density = 300 exactly
    assert "Average temp" in outp
    val = float(outp.split("is")[-1].split()[0])
    assert abs(val - 300.0) < 1e-6


def test_post_hit_driver(hit_run):
    """The post.sh analog chains augment-free tseries + spectra + slice."""
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": os.path.dirname(os.path.dirname(
               os.path.abspath(__file__)))}
    res = subprocess.run(
        [sys.executable, "scripts/post_hit.py", hit_run],
        capture_output=True, text=True, env=env,
        cwd=env["PYTHONPATH"])
    assert res.returncode == 0, res.stderr[-500:]
    assert os.path.exists(f"{hit_run}/tseries.csv")
    assert os.path.exists(f"{hit_run}/plt00001_slice.dat")
