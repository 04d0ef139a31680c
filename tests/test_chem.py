import os

import numpy as np
import pytest

from peleanalysis_tpu.chem.mechanism import (Mechanism, Nasa7, SimpleTransport,
                                             atom_count, molecular_weight,
                                             parse_formula)
from peleanalysis_tpu.chem.qpd import (Edge, Group, edge_fluxes, get_edges,
                                       parse_reaction)


def test_formula_parsing():
    assert parse_formula("CH4") == {"C": 1, "H": 4}
    assert parse_formula("C2H5OH") == {"C": 2, "H": 6, "O": 1}
    assert parse_formula("HO2") == {"H": 1, "O": 2}
    assert parse_formula("N2") == {"N": 2}
    assert parse_formula("AR") == {"AR": 1}
    assert abs(molecular_weight("H2O") - 18.015) < 0.01
    assert abs(molecular_weight("CO2") - 44.01) < 0.01
    assert atom_count("CH4", "H") == 4
    assert atom_count("CO2", "C") == 1


def test_x_y_roundtrip():
    mech = Mechanism(["CH4", "O2", "N2", "CO2", "H2O"])
    rng = np.random.default_rng(0)
    X = rng.uniform(0.01, 1.0, size=(5, 10))
    X /= X.sum(axis=0)
    Y = mech.x_to_y(X)
    np.testing.assert_allclose(Y.sum(axis=0), 1.0, rtol=1e-12)
    X2 = mech.y_to_x(Y)
    np.testing.assert_allclose(X2, X, rtol=1e-12)


def test_thermo_and_tsolve():
    # simple constant-cp-ish NASA7: cp/R = a0, h/RT = a0 + a5/T
    th = {
        "N2": Nasa7(200, 1000, 6000,
                    np.array([3.5, 0, 0, 0, 0, -1000.0, 0]),
                    np.array([3.5, 0, 0, 0, 0, -1000.0, 0])),
    }
    mech = Mechanism(["N2"], thermo=th)
    Y = np.ones((1, 4))
    T = np.array([300.0, 800.0, 1500.0, 2500.0])
    h = mech.h_mass(T, Y)
    # Newton inversion recovers T (testTsolve.cpp analog)
    T2 = mech.T_from_h(h, Y)
    np.testing.assert_allclose(T2, T, rtol=1e-8)


def test_transport_monotone():
    tr = SimpleTransport()
    T = np.array([300.0, 1000.0, 2000.0])
    mu = tr.viscosity(T)
    assert (np.diff(mu) > 0).all()
    lam = tr.conductivity(T, 1.0e7)
    assert (np.diff(lam) > 0).all()


def test_reaction_parse_and_edges():
    rxns = [parse_reaction("CH4 + OH <=> CH3 + H2O"),
            parse_reaction("CH3 + O2 => CH2O + OH"),
            parse_reaction("CH2O + OH <=> HCO + H2O"),
            parse_reaction("HCO + M <=> H + CO + M"),
            parse_reaction("CO + OH <=> CO2 + H")]
    edges = get_edges(rxns, "C")
    pairs = {(e.sp1, e.sp2) for e in edges}
    assert ("CH4", "CH3") in pairs
    assert ("CO", "CO2") in pairs
    # atom conservation: each reaction transfers exactly its C count
    flux = edge_fluxes(edges, np.ones(len(rxns)))
    assert abs(flux[("CH4", "CH3")] - 1.0) < 1e-12
    # H edges from rxn 1: CH4 -> CH3 (3 of 4 H... no: a=4, b: CH3 has 3,
    # H2O has 2, N=5 -> CH4->CH3 weight 4*3/5)
    # reference 2x2 min/pick splitting (util.cpp:598-682; r5 fix — the old
    # proportional a*b/N weights were 2.4/1.6): CH4->CH3 carries
    # min(4,3)=3, the remaining CH4 H goes to H2O (1), OH->H2O min(1,2)=1
    hedges = get_edges(rxns[:1], "H")
    hflux = edge_fluxes(hedges, np.ones(1))
    assert abs(hflux[("CH4", "CH3")] - 3.0) < 1e-12
    assert abs(hflux[("CH4", "H2O")] - 1.0) < 1e-12
    assert abs(hflux[("OH", "H2O")] - 1.0) < 1e-12
    # spectator netting (util.cpp:546-558): a species on both sides nets
    # to zero and generates NO edges through itself
    sp = get_edges([parse_reaction("CH2GSG + H2O <=> CH2 + H2O")], "H")
    spflux = edge_fluxes(sp, np.ones(1))
    assert set(spflux) == {("CH2GSG", "CH2")}
    assert abs(spflux[("CH2GSG", "CH2")] - 2.0) < 1e-12


def test_group_ops():
    g1 = Group({"C": 1, "H": 4})
    g2 = Group({"C": 1, "H": 3})
    d = g1 - g2
    assert d["H"] == 1 and d["C"] == 0
    assert d.same_sign()
    assert (g1 * 2)["H"] == 8
    assert abs(g1.awt() - molecular_weight("CH4")) < 1e-6


def test_plot_x_to_y_cli(tmp_path, monkeypatch):
    from peleanalysis_tpu.cli import main
    from peleanalysis_tpu.io.plotfile import PlotfileReader
    from peleanalysis_tpu.testing import write_synthetic_plotfile

    def xch4(x, y, z):
        return 0.1 + 0.05 * x

    def xo2(x, y, z):
        return 0.2 + 0 * x

    def xn2(x, y, z):
        return 0.7 - 0.05 * x

    fields = {"X(CH4)": xch4, "X(O2)": xo2, "X(N2)": xn2,
              "Temp": lambda x, y, z: 300 + 0 * x}
    plt = str(tmp_path / "plt")
    write_synthetic_plotfile(plt, n_cell=8, n_levels=1, fields=fields)
    out = str(tmp_path / "yplt")
    assert main(["plotXtoY", f"infile={plt}", f"outfile={out}"]) == 0
    r = PlotfileReader(out)
    assert r.var_names == ["Y(CH4)", "Y(O2)", "Y(N2)", "Temp"]
    fabs = r.read_level(0)
    ysum = fabs[0][0] + fabs[0][1] + fabs[0][2]
    np.testing.assert_allclose(ysum, 1.0, rtol=1e-12)
    # roundtrip back
    out2 = str(tmp_path / "xplt")
    assert main(["plotYtoX", f"infile={out}", f"outfile={out2}"]) == 0
    r2 = PlotfileReader(out2)
    x_back = r2.read_level(0)[0][0]
    src = PlotfileReader(plt).read_level(0)[0][0]
    np.testing.assert_allclose(x_back, src, rtol=1e-10)


def test_transport_cli(tmp_path):
    from peleanalysis_tpu.cli import main
    from peleanalysis_tpu.io.plotfile import PlotfileReader
    from peleanalysis_tpu.testing import write_synthetic_plotfile

    fields = {"Y(O2)": lambda x, y, z: 0.23 + 0 * x,
              "Y(N2)": lambda x, y, z: 0.77 + 0 * x,
              "Temp": lambda x, y, z: 300 + 500 * x,
              "density": lambda x, y, z: 1.2e-3 + 0 * x}
    plt = str(tmp_path / "plt")
    write_synthetic_plotfile(plt, n_cell=8, n_levels=1, fields=fields)
    out = str(tmp_path / "tr")
    assert main(["plotTransportCoeff", f"infile={plt}",
                 f"outfile={out}"]) == 0
    r = PlotfileReader(out)
    assert r.var_names == ["viscosity", "conductivity", "diffusivity"]
    out2 = str(tmp_path / "le")
    assert main(["plotTYtoLe", f"infile={plt}", f"outfile={out2}"]) == 0
    r2 = PlotfileReader(out2)
    assert r2.var_names == ["Le(O2)", "Le(N2)"]
    le = r2.read_level(0)[0]
    np.testing.assert_allclose(le, 1.0, rtol=1e-10)


def test_qpd_cli(tmp_path):
    from peleanalysis_tpu.cli import main
    mf = str(tmp_path / "mech.txt")
    with open(mf, "w") as f:
        f.write("CH4 + OH <=> CH3 + H2O\nCO + OH <=> CO2 + H\n")
    out = str(tmp_path / "edges.dat")
    assert main(["plotQPD", f"mech_file={mf}", "trace_element=C",
                 f"outfile={out}"]) == 0
    txt = open(out).read()
    assert "CH4 CH3" in txt and "CO CO2" in txt


def test_sco2_cli(tmp_path, monkeypatch):
    from peleanalysis_tpu.cli import main
    from peleanalysis_tpu.testing import write_synthetic_plotfile
    fields = {
        "adv_0": lambda x, y, z: np.clip(x, 0, 1),
        "adv_1": lambda x, y, z: np.clip(y, 0, 1),
        "Var1": lambda x, y, z: 2.0 + 0 * x,
        "Var2": lambda x, y, z: x,
        "Var3": lambda x, y, z: y,
        "vfrac": lambda x, y, z: 1.0 + 0 * x,
    }
    plt = str(tmp_path / "plt")
    write_synthetic_plotfile(plt, n_cell=16, n_levels=1, fields=fields)
    monkeypatch.chdir(tmp_path)
    rc = main(["sCO2", f"infile={plt}",
               "comps=adv_0 adv_1 Var1 Var2 Var3 vfrac",
               "planeCoord=0", "nBins=8", "nBinPlanes=4"])
    assert rc == 0
    mean = np.loadtxt("Output/mean.dat")
    assert mean.shape == (4, 4)
    # Var1 constant 2.0 -> all slab averages = 2
    np.testing.assert_allclose(mean[:, 1], 2.0, rtol=1e-12)
    mcmt = np.loadtxt("Output/mcmt.dat")
    np.testing.assert_allclose(mcmt[:, 1], 2.0, rtol=1e-12)


def test_build_pmf(tmp_path, monkeypatch):
    from peleanalysis_tpu.cli import main
    from peleanalysis_tpu.tools.build_pmf import pmf_average, read_table
    monkeypatch.chdir(tmp_path)
    x = np.linspace(0.0, 1.0, 21)
    tbl = np.column_stack([x, 2 * x + 1, x**2])
    with open("flame.dat", "w") as f:
        f.write('VARIABLES = "X" "T" "Y(H2)"\n')
        np.savetxt(f, tbl)
    assert main(["buildPMF", "infile=flame.dat", "outfile=pmf.dat",
                 "fortran=pmf.f90"]) == 0
    names, data = read_table("pmf.dat")
    assert names == ["X", "T", "Y(H2)"]
    np.testing.assert_allclose(data, tbl, rtol=1e-12)
    # average of 2x+1 over [0.25, 0.75] = 2*0.5+1 = 2 (exact, pw-linear)
    avg = pmf_average(data[:, 0], data[:, 1:], 0.25, 0.75)
    np.testing.assert_allclose(avg[0], 2.0, rtol=1e-12)
    # point evaluation when xlo == xhi
    pt = pmf_average(data[:, 0], data[:, 1:], 0.5, 0.5)
    np.testing.assert_allclose(pt[0], 2.0, rtol=1e-12)
    src = open("pmf.f90").read()
    assert "subroutine pmf(" in src and "pmf_N = 21" in src
