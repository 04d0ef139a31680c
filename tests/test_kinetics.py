"""Chemical kinetics: CHEMKIN parsing + Qf/Qr evaluation (the CKPX/CKKFKR
analog, /root/reference/Src/ModelSpecificAnalysis/plotQPD.cpp:144-156) and
the plotQPD raw-plotfile path it unlocks."""
import numpy as np
import pytest

from peleanalysis_tpu.chem.kinetics import (Kinetics, P_ATM, R_CAL,
                                            parse_chemkin,
                                            parse_kinetic_reaction)
from peleanalysis_tpu.chem.mechanism import Nasa7, R_UNIV

MECH = """
ELEMENTS
H O N
END
SPECIES
H O2 OH O HO2 H2O N2
END
REACTIONS CAL/MOLE
H + O2 => OH + O          2.0E14 0.0  16000.
H + O2 + M => HO2 + M     6.0E17 -0.8 0.
  H2O/6.0/ N2/1.0/
OH + OH (+M) => H2O + O (+M)  1.0E13 0.0 0.
  LOW / 1.0E16 0.0 0.0 /
  TROE / 0.6 100.0 1000.0 /
END
"""


def _mech(tmp_path, text=MECH, name="mech.inp"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def _state(kin, T=1500.0):
    X = np.zeros((1, 7))
    X[0] = [0.01, 0.2, 0.001, 0.001, 0.0, 0.1, 0.688]
    Tv = np.array([T])
    rho = np.array([1.0e-4])    # g/cm^3
    P = kin.pressure_from_rho(rho, Tv, X)
    C = kin.concentrations(P, Tv, X)
    return Tv, X, rho, C


def test_parse_chemkin_features(tmp_path):
    sp, rxns, th = parse_chemkin(_mech(tmp_path))
    assert sp == ["H", "O2", "OH", "O", "HO2", "H2O", "N2"]
    assert len(rxns) == 3
    r0, r1, r2 = rxns
    assert (r0.A, r0.beta, r0.Ea) == (2.0e14, 0.0, 16000.0)
    assert not r0.reversible and not r0.third_body and not r0.falloff
    assert r1.third_body and r1.efficiencies == {"H2O": 6.0, "N2": 1.0}
    assert r2.falloff and r2.low == (1.0e16, 0.0, 0.0)
    assert r2.troe == (0.6, 100.0, 1000.0)


def test_parse_units_and_aux(tmp_path):
    text = """
REACTIONS KCAL/MOLE
A1 + B1 <=> C1          1.0E10 0.5 16.0
  REV / 2.0E9 0.0 10.0 /
A1 + B1 => C1           3.0E10 0.0 5.0
DUPLICATE
"""
    # fake species so formula parsing isn't exercised
    sp, rxns, _ = parse_chemkin(_mech(tmp_path, text, "u.inp"))
    assert rxns[0].Ea == pytest.approx(16000.0)       # kcal -> cal
    assert rxns[0].rev == (2.0e9, 0.0, 10000.0)
    assert rxns[1].duplicate


def test_bare_reaction_lines_still_parse(tmp_path):
    # legacy plotQPD edge-only input: equations without Arrhenius data
    text = "CH4 + OH <=> CH3 + H2O\nCO + OH <=> CO2 + H\n"
    sp, rxns, _ = parse_chemkin(_mech(tmp_path, text, "bare.inp"))
    assert len(rxns) == 2 and not rxns[0].has_arrhenius
    assert "CH4" in sp and "CO2" in sp


def test_forward_arrhenius_and_third_body(tmp_path):
    sp, rxns, _ = parse_chemkin(_mech(tmp_path))
    kin = Kinetics(sp, rxns)
    T, X, rho, C = _state(kin)
    Qf, Qr = kin.qf_qr_from_state(T, rho, X)
    assert Qr.max() == 0.0                 # all irreversible
    kf0 = 2.0e14 * np.exp(-16000.0 / (R_CAL * T[0]))
    np.testing.assert_allclose(Qf[0, 0], kf0 * C[0, 0] * C[0, 1], rtol=1e-12)
    # third body: ctb = sum(C) + (6-1)*C_H2O
    kf1 = 6.0e17 * T[0] ** -0.8
    ctb = C[0].sum() + 5.0 * C[0, 5]
    np.testing.assert_allclose(Qf[0, 1], kf1 * C[0, 0] * C[0, 1] * ctb,
                               rtol=1e-10)


def test_troe_falloff_matches_direct_formula(tmp_path):
    sp, rxns, _ = parse_chemkin(_mech(tmp_path))
    kin = Kinetics(sp, rxns)
    T, X, rho, C = _state(kin)
    Qf, _ = kin.qf_qr(T, C)
    kinf, k0 = 1.0e13, 1.0e16
    ctb = C[0].sum()
    Pr = k0 * ctb / kinf
    a, t3, t1 = 0.6, 100.0, 1000.0
    Fc = (1 - a) * np.exp(-T[0] / t3) + a * np.exp(-T[0] / t1)
    lf = np.log10(Fc)
    c_, n_ = -0.4 - 0.67 * lf, 0.75 - 1.27 * lf
    f1 = (np.log10(Pr) + c_) / (n_ - 0.14 * (np.log10(Pr) + c_))
    F = 10 ** (lf / (1 + f1 * f1))
    q = kinf * Pr / (1 + Pr) * F * C[0, 2] ** 2
    np.testing.assert_allclose(Qf[0, 2], q, rtol=1e-10)


def test_troe_zero_param_term_vanishes(tmp_path):
    # r5 review fix: Fuego guards |T***|>1e-100 else the term is ZERO
    # (exp(-T/T3) -> 0 as T3 -> 0+); zero params must not become exp(0)=1
    text = """
REACTIONS
OH + OH (+M) => H2O + O   1.0E13 0.0 0.
  LOW / 1.0E16 0.0 0.0 /
  TROE / 0.6 0.0 1000.0 /
"""
    sp, rxns, _ = parse_chemkin(_mech(tmp_path, text, "tz.inp"))
    kin = Kinetics(sp, rxns)
    T = np.array([1500.0])
    C = np.full((1, len(sp)), 1e-6)
    Qf, _ = kin.qf_qr(T, C)
    kinf, k0 = 1.0e13, 1.0e16
    ctb = C[0].sum()
    Pr = k0 * ctb / kinf
    a, t1 = 0.6, 1000.0
    Fc = a * np.exp(-T[0] / t1)          # (1-a)-term GONE (T***=0)
    lf = np.log10(Fc)
    c_, n_ = -0.4 - 0.67 * lf, 0.75 - 1.27 * lf
    f1 = (np.log10(Pr) + c_) / (n_ - 0.14 * (np.log10(Pr) + c_))
    F = 10 ** (lf / (1 + f1 * f1))
    ioh = sp.index("OH")
    q = kinf * Pr / (1 + Pr) * F * C[0, ioh] ** 2
    np.testing.assert_allclose(Qf[0, 0], q, rtol=1e-10)


def test_negative_A_duplicate_pair(tmp_path):
    # negative pre-exponentials are legal CHEMKIN (negative-A DUPLICATE fit
    # pairs, e.g. Aramco-family OH+HO2); r5 review fix: log(A<0) made NaN
    text = """
REACTIONS
OH + HO2 => H2O + O2     1.0E13  0.0  0.
DUPLICATE
OH + HO2 => H2O + O2    -2.0E12  0.0  0.
DUPLICATE
"""
    sp, rxns, _ = parse_chemkin(_mech(tmp_path, text, "na.inp"))
    kin = Kinetics(sp, rxns)
    T = np.array([1000.0])
    C = np.full((1, len(sp)), 2e-7)
    Qf, Qr = kin.qf_qr(T, C)
    assert np.isfinite(Qf).all()
    i1, i2 = sp.index("OH"), sp.index("HO2")
    np.testing.assert_allclose(Qf[0, 0], 1.0e13 * C[0, i1] * C[0, i2],
                               rtol=1e-12)
    np.testing.assert_allclose(Qf[0, 1], -2.0e12 * C[0, i1] * C[0, i2],
                               rtol=1e-12)
    # the pair sums to the intended net rate
    assert Qf[0].sum() > 0


def test_species_end_on_one_line_and_d_exponents(tmp_path):
    # r5 review fixes: 'SPECIES ... END' on one line must not collect END
    # as a species; efficiency values with Fortran D exponents must parse
    text = """
SPECIES H O2 HO2 H2O N2 END
REACTIONS
H + O2 + M => HO2 + M     6.0D17 -0.8 0.
  H2O/6.0D0/ N2/1.5d0/
"""
    sp, rxns, _ = parse_chemkin(_mech(tmp_path, text, "de.inp"))
    assert sp == ["H", "O2", "HO2", "H2O", "N2"]
    assert rxns[0].efficiencies == {"H2O": 6.0, "N2": 1.5}
    assert rxns[0].A == 6.0e17


def test_isomer_prefix_formulas():
    # r5 review fix: NC7H16 (n-heptane) parsed a phantom nitrogen atom
    from peleanalysis_tpu.chem.mechanism import (molecular_weight,
                                                 parse_formula)
    assert parse_formula("NC7H16") == {"C": 7, "H": 16}
    assert abs(molecular_weight("NC7H16") - 100.2) < 0.1
    assert parse_formula("N-C4H10") == {"C": 4, "H": 10}
    assert parse_formula("IC8H18") == {"C": 8, "H": 18}
    # genuine nitrogen species stay nitrogen
    assert parse_formula("NH3") == {"N": 1, "H": 3}
    assert parse_formula("NO2") == {"N": 1, "O": 2}
    assert parse_formula("HCN") == {"H": 1, "C": 1, "N": 1}


def test_thermo_blank_tmid_uses_header_default(tmp_path):
    # r5 review fix: species relying on the global THERMO range line were
    # silently dropped (float('') raised, except skipped the species)
    from peleanalysis_tpu.chem.mechanism import parse_chemkin_thermo
    l1 = "H2O               L 8/89H   2O   1          G   200.000  3500.000"
    l1 = l1.ljust(79) + "1"
    c = ["4.19864056E+00", "-2.03643410E-03", "6.52040211E-06",
         "-5.48797062E-09", "1.77197817E-12", "-3.02937267E+04",
         "-8.49032208E-01"]
    h = ["3.03399249E+00", "2.17691804E-03", "-1.64072518E-07",
         "-9.70419870E-11", "1.68200992E-14", "-3.00042971E+04",
         "4.96677010E+00"]
    l2 = "".join(f"{v:>15}" for v in h[:5]).ljust(79) + "2"
    l3 = "".join(f"{v:>15}" for v in (h[5:] + c[:3])).ljust(79) + "3"
    l4 = "".join(f"{v:>15}" for v in c[3:]).ljust(79) + "4"
    p = tmp_path / "therm.dat"
    p.write_text("THERMO\n   300.000  1250.000  5000.000\n"
                 + "\n".join([l1, l2, l3, l4]) + "\nEND\n")
    th = parse_chemkin_thermo(str(p))
    assert "H2O" in th
    assert th["H2O"].t_mid == 1250.0


def test_g_RT_matches_nasa7_oracle():
    # Kinetics._g_RT (batched tables) == Nasa7.h_RT - Nasa7.s_R per species
    th = _h2o_thermo()
    kin = Kinetics(["H2O"], [_simple_rxn()], {"H2O": th})
    T = np.array([400.0, 1500.0])
    g = kin._g_RT(T, np)
    want = th.h_RT(T) - th.s_R(T)
    np.testing.assert_allclose(g[:, 0], want, rtol=1e-13)


def _simple_rxn():
    from peleanalysis_tpu.chem.kinetics import KineticReaction
    return KineticReaction({"H2O": 1.0}, {"H2O": 1.0}, A=1.0, beta=0.0,
                           Ea=0.0, reversible=False, label="ident")


def _h2o_thermo():
    lo = np.array([4.19864056, -2.0364341e-3, 6.52040211e-6,
                   -5.48797062e-9, 1.77197817e-12, -3.02937267e4,
                   -0.849032208])
    hi = np.array([3.03399249, 2.17691804e-3, -1.64072518e-7,
                   -9.7041987e-11, 1.68200992e-14, -3.00042971e4,
                   4.9667701])
    return Nasa7(200.0, 1000.0, 3500.0, lo, hi)


def test_lindemann_limits(tmp_path):
    text = """
SPECIES
A2 B2 P2
END
REACTIONS
A2 + B2 (+M) => P2 (+M)   1.0E13 0.0 0.0
  LOW / 1.0E16 0.0 0.0 /
END
"""
    sp, rxns, _ = parse_chemkin(_mech(tmp_path, text, "lin.inp"))
    kin = Kinetics(sp, rxns)
    T = np.array([1000.0])
    # high-pressure limit: Pr >> 1 -> k_eff -> k_inf
    Ch = np.full((1, 3), 1.0)        # huge ctb
    Qf, _ = kin.qf_qr(T, Ch)
    np.testing.assert_allclose(Qf[0, 0], 1.0e13 * 1.0 * 1.0, rtol=1e-2)
    # low-pressure limit: Pr << 1 -> k_eff -> k0 * ctb
    Cl = np.full((1, 3), 1.0e-12)
    Qf, _ = kin.qf_qr(T, Cl)
    np.testing.assert_allclose(Qf[0, 0], 1.0e16 * 3e-12 * 1e-24, rtol=1e-2)


def test_reverse_from_equilibrium():
    th = {"O": Nasa7(200, 1000, 6000,
                     np.array([2.5, 0, 0, 0, 0, 29230.0, 4.0]),
                     np.array([2.5, 0, 0, 0, 0, 29230.0, 4.0])),
          "O2": Nasa7(200, 1000, 6000,
                      np.array([3.5, 0, 0, 0, 0, -1000.0, 5.0]),
                      np.array([3.5, 0, 0, 0, 0, -1000.0, 5.0]))}
    rxn = parse_kinetic_reaction("O + O <=> O2   1.0E13 0.0 0.0")
    kin = Kinetics(["O", "O2"], [rxn], th)
    T = np.array([2000.0])
    C = np.array([[1e-6, 2e-6]])
    Qf, Qr = kin.qf_qr(T, C)

    def gRT(a0, a5, a6):
        return a0 + a5 / T[0] - (a0 * np.log(T[0]) + a6)

    dG = gRT(3.5, -1000, 5) - 2 * gRT(2.5, 29230, 4)
    lnKc = -dG - np.log(P_ATM / (R_UNIV * T[0]))    # nu_sum = -1
    kr = 1.0e13 / np.exp(lnKc)
    np.testing.assert_allclose(Qf[0, 0], 1.0e13 * 1e-12, rtol=1e-12)
    np.testing.assert_allclose(Qr[0, 0], kr * 2e-6, rtol=1e-10)


def test_rev_arrhenius_override():
    rxn = parse_kinetic_reaction("A3 <=> B3   1.0E13 0.0 0.0")
    rxn.rev = (5.0e12, 0.0, 2000.0)
    kin = Kinetics(["A3", "B3"], [rxn])     # no thermo needed with REV
    T = np.array([1000.0])
    C = np.array([[1e-6, 3e-6]])
    _, Qr = kin.qf_qr(T, C)
    kr = 5.0e12 * np.exp(-2000.0 / (R_CAL * 1000.0))
    np.testing.assert_allclose(Qr[0, 0], kr * 3e-6, rtol=1e-12)


def test_missing_thermo_raises():
    rxn = parse_kinetic_reaction("A3 <=> B3   1.0E13 0.0 0.0")
    with pytest.raises(ValueError, match="NASA7 thermo"):
        Kinetics(["A3", "B3"], [rxn])


def test_zero_concentration_is_finite_zero(tmp_path):
    sp, rxns, _ = parse_chemkin(_mech(tmp_path))
    kin = Kinetics(sp, rxns)
    Qf, Qr = kin.qf_qr(np.array([2000.0]), np.zeros((1, 7)))
    assert np.isfinite(Qf).all() and np.isfinite(Qr).all()
    assert Qf.max() == 0.0


def test_numpy_vs_jit_parity(tmp_path):
    import jax
    import jax.numpy as jnp
    sp, rxns, _ = parse_chemkin(_mech(tmp_path))
    kin = Kinetics(sp, rxns)
    rng = np.random.default_rng(0)
    T = rng.uniform(800, 2500, (32,))
    C = np.abs(rng.normal(1e-6, 5e-7, (32, 7)))
    Qf, Qr = kin.qf_qr(T, C)
    Qfj, Qrj = jax.jit(lambda t, c: kin.qf_qr(t, c, xp=jnp))(T, C)
    np.testing.assert_allclose(np.asarray(Qfj), Qf, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(Qrj), Qr, rtol=1e-8)


def test_plotqpd_from_raw_plotfile(tmp_path, monkeypatch):
    """plotQPD on a raw plotfile (no rate comps): Qf/Qr evaluated from
    T/density/X through the mechanism, hand-checkable 2-reaction case
    (the reference flow, plotQPD.cpp:113-186)."""
    from peleanalysis_tpu.chem.mechanism import molecular_weight
    from peleanalysis_tpu.cli import main
    from peleanalysis_tpu.testing import write_synthetic_plotfile

    text = """
SPECIES
CH4 CH3 H2O OH O2 CO CO2 H
END
REACTIONS
CH4 + OH => CH3 + H2O    1.0E12  0.0  0.
CO + OH => CO2 + H       2.0E12  0.0  0.
END
"""
    mf = _mech(tmp_path, text, "c.inp")
    species = ["CH4", "CH3", "H2O", "OH", "O2", "CO", "CO2", "H"]
    Xv = np.array([0.1, 0.01, 0.05, 0.02, 0.2, 0.1, 0.02, 0.5])
    fields = {f"X({s})": (lambda x, y, z, v=v: v + 0 * x)
              for s, v in zip(species, Xv)}
    fields["temp"] = lambda x, y, z: 1000.0 + 0 * x
    fields["density"] = lambda x, y, z: 0.5 + 0 * x     # MKS kg/m^3
    plt = str(tmp_path / "plt")
    write_synthetic_plotfile(plt, n_cell=8, n_levels=2, fields=fields)
    out = str(tmp_path / "qpd.dat")
    assert main(["plotQPD", f"mech_file={mf}", f"infile={plt}",
                 "QPDatom=C", f"QPDfileName={out}"]) == 0

    # hand evaluation: uniform fields -> integral = Q * V_domain exactly
    # (valid cells tile the domain across levels)
    W = np.array([molecular_weight(s) for s in species])
    rho = 0.5e-3                                   # cgs
    C = Xv * rho / (Xv @ W)                        # mol/cm^3
    q1 = 1.0e12 * C[0] * C[3]                      # CH4+OH
    q2 = 2.0e12 * C[5] * C[3]                      # CO+OH
    # normalized to the CH4->CH3 edge: CH4->CH3 = 1, CO->CO2 = q2/q1
    lines = open(out).read().splitlines()
    assert lines[1].split() == species
    vals = {}
    for ln in lines[2:]:
        t = ln.split()
        vals[(t[0], t[1])] = (float(t[2]), float(t[3]))
    np.testing.assert_allclose(vals[("CH4", "CH3")][0], 1.0, rtol=1e-10)
    np.testing.assert_allclose(vals[("CO", "CO2")][0], q2 / q1, rtol=1e-10)
    # irreversible: -Qr columns all zero
    assert all(v[1] == 0.0 for v in vals.values())


def test_plotqpd_ratebase_override(tmp_path):
    """rateBase= keeps working: pre-baked rate comps win over kinetics."""
    from peleanalysis_tpu.cli import main
    from peleanalysis_tpu.testing import write_synthetic_plotfile

    text = "CH4 + OH => CH3 + H2O\nCO + OH => CO2 + H\n"
    mf = _mech(tmp_path, text, "bare.inp")
    fields = {"rate_0": lambda x, y, z: 2.0 + 0 * x,
              "rate_1": lambda x, y, z: 6.0 + 0 * x}
    plt = str(tmp_path / "plt")
    write_synthetic_plotfile(plt, n_cell=8, n_levels=1, fields=fields)
    out = str(tmp_path / "qpd.dat")
    assert main(["plotQPD", f"mech_file={mf}", f"infile={plt}",
                 "rateBase=rate", f"QPDfileName={out}"]) == 0
    vals = {}
    for ln in open(out).read().splitlines()[2:]:
        t = ln.split()
        vals[(t[0], t[1])] = float(t[2])
    # normalized to CH4->CH3: CO->CO2 = 6/2 = 3
    np.testing.assert_allclose(vals[("CH4", "CH3")], 1.0, rtol=1e-10)
    np.testing.assert_allclose(vals[("CO", "CO2")], 3.0, rtol=1e-10)


def test_plotqpd_explicit_ratebase_missing_comps_raises(tmp_path):
    # r5 review fix: an explicit rateBase= with missing comps must ERROR,
    # not silently fall through to the kinetics-evaluated path
    from peleanalysis_tpu.cli import main
    from peleanalysis_tpu.testing import write_synthetic_plotfile

    text = "CH4 + OH => CH3 + H2O\nCO + OH => CO2 + H\n"
    mf = _mech(tmp_path, text, "bare2.inp")
    plt = str(tmp_path / "plt_norates")
    write_synthetic_plotfile(plt, n_cell=8, n_levels=1,
                             fields={"rate_0": lambda x, y, z: 2.0 + 0 * x})
    with pytest.raises(ValueError, match="rateBase.*lacks"):
        main(["plotQPD", f"mech_file={mf}", f"infile={plt}",
              "rateBase=rate"])
