"""Chemistry-aware plotfile tools (SURVEY.md §2.5,
/root/reference/Src/ModelSpecificAnalysis/): plotXtoY, plotYtoX,
plotTransportCoeff, plotTYtoLe, plotQPD.  Species are discovered from the
plotfile's X(name)/Y(name) variables (plotXtoY.cpp:72-99 convention) rather
than compiled in; thermo/transport come from peleanalysis_tpu.chem.
"""
from __future__ import annotations

import numpy as np

from ..amr.hierarchy import AmrState
from ..chem.mechanism import Mechanism, SimpleTransport, parse_chemkin_thermo
from ..chem.qpd import edge_fluxes, get_edges, parse_reaction
from ..io.plotfile import PlotfileReader
from ..parmparse import ParmParse

TEMP_NAME = "Temp"


def _convert(args: dict, src_prefix: str, dst_prefix: str) -> None:
    from ..io.plotfile import PlotfileReader

    pp = ParmParse(args)
    infile = pp.get_str("infile")
    var_names = PlotfileReader(infile).var_names
    mech = Mechanism.from_plotfile_vars(var_names, src_prefix)
    in_names = [f"{src_prefix}({s})" for s in mech.species]
    tname = TEMP_NAME if TEMP_NAME in var_names else (
        "temp" if "temp" in var_names else None)
    load = in_names + ([tname] if tname else [])
    st = AmrState.from_plotfile(infile, names=load,
                                max_level=pp.query_int("finestLevel", None),
                                dtype=np.float64)
    ns = len(mech.species)
    out_levels = []
    import jax.numpy as jnp
    for lev in range(st.meta.n_levels):
        X = np.asarray(st.data[lev][:, :ns])          # [nbox, ns, ...]
        Xs = np.moveaxis(X, 1, 0)
        Y = mech.x_to_y(Xs) if src_prefix == "X" else mech.y_to_x(Xs)
        out = np.moveaxis(Y, 0, 1)
        if tname:
            out = np.concatenate([out, np.asarray(st.data[lev][:, ns:])],
                                 axis=1)
        out_levels.append(jnp.asarray(out))
    names = [f"{dst_prefix}({s})" for s in mech.species] \
        + ([tname] if tname else [])
    st.with_data(names, out_levels).to_plotfile(
        pp.query_str("outfile", infile + f"_{dst_prefix}"))
    print("wrote output")


def _transport(args: dict, lewis_out: bool) -> None:
    from ..io.plotfile import PlotfileReader

    pp = ParmParse(args)
    infile = pp.get_str("infile")
    var_names = PlotfileReader(infile).var_names
    prefix = "Y" if any(n.startswith("Y(") for n in var_names) else "X"
    mech = Mechanism.from_plotfile_vars(var_names, prefix)
    if pp.contains("thermo_file"):
        mech.thermo = parse_chemkin_thermo(pp.get_str("thermo_file"))
    tname = TEMP_NAME if TEMP_NAME in var_names else "temp"
    rname = pp.query_str("densityName",
                         "density" if "density" in var_names else None)
    load = [f"{prefix}({s})" for s in mech.species] + [tname] \
        + ([rname] if rname else [])
    st = AmrState.from_plotfile(infile, names=load,
                                max_level=pp.query_int("finestLevel", None),
                                dtype=np.float64)
    tr = SimpleTransport(
        mu_ref=pp.query_float("mu_ref", 1.716e-4),
        prandtl=pp.query_float("prandtl", 0.7),
        lewis=pp.query_float("lewis", 1.0))
    ns = len(mech.species)
    import jax.numpy as jnp
    out_levels = []
    for lev in range(st.meta.n_levels):
        arr = np.asarray(st.data[lev])
        Y = np.moveaxis(arr[:, :ns], 1, 0)
        if prefix == "X":
            Y = mech.x_to_y(Y)
        T = arr[:, ns]
        rho = arr[:, ns + 1] if rname else np.ones_like(T)
        if mech.thermo:
            cp = mech.cp_mass(T, Y)
        else:
            cp = np.full_like(T, 1.005e7)  # air-like cp [erg/(g K)]
        mu = tr.viscosity(T)
        lam = tr.conductivity(T, cp)
        D = tr.diffusivity(T, rho, cp, None)
        if lewis_out:
            le = lam / np.maximum(rho * cp * D, 1e-300)
            comps = np.stack([np.broadcast_to(le, T.shape)] * ns, axis=1)
            names = [f"Le({s})" for s in mech.species]
        else:
            comps = np.stack([mu, lam, D], axis=1)
            names = ["viscosity", "conductivity", "diffusivity"]
        out_levels.append(jnp.asarray(comps))
    st.with_data(names, out_levels).to_plotfile(
        pp.query_str("outfile",
                     infile + ("_Le" if lewis_out else "_transport")))
    print("wrote output")


def _qpd(args: dict) -> None:
    pp = ParmParse(args)
    mech_file = pp.get_str("mech_file")   # text file of reaction lines
    # QPDatom is the reference's key (plotQPD.cpp:190); trace_element kept
    elt = pp.query_str("QPDatom", pp.query_str("trace_element", "C"))
    reactions = []
    with open(mech_file) as f:
        for ln in f:
            ln = ln.split("!")[0].strip()
            if not ln or "=" not in ln:
                continue
            try:
                reactions.append(parse_reaction(ln))
            except ValueError:
                continue
    edges = get_edges(reactions, elt)
    print(f"{len(reactions)} reactions, {len(edges)} {elt}-transfer edges")
    if pp.query_bool("dump_edges", False):     # plotQPD.cpp:204-209
        for e in edges:
            print(e)

    rates = None
    if pp.contains("infile"):
        # region-integrated reaction rates from plotfile comps rate_0..N-1
        from ..amr.dense import DenseAmrState
        from .integral import integrate_along
        infile = pp.get_str("infile")
        rate_base = pp.query_str("rateBase", "rate")
        names = [f"{rate_base}_{i}" for i in range(len(reactions))]
        avail = PlotfileReader(infile).var_names
        missing = [n for n in names if n not in avail]
        if missing:
            raise ValueError(
                f"plotQPD needs reaction-rate components {names} in the "
                f"plotfile (missing {missing}); set rateBase= or omit "
                "infile= to weight edges uniformly")
        st = AmrState.from_plotfile(infile, names=names, dtype=np.float64)
        ds = DenseAmrState.from_batched(st)
        _, _, fields = integrate_along(ds, names, [0, 1, 2])
        rates = np.array([float(v) for v in fields])
    else:
        rates = np.ones(len(reactions))
    flux = edge_fluxes(edges, rates)
    # normalization: fluxes are MULTIPLIED by normVal = 1/(net CH4->CH3
    # flux) * scaleNorm — "normalize to CH4 destruction on the CH4->CH3
    # edge" (plotQPD.cpp:214-244); without that edge normVal stays 1
    norm = 1.0
    for (s1, s2), w in flux.items():   # last matching edge wins, like the
        if {s1, s2} == {"CH4", "CH3"} and w != 0:   # reference's loop
            norm = 1.0 / w
            if s2 == "CH4":
                norm = -norm
    if pp.contains("scaleNorm"):
        norm *= pp.get_float("scaleNorm")
    print(f"NormVal: {norm}")
    if norm != 0:
        flux = {k: w * norm for k, w in flux.items()}
    if pp.contains("fuelSpec"):
        fuel = pp.get_str("fuelSpec")
        for (s1, s2), w in sorted(flux.items(), key=lambda kv: -abs(kv[1])):
            if fuel in (s1, s2):
                print(f"{s1} -> {s2}: {w:e}")
    out = pp.query_str(
        "QPDfileName", pp.query_str("outfile", "QPD_edges.dat"))
    with open(out, "w") as f:
        if pp.contains("QPDlabel"):
            f.write(f"# {pp.get_str('QPDlabel')}\n")
        for (s1, s2), w in sorted(flux.items(), key=lambda kv: -abs(kv[1])):
            f.write(f"{s1} {s2} {w:e}\n")
    print(f"wrote {out}")


def main(args: dict) -> None:
    tool = args.get("_tool", ["?"])[0]
    if tool == "plotXtoY":
        _convert(args, "X", "Y")
    elif tool == "plotYtoX":
        _convert(args, "Y", "X")
    elif tool == "plotTransportCoeff":
        _transport(args, lewis_out=False)
    elif tool == "plotTYtoLe":
        _transport(args, lewis_out=True)
    elif tool == "plotQPD":
        _qpd(args)
    else:
        raise ValueError(f"unknown chem tool {tool}")
