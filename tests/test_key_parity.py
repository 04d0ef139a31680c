"""Reference ParmParse key surfaces added in round 2 — value-pinned, not
just smoke (conditionalMean bounds=, combinePlts infiles=, streamTubeStats
jlo=, integral goPastMax colormap)."""
import numpy as np
import pytest

from peleanalysis_tpu.amr.dense import DenseAmrState
from peleanalysis_tpu.amr.hierarchy import AmrState
from peleanalysis_tpu.testing import write_synthetic_plotfile


@pytest.fixture(scope="module")
def plt(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("kp") / "plt")
    write_synthetic_plotfile(p, n_cell=16, n_levels=2)
    return p


def test_condmean_bounds_subbox(plt):
    """bounds= must reproduce manual masking of the accumulation
    (conditionalMean.cpp:180-192)."""
    from peleanalysis_tpu.tools.conditional_mean import (
        accumulate_conditional_mean)

    ds = DenseAmrState.from_batched(
        AmrState.from_plotfile(plt, names=["temp", "density"],
                               dtype=np.float64))
    bounds = ((0.25, 0.25, 0.25), (0.75, 0.75, 0.75))
    h_b, s_b, _, _, _ = accumulate_conditional_mean(
        ds, "temp", ["density"], 16, 300.0, 1801.0, bounds=bounds)
    h_a, s_a, _, _, _ = accumulate_conditional_mean(
        ds, "temp", ["density"], 16, 300.0, 1801.0)
    # the sub-box accumulates strictly less, and exactly matches a manual
    # recount on the coarse level (every coarse cell center inside/outside)
    assert h_b.sum() < h_a.sum()
    g0 = ds.meta.geoms[0]
    lo = [int((bounds[0][d] - g0.prob_lo[d] + 1e-4 * g0.dx[d]) / g0.dx[d])
          for d in range(3)]
    hi = [int((bounds[1][d] - g0.prob_lo[d] - 1e-4 * g0.dx[d]) / g0.dx[d])
          for d in range(3)]
    temp = np.asarray(ds.data[0][ds.comp("temp")])
    valid = np.asarray(ds.valid_mask(0))
    # manual level-0 contribution inside the box, weight = 2^3
    idx = np.indices(temp.shape)
    inb = np.ones(temp.shape, bool)
    for d in range(3):
        inb &= (idx[d] >= lo[d]) & (idx[d] <= hi[d])
    m = valid & inb & (temp >= 300.0) & (temp < 1801.0)
    lev0_hits = 8 * m.sum()
    # fine-level contribution: rerun with an empty avg to count lev1 part
    fine = np.asarray(ds.valid_mask(1))
    t1 = np.asarray(ds.data[1][ds.comp("temp")])
    idx1 = np.indices(t1.shape)
    inb1 = np.ones(t1.shape, bool)
    bb1 = ds.lmeta[1].bbox
    for d in range(3):
        gidx = idx1[d] + bb1.lo[d]
        inb1 &= (gidx >= lo[d] * 2) & (gidx <= (hi[d] + 1) * 2 - 1)
    m1 = fine & inb1 & (t1 >= 300.0) & (t1 < 1801.0)
    assert h_b.sum() == lev0_hits + m1.sum()


def test_combineplts_infiles_first_wins(plt, tmp_path):
    p2 = str(tmp_path / "plt2")
    write_synthetic_plotfile(
        p2, n_cell=16, n_levels=2,
        fields={"temp": lambda x, y, z: 0 * x + 7.0,
                "extra": lambda x, y, z: x})
    from peleanalysis_tpu.cli import main as cli
    out = str(tmp_path / "comb")
    assert cli(["combinePlts", f"infiles={plt} {p2}", "vars=temp extra",
                f"outfile={out}"]) == 0
    st = AmrState.from_plotfile(out, dtype=np.float64)
    assert st.names == ["temp", "extra"]
    # temp must come from the FIRST file (plt), not the constant-7 second
    t = np.asarray(st.data[0])[:, 0]
    assert t.max() > 100.0
    # a missing var errors with its name
    with pytest.raises(ValueError, match="nosuchvar"):
        cli(["combinePlts", f"infiles={plt}", "vars=nosuchvar",
             f"outfile={out}2"])


def test_integral_gopastmax_colormap():
    from peleanalysis_tpu.tools.integral import _pele_ppm_rgb
    c = np.array([0.0, 0.5, 0.99, 1.2, 2.0])
    rgb_no = _pele_ppm_rgb(np.clip(c, 0, 1.5), go_past_max=False)
    rgb_go = _pele_ppm_rgb(np.clip(c, 0, 1.5), go_past_max=True)
    # over-max: dark red without goPastMax (integral.cpp:292-295)
    np.testing.assert_allclose(rgb_no[3] * 255, [128, 0, 0], atol=0.51)
    np.testing.assert_allclose(rgb_no[4] * 255, [128, 0, 0], atol=0.51)
    # with goPastMax: magenta ramp then white (integral.cpp:274-289)
    np.testing.assert_allclose(rgb_go[4] * 255, [255, 255, 255], atol=0.51)
    assert rgb_go[3][0] > 0.9 and rgb_go[3][2] > 0.5  # magenta-ish at 1.2
    # in-range pixels identical either way
    np.testing.assert_allclose(rgb_no[:3], rgb_go[:3])


def test_streamtubestats_jlo_window(plt, tmp_path):
    from peleanalysis_tpu.cli import main as cli
    from peleanalysis_tpu.io.mef import MEF, write_mef
    # non-collinear seed surface (two real triangles)
    seeds = np.array([[0.35, 0.35, 0.42], [0.55, 0.38, 0.55],
                      [0.45, 0.55, 0.38], [0.62, 0.6, 0.52],
                      [0.3, 0.62, 0.61], [0.5, 0.7, 0.45]])
    elts = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    iso = str(tmp_path / "seed.mef")
    write_mef(iso, MEF("0", ["X", "Y", "Z"], seeds, elts + 0))
    sd2_path = str(tmp_path / "sd2")
    assert cli(["stream", f"plotfile={plt}", f"isoFile={iso}",
                "nRKsteps=11", "hRK=0.5", f"streamFile={sd2_path}"]) == 0
    out_full = str(tmp_path / "tube_full.mef")
    out_win = str(tmp_path / "tube_win.mef")
    assert cli(["streamTubeStats", f"infile={sd2_path}", "intComps=temp",
                f"outfile={out_full}"]) == 0
    assert cli(["streamTubeStats", f"infile={sd2_path}", "intComps=temp",
                "jlo=-2", f"outfile={out_win}"]) == 0
    from peleanalysis_tpu.io.mef import read_mef
    a, b = read_mef(out_full + ".mef"), read_mef(out_win + ".mef")
    iv = a.names.index("volume")
    # the jlo window integrates over fewer stations -> smaller tube volume
    assert b.nodes[:, iv].sum() < a.nodes[:, iv].sum()


def test_unknown_variable_errors_name_the_variable(plt):
    """Failure detection (SURVEY §5): a bad variable name fails fast with
    the name in the message, across the major tools (the reference mostly
    Aborts with a generic message)."""
    from peleanalysis_tpu.cli import main as cli
    for argv in (
        ["grad", f"infile={plt}", "gradVar=nosuch"],
        ["isosurface", f"infile={plt}", "isoCompName=nosuch"],
        ["conditionalMean", f"infile={plt}", "binComp=nosuch",
         "avgComps=temp", "binMin=0", "binMax=1"],
        ["curvature", f"infile={plt}", "progressName=nosuch"],
    ):
        with pytest.raises(Exception, match="nosuch"):
            cli(argv)
