"""Pipeline mode (device-resident tool chaining, VERDICT r2 #1): chained
stages share one Session — plotfile loads, dense conversions, and surfaces
stay in memory — and outputs stay identical to file-chained tool runs (the
reference's chaining model, /root/reference/Src/GNUmakefile:14-40)."""
import os

import numpy as np
import pytest

from peleanalysis_tpu.amr.hierarchy import AmrState
from peleanalysis_tpu.cli import main
from peleanalysis_tpu.testing import write_synthetic_plotfile


@pytest.fixture(scope="module")
def plt(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pltpipe") / "plt")
    write_synthetic_plotfile(p, n_cell=32, n_levels=2)
    return p


def _assert_states_equal(pa, pb):
    a = AmrState.from_plotfile(pa, dtype=np.float64)
    b = AmrState.from_plotfile(pb, dtype=np.float64)
    assert a.names == b.names
    for lev in range(a.meta.n_levels):
        da, db = np.asarray(a.data[lev]), np.asarray(b.data[lev])
        np.testing.assert_array_equal(np.isnan(da), np.isnan(db))
        m = ~np.isnan(da)
        np.testing.assert_array_equal(da[m], db[m])


def test_pipeline_matches_file_chain(plt, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # file-chained
    os.makedirs("sep")
    assert main(["grad", f"infile={plt}", "gradVar=temp",
                 "outfile=sep/g"]) == 0
    assert main(["curvature", f"infile={plt}", "progressName=temp",
                 "outfile=sep/K"]) == 0
    assert main(["isosurface", f"infile={plt}", "isoCompName=temp",
                 "isoVal=800", "outfile_base=sep/iso"]) == 0
    assert main(["stream", f"plotfile={plt}", "isoFile=sep/iso.mef",
                 "nRKsteps=10", "outFile=sep/lines.dat"]) == 0
    # pipelined (one Session)
    os.makedirs("pipe")
    assert main(["pipeline",
                 "grad", f"infile={plt}", "gradVar=temp", "outfile=pipe/g",
                 "--",
                 "curvature", f"infile={plt}", "progressName=temp",
                 "outfile=pipe/K",
                 "--",
                 "isosurface", f"infile={plt}", "isoCompName=temp",
                 "isoVal=800", "outfile_base=pipe/iso",
                 "--",
                 "stream", f"plotfile={plt}", "isoFile=pipe/iso.mef",
                 "nRKsteps=10", "outFile=pipe/lines.dat"]) == 0
    _assert_states_equal("sep/g", "pipe/g")
    _assert_states_equal("sep/K", "pipe/K")
    assert open("sep/iso.mef", "rb").read() == open("pipe/iso.mef",
                                                    "rb").read()
    # stream Tecplot output: identical modulo the path in no line (pure data)
    assert open("sep/lines.dat").read() == open("pipe/lines.dat").read()


def test_pipeline_write0_keeps_surface_in_session(plt, tmp_path,
                                                  monkeypatch):
    """write=0 on the isosurface stage: no MEF on disk, but stream still
    finds the surface in the session and produces the same lines."""
    monkeypatch.chdir(tmp_path)
    assert main(["isosurface", f"infile={plt}", "isoCompName=temp",
                 "isoVal=800", "outfile_base=ref_iso"]) == 0
    assert main(["stream", f"plotfile={plt}", "isoFile=ref_iso.mef",
                 "nRKsteps=10", "outFile=ref_lines.dat"]) == 0
    assert main(["pipeline",
                 "isosurface", f"infile={plt}", "isoCompName=temp",
                 "isoVal=800", "outfile_base=mem_iso", "write=0",
                 "--",
                 "stream", f"plotfile={plt}", "isoFile=mem_iso.mef",
                 "nRKsteps=10", "outFile=mem_lines.dat"]) == 0
    assert not os.path.exists("mem_iso.mef")
    assert open("ref_lines.dat").read() == open("mem_lines.dat").read()


def test_deferred_surface_partial_fetch(plt):
    """defer=True keeps the payload on device: positions() decodes only the
    xyz columns (no full MEF materialization), and to_mef() matches the
    eager engine exactly."""
    from peleanalysis_tpu.amr.dense import DenseAmrState
    from peleanalysis_tpu.geom.marching_cubes import (DeferredSurface,
                                                      extract_isosurface)
    ds = DenseAmrState.from_batched(
        AmrState.from_plotfile(plt, names=["temp"]))
    surf = extract_isosurface(ds, "temp", 800.0, classify="enum",
                              defer=True)
    assert isinstance(surf, DeferredSurface)
    xyz = surf.positions()
    assert surf._mef is None            # no full fetch yet
    eager = extract_isosurface(ds, "temp", 800.0, classify="enum")
    np.testing.assert_array_equal(xyz, eager.positions())
    got = surf.to_mef()
    np.testing.assert_array_equal(got.nodes, eager.nodes)
    np.testing.assert_array_equal(got.elements, eager.elements)


def test_session_extends_comps_in_place(plt):
    """A later stage needing more comps extends the cached state in place —
    same object, same dense instance, engine caches preserved."""
    from peleanalysis_tpu.session import Session
    s = Session()
    st1 = s.load(plt, names=["temp"], is_periodic=[False] * 3)
    ds1 = s.dense(st1)
    st2 = s.load(plt, names=["temp", "density"],
                 is_periodic=[False] * 3)
    assert st2 is st1 and "density" in st1.names
    ds2 = s.dense(st2)
    assert ds2 is ds1 and "density" in ds1.names
    # data round-trips correctly for the appended comp
    ref = AmrState.from_plotfile(plt, names=["density"])
    ic = st1.comp("density")
    for lev in range(st1.meta.n_levels):
        np.testing.assert_array_equal(np.asarray(st1.data[lev][:, ic]),
                                      np.asarray(ref.data[lev][:, 0]))


def test_pipeline_mef_tools_stage(plt, tmp_path, monkeypatch):
    """MEF algebra stages resolve upstream surfaces from the session."""
    monkeypatch.chdir(tmp_path)
    assert main(["pipeline",
                 "isosurface", f"infile={plt}", "isoCompName=temp",
                 "isoVal=800", "outfile_base=iso", "write=0",
                 "--",
                 "scaleMEF", "infile=iso.mef", "comps=temp", "factors=2",
                 "outfile=scaled.mef"]) == 0
    from peleanalysis_tpu.io.mef import read_mef
    m = read_mef("scaled.mef")
    assert not os.path.exists("iso.mef")
    np.testing.assert_allclose(m.nodes[:, m.names.index("temp")], 1600.0)


def test_pipeline_stats_stage(plt, tmp_path, monkeypatch):
    """conditionalMean rides the same session cache (shared load + dense)."""
    monkeypatch.chdir(tmp_path)
    assert main(["pipeline",
                 "grad", f"infile={plt}", "gradVar=temp", "is_per=0 0 0",
                 "outfile=g", "write=0",
                 "--",
                 "conditionalMean", f"infiles={plt}", "binComp=temp",
                 "avgComps=density", "nBins=16", "binMin=300",
                 "binMax=1800"]) == 0
    assert os.path.exists("CM_temp.dat")


def test_pipeline_streamdata_handoff(plt, tmp_path, monkeypatch):
    """stream write=0 -> streamTubeStats + stream2plt resolve the
    StreamData from the session (no folder on disk), matching the
    file-chained run."""
    monkeypatch.chdir(tmp_path)
    # file-chained reference
    assert main(["isosurface", f"infile={plt}", "isoCompName=temp",
                 "isoVal=800", "outfile_base=iso"]) == 0
    assert main(["stream", f"plotfile={plt}", "isoFile=iso.mef",
                 "nRKsteps=11", "streamFile=sd_ref"]) == 0
    assert main(["streamTubeStats", "infile=sd_ref",
                 "outfile=ref_tubes"]) == 0
    # pipelined, stream kept in-session
    assert main(["pipeline",
                 "stream", f"plotfile={plt}", "isoFile=iso.mef",
                 "nRKsteps=11", "streamFile=sd_mem", "write=0",
                 "--",
                 "streamTubeStats", "infile=sd_mem",
                 "outfile=mem_tubes"]) == 0
    assert not os.path.exists("sd_mem")
    a = open("ref_tubes.mef", "rb").read()
    b = open("mem_tubes.mef", "rb").read()
    assert a == b


def test_pipeline_combine_plts_stage(plt, tmp_path, monkeypatch):
    """combinePlts consumes two earlier write=0 stages' plotfile outputs
    straight from the session."""
    monkeypatch.chdir(tmp_path)
    assert main(["pipeline",
                 "grad", f"infile={plt}", "gradVar=temp", "outfile=g",
                 "write=0",
                 "--",
                 "curvature", f"infile={plt}", "progressName=temp",
                 "outfile=K", "write=0",
                 "--",
                 "combinePlts", "infiles=g K",
                 "vars=||gradtemp|| MeanCurvature_temp",
                 "outfile=comb"]) == 0
    assert not os.path.exists("g") and not os.path.exists("K")
    st = AmrState.from_plotfile("comb", dtype=np.float64)
    assert st.names == ["||gradtemp||", "MeanCurvature_temp"]


def test_pipeline_rejects_empty_stage(plt):
    assert main(["pipeline", "--", "grad", f"infile={plt}"]) == 2
    assert main(["pipeline"]) == 2


def test_session_output_option_mismatch_errors(plt, tmp_path, monkeypatch):
    """Consuming a write=0 output with load options the producer didn't use
    (or comps it doesn't have) raises a clear error instead of crashing in
    the plotfile reader."""
    monkeypatch.chdir(tmp_path)
    with pytest.raises((ValueError, RuntimeError)) as ei:
        main(["pipeline",
              "grad", f"infile={plt}", "gradVar=temp", "outfile=g",
              "write=0",
              "--",
              "curvature", "infile=g", "progressName=density",
              "outfile=K"])
    assert "write=1" in str(ei.value)


def test_session_shadow_not_served_to_wider_compute_dtype(plt, tmp_path,
                                                          monkeypatch):
    """r5 review fix: a dtype=float64 COMPUTE stage must not silently run
    on an f32 in-session shadow (jnp ops follow the array dtype).  With
    write=1 it falls back to the on-disk f64 read; with write=0 it errors;
    copy-only tools (combinePlts) still accept the narrower shadow."""
    monkeypatch.chdir(tmp_path)
    assert main(["pipeline",
                 "grad", f"infile={plt}", "gradVar=temp", "outfile=g64",
                 "--",
                 "curvature", "infile=g64", "progressName=||gradtemp||",
                 "dtype=float64", "outfile=K64"]) == 0
    st = AmrState.from_plotfile("K64", dtype=np.float64)
    assert "MeanCurvature_||gradtemp||" in st.names
    with pytest.raises((ValueError, RuntimeError)) as ei:
        main(["pipeline",
              "grad", f"infile={plt}", "gradVar=temp", "outfile=gnw",
              "write=0",
              "--",
              "curvature", "infile=gnw", "progressName=||gradtemp||",
              "dtype=float64", "outfile=Knw"])
    assert "write=1" in str(ei.value)


def test_pipeline_2d_plotfile(tmp_path, monkeypatch):
    """The session machinery is dimension-agnostic: a DIM=2 plotfile chains
    isosurface (marching squares) -> scaleMEF through the session."""
    monkeypatch.chdir(tmp_path)
    p2 = str(tmp_path / "plt2d")
    write_synthetic_plotfile(p2, n_cell=32, n_levels=2, ndim=2)
    assert main(["pipeline",
                 "isosurface", f"infile={p2}", "isoCompName=temp",
                 "isoVal=800", "outfile_base=c2", "write=0",
                 "--",
                 "scaleMEF", "infile=c2.mef", "comps=temp", "factors=0.5",
                 "outfile=s2.mef"]) == 0
    from peleanalysis_tpu.io.mef import read_mef
    m = read_mef("s2.mef")
    assert not os.path.exists("c2.mef") and m.n_elts > 0
    np.testing.assert_allclose(m.nodes[:, m.names.index("temp")], 400.0)


def test_session_reset_frees_but_engines_survive(plt):
    """Session.reset drops cached states/artifacts; the next file still
    reuses the cross-instance compiled engines (time-series API pattern)."""
    import time
    from peleanalysis_tpu.session import Session
    s = Session()
    s.run("curvature", infile=plt, progressName="temp", outfile="K0",
          write=0)
    assert s.plotfiles and s._states
    s.reset()
    assert not s.plotfiles and not s._states and not s._dense
    # STRUCTURAL reuse check (no flaky wall-clock): the shared registry
    # must serve the cached engine, i.e. build() must NOT run again
    import peleanalysis_tpu.amr.dense as adense
    builds = []
    orig = adense.shared_engine

    def counting(registry, cap, dstate, key, build):
        def wrapped():
            builds.append(key)
            return build()
        return orig(registry, cap, dstate, key, wrapped)

    adense.shared_engine = counting
    try:
        s.run("curvature", infile=plt, progressName="temp", outfile="K1",
              write=0)
    finally:
        adense.shared_engine = orig
    assert builds == [], builds        # zero re-traces after reset
    assert "K1" in s.plotfiles


def test_async_writeback_parity_and_order(plt, tmp_path, monkeypatch):
    """to_plotfile_async (Session.async_writes write-back) must produce a
    byte-identical plotfile to the synchronous packed writer, and a
    same-path rewrite must not race its predecessor."""
    monkeypatch.chdir(tmp_path)
    from peleanalysis_tpu.amr import dense as dense_mod
    from peleanalysis_tpu.amr.dense import DenseAmrState
    from peleanalysis_tpu.session import Session
    monkeypatch.setattr(dense_mod, "_DISPATCH_COSTLY", True)
    st = AmrState.from_plotfile(plt)
    ds = DenseAmrState.from_batched(st)
    ds.to_plotfile("sync_plt")
    s = Session(async_writes=True)
    ds.to_plotfile_async("async_plt",
                         submit=lambda th: s.submit_write("async_plt", th))
    # rewrite the same path before the flush: ordering must hold
    ds.to_plotfile_async("async_plt",
                         submit=lambda th: s.submit_write("async_plt", th))
    s.flush_writes()
    for sub in ("Header",):
        assert (open(os.path.join("sync_plt", sub), "rb").read()
                == open(os.path.join("async_plt", sub), "rb").read())
    _assert_states_equal("sync_plt", "async_plt")


def test_pipeline_flushes_write_before_disk_read(plt, tmp_path, monkeypatch):
    """A stage that reads a pending write-back path from DISK (fcompare is
    not session-aware) must see the completed file."""
    monkeypatch.chdir(tmp_path)
    assert main(["pipeline",
                 "grad", f"infile={plt}", "gradVar=temp", "outfile=gg",
                 "--",
                 "fcompare", "infile1=gg", "infile2=gg"]) == 0


def test_writeback_error_surfaces_on_flush():
    from peleanalysis_tpu.session import Session
    s = Session(async_writes=True)

    def boom():
        raise IOError("disk full")

    s.submit_write("some/path", boom)
    with pytest.raises(IOError, match="disk full"):
        s.flush_writes()
    assert s._wb == []          # consumed, not stuck

def test_flush_match_normalizes_path_spelling(tmp_path, monkeypatch):
    """flush_writes(match=argv) must settle a pending write named with a
    DIFFERENT spelling of the same path (./x vs x vs absolute) — a missed
    flush means a consumer reads a half-written file."""
    from peleanalysis_tpu.session import Session

    monkeypatch.chdir(tmp_path)
    for producer, consumer in ((["./out_g"], f"infile={tmp_path}/out_g"),
                               ([str(tmp_path / "out_g")], "infile=out_g"),
                               (["out_g"], "infile=./out_g")):
        s = Session(async_writes=True)
        done = []
        s.submit_write(producer[0], lambda: done.append(1))
        s.flush_writes(match=[consumer])
        assert s._wb == [], (producer, consumer)
        assert done == [1]
    # a non-matching argv must NOT settle it
    s = Session(async_writes=True)
    s.submit_write("out_g", lambda: None)
    s.flush_writes(match=["infile=unrelated"])
    assert len(s._wb) == 1
    s.flush_writes()


def test_pipeline_failing_stage_rc_survives_writeback_error(
        plt, tmp_path, monkeypatch, capsys):
    """A failing STAGE's rc must not be replaced by a write-back error
    raised from the final flush (cli.py pipeline finally block)."""
    from peleanalysis_tpu.session import Session

    monkeypatch.chdir(tmp_path)
    orig_flush = Session.flush_writes
    calls = {"n": 0}

    def flaky_flush(self, match=None):
        if match is None and calls["n"] == 0:
            calls["n"] += 1
            raise IOError("late write-back failure")
        return orig_flush(self, match=match)

    monkeypatch.setattr(Session, "flush_writes", flaky_flush)
    # the STAGE's own failure must propagate; the final flush's error is
    # reported on stderr, not raised over it
    with pytest.raises(FileNotFoundError):
        main(["pipeline",
              "grad", f"infile={plt}", "gradVar=temp", "outfile=g1",
              "--",
              "grad", "infile=NO_SUCH_PLT", "gradVar=temp"])
    assert "pending write failed" in capsys.readouterr().err


def test_session_rewrite_evicts_stale_state(tmp_path):
    """Rewriting a plotfile path must EVICT the superseded cache entry (not
    key a second one alongside it): the reload serves the new values and
    the session holds exactly one state for the path (review finding: the
    mtime-in-key design leaked one device state per rewrite)."""
    from peleanalysis_tpu.session import Session
    from peleanalysis_tpu.testing import write_synthetic_plotfile

    p = str(tmp_path / "plt_rw")
    write_synthetic_plotfile(p, n_cell=8, n_levels=1,
                             fields={"temp": lambda x, y, z: x * 0 + 1.0})
    s = Session()
    st1 = s.load(p, names=["temp"])
    assert float(np.asarray(st1.data[0]).ravel()[0]) == 1.0
    write_synthetic_plotfile(p, n_cell=8, n_levels=1,
                             fields={"temp": lambda x, y, z: x * 0 + 2.0})
    os.utime(os.path.join(p, "Header"))     # force a distinct Header mtime
    st2 = s.load(p, names=["temp"])
    assert float(np.asarray(st2.data[0]).ravel()[0]) == 2.0
    assert len(s._states) == 1, "superseded entry leaked"
