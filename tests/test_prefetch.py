"""Read-ahead plotfile iteration (io/prefetch.py).

The multi-file statistics tools walk time series; iter_states overlaps the
next file's host parse + upload with the current file's device work.  These
tests pin ordering, serial parity (byte-identical tool outputs), per-path
name resolution, and in-order error propagation.
"""
import os

import numpy as np
import pytest

from peleanalysis_tpu.io.prefetch import iter_states
from peleanalysis_tpu.testing import write_synthetic_plotfile


@pytest.fixture(scope="module")
def series(tmp_path_factory):
    td = tmp_path_factory.mktemp("series")
    paths = []
    for i in range(3):
        p = str(td / f"plt{i:05d}")
        write_synthetic_plotfile(p, n_cell=16, n_levels=2, time=0.1 * i)
        paths.append(p)
    return paths


def test_iter_states_order_and_parity(series):
    from peleanalysis_tpu.amr.hierarchy import AmrState

    got = list(iter_states({}, series, names=["temp", "density"]))
    assert [p for p, _ in got] == list(series)
    for p, st in got:
        ref = AmrState.from_plotfile(p, names=["temp", "density"])
        assert st.names == ref.names
        np.testing.assert_array_equal(np.asarray(st.data[1]),
                                      np.asarray(ref.data[1]))
        assert st.meta.time == ref.meta.time


def test_iter_states_callable_names(series):
    got = list(iter_states({}, series, names=lambda p: ["temp"]))
    assert all(st.names == ["temp"] for _, st in got)


def test_iter_states_error_in_order(series, tmp_path):
    paths = [series[0], str(tmp_path / "missing_plt"), series[2]]
    it = iter_states({}, paths, names=["temp"])
    p0, _ = next(it)
    assert p0 == series[0]
    with pytest.raises(Exception):
        next(it)                      # the missing file fails ON ITS TURN


def test_iter_states_early_stop(series):
    # a consumer that breaks mid-series must not hang on the worker
    for i, (p, st) in enumerate(iter_states({}, series, names=["temp"])):
        if i == 0:
            break
    assert p == series[0]


def test_condmean_prefetch_matches_serial(series, tmp_path, monkeypatch):
    from peleanalysis_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    files = " ".join(series)
    base = ["binComp=progress", "avgComps=temp density", "nBins=8",
            "binMin=0", "binMax=1", "writeBinMinMax=1"]
    assert main(["conditionalMean", f"infiles={files}",
                 "outfile=cm_pre.dat"] + base) == 0
    assert main(["conditionalMean", f"infiles={files}", "prefetch=0",
                 "outfile=cm_ser.dat"] + base) == 0
    assert (open("cm_pre.dat", "rb").read()
            == open("cm_ser.dat", "rb").read())


def test_rmsvel_prefetch_matches_serial(series, tmp_path, monkeypatch):
    from peleanalysis_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    files = " ".join(series)
    assert main(["rmsVel", f"infiles={files}", "outfile=rv_pre.dat"]) == 0
    assert main(["rmsVel", f"infiles={files}", "prefetch=0",
                 "outfile=rv_ser.dat"]) == 0
    assert (open("rv_pre.dat", "rb").read()
            == open("rv_ser.dat", "rb").read())
    assert len(open("rv_pre.dat").read().splitlines()) == 3


def test_iter_states_inflight_bound(series):
    """depth=1 keeps exactly ONE load in flight beyond the consumed file
    (peak residency 2 inputs, as the streaming tools document) — the load
    of file i+2 must not start before file i+1 is yielded."""
    started = []

    def names_cb(p):
        started.append(p)
        return ["temp"]

    for i, (p, st) in enumerate(iter_states({}, series, names=names_cb)):
        allowed = set(series[: i + 2])
        assert set(started) <= allowed, \
            f"at yield {i} loads started for {started}, allowed {allowed}"


def test_iter_states_does_not_pin_session_states(series):
    """Streamed series members must not be INSERTED into the session cache
    (a long server run over many ensembles would pin every member's device
    state), while registered outputs / pre-cached states still resolve."""
    from peleanalysis_tpu.session import Session

    s = Session()
    pre = s.load(series[0], names=["temp"])          # user-cached beforehand
    got = list(iter_states({"_session": s}, series, names=["temp"]))
    assert got[0][1] is pre, "pre-cached state must be reused"
    assert len(s._states) == 1, "series members leaked into the session"
