"""Persistent tool server (peleanalysis_tpu/server.py).

The server must run commands through the SAME path as the one-shot CLI
(byte-identical artifacts), keep one Session across commands (in-session
handoffs work like pipeline mode), and survive bad commands.  Reference
model: per-tool AOT binaries with ~zero per-invocation cost,
/root/reference/Src/GNUmakefile:14-40."""
import os
import threading
import time

import numpy as np
import pytest

from peleanalysis_tpu.cli import main
from peleanalysis_tpu.server import send_command, serve
from peleanalysis_tpu.testing import write_synthetic_plotfile


@pytest.fixture()
def server(tmp_path):
    sock = str(tmp_path / "pele.sock")
    t = threading.Thread(target=serve, args=({"socket": [sock]},),
                         daemon=True)
    t.start()
    # the socket file appears at bind() but connects succeed only after
    # listen(): retry ConnectionRefused for a bounded window (flaked under
    # full-suite load on this 1-CPU container)
    deadline = time.monotonic() + 10.0
    while True:
        try:
            assert send_command(sock, cmd="ping")["out"] == "pong"
            break
        except (FileNotFoundError, ConnectionRefusedError, OSError):
            if time.monotonic() > deadline:
                raise
            time.sleep(0.05)
    yield sock
    send_command(sock, cmd="shutdown")
    t.join(timeout=10)


def _tree_bytes(root):
    out = {}
    for dp, _, fns in os.walk(root):
        for fn in fns:
            p = os.path.join(dp, fn)
            with open(p, "rb") as f:
                out[os.path.relpath(p, root)] = f.read()
    return out


def test_server_commands_match_direct_cli(server, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    plt = str(tmp_path / "plt")
    write_synthetic_plotfile(plt, n_cell=16, n_levels=2)
    rep = send_command(server, argv=["grad", f"infile={plt}",
                                    "gradVar=temp", "outfile=g_srv"],
                       sync=True)  # the reply must land before _tree_bytes
    assert rep["rc"] == 0 and "wrote g_srv" in rep["out"]
    assert main(["grad", f"infile={plt}", "gradVar=temp",
                 "outfile=g_dir"]) == 0
    a, b = _tree_bytes("g_srv"), _tree_bytes("g_dir")
    assert set(a) == set(b)
    assert all(a[k] == b[k] for k in a), "server artifact differs from CLI"
    # a second command reuses the server's warm session/state
    rep = send_command(server, argv=["fextrema", "infile=g_srv"])
    assert rep["rc"] == 0 and "gradtemp" in rep["out"]


def test_server_session_persists_across_commands(server, tmp_path,
                                                 monkeypatch):
    """write=0 outputs registered by one command resolve in a LATER command
    — the pipeline-mode win without the single-invocation restriction."""
    monkeypatch.chdir(tmp_path)
    plt = str(tmp_path / "plt2")
    write_synthetic_plotfile(plt, n_cell=16, n_levels=2)
    rep = send_command(server, argv=[
        "isosurface", f"infile={plt}", "isoCompName=temp", "isoVal=800",
        "outfile_base=iso_mem", "write=0"])
    assert rep["rc"] == 0
    assert not os.path.exists("iso_mem.mef")        # stayed in-session
    rep = send_command(server, argv=[
        "stream", f"plotfile={plt}", "traceAlongV=1", "isoFile=iso_mem.mef",
        "nRKsteps=11", "outFile=lines_srv.dat"],
        sync=True)  # we read the artifact right after the reply
    assert rep["rc"] == 0 and os.path.exists("lines_srv.dat")
    # parity vs a file-chained direct run
    assert main(["isosurface", f"infile={plt}", "isoCompName=temp",
                 "isoVal=800", "outfile_base=iso_f"]) == 0
    assert main(["stream", f"plotfile={plt}", "traceAlongV=1",
                 "isoFile=iso_f.mef", "nRKsteps=11",
                 "outFile=lines_dir.dat"]) == 0
    srv = [l for l in open("lines_srv.dat") if not l.startswith("#")]
    dire = [l for l in open("lines_dir.dat") if not l.startswith("#")]
    assert srv == dire


def test_server_runs_pipeline_commands(server, tmp_path, monkeypatch):
    """A `pipeline` meta-command through the server shares the server's
    session (warm engines) and produces byte-identical artifacts to a
    direct pipeline run."""
    monkeypatch.chdir(tmp_path)
    plt = str(tmp_path / "plt3")
    write_synthetic_plotfile(plt, n_cell=16, n_levels=2)
    rep = send_command(server, argv=[
        "pipeline",
        "isosurface", f"infile={plt}", "isoCompName=temp", "isoVal=800",
        "outfile_base=p_iso", "write=0", "--",
        "stream", f"plotfile={plt}", "traceAlongV=1", "isoFile=p_iso.mef",
        "nRKsteps=11", "outFile=p_lines_srv.dat"], sync=True)
    assert rep["rc"] == 0, rep["err"]
    assert not os.path.exists("p_iso.mef")          # write=0 intermediate
    assert main(["pipeline",
                 "isosurface", f"infile={plt}", "isoCompName=temp",
                 "isoVal=800", "outfile_base=d_iso", "write=0", "--",
                 "stream", f"plotfile={plt}", "traceAlongV=1",
                 "isoFile=d_iso.mef", "nRKsteps=11",
                 "outFile=p_lines_dir.dat"]) == 0
    srv = [l for l in open("p_lines_srv.dat") if not l.startswith("#")]
    dire = [l for l in open("p_lines_dir.dat") if not l.startswith("#")]
    assert srv == dire


def test_server_survives_bad_commands(server, tmp_path):
    rep = send_command(server, argv=["nonsense_tool"])
    assert rep["rc"] == 2
    rep = send_command(server, argv=["grad", "infile=/does/not/exist",
                                     "gradVar=temp", "outfile=x"])
    assert rep["rc"] != 0 and rep["err"]
    # still alive and functional
    assert send_command(server, cmd="ping")["out"] == "pong"
    assert send_command(server, cmd="reset")["out"] == "reset"


def test_send_cli_client(server, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    plt = str(tmp_path / "plt3")
    write_synthetic_plotfile(plt, n_cell=16, n_levels=1)
    rc = main(["send", f"socket={server}", "fextrema", f"infile={plt}"])
    assert rc == 0
    assert "temp" in capsys.readouterr().out


def test_server_sync_and_flush(server, tmp_path, monkeypatch):
    """sync=True settles a command's async write-backs before the reply
    (files exist when send_command returns); flush settles everything
    pending; the send CLI accepts sync= as a client key, not a tool."""
    monkeypatch.chdir(tmp_path)
    plt = str(tmp_path / "plt4")
    write_synthetic_plotfile(plt, n_cell=16, n_levels=2)
    rep = send_command(server, argv=["grad", f"infile={plt}",
                                     "gradVar=temp", "outfile=g_sync"],
                       sync=True)
    assert rep["rc"] == 0
    assert os.path.exists("g_sync/Header"), "sync reply before write-back"
    # async command + explicit flush
    rep = send_command(server, argv=["grad", f"infile={plt}",
                                     "gradVar=temp", "outfile=g_async"])
    assert rep["rc"] == 0
    rep = send_command(server, cmd="flush")
    assert rep["rc"] == 0 and rep["out"] == "flushed"
    assert os.path.exists("g_async/Header")
    # the send CLI must treat sync= as a client key (regression: it was
    # parsed as the tool name)
    rc = main(["send", f"socket={server}", "sync=1", "grad",
               f"infile={plt}", "gradVar=temp", "outfile=g_cli"])
    assert rc == 0
    assert os.path.exists("g_cli/Header")


def test_stalled_client_does_not_wedge_server(tmp_path):
    """A client that connects but never completes a request line must be
    dropped after idle_timeout so the single-threaded accept loop keeps
    serving (review finding: one stalled connection wedged every later
    client)."""
    import socket

    from peleanalysis_tpu.server import serve

    sock = str(tmp_path / "pele_idle.sock")
    t = threading.Thread(
        target=serve,
        args=({"socket": [sock], "idle_timeout": ["1"]},), daemon=True)
    t.start()
    for _ in range(100):
        if os.path.exists(sock):
            break
        time.sleep(0.05)
    stalled = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    stalled.connect(sock)
    stalled.sendall(b'{"cmd": "pi')          # partial line, no newline
    # the next client must get through once the stalled one times out
    rep = send_command(sock, cmd="ping", timeout=15.0)
    assert rep["out"] == "pong"
    stalled.close()
    send_command(sock, cmd="shutdown")
    t.join(timeout=10)


def test_vanished_client_keeps_server_alive(server, tmp_path):
    # r5 review fix: a client that disconnects before reading its reply
    # (send_command timeout fired / killed) raised BrokenPipeError out of
    # the accept loop and took the warm Session down with it
    import socket as sk
    c = sk.socket(sk.AF_UNIX, sk.SOCK_STREAM)
    c.connect(server)
    c.sendall(b'{"cmd": "flush"}\n')
    c.close()                                # vanish before the reply
    time.sleep(0.2)
    for _ in range(3):
        c = sk.socket(sk.AF_UNIX, sk.SOCK_STREAM)
        c.connect(server)
        c.sendall(b'{"cmd": "ping"}\n')
        c.close()
    assert send_command(server, cmd="ping")["out"] == "pong"


def test_unknown_cmd_is_an_error(server):
    rep = send_command(server, cmd="flus")
    assert rep["rc"] != 0 and "unknown cmd" in rep["err"]
