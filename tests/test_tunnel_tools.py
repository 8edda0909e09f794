"""Tunnel-liveness tooling: the advisory probe consulted by bench.py and
``__graft_entry__.dryrun_multichip`` (and the watcher built on it) must
report dead/alive correctly — a false "alive" re-creates the round-3 failure
mode where every TPU client blocks forever on a dead relay.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import tunnel_probe  # noqa: E402
from tools import tunnel_watch  # noqa: E402


def test_relay_alive_unconditional_without_axon(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert tunnel_probe.relay_alive() is True
    assert tunnel_probe.relay_configured() is False


def test_relay_dead_when_port_refuses(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
    # Grab an ephemeral port and close it so a connect() is guaranteed refused.
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    monkeypatch.setattr(tunnel_probe, "RELAY_PORT", port)
    assert tunnel_probe.relay_configured() is True
    assert tunnel_probe.relay_alive() is False


def test_relay_alive_when_port_listens(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
    with socket.socket() as srv:
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        monkeypatch.setattr(tunnel_probe, "RELAY_PORT", srv.getsockname()[1])
        assert tunnel_probe.relay_alive() is True


def test_probe_cli_exit_codes():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run([sys.executable, str(REPO / "tunnel_probe.py")],
                          env=env, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "no axon relay configured" in proc.stdout


def test_watch_returns_immediately_without_relay(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert tunnel_watch.main(["--deadline-s", "5"]) == 0


def test_watch_deadline_expires_on_dead_relay(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    monkeypatch.setattr(tunnel_probe, "RELAY_PORT", port)
    assert tunnel_watch.main(["--deadline-s", "0.3", "--interval-s", "0.1"]) == 3


def test_watch_exits_zero_once_alive(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
    with socket.socket() as srv:
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        monkeypatch.setattr(tunnel_probe, "RELAY_PORT", srv.getsockname()[1])
        assert tunnel_watch.main(["--deadline-s", "5", "--interval-s", "0.1"]) == 0
