"""Advisory liveness probe for the remote-TPU ("axon") relay tunnel.

The relay daemon serving 127.0.0.1:8082+ is owned by the host init process
and can die permanently mid-round (observed round 3); when it is dead,
``jax.devices()`` blocks forever in every client. Harnesses that must not
hang (``bench.py``, ``__graft_entry__.dryrun_multichip``) consult this probe
to shorten attempts or fall back — never to skip real work outright, since
a port probe can be wrong.

Only meaningful when an axon backend is actually configured: on a
direct-attach TPU host (``JAX_PLATFORMS`` unset or without "axon") there is
no relay to probe and :func:`relay_alive` reports True unconditionally.

Shared by ``bench.py`` and ``__graft_entry__.py`` (both repo-root modules)
so the port constant and the backend-detection rule live in one place.
"""

from __future__ import annotations

import os
import socket

RELAY_PORT = 8082


def relay_configured() -> bool:
    """Is a relay-backed axon backend explicitly configured?"""
    return "axon" in os.environ.get("JAX_PLATFORMS", "")


def relay_alive() -> bool:
    """False only when an axon relay is configured AND its port refuses."""
    if not relay_configured():
        return True
    try:
        with socket.create_connection(("127.0.0.1", RELAY_PORT), timeout=3):
            return True
    except OSError:
        return False


if __name__ == "__main__":
    # Manual probe: exit 0 iff a TPU client would make progress right now.
    # (Without this block, ``python tunnel_probe.py`` was a silent no-op
    # whose rc=0 read as "alive" even with the relay dead.)
    import sys

    if not relay_configured():
        print("tunnel_probe: no axon relay configured (JAX_PLATFORMS=%r) — "
              "direct backend assumed alive" % os.environ.get("JAX_PLATFORMS", ""))
        sys.exit(0)
    alive = relay_alive()
    print(f"tunnel_probe: relay port {RELAY_PORT} "
          f"{'OPEN — tunnel alive' if alive else 'REFUSED — tunnel dead'}")
    sys.exit(0 if alive else 1)
