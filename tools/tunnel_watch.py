#!/usr/bin/env python
"""Block until the remote-TPU relay tunnel comes (back) alive, then exit 0.

The relay daemon behind 127.0.0.1:8082 is owned by the host init process and
can die permanently mid-round (observed round 3); only the outer infra can
restore it.  This watcher lets a session park the hardware work-queue and be
re-woken the moment the tunnel returns instead of burning attention on manual
re-probes.

Usage:  python tools/tunnel_watch.py [--deadline-s N] [--interval-s N]

Exit codes: 0 = relay port open (tunnel alive), 3 = deadline expired with the
tunnel still dead.  A TCP accept is an advisory signal only — the caller must
still bound its first real TPU client with ``timeout -k`` (see
tunnel_probe.py docstring).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from tunnel_probe import RELAY_PORT, relay_alive, relay_configured  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--deadline-s", type=float, default=11 * 3600.0)
    ap.add_argument("--interval-s", type=float, default=20.0)
    args = ap.parse_args(argv)

    if not relay_configured():
        print("tunnel_watch: no axon relay configured — nothing to wait for")
        return 0

    start = time.monotonic()
    polls = 0
    while time.monotonic() - start < args.deadline_s:
        if relay_alive():
            print(f"tunnel_watch: relay port {RELAY_PORT} OPEN after "
                  f"{time.monotonic() - start:.0f}s ({polls} polls)")
            return 0
        polls += 1
        if polls % 30 == 1:  # one status line every ~10 min at the default interval
            print(f"tunnel_watch: still dead after {time.monotonic() - start:.0f}s",
                  flush=True)
        time.sleep(args.interval_s)
    print(f"tunnel_watch: deadline ({args.deadline_s:.0f}s) expired, tunnel still dead")
    return 3


if __name__ == "__main__":
    raise SystemExit(main())
