"""Capture + summarize a TPU profile of the flagship sampler.

Usage: python scripts/profile_sampler.py [outdir]
Writes the perfetto trace under outdir (default /tmp/prof) and prints the
top device ops by total duration, aggregated by fusion-name prefix.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def capture(outdir: str):
    import bench

    run, _, _ = bench.build_sampler(64)
    out = run(jax.random.key(0))
    jax.block_until_ready(out)
    with jax.profiler.trace(outdir):
        for i in range(2):
            out = run(jax.random.key(i + 1))
        jax.block_until_ready(out)


def summarize(outdir: str, top: int = 25):
    paths = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace found under", outdir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device tracks: pid names containing "TPU" / "/device:"
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items() if "TPU" in n or "XLA" in n.upper()}
    durs = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        if name.startswith(("Infeed", "Outfeed")) or "thread" in name:
            continue
        # strip trailing .N / digits to aggregate fusion families
        base = name.rstrip("0123456789.")
        durs[base] += e.get("dur", 0)
        total += e.get("dur", 0)
    print(f"trace: {paths[-1]}")
    print(f"total device time: {total/1e3:.1f} ms (2 sampler runs)")
    for name, d in durs.most_common(top):
        print(f"{d/1e3:9.2f} ms  {100*d/total:5.1f}%  {name}")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof"
    capture(outdir)
    summarize(outdir)
