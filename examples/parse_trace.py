"""Summarize a jax.profiler device trace by repo source line.

The axon TPU writes traces under <dir>/plugins/profile/<ts>/vm.trace.json.gz.
Each traced op carries a `source` arg (file:line) — aggregating device-lane
durations by that field attributes device time to repo code, which is how
every insert/render optimization in BASELINE.md was found (SURVEY.md §5
tracing; the reference's analog is its commented-out cudaEvent probes,
timing_utils.cu:11-32).

Usage: python examples/parse_trace.py /tmp/some_trace [top_n]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys


def load_events(trace_dir: str):
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(files[-1], "rt") as f:
        return files[-1], json.load(f)["traceEvents"]


def summarize(events, device_only: bool = True):
    """Aggregate complete events by source file:line (fallback: name).

    Returns [(total_us, count, label)] sorted desc. device_only keeps
    pids whose thread names look like device lanes (the host python
    rows double-count the same wall time).
    """
    # pid -> process name, to separate device streams from host threads
    pnames = {e.get("pid"): e.get("args", {}).get("name", "")
              for e in events if e.get("ph") == "M"
              and e.get("name") == "process_name"}
    per = collections.defaultdict(lambda: [0.0, 0])
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pnames.get(e.get("pid"), "")
        is_host = pname.startswith("python") or "Host" in pname
        if device_only and is_host:
            continue
        args = e.get("args") or {}
        src = args.get("source")
        label = src if src else e.get("name", "?")
        # host-side rows with no source are harness noise ($profiler etc.)
        if not src and not device_only:
            label = "$" + label
        per[label][0] += e.get("dur", 0)
        per[label][1] += 1
    rows = [(v[0], v[1], k) for k, v in per.items()]
    rows.sort(reverse=True)
    return rows


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    path, events = load_events(trace_dir)
    print(path)
    rows = summarize(events)
    if not rows:  # some runs label every pid as host — retry unfiltered
        rows = summarize(events, device_only=False)
    total = sum(r[0] for r in rows)
    print(f"total device time: {total / 1e3:.2f} ms across "
          f"{sum(r[1] for r in rows)} ops")
    for dur, count, label in rows[:top_n]:
        print(f"{dur / 1e3:9.2f} ms x{count:5d}  {label}")


if __name__ == "__main__":
    main()
