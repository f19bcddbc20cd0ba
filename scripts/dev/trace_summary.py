"""Summarize an xprof capture: per-op device time grouped by name.

Usage: python scripts/dev/trace_summary.py /tmp/trace_dir [--top 40] [--group]

Loads the trace_viewer JSON from the newest xplane.pb under the capture dir and
aggregates event durations per device line. Per round-1 learnings (see
.claude/skills/verify/SKILL.md) `framework_op_stats` self-times are wrong for
nested whiles — trace_viewer line aggregation is the trustworthy view.
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import re
import sys


def load_trace(trace_dir: str) -> dict:
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "trace_viewer", {})
    if isinstance(data, (bytes, str)):
        data = json.loads(data)
    return data


GROUPS = [
    ("flash/mqa attention", re.compile(r"flash|mqa_|attention_kernel|custom-call", re.I)),
    ("int8 qmm (fusion w/ convert+dot)", re.compile(r"qmm|quant", re.I)),
    ("conv (patch embed)", re.compile(r"convolution", re.I)),
    ("matmul/dot", re.compile(r"dot|einsum", re.I)),
    ("copy/transpose/layout", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
    ("reduce (LN/softmax/loss)", re.compile(r"reduce", re.I)),
    ("dynamic-slice/update (scan)", re.compile(r"dynamic", re.I)),
    ("rng", re.compile(r"rng|threefry", re.I)),
    ("elementwise fusion", re.compile(r"fusion|add|multiply|select|broadcast", re.I)),
]


def _finish(stack, acc, counts, match) -> None:
    _, child_total, ev = stack.pop()
    name = ev.get("name", "?")
    if match and not match.search(name):
        return
    self_dur = max(ev["dur"] - child_total[0], 0.0)
    acc[name] += self_dur
    counts[name] += 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--line", default=None, help="substring filter on the trace line (tid name)")
    ap.add_argument("--match", default=None, help="only events whose name matches this regex")
    args = ap.parse_args()

    data = load_trace(args.trace_dir)
    events = data.get("traceEvents", data if isinstance(data, list) else [])

    # Map (pid,tid) -> line name from metadata events.
    line_names: dict[tuple, str] = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            line_names[(ev.get("pid"), ev.get("tid"))] = ev["args"]["name"]

    per_line: dict[str, dict[str, float]] = collections.defaultdict(
        lambda: collections.defaultdict(float)
    )
    per_line_count: dict[str, dict[str, int]] = collections.defaultdict(
        lambda: collections.defaultdict(int)
    )
    match = re.compile(args.match) if args.match else None
    # Group X events per line, compute EXCLUSIVE (self) durations: dur minus the
    # duration of direct children (events strictly nested inside on the same line).
    by_line_events: dict[str, list] = collections.defaultdict(list)
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        line = line_names.get((ev.get("pid"), ev.get("tid")), str(ev.get("tid")))
        if args.line and args.line.lower() not in line.lower():
            continue
        by_line_events[line].append(ev)

    for line, evs in by_line_events.items():
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack: list = []  # (end_ts, child_total ref as one-elem list, event)
        for ev in evs:
            ts, dur = ev["ts"], ev["dur"]
            while stack and ts >= stack[-1][0] - 1e-9:
                _finish(stack, per_line[line], per_line_count[line], match)
            if stack:
                stack[-1][1][0] += dur
            stack.append((ts + dur, [0.0], ev))
        while stack:
            _finish(stack, per_line[line], per_line_count[line], match)

    for line, ops in sorted(per_line.items(), key=lambda kv: -sum(kv[1].values())):
        total = sum(ops.values())
        if total < 1000:  # skip sub-ms lines
            continue
        print(f"\n=== line: {line}  total {total / 1e3:.1f} ms over {sum(per_line_count[line].values())} events ===")
        grouped: dict[str, float] = collections.defaultdict(float)
        for name, dur in ops.items():
            for gname, pat in GROUPS:
                if pat.search(name):
                    grouped[gname] += dur
                    break
            else:
                grouped["other"] += dur
        for gname, dur in sorted(grouped.items(), key=lambda kv: -kv[1]):
            print(f"  [group] {gname:<40} {dur / 1e3:9.1f} ms  {100 * dur / total:5.1f}%")
        for name, dur in sorted(ops.items(), key=lambda kv: -kv[1])[: args.top]:
            n = per_line_count[line][name]
            print(f"  {dur / 1e3:9.2f} ms  x{n:<5} {name[:140]}")


if __name__ == "__main__":
    main()
