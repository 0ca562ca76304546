"""XProf/xplane trace analysis: per-op and per-category device-time tables.

Completes the tracing subsystem (SURVEY.md §5 "Tracing / profiling"): the
capture side lives in :mod:`ssd_tpu.utils.profiling` (``train.py
--profile N`` / ``profiling.trace``); this module reads the captured
``*.xplane.pb`` back WITHOUT a TensorBoard server — the environment's
tensorboard-plugin-profile wheel is ABI-mismatched with its TF, so the
xplane proto is parsed directly (via TF's bundled ``xplane_pb2``) and
aggregated here. This exact tool found the round-2 wins: the (N, A, C)
relayout chain + full-sort top-k in serving, and the 29 ms matched-gt
gather in training.

CLI:
    python -m ssd_tpu.utils.trace_tools <trace_dir_or_xplane.pb> \
        [--iters N] [--top K]
"""

from __future__ import annotations

import collections
import glob
import os

# pure-python protobuf parsing: the fast-path descriptor pool rejects the
# pre-3.19 generated xplane_pb2 shipped inside TF
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def find_xplane(path: str) -> str:
    """Accept a trace dir (as passed to --profile) or a direct .pb path."""
    if path.endswith(".pb"):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        raise FileNotFoundError(f"no *.xplane.pb under {path}")
    return hits[-1]


def load_device_ops(xplane_path: str, device_substr: str = "TPU") -> list:
    """Parse one xplane file -> [(op_name, hlo_category, total_ps)].

    Uses the busiest event line of the first matching device plane (the
    "XLA Ops" line); module- and jit-level wrapper events are dropped.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # lazy: needs TF

    xs = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if device_substr in p.name and p.lines]
    if not planes:
        raise ValueError(
            f"no '{device_substr}' plane in {xplane_path}; planes: "
            f"{[p.name for p in xs.planes]}"
        )
    plane = planes[0]
    line = max(plane.lines, key=lambda l: len(l.events))
    smd = plane.stat_metadata

    def category(md):
        for st in md.stats:
            if smd[st.metadata_id].name == "hlo_category":
                return st.str_value
        return "?"

    agg: dict = collections.defaultdict(int)
    cats: dict = {}
    full: dict = {}
    for ev in line.events:
        md = plane.event_metadata[ev.metadata_id]
        if md.name.startswith("jit_"):
            continue  # whole-program wrapper event
        base = md.name.split(" = ")[0]
        agg[base] += ev.duration_ps
        cats[base] = category(md)
        full[base] = md.name
    return [(full[b], cats[b], ps) for b, ps in agg.items()]


def summarize(xplane_path: str, iters: int = 1, top: int = 15) -> str:
    """Human-readable per-category + top-op table (ms, divided by iters)."""
    ops = load_device_ops(xplane_path)
    by_cat = collections.Counter()
    for _, cat, ps in ops:
        by_cat[cat] += ps
    total = sum(by_cat.values())
    lines = [f"device time: {total / 1e12 * 1000 / iters:.2f} ms "
             f"(over {iters} iteration(s))", "", "by HLO category:"]
    for cat, ps in by_cat.most_common():
        lines.append(f"  {ps / 1e12 * 1000 / iters:8.2f} ms  {cat}")
    lines += ["", f"top {top} ops:"]
    for name, cat, ps in sorted(ops, key=lambda t: -t[2])[:top]:
        lines.append(
            f"  {ps / 1e12 * 1000 / iters:8.2f} ms  [{cat}] {name[:110]}"
        )
    return "\n".join(lines)


def main() -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("trace", help="trace dir (workdir/profile) or .xplane.pb")
    p.add_argument("--iters", type=int, default=1,
                   help="steps captured in the trace (divides the totals)")
    p.add_argument("--top", type=int, default=15)
    args = p.parse_args()
    print(summarize(find_xplane(args.trace), args.iters, args.top))


if __name__ == "__main__":
    main()
