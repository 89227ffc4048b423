#!/usr/bin/env python
"""Summarise a jax.profiler trace into an HLO-op-category time breakdown.

Consumes the .xplane.pb written by `jax.profiler.start_trace` (e.g. from
`tools/perf_probe.py --trace DIR` or `train_task.py --profile_steps N`) and
prints (a) total device time per op category and (b) the top-k individual
HLO ops by self time — the evidence for "where does the remaining MFU gap
live" (VERDICT round 2, stretch item).

Pure host-side analysis (no TPU): uses the xprof/tensorboard-plugin-profile
converter that ships in this image.

Usage: python tools/analyze_trace.py TRACE_DIR [--top 25] [--json OUT]
"""

import argparse
import glob
import json
import os
import sys


def find_xplanes(root):
    hits = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        sys.exit(f"no .xplane.pb under {root}")
    return hits


def load_hlo_stats(xplanes):
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8")
    return json.loads(data)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--json", default=None,
                   help="also write the summary as JSON here")
    args = p.parse_args()

    table = load_hlo_stats(find_xplanes(args.trace_dir))
    # gviz DataTable: {cols: [{label,...}], rows: [{c: [{v: ...}]}]}
    cols = [c.get("label") or c.get("id") for c in table["cols"]]
    ix = {lbl: i for i, lbl in enumerate(cols)}

    def pick(*names):
        for n in names:
            for lbl, i in ix.items():
                if lbl and n.lower() == lbl.lower():
                    return i
        for n in names:  # substring fallback
            for lbl, i in ix.items():
                if lbl and n.lower() in lbl.lower():
                    return i
        raise KeyError(f"none of {names} in {cols}")

    i_cat = pick("HLO op category", "category")
    i_name = pick("HLO op name", "hlo op")
    i_self = pick("Total self time (us)", "self time (us)", "self time")
    i_occ = pick("#Occurrences", "occurrences")

    by_cat, by_op = {}, {}
    for row in table["rows"]:
        c = row["c"]
        cat = c[i_cat]["v"]
        name = c[i_name]["v"]
        us = float(c[i_self]["v"] or 0)
        occ = int(c[i_occ]["v"] or 0)
        by_cat[cat] = by_cat.get(cat, 0.0) + us
        k = (cat, name)
        t, n = by_op.get(k, (0.0, 0))
        by_op[k] = (t + us, n + occ)

    total = sum(by_cat.values())
    print(f"total device self time: {total / 1e3:.2f} ms "
          f"(all timed iterations)")
    print("\n== by HLO category ==")
    cats = sorted(by_cat.items(), key=lambda kv: -kv[1])
    for cat, us in cats:
        print(f"{us / 1e3:10.2f} ms  {us / total * 100:5.1f}%  {cat}")
    print(f"\n== top {args.top} ops by self time ==")
    ops = sorted(by_op.items(), key=lambda kv: -kv[1][0])[:args.top]
    for (cat, name), (us, occ) in ops:
        print(f"{us / 1e3:10.2f} ms  {us / total * 100:5.1f}%  x{occ:<5d} "
              f"[{cat}] {name[:90]}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({
                "total_ms": total / 1e3,
                "by_category_ms": {c: u / 1e3 for c, u in cats},
                "top_ops": [
                    {"category": cat, "name": name, "ms": us / 1e3,
                     "occurrences": occ}
                    for (cat, name), (us, occ) in ops],
            }, f, indent=1)
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
