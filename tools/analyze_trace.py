"""Cluster a saved xprof trace's op costs by provenance (module / op kind).

Usage:
    python tools/analyze_trace.py <trace_dir> [--steps 3] [--top 200]

Complements tools/profile_step.py: re-parses an existing trace without
re-running the step, and aggregates leaf op times by (category, provenance
cluster) so the long tail of small loop fusions becomes attributable.
"""

import argparse
import glob
import json
import os
import re
import sys
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=0, help="print top-N leaf ops")
    ap.add_argument("--cat", default=None, help="restrict to one category")
    args = ap.parse_args()

    xplanes = glob.glob(
        os.path.join(args.trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not xplanes:
        sys.exit(f"no xplane.pb under {args.trace_dir}")
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, "op_profile", {})
    prof = json.loads(data)
    cats = prof["byProgram"]["children"][0]["children"]

    ops = []

    def walk(node, cat):
        t_ps = float(node.get("metrics", {}).get("rawTime", 0.0))
        kids = node.get("children", [])
        if t_ps > 0 and not any(
            float(k.get("metrics", {}).get("rawTime", 0.0)) > 0 for k in kids
        ):
            prov = ""
            stack = [node]
            while stack:
                n = stack.pop()
                x = n.get("xla", {})
                if x.get("provenance"):
                    prov = x["provenance"]
                    break
                stack.extend(n.get("children", []))
            ops.append((t_ps / 1e9 / args.steps, cat, node["name"], prov))
        for k in kids:
            walk(k, cat)

    for c in cats:
        if args.cat and c["name"] != args.cat:
            continue
        for fusion in c.get("children", []):
            walk(fusion, c["name"])

    # cluster by (category, provenance signature): module path + final op
    def cluster_key(cat, name, prov):
        # drop the jit(train_step)/ prefix and trailing :...
        p = prov.split(":")[0]
        p = re.sub(r"^jit\(train_step\)/", "", p)
        # collapse indices
        p = re.sub(r"\.\d+$", "", p)
        return (cat, p)

    agg = defaultdict(float)
    cnt = defaultdict(int)
    for ms, cat, name, prov in ops:
        k = cluster_key(cat, name, prov)
        agg[k] += ms
        cnt[k] += 1

    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    total = sum(agg.values())
    print(f"{'ms/step':>8}  {'n':>4}  cluster")
    shown = 0.0
    for (cat, p), ms in rows:
        if ms < 0.25:
            break
        shown += ms
        print(f"{ms:8.2f}  {cnt[(cat, p)]:4d}  [{cat}] {p}")
    print(f"{shown:8.2f}  shown / {total:.1f} total")

    if args.top:
        ops.sort(reverse=True)
        print(f"\n{'ms/step':>8}  top leaf ops")
        for ms, cat, name, prov in ops[: args.top]:
            print(f"{ms:8.2f}  [{cat}] {name}  {prov[:140]}")


if __name__ == "__main__":
    main()
