#!/usr/bin/env python
"""Per-op attribution of a captured jax.profiler trace (xplane.pb).

Parses the trace with xprof's native converter (no TensorBoard server) and
prints device-time tables aggregated three ways — by HLO category, by model
component (parsed from the jax name-stack each op carries), and by the
hardware's own bound-by verdict (Compute vs HBM) — the "where do the
milliseconds actually go" evidence VERDICT r4 asked for, replacing ablation
guesswork with the hardware's counters.

    python scripts/profile_train.py --bf16 --trace /tmp/trace
    python scripts/trace_ops.py /tmp/trace [--top 25] [--json OUT.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys


def find_xplanes(trace_dir: str):
    pats = [
        os.path.join(trace_dir, "**", "*.xplane.pb"),
    ]
    files = []
    for p in pats:
        files.extend(glob.glob(p, recursive=True))
    if not files:
        raise SystemExit(f"no *.xplane.pb under {trace_dir}")
    return sorted(files)


def tool_data(xplanes, tool, params=None):
    from xprof.convert import raw_to_tool_data as r

    data, _content_type = r.xspace_to_tool_data(xplanes, tool, params or {})
    return data


def hlo_rows(xplanes):
    """hlo_stats rows keyed by column id: one per HLO op, with self time,
    category, framework-op scope (jax name stack), and bound-by verdict."""
    raw = tool_data(xplanes, "hlo_stats")
    if isinstance(raw, bytes):
        raw = raw.decode()
    obj = json.loads(raw)
    # GViz DataTable: {cols: [{id, label}], rows: [{c: [{v:..}, ...]}]}
    ids = [c.get("id") for c in obj["cols"]]
    out = []
    for row in obj["rows"]:
        out.append({k: (cell or {}).get("v") for k, cell in zip(ids, row["c"])})
    return out


def component_of(tf_op: str) -> str:
    """Attribute an op to a component+direction from its jax name stack.

    e.g. 'jit(train_step)/transpose(jvp(MotionTransferGenerator))/...' ->
    'MotionTransferGenerator bwd'; 'jit(train_step)/jvp(Discriminator)/...'
    -> 'Discriminator fwd'; bare 'jit(train_step)/add' -> 'other (optimizer/
    loss glue)'.
    """
    if not tf_op:
        return "?"
    m = re.search(r"(transpose\()?jvp\((\w+)\)", tf_op)
    if m:
        return f"{m.group(2)} {'bwd' if m.group(1) else 'fwd'}"
    m = re.search(r"jit\(train_step\)/(\w+)", tf_op)
    if m:
        return "optimizer/glue"
    return "other"


def speed_of_light(rows, peak_tflops=197.0, hbm_gbps=819.0):
    """Per-op floor time from the trace's own counters.

    Each op's floor is max(FLOPs / peak, HBM bytes / bandwidth) using the
    profiler's measured per-op flop rate and memory bandwidth (both averaged
    over the op's own execution, so flops = rate * self_time and bytes =
    bw * self_time are the op's true totals). Ops with neither counter
    (custom calls, pure copies with unreported bw) keep their measured time —
    a conservative ceiling. Returns (floor_us, measured_us, per-category
    {measured_us, floor_us, flops, bytes})."""
    per_cat = {}
    floor_total = 0.0
    measured_total = 0.0
    for row in rows:
        t = float(row.get("total_self_time") or 0.0)  # us
        rate = float(row.get("model_flop_rate") or 0.0)  # GFLOP/s
        bw = float(row.get("measured_memory_bw") or 0.0)  # GiB/s
        flops = rate * 1e9 * t * 1e-6
        byts = bw * 2**30 * t * 1e-6
        t_flop = flops / (peak_tflops * 1e12) * 1e6
        t_mem = byts / (hbm_gbps * 1e9) * 1e6
        floor = max(t_flop, t_mem) if (flops or byts) else t
        cat = str(row.get("category") or "?")
        d = per_cat.setdefault(
            cat, {"measured_us": 0.0, "floor_us": 0.0, "flops": 0.0,
                  "bytes": 0.0})
        d["measured_us"] += t
        d["floor_us"] += floor
        d["flops"] += flops
        d["bytes"] += byts
        floor_total += floor
        measured_total += t
    return floor_total, measured_total, per_cat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--json", default=None, help="write full table to JSON")
    ap.add_argument("--sol", action="store_true",
                    help="speed-of-light floor per category (v5e peaks)")
    args = ap.parse_args()

    xplanes = find_xplanes(args.trace_dir)
    print(f"# parsing {len(xplanes)} xplane file(s)", file=sys.stderr)
    rows = hlo_rows(xplanes)
    if not rows:
        raise SystemExit("hlo_stats produced no rows")

    by_cat = {}
    by_comp = {}
    by_bound = {}
    by_op = {}
    total = 0.0
    for row in rows:
        t = float(row.get("total_self_time") or 0.0)
        cat = str(row.get("category") or "?")
        name = str(row.get("hlo_op_name") or "?")
        tf_op = str(row.get("tf_op_name") or "")
        bound = str(row.get("bound_by") or "?")
        comp = component_of(tf_op)
        total += t
        by_cat[cat] = by_cat.get(cat, 0.0) + t
        by_comp[comp] = by_comp.get(comp, 0.0) + t
        by_bound[bound] = by_bound.get(bound, 0.0) + t
        if name not in by_op:
            by_op[name] = [0.0, cat, bound, tf_op[:160]]
        by_op[name][0] += t

    print(f"total device time: {total / 1e3:.3f} ms (all sampled steps)")

    def table(title, d):
        print(f"\n== {title} ==")
        for k, t in sorted(d.items(), key=lambda kv: -kv[1]):
            print(f"{t / 1e3:10.3f} ms  {100 * t / total:5.1f}%  {k}")

    table("by HLO category", by_cat)
    table("by component (from the jax name stack)", by_comp)
    table("by bound-by (hardware verdict)", by_bound)

    sol = None
    if args.sol:
        floor, measured, per_cat = speed_of_light(rows)
        print("\n== speed-of-light floor by category "
              "(197 bf16 TFLOP/s, 819 GB/s HBM) ==")
        print(f"{'measured':>10s} {'floor':>10s} {'x':>5s}  category")
        for cat, d in sorted(per_cat.items(),
                             key=lambda kv: -kv[1]["measured_us"]):
            x = d["measured_us"] / d["floor_us"] if d["floor_us"] else 0.0
            print(f"{d['measured_us']/1e3:9.3f}ms {d['floor_us']/1e3:9.3f}ms "
                  f"{x:5.1f}  {cat}  ({d['flops']/1e9:.1f} GFLOP, "
                  f"{d['bytes']/2**30:.2f} GiB)")
        print(f"{measured/1e3:9.3f}ms {floor/1e3:9.3f}ms "
              f"{measured/floor:5.1f}  TOTAL")
        sol = {"floor_us": floor, "measured_us": measured,
               "per_category": per_cat}

    print(f"\n== top {args.top} ops ==")
    top = sorted(by_op.items(), key=lambda kv: -kv[1][0])[: args.top]
    for name, (t, cat, bound, tf_op) in top:
        print(f"{t / 1e3:10.3f} ms  {100 * t / total:5.1f}%  "
              f"[{cat}; {bound}] {name}")
        if tf_op:
            print(f"{'':22s}{tf_op}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(
                {
                    "total_us": total,
                    "by_category_us": by_cat,
                    "by_component_us": by_comp,
                    "by_bound_us": by_bound,
                    "top_ops_us": {
                        n: {"us": v[0], "category": v[1], "bound_by": v[2],
                            "tf_op": v[3]}
                        for n, v in top
                    },
                    "speed_of_light": sol,
                },
                f,
                indent=1,
            )
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
