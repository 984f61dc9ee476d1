#!/usr/bin/env python3
"""Per-family scale table: joins a bench JSON (per-query seconds) against
tools/floors.json (sf0.1 per-query floor) and prints the BASELINE-style
family table plus the worst per-query ratios.

Usage: python3 tools/family_table.py <bench.json> [prev_bench.json]
With prev_bench.json (e.g. the 30x pass), also prints family ratios
between the two benches.
"""
import json, re, sys, collections

# family = the SparkEntry.defGroups group; recover it from the source tree
import pathlib
QDIR = pathlib.Path(__file__).resolve().parent.parent / "src/main/scala/graft/queries"
FILE2FAM = {
    "Relational.scala": "relational", "WindowsQ.scala": "windows",
    "TextQ.scala": "text", "DedupQ.scala": "dedup",
    "SimilarityQ.scala": "similarity", "EventsQ.scala": "events",
    "ParityQ.scala": "parity", "AsOfQ.scala": "asof",
    "StatsQ.scala": "stats", "PipelineQ.scala": "pipeline",
    "JdbcQ.scala": "jdbc", "LayoutQ.scala": "layout",
    "SkewQ.scala": "skew", "PackQ.scala": "pack",
    "MediaQ.scala": "media", "MergeQ.scala": "merge",
    "CorpusStatsQ.scala": "corpusstats", "GraphQ.scala": "graph",
    "FormatsQ.scala": "formats", "AnalyticsQ.scala": "analytics",
    "ReshapeQ.scala": "reshape", "StreamParityQ.scala": "streamparity",
}

def qfam():
    m = {}
    lit = re.compile(r'QueryDef\(\s*"([^"]+)"')
    for f, fam in FILE2FAM.items():
        p = QDIR / f
        if p.exists():
            for name in lit.findall(p.read_text()):
                m[name] = fam
    return m

def main():
    bench = json.load(open(sys.argv[1]))["queries"]
    prev = json.load(open(sys.argv[2]))["queries"] if len(sys.argv) > 2 else None
    floors = json.load(open(pathlib.Path(__file__).parent / "floors.json"))
    fam = qfam()
    rows = collections.defaultdict(lambda: [0, 0.0, 0.0, 0.0])  # n, floor, cur, prev
    missing = []
    for q, s in bench.items():
        f = fam.get(q)
        if f is None:
            missing.append(q); continue
        r = rows[f]
        r[0] += 1; r[2] += s
        r[1] += floors.get(q, 0.0)
        if prev: r[3] += prev.get(q, 0.0)
    tf = tc = tp = 0.0; tn = 0
    hdr = "| family | n | floor0.1 (s) | cur (s) | cur/floor |"
    if prev: hdr += " prev (s) | cur/prev |"
    print(hdr)
    print("|---|---|---|---|---|" + ("---|---|" if prev else ""))
    for f, (n, fl, cu, pv) in sorted(rows.items(), key=lambda kv: -kv[1][2] / max(kv[1][1], 1e-9)):
        tn += n; tf += fl; tc += cu; tp += pv
        line = f"| {f} | {n} | {fl:.2f} | {cu:.2f} | {cu/max(fl,1e-9):.2f}x |"
        if prev: line += f" {pv:.2f} | {cu/max(pv,1e-9):.2f}x |"
        print(line)
    line = f"| **total** | **{tn}** | **{tf:.2f}** | **{tc:.2f}** | **{tc/tf:.2f}x** |"
    if prev: line += f" **{tp:.2f}** | **{tc/tp:.2f}x** |"
    print(line)
    if missing: print("unmapped:", missing)
    print("\nworst per-query vs floor:")
    ratios = sorted(((s / max(floors.get(q, 0.0), 1e-9), q, floors.get(q, 0.0), s)
                     for q, s in bench.items()), reverse=True)[:12]
    for r, q, f, s in ratios:
        print(f"  {q}: {f:.2f} -> {s:.2f}  ({r:.1f}x)")
    if prev:
        print("\nworst per-query vs prev:")
        ratios = sorted(((s / max(prev.get(q, 0.0), 1e-9), q, prev.get(q, 0.0), s)
                         for q, s in bench.items() if q in prev), reverse=True)[:12]
        for r, q, p, s in ratios:
            print(f"  {q}: {p:.2f} -> {s:.2f}  ({r:.1f}x)")

if __name__ == "__main__":
    main()
