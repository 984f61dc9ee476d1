#!/usr/bin/env python3
"""Maintain tools/floors.json — the per-query floor table graft.Bench
reads for its untainted-outlier retry net (VERDICT r11 item 1).

Usage: python3 tools/make_floors.py bench.json [bench2.json ...]

Each argument is a bench result file (the {"metric":"total_full",
"queries":{...}} line graft.Bench persists to target/bench.json).
The floor for a query is the MINIMUM over the existing floors.json and
every supplied pass (negative entries — failed measurements — are
ignored). Floors only ever tighten; a query absent from floors.json is
seeded by its first observed time.
"""
import json
import sys
import os

FLOORS = os.path.join(os.path.dirname(__file__), "floors.json")


def load(path):
    with open(path) as f:
        txt = f.read()
    # bench.json is a single JSON object/line; floors.json is a flat map
    obj = json.loads(txt)
    return obj.get("queries", obj)


def main():
    floors = {}
    if os.path.exists(FLOORS):
        floors = load(FLOORS)
    for arg in sys.argv[1:]:
        for q, v in load(arg).items():
            if not isinstance(v, (int, float)) or v < 0:
                continue
            if q not in floors or v < floors[q]:
                floors[q] = v
    with open(FLOORS, "w") as f:
        json.dump({q: round(v, 3) for q, v in sorted(floors.items())},
                  f, indent=0, sort_keys=True)
        f.write("\n")
    total = sum(floors.values())
    print(f"floors.json: {len(floors)} queries, floor total {total:.1f} s")


if __name__ == "__main__":
    main()
