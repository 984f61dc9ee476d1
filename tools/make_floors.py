#!/usr/bin/env python3
"""Maintain tools/floors.json — the per-query floor table graft.Bench
reads for its untainted-outlier retry net (VERDICT r11 item 1).

Usage: python3 tools/make_floors.py [--reset] bench.json [bench2.json ...]

Each argument is a bench result file (the {"metric":"total_full",
"queries":{...}} line graft.Bench persists to target/bench.json).
The floor for a query is the MINIMUM over the existing floors.json and
every supplied pass (negative entries — failed measurements — are
ignored). Floors only ever tighten; a query absent from floors.json is
seeded by its first observed time. `--reset` discards the existing
table first (used when the floors must be re-based on a new protocol).

Provenance (r19, VERDICT r18 item 2): graded passes are COLD
(runs_per_query=1, each query measured once in suite order), while
BENCH_RUNS>1 spot runs report warm medians — folding a warm number into
the floor table makes later cold/floor ratio audits compare unlike
protocols (the q02 saga: two rounds flagged as a regression against its
own warm median). This script therefore REFUSES any input whose host
block says runs_per_query != 1, and stamps the table with a string-only
`__meta` block naming the protocol. graft.Bench skips `__`-prefixed
keys when loading.
"""
import json
import sys
import os

FLOORS = os.path.join(os.path.dirname(__file__), "floors.json")

META = {
    "protocol": "cold_full",
    "note": "per-query MIN over full runs_per_query=1 passes only; "
            "warm-median (BENCH_RUNS>1) passes are rejected at fold time, "
            "and retry-substituted values are de-substituted to their "
            "first-run originals via host.retry_orig (r19: a JIT-warm or "
            "memo-riding retry is not a cold first run). "
            "String-only values here: graft.Bench's loader skips __-keys "
            "but must never see a parseable number in this block.",
}


def load(path):
    with open(path) as f:
        txt = f.read()
    # bench.json is a single JSON object/line; floors.json is a flat map
    obj = json.loads(txt)
    return obj


def main():
    args = sys.argv[1:]
    reset = "--reset" in args
    args = [a for a in args if a != "--reset"]
    floors = {}
    if os.path.exists(FLOORS) and not reset:
        floors = {k: v for k, v in load(FLOORS).items()
                  if not k.startswith("__")}
    for arg in args:
        obj = load(arg)
        host = obj.get("host")
        if host is not None and host.get("runs_per_query", 1) != 1:
            sys.exit(f"{arg}: runs_per_query={host['runs_per_query']} — "
                     "warm-median pass, not a cold floor source (rejected; "
                     "see __meta.protocol)")
        # De-substitute retry replacements (r19): a stall-retry runs in a
        # JIT-warm JVM, so its time is a valid pass-total adjudication but
        # NOT a cold-first-run floor — folding it produces a floor no
        # first run can reach, and every later pass then retries the query
        # forever (the q247/q73 feedback loop; worse, pre-fix memo-riding
        # retries recorded near-zero fakes). The bench's host block carries
        # the pre-substitution first-run seconds as "retry_orig"; floors
        # fold those. Passes from binaries older than the field keep the
        # kept values (nothing better is recorded for them).
        orig = (host or {}).get("retry_orig", {})
        for q, v in obj.get("queries", obj).items():
            # de-substitute FIRST, validate after: a retry can rescue a
            # FAILED first run (original -1), and that negative original
            # must be skipped, not folded as a floor
            v = orig.get(q, v)
            if q.startswith("__") or not isinstance(v, (int, float)) or v <= 0:
                continue
            if q not in floors or v < floors[q]:
                floors[q] = v
    out = {"__meta": META}
    out.update({q: round(v, 3) for q, v in sorted(floors.items())})
    with open(FLOORS, "w") as f:
        json.dump(out, f, indent=0, sort_keys=False)
        f.write("\n")
    total = sum(floors.values())
    print(f"floors.json: {len(floors)} queries, floor total {total:.1f} s"
          + (" (reset)" if reset else ""))


if __name__ == "__main__":
    main()
