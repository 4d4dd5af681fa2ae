#!/usr/bin/env python3
"""Refresh tools/quiet_brackets.json from fresh quiet full-suite runs,
PURGING unattainable entries (VERDICT r16 ask #4).

The MIN-fold brackets accumulate one-time minima forever; an entry no
run has approached for rounds (q59's 0.33 s from the 65-second-era
suite) manufactures a phantom outlier every round. Purge rule, recorded
in _meta: an old bracket is STALE when NO recent run (the committed
driver BENCH.json plus every fresh run passed here) comes within
ATTAIN x of it; stale entries are DROPPED from the fold and RESEEDED to
the min across those recent runs. Attainable entries keep the
elementwise MIN of (old, fresh runs).

Usage: python3 tools/rebaseline_brackets.py run1.json [run2.json ...]
Each run JSON is a graft.Bench output line ({"queries": {...}}).
Writes tools/quiet_brackets.json in place; prints a change report.
"""
import json
import sys
from datetime import date

ATTAIN = 1.5
BRACKETS = "tools/quiet_brackets.json"
DRIVER = "BENCH.json"


def qmap(path):
    with open(path) as f:
        d = json.load(f)
    return d["queries"] if "queries" in d else d


def main():
    runs = [qmap(p) for p in sys.argv[1:]]
    if not runs:
        print("usage: rebaseline_brackets.py run1.json [run2.json ...]")
        return 1
    recent = runs + [qmap(DRIVER)]
    with open(BRACKETS) as f:
        doc = json.load(f)
    old = doc["queries"]
    out, purged, seeded = {}, [], []
    names = set(old) | {q for r in runs for q in r}
    for q in sorted(names):
        fresh = [r[q] for r in runs if q in r]
        rec = [r[q] for r in recent if q in r]
        if q not in old:
            out[q] = round(min(fresh), 4)
            seeded.append(q)
        elif rec and old[q] * ATTAIN < min(rec):
            out[q] = round(min(rec), 4)
            purged.append((q, old[q], out[q]))
        else:
            out[q] = round(min([old[q]] + fresh), 4)
    doc["queries"] = out
    meta = doc.get("_meta", {})
    meta["date"] = str(date.today())
    meta["purge_rule"] = (
        f"an entry is dropped from the MIN fold and reseeded to the "
        f"recent-run minimum when no recent run (committed driver "
        f"BENCH.json + the fresh runs) comes within {ATTAIN}x of it — "
        f"a bracket no run can reach manufactures a phantom outlier")
    meta["last_refresh"] = (
        f"{len(runs)} fresh run(s); purged {[p[0] for p in purged]}; "
        f"seeded {seeded}")
    doc["_meta"] = meta
    with open(BRACKETS, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    for q, o, n in purged:
        print(f"PURGED {q}: {o} -> {n} (stale minimum)")
    for q in seeded:
        print(f"SEEDED {q}: {out[q]}")
    lowered = [q for q in names
               if q in old and out[q] < old[q] and
               q not in [p[0] for p in purged]]
    print(f"{len(out)} entries; {len(purged)} purged, {len(seeded)} "
          f"seeded, {len(lowered)} lowered")
    return 0


if __name__ == "__main__":
    sys.exit(main())
