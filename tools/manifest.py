#!/usr/bin/env python3
"""Testdata drift tripwire.

The driver regenerates /root/testdata between rounds and is free to
change physical schemas (round 7: events.ts went TIMESTAMP(NANOS) →
timestamp[us], which broke 21 queries at analysis time and silently
compressed streaming timestamps 1000×). This tool pins the current
generation so the NEXT regeneration is caught in seconds at round
start, not via a red driver artifact.

Usage:
  tools/manifest.py write   # snapshot schemas+stats → data_manifest.json
  tools/manifest.py check   # diff live testdata vs the committed manifest
check exits 1 and prints a per-table diff when anything changed.
"""
import json
import sys

import pyarrow.parquet as pq

SFS = ["sf0.001", "sf0.01", "sf0.1"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
MANIFEST = "data_manifest.json"


def snapshot():
    out = {}
    for sf in SFS:
        for t in TABLES:
            path = f"/root/testdata/{sf}/{t}.parquet"
            md = pq.read_metadata(path)
            sch = pq.read_schema(path)
            # per-column null counts from row-group statistics: pins the
            # generator's no-NULLs guarantee, so a regeneration that
            # starts emitting NULLs (which would flip NULL-propagation
            # dispositions both engines must share — NullRobustnessSpec)
            # trips here instead of as a driver hash mismatch
            nulls = {}
            for j in range(md.num_columns):
                total = 0
                for i in range(md.num_row_groups):
                    st = md.row_group(i).column(j).statistics
                    if st is None or st.null_count is None:
                        total = None
                        break
                    total += st.null_count
                name = md.row_group(0).column(j).path_in_schema
                nulls[name] = total
            out[f"{sf}/{t}"] = {
                "rows": md.num_rows,
                "columns": {f.name: str(f.type) for f in sch},
                "nulls": nulls,
            }
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    live = snapshot()
    # a column without row-group statistics records nulls=None, which
    # would silently void the no-NULLs guarantee for that column (None
    # compares equal to None forever after) — refuse to pin it, and
    # flag it on check even when the committed manifest agrees
    no_stats = [f"{key}.{c}" for key, snap in sorted(live.items())
                for c, n in sorted(snap["nulls"].items()) if n is None]
    if no_stats:
        print("STATISTICS UNAVAILABLE — null counts cannot be pinned for:")
        for c in no_stats:
            print(" ", c)
        if mode == "write":
            print("refusing to write a manifest with vacuous null pins")
            return 1
    if mode == "write":
        with open(MANIFEST, "w") as f:
            json.dump(live, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {MANIFEST}: {len(live)} table snapshots")
        return 0
    committed = json.load(open(MANIFEST))
    drift = []
    for key in sorted(set(committed) | set(live)):
        a, b = committed.get(key), live.get(key)
        if a == b:
            continue
        if a is None:
            drift.append(f"{key}: NEW table (not in committed manifest)")
            continue
        if b is None:
            drift.append(f"{key}: MISSING on disk")
            continue
        if a["rows"] != b["rows"]:
            drift.append(f"{key}: rows {a['rows']} -> {b['rows']}")
        for c in sorted(set(a["columns"]) | set(b["columns"])):
            ca, cb = a["columns"].get(c), b["columns"].get(c)
            if ca != cb:
                drift.append(f"{key}.{c}: type {ca} -> {cb}")
        na, nb = a.get("nulls", {}), b.get("nulls", {})
        for c in sorted(set(na) | set(nb)):
            if na.get(c) != nb.get(c):
                drift.append(
                    f"{key}.{c}: nulls {na.get(c)} -> {nb.get(c)}")
    if drift:
        print("TESTDATA DRIFT — the driver regenerated data; re-verify "
              "loaders (Tables.normalizeTs) and re-derive bench budgets:")
        for d in drift:
            print(" ", d)
        return 1
    print(f"manifest OK: {len(live)} table snapshots unchanged")
    return 0


if __name__ == "__main__":
    sys.exit(main())
