#!/usr/bin/env python3
"""Fixture fingerprint gate — makes a silent testdata regeneration LOUD.

Round-8 post-mortem: the only systemic break of the build was a driver-side
fixture regeneration that flipped the events timestamp column's parquet
logical type; every query over it stale-passed locally and failed the
driver's strict gate. The reader-side fix (Events.scala probes the logical
type) handles that one column; this tool generalizes the lesson to EVERY
fixture file: record arrow-level schema + row count + null counts + a
head-sample value digest, commit the fingerprint, and fail verification
loudly on any drift so the divergence is investigated BEFORE chasing
phantom query bugs.

Usage:
  python3 tools/fixture_fingerprint.py --write   # (re)record fingerprints
  python3 tools/fixture_fingerprint.py           # verify, exit 1 on drift

The digest is logical, not physical: re-encoding the same values with a
different parquet writer/compression keeps the fingerprint stable; any
change to schema, row count, null placement, or the first 64 rows' values
trips it. Verified automatically at the top of tools/local_verify.py and
by graft.FixtureFingerprintSpec (rows + column names from the JVM side).
"""
import hashlib
import json
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
FPFILE = REPO / "tools" / "fixtures.fingerprint.json"
SFDIRS = ["sf0.001", "sf0.01", "sf0.1"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
ROOT = Path("/root/testdata")
HEAD_N = 64


def fingerprint_file(path: Path) -> dict:
    meta = pq.read_metadata(path)
    schema = pq.read_schema(path)
    cols = [{"name": f.name, "arrow_type": str(f.type)} for f in schema]
    con = duckdb.connect()
    quoted = [f'"{f.name}"' for f in schema]
    null_exprs = ", ".join(
        f"count(*) - count({q})" for q in quoted)
    nulls = con.execute(
        f"SELECT {null_exprs} FROM read_parquet('{path}')").fetchone()
    # head-sample digest: first HEAD_N rows in file order (parquet scan
    # order is deterministic), every column cast to varchar
    head = con.execute(
        f"SELECT * FROM read_parquet('{path}') LIMIT {HEAD_N}").fetchall()
    h = hashlib.md5()
    for row in head:
        h.update("|".join(str(v) for v in row).encode())
    return {
        "rows": meta.num_rows,
        "columns": cols,
        "null_counts": {f.name: n for f, n in zip(schema, nulls)},
        "head_digest": h.hexdigest(),
    }


def collect() -> dict:
    out = {}
    for sf in SFDIRS:
        for t in TABLES:
            p = ROOT / sf / f"{t}.parquet"
            if p.exists():
                out[f"{sf}/{t}"] = fingerprint_file(p)
    return out


def verify() -> int:
    if not FPFILE.exists():
        print(f"[fixture_fingerprint] MISSING {FPFILE} — run with --write")
        return 1
    want = json.loads(FPFILE.read_text())
    got = collect()
    bad = 0
    for key in sorted(set(want) | set(got)):
        if key not in got:
            print(f"[fixture_fingerprint] DRIFT {key}: file disappeared")
            bad += 1
            continue
        if key not in want:
            print(f"[fixture_fingerprint] NEW {key}: not in committed "
                  "fingerprint — re-record with --write after reviewing")
            bad += 1
            continue
        w, g = want[key], got[key]
        for field in ("rows", "columns", "null_counts", "head_digest"):
            if w[field] != g[field]:
                print(f"[fixture_fingerprint] DRIFT {key}.{field}:")
                print(f"  recorded: {json.dumps(w[field])[:300]}")
                print(f"  current:  {json.dumps(g[field])[:300]}")
                bad += 1
    if bad:
        print(f"[fixture_fingerprint] {bad} drift(s). The driver testdata "
              "changed since the fingerprint was recorded — investigate "
              "(schema/unit drift breaks queries silently), then re-record "
              "with: python3 tools/fixture_fingerprint.py --write")
        return 1
    print(f"[fixture_fingerprint] OK — {len(got)} fixture files match")
    return 0


if __name__ == "__main__":
    if "--write" in sys.argv:
        FPFILE.write_text(json.dumps(collect(), indent=1, sort_keys=True) + "\n")
        print(f"[fixture_fingerprint] wrote {FPFILE}")
    else:
        sys.exit(verify())
