#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate — TYPE-STRICT.

Runs graft.Verify at a given SF dir, then replays every oracle SQL from
oracle_sql.json in DuckDB over the same parquet tables and diffs the
results the way the driver's hash does:

  - schema: sorted column names must match;
  - types:  arrow-level types must be IDENTICAL (decimal precision/scale,
    int width, timestamp unit — a decimal128(28,2) vs decimal128(38,2)
    is a FAIL even when every value compares equal);
  - values: exact; doubles compared BITWISE (so -0.0 vs 0.0 and any
    last-ulp difference is a FAIL). No tolerance fallback of any kind.

The Spark side is read with pyarrow directly from the Verify parquet
output (what the driver hashes); the oracle side is DuckDB's arrow
export.

Round-1 lesson (VERDICT.md "What's wrong" #2): the previous version of
this gate compared with Python `==` plus a 1e-12 fuzzy fallback and
green-lit 14 queries the driver's strict hash failed. Additionally,
every round-1 query that emitted a DECIMAL output column failed the
driver hash — including q20 whose decimal types and values were
bit-identical across engines — so the engine policy is now: gated
outputs use only BIGINT / DOUBLE / STRING / BOOLEAN / DATE (+ the
q15-proven timestamp forms); decimal math stays internal.

Usage: python3 tools/local_verify.py [sfdir] [--skip-run] [--only q1,q2]
"""
import json
import math
import struct
import subprocess
import sys
from collections import Counter
from pathlib import Path

import duckdb
import pyarrow.dataset as pads

REPO = Path(__file__).resolve().parent.parent
SFDIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/root/testdata/sf0.01"
OUT = REPO / "target" / "verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
ONLY = None
for i, a in enumerate(sys.argv):
    if a == "--only" and i + 1 < len(sys.argv):
        ONLY = set(sys.argv[i + 1].split(","))


def run_verify():
    only_arg = f" {','.join(sorted(ONLY))}" if ONLY else ""
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SFDIR} {OUT}{only_arg}']
    print(f"[local_verify] {' '.join(cmd)}")
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    sys.stdout.write("\n".join(
        l for l in r.stdout.splitlines() if "[verify]" in l or "error" in l.lower()))
    print()
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        sys.exit(1)


def cell_equal(a, b):
    """Exact, bitwise-for-floats equality. None==None only."""
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if not (isinstance(a, float) and isinstance(b, float)):
            return False
        return struct.pack("<d", a) == struct.pack("<d", b)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(cell_equal(x, y) for x, y in zip(a, b))
    return type(a) is type(b) and a == b


def check(name, got_tbl, want_tbl):
    """Returns (ok, why)."""
    # The driver's comparator sorts/hashes with pandas and cannot handle
    # nested (list/struct/map) output columns — it crashes, which counts
    # as a red row (round-5 lesson: s04_centroids). Fail them here so the
    # local gate predicts the driver. Gated outputs must be scalar:
    # BIGINT / DOUBLE / STRING / BOOLEAN / DATE (+ q15-proven timestamps).
    import pyarrow.types as pt
    for tbl, side in ((got_tbl, "spark"), (want_tbl, "duck")):
        nested = [f.name for f in tbl.schema
                  if pt.is_nested(f.type)]
        if nested:
            return False, f"nested output columns ({side}): {nested} — " \
                "driver comparator cannot sort/hash list/struct; " \
                "explode to scalar rows"
    gcols, wcols = sorted(got_tbl.column_names), sorted(want_tbl.column_names)
    if gcols != wcols:
        return False, f"schema: spark={gcols} duck={wcols}"
    tdiffs = []
    for c in gcols:
        gt = got_tbl.schema.field(c).type
        wt = want_tbl.schema.field(c).type
        if not gt.equals(wt):
            tdiffs.append(f"{c}: spark={gt} duck={wt}")
    if tdiffs:
        return False, "types: " + "; ".join(tdiffs)
    if got_tbl.num_rows != want_tbl.num_rows:
        return False, f"rowcount: spark={got_tbl.num_rows} duck={want_tbl.num_rows}"
    bad = Counter()
    first = {}
    for c in gcols:
        g = got_tbl.column(c).to_pylist()
        w = want_tbl.column(c).to_pylist()
        for i, (a, b) in enumerate(zip(g, w)):
            if not cell_equal(a, b):
                bad[c] += 1
                if c not in first:
                    first[c] = (i, a, b)
    if bad:
        det = "; ".join(
            f"{c}: {n} diffs, first row {first[c][0]} spark={first[c][1]!r} duck={first[c][2]!r}"
            for c, n in bad.most_common(4))
        return False, "values: " + det
    return True, None


def fixture_fingerprint():
    """Print the testdata fixture identity this verification ran against.

    Round-8 lesson (VERDICT #2): the driver regenerated events.parquet
    with a different ts logical type (nanos -> micros) between sessions,
    silently staling a cached "all green" claim. Any recorded strict
    count is only valid for the fingerprint it was produced against.
    """
    import pyarrow.parquet as pq
    parts = []
    for t in TABLES:
        p = Path(f"{SFDIR}/{t}.parquet")
        if not p.exists():
            continue
        f = pq.ParquetFile(p)
        sig = ",".join(f"{fl.name}:{fl.type}" for fl in f.schema_arrow)
        parts.append(f"{t}(rows={f.metadata.num_rows};{sig})")
    fp = " ".join(parts)
    import hashlib
    print(f"[local_verify] fixture sha={hashlib.sha256(fp.encode()).hexdigest()[:16]} "
          f"events.ts={pq.ParquetFile(f'{SFDIR}/events.parquet').schema_arrow.field('ts').type}")
    for part in parts:
        print(f"[local_verify] fixture {part}")


def main():
    fixture_fingerprint()
    # hard gate: committed fingerprint (tools/fixtures.fingerprint.json)
    # must match the on-disk testdata — a silent driver-side regeneration
    # fails HERE, loudly, instead of surfacing as phantom query bugs
    import fixture_fingerprint as fpgate
    if fpgate.verify() != 0 and "--skip-fingerprint" not in sys.argv:
        print("[local_verify] fixture fingerprint drift — aborting "
              "(--skip-fingerprint to override)")
        sys.exit(1)
    if "--skip-run" not in sys.argv:
        run_verify()
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SFDIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    failures = []
    names = sorted(n for n in oracle if ONLY is None or n in ONLY)
    for name in names:
        rdir = OUT / name
        if not rdir.exists():
            failures.append((name, "spark result missing"))
            continue
        got = pads.dataset(rdir, format="parquet").to_table()
        try:
            want = con.execute(oracle[name]).arrow()
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            continue
        ok, why = check(name, got, want)
        if ok:
            print(f"  OK   {name}: {got.num_rows} rows")
        else:
            failures.append((name, why))
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    n_ok = len(names) - len(failures)
    print(f"[local_verify] {n_ok}/{len(names)} oracle queries strict-match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
