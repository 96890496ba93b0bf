#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs graft.Verify at a given SF dir, then replays every oracle SQL from
oracle_sql.json in DuckDB over the same parquet tables and diffs the
results (schema by sorted column name, values exactly; doubles compared
bitwise first, then with a 1e-12 relative fallback reported separately).

Usage: python3 tools/local_verify.py [sfdir] [--skip-run]
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
SFDIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/root/testdata/sf0.01"
OUT = REPO / "target" / "verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SFDIR} {OUT}']
    print(f"[local_verify] {' '.join(cmd)}")
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    sys.stdout.write("\n".join(
        l for l in r.stdout.splitlines() if "[verify]" in l or "error" in l.lower()))
    print()
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        sys.exit(1)


def norm(v):
    if isinstance(v, float):
        return v
    return v


def values_equal(a, b):
    if a is None and b is None:
        return True, False
    if (a is None) != (b is None):
        return False, False
    if isinstance(a, float) and isinstance(b, float):
        if a == b or (math.isnan(a) and math.isnan(b)):
            return True, False
        if b != 0 and abs(a - b) / max(abs(a), abs(b)) < 1e-12:
            return True, True  # equal only under tolerance -> flag
        return False, False
    try:
        return a == b, False
    except Exception:
        return str(a) == str(b), False


def main():
    if "--skip-run" not in sys.argv:
        run_verify()
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SFDIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    failures, fuzzy_total = [], 0
    for name in sorted(oracle):
        rdir = OUT / name
        if not rdir.exists():
            failures.append((name, "spark result missing"))
            continue
        got = con.execute(
            f"SELECT * FROM '{rdir}/*.parquet'").fetchall()
        got_cols = [d[0] for d in con.description]
        try:
            want = con.execute(oracle[name]).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            continue
        if sorted(got_cols) != sorted(want_cols):
            failures.append((name, f"schema: spark={sorted(got_cols)} duck={sorted(want_cols)}"))
            continue
        if len(got) != len(want):
            failures.append((name, f"rowcount: spark={len(got)} duck={len(want)}"))
            continue
        gp = [got_cols.index(c) for c in sorted(got_cols)]
        wp = [want_cols.index(c) for c in sorted(want_cols)]
        bad = None
        fuzzy = 0
        for i, (gr, wr) in enumerate(zip(got, want)):
            for j, (g, w) in enumerate(zip([gr[p] for p in gp], [wr[p] for p in wp])):
                eq, fz = values_equal(g, w)
                fuzzy += fz
                if not eq:
                    bad = (i, sorted(got_cols)[j], g, w)
                    break
            if bad:
                break
        if bad:
            failures.append((name, f"value row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}"))
        else:
            tag = f" ({fuzzy} fuzzy-float)" if fuzzy else ""
            fuzzy_total += fuzzy
            print(f"  OK   {name}: {len(got)} rows{tag}")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    n_ok = len(oracle) - len(failures)
    print(f"[local_verify] {n_ok}/{len(oracle)} oracle queries match"
          + (f"; {fuzzy_total} fuzzy-float values total" if fuzzy_total else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
