#!/usr/bin/env python3
"""Local differential check mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir>
Run after: sbt "runMain graft.Verify <sfDir> <outDir>"

For each query result parquet in outDir and matching oracle_sql.json entry:
run the oracle in DuckDB over views of the sfDir tables, sort columns by
name, sort rows, and compare values exactly (with a float tolerance report).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rel.fetchall():
        out.append(tuple(norm(row[i]) for i in order))
    return [cols[i] for i in order], sorted(out, key=lambda r: tuple(map(str, r)))


def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 3:  # optional: check a single query by name
        oracle = {k: v for k, v in oracle.items() if k == sys.argv[3]}
    # A SPARK_GRAFT_QUERIES-filtered Verify run dumps a subset. Verify
    # writes the ATTEMPTED query names to attempted.txt; only queries the
    # dump never attempted are skipped — an attempted query with no result
    # dir CRASHED before writing anything and must fail, and an oracle key
    # missing from the queries map (never attempted in an UNFILTERED run)
    # must fail too, not skip. Dumps without the marker keep the original
    # all-strict behavior.
    import os
    marker = f"{out_dir}/attempted.txt"
    if os.path.exists(marker):
        attempted = set(open(marker).read().split())
        flag = f"{out_dir}/filtered.txt"
        if os.path.exists(flag):
            # Verify states the filter mode explicitly: an UNFILTERED run
            # checks the whole oracle map, so an oracle key the queries map
            # lost fails (no result dir) instead of skipping.
            filtered = open(flag).read().strip() == "true"
        else:  # legacy dump without the flag: infer from counts
            filtered = len(attempted) < len(oracle)
        checked = {k: v for k, v in oracle.items()
                   if k in attempted or not filtered}
        skipped = len(oracle) - len(checked)
        if skipped:
            print(f"(skipping {skipped} queries not in this filtered dump)")
        oracle = checked
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            ocols, orows = rows_of(con.sql(sql))
            scols, srows = rows_of(
                con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        except Exception as e:
            print(f"FAIL  {name}: error {e}")
            n_fail += 1
            continue
        if [c.lower() for c in ocols] != [c.lower() for c in scols]:
            print(f"FAIL  {name}: columns oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        orel, srel = con.sql(sql), con.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        otypes = {c: str(t) for c, t in zip(orel.columns, orel.types)}
        stypes = {c.lower(): str(t) for c, t in zip(srel.columns, srel.types)}
        tmis = {c: (t, stypes[c.lower()]) for c, t in otypes.items()
                if stypes[c.lower()] != t}
        if tmis:
            # Round-1 lesson: the driver hashes canonicalized values, and
            # same-value-different-type (DECIMAL vs DOUBLE, TIMESTAMP_NS vs
            # TIMESTAMP) renders differently on the two sides. Treat any
            # dtype divergence as a hard failure.
            print(f"FAIL  {name}: dtype mismatch {tmis}")
            n_fail += 1
            continue
        banned = {c: t for c, t in {**otypes, **stypes}.items()
                  if "DECIMAL" in t.upper() or "TIMESTAMP_NS" in t.upper()}
        if banned:
            print(f"FAIL  {name}: banned output types (driver-rendering "
                  f"unstable): {banned}")
            n_fail += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL  {name}: rowcount oracle={len(orows)} spark={len(srows)}")
            n_fail += 1
            continue
        exact = orows == srows
        if exact:
            print(f"PASS  {name} ({len(orows)} rows, exact)")
            n_pass += 1
            continue
        # find first mismatch, report whether it's within float tolerance
        n_bad = 0
        first = None
        for o, s in zip(orows, srows):
            if o != s and not all(close(a, b) for a, b in zip(o, s)):
                n_bad += 1
                if first is None:
                    first = (o, s)
        if n_bad == 0:
            print(f"FAIL  {name} ({len(orows)} rows): float-tolerance only "
                  f"(NOT exact — driver hash will flag)")
            n_fail += 1
        else:
            print(f"FAIL  {name}: {n_bad} mismatched rows; first:")
            print(f"      oracle: {first[0]}")
            print(f"      spark : {first[1]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
