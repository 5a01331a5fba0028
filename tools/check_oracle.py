#!/usr/bin/env python3
"""Dev-side mirror of the driver's correctness gate: run each
oracle_sql.json query in DuckDB over the sf tables and compare with the
Spark parquet dumps produced by graft.Verify.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows, cols):
    # column-name sort, stringized values, row sort — order-insensitive
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(str(r[i]) for i in idx))
    return sorted(out), [cols[i] for i in idx]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # DuckDB's allocator fragments the address space hard on this
    # battery (in-flight peak ~60k memory maps, dominated by the
    # list-heavy minhash oracles): below the kernel default
    # vm.max_map_count=65530 the checker fails RANDOM queries with
    # "Out of Memory Error ... (bad allocation)" despite ~100 GB
    # free. Warn so a fresh boot gets the sysctl re-applied
    # (sysctl -w vm.max_map_count=1048576).
    try:
        cap = int(open("/proc/sys/vm/max_map_count").read())
        if cap < 131072:
            print(f"WARN vm.max_map_count={cap} — the battery peaks "
                  "near 65k maps; raise it or expect random "
                  "bad-allocation oracle failures")
    except OSError:
        pass
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql)
            wrows, wcols = norm(want.fetchall(), want.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            grows, gcols = norm(got.fetchall(), got.columns)
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_bad += 1
            continue
        # Arrow-level dtype compare: the driver's hash gate sees types,
        # not just stringized values (DuckDB widens sum(int) to
        # HUGEINT/decimal128 — identical str(), different hash).
        # LIMIT 0: the types are all we need, don't re-run the query.
        try:
            wtypes = {f.name: str(f.type)
                      for f in con.sql(
                          f"SELECT * FROM ({sql}) LIMIT 0").arrow().schema}
            gtypes = {f.name: str(f.type)
                      for f in con.sql(
                          f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
                          " LIMIT 0").arrow().schema}
        except Exception as e:
            print(f"WARN {name}: dtype check skipped ({e})")
            wtypes = gtypes = {}
        # ns-vs-us timestamps stringize (and driver-hash) alike; ignore
        norm_t = lambda t: t.replace("[ns]", "[us]")
        type_diff = {c: (gtypes[c], wtypes[c]) for c in gtypes
                     if c in wtypes and norm_t(gtypes[c]) != norm_t(wtypes[c])}
        if gcols != wcols:
            print(f"FAIL {name}: cols spark={gcols} oracle={wcols}")
            n_bad += 1
        elif type_diff:
            print(f"FAIL {name}: dtypes (spark, oracle) differ: {type_diff}")
            n_bad += 1
        elif grows != wrows:
            diff = [(a, b) for a, b in zip(grows, wrows) if a != b][:3]
            print(f"FAIL {name}: rows spark={len(grows)} oracle={len(wrows)}"
                  f" first-diffs={diff}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(grows)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failing")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
