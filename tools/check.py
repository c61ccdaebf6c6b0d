#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (builder tooling only, not
part of the shipped library).

Runs DuckDB on the oracle SQL dumped by graft.Verify and compares against the
parquet results Spark wrote. Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"
    python3 tools/check.py /root/testdata/sf0.01 /tmp/graft_verify
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision: we target bitwise equality
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir, record_json=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    record = {}
    for name, sql in sorted(oracles.items()):
        record[name] = "fail"
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})")
            n_fail += 1
            continue
        try:
            # Lint: HUGEINT/DECIMAL outputs render differently via Arrow/pandas
            # (int128 -> decimal128/float64) than via fetchall -> Python int, so
            # a driver that fetches through Arrow would hash-mismatch even when
            # this script passes. Uncast integer SUM() is the usual culprit.
            for cname, ctype, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
                if "HUGEINT" in ctype.upper() or "DECIMAL" in ctype.upper():
                    print(f"WARN {name}: oracle column {cname} has DuckDB type "
                          f"{ctype} — cast it (driver Arrow path renders these "
                          f"differently than Spark int64/double)")
            duck = con.execute(sql)
            duck_cols = [d[0] for d in duck.description]
            duck_rows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        s_cols = spark_tbl.column_names
        s_rows = list(zip(*[spark_tbl.column(c).to_pylist() for c in s_cols])) \
            if spark_tbl.num_rows else []
        if sorted(s_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns differ spark={sorted(s_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        hs = table_hash(s_rows, s_cols)
        hd = table_hash(duck_rows, duck_cols)
        if hs == hd:
            print(f"PASS {name} ({len(s_rows)} rows)")
            record[name] = f"pass ({len(s_rows)} rows)"
            n_pass += 1
        else:
            print(f"FAIL {name}: hash mismatch rows spark={len(s_rows)} duck={len(duck_rows)}")
            # show first diffs
            order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            order_d = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
            ls = sorted("\x01".join(canon(r[i]) for i in order_s) for r in s_rows)
            ld = sorted("\x01".join(canon(r[i]) for i in order_d) for r in duck_rows)
            shown = 0
            for a, b in zip(ls, ld):
                if a != b and shown < 3:
                    print(f"  spark: {a[:300]}")
                    print(f"  duck : {b[:300]}")
                    shown += 1
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    if record_json:  # committed per-round record (e.g. CORRECTNESS_sf01.json)
        with open(record_json, "w") as f:
            json.dump({"sf": sf_dir, "passed": n_pass, "failed": n_fail,
                       "queries": record}, f, indent=1, sort_keys=True)
            f.write("\n")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *sys.argv[3:])
