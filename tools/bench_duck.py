#!/usr/bin/env python3
"""DuckDB comparator for graft.Bench (builder tooling, not shipped library).

Times every oracle SQL query (the exact SQL graft's correctness gate runs)
in DuckDB on the same parquet tables, with the same methodology as
graft.Bench: one warm run, three timed steady-state runs, a >3x spread guard
that buys bounded extra runs, steal-jiffy accounting from /proc/stat, and
slow-sample dropping ONLY when the host accounted steal during that query's
window. Emits one JSON line in the same shape as graft.Bench (plus
"engine":"duckdb"), so the README's engine comparison is reproducible from
the repo instead of resting on an unrecorded shell session.

Each query materializes into a DuckDB temp table — the closest analogue of
Spark's noop sink: full execution, native-format materialization, no
client-side row conversion measured.

Usage (run back-to-back with graft.Bench in one quiet window):

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Bench"
    python3 tools/bench_duck.py /root/testdata/sf0.1 /tmp/graft_verify/oracle_sql.json

Writes bench_duck_last.json, and if bench_last.json (graft's record) exists,
also bench_compare.json with both totals and the shared-query ratio.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
THREADS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def steal_jiffies():
    try:
        with open("/proc/stat") as f:
            for line in f:
                if line.startswith("cpu "):
                    parts = line.split()
                    return int(parts[8]) if len(parts) > 8 else 0
    except OSError:
        pass
    return 0


def calibrate():
    """Fixed single-threaded integer-hash workload, timed at window start
    and end. Normalizes THIS harness's windows across time (steal jiffies
    miss the uniform-drift contention class; see the r12 pair-B record) —
    not comparable to graft.Bench's own probe, which serves the same
    purpose for its windows."""
    acc = 0x9E3779B97F4A7C15
    t0 = time.monotonic()
    for i in range(20000000):
        acc ^= i
        acc = (acc * 0xFF51AFD7ED558CCD) & 0xFFFFFFFFFFFFFFFF
        acc ^= acc >> 33
    return time.monotonic() - t0


def main(sf_dir, oracle_json, repo_dir="."):
    con = duckdb.connect()
    con.execute(f"SET threads TO {THREADS}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(oracle_json))

    cal_start = calibrate()
    steal_start = steal_jiffies()
    results = {}
    for name in sorted(oracles):
        sql = oracles[name]

        def once():
            t0 = time.monotonic()
            try:
                con.execute(f"CREATE OR REPLACE TEMP TABLE __bench AS {sql}")
                dt = time.monotonic() - t0
            except Exception as e:  # noqa: BLE001 — report, keep benching
                print(f"[bench_duck] {name} failed: {e}", file=sys.stderr)
                return None
            finally:
                con.execute("DROP TABLE IF EXISTS __bench")
            return dt

        s0 = steal_jiffies()
        once()  # warm: buffer-pool + catalog + plan cache for this shape
        runs = sorted(r for r in (once(), once(), once()) if r is not None)
        retries = 0
        while runs and runs[: 3][-1] > runs[0] * 3.0 and retries < 3:
            retries += 1
            print(f"[bench_duck] {name}: spread {runs[0]:.2f}..{runs[:3][-1]:.2f} s,"
                  f" retry {retries}", file=sys.stderr)
            r = once()
            if r is not None:
                runs = sorted(runs + [r])
        stolen = steal_jiffies() - s0
        if stolen > 0:
            print(f"[bench_duck] {name}: {stolen} steal jiffies during runs",
                  file=sys.stderr)
        # same proportional steal gate as graft.Bench: drop slow samples only
        # when accounted steal CPU-time (10 ms/jiffy) covers >= 1/4 of their
        # wall-clock excess over the fastest run
        judged = runs
        dropped = runs[3:]
        excess = sum(r - runs[0] for r in dropped) if runs else 0.0
        if dropped and stolen * 0.01 >= 0.25 * excess:
            judged = runs[:3]
            print(f"[bench_duck] {name}: dropping {len(dropped)} slow sample(s) "
                  f"{', '.join(f'{d:.2f}' for d in dropped)} s "
                  f"({stolen} steal jiffies covers {stolen * 0.01:.2f} s "
                  f"of {excess:.2f} s excess)", file=sys.stderr)
        if judged:
            median = judged[(len(judged) - 1) // 2]
            results[name] = (median, judged[0], judged[-1] - judged[0])
        else:
            results[name] = (-1.0, -1.0, -1.0)
    steal_total = steal_jiffies() - steal_start
    cal_end = calibrate()

    def jmap(i):
        return "{" + ",".join(f'"{k}":{v[i]}' for k, v in results.items()) + "}"

    total = sum(v[0] for v in results.values() if v[0] >= 0)
    line = (f'{{"engine":"duckdb","metric":"total","value":{total},"unit":"sec",'
            f'"queries":{jmap(0)},"queries_min":{jmap(1)},'
            f'"queries_spread":{jmap(2)},"steal_jiffies":{steal_total},'
            f'"cal_start_sec":{cal_start:.3f},"cal_end_sec":{cal_end:.3f},'
            f'"sf":"{sf_dir}"}}')
    print(line)
    with open(os.path.join(repo_dir, "bench_duck_last.json"), "w") as f:
        f.write(line + "\n")

    graft_path = os.path.join(repo_dir, "bench_last.json")
    if os.path.exists(graft_path):
        graft = json.load(open(graft_path))
        duck = json.loads(line)
        # compare ONLY queries where BOTH engines produced a median: a query
        # that failed in one engine (median -1) must drop from both totals,
        # or its surviving-engine time skews the ratio toward the failing one
        both = sorted(set(graft["queries"]) & set(duck["queries"]))
        shared = [q for q in both
                  if graft["queries"][q] >= 0 and duck["queries"][q] >= 0]
        failed_one = sorted(set(both) - set(shared))
        g_shared = sum(graft["queries"][q] for q in shared)
        d_shared = sum(duck["queries"][q] for q in shared)
        compare = {
            "shared_queries": len(shared),
            "graft_total_sec": round(g_shared, 3),
            "duckdb_total_sec": round(d_shared, 3),
            "graft_over_duckdb": round(g_shared / d_shared, 4) if d_shared else None,
            "graft_steal_jiffies": graft.get("steal_jiffies"),
            "duckdb_steal_jiffies": duck["steal_jiffies"],
            "failed_in_one_engine": failed_one,
            "graft_only": sorted(set(graft["queries"]) - set(duck["queries"])),
            "duckdb_only": sorted(set(duck["queries"]) - set(graft["queries"])),
            "sf": sf_dir,
        }
        with open(os.path.join(repo_dir, "bench_compare.json"), "w") as f:
            json.dump(compare, f, indent=1)
        print(f"[bench_duck] shared {len(shared)} queries: graft {g_shared:.1f}s "
              f"vs duckdb {d_shared:.1f}s (ratio {compare['graft_over_duckdb']})",
              file=sys.stderr)


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2], *sys.argv[3:])
