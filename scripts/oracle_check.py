#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 scripts/oracle_check.py <sf_dir> <verify_out_dir>

For each query dumped by graft.Verify: load the Spark parquet result,
run the oracle SQL in DuckDB over views named for the sf_dir tables,
sort columns by name, sort rows, and compare values exactly.

Comparison goes THROUGH PANDAS (.df() + sort_values) deliberately, to
be dtype-faithful to the driver's gate: DuckDB HUGEINT → float64
("99.0") mismatches Spark int64 ("99"), and list-valued cells crash
sort_values — both real driver failures a fetchall()-string compare
masks (round-5 lesson: q_outlier_fence, text_postings).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rel):
    df = rel.df()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                v = repr(v)
            vals.append(str(v))
        out.append("\x00".join(vals))
    out.sort()
    return list(df.columns), out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            g_cols, g_rows = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
            e_cols, e_rows = canon(con.sql(sql))
            if g_cols != e_cols:
                print(f"FAIL {name}: columns {g_cols} != {e_cols}")
                n_fail += 1
            elif len(g_rows) != len(e_rows):
                print(f"FAIL {name}: rows {len(g_rows)} != {len(e_rows)}")
                n_fail += 1
            elif g_rows != e_rows:
                bad = next(i for i, (a, b) in enumerate(zip(g_rows, e_rows)) if a != b)
                print(f"FAIL {name}: value mismatch at sorted row {bad}:")
                print(f"   spark: {g_rows[bad][:300]}")
                print(f"   duck : {e_rows[bad][:300]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g_rows)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
