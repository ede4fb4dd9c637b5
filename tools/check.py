#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
compare graft.Verify parquet dumps against DuckDB running oracle_sql.json
on the same testdata. Dev-only tool (duckdb/pyarrow are driver-side deps,
not part of the Scala library).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Float-strict on purpose: the driver hashes typed values, so -0.0
        # and +0.0 MUST hash differently here too (q108 r9 postmortem —
        # normalizing the sign of zero let a DuckDB-round(-0.0) vs
        # Spark-round(+0.0) divergence ship green).
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def rowset(cols, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = list(zip(*[cols[i] for i in order])) if cols else []
    return sorted("|".join(canon(v) for v in r) for r in rows), [names[i] for i in order]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            tbl = pq.read_table(f"{out_dir}/{name}")
            got_names = tbl.column_names
            got_cols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
            got_rows, got_ord = rowset(got_cols, got_names)
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        try:
            cur = con.execute(sql)
            exp_names = [d[0] for d in cur.description]
            exp_tbl = cur.fetch_arrow_table()
            exp_cols = [exp_tbl.column(i).to_pylist() for i in range(exp_tbl.num_columns)]
            exp_rows, exp_ord = rowset(exp_cols, exp_names)
        except Exception as e:
            results[name] = f"ORACLE-FAIL {e}"
            continue
        # Arrow-level type parity: the driver's hasher serializes TYPED
        # values, so a DuckDB-widened type (e.g. windowed sum() -> HUGEINT
        # = arrow decimal128, where Spark emits BIGINT) fails the real gate
        # even when the Python-normalized values match (that was q19 in
        # round 2). The driver DOES normalize within the int family (q12
        # yr int32-vs-int64 hash-passed r2) — compare type FAMILIES.
        def family(t):
            s = str(t)
            if s.startswith(("int", "uint")):
                return "int"
            if s in ("float", "double", "halffloat"):
                return "float"
            if s == "large_string":
                return "string"
            return s
        got_types = {n: family(tbl.schema.field(n).type) for n in got_names}
        exp_types = {d[0]: family(exp_tbl.schema.field(d[0]).type)
                     for d in cur.description}
        type_diff = {n: (got_types[n], exp_types[n]) for n in got_types
                     if n in exp_types and got_types[n] != exp_types[n]}
        if sorted(got_names) != sorted(exp_names):
            results[name] = f"SCHEMA-MISMATCH spark={sorted(got_names)} duck={sorted(exp_names)}"
        elif type_diff:
            results[name] = f"TYPE-MISMATCH {type_diff}"
        elif len(got_rows) != len(exp_rows):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(got_rows)} duck={len(exp_rows)}"
        elif got_rows != exp_rows:
            diff = [(g, e) for g, e in zip(got_rows, exp_rows) if g != e][:3]
            results[name] = f"HASH-MISMATCH rows={len(got_rows)} first_diffs={diff}"
        else:
            results[name] = f"OK rows={len(got_rows)}"
        # Signed-zero tripwire (q108 r9 postmortem): a -0.0 ANYWHERE in
        # either face means a rounded statistic is sitting on the exact
        # divergence class the `+ 0.0` canonicalization exists for — it
        # may agree TODAY (both faces -0.0) and split on the next data
        # regeneration. Warn loudly; the canonicalized faces never emit
        # one.
        def neg_zeros(cols):
            n = 0
            for c in cols:
                for v in c:
                    if isinstance(v, float) and v == 0.0 and \
                            math.copysign(1.0, v) < 0:
                        n += 1
                    elif isinstance(v, list):
                        n += sum(1 for x in v
                                 if isinstance(x, float) and x == 0.0
                                 and math.copysign(1.0, x) < 0)
            return n
        nz_got, nz_exp = neg_zeros(got_cols), neg_zeros(exp_cols)
        if nz_got or nz_exp:
            print(f"SIGNED_ZERO_WARN {name}: -0.0 present "
                  f"(spark={nz_got}, oracle={nz_exp}) — add `+ 0.0` "
                  f"canonicalization to both faces")
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('OK') else 'FAIL'} {name}: {v[:400]}")
    print(f"\n{ok}/{len(results)} queries match")
    return 0 if ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
