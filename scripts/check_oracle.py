#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For every query dir written by `graft.Verify` under <verifyOutDir>,
runs the matching SQL from oracle_sql.json in DuckDB (tables = the
parquet files in <sfDir>), then compares: column names (sorted),
row count, and a hash over all values with columns sorted by name
and rows sorted canonically. Driver-side python has duckdb+pyarrow.
"""
import sys, json, glob, os, hashlib, math, decimal

def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return repr(int(v)) + ".0"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    # Type-tag decimals: str(Decimal('3')) == str(3), so without the
    # tag a DuckDB HUGEINT/decimal128 column fingerprints identically
    # to a Spark int64 here while the driver's hasher flags it — the
    # exact blindness that shipped r03's three hash-reds. An int-vs-
    # decimal type mismatch must go red locally too.
    if isinstance(v, decimal.Decimal):
        return "dec:" + str(v)
    return str(v)

def table_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in mat:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    import duckdb, pyarrow.parquet as pq
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        # Spark-written tables (e.g. the derived sf1.0) are DIRECTORIES
        # of part files; driver-generated testdata is a single file.
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    qdirs = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    failed = []
    for q in qdirs:
        files = glob.glob(os.path.join(out_dir, q, "*.parquet"))
        if not files:
            print(f"[{q}] NO SPARK OUTPUT"); failed.append(q); continue
        t = pq.read_table(files[0])
        s_cols = list(t.column_names)
        # positional column access: to_pylist() dicts would silently
        # collapse duplicate column names into one value, turning a
        # real schema bug into a false MATCH/MISMATCH
        s_rows = list(zip(*[t.column(i).to_pylist()
                            for i in range(t.num_columns)]))
        if q not in oracles:
            print(f"[{q}] rows-only (no oracle): {len(s_rows)} rows "
                  f"{'OK' if len(s_rows) > 0 else 'EMPTY!'}")
            if len(s_rows) == 0: failed.append(q)
            continue
        try:
            res = con.execute(oracles[q])
            d_cols = [d[0] for d in res.description]
            # Arrow fetch, matching the driver: fetchall() hands HUGEINT
            # over as a plain Python int, which hides decimal128 typing
            # divergences that the driver's Arrow path exposes. Columns
            # are read positionally (see the Spark side above).
            at = res.arrow()
            d_rows = list(zip(*[at.column(i).to_pylist()
                                for i in range(at.num_columns)]))
        except Exception as e:
            print(f"[{q}] ORACLE SQL ERROR: {e}"); failed.append(q); continue
        ok_cols = sorted(s_cols) == sorted(d_cols)
        ok_n = len(s_rows) == len(d_rows)
        ok_hash = ok_cols and ok_n and (
            table_fingerprint(s_cols, s_rows) == table_fingerprint(d_cols, d_rows))
        status = "MATCH" if ok_hash else "MISMATCH"
        print(f"[{q}] {status} spark={len(s_rows)}r duck={len(d_rows)}r "
              f"cols{'=' if ok_cols else '!'} ")
        if not ok_hash:
            failed.append(q)
            if ok_cols and ok_n:
                order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                sm = sorted(tuple(canon(r[i]) for i in order) for r in s_rows)
                do = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                dm = sorted(tuple(canon(r[i]) for i in do) for r in d_rows)
                for a, b in zip(sm, dm):
                    if a != b:
                        print(f"    first diff:\n      spark={a}\n      duck ={b}")
                        break
            elif not ok_cols:
                print(f"    spark cols={sorted(s_cols)}\n    duck  cols={sorted(d_cols)}")
    print(f"\n{len(qdirs) - len(failed)}/{len(qdirs)} queries match")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
