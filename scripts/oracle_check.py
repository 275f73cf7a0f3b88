#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet tables and compare rows / schema /
value-hash per query. Usage:
    python3 scripts/oracle_check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)

def table_hash(cols, rows):
    # sort columns by name, then rows lexicographically, then hash values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    keyed = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in keyed:
        h.update("\x1f".join(row).encode() + b"\x1e")
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    fails = 0
    names = sorted(os.listdir(out_dir))
    for name in names:
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        sq = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')")
        scols = [c[0] for c in sq.description]
        srows = sq.fetchall()
        if name not in oracles:
            print(f"{name:28s} NO-ORACLE rows={len(srows)}")
            continue
        try:
            oq = con.execute(oracles[name])
            ocols = [c[0] for c in oq.description]
            orows = oq.fetchall()
        except Exception as e:
            print(f"{name:28s} ORACLE-ERR {e}")
            fails += 1
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = schema_ok and table_hash(scols, srows) == table_hash(ocols, orows)
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        print(f"{name:28s} {status} rows={len(srows)}/{len(orows)} "
              f"schema={schema_ok} hash={hash_ok}")
        if status == "FAIL":
            fails += 1
            if not schema_ok:
                print(f"    spark cols:  {sorted(scols)}")
                print(f"    oracle cols: {sorted(ocols)}")
            elif rows_ok and len(srows) > 0:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sk = sorted(tuple(norm(r[i]) for i in order) for r in srows)
                oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ok_ = sorted(tuple(norm(r[i]) for i in oo) for r in orows)
                for a, b in zip(sk, ok_):
                    if a != b:
                        print(f"    first diff:\n      spark : {a}\n      oracle: {b}")
                        break
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
