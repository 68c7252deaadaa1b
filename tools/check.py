#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the sf_dir
tables, and compares: schema (column names), row count, and an
order-insensitive hash of values (columns sorted by name, rows sorted).
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    names = sorted([d for d in os.listdir(outdir)
                    if os.path.isdir(os.path.join(outdir, d))])
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no result parquet"); n_fail += 1; continue
        res = pq.read_table(files[0])
        if name not in oracle:
            print(f"ROWS  {name}: rows={res.num_rows} (no oracle)")
            n_noracle += 1
            if res.num_rows == 0:
                print(f"  WARN {name}: rows-only query returned 0 rows")
            if name == "q161_compression_ratio":
                # second-ENGINE replay for the deflate primitive: Python's
                # zlib (raw deflate, level 6, wbits=-15) replays the JVM
                # Deflater(6, nowrap) byte lengths — both wrap zlib with
                # default memLevel/strategy, verified byte-identical here.
                # This is the one rows-only entry whose cross-check was
                # previously in-JVM only (DeflateSpec).
                import zlib
                docs = dict(con.execute(
                    "SELECT doc_id, text FROM documents").fetchall())
                mism = 0
                for doc_id, ulen, dlen, ppm, keep in zip(
                        *[res.column(c).to_pylist() for c in
                          ["doc_id", "utf8_len", "deflate_len",
                           "ratio_ppm", "keep"]]):
                    b = docs[doc_id].encode("utf-8")
                    co = zlib.compressobj(6, zlib.DEFLATED, -15)
                    z = len(co.compress(b) + co.flush())
                    ok = (len(b) == ulen and z == dlen
                          and (None if len(b) == 0 else
                               z * 1000000 // len(b)) == ppm
                          and (ppm is not None
                               and 120000 <= ppm <= 900000) == keep)
                    if not ok:
                        mism += 1
                if mism:
                    print(f"FAIL  {name}: zlib replay mismatches={mism}")
                    n_fail += 1
                    n_noracle -= 1
                else:
                    print(f"  OK  {name}: zlib replay matched all "
                          f"{res.num_rows} rows byte-for-byte")
            continue
        try:
            ora = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        rcols, ocols = sorted(res.column_names), sorted(ora.column_names)
        if rcols != ocols:
            print(f"FAIL  {name}: columns {rcols} vs oracle {ocols}"); n_fail += 1; continue
        for c in rcols:
            rt, ot = res.schema.field(c).type, ora.schema.field(c).type
            if str(rt) != str(ot):
                print(f"  TYPE? {name}.{c}: spark={rt} oracle={ot}")
        res_s = res.select(rcols); ora_s = ora.select(ocols)
        if res.num_rows != ora.num_rows:
            print(f"FAIL  {name}: rows {res.num_rows} vs oracle {ora.num_rows}"); n_fail += 1; continue
        a = canon([tuple(d[c] for c in rcols) for d in res_s.to_pylist()])
        b = canon([tuple(d[c] for c in ocols) for d in ora_s.to_pylist()])
        if a == b:
            print(f"PASS  {name}: rows={res.num_rows}"); n_pass += 1
        else:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {diff}"); n_fail += 1
    print(f"\n== pass={n_pass} fail={n_fail} rows_only={n_noracle} ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
