#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: check.py <sfDir> <outDir> [query ...]

Reads <outDir>/<name> parquet (Spark output) and runs <outDir>/oracle_sql.json
[name] in DuckDB with views over <sfDir>/*.parquet, then compares:
  - column names (sorted),
  - arrow column TYPES, canonicalized but otherwise strict (decimal != int64 !=
    double — the driver hashes raw values, so a type drift is a hash mismatch
    even when every value coerces equal; round 1 shipped 5 of these),
  - row count,
  - cell-by-cell exact values (dates/timestamps normalized to isoformat).
Exit code = number of failing queries.
"""
import sys, json, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon_type(t):
    """Canonicalize representation-only arrow differences (large_* offsets,
    timestamp unit/zone, date width, decimal PRECISION — engines widen
    sum/avg precision differently while the driver's value hash normalizes
    to float) while keeping the logical type strict (decimal != int64 !=
    double; decimal SCALE strict). Walks the type structurally so struct
    FIELD NAMES are never rewritten — a field literally named
    "large_string" survives (the old regex canonicalizer rewrote it)."""
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_decimal(t):
        return f"decimal(scale={t.scale})"
    if pa.types.is_large_list(t) or pa.types.is_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_map(t):
        return f"map<{canon_type(t.key_type)}, {canon_type(t.item_type)}>"
    if pa.types.is_struct(t):
        return "struct<" + ", ".join(
            f"{t.field(i).name}: {canon_type(t.field(i).type)}"
            for i in range(t.num_fields)) + ">"
    return str(t)

def selftest():
    # decimal: precision widens freely, scale stays strict
    assert canon_type(pa.decimal128(25, 2)) == canon_type(pa.decimal128(38, 2))
    assert canon_type(pa.decimal128(38, 2)) != canon_type(pa.decimal128(38, 3))
    assert canon_type(pa.decimal128(38, 2)) != canon_type(pa.int64())
    # large_* offsets are representation-only
    assert canon_type(pa.large_string()) == canon_type(pa.string())
    assert canon_type(pa.large_list(pa.int64())) == canon_type(pa.list_(pa.int64()))
    # struct FIELD names are data, not types: never rewritten
    assert canon_type(pa.struct([("large_string", pa.int64())])) == \
        "struct<large_string: int64>"
    assert canon_type(pa.struct([("large_string", pa.large_string())])) == \
        canon_type(pa.struct([("large_string", pa.string())]))
    assert canon_type(pa.struct([("large_stringy", pa.int64())])) == \
        "struct<large_stringy: int64>"
    # timestamp unit/zone and date width are representation-only
    assert canon_type(pa.timestamp("us")) == canon_type(pa.timestamp("ns", tz="UTC"))
    assert canon_type(pa.date32()) == canon_type(pa.date64())
    print("selftest OK")

def normalize(v):
    import datetime, decimal, math
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v

def main():
    if "--selftest" in sys.argv:
        selftest()
        sys.exit(0)
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    nfail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        path = f"{outdir}/{name}"
        if not os.path.isdir(path):
            print(f"FAIL {name}: no spark output at {path}")
            nfail += 1
            continue
        try:
            st = pq.read_table(path)
            dt = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            nfail += 1
            continue
        scols, dcols = sorted(st.column_names), sorted(dt.column_names)
        if scols != dcols:
            print(f"FAIL {name}: cols spark={scols} duck={dcols}")
            nfail += 1
            continue
        tbad = None
        for c in scols:
            sty = canon_type(st.schema.field(c).type)
            dty = canon_type(dt.schema.field(c).type)
            if sty != dty:
                tbad = (c, sty, dty)
                break
        if tbad:
            c, sty, dty = tbad
            print(f"FAIL {name}: type col={c} spark={sty} duck={dty}")
            nfail += 1
            continue
        if st.num_rows != dt.num_rows:
            print(f"FAIL {name}: rows spark={st.num_rows} duck={dt.num_rows}")
            nfail += 1
            continue
        bad = None
        for c in scols:
            sv = [normalize(x) for x in st.column(c).to_pylist()]
            dv = [normalize(x) for x in dt.column(c).to_pylist()]
            if sv != dv:
                for i, (a, b) in enumerate(zip(sv, dv)):
                    if a != b:
                        bad = (c, i, a, b)
                        break
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i} spark={a!r} duck={b!r}")
            nfail += 1
        else:
            print(f"OK   {name} ({st.num_rows} rows)")
    # queries without oracle: rows-only check
    for path in sorted(glob.glob(f"{outdir}/*")):
        name = os.path.basename(path)
        if name in oracle or not os.path.isdir(path):
            continue
        if only and name not in only:
            continue
        n = pq.read_table(path).num_rows
        print(f"{'OK  ' if n > 0 else 'FAIL'} {name} (no oracle, {n} rows)")
        if n == 0:
            nfail += 1
    sys.exit(nfail)

main()
