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

# Oracle-engine pin: the q_win_frame oracle's MATERIALIZED-CTE +
# null-group-union form works around two MEASURED DuckDB 1.0.0 behaviors
# (CTE-sharing ignoring an IS NOT NULL filter under a window; parallel
# window sort placing a NULL ordering key nondeterministically). A DuckDB
# upgrade could silently shift either; the canary below diagnoses an
# engine change instead of leaving it to be debugged out of a red
# CORRECTNESS artifact.
PINNED_DUCKDB = "1.0.0"

def engine_canary(con):
    warns = []
    if duckdb.__version__ != PINNED_DUCKDB:
        warns.append(f"duckdb {duckdb.__version__} != pinned {PINNED_DUCKDB}"
                     " — oracle workarounds were measured on the pin")
    # The workaround form itself must be run-to-run stable on THIS engine:
    # a windowed running sum over non-null keys unioned with the null-key
    # group carried outside the window (the q_win_frame shape, minimized).
    canary_sql = """
        WITH daily AS MATERIALIZED (SELECT * FROM (VALUES
            (DATE '2024-01-01', 1.0), (DATE '2024-01-02', 2.0),
            (DATE '2024-01-03', 4.0), (NULL, 8.0)) v(day, rev)),
        w AS (
          SELECT day, sum(rev) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
          FROM daily WHERE day IS NOT NULL
          UNION ALL
          SELECT NULL, CAST(NULL AS DOUBLE) FROM daily WHERE day IS NULL)
        SELECT * FROM w ORDER BY day NULLS FIRST"""
    runs = {str(con.sql(canary_sql).fetchall()) for _ in range(5)}
    if len(runs) != 1:
        warns.append(f"win_frame workaround form UNSTABLE across runs: {runs}")
    else:
        expect = "[(None, None), (datetime.date(2024, 1, 1), 1.0), " \
                 "(datetime.date(2024, 1, 2), 3.0), (datetime.date(2024, 1, 3), 7.0)]"
        if runs != {expect}:
            warns.append(f"win_frame workaround values shifted: {runs}")
    # The hazard the workaround exists for: the filtered-CTE window must
    # NOT see the null-key row (4 windowed rows would mean the engine's
    # CTE sharing leaked the filter away again).
    leak = con.sql("""
        WITH daily AS MATERIALIZED (SELECT * FROM (VALUES
            (DATE '2024-01-01', 1.0), (NULL, 8.0)) v(day, rev))
        SELECT count(*) FROM (
          SELECT sum(rev) OVER (ORDER BY day) AS r
          FROM daily WHERE day IS NOT NULL)""").fetchone()[0]
    if leak != 1:
        warns.append(f"MATERIALIZED CTE filter leak: windowed {leak} rows, expected 1")
    for w in warns:
        print(f"CANARY {w}")
    return warns

def main():
    if "--selftest" in sys.argv:
        selftest()
        sys.exit(0)
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    engine_canary(con)
    for t in TABLES:
        # the fixture tables are single parquet FILES, but Spark-written
        # corpora (tools/GrowCorpus shards) are DIRECTORIES of part files
        # — glob those so DuckDB sees the same rows Spark does
        src = f"{sfdir}/{t}.parquet"
        pat = f"{src}/*.parquet" if os.path.isdir(src) else src
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    nfail = 0
    nok = 0
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
        # Multi-cell emission (r15, r14 ADVICE): the old compare broke at
        # the FIRST differing cell, so the grown-gate classifier's
        # "every FAIL cell matches the class signature" condition was a
        # one-cell check — a mixed-cause failure whose first diff happened
        # to look like the expected class would green-gate. Scan ALL
        # columns, emit up to MAX_CELLS FAIL lines (one per cell), and a
        # NOTE line with the true total so the classifier can refuse to
        # classify a capped (total > shown) failure.
        MAX_CELLS = 64
        cells = []      # (col, row, spark, duck), at most MAX_CELLS + 1
        capped = False
        for c in scols:
            sv = [normalize(x) for x in st.column(c).to_pylist()]
            dv = [normalize(x) for x in dt.column(c).to_pylist()]
            if sv == dv:
                continue
            for i, (a, b) in enumerate(zip(sv, dv)):
                if a != b:
                    if len(cells) >= MAX_CELLS:
                        capped = True
                        break
                    cells.append((c, i, a, b))
            if capped:
                break
        if cells:
            for c, i, a, b in cells:
                print(f"FAIL {name}: col={c} row={i} spark={a!r} duck={b!r}")
            print(f"NOTE {name}: {len(cells)}{'+' if capped else ''}"
                  f" mismatched cells ({'capped at' if capped else 'all'}"
                  f" {MAX_CELLS if capped else len(cells)} shown)")
            nfail += 1
        else:
            print(f"OK   {name} ({st.num_rows} rows)")
            nok += 1
    # queries without oracle: rows-only check
    for path in sorted(glob.glob(f"{outdir}/*")):
        name = os.path.basename(path)
        if name in oracle or not os.path.isdir(path):
            continue
        if only and name not in only:
            continue
        n = pq.read_table(path).num_rows
        print(f"{'OK  ' if n > 0 else 'FAIL'} {name} (no oracle, {n} rows)")
        if n > 0:
            nok += 1
        else:
            nfail += 1
    if nok == 0 and nfail == 0:
        # an empty compare is a broken harness, never a pass (a crashed
        # Verify or a bad outdir would otherwise sail through as "0 FAIL")
        print("FAIL <harness>: zero queries compared")
        nfail = 1
    sys.exit(nfail)

main()
