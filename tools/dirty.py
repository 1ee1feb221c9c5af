#!/usr/bin/env python3
"""Build the CORRUPT corpus for the dirty-parity bonus gate, reproducibly.

Round 5 measured cross-engine parity on a damaged corpus built by a
one-off; this script makes that gate replayable: copy a clean SF dir and
append deterministic poison rows to the five payload tables
(orders/lineitem/events/documents/embeddings). Keys are negative so they
never collide with clean keys; every corruption class from the round-5
measurement is represented (nulls in keys/measures/time columns, empty
and whitespace strings, NaN doubles, malformed JSON, empty / null /
wrong-width / NaN vectors).

Usage: dirty.py <cleanSfDir> <outDir>
"""
import sys, os, shutil, math
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

NAN = float("nan")
TS = lambda s: s  # timestamps passed as ISO strings via pa casting


def poison(name, schema):
    """Rows as dicts; None = SQL NULL. Deterministic, no RNG."""
    if name == "orders":
        return [
            dict(o_orderkey=-1, o_custkey=None, o_orderstatus="O", o_totalprice=None, o_orderdate=None, o_orderpriority="1-URGENT"),
            dict(o_orderkey=-2, o_custkey=-7, o_orderstatus=None, o_totalprice=NAN, o_orderdate="2024-01-01T00:00:00", o_orderpriority=""),
            dict(o_orderkey=-3, o_custkey=1, o_orderstatus="", o_totalprice=-1.0, o_orderdate="1970-01-01T00:00:00", o_orderpriority=None),
            # round-7 additions: pre-epoch date (negative epoch micros — floor
            # vs truncate division on time bucketing), zero-width-space and
            # non-ASCII in a grouping column, far-future date, and an EXACT
            # duplicate row pair (same negative key twice — key-uniqueness
            # damage; both engines see identical bytes so parity must hold)
            dict(o_orderkey=-4, o_custkey=-7, o_orderstatus="Ö", o_totalprice=123456.78, o_orderdate="1900-01-01T00:00:00", o_orderpriority="5-L\u200bOW"),
            dict(o_orderkey=-5, o_custkey=-8, o_orderstatus="F", o_totalprice=3.14, o_orderdate="2099-12-31T23:59:59", o_orderpriority="1-URGENT"),
            dict(o_orderkey=-5, o_custkey=-8, o_orderstatus="F", o_totalprice=3.14, o_orderdate="2099-12-31T23:59:59", o_orderpriority="1-URGENT"),
        ]
    if name == "lineitem":
        return [
            dict(l_orderkey=-1, l_partkey=None, l_suppkey=1, l_linenumber=1, l_quantity=None, l_extendedprice=NAN, l_discount=None, l_tax=0.0, l_returnflag=None, l_linestatus="O", l_shipdate=None),
            dict(l_orderkey=-2, l_partkey=1, l_suppkey=None, l_linenumber=2, l_quantity=-5.0, l_extendedprice=None, l_discount=2.0, l_tax=NAN, l_returnflag="", l_linestatus=None, l_shipdate="2024-01-01T00:00:00"),
            # round-7: 100% discount (zero revenue), pre-epoch shipdate, and
            # an exact duplicate composite-key pair
            dict(l_orderkey=-3, l_partkey=-1, l_suppkey=-1, l_linenumber=1, l_quantity=0.0, l_extendedprice=0.0, l_discount=1.0, l_tax=0.0, l_returnflag="R", l_linestatus="F", l_shipdate="1900-01-01T00:00:00"),
            dict(l_orderkey=-4, l_partkey=-2, l_suppkey=-2, l_linenumber=1, l_quantity=7.0, l_extendedprice=700.0, l_discount=0.1, l_tax=0.05, l_returnflag="N", l_linestatus="O", l_shipdate="2024-06-01T00:00:00"),
            dict(l_orderkey=-4, l_partkey=-2, l_suppkey=-2, l_linenumber=1, l_quantity=7.0, l_extendedprice=700.0, l_discount=0.1, l_tax=0.05, l_returnflag="N", l_linestatus="O", l_shipdate="2024-06-01T00:00:00"),
        ]
    if name == "events":
        return [
            dict(event_id=-1, ts=None, user_id=None, event_type=None, value=NAN, props="{not json"),
            dict(event_id=-2, ts="2024-01-01T00:00:00", user_id=-9, event_type="", value=None, props=""),
            dict(event_id=-3, ts="2024-01-02T00:00:00", user_id=-9, event_type="view", value=-1.0, props=None),
            # round-7: pre-epoch event time (negative epoch — window bucket
            # floor-vs-truncate), control char in a grouping column, and a
            # tie-twin pair (distinct ids, identical everything else — pins
            # tie-break determinism on both engines)
            dict(event_id=-4, ts="1900-01-01T00:00:00", user_id=-10, event_type="view", value=0.5, props='{"deep":{"a":[1,2,3]}}'),
            dict(event_id=-5, ts="2024-03-01T00:00:00", user_id=-11, event_type="x\u0007y", value=2.0, props=None),
            dict(event_id=-6, ts="2024-03-01T00:00:00", user_id=-11, event_type="x\u0007y", value=2.0, props=None),
        ]
    if name == "documents":
        return [
            dict(doc_id=-1, text=None, lang=None, source=None, n_chars=None),
            dict(doc_id=-2, text="", lang="", source="web", n_chars=0),
            dict(doc_id=-3, text="   \n\t  ", lang="en", source="", n_chars=999999),
            # round-7: unicode soup (CJK + emoji + RTL + combining), a huge
            # highly-repetitive doc (shingle/dedup stress), an exact-dup twin
            # pair with NEGATIVE ids (poison rows must dedup against each
            # other identically on both engines), and control-char text
            dict(doc_id=-4, text="héllo wörld 中文测试 \U0001f600\U0001f680 مرحبا שלום é", lang="multi", source="web", n_chars=34),
            dict(doc_id=-5, text="ab" * 5000, lang="en", source="web", n_chars=10000),
            dict(doc_id=-6, text="the quick brown fox jumps over the lazy dog again and again", lang="en", source="web", n_chars=60),
            dict(doc_id=-7, text="the quick brown fox jumps over the lazy dog again and again", lang="en", source="crawl", n_chars=60),
            dict(doc_id=-8, text="tab\there\nnewline\rcarriage\x0bvtab", lang="en", source="web", n_chars=31),
        ]
    if name == "embeddings":
        dim = 64
        return [
            dict(vec_id=-1, embedding=None, label=None),
            dict(vec_id=-2, embedding=[], label=-1),
            dict(vec_id=-3, embedding=[NAN] * dim, label=0),
            dict(vec_id=-4, embedding=[0.0] * dim, label=0),
            dict(vec_id=-5, embedding=[1.0, 2.0], label=1),  # wrong width
            # round-7: extreme magnitudes (float32-representable; float→double
            # widening is exact on both engines so dots stay bit-comparable).
            # 1e9, not 1e30: at 1e30 the rounding folds (floor(x*1e6)) hit
            # Spark's long-SATURATING double→long conversion where DuckDB
            # keeps the double — engine-defined like ±inf, so that class
            # lives in the Spark-side totality spec (DirtyInputSpec), not in
            # the cross-engine parity corpus.
            dict(vec_id=-6, embedding=[1.0e9] * dim, label=3),
            dict(vec_id=-7, embedding=[1.0e-30] * dim, label=3),
            dict(vec_id=-8, embedding=[float(i % 2) for i in range(dim)], label=4),
        ]
    return []


def main():
    src, out = sys.argv[1], sys.argv[2]
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        sp, op = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        rows = poison(t, None)
        if not rows:
            shutil.copyfile(sp, op)
            continue
        clean = pq.read_table(sp)
        cols = {}
        for f in clean.schema:
            vals = [r[f.name] for r in rows]
            if pa.types.is_timestamp(f.type):
                import datetime
                vals = [None if v is None else datetime.datetime.fromisoformat(v) for v in vals]
            cols[f.name] = pa.array(vals, type=f.type)
        bad = pa.table(cols, schema=clean.schema)
        pq.write_table(pa.concat_tables([clean, bad]), op)
        print(f"{t}: +{len(rows)} poison rows -> {op}")
    print("done")


main()
