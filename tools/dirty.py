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
        ]
    if name == "lineitem":
        return [
            dict(l_orderkey=-1, l_partkey=None, l_suppkey=1, l_linenumber=1, l_quantity=None, l_extendedprice=NAN, l_discount=None, l_tax=0.0, l_returnflag=None, l_linestatus="O", l_shipdate=None),
            dict(l_orderkey=-2, l_partkey=1, l_suppkey=None, l_linenumber=2, l_quantity=-5.0, l_extendedprice=None, l_discount=2.0, l_tax=NAN, l_returnflag="", l_linestatus=None, l_shipdate="2024-01-01T00:00:00"),
        ]
    if name == "events":
        return [
            dict(event_id=-1, ts=None, user_id=None, event_type=None, value=NAN, props="{not json"),
            dict(event_id=-2, ts="2024-01-01T00:00:00", user_id=-9, event_type="", value=None, props=""),
            dict(event_id=-3, ts="2024-01-02T00:00:00", user_id=-9, event_type="view", value=-1.0, props=None),
        ]
    if name == "documents":
        return [
            dict(doc_id=-1, text=None, lang=None, source=None, n_chars=None),
            dict(doc_id=-2, text="", lang="", source="web", n_chars=0),
            dict(doc_id=-3, text="   \n\t  ", lang="en", source="", n_chars=999999),
        ]
    if name == "embeddings":
        dim = 64
        return [
            dict(vec_id=-1, embedding=None, label=None),
            dict(vec_id=-2, embedding=[], label=-1),
            dict(vec_id=-3, embedding=[NAN] * dim, label=0),
            dict(vec_id=-4, embedding=[0.0] * dim, label=0),
            dict(vec_id=-5, embedding=[1.0, 2.0], label=1),  # wrong width
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
