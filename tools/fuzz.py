#!/usr/bin/env python3
"""Seeded random-corpus generator for differential fuzzing (round 7).

The dirty corpus (dirty.py) appends hand-picked poison to a clean SF dir;
THIS generates a whole schema-conforming corpus from a seed, so every run
exercises fresh value combinations across all 135 oracle-checked queries.
Any Spark-vs-DuckDB mismatch on a fuzz corpus is a real finding: either a
latent operator/oracle gap (the round-7 dirty extension found 11) or an
undocumented engine-semantics divergence that needs canonicalizing.

Domains deliberately EXCLUDE the documented engine-defined parity
non-goals (BASELINE.md round 7): no ±inf, no |x| >= 1e9 through rounding
folds. NaN, nulls, negative keys, empty/unicode/control strings, dangling
FKs, duplicate texts, nested/invalid JSON and pre-epoch timestamps are
all in scope. PRIMARY keys stay unique per table — the fixture contract
the declared determinism (unique ORDER BY tiebreaks) is built on.

Usage: fuzz.py <seed> <outDir> [emptyTable ...]

Optional trailing args name tables to write with ZERO rows (schema
preserved) — the partially-empty corpus case (one feed dry, others
full) that the all-empty totality spec does not cover: every join,
broadcast, aggregate and sketch must stay total and cross-engine-equal
when one side of it is empty.
"""
import sys, random, datetime
import pyarrow as pa
import pyarrow.parquet as pq

NAN = float("nan")

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = ["ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
           "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ",
           "JAPAN", "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU",
           "CHINA", "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA",
           "UNITED KINGDOM", "UNITED STATES"]
SEGMENTS = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE", ""]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECI", "5-LOW", "", None]
STATUSES = ["O", "F", "P", "", None]
# "ALL" / "(null)" are LITERAL DATA values that collide with the rendered
# subtotal / null-group sentinels of q_rollup / q_cube / q_kmv_distinct —
# the r8 axis that forced those operators to ORDER on (grouping flags,
# raw keys) instead of the rendering
FLAGS = ["A", "N", "R", "", None, "ALL", "(null)"]
LINESTATUS = ["O", "F", None, "ALL"]
ETYPES = ["view", "click", "purchase", "scroll", "xy", "", None,
          "ALL", "(null)"]
LANGS = ["en", "en", "en", "de", "fr", "zh", "multi", "", None]
SOURCES = ["web", "crawl", "books", "", None]
BRANDS = ["Brand#11", "Brand#12", "Brand#23", "Brand#34", "Brand#55"]
TYPES = ["STANDARD ANODIZED TIN", "SMALL PLATED COPPER", "ECONOMY BURNISHED NICKEL"]

# Vocab: ascii words, digits, unicode, punctuation-as-token, a long token
WORDS = ([f"tok{i}" for i in range(80)] +
         ["the", "a", "of", "and", "in", "is", "it", "to",
          "42", "3", "2024", "...", "?!", "(x)", "[y]",
          "café", "中文", "\U0001f600", "مرحبا",
          "naïve", "é", "x" * 40])


def mk_text(rng):
    r = rng.random()
    if r < 0.03:
        return None
    if r < 0.06:
        return ""
    if r < 0.08:
        return " " * rng.randint(1, 5)
    n = rng.randint(1, 200)
    toks = [rng.choice(WORDS) for _ in range(n)]
    return " ".join(toks)


def mk_props(rng):
    r = rng.random()
    if r < 0.15:
        return None
    if r < 0.20:
        return ""
    if r < 0.25:
        return "{not json"
    if r < 0.30:
        return '{"nested":{"a":1}}'      # Spark nulls the map (canonicalized)
    if r < 0.35:
        return '{"f":1.5,"s":"str"}'     # non-integral values, same class
    if r < 0.38:
        # a non-numeric $.k payload: must NULL via try_cast on both engines
        # (an unguarded ANSI cast would kill the whole job on this one row)
        return '{"k":"NaN"}'
    # "k" in the pool so $.k resolves to a real integer on many rows —
    # the q_json/q_cube/q_stats_moments extraction axis is exercised, not
    # just the missing-key NULL path. Values stay integral: fractional k
    # strings are an engine-defined non-goal (DuckDB TRY_CAST rounds '1.5'
    # to BIGINT 2 where Spark's try_cast nulls it).
    ks = rng.sample(["a", "b", "c", "d", "k", "k1", "k2"], rng.randint(1, 4))
    return "{" + ",".join(f'"{k}":{rng.randint(-50, 500)}' for k in ks) + "}"


def mk_ts(rng, lo_year=1960, hi_year=2070):
    if rng.random() < 0.05:
        return None
    y = rng.randint(lo_year, hi_year)
    return datetime.datetime(y, rng.randint(1, 12), rng.randint(1, 28),
                             rng.randint(0, 23), rng.randint(0, 59),
                             rng.randint(0, 59), rng.randint(0, 999999))


def mk_money(rng):
    r = rng.random()
    if r < 0.05:
        return None
    if r < 0.08:
        return NAN
    if r < 0.12:
        return -round(rng.uniform(0, 1e4), 2)
    return round(rng.uniform(0, 1e6), 2)


def main():
    seed, out = int(sys.argv[1]), sys.argv[2]
    empty = set(sys.argv[3:])
    rng = random.Random(seed)
    import os
    os.makedirs(out, exist_ok=True)

    def write(name, cols, schema):
        t = pa.table(cols, schema=schema)
        if name in empty:
            t = t.slice(0, 0)
        pq.write_table(t, f"{out}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows")

    # region / nation: the real dimension values (queries filter on them)
    write("region",
          {"r_regionkey": list(range(5)), "r_name": REGIONS},
          pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))
    write("nation",
          {"n_nationkey": list(range(25)), "n_name": NATIONS,
           "n_regionkey": [i % 5 for i in range(25)]},
          pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                     ("n_regionkey", pa.int32())]))

    ncust, nsupp, npart, nord, nli, nev, ndoc, nvec = \
        300, 40, 150, 1200, 2500, 1500, 800, 300

    custkeys = rng.sample(range(-500, 5000), ncust)
    write("customer",
          {"c_custkey": custkeys,
           "c_name": [f"Customer#{k}" if rng.random() > 0.05 else None
                      for k in custkeys],
           "c_nationkey": [rng.randint(0, 30) for _ in range(ncust)],  # some dangling
           "c_acctbal": [mk_money(rng) for _ in range(ncust)],
           "c_mktsegment": [rng.choice(SEGMENTS) for _ in range(ncust)]},
          pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                     ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                     ("c_mktsegment", pa.string())]))

    suppkeys = rng.sample(range(-100, 1000), nsupp)
    write("supplier",
          {"s_suppkey": suppkeys,
           "s_name": [f"Supplier#{k}" for k in suppkeys],
           "s_nationkey": [rng.randint(0, 30) for _ in range(nsupp)],
           "s_acctbal": [mk_money(rng) for _ in range(nsupp)]},
          pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                     ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]))

    partkeys = rng.sample(range(-200, 3000), npart)
    write("part",
          {"p_partkey": partkeys,
           "p_name": [" ".join(rng.sample(
               ["azure", "blue", "cream", "dim", "forest", "ghost", "honey",
                "ivory", "lime", "misty"], rng.randint(1, 3)))
               for _ in range(npart)],
           "p_brand": [rng.choice(BRANDS) for _ in range(npart)],
           "p_type": [rng.choice(TYPES) for _ in range(npart)],
           "p_size": [rng.randint(-5, 60) for _ in range(npart)],
           "p_retailprice": [mk_money(rng) for _ in range(npart)]},
          pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                     ("p_brand", pa.string()), ("p_type", pa.string()),
                     ("p_size", pa.int32()), ("p_retailprice", pa.float64())]))

    ordkeys = rng.sample(range(-1000, 50000), nord)
    write("orders",
          {"o_orderkey": ordkeys,
           "o_custkey": [rng.choice(custkeys) if rng.random() > 0.1
                         else rng.randint(9000, 9999)  # dangling
                         for _ in range(nord)],
           "o_orderstatus": [rng.choice(STATUSES) for _ in range(nord)],
           "o_totalprice": [mk_money(rng) for _ in range(nord)],
           "o_orderdate": [mk_ts(rng, 1990, 2035) for _ in range(nord)],
           "o_orderpriority": [rng.choice(PRIORITIES) for _ in range(nord)]},
          pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                     ("o_orderstatus", pa.string()),
                     ("o_totalprice", pa.float64()),
                     ("o_orderdate", pa.timestamp("us")),
                     ("o_orderpriority", pa.string())]))

    # lineitem: unique (l_orderkey, l_linenumber)
    li_keys = []
    for ok in ordkeys:
        for ln in range(1, rng.randint(1, 4) + 1):
            li_keys.append((ok, ln))
    rng.shuffle(li_keys)
    li_keys = li_keys[:nli]
    write("lineitem",
          {"l_orderkey": [k[0] for k in li_keys],
           "l_partkey": [rng.choice(partkeys) if rng.random() > 0.05 else None
                         for _ in li_keys],
           "l_suppkey": [rng.choice(suppkeys) if rng.random() > 0.05 else None
                         for _ in li_keys],
           "l_linenumber": [k[1] for k in li_keys],
           "l_quantity": [rng.choice([None, 0.0, -5.0, NAN,
                                      float(rng.randint(1, 50))])
                          if rng.random() < 0.15
                          else float(rng.randint(1, 50)) for _ in li_keys],
           "l_extendedprice": [mk_money(rng) for _ in li_keys],
           "l_discount": [rng.choice([None, 0.0, 1.0, 2.0, NAN,
                                      round(rng.uniform(0, 0.1), 2)])
                          if rng.random() < 0.15
                          else round(rng.uniform(0, 0.1), 2) for _ in li_keys],
           "l_tax": [round(rng.uniform(0, 0.08), 2) if rng.random() > 0.05
                     else NAN for _ in li_keys],
           "l_returnflag": [rng.choice(FLAGS) for _ in li_keys],
           "l_linestatus": [rng.choice(LINESTATUS) for _ in li_keys],
           "l_shipdate": [mk_ts(rng, 1990, 2035) for _ in li_keys]},
          pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                     ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                     ("l_quantity", pa.float64()),
                     ("l_extendedprice", pa.float64()),
                     ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                     ("l_returnflag", pa.string()),
                     ("l_linestatus", pa.string()),
                     ("l_shipdate", pa.timestamp("us"))]))

    evkeys = rng.sample(range(-500, 30000), nev)
    users = list(range(-20, 80))
    write("events",
          {"event_id": evkeys,
           "ts": [mk_ts(rng, 1960, 2070) for _ in range(nev)],
           "user_id": [rng.choice(users) if rng.random() > 0.05 else None
                       for _ in range(nev)],
           "event_type": [rng.choice(ETYPES) for _ in range(nev)],
           "value": [None if rng.random() < 0.08
                     else NAN if rng.random() < 0.05
                     else round(rng.uniform(-100, 500), 3)
                     for _ in range(nev)],
           "props": [mk_props(rng) for _ in range(nev)]},
          pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                     ("user_id", pa.int64()), ("event_type", pa.string()),
                     ("value", pa.float64()), ("props", pa.string())]))

    dockeys = rng.sample(range(-300, 20000), ndoc)
    texts = [mk_text(rng) for _ in range(ndoc)]
    # plant exact-dup and near-dup twins (unique ids, shared text)
    for i in range(0, min(40, ndoc - 1), 2):
        if texts[i] and rng.random() < 0.8:
            texts[i + 1] = texts[i] if rng.random() < 0.5 else \
                texts[i] + " " + rng.choice(WORDS)
    write("documents",
          {"doc_id": dockeys,
           "text": texts,
           "lang": [rng.choice(LANGS) for _ in range(ndoc)],
           "source": [rng.choice(SOURCES) for _ in range(ndoc)],
           "n_chars": [None if t is None or rng.random() < 0.05
                       else len(t) for t in texts]},
          pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                     ("lang", pa.string()), ("source", pa.string()),
                     ("n_chars", pa.int64())]))

    dim = 64
    veckeys = rng.sample(range(-100, 5000), nvec)
    # vec_id=0 must exist: it is the declared ANN/sim probe row
    if 0 not in veckeys:
        veckeys[0] = 0

    def mk_vec(vid):
        r = rng.random()
        if vid == 0:
            return [round(rng.uniform(-1, 1), 4) for _ in range(dim)]
        if r < 0.04:
            return None
        if r < 0.07:
            return []
        if r < 0.09:
            return [1.0, 2.0]  # wrong width
        if r < 0.12:
            v = [round(rng.uniform(-1, 1), 4) for _ in range(dim)]
            v[rng.randint(0, dim - 1)] = NAN
            return v
        if r < 0.14:
            return [0.0] * dim
        mag = rng.choice([1.0, 1.0, 1.0, 1e-6, 1e6])
        return [round(rng.uniform(-1, 1), 4) * mag for _ in range(dim)]

    write("embeddings",
          {"vec_id": veckeys,
           "embedding": [mk_vec(v) for v in veckeys],
           "label": [rng.randint(-1, 5) if rng.random() > 0.05 else None
                     for _ in range(nvec)]},
          pa.schema([("vec_id", pa.int64()),
                     ("embedding", pa.list_(pa.float32())),
                     ("label", pa.int32())]))
    print("done seed", seed)


main()
