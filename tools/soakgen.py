#!/usr/bin/env python3
"""Generate the 10x soak fixture: sf0.1 replicated with consistent key
offsets so joins stay referentially intact, while text/embedding copies
are perturbed (per-copy per-token prefixes / dimension rotation) so
replicas are look-alike but DISJOINT corpora — near-dup/similarity
output scales ~10x, never quadratically in copies.

Usage: python3 tools/soakgen.py /root/testdata/sf0.1 /tmp/sfsoak [copies]
Tooling only (driver-side python) — the engine under test never sees this.
"""
import sys

import duckdb

SRC, DST = sys.argv[1], sys.argv[2]
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

con = duckdb.connect()
import os
os.makedirs(DST, exist_ok=True)

# key strides: comfortably past each table's sf0.1 key range
K = {"order": 1_000_000, "cust": 1_000_000, "part": 1_000_000,
     "supp": 1_000_000, "nation": 0, "region": 0, "event": 10_000_000,
     "user": 1_000_000, "doc": 1_000_000, "vec": 1_000_000}


def gen(table, select):
    parts = [select.format(i=i) for i in range(COPIES)]
    sql = " UNION ALL ".join(
        f"SELECT * FROM ({p})" for p in parts)
    con.execute(f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


L = f"'{SRC}/lineitem.parquet'"
gen("lineitem", f"""
  SELECT l_orderkey + {{i}} * {K['order']} AS l_orderkey,
    l_partkey + {{i}} * {K['part']} AS l_partkey,
    l_suppkey + {{i}} * {K['supp']} AS l_suppkey,
    l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
    l_returnflag, l_linestatus, l_shipdate FROM {L}""")

O = f"'{SRC}/orders.parquet'"
gen("orders", f"""
  SELECT o_orderkey + {{i}} * {K['order']} AS o_orderkey,
    o_custkey + {{i}} * {K['cust']} AS o_custkey,
    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM {O}""")

gen("customer", f"""
  SELECT c_custkey + {{i}} * {K['cust']} AS c_custkey, * EXCLUDE (c_custkey)
  FROM '{SRC}/customer.parquet'""")
gen("part", f"""
  SELECT p_partkey + {{i}} * {K['part']} AS p_partkey, * EXCLUDE (p_partkey)
  FROM '{SRC}/part.parquet'""")
gen("supplier", f"""
  SELECT s_suppkey + {{i}} * {K['supp']} AS s_suppkey, * EXCLUDE (s_suppkey)
  FROM '{SRC}/supplier.parquet'""")
for t in ("nation", "region"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
                f"'{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

gen("events", f"""
  SELECT event_id + {{i}} * {K['event']} AS event_id, ts,
    user_id + {{i}} * {K['user']} AS user_id, event_type, value, props
  FROM '{SRC}/events.parquet'""")

# per-copy per-token prefix c{i} keeps every gram/fingerprint disjoint
# across copies while lengths and token structure stay look-alike
gen("documents", f"""
  SELECT doc_id + {{i}} * {K['doc']} AS doc_id,
    array_to_string(list_transform(string_split(text, ' '),
      t -> 'c{{i}}' || t), ' ') AS text,
    lang, source, n_chars FROM '{SRC}/documents.parquet'""")

# per-copy dimension rotation: same norms/distances within a copy,
# cross-copy neighbors scrambled
gen("embeddings", f"""
  SELECT vec_id + {{i}} * {K['vec']} AS vec_id,
    list_transform(range(1, len(embedding) + 1),
      j -> embedding[((j - 1 + {{i}}) % len(embedding)) + 1]) AS embedding,
    label FROM '{SRC}/embeddings.parquet'""")
print("done")
