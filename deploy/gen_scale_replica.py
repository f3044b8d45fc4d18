"""Scale-replica generator for the SCALE.md scaling experiment.

Builds a k-times replica of an sf directory by unioning k key-shifted
copies of every fact table, preserving referential integrity (all
foreign keys shift by the same stride as their primary) and the modulo
sampling used by registered queries (the stride is divisible by every
sampling modulus in the engine, so each copy contributes the same
relative sample). Dimension tables (region, nation) and group-label
columns (lang, source, label, event_type) are NOT multiplied — group
cardinality staying constant while facts grow is exactly what a bigger
crawl looks like.

Document text gets a per-copy alphabetic token suffix (copy 3's "spark"
becomes "sparkqcd"): the suffix fuses into the token under the engine's
``[^\\w]+`` tokenizer, so within-copy duplicate/near-dup structure is
preserved exactly while cross-copy token sets are disjoint — without
this, replicating 5k documents k times would hand the near-dup pipeline
k^2 cross-copy duplicate pairs that no natural corpus has, and the
measurement would grade the workload, not the operator. Embedding
vectors replicate exactly (duplicate neighbors are legal ANN workload;
ties break on id).

Usage: python deploy/gen_scale_replica.py <k> <out_dir> [src_sf_dir]
"""

from __future__ import annotations

import json
import string
import sys
from pathlib import Path

import duckdb

# Divisible by 1..10, 12, 14, 15, 16, 18, 20 — covers every `% MOD`
# sampling constant in the engine, so key shifts never skew a sample.
STRIDE = 5_040_000

DIMS = ("region", "nation")


def _copy_sql(table: str, i: int, src: str) -> str:
    # Alphabetic (fuses under \w+), positional base-26 (a=0) so any copy
    # index works: i=0→"qca", 25→"qcz", 26→"qcba", 675→"qczz",
    # 701→"qcbaz", 702→"qcbba".
    digits, n = "", i
    while True:
        n, r = divmod(n, 26)
        digits = string.ascii_lowercase[r] + digits
        if n == 0:
            break
    suf = "qc" + digits
    s = i * STRIDE
    base = f"SELECT * FROM '{src}/{table}.parquet'"
    if i == 0:
        return base
    if table == "customer":
        return (
            f"SELECT c_custkey + {s} AS c_custkey, c_name, c_nationkey, "
            f"c_acctbal, c_mktsegment FROM '{src}/customer.parquet'"
        )
    if table == "supplier":
        return (
            f"SELECT s_suppkey + {s} AS s_suppkey, s_name, s_nationkey, "
            f"s_acctbal FROM '{src}/supplier.parquet'"
        )
    if table == "part":
        return (
            f"SELECT p_partkey + {s} AS p_partkey, p_name, p_brand, p_type, "
            f"p_size, p_retailprice FROM '{src}/part.parquet'"
        )
    if table == "orders":
        return (
            f"SELECT o_orderkey + {s} AS o_orderkey, o_custkey + {s} AS o_custkey, "
            f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
            f"FROM '{src}/orders.parquet'"
        )
    if table == "lineitem":
        return (
            f"SELECT l_orderkey + {s} AS l_orderkey, l_partkey + {s} AS l_partkey, "
            f"l_suppkey + {s} AS l_suppkey, l_linenumber, l_quantity, "
            f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
            f"l_shipdate FROM '{src}/lineitem.parquet'"
        )
    if table == "events":
        return (
            f"SELECT event_id + {s} AS event_id, ts, user_id + {s} AS user_id, "
            f"event_type, value, props FROM '{src}/events.parquet'"
        )
    if table == "documents":
        return (
            f"SELECT doc_id + {s} AS doc_id, "
            f"array_to_string(list_transform(string_split(text, ' '), "
            f"x -> x || '{suf}'), ' ') AS text, "
            f"lang, source, "
            f"CAST(length(array_to_string(list_transform(string_split(text, ' '), "
            f"x -> x || '{suf}'), ' ')) AS BIGINT) AS n_chars "
            f"FROM '{src}/documents.parquet'"
        )
    if table == "embeddings":
        return (
            f"SELECT vec_id + {s} AS vec_id, embedding, label "
            f"FROM '{src}/embeddings.parquet'"
        )
    raise ValueError(table)


def build(k: int, out_dir: str, src: str = "/root/testdata/sf0.1") -> None:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    for t in tables:
        if t in DIMS:
            sql = _copy_sql(t, 0, src)
        else:
            sql = " UNION ALL ".join(_copy_sql(t, i, src) for i in range(k))
        con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}", flush=True)
    # Stamp the replica factor so consumers (sweep_scale.py) can detect a
    # stale directory built with a different k or source and refuse to
    # reuse it — a 2x replica silently reused for a --k 8 sweep would
    # make every ratio (and every flag) wrong.
    (out / "replica_meta.json").write_text(
        json.dumps({"k": k, "src": str(src), "stride": STRIDE}) + "\n"
    )


if __name__ == "__main__":
    k = int(sys.argv[1])
    out_dir = sys.argv[2]
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    build(k, out_dir, src)
