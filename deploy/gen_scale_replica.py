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

Document text has TWO replica modes (r10 verdict item 3):

- ``shared`` (default): copy i rewrites each space-token through a
  per-copy ROTATION of the base vocabulary (a bijection vocab->vocab,
  shift i*7919 mod V). Documents grow k-fold while the vocabulary
  saturates at the base V — the real corpus-growth shape (Heaps' law
  flattens; crawls add documents, not proportional vocabulary). The
  bijection preserves within-copy duplicate/near-dup structure exactly
  (if docs a,b were near-dups, their images under the same token map
  are too), while a copy's image of a doc shares tokens with the base
  doc only coincidentally — no artificial k^2 cross-copy duplicate
  pairs. This is the sweep default: it measures the operator under
  honest growth.
- ``disjoint``: the historical mode — a per-copy alphabetic token
  suffix (copy 3's "spark" becomes "sparkqcd") fuses into the token
  under the engine's ``[^\\w]+`` tokenizer, so cross-copy token sets
  are disjoint and vocabulary grows LINEARLY in k. Kept as the
  adversarial-vocabulary stressor (it is what exposed the flagship's
  dense-path vocab ceiling), not as the default: linear vocabulary
  growth is a replica artifact that graded the workload, not the
  operator (the r10 EXPLAINED entry).

Embedding vectors replicate exactly in both modes (duplicate neighbors
are legal ANN workload; ties break on id).

Usage: python deploy/gen_scale_replica.py <k> <out_dir> [src_sf_dir]
                                          [--mode shared|disjoint]
"""

from __future__ import annotations

import json
import string
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


def _shared_vocab_documents_sql(k: int, src: str, con) -> str:
    """UNION ALL over k copies where copy i maps every space-token through
    a rotation of the base vocabulary.

    The rotation table is materialized as a DuckDB temp table ``vmap``
    (copy_i, src_tok, dst_tok) — V*k rows, tiny — and each copy's text is
    rebuilt by unnest-with-position, join, re-aggregate ordered by
    position. Copy 0 is the identity (base rows pass through verbatim).
    """
    vocab = [
        r[0]
        for r in con.execute(
            f"""SELECT DISTINCT t.tok
                FROM (SELECT string_split(text, ' ') AS l
                      FROM '{src}/documents.parquet'),
                     unnest(l) AS t(tok)
                ORDER BY 1"""
        ).fetchall()
    ]
    v = len(vocab)
    # Only v-1 distinct non-identity rotations exist, so shifts MUST be
    # pairwise distinct or two copies get byte-identical cross-copy text —
    # exactly the k^2 duplicate artifact shared mode exists to avoid
    # (ADVICE r11). Unexercised at the sweep's k<=8 over the fixture's
    # v=31, but fail loudly instead of generating a degenerate replica.
    shifts = {}
    for i in range(1, k):
        shift = (i * 7919) % v or 1  # nonzero: copy i is never the identity
        if shift in shifts:
            raise SystemExit(
                f"shared-mode rotation collision: copies {shifts[shift]} and "
                f"{i} both get shift {shift} over a {v}-token vocabulary "
                f"(only {v - 1} non-identity rotations exist); use k <= {v} "
                "or the disjoint mode for larger replicas"
            )
        shifts[shift] = i
    rows = []
    for i in range(1, k):
        shift = (i * 7919) % v or 1
        for r, tok in enumerate(vocab):
            rows.append((i, tok, vocab[(r + shift) % v]))
    con.execute("CREATE OR REPLACE TEMP TABLE vmap(copy_i BIGINT, src_tok VARCHAR, dst_tok VARCHAR)")
    if rows:
        con.executemany("INSERT INTO vmap VALUES (?, ?, ?)", rows)
    copies = [f"SELECT * FROM '{src}/documents.parquet'"]
    for i in range(1, k):
        s = i * STRIDE
        copies.append(
            f"""
            SELECT doc_id + {s} AS doc_id, text, lang, source,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM (
                SELECT p.doc_id,
                       string_agg(m.dst_tok, ' ' ORDER BY p.pos) AS text,
                       any_value(p.lang) AS lang,
                       any_value(p.source) AS source
                FROM (
                    SELECT d.doc_id, d.lang, d.source,
                           g.pos, d.l[g.pos] AS tok
                    FROM (SELECT doc_id, lang, source,
                                 string_split(text, ' ') AS l
                          FROM '{src}/documents.parquet') d,
                         LATERAL (SELECT unnest(generate_series(1, len(d.l))) AS pos) g
                ) p
                JOIN vmap m ON m.copy_i = {i} AND m.src_tok = p.tok
                GROUP BY p.doc_id
            )
            """
        )
    return " UNION ALL ".join(copies)


def build(
    k: int,
    out_dir: str,
    src: str = "/root/testdata/sf0.1",
    mode: str = "shared",
) -> None:
    if mode not in ("shared", "disjoint"):
        raise ValueError(f"mode must be shared|disjoint, got {mode!r}")
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
        elif t == "documents" and mode == "shared":
            sql = _shared_vocab_documents_sql(k, src, con)
        else:
            sql = " UNION ALL ".join(_copy_sql(t, i, src) for i in range(k))
        con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}", flush=True)
    # Stamp the replica factor AND mode so consumers (sweep_scale.py) can
    # detect a stale directory built with a different k, source, or text
    # mode and refuse to reuse it — a 2x replica silently reused for a
    # --k 8 sweep (or a disjoint dir reused for a shared sweep) would
    # make every ratio (and every flag) wrong.
    (out / "replica_meta.json").write_text(
        json.dumps({"k": k, "src": str(src), "stride": STRIDE, "mode": mode}) + "\n"
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("k", type=int, help="replica factor")
    ap.add_argument("out_dir")
    ap.add_argument("src", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--mode", default="shared", choices=("shared", "disjoint"))
    args = ap.parse_args()
    build(args.k, args.out_dir, args.src, mode=args.mode)
