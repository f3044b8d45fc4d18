"""Registered multimodal queries (north-star [ext]).

``multimodal_binary_metadata`` is pure column math on the payload bytes, so
it gets a full DuckDB oracle. ``multimodal_fake_features`` crosses into the
Arrow/pandas worker (mapInPandas) — rows-only check here, with the value
semantics pinned by unit tests (tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_binary_payload, extract_features
from ..sources.readers import load_table
from .registry import register


@register(
    "multimodal_binary_metadata",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS digest,
               substr(text, 1, 4) AS header_text
        FROM documents
    """,
    doc="[ext] opaque-binary metadata extraction: payload size, content digest, "
    "header probe — the typed-metadata side of a multimodal column.",
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payloads = attach_binary_payload(docs, "doc_id", "text")
    return payloads.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("digest"),
        F.decode(F.expr("substring(payload, 1, 4)"), "UTF-8").alias("header_text"),
    )


def _md5_byte_sql(i: int) -> str:
    """DuckDB SQL for byte ``i`` of md5(text) as a BIGINT (hex-pair decode
    via strpos — portable, no 0x-cast dependence)."""
    hi = f"strpos('0123456789abcdef', substr(md5(text), {2 * i + 1}, 1)) - 1"
    lo = f"strpos('0123456789abcdef', substr(md5(text), {2 * i + 2}, 1)) - 1"
    return f"CAST(({hi}) * 16 + ({lo}) AS BIGINT)"


_FAKE_FEATURES_ORACLE = (
    "SELECT doc_id,\n"
    "       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,\n"
    "       substr(lower(hex(encode(text))), 1, 8) AS header,\n"
    + ",\n".join(f"       {_md5_byte_sql(i)} AS f{i}" for i in range(8))
    + "\nFROM documents"
)


@register(
    "multimodal_fake_features",
    # The fake decoder's feature i is float32(md5_byte_i / 255); multiplying
    # back by 255 and rounding recovers the exact byte (float32 error « 0.5),
    # so the mapInPandas output is checkable against a pure-SQL md5 decode.
    oracle=_FAKE_FEATURES_ORACLE,
    doc="[ext] Arrow-batched feature extraction over binary payloads "
    "(mapInPandas; decode stubbed behind a deterministic fake — the Spark "
    "plumbing, schema and batching are real). Registered surface emits the "
    "features as exact integer bytes f0..f7 so the output is scalar-sortable "
    "AND fully oracle-checked; the raw array<float> form stays available via "
    "operators.multimodal.extract_features for downstream ANN.",
)
def multimodal_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payloads = attach_binary_payload(docs, "doc_id", "text")
    feats = extract_features(payloads)
    byte_cols = [
        F.round(F.element_at("feature", i + 1).cast("double") * 255.0, 0)
        .cast("long")
        .alias(f"f{i}")
        for i in range(8)
    ]
    return feats.select("doc_id", "n_bytes", "header", *byte_cols)


@register(
    "multimodal_frame_sample",
    oracle="""
        WITH sizes AS (
            SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                   CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT) AS n_frames
            FROM documents
        ),
        idx AS (
            SELECT doc_id, n_bytes, n_frames,
                   unnest(range(0, n_frames, 4)) AS frame_idx
            FROM sizes
        )
        SELECT doc_id,
               CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(least(16, n_bytes - frame_idx * 16) AS BIGINT) AS frame_bytes,
               n_frames
        FROM idx
    """,
    doc="[ext] video-style frame sampling (every 4th 16-byte chunk) through the "
    "row-EXPANDING mapInPandas path; the emitted frame METADATA (index, size, "
    "count) is oracle-checked — the bytes themselves are pinned by unit tests "
    "(DuckDB substr is character-based, so byte slices of multibyte text "
    "can't cross engines).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    payloads = attach_binary_payload(docs, "doc_id", "text")
    return sample_frames(payloads, frame_bytes=16, every_n=4).select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.octet_length("frame").cast("long").alias("frame_bytes"),
        F.col("n_frames").cast("long").alias("n_frames"),
    )


# ---------------------------------------------------------------------------
# Image near-dup dedup (r7 verdict item 2): perceptual hash over decoded
# pixel grids -> banded Hamming pairing -> survivor anti-join.
# ---------------------------------------------------------------------------
#
# The synthetic corpus has no real images, so — exactly like plans/pii.py
# derives contact blobs — the queries run over SYNTHETIC 8x8 GRAY8 bitmaps
# built deterministically from md5 (the same digest-as-pixels construction
# as operators.multimodal.decode_image(fake=True)): docs in the same
# group of 8 share a base image, and each non-canonical variant perturbs
# exactly ONE pixel, so variant->canonical Hamming distance over the
# 56-bit dHash is <= 2 BY CONSTRUCTION (one pixel touches two horizontal
# comparisons). That gives the pairing stage genuine near-duplicates (not
# just hamming-0 exact copies) while keeping every byte oracle-expressible.

_IMG_ROWS = 8
_IMG_COLS = 8
_IMG_GROUP = 8  # docs per image group — FIXED size, never corpus-tracking


def synthetic_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One raw 8x8 GRAY8 bitmap per document: row r of doc_id's group
    image is the first 8 bytes of md5('img:<group>:<r>'); non-canonical
    variants (doc_id % 8 != 0) splice one md5('doc:<doc_id>')-derived
    byte at pixel (doc_id % 8, group % 8). Pure Catalyst binary math —
    the bitmap IS the payload column a storage layer would hand us."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.expr(f"doc_id div {_IMG_GROUP}").alias("g"),
        (F.col("doc_id") % _IMG_GROUP).alias("v"),
        F.expr(f"(doc_id div {_IMG_GROUP}) % {_IMG_COLS}").alias("cs"),
    ).withColumn(
        "pbyte",
        F.unhex(
            F.substring(
                F.md5(F.concat(F.lit("doc:"), F.col("doc_id").cast("string"))), 1, 2
            )
        ),
    )
    for r in range(_IMG_ROWS):
        d = d.withColumn(
            f"row{r}",
            F.unhex(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("img:"), F.col("g").cast("string"), F.lit(f":{r}")
                        )
                    ),
                    1,
                    2 * _IMG_COLS,
                )
            ),
        )
    row_exprs = [
        F.expr(
            f"CASE WHEN v = {r} AND v <> 0 THEN "
            f"concat(substring(row{r}, 1, cs), pbyte, "
            f"substring(row{r}, cs + 2, {_IMG_COLS - 1} - cs)) "
            f"ELSE row{r} END"
        )
        for r in range(_IMG_ROWS)
    ]
    return d.select(
        "doc_id", F.concat(*row_exprs).alias("payload")
    )


def _img_hex_byte(h: str, i: int) -> str:
    """DuckDB: byte ``i`` of hex digest expr ``h`` as an integer."""
    hi = f"strpos('0123456789abcdef', substr({h}, {2 * i + 1}, 1)) - 1"
    lo = f"strpos('0123456789abcdef', substr({h}, {2 * i + 2}, 1)) - 1"
    return f"(({hi}) * 16 + ({lo}))"


def _img_oracle() -> str:
    """The identical bitmap + dHash construction as generated DuckDB SQL:
    brute-force O(n^2) Hamming pairing (bit_count(xor(..)) — fine at the
    oracle's 500-doc scale) against which the banded Spark plan's pair
    set and survivor anti-join are hash-checked."""
    px_cols = ",\n               ".join(
        f"CASE WHEN v = {r} AND v <> 0 AND cs = {c} "
        f"THEN {_img_hex_byte('hd', 0)} "
        f"ELSE {_img_hex_byte(f'h{r}', c)} END AS p{r}_{c}"
        for r in range(_IMG_ROWS)
        for c in range(_IMG_COLS)
    )
    h_cols = ",\n               ".join(
        f"md5('img:' || g || ':{r}') AS h{r}" for r in range(_IMG_ROWS)
    )
    phash = " + ".join(
        f"CASE WHEN p{r}_{c} > p{r}_{c + 1} THEN {1 << (r * (_IMG_COLS - 1) + c)} ELSE 0 END"
        for r in range(_IMG_ROWS)
        for c in range(_IMG_COLS - 1)
    )
    return f"""
    WITH d AS (
        SELECT doc_id, doc_id // {_IMG_GROUP} AS g, doc_id % {_IMG_GROUP} AS v,
               (doc_id // {_IMG_GROUP}) % {_IMG_COLS} AS cs
        FROM documents
    ),
    hx AS (
        SELECT doc_id, v, cs,
               {h_cols},
               md5('doc:' || doc_id) AS hd
        FROM d
    ),
    px AS (
        SELECT doc_id,
               {px_cols}
        FROM hx
    ),
    ph AS (
        SELECT doc_id, CAST({phash} AS BIGINT) AS phash FROM px
    ),
    pairs AS (
        SELECT l.doc_id AS id_l, r.doc_id AS id_r
        FROM ph l JOIN ph r
          ON l.doc_id < r.doc_id
         AND bit_count(xor(l.phash, r.phash)) <= 2
    )
    SELECT p.doc_id, p.phash FROM ph p
    WHERE p.doc_id NOT IN (SELECT id_r FROM pairs)
    """


@register(
    "image_near_dup_survivors",
    oracle=_img_oracle(),
    doc="[ext] IMAGE near-dup dedup — the multimodal twin of the text "
    "near-dup spine: raw-bitmap payloads decode to pixel grids "
    "(mapInPandas), a 56-bit perceptual dHash summarizes each image, "
    "banded Hamming pairing (the simhash pigeonhole machinery, "
    "max_hamming=2) finds near-duplicate images WITHOUT an all-pairs "
    "join, and the survivor anti-join keeps each cluster's lowest-id "
    "image. Oracle = the same bitmap/dHash math in pure SQL with "
    "brute-force quadratic pairing.",
)
def image_near_dup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the pHash pass is map-only (payload bytes never shuffle —
    only the 16-byte (doc_id, phash) relation moves); pairing is the
    pigeonhole band equi-join (operators/dedup.py simhash_banded_pairs:
    3 bands of ~19 bits for h<=2, so bucket collisions are planted
    structure plus ~n^2/2^19 noise — sub-linear candidate growth until
    the corpus approaches 2^19 images per band value, at which point
    widen the hash, same lever as the text simhash). Survivor anti-join
    is a broadcast-able distinct id relation. Group size is FIXED at 8
    (never corpus-tracking), so the pair relation grows linearly."""
    from ..operators.dedup import simhash_banded_pairs
    from ..operators.multimodal import perceptual_dhash

    sig = perceptual_dhash(synthetic_images(spark, sf_dir))
    pairs = simhash_banded_pairs(
        sig.withColumnRenamed("phash", "simhash"),
        "doc_id",
        max_hamming=2,
        bits=56,
    )
    dropped = pairs.select(F.col("id_r").alias("doc_id")).distinct()
    return sig.join(dropped, "doc_id", "left_anti").select("doc_id", "phash")
