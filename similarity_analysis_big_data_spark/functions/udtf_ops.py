"""Python UDTF surface (Spark 4) (north-star [ext]).

A user-defined TABLE function: one input row -> many output rows with
per-row Python logic, usable from SQL via ``LATERAL``. This is the
row-expanding escape hatch for logic ``explode``/``posexplode`` can't
express (stateful within-row scans, irregular record formats).

Philosophy note: UDTFs are row-at-a-time Python — the SLOW path. The demo
below (sentence segmentation with per-sentence stats) is deliberately also
expressible with explode+split, which is how tests pin its semantics; use
a UDTF in production only when no Catalyst composition exists, and prefer
``mapInArrow``/``mapInPandas`` when the expansion is batchable.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sentence_idx int, sentence string, n_tokens int")
class SentenceSegments:
    """Split a document into trimmed sentences on [.!?] runs; emit one row
    per non-empty sentence with its index and whitespace token count."""

    def eval(self, text: str):  # noqa: D102 — contract defined by Spark
        if text is None:
            return
        import re

        idx = 0
        for raw in re.split(r"[.!?]+", text):
            sentence = raw.strip()
            if not sentence:
                continue
            yield idx, sentence, len(sentence.split())
            idx += 1


def register_udtfs(spark) -> None:
    """Expose the UDTF to SQL: ``SELECT s.* FROM docs, LATERAL
    sentence_segments(text) s``."""
    spark.udtf.register("sentence_segments", SentenceSegments)


__all__ = ["SentenceSegments", "register_udtfs"]
