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
    if SplitToColumns is not None:
        spark.udtf.register("split_to_columns", SplitToColumns)


__all__ = ["SentenceSegments", "SplitToColumns", "register_udtfs"]


# Polymorphic UDTF: output schema computed at ANALYSIS time from a constant
# argument (Spark 4 ``analyze()`` static analysis) — the contract that lets
# one UDTF serve schemas the caller chooses per query.
try:  # pragma: no cover - import shape varies across 4.x
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    @udtf
    class SplitToColumns:
        """Split a string on whitespace into the first N tokens as N typed
        columns ``tok0..tok{N-1}`` (padding with NULL): N is a literal
        argument, so ``analyze()`` derives the output schema statically and
        the query compiles with real column names/types."""

        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if n.value is None or not isinstance(n.value, int) or n.value < 1:
                raise ValueError("n must be a positive integer literal")
            return AnalyzeResult(
                StructType(
                    [StructField(f"tok{i}", StringType()) for i in range(n.value)]
                    + [StructField("n_found", IntegerType())]
                )
            )

        def eval(self, text: str, n: int):  # noqa: D102 — Spark contract
            toks = (text or "").split()
            yield tuple(toks[i] if i < len(toks) else None for i in range(n)) + (
                min(len(toks), n),
            )

    _HAVE_ANALYZE = True
except ImportError:  # pragma: no cover
    SplitToColumns = None
    _HAVE_ANALYZE = False
