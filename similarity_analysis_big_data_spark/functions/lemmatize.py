"""POS-aware lemmatization as an Arrow-vectorized pandas UDF (SURVEY §2.10 U1).

The reference wraps a row-at-a-time Python UDF that re-instantiates
``WordNetLemmatizer`` per row and downloads NLTK corpora at import time
(``lab2.py:29-31, 121-138``) — both fatal at scale (pickle round trip per
row; air-gapped executors can't download). Here:

- one Arrow batch per crossing (``pandas_udf``), lemmatizer built once per
  Python worker, lazily;
- pluggable backend: NLTK when importable (cluster provisioning problem,
  not runtime), else a deterministic rule-based English suffix stripper so
  the operator is testable in hermetic environments.

Input/output contract matches the reference UDF: ``array<string>`` of
filtered tokens in, space-joined lemmatized string out (``lab2.py:138``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BACKEND = None  # per-worker singleton: ("nltk", lemmatizer) | ("rules", None)


def _load_backend():
    global _BACKEND
    if _BACKEND is not None:
        return _BACKEND
    try:
        import nltk  # noqa: F401
        from nltk.stem import WordNetLemmatizer

        lem = WordNetLemmatizer()
        lem.lemmatize("tests")  # force corpus load; raises if not provisioned
        _BACKEND = ("nltk", lem)
    except Exception:
        _BACKEND = ("rules", None)
    return _BACKEND


def _rule_lemma(word: str) -> str:
    """Deterministic fallback: a small Porter-flavored suffix stripper.

    Not a linguistic match for WordNet — it exists so the pipeline is
    runnable and deterministic where NLTK corpora are absent; parity tests
    against the reference require the NLTK backend.
    """
    if len(word) <= 3:
        return word
    if word.endswith("ies") and len(word) > 4:
        return word[:-3] + "y"
    if word.endswith("sses"):
        return word[:-2]
    if word.endswith("es") and not word.endswith(("ses", "oes")):
        return word[:-1]
    if word.endswith("s") and not word.endswith(("ss", "us", "is")):
        return word[:-1]
    if word.endswith("ing") and len(word) > 5:
        stem = word[:-3]
        return stem + "e" if stem.endswith(("at", "iz", "us")) else stem
    if word.endswith("ed") and len(word) > 4:
        return word[:-2]
    return word


def _wordnet_pos(treebank_tag: str) -> str:
    # lab2.py:102-114: treebank initial -> wordnet POS, noun default.
    if treebank_tag.startswith("J"):
        return "a"
    if treebank_tag.startswith("V"):
        return "v"
    if treebank_tag.startswith("N"):
        return "n"
    if treebank_tag.startswith("R"):
        return "r"
    return "n"


def _lemmatize_tokens(tokens) -> str:
    backend, lem = _load_backend()
    words = list(tokens) if tokens is not None else []
    if backend == "nltk":
        import nltk

        tagged = nltk.pos_tag(words)
        return " ".join(lem.lemmatize(w, _wordnet_pos(t)) for w, t in tagged)
    return " ".join(_rule_lemma(w) for w in words)


@F.pandas_udf(T.StringType())
def lemmatize_udf(tokens: pd.Series) -> pd.Series:
    """array<string> tokens -> space-joined lemmatized string (lab2.py:138)."""
    return tokens.map(_lemmatize_tokens)


def lemmatize(col: Column | str) -> Column:
    return lemmatize_udf(F.col(col) if isinstance(col, str) else col)
