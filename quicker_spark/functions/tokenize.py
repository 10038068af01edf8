"""Vectorized tokenization.

The reference has NO engine-side tokenizer — callers supply keywords
(reference: demo/job/build_index.go:85-91 splits CSV fields on ',' and
lowercases; README_EN.md notes the business side owns text handling). Our
engine ingests raw source-code ``content`` so it owns tokenization, done
vectorized per the north rule ("vectorized Arrow/pandas UDFs, no per-row
Python").

Token definition (shared verbatim by the Spark engine, the Python oracle,
and the DuckDB oracle SQL so all three agree bit-for-bit):

    lowercase the text, then extract maximal runs of ``[a-z0-9_]``

Two implementations of the same spec:

- :func:`tokenize_col` — pure Catalyst expression (``lower`` + ``split`` +
  ``filter``). Whole-stage-codegen'd JVM path; the default for builds
  because it avoids the Arrow round-trip entirely.
- :func:`tokenize_udf` — Arrow ``pandas_udf`` using pandas' C string
  kernels. Kept as the extension point for real code-aware tokenizers
  (camelCase splitting, BPE, language-specific rules) that can't be said in
  Catalyst expressions.

Both produce identical arrays on any input (tested).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# One regex, three engines: python `re`, pandas `.str.findall`, and (in
# complement form) Spark `split` / DuckDB `string_split_regex`.
TOKEN_RE = r"[a-z0-9_]+"
NON_TOKEN_RE = r"[^a-z0-9_]+"


def tokenize_col(content: Column) -> Column:
    """Catalyst-native tokenizer: array<string> of lowercase tokens."""
    parts = F.split(F.lower(content), NON_TOKEN_RE)
    return F.filter(parts, lambda t: t != F.lit(""))


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(content: pd.Series) -> pd.Series:
    """Arrow-vectorized tokenizer (same spec as :func:`tokenize_col`)."""
    return content.fillna("").str.lower().str.findall(TOKEN_RE)


def tokenize_py(text: str) -> list[str]:
    """Single-string tokenizer for the driver-side oracle/tests."""
    import re

    return re.findall(TOKEN_RE, (text or "").lower())
