"""Arrow-vectorized pandas UDF surface (X6; SURVEY.md §2.10).

The engine's default is JVM-side expressions (see functions/text.py) — these
pandas variants exist for the cases where Python is genuinely required
(model inference, codec work, numpy-heavy math) and as the reference pattern
for how to do Python *without* row-at-a-time serde: every function here is
Arrow-batched (`pandas_udf` / grouped map), ~10-100x faster than `F.udf`.

Each has a JVM twin tested for equality, so swapping between paths is a
pure performance decision.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType


@F.pandas_udf(DoubleType())
def quality_score_pandas(text: pd.Series) -> pd.Series:
    """Vectorized twin of functions.text.quality_score (same formula, same
    results to fp precision). One Arrow batch in, one out."""
    toks = text.str.split(" ")
    n = toks.str.len().astype("float64")
    n_distinct = toks.map(lambda t: len(set(t))).astype("float64")
    tok_chars = text.str.replace(" ", "", regex=False).str.len().astype("float64")
    avg_len = tok_chars / n
    return (
        0.4 * (n / 100.0).clip(upper=1.0)
        + 0.3 * (n_distinct / n)
        + 0.3 * (avg_len / 8.0).clip(upper=1.0)
    )


@F.pandas_udf(DoubleType())
def cosine_to_query_pandas(vec: pd.Series, query: pd.Series) -> pd.Series:
    """Vectorized cosine against a (constant) query vector column — the
    numpy path for wide embeddings where per-element HOF folds get slow.
    Both args arrive as object Series of lists; numpy does the batch math."""
    import numpy as np

    m = np.asarray(vec.tolist(), dtype="float64")
    q = np.asarray(query.iloc[0], dtype="float64")
    dots = m @ q
    norms = np.linalg.norm(m, axis=1) * np.linalg.norm(q)
    return pd.Series(dots / norms)


def zscore_by_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Grouped-map (applyInPandas) example: per-group z-score normalization
    — the UDTF-shaped API. Output schema = input + `zscore`. Population
    std (ddof=0); groups of size 1 get zscore 0."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += ", zscore double"

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=0)
        mean = pdf[value_col].mean()
        pdf = pdf.copy()
        pdf["zscore"] = 0.0 if std == 0 else (pdf[value_col] - mean) / std
        return pdf

    return df.groupBy(group_col).applyInPandas(norm, schema=schema)


def with_compression_ppt(
    df: DataFrame, text_col: str = "text", out_col: str = "c_ppt", level: int = 6
) -> DataFrame:
    """Append zlib compressibility in integer parts-per-thousand
    (``1000 * compressed_len DIV raw_utf8_len``) — the redundancy
    signal the Gopher/CCNet filter class uses to catch boilerplate,
    spam, and template text that token-level stats miss (highly
    repetitive text compresses to a tiny fraction; natural prose
    doesn't).

    Python is genuinely required (zlib), so this is ONE Arrow-batched
    mapInPandas stage — map-only, no shuffle, no per-row serde. The
    value is an exact integer at a FIXED zlib level, so it is stable
    across partitionings and runs; NULL/empty text yields NULL.
    Deployment note: the absolute ppt depends on the zlib build, so
    gates on it should be measured-margin thresholds (the q13/q18
    discipline), not exact pins."""
    import zlib

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def batches(it):
        for pdf in it:
            def ppt(t):
                if t is None:
                    return None
                b = t.encode("utf-8")
                if not b:
                    return None
                return 1000 * len(zlib.compress(b, level)) // len(b)

            pdf[out_col] = pdf[text_col].map(ppt).astype("object")
            yield pdf

    return df.mapInPandas(batches, f"{fields}, {out_col} bigint")
