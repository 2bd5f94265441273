"""Batched model inference over document features — the Spark shape of
"run a quality classifier over the corpus".

The split that scales: feature extraction stays JVM-side (codegen'd
string expressions at parquet-scan speed), and only the model forward
pass crosses into Python — as an Arrow-batched pandas UDF doing one
vectorized numpy expression per batch, never per-row Python. Swapping
the linear model for a real one (ONNX session, sklearn predict_proba,
a small torch module) changes only the inside of the UDF; the
partitioning, batching, and schema stay exactly as tested here.

The fixed-weight logistic model is deterministic, so the whole path is
oracle-checkable: the SQL twin evaluates the identical expression.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# Deterministic stand-in for trained weights: quality rises with
# document length and stopword presence, falls with punctuation load.
WEIGHTS = {"bias": -1.5, "log_len": 0.45, "stop_ratio": 3.0,
           "punct_ratio": -4.0}


def feature_columns(text_col: str = "text") -> list[F.Column]:
    """JVM-side feature extraction (shared by the UDF path and the SQL
    twin): doc length, whitespace word count, punctuation count,
    English-stopword count."""
    t = F.col(text_col)
    return [
        F.length(t).cast("long").alias("n_chars"),
        F.size(F.split(F.trim(t), r"\s+")).cast("long").alias("n_words"),
        F.regexp_count(t, F.lit(r"[^\w\s]")).cast("long").alias("n_punct"),
        F.regexp_count(F.lower(t), F.lit(r"\b(the|and|of|to|a)\b"))
         .cast("long").alias("n_stop"),
    ]


# DataType instance, not a DDL string: string return types are parsed
# through the active SparkContext, which doesn't exist at import time
@pandas_udf(DoubleType())
def _logistic_score(n_chars: pd.Series, n_words: pd.Series,
                    n_punct: pd.Series, n_stop: pd.Series) -> pd.Series:
    import numpy as np
    w = WEIGHTS
    nw = n_words.to_numpy(dtype="float64")
    z = (w["bias"]
         + w["log_len"] * np.log(n_chars.to_numpy(dtype="float64") + 1.0)
         + w["stop_ratio"] * (n_stop.to_numpy(dtype="float64") / nw)
         + w["punct_ratio"] * (n_punct.to_numpy(dtype="float64") / nw))
    return pd.Series(1.0 / (1.0 + np.exp(-z)))


def quality_model_scores(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Score every document with the (stand-in) quality classifier:
    (id, features..., score). Features feed the Arrow batch; nothing
    else leaves the JVM. Zero shuffles — inference is a narrow map at
    any scale."""
    feats = docs.select(F.col(id_col), *feature_columns(text_col))
    return feats.withColumn(
        "score",
        F.round(_logistic_score("n_chars", "n_words", "n_punct", "n_stop"), 6))


def score_sql_expr() -> str:
    """The DuckDB twin of _logistic_score over the same feature names."""
    w = WEIGHTS
    return (f"round(1.0 / (1.0 + exp(-({w['bias']} "
            f"+ {w['log_len']} * ln(n_chars + 1.0) "
            f"+ {w['stop_ratio']} * (n_stop / CAST(n_words AS DOUBLE)) "
            f"+ {w['punct_ratio']} * (n_punct / CAST(n_words AS DOUBLE))))), 6)")


def compression_ratio(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """zlib compression ratio per document — the classic
    low-information-content quality signal (boilerplate and repetition
    compress far better than natural prose; pipelines drop docs whose
    ratio is extreme on either side). Genuinely Python-only (no SQL
    engine exposes a compressor), so it runs as an Arrow-batched
    pandas UDF with a FIXED zlib level — byte-deterministic, which the
    tests pin against direct zlib calls. Scan-bound and embarrassingly
    parallel; the UDF ships back one long per row.
    Returns (doc_id, n_chars, n_bytes, z_len, ratio = n_chars / z_len)."""
    import zlib

    @pandas_udf("long")
    def zlen(s: pd.Series) -> pd.Series:
        return s.map(lambda t: None if t is None
                     else len(zlib.compress(t.encode("utf-8"), 6)))

    return (docs.select(F.col(id_col),
                        F.length(text_col).cast("bigint").alias("n_chars"),
                        F.octet_length(text_col).cast("bigint")
                         .alias("n_bytes"),
                        zlen(F.col(text_col)).alias("z_len"))
            .withColumn("ratio",
                        F.round(F.col("n_chars") / F.col("z_len"), 6)))
