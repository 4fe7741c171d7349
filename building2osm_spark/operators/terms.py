"""Corpus term statistics: per-document distinctive-term extraction
(tf-idf-style keywording) with EXACT integer ordering.

Classic tf·idf ranks by tf * ln(N/df) — a float whose last-ulp value can
differ between engines (libm vs DuckDB ln), flipping near-tie ranks and
breaking cross-engine reproducibility. Ranking by the integer
(tf * N) // df preserves the tf-idf ordering intent (monotone increasing
in tf, decreasing in df) with bit-exact arithmetic everywhere, so the
result has an exact SQL oracle and survives engine/version changes.

Scale shape: one (id, word) aggregation (map-side combinable), one word
aggregation for document frequencies (the join back broadcasts when the
vocabulary is small; otherwise a word-keyed shuffle join — AQE decides),
one per-doc window for the top-k. N (corpus size) is a single count()
job, the only driver-side scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distinctive_terms(
    docs: DataFrame,
    k: int = 3,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k distinctive terms per document, ranked by the integer score
    (tf * N) // df, ties to the lexicographically smallest term. Terms
    are lowercased whitespace tokens. Returns
    (id_col, term, tf, df, rank)."""
    base = docs.filter(F.col(text_col).isNotNull())
    n_docs = base.count()
    words = base.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = words.groupBy(id_col, "term").agg(F.count("*").cast("long").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        tf.join(df_, "term")
        .withColumn("score", F.expr(f"tf * {int(n_docs)}L div df"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", F.col("rank").cast("int").alias("rank"))
    )


def bpe_pair_counts(
    docs: DataFrame,
    k: int = 50,
    *,
    text_col: str = "text",
) -> DataFrame:
    """First-BPE-merge statistics (the corpus-scale inner step of
    tokenizer training): count adjacent character pairs inside words,
    weighted by corpus word frequency, and return the top-k merge
    candidates as (pair, cnt) ranked (cnt desc, pair asc).

    Scale shape — the standard BPE trick that makes tokenizer training
    feasible at 100 TB: the corpus collapses to its WORD-FREQUENCY
    table first (ONE map-side-combinable shuffle on word; output is
    vocabulary-sized, ~10^7 rows even for a 10^12-doc corpus), and the
    per-character pair explosion runs over DISTINCT words only,
    weighted by their counts — never over the corpus text. The pair
    aggregation and top-k (TakeOrdered — no full sort) are
    vocabulary-sized. No Python anywhere.

    Pairs are consecutive 2-character substrings: a word of length L
    contributes L-1 positions and repeated pairs inside one word count
    once per position (real BPE merge counting). Words are lowercased
    whitespace tokens (the distinctive_terms convention);
    single-character words have no merge candidates and are dropped
    before the explosion.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    words = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word")
        )
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
        "n",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(k)
    )
