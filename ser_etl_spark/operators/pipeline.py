"""End-to-end corpus curation: the composed training-data pipeline.

The individual operators (fingerprint dedup, quality scoring, dataset
splitting — each oracle-verified on its own) are only useful composed:
raw corpus -> dedup survivors -> quality gate -> reproducible split ->
per-split accounting. This module registers that composition as ONE
query so the gate checks the *pipeline*, not just its stages — operator
interactions (join keys, filter ordering, column flow) are where
integration bugs live.

Scale design: the whole pipeline is two shuffles — one fingerprint
group (dedup) and the final split/lang aggregate; quality scoring and
split assignment are stateless projections fused into the surrounding
stages by Catalyst. Filters run before the wide aggregate, so the
shuffled payload is already deduped and quality-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ser_etl_spark.functions.numeric import dsum, sql_dsum
from ser_etl_spark.operators.sampling import assign_split, sql_split_bucket
from ser_etl_spark.operators.text import fingerprint, quality_score
from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table

QUALITY_THRESHOLD = 0.5

_QUALITY_SQL = """
    0.4 * least(CAST(len(string_split_regex(trim(lower(text)), ' +')) AS DOUBLE) / 64.0, 1.0)
    + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE))
    + 0.3 * least(CAST(len(list_filter(string_split_regex(trim(lower(text)), ' +'),
         t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE)
      / CAST(len(string_split_regex(trim(lower(text)), ' +')) AS DOUBLE) * 4.0, 1.0)
"""


def curate_corpus(docs: DataFrame) -> DataFrame:
    """raw docs -> deduped (min-doc_id survivor per normalized
    fingerprint) -> quality-gated -> split-assigned rows."""
    fp = fingerprint(docs)  # (doc_id, fp)
    w = Window.partitionBy("fp")
    survivors = (
        fp.withColumn("keep", F.col("doc_id") == F.min("doc_id").over(w))
        .filter("keep")
        .select("doc_id")
    )
    quality = quality_score(docs).select("doc_id", "quality")
    kept = (
        docs.join(survivors, "doc_id")
        .join(quality, "doc_id")
        .filter(F.col("quality") >= QUALITY_THRESHOLD)
    )
    return assign_split(kept, "doc_id")


@register(
    "corpus_curation",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, lang, n_chars, text,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      FROM documents
    ), survivors AS (
      SELECT * FROM (
        SELECT fp.*, MIN(doc_id) OVER (PARTITION BY fp) AS min_id FROM fp
      ) WHERE doc_id = min_id
    ), gated AS (
      SELECT * FROM survivors WHERE ({_QUALITY_SQL}) >= {QUALITY_THRESHOLD}
    ), split AS (
      SELECT lang, n_chars,
             CASE WHEN {sql_split_bucket('doc_id')} < 80 THEN 'train'
                  WHEN {sql_split_bucket('doc_id')} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM gated
    )
    SELECT split, lang,
           COUNT(*) AS n_docs,
           {sql_dsum('n_chars', 0)} AS total_chars
    FROM split
    GROUP BY split, lang
    ORDER BY split, lang
    """,
    description="the COMPOSED training-data pipeline as one gate-checked "
    "query: fingerprint dedup (min-id survivor) -> quality threshold -> "
    "reproducible split -> per-(split, lang) accounting; two shuffles "
    "total, stateless stages fused by Catalyst",
    covers=("N-dedup", "N-text", "X-split"),
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        curate_corpus(docs)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            dsum("n_chars", 0).alias("total_chars"),
        )
        .orderBy("split", "lang")
    )
