"""Round-3 text/retrieval additions: BM25 ranking and a Count-Min sketch,
both engine-neutral (md5-hashed / closed-form) so DuckDB hash-checks them.

Tokenization follows the repo convention (pinned by t01/t03):
Spark ``split(trim(lower(text)), '\\s+')`` ≡ DuckDB
``regexp_split_to_array(trim(lower(text)), '\\s+')``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.session import load_table

#: BM25 free parameters (the Robertson/Lucene defaults).
_K1, _B = 1.2, 0.75
#: fixed query for the ranking demo — mid-frequency corpus terms.
_QUERY_TERMS = ["hash", "join", "vector", "spark"]


@register(
    "t24_bm25_ranking",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, tok, count(*) AS tf FROM toks
        WHERE tok IN ('hash', 'join', 'vector', 'spark')
        GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    scored AS (
        SELECT tf.doc_id,
               sum(ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
                   * tf.tf * ({_K1} + 1)
                   / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / stats.avgdl))
               ) AS score
        FROM tf
        JOIN df USING (tok)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, round(1e-9 + score, 4) AS bm25
    FROM scored
    ORDER BY round(1e-9 + score, 4) DESC, doc_id
    LIMIT 10
    """,
    category="text",
    doc=(
        "BM25 ranking (Robertson et al.; k1=1.2, b=0.75, Lucene's "
        "ln(1 + (N-df+0.5)/(df+0.5)) idf) of the documents table against a "
        "fixed term query. Pure JVM codegen — tokenize/explode, two "
        "aggregations, and a broadcast of the per-term df table (|Q| rows) "
        "and the 1-row corpus stats; the only corpus-sized shuffle is the "
        "per-doc token count. Top-k compiles to TakeOrderedAndProject. "
        "Hash-checked against DuckDB computing the identical formula."
    ),
)
def t24_bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    )
    # pin the two token-pass outputs (per-doc length; per-doc query-term tf)
    # before their multiple consumers — both are doc-bounded, and without
    # the pin the corpus would be re-tokenized once per consumer
    dl = (
        toks.groupBy("doc_id")
        .agg(F.count("*").alias("dl"))
        .localCheckpoint(eager=True)
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("tok").isin(_QUERY_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    contrib = (
        idf
        * F.col("tf")
        * (_K1 + 1)
        / (
            F.col("tf")
            + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("score"))
    )
    return (
        scored.select(
            "doc_id", F.round(F.lit(1e-9) + F.col("score"), 4).alias("bm25")
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
    )


#: Count-Min geometry: d hash rows × w buckets; md5-derived row hashes so
#: both engines build the identical sketch.
_CM_D, _CM_W = 4, 256


def _cm_bucket_spark(row: int) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row}:"), F.col("tok"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % _CM_W
    )


@register(
    "t25_countmin_heavy_hitters",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
        FROM documents
    ),
    rows_ AS (SELECT unnest(range({_CM_D})) AS r),
    cells AS (
        SELECT r, ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || tok), 1, 8))::BIGINT
                   % {_CM_W} AS bucket,
               count(*) AS cell_count
        FROM toks CROSS JOIN rows_
        GROUP BY 1, 2
    ),
    exact AS (SELECT tok, count(*) AS exact_count FROM toks GROUP BY tok),
    est AS (
        SELECT exact.tok, exact.exact_count,
               min(cells.cell_count) AS est_count
        FROM exact
        CROSS JOIN rows_
        JOIN cells
          ON cells.r = rows_.r
         AND cells.bucket = ('0x' || substr(md5(CAST(rows_.r AS VARCHAR) || ':' || exact.tok), 1, 8))::BIGINT % {_CM_W}
        GROUP BY exact.tok, exact.exact_count
    )
    SELECT tok, CAST(est_count AS BIGINT) AS est_count,
           CAST(exact_count AS BIGINT) AS exact_count
    FROM est
    ORDER BY est_count DESC, tok
    LIMIT 15
    """,
    category="text",
    doc=(
        "Count-Min sketch heavy hitters (Cormode & Muthukrishnan): d=4 md5 "
        "hash rows x w=256 buckets. The sketch build is ONE aggregation "
        "whose state is at most d*w = 1024 cells regardless of corpus size "
        "— the 100-TB shape — and estimation joins candidate tokens to the "
        "broadcast-sized cell table; est >= exact always (one-sided error, "
        "pinned in pytest). Hash-checked: md5 row hashes make the sketch "
        "bit-identical in DuckDB."
    ),
)
def t25_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok")
    )
    # all d (row, bucket) pairs of a token in one expression, so the sketch
    # build and the probe side each cost ONE pass (scan-audit discipline)
    rb = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"), _cm_bucket_spark(r).alias("bucket")
            )
            for r in range(_CM_D)
        ]
    )
    # Tokenize + count ONCE, pinned: `exact` feeds both the sketch build
    # and the probe side, so without the pin the corpus tokenization
    # subtree executes twice. The pin is vocab-sized (bounded by distinct
    # tokens, not corpus rows).
    exact = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("exact_count"))
        .localCheckpoint(eager=True)
    )
    # sketch: one groupBy whose key space is bounded at d*w cells. Built
    # from the per-token counts, NOT the token instances: a token with
    # count n contributes n to each of its d cells, so
    # sum(exact_count) over tokens hashing to a cell == count(*) over
    # instances hashing to it — identical integers, while the 4 md5
    # bucket hashes run once per DISTINCT token (~vocab) instead of once
    # per token instance (~600k at sf0.1; build+materialize
    # 1.28 → 0.70 s).
    cells = (
        exact.select("exact_count", F.explode(rb).alias("rb"))
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("exact_count").alias("cell_count"))
    )
    # estimation: candidate tokens probe the (tiny) sketch per hash row
    probes = exact.select(
        "tok",
        "exact_count",
        F.explode(rb).alias("rb"),
    ).select(
        "tok",
        "exact_count",
        F.col("rb.r").alias("r"),
        F.col("rb.bucket").alias("bucket"),
    )
    joined = probes.join(F.broadcast(cells), ["r", "bucket"])
    return (
        joined.groupBy("tok", "exact_count")
        .agg(F.min("cell_count").alias("est_count"))
        .orderBy(F.desc("est_count"), F.asc("tok"))
        .limit(15)
        .select(
            "tok",
            F.col("est_count").cast("bigint").alias("est_count"),
            F.col("exact_count").cast("bigint").alias("exact_count"),
        )
    )


@register(
    "t26_readability_flesch",
    oracle="""
    WITH feat AS (
      SELECT doc_id,
             greatest(CAST(length(regexp_extract_all(text, '[.!?]+')) AS DOUBLE), 1.0) AS sentences,
             greatest(CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE), 1.0) AS words,
             CAST(length(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE) AS syllables
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           CAST(words AS BIGINT) AS n_words,
           CAST(syllables AS BIGINT) AS n_syllables,
           round(1e-9 + 206.835 - 1.015 * (words / sentences)
                 - 84.6 * (syllables / words), 4) AS flesch_score
    FROM feat ORDER BY doc_id
    """,
    category="text",
    doc=(
        "Flesch reading-ease readability (206.835 - 1.015·words/sentences "
        "- 84.6·syllables/words) with vowel-group syllable approximation — "
        "a standard training-data quality signal (readability bands gate "
        "educational-quality corpora). Pure codegen: three regexp counts "
        "per row, no shuffle before the presentation sort; hash-checked "
        "(RE2-compatible regex + identical fp op order in DuckDB)."
    ),
)
def t26_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 300)
    sentences = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).cast("double"), F.lit(1.0)
    )
    words = F.greatest(
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double"), F.lit(1.0)
    )
    syllables = F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiouy]+")).cast(
        "double"
    )
    return docs.select(
        "doc_id",
        words.cast("bigint").alias("n_words"),
        syllables.cast("bigint").alias("n_syllables"),
        F.round(
            F.lit(1e-9)
            + F.lit(206.835)
            - F.lit(1.015) * (words / sentences)
            - F.lit(84.6) * (syllables / words),
            4,
        ).alias("flesch_score"),
    ).orderBy("doc_id")


_DSIR_BUCKETS = 256
_DSIR_TARGET = ("src0", "src1")  # the "target domain" sample


@register(
    "t27_dsir_importance",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    big AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 8))::BIGINT
                 % {_DSIR_BUCKETS} AS b
      FROM toks, unnest(range(1, length(t))) AS r(i)
      WHERE length(t) >= 2
    ),
    tgt AS (
      SELECT b, count(*) AS ct FROM big
      WHERE source IN {_DSIR_TARGET} GROUP BY b
    ),
    all_ AS (SELECT b, count(*) AS ca FROM big GROUP BY b),
    tot AS (
      SELECT (SELECT sum(ct) FROM tgt) AS nt, (SELECT sum(ca) FROM all_) AS na
    ),
    lr AS (  -- Laplace-smoothed log-ratio per feature bucket
      SELECT all_.b,
             ln((CAST(coalesce(tgt.ct, 0) + 1 AS DOUBLE) / (tot.nt + {_DSIR_BUCKETS}))
                / (CAST(all_.ca + 1 AS DOUBLE) / (tot.na + {_DSIR_BUCKETS}))) AS llr
      FROM all_ LEFT JOIN tgt USING (b), tot
    )
    SELECT big.doc_id,
           count(*) AS n_bigrams,
           round(1e-9 + avg(lr.llr), 4) AS dsir_weight
    FROM big JOIN lr USING (b)
    GROUP BY big.doc_id ORDER BY big.doc_id
    """,
    category="text",
    doc=(
        "DSIR importance weights (Xie et al. 2023, Data Selection via "
        "Importance Resampling): hashed-bigram features (md5 -> 256 "
        "buckets), bag-of-buckets unigram models for a TARGET domain "
        "(sources src0/src1) and the raw corpus, Laplace-smoothed; each "
        "document's weight is its mean log-likelihood ratio — the score "
        "DSIR resamples by to shift a pretraining mix toward the target "
        "domain (p10_weighted_sample is the resampling half). The hashing "
        "trick caps model state at a CONSTANT 256 rows however large the "
        "corpus, so both LMs broadcast; one exploded-bigram pass is "
        "pinned before its three consumers (two 256-row aggregates + the "
        "scoring join) and the per-doc score is a broadcast join + "
        "grouped mean. Engine-neutral md5 bucketing keeps the weights "
        "hash-checked against DuckDB end-to-end."
    ),
)
def t27_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    B = _DSIR_BUCKETS
    docs = load_table(spark, "documents", sf_dir)
    # The pinned corpus pass (tokenize + explode + per-bigram md5) is the
    # cost, not scan bytes: a single-file corpus runs it on ONE task (the
    # d13/v10 discipline; no-op on multi-file corpora, result-identical —
    # per-row bucketing doesn't depend on partitioning).
    target_p = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target_p:
        docs = docs.repartition(target_p)
    t = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    toks = docs.select("doc_id", "source", t.alias("t")).filter(F.size("t") >= 2)
    bg = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("t"), i), F.element_at(F.col("t"), i + 1)
        ),
    )
    big = (
        toks.select("doc_id", "source", F.explode(bg).alias("w"))
        .select(
            "doc_id",
            "source",
            (
                F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("bigint")
                % B
            ).alias("b"),
        )
        .localCheckpoint(eager=True)  # three consumers of one corpus pass
    )
    tgt = (
        big.filter(F.col("source").isin(*_DSIR_TARGET))
        .groupBy("b")
        .agg(F.count("*").alias("ct"))
    )
    all_ = big.groupBy("b").agg(F.count("*").alias("ca"))
    # Both model totals in ONE driver action instead of two scheduled
    # jobs: nt = target bigram instances, na = all instances — the same
    # integers sum(ct)/sum(ca) returned, read off the pin directly.
    nt, na = big.agg(
        F.sum(
            F.when(F.col("source").isin(*_DSIR_TARGET), F.lit(1)).otherwise(F.lit(0))
        ),
        F.count("*"),
    ).first()
    lr = (
        all_.join(tgt, "b", "left")
        .select(
            "b",
            F.log(
                ((F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double") / F.lit(float(nt + B)))
                / ((F.col("ca") + 1).cast("double") / F.lit(float(na + B)))
            ).alias("llr"),
        )
    )
    return (
        big.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.lit(1e-9) + F.avg("llr"), 4).alias("dsir_weight"),
        )
        .orderBy("doc_id")
    )
