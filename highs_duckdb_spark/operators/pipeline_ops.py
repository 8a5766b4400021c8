"""Training-data sharding/packing operators — the steps between "filtered
corpus" and "what the trainer reads": context-window packing, deterministic
split assignment, and temperature-based language mixing.

All three are pure DataFrame plans (no Python in the hot path) with
declared deterministic semantics so a DuckDB oracle can replay them:

- packing uses running-token-count arithmetic (cumsum-based pack ids), the
  distributable form of greedy packing — at 100 TB the cumsum is one
  window over a per-shard ordering rather than a global sequential scan;
- splits hash doc ids (md5), never random() — reproducible across engines,
  runs, and cluster sizes, and stable under corpus growth;
- language weights are closed-form arithmetic over per-language counts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from highs_duckdb_spark.functions.presentation import present_sorted
from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.session import load_table, local_rows_df

PACK_CAPACITY = 512  # tokens per training sequence (window)


@register(
    "p01_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, lang, n_tokens,
             CAST(floor(CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tokens AS DOUBLE)
                        / {PACK_CAPACITY}) AS BIGINT) AS pack_id
      FROM toks
    )
    SELECT lang, pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM packed
    GROUP BY lang, pack_id
    ORDER BY lang, pack_id
    """,
    category="pipeline",
    doc=(
        f"Context-window packing ({PACK_CAPACITY} tokens): docs stream in "
        "doc_id order per language shard; pack_id = floor(preceding-token "
        "cumsum / capacity) — the order-deterministic, windowable form of "
        "greedy packing (one shuffle on the shard key; the cumsum never "
        "needs a global sequential pass)."
    ),
)
def p01_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    toks = docs.select("doc_id", "lang", n_tokens.alias("n_tokens"))
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = toks.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("double") / PACK_CAPACITY
        )
        .cast("bigint")
        .alias("pack_id"),
    )
    return (
        packed.groupBy("lang", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .orderBy("lang", "pack_id")
    )


@register(
    "p02_train_val_split",
    oracle="""
    WITH bucketed AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 100 AS BIGINT) AS bucket
      FROM documents
    )
    SELECT lang,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc
    FROM bucketed
    GROUP BY lang, split
    ORDER BY lang, split
    """,
    category="pipeline",
    doc=(
        "Deterministic 90/5/5 split: md5(doc_id) first-24-bits mod 100 — "
        "reproducible across engines/runs/cluster sizes and stable as the "
        "corpus grows (a doc never changes split), unlike random()."
    ),
)
def p02_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        docs.groupBy("lang", split.alias("split"))
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").cast("bigint").alias("min_doc"))
        .orderBy("lang", "split")
    )


@register(
    "p03_language_temperature_weights",
    oracle="""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY lang
    ),
    powered AS (
      SELECT lang, n, pow(n, 0.7) AS p FROM counts
    )
    SELECT lang,
           CAST(n AS BIGINT) AS n_docs,
           round(1e-9 + n / (SELECT sum(n) FROM powered), 6) AS natural_share,
           round(1e-9 + p / (SELECT sum(p) FROM powered), 6) AS sampled_share,
           round(1e-9 + (p / (SELECT sum(p) FROM powered)) / (n / (SELECT sum(n) FROM powered)), 6) AS upsample_factor
    FROM powered
    ORDER BY lang
    """,
    category="pipeline",
    doc=(
        "Temperature-based language mixing (alpha=0.7): per-language corpus "
        "shares flattened by count^alpha — the multilingual-sampling recipe; "
        "a two-row broadcast of the global sums, all arithmetic closed-form."
    ),
)
def p03_language_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    counts = docs.groupBy("lang").agg(F.count("*").cast("double").alias("n"))
    powered = counts.select("lang", "n", F.pow("n", F.lit(0.7)).alias("p"))
    totals = powered.agg(
        F.sum("n").alias("tot_n"), F.sum("p").alias("tot_p")
    )
    joined = powered.crossJoin(F.broadcast(totals))
    nat = F.col("n") / F.col("tot_n")
    samp = F.col("p") / F.col("tot_p")
    return joined.select(
        "lang",
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(F.lit(1e-9) + nat, 6).alias("natural_share"),
        F.round(F.lit(1e-9) + samp, 6).alias("sampled_share"),
        F.round(F.lit(1e-9) + samp / nat, 6).alias("upsample_factor"),
    ).orderBy("lang")


SAMPLE_PER_LANG = 40


@register(
    "p04_stratified_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id
    FROM ranked WHERE rk <= {SAMPLE_PER_LANG}
    ORDER BY lang, rk
    """,
    category="pipeline",
    doc=(
        f"Deterministic stratified sample ({SAMPLE_PER_LANG}/language): rank "
        "docs by md5(doc_id) inside each language shard and keep the top "
        "N — a reproducible 'random' sample (same members on every engine, "
        "run, and cluster size; random()/TABLESAMPLE are not). One window "
        "per stratum, no global sort."
    ),
)
def p04_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).cast("bigint").alias("rk"))
        .filter(F.col("rk") <= SAMPLE_PER_LANG)
        .select("lang", "rk", "doc_id")
        .orderBy("lang", "rk")
    )


TOKEN_BUDGET = 20000


@register(
    "p05_token_budget_curriculum",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, lang,
             CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
             round(1e-9 + least(CAST(length(text) AS DOUBLE) / 500.0, 1.0), 6) AS quality
      FROM documents
    ),
    ranked AS (
      SELECT *, sum(n_tokens) OVER (PARTITION BY lang
                                    ORDER BY quality DESC, doc_id
                                    ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM feat
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_taken,
           round(1e-9 + min(quality), 6) AS worst_quality_admitted
    FROM ranked
    WHERE cum_tokens - n_tokens < {TOKEN_BUDGET}
    GROUP BY lang ORDER BY lang
    """,
    category="pipeline",
    doc=(
        f"Quality-first data selection under a token budget ({TOKEN_BUDGET}/"
        "language): rank docs by quality inside each shard, admit while the "
        "preceding-token cumsum is under budget (greedy knapsack, the "
        "curriculum/selection step of a training-data pipeline). Windowed "
        "cumsum per shard — one shuffle on the stratum key."
    ),
)
def p05_token_budget_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    quality = F.round(
        F.lit(1e-9) + F.least(F.length("text").cast("double") / 500.0, F.lit(1.0)), 6
    )
    feat = docs.select(
        "doc_id", "lang", n_tokens.alias("n_tokens"), quality.alias("quality")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("quality"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = feat.select(
        "lang", "n_tokens", "quality", F.sum("n_tokens").over(w).alias("cum_tokens")
    )
    return (
        ranked.filter(F.col("cum_tokens") - F.col("n_tokens") < TOKEN_BUDGET)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tokens_taken"),
            F.round(F.lit(1e-9) + F.min("quality"), 6).alias("worst_quality_admitted"),
        )
        .orderBy("lang")
    )


CHUNK_TOKENS = 40
CHUNK_STRIDE = 30


@register(
    "p06_context_chunking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, CAST(i / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
             CAST(i AS BIGINT) AS start_tok,
             CAST(least({CHUNK_TOKENS}, length(t) - i) AS BIGINT) AS n_tok,
             md5(array_to_string(t[i + 1 : i + least({CHUNK_TOKENS}, length(t) - i)], ' ')) AS chunk_md5
      FROM toks, unnest(range(0, length(t), {CHUNK_STRIDE})) AS r(i)
      WHERE length(t) > 0
    )
    SELECT doc_id, chunk_idx, start_tok, n_tok, chunk_md5
    FROM chunks ORDER BY doc_id, chunk_idx
    """,
    category="pipeline",
    doc=(
        "Overlapping context-window chunking (tokens 40, stride 30 — the "
        "doc-splitting step before tokenization/embedding in a RAG or "
        "pretraining pipeline): deterministic chunk grid per document, "
        "verified by per-chunk md5 of the joined token slice. Pure "
        "map-side explode — zero shuffles; at 100 TB this runs embedded "
        "in the ingest scan."
    ),
)
def p06_context_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    t = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    toks = docs.select("doc_id", t.alias("t")).filter(F.size("t") > 0)
    starts = F.sequence(F.lit(0), F.size("t") - 1, F.lit(CHUNK_STRIDE))
    chunked = toks.select("doc_id", F.size("t").alias("n"), F.explode(starts).alias("i"), "t")
    n_tok = F.least(F.lit(CHUNK_TOKENS), F.col("n") - F.col("i"))
    return (
        chunked.select(
            "doc_id",
            (F.col("i") / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
            F.col("i").cast("bigint").alias("start_tok"),
            n_tok.cast("bigint").alias("n_tok"),
            F.md5(F.concat_ws(" ", F.slice(F.col("t"), F.col("i") + 1, n_tok))).alias(
                "chunk_md5"
            ),
        )
        .orderBy("doc_id", "chunk_idx")
    )


N_EXPORT_SHARDS = 8
# Knuth multiplicative hash — exact integer arithmetic, identical on both
# engines (xxhash64/DuckDB-hash are engine-specific and would diverge)
_SHARD_SQL = f"CAST((doc_id * 2654435761) % 2147483647 % {N_EXPORT_SHARDS} AS BIGINT)"  # operands non-negative: % == pmod


@register(
    "p07_sharded_export",
    oracle=f"""
    SELECT {_SHARD_SQL} AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents
    GROUP BY shard ORDER BY shard
    """,
    category="pipeline",
    doc=(
        "Sharded training-data export: documents hash-assigned to "
        "N_EXPORT_SHARDS shards via a portable multiplicative hash (exact "
        "integer arithmetic — engine-native hash functions differ between "
        "Spark and DuckDB), written hive-partitioned by shard, then the "
        "manifest (per-shard counts, char totals, id range) is computed "
        "from the WRITTEN FILES while the oracle scans the source table — "
        "the hash match proves the export is lossless and the assignment "
        "deterministic. At 100 TB each shard directory is a self-contained "
        "training input consumed independently; maxRecordsPerFile bounds "
        "file sizes for loader parallelism."
    ),
)
def p07_sharded_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "shard",
        F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(2147483647))
        % N_EXPORT_SHARDS,
    )
    out = tempfile.mkdtemp(prefix="p07_export_")
    (
        docs.write.mode("overwrite")
        .option("maxRecordsPerFile", 50000)
        .partitionBy("shard")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return (
        back.groupBy(F.col("shard").cast("bigint").alias("shard"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
        .orderBy("shard")
    )


# --- p08: Z-order (Morton) layout clustering -------------------------------
# Bits per dimension: 8 → a 256×256 grid, 16-bit z-values, 64 write buckets.
_Z_BITS = 8
_Z_BUCKET_SHIFT = 10  # 64 buckets of 1024 z-cells each


def _z_spark(x, y):
    """Interleave the low _Z_BITS of x (even positions) and y (odd)."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(F.shiftleft(F.shiftrightunsigned(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftrightunsigned(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _z_sql(x: str, y: str) -> str:
    """The identical interleave as DuckDB SQL text (disjoint bits, so +)."""
    parts = []
    for i in range(_Z_BITS):
        parts.append(f"((({x} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(parts)


@register(
    "p08_zorder_layout",
    oracle=f"""
    WITH pts AS (
      SELECT (o_orderkey % 256) AS x, (o_custkey % 256) AS y FROM orders
    ),
    z AS (SELECT x, y, {_z_sql("x", "y")} AS zval FROM pts)
    SELECT CAST(zval >> {_Z_BUCKET_SHIFT} AS BIGINT) AS zbucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
           CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
    FROM z GROUP BY zbucket ORDER BY zbucket
    """,
    category="pipeline",
    doc=(
        "Z-order (Morton) layout clustering: interleave the bits of two "
        "bounded dimensions into a space-filling-curve key, bucket rows by "
        "z-range, and lay the table out hive-partitioned by bucket. Each "
        "bucket then covers a compact rectangle of (x, y) space — the "
        "min/max column stats per file let a scan with predicates on "
        "EITHER dimension skip most files (the Delta/Iceberg OPTIMIZE "
        "ZORDER story, done with plain Spark writes). The oracle replays "
        "the identical bit-interleave arithmetic in SQL and checks the "
        "per-bucket extents."
    ),
)
def p08_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    orders = load_table(spark, "orders", sf_dir)
    pts = orders.select(
        (F.col("o_orderkey") % 256).alias("x"), (F.col("o_custkey") % 256).alias("y")
    )
    z = pts.select(
        "x", "y", _z_spark(F.col("x"), F.col("y")).alias("zval")
    ).withColumn("zbucket", F.shiftrightunsigned(F.col("zval"), _Z_BUCKET_SHIFT))
    # Physically lay the data out clustered by z-bucket (the writer path a
    # table-OPTIMIZE job runs), then compute the per-bucket extents from
    # the files read back — proving the layout, not just the arithmetic.
    path = tempfile.mkdtemp(prefix="hds_zorder_")
    z.write.mode("overwrite").partitionBy("zbucket").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.groupBy(F.col("zbucket").cast("bigint").alias("zbucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("x").cast("bigint").alias("min_x"),
            F.max("x").cast("bigint").alias("max_x"),
            F.min("y").cast("bigint").alias("min_y"),
            F.max("y").cast("bigint").alias("max_y"),
        )
        .orderBy("zbucket")
    )


@register(
    "p09_full_corpus_pipeline",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, text,
             CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
      FROM documents WHERE n_chars >= 100
    ),
    admitted AS (SELECT * FROM toks WHERE n_tokens >= 20),
    dedup AS (
      SELECT doc_id, lang, n_tokens FROM (
        SELECT doc_id, lang, n_tokens,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM admitted
      ) WHERE rn = 1
    ),
    splits AS (
      SELECT doc_id, lang, n_tokens,
             CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT *,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 100 AS BIGINT) AS b
        FROM dedup
      )
    ),
    packed AS (
      SELECT split, lang, doc_id, n_tokens,
             CAST(floor(CAST(sum(n_tokens) OVER (PARTITION BY split, lang ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tokens AS DOUBLE)
                        / {PACK_CAPACITY}) AS BIGINT) AS pack_id
      FROM splits
    )
    SELECT split, lang, count(*) AS n_docs,
           CAST(max(pack_id) + 1 AS BIGINT) AS n_packs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM packed GROUP BY split, lang ORDER BY split, lang
    """,
    category="pipeline",
    doc=(
        "The full preprocessing pipeline COMPOSED as one DataFrame plan: "
        "quality gate (length + token floor, pushed to the scan) → exact "
        "dedup keep-first (md5 fingerprint window) → deterministic 90/5/5 "
        "hash split → per-(split, lang) context-window packing → summary. "
        "Each stage is an operator proven elsewhere (t-series, d01/d06, "
        "p02, p01); this entry proves they COMPOSE into the single-pass "
        "corpus job a user would actually run — two shuffles end-to-end "
        "(fingerprint, then the split/lang shard key), each reused by the "
        "window and the aggregate that follow it."
    ),
)
def p09_full_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(F.col("n_chars") >= 100)
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    # round 12 (guide §2.3/§8): materialize the 32-char fingerprint and
    # DROP text before the dedup window — partitionBy(md5(text)) kept the
    # full document body in the exchange input (the window's partition
    # expression references it), shuffling corpus bytes to move a
    # fingerprint decision. Same rows out: md5 is computed once per row
    # either way and text is never read downstream.
    admitted = docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.md5("text").alias("__fp"),
    ).filter(F.col("n_tokens") >= 20)
    w_fp = Window.partitionBy("__fp").orderBy("doc_id")
    dedup = (
        admitted.withColumn("rn", F.row_number().over(w_fp))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "n_tokens")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        % 100
    )
    splits = dedup.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test").alias("split"),
    )
    w_pack = Window.partitionBy("split", "lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = splits.select(
        "split",
        "lang",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w_pack) - F.col("n_tokens")).cast("double")
            / PACK_CAPACITY
        )
        .cast("bigint")
        .alias("pack_id"),
    )
    return (
        packed.groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            (F.max("pack_id") + 1).cast("bigint").alias("n_packs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        # ≤ split×lang rows: present_sorted drops orderBy's range exchange
        # AND its partitioner SAMPLE job, which re-executed the plan above
        # the last shuffle (round 12; same total order)
        .transform(present_sorted, "split", "lang")
    )


WEIGHTED_SAMPLE_K = 30


@register(
    "p10_weighted_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                      + 1 AS DOUBLE) / 16777217.0)
                ) / greatest(n_chars, 1) AS k
      FROM documents
    ),
    ranked AS (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY k DESC, doc_id) AS rk
      FROM keyed
    )
    SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM ranked WHERE rk <= {WEIGHTED_SAMPLE_K}
    ORDER BY lang, rk
    """,
    category="pipeline",
    doc=(
        f"Weight-proportional sampling without replacement "
        f"({WEIGHTED_SAMPLE_K}/language, weight = document length): the "
        "Efraimidis–Spirakis A-ES scheme with the uniform draw derived "
        "from md5(doc_id) instead of random(), so inclusion is "
        "reproducible across engines, runs, and cluster sizes. Key "
        "ln(u)/w orders identically to u^(1/w); top-K per stratum is one "
        "window over the lang shard — A-ES is THE distributable weighted "
        "sampler (per-partition top-K heaps merge associatively, so at "
        "100 TB this becomes partial top-K map-side with no global sort)."
    ),
)
def p10_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    u6 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("bigint")
    u = (u6 + 1).cast("double") / 16777217.0
    k = F.log(u) / F.greatest(F.col("n_chars"), F.lit(1))
    w = Window.partitionBy("lang").orderBy(F.desc("k"), "doc_id")
    return (
        docs.select("doc_id", "lang", "n_chars", k.alias("k"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= WEIGHTED_SAMPLE_K)
        .select(
            "lang",
            F.col("rk").cast("bigint").alias("rk"),
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
        .transform(lambda df: df.orderBy("lang", "rk"))
    )


EPOCHS = 2


@register(
    "p11_epoch_shuffle",
    oracle=f"""
    WITH epochs AS (SELECT unnest(generate_series(1, {EPOCHS})) AS epoch),
    ordered AS (
      SELECT epoch, doc_id, lang,
             row_number() OVER (
               PARTITION BY epoch
               ORDER BY md5('ep' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)),
                        doc_id) AS position
      FROM documents CROSS JOIN epochs
    )
    SELECT CAST(epoch AS BIGINT) AS epoch, CAST(position AS BIGINT) AS position,
           doc_id, lang
    FROM ordered
    WHERE position <= 20
    ORDER BY epoch, position
    """,
    category="pipeline",
    doc=(
        "Per-epoch training-data ordering: each epoch's presentation order "
        "is the rank under md5('ep<epoch>:' || doc_id) — a fresh "
        "deterministic permutation per epoch (different epochs decorrelate, "
        "the same epoch replays identically across runs, engines, and "
        "cluster sizes; random() gives you neither). The head of each "
        "epoch's order is emitted as the checkable artifact. One window "
        "per epoch shard; at scale the hash-rank becomes the sort key of "
        "the shard writer, not a global sort."
    ),
)
def p11_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    epochs = F.broadcast(
        docs.sparkSession.range(1, EPOCHS + 1).select(F.col("id").alias("epoch"))
    )
    key = F.md5(
        F.concat(
            F.lit("ep"),
            F.col("epoch").cast("string"),
            F.lit(":"),
            F.col("doc_id").cast("string"),
        )
    )
    w = Window.partitionBy("epoch").orderBy(key, "doc_id")
    return (
        docs.crossJoin(epochs)
        .select("epoch", "doc_id", "lang")
        .withColumn("position", F.row_number().over(w))
        .filter(F.col("position") <= 20)
        .select(
            F.col("epoch").cast("bigint").alias("epoch"),
            F.col("position").cast("bigint").alias("position"),
            "doc_id",
            "lang",
        )
        .transform(lambda df: df.orderBy("epoch", "position"))
    )


@register(
    "p12_dataset_card",
    oracle="""
    WITH per_doc AS (
      SELECT doc_id, lang,
             length(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             length(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS n_uniq,
             md5(lower(trim(text))) AS fp
      FROM documents
    ),
    langs AS (SELECT count(DISTINCT lang) AS n_langs FROM per_doc),
    dups AS (
      SELECT CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dups FROM per_doc
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(max(n_langs) AS BIGINT) AS n_langs,
           CAST(max(n_exact_dups) AS BIGINT) AS n_exact_dups,
           round(1e-9 + CAST(max(n_exact_dups) AS DOUBLE) / count(*), 6) AS dup_rate,
           round(1e-9 + avg(CAST(n_tokens AS DOUBLE)), 4) AS mean_tokens,
           round(1e-9 + avg(CAST(n_uniq AS DOUBLE) / greatest(n_tokens, 1)), 6) AS mean_ttr
    FROM per_doc CROSS JOIN langs CROSS JOIN dups
    """,
    category="pipeline",
    doc=(
        "Dataset card (datasheet) summary: the one-row corpus profile a "
        "released dataset ships with — document and token counts, "
        "language spread, exact-duplicate rate (md5 fingerprints), and "
        "mean lexical diversity. All per-doc features come out of ONE "
        "projection over the scan; the distinct-fingerprint and "
        "distinct-lang counts ride the same aggregation pass. At 100 TB "
        "this is the job that stamps every corpus snapshot before "
        "training reads it."
    ),
)
def p12_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    low = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    per_doc = docs.select(
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(low)).alias("n_uniq"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
    )
    n_dups = F.count("*") - F.count_distinct(F.col("fp"))
    return per_doc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.count_distinct(F.col("lang")).cast("bigint").alias("n_langs"),
        n_dups.cast("bigint").alias("n_exact_dups"),
        F.round(F.lit(1e-9) + n_dups.cast("double") / F.count("*"), 6).alias(
            "dup_rate"
        ),
        F.round(F.lit(1e-9) + F.avg(F.col("n_tokens").cast("double")), 4).alias(
            "mean_tokens"
        ),
        F.round(
            F.lit(1e-9)
            + F.avg(
                F.col("n_uniq").cast("double") / F.greatest(F.col("n_tokens"), F.lit(1))
            ),
            6,
        ).alias("mean_ttr"),
    )


@register(
    "p13_balanced_shards",
    oracle="""
    WITH sized AS (
      SELECT doc_id, length(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             row_number() OVER (ORDER BY length(regexp_split_to_array(trim(text), '\\s+')) DESC,
                                doc_id) AS rk
      FROM documents),
    assigned AS (
      SELECT doc_id, n_tokens,
             CASE WHEN ((rk - 1) // 8) % 2 = 0 THEN (rk - 1) % 8
                  ELSE 7 - ((rk - 1) % 8) END AS shard
      FROM sized)
    SELECT CAST(shard AS BIGINT) AS shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM assigned GROUP BY shard ORDER BY shard
    """,
    category="pipeline",
    doc=(
        "Size-balanced shard assignment via snake (boustrophedon) order: "
        "documents ranked by token count descending, dealt across 8 shards "
        "alternating direction each pass — the deterministic one-pass "
        "approximation of longest-processing-time scheduling. Measured on "
        "the test corpus: ~1.004 max/min token imbalance vs ~1.17 for "
        "naive round-robin — the difference between stragglers and even "
        "training shards. One global rank over (size, doc_id); at 100 TB "
        "the same rank is computed per size-bucket to avoid a global sort."
    ),
)
def p13_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    w = Window.orderBy(F.desc("n_tokens"), F.asc("doc_id"))
    sized = docs.select("doc_id", n_tokens.alias("n_tokens")).withColumn(
        "rk", F.row_number().over(w)
    )
    pass_no = F.expr("(rk - 1) div 8")
    pos = (F.col("rk") - 1) % 8
    shard = F.when(pass_no % 2 == 0, pos).otherwise(7 - pos)
    return (
        sized.select("doc_id", "n_tokens", shard.cast("bigint").alias("shard"))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .transform(present_sorted, "shard")
    )


@register(
    "p14_contamination_aware_split",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents),
    grams AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS g
      FROM toks, unnest(range(1, length(t) - 2)) AS r(i) WHERE length(t) >= 4),
    bench_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id % 100 = 0),
    contaminated AS (
      SELECT DISTINCT doc_id FROM grams WHERE doc_id % 100 <> 0
        AND g IN (SELECT g FROM bench_grams)),
    assigned AS (
      SELECT d.doc_id,
             CASE WHEN d.doc_id % 100 = 0 THEN 'benchmark'
                  WHEN c.doc_id IS NOT NULL THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT
                       % 100 < 90 THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT
                       % 100 < 95 THEN 'val'
                  ELSE 'test' END AS split,
             (c.doc_id IS NOT NULL) AS contaminated
      FROM documents d LEFT JOIN contaminated c USING (doc_id))
    SELECT split, contaminated, CAST(count(*) AS BIGINT) AS n_docs
    FROM assigned GROUP BY split, contaminated ORDER BY split, contaminated
    """,
    category="pipeline",
    doc=(
        "Contamination-aware train/val/test split: p02's deterministic md5 "
        "buckets, with one extra rule — any document sharing a 4-gram with "
        "the held-out benchmark (d08's broadcast contamination check) is "
        "FORCED into train, so eval splits can never contain "
        "benchmark-overlapping text regardless of where its hash bucket "
        "landed. The output proves it: contaminated=true appears only "
        "under train. Same scale shape as d08 (benchmark grams broadcast, "
        "corpus never shuffles for the check) plus one hash-bucket "
        "projection."
    ),
)
def p14_contamination_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    t = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    # Round 11: the 4-grams were built by transform(sequence(1, n-3),
    # i -> concat_ws(element_at(t, i)...element_at(t, i+3))) with ``t`` a
    # CAPTURED (non-column) subtree — Catalyst re-evaluates the whole
    # split(lower(trim(text))) per element_at per element (4 re-splits per
    # gram, over the FULL 5k-doc corpus; this one projection was ~10 s of
    # p14's 10.9 s at sf0.1). Same fix as dedup._shingled: materialize the
    # token array in its own projection, build positional 4-grams as
    # zip_with over 4 shifted slices (sliced once per row; lambda is a pure
    # 2-arg concat). Gram list is element-for-element identical — order and
    # duplicates preserved (downstream uses DISTINCT on both derivations,
    # and the oracle is unchanged).
    tk = F.col("__hds_toks")
    n = F.size(tk)
    m = n - 3
    acc = F.slice(tk, 1, m)
    for j in (2, 3, 4):
        acc = F.zip_with(
            acc, F.slice(tk, j, m), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    grams4 = F.when(n >= 4, acc).otherwise(F.array().cast("array<string>"))
    grams = (
        docs.select("doc_id", t.alias("__hds_toks"))
        .select("doc_id", F.explode(grams4).alias("g"))
        .localCheckpoint(eager=True)
    )  # bench grams + contamination probe both
    # derive from this one corpus pass; without the pin Spark re-runs the
    # explode subtree per reference (scan-audit enforced)
    bench_grams = grams.filter(F.col("doc_id") % 100 == 0).select("g").distinct()
    contaminated = (
        grams.filter(F.col("doc_id") % 100 != 0)
        .join(F.broadcast(bench_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_cont", F.lit(True))
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        % 100
    )
    assigned = docs.join(F.broadcast(contaminated), "doc_id", "left").select(
        F.when(F.col("doc_id") % 100 == 0, "benchmark")
        .when(F.col("is_cont"), "train")
        .when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
        .alias("split"),
        F.coalesce(F.col("is_cont"), F.lit(False)).alias("contaminated"),
    )
    return (
        assigned.groupBy("split", "contaminated")
        .agg(F.count("*").alias("n_docs"))
        .transform(present_sorted, "split", "contaminated")
    )


@register(
    "p15_mixture_lp",
    oracle="""
    WITH t AS (
      SELECT source,
             length(regexp_split_to_array(lower(trim(text)), '\\s+')) AS nt,
             length(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS nd
      FROM documents
    ),
    s AS (
      SELECT source, sum(nt) AS supply, CAST(sum(nd) AS DOUBLE) / sum(nt) AS q
      FROM t GROUP BY source
    ),
    b AS (SELECT CAST(floor(0.5 * sum(supply)) AS BIGINT) AS budget FROM s),
    r AS (
      SELECT s.source, s.supply, s.q, b.budget,
             coalesce(sum(s.supply) OVER (ORDER BY s.q DESC, s.source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
      FROM s, b
    )
    SELECT source,
           CAST(supply AS BIGINT) AS supply_tokens,
           round(1e-9 + q, 6) AS quality,
           round(1e-9 + GREATEST(0.0, LEAST(CAST(supply AS DOUBLE),
                                            CAST(budget - cum_prev AS DOUBLE))), 4)
               AS alloc_tokens
    FROM r ORDER BY source
    """,
    category="pipeline",
    doc=(
        "Optimal data-mixture selection as a LINEAR PROGRAM solved by the "
        "in-repo simplex (optim/simplex.py — the engine's flagship "
        "capability composed with the LLM-pipeline layer): maximize "
        "quality-weighted tokens  max Σ q_s·x_s  s.t.  0 ≤ x_s ≤ supply_s, "
        "Σ x_s ≤ budget (= 50% of corpus tokens), where q_s is each "
        "source's distinct-token ratio (exact integer-sum ratio, so both "
        "engines compute bit-identical coefficients). This LP is a "
        "fractional knapsack, so its unique optimum (q_s are distinct) has "
        "the greedy closed form the DuckDB oracle replays with a window "
        "cumsum — the simplex result is hash-checked against an "
        "INDEPENDENT analytic solution, not a reimplementation. Scale: one "
        "map-side-combined aggregation to |sources| rows; the LP itself is "
        "|sources| variables on the driver — the same bounded-collect "
        "contract as the optim layer."
    ),
)
def p15_mixture_lp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from highs_duckdb_spark.optim.simplex import solve_lp

    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    per_source = (
        docs.select(
            "source",
            F.size(toks).alias("nt"),
            F.size(F.array_distinct(toks)).alias("nd"),
        )
        .groupBy("source")
        .agg(F.sum("nt").alias("supply"), F.sum("nd").alias("nd"))
        .collect()  # bounded: one row per source
    )
    rows = sorted(per_source, key=lambda r: r["source"])
    supply = [int(r["supply"]) for r in rows]
    q = [int(r["nd"]) / int(r["supply"]) for r in rows]
    budget = int(0.5 * sum(supply))
    n = len(rows)
    res = solve_lp(
        c=[-qi for qi in q],  # minimize-only solver: negate to maximize
        a_dense=[1.0] * n,  # single structural row: Σ x_s ≤ budget
        row_lb=[0.0],
        row_ub=[float(budget)],
        col_lb=[0.0] * n,
        col_ub=[float(s) for s in supply],
    )
    if res.status != "Optimal":  # pragma: no cover - LP is trivially feasible
        raise RuntimeError(f"mixture LP returned {res.status}")
    # Canonicalize ties: sources with equal q are interchangeable in any
    # optimum (multiple optimal vertices), so the simplex may land on a
    # different one than the oracle's greedy (ORDER BY q DESC, source).
    # Redistribute each equal-q group's total mass in source order — same
    # objective and feasibility, deterministic vertex.
    x = [float(res.x[i]) for i in range(n)]
    groups: dict[float, list[int]] = {}
    for i in range(n):
        groups.setdefault(q[i], []).append(i)
    for idxs in groups.values():
        if len(idxs) > 1:
            mass = sum(x[i] for i in idxs)
            for i in idxs:  # rows already sorted by source
                take = min(mass, float(supply[i]))
                x[i] = take
                mass -= take
    out = [
        (
            rows[i]["source"],
            supply[i],
            round(1e-9 + q[i], 6),
            round(1e-9 + x[i], 4),
        )
        for i in range(n)
    ]
    return local_rows_df(
        spark,
        out,
        "source string, supply_tokens bigint, quality double, alloc_tokens double",
    ).orderBy("source")
