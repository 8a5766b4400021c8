"""Text-analysis operators over the ``documents`` table (beyond-reference,
north-star LLM-pipeline surface; BASELINE.json).

Everything here stays JVM-side (builtin ``pyspark.sql.functions`` only): at
100 TB these run inside whole-stage codegen over the parquet scan with no
Python in the hot path. Where a DuckDB oracle is declared, the formula is
expressed identically in both dialects (both use RE2-compatible regexes and
identical md5).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from highs_duckdb_spark.functions.presentation import ordered_wide, present_sorted
from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.session import load_table, local_rows_df

# Tiny per-language stopword marker lists for the heuristic language-ID.
# Deliberately small + deterministic so the oracle SQL can repeat them.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "und", "die", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "que", "de", "y"),
    "zh": ("的", "是", "了", "在", "我"),
}


@register(
    "t01_text_stats",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
           round(1e-9 + CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / greatest(length(regexp_split_to_array(trim(text), '\\s+')), 1), 4) AS avg_token_len
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
    category="text",
    doc="Char/token/punctuation counts + average token length per document.",
)
def t01_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    tokens = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(tokens).cast("bigint")
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        F.length(F.regexp_replace(F.col("text"), r"[^.,;:!?]", "")).cast("bigint").alias(
            "n_punct"
        ),
        F.round(F.lit(1e-9) + 
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.greatest(n_tokens, F.lit(1)),
            4,
        ).alias("avg_token_len"),
    ).orderBy("doc_id")


def _marker_hits_spark(lang: str):
    toks = F.split(F.lower(F.col("text")), r"\s+")
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.array_intersect(F.array_distinct(toks), markers))


def _marker_hits_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return (
        "length(list_intersect(list_distinct(regexp_split_to_array(lower(text), '\\s+')), "
        f"[{markers}]))"
    )


@register(
    "t02_language_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_marker_hits_sql('en')} AS hits_en,
             {_marker_hits_sql('de')} AS hits_de,
             {_marker_hits_sql('fr')} AS hits_fr,
             {_marker_hits_sql('es')} AS hits_es,
             {_marker_hits_sql('zh')} AS hits_zh
      FROM documents
    )
    SELECT doc_id, lang,
           CASE
             WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es AND hits_en >= hits_zh THEN 'en'
             WHEN hits_de >= hits_fr AND hits_de >= hits_es AND hits_de >= hits_zh THEN 'de'
             WHEN hits_fr >= hits_es AND hits_fr >= hits_zh THEN 'fr'
             WHEN hits_es >= hits_zh THEN 'es'
             ELSE 'zh'
           END AS predicted_lang,
           CAST(hits_en + hits_de + hits_fr + hits_es + hits_zh AS BIGINT) AS marker_hits
    FROM scored
    ORDER BY doc_id
    """,
    category="text",
    doc="Heuristic language ID: distinct-token overlap with per-language marker lists, argmax with deterministic tie-break.",
)
def t02_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    hits = {lang: _marker_hits_spark(lang) for lang in ("en", "de", "fr", "es", "zh")}
    scored = docs.select(
        "doc_id",
        "lang",
        hits["en"].alias("hits_en"),
        hits["de"].alias("hits_de"),
        hits["fr"].alias("hits_fr"),
        hits["es"].alias("hits_es"),
        hits["zh"].alias("hits_zh"),
    )
    h = {k: F.col(f"hits_{k}") for k in ("en", "de", "fr", "es", "zh")}
    predicted = (
        F.when(
            (h["en"] >= h["de"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["es"]) & (h["en"] >= h["zh"]),
            "en",
        )
        .when((h["de"] >= h["fr"]) & (h["de"] >= h["es"]) & (h["de"] >= h["zh"]), "de")
        .when((h["fr"] >= h["es"]) & (h["fr"] >= h["zh"]), "fr")
        .when(h["es"] >= h["zh"], "es")
        .otherwise("zh")
    )
    return scored.select(
        "doc_id",
        "lang",
        predicted.alias("predicted_lang"),
        (h["en"] + h["de"] + h["fr"] + h["es"] + h["zh"]).cast("bigint").alias("marker_hits"),
    ).orderBy("doc_id")


@register(
    "t03_token_count",
    oracle="""
    SELECT doc_id,
           CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
           CAST(length(regexp_split_to_array(trim(text), '[^a-zA-Z0-9]+')) AS BIGINT) AS bpe_ish_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS byte_len_estimate
    FROM documents
    ORDER BY doc_id
    """,
    category="text",
    doc="Token counting: whitespace tokens, alnum-piece (BPE-ish) tokens, chars/4 LLM estimate.",
)
def t03_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("ws_tokens"),
        F.size(F.split(F.trim(F.col("text")), r"[^a-zA-Z0-9]+")).cast("bigint").alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("byte_len_estimate"),
    ).orderBy("doc_id")


@register(
    "t04_quality_score",
    oracle="""
    WITH feat AS (
      SELECT doc_id, lang,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_tokens,
             CAST(length(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS DOUBLE) AS n_uniq
      FROM documents
    )
    SELECT doc_id, lang,
           round(1e-9 + least(n_chars / 500.0, 1.0), 4) AS length_score,
           round(1e-9 + n_uniq / greatest(n_tokens, 1.0), 4) AS diversity_score,
           round(1e-9 + 0.5 * least(n_chars / 500.0, 1.0)
                 + 0.5 * (n_uniq / greatest(n_tokens, 1.0)), 4) AS quality
    FROM feat
    ORDER BY doc_id
    """,
    category="text",
    doc="Composite quality score: normalized length + lexical diversity (distinct/total tokens).",
)
def t04_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_chars = F.length("text").cast("double")
    n_tokens = F.size(toks).cast("double")
    n_uniq = F.size(F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))).cast(
        "double"
    )
    length_score = F.least(n_chars / 500.0, F.lit(1.0))
    diversity = n_uniq / F.greatest(n_tokens, F.lit(1.0))
    return docs.select(
        "doc_id",
        "lang",
        F.round(F.lit(1e-9) + length_score, 4).alias("length_score"),
        F.round(F.lit(1e-9) + diversity, 4).alias("diversity_score"),
        F.round(F.lit(1e-9) + 0.5 * length_score + 0.5 * diversity, 4).alias("quality"),
    ).orderBy("doc_id")


@register(
    "t05_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
           substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 8) AS bucket
    FROM documents
    ORDER BY doc_id
    """,
    category="text",
    doc="Document fingerprint: md5 over whitespace-normalized, case-folded text (identical digests in both engines).",
)
def t05_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    normalized = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    fp = F.md5(normalized)
    # corpus-sized result: a parallel range-sort, NOT present_sorted —
    # coalesce(1) would pull the whole upstream regex+md5 pipeline onto one
    # core (measured 4.5s -> 0.6s at sf10)
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("bucket"),
    ).orderBy("doc_id")


@register(
    "t06_dedup_keep_best",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
             CAST(length(text) AS BIGINT) AS sz
      FROM documents
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY fingerprint
                                   ORDER BY sz DESC, doc_id) AS rk
      FROM scored
    )
    SELECT doc_id, fingerprint, sz AS doc_size, CAST(rk = 1 AS BOOLEAN) AS is_kept
    FROM ranked ORDER BY doc_id
    """,
    category="dedup",
    doc=(
        "Keep-best dedup policy: within each exact-duplicate group keep the "
        "highest-quality copy (longest, ties → lowest id) via a ranking "
        "window over the fingerprint partition — the standard production "
        "variant of keep-first."
    ),
)
def t06_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    normalized = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    scored = docs.select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
        F.length("text").cast("bigint").alias("doc_size"),
    )
    w = Window.partitionBy("fingerprint").orderBy(F.desc("doc_size"), F.asc("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .select("doc_id", "fingerprint", "doc_size", (F.col("rk") == 1).alias("is_kept"))
        .orderBy("doc_id")
    )


@register(
    "t08_corpus_filter_pipeline",
    oracle="""
    WITH feat AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_tokens,
             CAST(length(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS DOUBLE) AS n_uniq
      FROM documents
    ),
    scored AS (
      SELECT doc_id, n_chars,
             0.5 * least(n_chars / 500.0, 1.0)
             + 0.5 * (n_uniq / greatest(n_tokens, 1.0)) AS quality,
             min(doc_id) OVER (PARTITION BY fp) AS keeper
      FROM feat
    )
    SELECT doc_id,
           CASE
             WHEN doc_id <> keeper THEN 'duplicate'
             WHEN n_chars < 80 THEN 'too_short'
             WHEN n_chars > 2000 THEN 'too_long'
             WHEN quality < 0.5 THEN 'low_quality'
             ELSE 'kept'
           END AS verdict,
           CAST(doc_id = keeper AND n_chars >= 80 AND n_chars <= 2000
                AND quality >= 0.5 AS BOOLEAN) AS is_kept
    FROM scored
    ORDER BY doc_id
    """,
    category="text",
    doc=(
        "End-to-end corpus filter: exact-dup keeper (md5 window) + length "
        "bounds + composite quality gate, with a first-failure verdict per "
        "document — the composed training-data admission pipeline. One "
        "shuffle (fingerprint window); every score is codegen expressions."
    ),
)
def t08_corpus_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    toks = F.split(F.trim(F.col("text")), r"\s+")
    feat = docs.select(
        "doc_id",
        F.md5(norm).alias("fp"),
        F.length("text").cast("double").alias("n_chars"),
        F.size(toks).cast("double").alias("n_tokens"),
        F.size(F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+")))
        .cast("double")
        .alias("n_uniq"),
    )
    quality = (
        0.5 * F.least(F.col("n_chars") / 500.0, F.lit(1.0))
        + 0.5 * (F.col("n_uniq") / F.greatest(F.col("n_tokens"), F.lit(1.0)))
    )
    scored = feat.select(
        "doc_id",
        "n_chars",
        quality.alias("quality"),
        F.min("doc_id").over(Window.partitionBy("fp")).alias("keeper"),
    )
    verdict = (
        F.when(F.col("doc_id") != F.col("keeper"), "duplicate")
        .when(F.col("n_chars") < 80, "too_short")
        .when(F.col("n_chars") > 2000, "too_long")
        .when(F.col("quality") < 0.5, "low_quality")
        .otherwise("kept")
    )
    is_kept = (
        (F.col("doc_id") == F.col("keeper"))
        & (F.col("n_chars") >= 80)
        & (F.col("n_chars") <= 2000)
        & (F.col("quality") >= 0.5)
    )
    return (
        scored.select("doc_id", verdict.alias("verdict"), is_kept.alias("is_kept"))
        .orderBy("doc_id")
    )


LM_DOC_LIMIT = 200


@register(
    "t09_bigram_lm_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE doc_id < {LM_DOC_LIMIT}
    ),
    big AS (
      SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      FROM toks, unnest(range(1, length(t))) AS r(i)
      WHERE length(t) >= 2
    ),
    cnt2 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
    cnt1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
    scored AS (
      SELECT b.doc_id, ln(CAST(c12 AS DOUBLE) / c1) AS lp
      FROM big b JOIN cnt2 USING (w1, w2) JOIN cnt1 USING (w1)
    )
    SELECT doc_id,
           count(*) AS n_bigrams,
           round(1e-9 + avg(lp), 4) AS avg_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    category="text",
    doc=(
        "Bigram language-model fluency score: train P(w2|w1) = c12/c1 on the "
        "corpus itself, score each document by its mean bigram log-prob — "
        "the classic cheap perplexity proxy for corpus filtering. Counts "
        "are two grouped aggregations over one exploded-bigram pass; "
        "scoring joins occurrences back on (w1, w2) and w1."
    ),
)
def t09_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < LM_DOC_LIMIT)
    t = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    toks = docs.select("doc_id", t.alias("t")).filter(F.size("t") >= 2)
    bg = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.struct(
            F.element_at(F.col("t"), i).alias("w1"),
            F.element_at(F.col("t"), i + 1).alias("w2"),
        ),
    )
    big = toks.select("doc_id", F.explode(bg).alias("b")).select("doc_id", "b.w1", "b.w2")
    cnt2 = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    cnt1 = big.groupBy("w1").agg(F.count("*").alias("c1"))
    scored = (
        big.join(cnt2, ["w1", "w2"])
        .join(cnt1, ["w1"])
        .select("doc_id", F.log(F.col("c12").cast("double") / F.col("c1")).alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.lit(1e-9) + F.avg("lp"), 4).alias("avg_logprob"),
        )
        .transform(ordered_wide, "doc_id")
    )


@register(
    "t10_trigram_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    tri AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS tg
      FROM toks, unnest(range(1, length(t) - 1)) AS r(i)
      WHERE length(t) >= 3
    ),
    cnt AS (
      SELECT doc_id, tg, count(*) AS c FROM tri GROUP BY doc_id, tg
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_trigrams,
           round(1e-9 + CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_trigram_share,
           CAST(max(c) > 1 AS BOOLEAN) AS has_repeats
    FROM cnt GROUP BY doc_id ORDER BY doc_id
    """,
    category="text",
    doc=(
        "Intra-document trigram repetition (Gopher/C4-style quality rule): "
        "the share of a document's trigrams taken by its single most "
        "frequent trigram — boilerplate and degenerate generations score "
        "high. Tokens explode map-side; both aggregations key on doc_id, "
        "so the exploded rows shuffle once (partial aggregation collapses "
        "duplicate trigrams before the exchange)."
    ),
)
def t10_trigram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    t = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    toks = docs.select("doc_id", t.alias("t")).filter(F.size("t") >= 3)
    tg = F.transform(
        F.sequence(F.lit(1), F.size("t") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("t"), i),
            F.element_at(F.col("t"), i + 1),
            F.element_at(F.col("t"), i + 2),
        ),
    )
    tri = toks.select("doc_id", F.explode(tg).alias("tg"))
    cnt = tri.groupBy("doc_id", "tg").agg(F.count("*").alias("c"))
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_trigrams"),
            F.round(
                F.lit(1e-9) + F.max("c").cast("double") / F.sum("c"), 6
            ).alias("top_trigram_share"),
            (F.max("c") > 1).alias("has_repeats"),
        )
        .transform(ordered_wide, "doc_id")
    )


@register(
    "t11_pmi_bigrams",
    oracle="""
    WITH toks AS (
      SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    big AS (
      SELECT t[i] AS tok_a, t[i+1] AS tok_b
      FROM toks, unnest(range(1, length(t))) AS r(i)
      WHERE length(t) >= 2
    ),
    uni AS (SELECT unnest(t) AS tok FROM toks),
    ucnt AS (SELECT tok, count(*) AS c FROM uni GROUP BY tok),
    bcnt AS (SELECT tok_a, tok_b, count(*) AS c_ab FROM big GROUP BY tok_a, tok_b),
    tot AS (SELECT (SELECT count(*) FROM big) AS n_bi, (SELECT count(*) FROM uni) AS n_uni)
    SELECT tok_a, tok_b, CAST(c_ab AS BIGINT) AS c_ab,
           round(1e-9 + ln((CAST(c_ab AS DOUBLE) * n_uni * n_uni)
                           / (CAST(n_bi AS DOUBLE) * ca.c * cb.c)), 6) AS pmi
    FROM bcnt
    JOIN ucnt ca ON bcnt.tok_a = ca.tok
    JOIN ucnt cb ON bcnt.tok_b = cb.tok
    CROSS JOIN tot
    WHERE c_ab >= 5
    ORDER BY tok_a, tok_b
    """,
    category="text",
    doc=(
        "Pointwise mutual information of adjacent token bigrams over the "
        "corpus — the classic collocation / phrase-mining statistic. "
        "Scale shape: the corpus is scanned exactly ONCE — each document's "
        "token array gets an end-of-doc sentinel, so every token occurs "
        "exactly once as the left element of a bigram and the unigram "
        "counts are marginals of the sentinel-extended bigram counts "
        "(Σ_b count[t,b] = count[t]). That one vocab²-sized aggregate is "
        "locally checkpointed (it's tiny at any corpus size), and every "
        "downstream quantity — unigram counts, both scalar totals, the "
        "PMI itself — derives from it without touching the corpus again; "
        "a naive ucnt/bcnt/totals formulation re-scans the corpus once "
        "per reference (5 scans) because Spark duplicates self-referenced "
        "aggregate subtrees."
    ),
)
def t11_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    # End-of-doc sentinel. A NUL byte cannot appear in a token unless the
    # raw text itself contains NUL (binary junk a text pipeline rejects
    # upstream) — unlike a markup-ish literal such as '</s>', which DOES
    # occur in crawled/LLM-formatted corpora and would silently merge
    # counts with real tokens.
    sent = "\x00"
    t = F.concat(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), F.array(F.lit(sent))
    )
    toks = docs.select(t.alias("t"))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.struct(
            F.element_at(F.col("t"), i).alias("tok_a"),
            F.element_at(F.col("t"), i + 1).alias("tok_b"),
        ),
    )
    big = toks.select(F.explode(pairs).alias("p")).select("p.tok_a", "p.tok_b")
    # One map-side-combined aggregation over the scan, then cut lineage:
    # every reference below reuses these few-hundred rows, not the corpus.
    bcnt = (
        big.groupBy("tok_a", "tok_b").agg(F.count("*").alias("c_ab")).localCheckpoint()
    )
    ucnt = bcnt.groupBy("tok_a").agg(F.sum("c_ab").alias("c"))
    real = bcnt.filter(F.col("tok_b") != sent)
    tot = F.broadcast(
        real.agg(F.sum("c_ab").alias("n_bi")).crossJoin(
            ucnt.agg(F.sum("c").alias("n_uni"))
        )
    )
    ca = F.broadcast(ucnt.select(F.col("tok_a"), F.col("c").alias("ca")))
    cb = F.broadcast(
        ucnt.select(F.col("tok_a").alias("tok_b"), F.col("c").alias("cb"))
    )
    pmi = F.log(
        (F.col("c_ab").cast("double") * F.col("n_uni") * F.col("n_uni"))
        / (F.col("n_bi").cast("double") * F.col("ca") * F.col("cb"))
    )
    return (
        real.join(ca, "tok_a")
        .join(cb, "tok_b")
        .crossJoin(tot)
        .filter(F.col("c_ab") >= 5)
        .select(
            "tok_a",
            "tok_b",
            F.col("c_ab").cast("bigint").alias("c_ab"),
            F.round(F.lit(1e-9) + pmi, 6).alias("pmi"),
        )
        .transform(present_sorted, "tok_a", "tok_b")
    )


# PII patterns — kept to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repetition, \d, \b.
PAT_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PAT_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PAT_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_T12_ORACLE = """
    WITH injected AS (
      SELECT doc_id,
             CASE WHEN doc_id % 37 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or 555-867-5309 at 10.1.'
                       || CAST(doc_id % 256 AS VARCHAR) || '.7'
                  ELSE text END AS itext
      FROM documents
    ),
    counted AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(itext, '{E}')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(itext, '{P}')) AS BIGINT) AS n_phones,
             CAST(len(regexp_extract_all(itext, '{I}')) AS BIGINT) AS n_ips,
             md5(regexp_replace(regexp_replace(regexp_replace(itext,
                   '{E}', '<EMAIL>', 'g'),
                   '{P}', '<PHONE>', 'g'),
                   '{I}', '<IP>', 'g')) AS redacted_md5
      FROM injected
    )
    SELECT doc_id, n_emails, n_phones, n_ips, redacted_md5
    FROM counted
    WHERE n_emails + n_phones + n_ips > 0
    ORDER BY doc_id
""".replace("{E}", PAT_EMAIL).replace("{P}", PAT_PHONE).replace("{I}", PAT_IP)


@register(
    "t12_pii_redaction",
    oracle=_T12_ORACLE,
    category="text",
    doc=(
        "PII detection + redaction (emails / NANP phone numbers / IPv4 "
        "addresses) — the compliance scrub every released corpus runs. The "
        "synthetic corpus contains no organic PII, so a deterministic "
        "injection (doc_id % 37) seeds known matches that both engines "
        "derive identically; the md5 of the redacted text proves the "
        "replacement semantics match byte-for-byte. Pure codegen "
        "regexp_count/regexp_replace over the scan — no shuffle at all "
        "until the tiny flagged subset is collected; patterns are "
        "restricted to the Java-regex ∩ RE2 common dialect."
    ),
)
def t12_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    itext = F.when(
        F.col("doc_id") % 37 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-867-5309 at 10.1."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ),
    ).otherwise(F.col("text"))
    base = docs.select("doc_id", itext.alias("itext"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("itext"), PAT_EMAIL, "<EMAIL>"),
            PAT_PHONE,
            "<PHONE>",
        ),
        PAT_IP,
        "<IP>",
    )
    out = base.select(
        "doc_id",
        F.regexp_count(F.col("itext"), F.lit(PAT_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(F.col("itext"), F.lit(PAT_PHONE)).cast("bigint").alias("n_phones"),
        F.regexp_count(F.col("itext"), F.lit(PAT_IP)).cast("bigint").alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    )
    return out.filter(
        F.col("n_emails") + F.col("n_phones") + F.col("n_ips") > 0
    ).transform(ordered_wide, "doc_id")


@register(
    "t13_zipf_fit",
    oracle="""
    WITH toks AS (
      SELECT lang, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    freq AS (SELECT lang, tok, count(*) AS c FROM toks GROUP BY lang, tok),
    ranked AS (
      SELECT lang, tok, c,
             row_number() OVER (PARTITION BY lang ORDER BY c DESC, tok) AS rk
      FROM freq
    )
    SELECT lang,
           round(1e-9 + regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(rk AS DOUBLE))), 4) AS zipf_slope,
           round(1e-9 + regr_r2(ln(CAST(c AS DOUBLE)), ln(CAST(rk AS DOUBLE))), 6) AS zipf_r2,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(c) AS BIGINT) AS n_tokens
    FROM ranked
    GROUP BY lang
    ORDER BY lang
    """,
    category="text",
    doc=(
        "Zipf's-law fit per language shard: regress ln(frequency) on "
        "ln(rank) over the rank-frequency table (slope ≈ −1 for natural "
        "text; the synthetic corpus's near-uniform vocabulary fits a much "
        "flatter slope — exactly the kind of distribution-shape screen a "
        "corpus-health dashboard runs). Token counts aggregate map-side "
        "onto the (lang, token) vocabulary; the regression sees only "
        "vocab-sized input, so corpus volume never reaches the window or "
        "the fit."
    ),
)
def t13_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    )
    freq = toks.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), "tok")
    ranked = freq.withColumn("rk", F.row_number().over(w))
    ln_c = F.log(F.col("c").cast("double"))
    ln_rk = F.log(F.col("rk").cast("double"))
    return (
        ranked.groupBy("lang")
        .agg(
            F.round(F.lit(1e-9) + F.regr_slope(ln_c, ln_rk), 4).alias("zipf_slope"),
            F.round(F.lit(1e-9) + F.regr_r2(ln_c, ln_rk), 6).alias("zipf_r2"),
            F.count("*").cast("bigint").alias("vocab"),
            F.sum("c").cast("bigint").alias("n_tokens"),
        )
        .transform(present_sorted, "lang")
    )


@register(
    "t14_token_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    cnt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
    wn AS (
      SELECT doc_id, c,
             sum(c) OVER (PARTITION BY doc_id) AS n,
             count(*) OVER (PARTITION BY doc_id) AS vocab
      FROM cnt
    )
    SELECT doc_id,
           CAST(max(n) AS BIGINT) AS n_tokens,
           CAST(max(vocab) AS BIGINT) AS vocab,
           round(1e-9 + CAST(max(vocab) AS DOUBLE) / max(n), 4) AS type_token_ratio,
           round(1e-9 + -sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)), 6) AS entropy
    FROM wn GROUP BY doc_id ORDER BY doc_id
    """,
    category="text",
    doc=(
        "Per-document lexical-diversity signals: Shannon entropy of the "
        "token histogram and the type-token ratio — low-entropy documents "
        "are the template/boilerplate junk quality pipelines drop, "
        "complementing t10's repetition rule (which looks at trigram "
        "structure) with a distributional measure. One linear pipeline: "
        "scan → (doc, token) count with map-side combine → per-doc window "
        "totals → final grouped entropy; no self-joins, no corpus rescan."
    ),
)
def t14_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    )
    cnt = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    wd = Window.partitionBy("doc_id")
    wn = cnt.select(
        "doc_id",
        "c",
        F.sum("c").over(wd).alias("n"),
        F.count("*").over(wd).alias("vocab"),
    )
    p = F.col("c").cast("double") / F.col("n")
    return (
        wn.groupBy("doc_id")
        .agg(
            F.max("n").cast("bigint").alias("n_tokens"),
            F.max("vocab").cast("bigint").alias("vocab"),
            F.round(
                F.lit(1e-9) + F.max("vocab").cast("double") / F.max("n"), 4
            ).alias("type_token_ratio"),
            F.round(F.lit(1e-9) + -F.sum(p * F.log(p)), 6).alias("entropy"),
        )
        .transform(ordered_wide, "doc_id")
    )


@register(
    "t15_vocab_coverage",
    oracle="""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    ranked AS (
      SELECT tok, c,
             row_number() OVER (ORDER BY c DESC, tok) AS rk,
             sum(c) OVER (ORDER BY c DESC, tok ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER () AS total
      FROM cnt
    )
    SELECT CAST(pct AS DOUBLE) AS coverage_target,
           CAST(min(rk) AS BIGINT) AS vocab_needed
    FROM ranked, (SELECT unnest([0.50, 0.90, 0.95, 0.99]) AS pct)
    WHERE CAST(cum AS DOUBLE) / total >= pct
    GROUP BY pct
    ORDER BY pct
    """,
    category="text",
    doc=(
        "Vocabulary coverage curve: how many of the most frequent tokens "
        "cover 50/90/95/99% of the token stream — the statistic that sizes "
        "a tokenizer vocabulary. Token counts aggregate map-side onto the "
        "vocabulary; the ranking windows and the coverage probe run over "
        "vocab-sized data, so corpus volume never reaches the sort. The "
        "global running-sum window is single-partition by nature — fine "
        "here because its input is the vocabulary, never the corpus."
    ),
)
def t15_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    )
    cnt = toks.groupBy("tok").agg(F.count("*").alias("c"))
    wo = Window.orderBy(F.desc("c"), "tok")
    ranked = cnt.select(
        "c",
        F.row_number().over(wo).alias("rk"),
        F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("c").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    pcts = local_rows_df(
        ranked.sparkSession, [(0.50,), (0.90,), (0.95,), (0.99,)], "pct double"
    )
    return (
        ranked.crossJoin(F.broadcast(pcts))
        .filter(F.col("cum").cast("double") / F.col("total") >= F.col("pct"))
        .groupBy(F.col("pct").cast("double").alias("coverage_target"))
        .agg(F.min("rk").cast("bigint").alias("vocab_needed"))
        .transform(present_sorted, "coverage_target")
    )


@register(
    "t16_langid_confusion",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_marker_hits_sql('en')} AS hits_en,
             {_marker_hits_sql('de')} AS hits_de,
             {_marker_hits_sql('fr')} AS hits_fr,
             {_marker_hits_sql('es')} AS hits_es,
             {_marker_hits_sql('zh')} AS hits_zh
      FROM documents
    ),
    pred AS (
      SELECT lang,
             CASE
               WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es AND hits_en >= hits_zh THEN 'en'
               WHEN hits_de >= hits_fr AND hits_de >= hits_es AND hits_de >= hits_zh THEN 'de'
               WHEN hits_fr >= hits_es AND hits_fr >= hits_zh THEN 'fr'
               WHEN hits_es >= hits_zh THEN 'es'
               ELSE 'zh'
             END AS predicted
      FROM scored
    )
    SELECT lang, predicted,
           CAST(count(*) AS BIGINT) AS n,
           round(1e-9 + CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER (PARTITION BY lang), 4) AS row_share
    FROM pred
    GROUP BY lang, predicted
    ORDER BY lang, predicted
    """,
    category="text",
    doc=(
        "Language-ID evaluation as a query: the confusion matrix of t02's "
        "heuristic classifier against the corpus's true lang labels, with "
        "per-true-language recall shares — the quality report every "
        "classifier deployed in a curation pipeline ships next to its "
        "predictions. One grouped pass; the share window runs over the "
        "langs² matrix."
    ),
)
def t16_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    hits = {lang: _marker_hits_spark(lang) for lang in ("en", "de", "fr", "es", "zh")}
    scored = docs.select(
        "lang", *[hits[k].alias(f"hits_{k}") for k in ("en", "de", "fr", "es", "zh")]
    )
    h = {k: F.col(f"hits_{k}") for k in ("en", "de", "fr", "es", "zh")}
    predicted = (
        F.when(
            (h["en"] >= h["de"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["es"]) & (h["en"] >= h["zh"]),
            "en",
        )
        .when((h["de"] >= h["fr"]) & (h["de"] >= h["es"]) & (h["de"] >= h["zh"]), "de")
        .when((h["fr"] >= h["es"]) & (h["fr"] >= h["zh"]), "fr")
        .when(h["es"] >= h["zh"], "es")
        .otherwise("zh")
    )
    wl = Window.partitionBy("lang")
    return (
        scored.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
        .select(
            "lang",
            "predicted",
            F.col("n").cast("bigint").alias("n"),
            F.round(
                F.lit(1e-9) + F.col("n").cast("double") / F.sum("n").over(wl), 4
            ).alias("row_share"),
        )
        .transform(present_sorted, "lang", "predicted")
    )


@register(
    "t17_gopher_rules",
    oracle="""
    WITH feat AS (
      SELECT doc_id,
             CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_words,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS n_digits,
             CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) AS n_symbols,
             round(1e-9 + CAST(length(replace(text, ' ', '')) AS DOUBLE)
                   / greatest(length(regexp_split_to_array(trim(text), '\\s+')), 1), 4)
               AS mean_word_len
      FROM documents
    )
    SELECT doc_id,
           n_words,
           mean_word_len,
           round(1e-9 + n_digits / n_chars, 6) AS digit_ratio,
           round(1e-9 + n_symbols / n_chars, 6) AS symbol_ratio,
           n_words >= 50 AND n_words <= 100000 AS ok_word_count,
           mean_word_len >= 3 AND mean_word_len <= 10 AS ok_word_len,
           n_digits / n_chars <= 0.2 AS ok_digits,
           n_symbols / n_chars <= 0.1 AS ok_symbols,
           (n_words >= 50 AND n_words <= 100000)
             AND (mean_word_len >= 3 AND mean_word_len <= 10)
             AND n_digits / n_chars <= 0.2
             AND n_symbols / n_chars <= 0.1 AS admitted
    FROM feat
    ORDER BY doc_id
    """,
    category="text",
    doc=(
        "Gopher-style quality rule bundle (the published heuristic gate "
        "family): word-count bounds, mean-word-length bounds, digit ratio, "
        "symbol ratio — each rule reported individually plus the combined "
        "admission verdict, so threshold tuning sees which rule fires. "
        "Pure codegen string expressions over one scan; the boolean "
        "columns compare on exact integer counts and 6dp-stable ratios."
    ),
)
def t17_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    n_chars = F.length("text").cast("double")
    n_digits = F.length(F.regexp_replace(F.col("text"), r"[^0-9]", "")).cast("double")
    n_symbols = F.length(
        F.regexp_replace(F.col("text"), r"[a-zA-Z0-9 ]", "")
    ).cast("double")
    mean_word_len = F.round(
        F.lit(1e-9)
        + F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
        / F.greatest(F.size(F.split(F.trim(F.col("text")), r"\s+")), F.lit(1)),
        4,
    )
    feat = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_chars.alias("n_chars"),
        n_digits.alias("n_digits"),
        n_symbols.alias("n_symbols"),
        mean_word_len.alias("mean_word_len"),
    )
    ok_wc = (F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
    ok_wl = (F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10)
    ok_dg = F.col("n_digits") / F.col("n_chars") <= 0.2
    ok_sy = F.col("n_symbols") / F.col("n_chars") <= 0.1
    return feat.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        F.round(F.lit(1e-9) + F.col("n_digits") / F.col("n_chars"), 6).alias(
            "digit_ratio"
        ),
        F.round(F.lit(1e-9) + F.col("n_symbols") / F.col("n_chars"), 6).alias(
            "symbol_ratio"
        ),
        ok_wc.alias("ok_word_count"),
        ok_wl.alias("ok_word_len"),
        ok_dg.alias("ok_digits"),
        ok_sy.alias("ok_symbols"),
        (ok_wc & ok_wl & ok_dg & ok_sy).alias("admitted"),
    ).transform(ordered_wide, "doc_id")
