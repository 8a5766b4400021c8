"""Round-2 text/corpus additions: Jaro-Winkler fuzzy matching proven
against DuckDB's native function, per-source unigram KL drift, and
two-pass exact heavy hitters via Misra-Gries candidate generation.

Tokenization follows the repo convention: Spark ``split(trim(text),
'\\s+')`` ≡ DuckDB ``regexp_split_to_array(trim(text), '\\s+')`` (pinned
by t01/t03).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from highs_duckdb_spark.functions.presentation import present_sorted
from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.session import ensure_shipped, load_table


def jaro(s1: str, s2: str) -> float:
    """Jaro similarity exactly as DuckDB computes it (bit-matched on 5000
    randomized pairs, including the empty-string-returns-0 edge)."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0  # DuckDB: ''-vs-'' is 0, not 1
    if s1 == s2:
        return 1.0
    md = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        for j in range(max(0, i - md), min(l2, i + md + 1)):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    return (matches / l1 + matches / l2 + (matches - t // 2) / matches) / 3


def jaro_winkler(s1: str, s2: str) -> float:
    """Winkler variant with DuckDB's boost threshold 0.7 / scale 0.1 /
    max prefix 4 — the SAME function the t18 kernel and the randomized
    parity test both import, so they cannot drift apart."""
    j = jaro(s1, s2)
    if j <= 0.7:
        return j
    p = 0
    for x, y in zip(s1[:4], s2[:4]):
        if x == y:
            p += 1
        else:
            break
    return j + p * 0.1 * (1 - j)


@register(
    "t18_jaro_winkler_names",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           round(1e-9 + jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND left(a.p_name, 2) = left(b.p_name, 2)
     AND abs(length(a.p_name) - length(b.p_name)) <= 2
    WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.88
    ORDER BY name_a, name_b
    """,
    category="text",
    doc=(
        "Jaro-Winkler fuzzy name matching proven against DuckDB's NATIVE "
        "jaro_winkler_similarity (boost threshold 0.7, prefix scale 0.1, "
        "max prefix 4 — the kernel was bit-matched against the engine on "
        "5000 randomized pairs, including the empty-string-returns-0 edge "
        "DuckDB takes). Spark has no built-in, so the kernel runs as an "
        "Arrow-batched pandas UDF over candidate pairs only — the "
        "(2-char-prefix, ±2 length) blocking join bounds the pair space "
        "the same way t07's levenshtein block does; at 100 TB the block "
        "keys become the shuffle keys and no all-pairs product ever forms. "
        "The 2-char prefix (VERDICT r08 item 8) widens the key space from "
        "~26x5 to ~676x5 buckets so one heavy first letter can't skew a "
        "shuffle partition. NOTE the blocking blind spot (ADVICE r09): the "
        "2-char key is part of the query's RESULT-SET DEFINITION — pairs "
        "that differ in character 2 (e.g. a position-2 transposition like "
        "'abxy'/'axby') are excluded even at JW>=0.88, and because the "
        "oracle blocks identically, parity cannot detect that recall "
        "class. Measured recall vs the 1-char block is UNCHANGED at "
        "threshold 0.88 on this corpus (identical 40-pair result at "
        "sf0.01 and sf0.1, pinned in tests/test_round2_ops.py) — an "
        "empirical property of p_name's dictionary-word values, not a "
        "guarantee for arbitrary text; a larger-SF re-check is vacuous "
        "here because key-remapped replication (tools/gen_scale.py) "
        "duplicates non-key columns, so DISTINCT p_name is scale-invariant."
    ),
)
def t18_jaro_winkler_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ensure_shipped(spark)  # kernel references the module-level jaro_winkler

    def _jw_kernel(a, b):
        from highs_duckdb_spark.operators.text2 import jaro_winkler as _jw

        return pd.Series([_jw(x, y) for x, y in zip(a, b)])

    # plain-function + explicit return type (the str-annotation decorator
    # form trips pyspark's typehint parser under `from __future__ import
    # annotations`). asNondeterministic: the filter on the UDF column
    # otherwise DUPLICATES the evaluation (guide §4.4 — one
    # ArrowEvalPython below the pushed filter, a second in the output
    # projection; plans/r12/t18_…before shows both), so every surviving
    # pair paid the O(len²) kernel twice. The kernel is in fact
    # deterministic — the marker only stops the optimizer from copying
    # it; values unchanged.
    jw_udf = F.pandas_udf(_jw_kernel, "double").asNondeterministic()

    names = load_table(spark, "part", sf_dir).select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    pairs = a.join(
        b,
        (F.col("name_a") < F.col("name_b"))
        & (F.substring("name_a", 1, 2) == F.substring("name_b", 1, 2))
        & (F.abs(F.length("name_a") - F.length("name_b")) <= 2),
    )
    return (
        pairs.withColumn("jw_raw", jw_udf("name_a", "name_b"))
        .filter(F.col("jw_raw") >= 0.88)
        .select(
            "name_a", "name_b", F.round(F.lit(1e-9) + F.col("jw_raw"), 6).alias("jw")
        )
        .transform(present_sorted, "name_a", "name_b")
    )


@register(
    "t19_source_kl_drift",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
      FROM documents),
    vocab AS (SELECT token, count(*) AS n_t FROM tok GROUP BY token),
    src_tot AS (SELECT source, count(*) AS n_s FROM tok GROUP BY source),
    consts AS (SELECT (SELECT sum(n_t) FROM vocab) AS n,
                      (SELECT count(*) FROM vocab) AS v),
    grid AS (
      SELECT s.source, s.n_s, vb.token, vb.n_t, coalesce(st.n_st, 0) AS n_st, c.n, c.v
      FROM src_tot s CROSS JOIN vocab vb CROSS JOIN consts c
      LEFT JOIN (SELECT source, token, count(*) AS n_st FROM tok GROUP BY source, token) st
        ON st.source = s.source AND st.token = vb.token),
    terms AS (
      SELECT source, n_s,
             ((n_st + 0.5) / (n_s + 0.5*v)) AS p,
             ((n_t + 0.5) / (n + 0.5*v)) AS q
      FROM grid)
    SELECT source, CAST(min(n_s) AS BIGINT) AS n_tokens,
           round(1e-9 + sum(p * ln(p / q)), 6) AS kl_nats
    FROM terms GROUP BY source ORDER BY source
    """,
    category="text",
    doc=(
        "Corpus drift per source: KL(source unigram dist ‖ corpus unigram "
        "dist) in nats, Laplace-smoothed (α=0.5) over the full shared "
        "vocabulary — zero-count terms contribute their smoothed mass, so "
        "the grid is sources × vocab built from the aggregated counts, "
        "never from the corpus itself. Scale shape: one (source, token) "
        "map-side-combined count of the corpus; everything downstream "
        "(vocab marginals, totals, the KL terms) runs over vocab-sized "
        "data — the same marginals-of-one-aggregate discipline as t11's "
        "PMI. Complements dq06's event-histogram PSI with a text-corpus "
        "divergence."
    ),
)
def t19_source_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
    )
    # one corpus scan: (source, token) counts; all marginals derive from it
    st = (
        tok.groupBy("source", "token")
        .agg(F.count("*").alias("n_st"))
        .localCheckpoint(eager=True)
    )
    vocab = st.groupBy("token").agg(F.sum("n_st").alias("n_t"))
    src_tot = st.groupBy("source").agg(F.sum("n_st").alias("n_s"))
    consts = vocab.agg(
        F.sum("n_t").alias("n"), F.count("*").alias("v")
    )
    # vocab/consts broadcast (bounded-cardinality aggregates); the
    # (source, token) table joins co-partitioned — it is the one piece
    # that grows with vocab x sources at real scale
    grid = (
        src_tot.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(consts))
        .join(st, ["source", "token"], "left")
        .withColumn("n_st", F.coalesce(F.col("n_st"), F.lit(0)))
    )
    p = (F.col("n_st") + 0.5) / (F.col("n_s") + 0.5 * F.col("v"))
    q = (F.col("n_t") + 0.5) / (F.col("n") + 0.5 * F.col("v"))
    return (
        grid.select("source", "n_s", p.alias("p"), q.alias("q"))
        .groupBy("source")
        .agg(
            F.min("n_s").cast("bigint").alias("n_tokens"),
            F.round(
                F.lit(1e-9) + F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))), 6
            ).alias("kl_nats"),
        )
        .transform(present_sorted, "source")
    )


@register(
    "dq11_heavy_hitters",
    oracle="""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
      FROM documents),
    tot AS (SELECT count(*) AS n FROM tok)
    SELECT token, count(*) AS cnt,
           round(1e-9 + CAST(count(*) AS DOUBLE) / CAST(min(n) AS DOUBLE), 6) AS share
    FROM tok CROSS JOIN tot
    GROUP BY token HAVING count(*)*200 > min(n)
    ORDER BY token
    """,
    category="quality",
    doc=(
        "Exact heavy hitters (tokens exceeding 0.5% of the stream) with a "
        "Misra-Gries candidate pass: each corpus batch summarizes its "
        "token stream into ≤400 weighted counters (mapInPandas); any token "
        "whose global share exceeds 1/400 must survive at least one batch "
        "summary (if it survived none, each batch held ≤ n_b/400 of it, so "
        "its total ≤ N/400 < N/200), so the union of survivors is a "
        "guaranteed superset of the 1/200 heavies. The exact recount then "
        "scans the corpus once more but shuffles ONLY candidate tokens — "
        "no full-vocabulary shuffle ever happens, which is the point at "
        "100 TB where the token vocabulary is billions of shingles. The "
        "DuckDB oracle is the plain exact GROUP BY ... HAVING."
    ),
)
def dq11_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = load_table(spark, "documents", sf_dir)

    def mg_summary(batches):
        import re

        K = 400
        # Tokenize EXACTLY like the JVM recount and the DuckDB oracle:
        # Java/RE2 \s is ASCII-only ([ \t\n\x0B\f\r]), so split under
        # re.ASCII — a Unicode space (e.g. U+00A0) must stay INSIDE a
        # token on all three paths. Strip ONLY ' ' (space): both Spark's
        # trim() and DuckDB's trim() strip the space character alone, so
        # a leading/trailing tab or newline yields an empty-string token
        # on those paths and must do so here too, or the total-token
        # denominator n and the candidate-superset guarantee silently
        # diverge on such corpora.
        for pdf in batches:
            counters: dict[str, int] = {}
            n_batch = 0
            for text in pdf["text"]:
                toks = re.split(r"\s+", text.strip(" ").lower(), flags=re.ASCII)
                n_batch += len(toks)
                for t in toks:
                    if t in counters:
                        counters[t] += 1
                    elif len(counters) < K:
                        counters[t] = 1
                    else:  # decrement-all step, drop zeros
                        dead = []
                        for k in counters:
                            counters[k] -= 1
                            if counters[k] == 0:
                                dead.append(k)
                        for k in dead:
                            del counters[k]
            out = pd.DataFrame(
                {
                    "token": list(counters) + [""],
                    "cnt": list(counters.values()) + [n_batch],
                    "is_total": [False] * len(counters) + [True],
                }
            )
            yield out

    summary = (
        docs.select("text")
        .mapInPandas(mg_summary, "token string, cnt long, is_total boolean")
        .localCheckpoint(eager=True)  # candidates + total reuse it: one pass
    )
    total = summary.filter("is_total").agg(F.sum("cnt").alias("n"))
    candidates = summary.filter(~F.col("is_total")).select("token").distinct()
    tok = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
    )
    return (
        tok.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * 200 > F.col("n"))
        .select(
            "token",
            "cnt",
            F.round(
                F.lit(1e-9) + F.col("cnt").cast("double") / F.col("n").cast("double"), 6
            ).alias("share"),
        )
        .transform(present_sorted, "token")
    )


@register(
    "t20_encoding_audit",
    oracle="""
    SELECT doc_id,
           CAST(length(regexp_extract_all(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]')) AS BIGINT)
             AS n_control,
           CAST(length(regexp_extract_all(text, '\\x{FFFD}')) AS BIGINT) AS n_replacement,
           CAST(length(regexp_extract_all(text, '[^\\x00-\\x7F]')) AS BIGINT) AS n_non_ascii,
           CAST(length(text) AS BIGINT) AS n_chars,
           (length(regexp_extract_all(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]')) = 0
            AND length(regexp_extract_all(text, '\\x{FFFD}')) = 0) AS clean
    FROM documents ORDER BY doc_id
    """,
    category="text",
    doc=(
        "Encoding/mojibake audit — the ingest screen that catches broken "
        "decodes before they poison a training corpus: per document, counts "
        "of C0 control characters (minus tab/newline/CR), U+FFFD "
        "replacement characters (the signature of a wrong-charset decode), "
        "and non-ASCII code points, plus a clean verdict. Pure codegen "
        "regexp over one scan; the patterns are written in the Java∩RE2 "
        "dialect (hex classes + \\x{...}) so both engines match identical "
        "code points."
    ),
)
def t20_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    def n_matches(pat: str):
        # count = chars removed when every match (all single-char classes
        # here) is deleted — the strip-and-diff idiom is pure codegen
        return F.length(F.col("text")) - F.length(
            F.regexp_replace(F.col("text"), pat, "")
        )
    ctrl = n_matches(r"[\x00-\x08\x0B\x0C\x0E-\x1F]")
    repl = n_matches("�")
    nonascii = n_matches(r"[^\x00-\x7F]")
    return (
        docs.select(
            "doc_id",
            ctrl.cast("bigint").alias("n_control"),
            repl.cast("bigint").alias("n_replacement"),
            nonascii.cast("bigint").alias("n_non_ascii"),
            F.length("text").cast("bigint").alias("n_chars"),
            ((ctrl == 0) & (repl == 0)).alias("clean"),
        )
        .orderBy("doc_id")
    )


def _winnow_hash_base(docs: DataFrame) -> DataFrame:
    """``doc_id`` + positional word-3-gram hash array ``h`` — the shared
    winnowing front end of t21/dq15, reformulated for evaluation cost
    (round 11, same lesson as dedup._shingled): the original
    ``transform(sequence(1, n-2), i -> concat_ws(element_at(toks, i), ...))``
    re-evaluates the captured ``split(lower(trim(text)))`` subtree on every
    ``element_at`` of every lambda element (Catalyst binds lambda variables,
    not captured subtrees — 3 full re-splits per gram). Tokens are now
    materialized in their own projection and the positional grams built by
    zip_with over 3 shifted slices (sliced ONCE per row); element order and
    duplicates are preserved exactly, so the md5 hash array is
    element-for-element identical (oracle parity re-checked for t21/dq15)."""
    tk = F.col("__hds_toks")
    n = F.size(tk)
    m = n - 2  # positional 3-gram count when n >= 3
    acc = F.slice(tk, 1, m)
    for j in (2, 3):
        acc = F.zip_with(
            acc, F.slice(tk, j, m), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    grams = F.when(n >= 3, acc).otherwise(F.array(F.array_join(tk, " ")))
    h = F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint")
    )
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return docs.select("doc_id", toks.alias("__hds_toks")).select(
        "doc_id", h.alias("h")
    )


def _winnow_fps() -> "F.Column":
    """Winnowed fingerprints over the materialized hash column ``h``:
    min of every 4-hash sliding window, distinct. zip_with least-tree over
    4 shifted slices instead of a per-element ``array_min(slice(h, i, 4))``
    (per-element slice allocates a sub-array per window; least() over
    non-null hashes == array_min element-for-element)."""
    h = F.col("h")
    nh = F.size(h)
    m4 = nh - 3  # window count when nh >= 4
    lo = F.zip_with(
        F.slice(h, 1, m4), F.slice(h, 2, m4), lambda x, y: F.least(x, y)
    )
    hi = F.zip_with(
        F.slice(h, 3, m4), F.slice(h, 4, m4), lambda x, y: F.least(x, y)
    )
    win = F.zip_with(lo, hi, lambda x, y: F.least(x, y))
    return F.when(nh >= 4, F.array_distinct(win)).otherwise(
        F.array(F.array_min(h))
    )


@register(
    "t21_winnowing_match",
    oracle="""
    WITH base AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents WHERE doc_id < 300),
    grams AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
               THEN [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
               ELSE [array_to_string(toks, ' ')] END AS g
      FROM base),
    hashes AS (
      SELECT doc_id,
             list_transform(g, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS h
      FROM grams),
    wins AS (
      SELECT doc_id,
             CASE WHEN len(h) >= 4
               THEN list_distinct([list_min(h[i:i+3]) FOR i IN range(1, len(h) - 2)])
               ELSE [list_min(h)] END AS fps
      FROM hashes),
    fp AS (SELECT doc_id, unnest(fps) AS fp FROM wins)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
    FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 2
    ORDER BY doc_a, doc_b
    """,
    category="dedup",
    doc=(
        "Winnowing fingerprint matching (the MOSS local-fingerprinting "
        "algorithm): positional word-3-gram hashes, minimum of every "
        "4-hash sliding window selected as a fingerprint — winnowing "
        "guarantees any shared run of ≥ 6 tokens yields a shared "
        "fingerprint, unlike global MinHash which can miss local overlap "
        "in long documents. Matching pairs share ≥ 2 selected prints via "
        "a fingerprint-keyed bucket join (the same no-all-pairs shape as "
        "d03's LSH). Engine-neutral hashing: conv(substr(md5, 1, 8), 16) "
        "== DuckDB ('0x'||substr(md5,1,8))::BIGINT, all JVM/SQL-native — "
        "no Python in either path."
    ),
)
def t21_winnowing_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 300)
    base = _winnow_hash_base(docs)
    fp = base.select("doc_id", F.explode(_winnow_fps()).alias("fp"))
    a = fp.select(F.col("fp").alias("fp"), F.col("doc_id").alias("doc_a"))
    b = fp.select(F.col("fp").alias("fp"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .transform(present_sorted, "doc_a", "doc_b")
    )


@register(
    "t22_token_burstiness",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
      FROM documents),
    per_doc AS (SELECT token, doc_id, count(*) AS c FROM tok GROUP BY token, doc_id),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    stats AS (
      SELECT token, sum(c) AS s, sum(c*c) AS s2, count(*) AS docs_with
      FROM per_doc GROUP BY token),
    top AS (SELECT * FROM stats ORDER BY s DESC, token LIMIT 20)
    SELECT token, CAST(s AS BIGINT) AS total_count,
           CAST(docs_with AS BIGINT) AS docs_with,
           round(1e-9 + (CAST(s2 AS DOUBLE)/n_docs
                 - (CAST(s AS DOUBLE)/n_docs)*(CAST(s AS DOUBLE)/n_docs))
                 / (CAST(s AS DOUBLE)/n_docs), 6) AS vmr
    FROM top, nd ORDER BY total_count DESC, token
    """,
    category="text",
    doc=(
        "Token burstiness (variance-to-mean ratio of per-document counts, "
        "zero-count docs included via the global doc count): VMR ≈ 1 is "
        "Poisson-like function words, VMR ≫ 1 is bursty topical terms — "
        "the dispersion statistic behind tf-idf's df intuition and a "
        "stopword-detection signal. Integer Σc/Σc² power sums make both "
        "engines exact before the final rounded ratio; the VMR math runs "
        "over vocab-sized aggregates, and only the top-20 by count are "
        "reported (TakeOrderedAndProject, no global sort)."
    ),
)
def t22_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
    )
    per_doc = tok.groupBy("token", "doc_id").agg(F.count("*").alias("c"))
    stats = per_doc.groupBy("token").agg(
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.count("*").alias("docs_with"),
    )
    nd = docs.agg(F.count("*").alias("n_docs"))
    top = stats.orderBy(F.desc("s"), F.asc("token")).limit(20)
    mean = F.col("s").cast("double") / F.col("n_docs")
    vmr = (F.col("s2").cast("double") / F.col("n_docs") - mean * mean) / mean
    return (
        top.crossJoin(F.broadcast(nd))
        .select(
            "token",
            F.col("s").cast("bigint").alias("total_count"),
            F.col("docs_with").cast("bigint").alias("docs_with"),
            F.round(F.lit(1e-9) + vmr, 6).alias("vmr"),
        )
        .transform(present_sorted, F.desc("total_count"), "token")
    )


@register(
    "t23_js_divergence_matrix",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
      FROM documents),
    st AS (SELECT source, token, count(*) AS n_st FROM tok GROUP BY source, token),
    vocab AS (SELECT token FROM st GROUP BY token),
    src_tot AS (SELECT source, sum(n_st) AS n_s FROM st GROUP BY source),
    v AS (SELECT count(*) AS nv FROM vocab),
    grid AS (
      SELECT s.source, s.n_s, vb.token, coalesce(st.n_st, 0) AS n_st, v.nv
      FROM src_tot s CROSS JOIN vocab vb CROSS JOIN v
      LEFT JOIN st ON st.source = s.source AND st.token = vb.token),
    p AS (SELECT source, token, (n_st + 0.5) / (n_s + 0.5*nv) AS p FROM grid),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             a.p AS pa, b.p AS pb, (a.p + b.p)/2 AS m
      FROM p a JOIN p b ON a.token = b.token AND a.source < b.source)
    SELECT src_a, src_b,
           round(1e-9 + sum(0.5*pa*ln(pa/m) + 0.5*pb*ln(pb/m)), 6) AS js_nats
    FROM pairs GROUP BY src_a, src_b ORDER BY src_a, src_b
    """,
    category="text",
    doc=(
        "Pairwise Jensen-Shannon divergence matrix between sources' "
        "smoothed unigram distributions — the SYMMETRIC, bounded "
        "companion to t19's vs-corpus KL, the right metric for clustering "
        "sources by vocabulary. Same marginals-of-one-aggregate shape: "
        "one (source, token) corpus count, the smoothed distribution "
        "grid over sources × vocab, and the pair join + JS sum over "
        "sources² × vocab rows — never the corpus."
    ),
)
def t23_js_divergence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
    )
    st = (
        tok.groupBy("source", "token")
        .agg(F.count("*").alias("n_st"))
        .localCheckpoint(eager=True)  # one corpus scan; marginals derive
    )
    vocab = st.select("token").distinct()
    src_tot = st.groupBy("source").agg(F.sum("n_st").alias("n_s"))
    nv = vocab.agg(F.count("*").alias("nv"))
    grid = (
        src_tot.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(nv))
        .join(st, ["source", "token"], "left")
        .withColumn("n_st", F.coalesce(F.col("n_st"), F.lit(0)))
    )
    p = grid.select(
        "source",
        "token",
        ((F.col("n_st") + 0.5) / (F.col("n_s") + 0.5 * F.col("nv"))).alias("p"),
    )
    a = p.select(
        F.col("source").alias("src_a"), "token", F.col("p").alias("pa")
    )
    b = p.select(
        F.col("source").alias("src_b"), "token", F.col("p").alias("pb")
    )
    m = (F.col("pa") + F.col("pb")) / 2
    term = 0.5 * F.col("pa") * F.log(F.col("pa") / m) + 0.5 * F.col("pb") * F.log(
        F.col("pb") / m
    )
    return (
        a.join(b, "token")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.round(F.lit(1e-9) + F.sum(term), 6).alias("js_nats"))
        .transform(present_sorted, "src_a", "src_b")
    )


@register(
    "dq15_split_leakage_audit",
    oracle="""
    WITH base AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents WHERE doc_id < 300),
    grams AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
               THEN [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
               ELSE [array_to_string(toks, ' ')] END AS g
      FROM base),
    hashes AS (SELECT doc_id,
                      list_transform(g, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS h
               FROM grams),
    wins AS (
      SELECT doc_id,
             CASE WHEN len(h) >= 4
               THEN list_distinct([list_min(h[i:i+3]) FOR i IN range(1, len(h) - 2)])
               ELSE [list_min(h)] END AS fps
      FROM hashes),
    fp AS (SELECT doc_id, unnest(fps) AS fp FROM wins),
    assigned AS (
      SELECT doc_id,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                       % 100 < 90 THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                       % 100 < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM base),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
      FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= 2),
    leaks AS (
      SELECT p.n_shared, sa.split AS split_a, sb.split AS split_b
      FROM pairs p JOIN assigned sa ON sa.doc_id = p.doc_a
                   JOIN assigned sb ON sb.doc_id = p.doc_b
      WHERE sa.split <> sb.split)
    SELECT least(split_a, split_b) AS split_1, greatest(split_a, split_b) AS split_2,
           CAST(count(*) AS BIGINT) AS n_leaked_pairs,
           CAST(max(n_shared) AS BIGINT) AS worst_overlap
    FROM leaks GROUP BY 1, 2 ORDER BY 1, 2
    """,
    category="quality",
    doc=(
        "Split-leakage audit on NEAR-duplicates: document pairs sharing "
        "≥ 2 winnowed fingerprints (t21's exact MOSS rule) whose members "
        "landed in DIFFERENT p02 hash splits — the leakage hash-based "
        "splitting cannot prevent, reported per split pair with the worst "
        "overlap depth. Exact duplicates would be caught by d01; this is "
        "the harder, quieter leak. Same fingerprint bucket join as t21 "
        "plus two broadcast split lookups."
    ),
)
def dq15_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 300)
    base = _winnow_hash_base(docs).localCheckpoint(eager=True)
    fp = base.select("doc_id", F.explode(_winnow_fps()).alias("fp"))
    a = fp.select("fp", F.col("doc_id").alias("doc_a"))
    b = fp.select("fp", F.col("doc_id").alias("doc_b"))
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    assigned = docs.select("doc_id", split.alias("split"))
    sa = assigned.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = assigned.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .groupBy(
            F.least("split_a", "split_b").alias("split_1"),
            F.greatest("split_a", "split_b").alias("split_2"),
        )
        .agg(
            F.count("*").alias("n_leaked_pairs"),
            F.max("n_shared").cast("bigint").alias("worst_overlap"),
        )
        .transform(present_sorted, "split_1", "split_2")
    )
