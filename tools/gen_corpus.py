#!/usr/bin/env python
"""Scale the documents/embeddings corpus for skew + pipeline benchmarks
(VERDICT r04 item 7: "scale the corpus one decade, re-run the skew audit
and d03_full/s-family benches at the larger corpus").

Why not tools/gen_scale.py's verbatim replication: K identical copies of
every document make every doc an EXACT duplicate x K, so the LSH candidate
set grows quadratically in K *by the operator's semantics* (duplicate
clusters are real near-dups and must be reported). That measures
duplicate-cluster handling, not bucket skew. This tool instead scales the
corpus one-decade-per-copy with the shingle DISTRIBUTION preserved but the
copies distinct:

- documents: copy 0 is verbatim; copy i>0 rewrites each doc's text through
  a per-copy permutation of the corpus vocabulary (seeded ``random.Random(i)``,
  fully deterministic). A word permutation maps every 3-word shingle
  bijectively to another shingle, so each copy's shingle-set structure —
  and therefore its MinHash bucket-size distribution — is isomorphic to the
  original's, while cross-copy shingle collisions are incidental rather
  than forced. Candidate-pair work should grow ~linearly in K; the skew
  audit at the scaled corpus verifies exactly that. n_chars is recomputed
  (word lengths change under permutation); doc_id offsets by copy.
- embeddings: verbatim replication with vec_id offsets (the s-family's
  per-row kernel work is identical for repeated vectors, and s02's bucket
  space is fixed at 64 keys, so replication scales its buckets uniformly).

Usage: python tools/gen_corpus.py [K] [src_dir] [out_dir]
Defaults: K=10, src=/root/testdata/sf0.1, out=<repo>/benchdata/corpus10x
"""

from __future__ import annotations

import os
import random
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, "benchdata", f"corpus{k}x")
    )
    con = duckdb.connect()
    con.execute("SET threads=8")

    vocab = [
        w
        for (w,) in con.execute(
            "SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
            f"FROM read_parquet('{src}/documents.parquet') ORDER BY w"
        ).fetchall()
    ]
    n_docs = con.execute(
        f"SELECT max(doc_id) + 1 FROM read_parquet('{src}/documents.parquet')"
    ).fetchone()[0]
    n_vecs = con.execute(
        f"SELECT max(vec_id) + 1 FROM read_parquet('{src}/embeddings.parquet')"
    ).fetchone()[0]

    doc_dir = os.path.join(out, "documents.parquet")
    emb_dir = os.path.join(out, "embeddings.parquet")
    os.makedirs(doc_dir, exist_ok=True)
    os.makedirs(emb_dir, exist_ok=True)

    for i in range(k):
        if i == 0:
            # copy 0 is verbatim: no token rewrite
            con.execute(
                f"""
                COPY (
                  SELECT doc_id, text, lang, source, length(text) AS n_chars
                  FROM read_parquet('{src}/documents.parquet')
                ) TO '{doc_dir}/part-{i:04d}.parquet' (FORMAT PARQUET)
                """
            )
        else:
            perm = vocab[:]
            random.Random(i).shuffle(perm)
            # Materialize the (word, replacement) pairs as a temp table and
            # build ONE map from it — an inline MAP literal inside the
            # list_transform lambda makes the statement megabytes at larger
            # vocabularies and risks per-token re-evaluation (ADVICE r05).
            con.execute("DROP TABLE IF EXISTS word_map")
            con.execute("CREATE TEMP TABLE word_map (w VARCHAR, r VARCHAR)")
            con.executemany(
                "INSERT INTO word_map VALUES (?, ?)", list(zip(vocab, perm))
            )
            # unknown tokens (none in the driver corpus) pass through
            # unchanged via coalesce; n_chars computed in an outer SELECT
            # so the rewrite expression is evaluated once per document
            con.execute(
                f"""
                COPY (
                  SELECT doc_id, text, lang, source, length(text) AS n_chars
                  FROM (
                    SELECT doc_id + {i * n_docs} AS doc_id,
                           list_aggregate(list_transform(string_split(text, ' '),
                             w -> coalesce(map_extract(m.perm_map, w)[1], w)),
                             'string_agg', ' ') AS text,
                           lang, source
                    FROM read_parquet('{src}/documents.parquet')
                    CROSS JOIN (SELECT map(list(w), list(r)) AS perm_map
                                FROM word_map) m
                  )
                ) TO '{doc_dir}/part-{i:04d}.parquet' (FORMAT PARQUET)
                """
            )
        con.execute(
            f"""
            COPY (
              SELECT vec_id + {i * n_vecs} AS vec_id, embedding, label
              FROM read_parquet('{src}/embeddings.parquet')
            ) TO '{emb_dir}/part-{i:04d}.parquet' (FORMAT PARQUET)
            """
        )
        print(f"copy {i} written", flush=True)
    print(f"done: {k}x corpus at {out}")


if __name__ == "__main__":
    main()
