"""Text-analysis query inventory: Spark side = operators.text; oracle =
DuckDB SQL with identical exact-count arithmetic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import text
from datafusion_server_spark.queries import df_query


def _in_list(langs: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in langs)


@df_query(
    "text_token_stats",
    r"""
    SELECT CAST(doc_id AS BIGINT) AS id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_words,
           CAST(CEIL(CAST(LENGTH(text) AS DOUBLE) / 4) AS BIGINT) AS n_tokens_est,
           CAST(LEN(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+')) AS BIGINT) AS n_tokens_bpe,
           ROUND(CAST(LENGTH(text) - (LEN(STRING_SPLIT(text, ' ')) - 1) AS DOUBLE)
                 / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE), 6) AS avg_word_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_stats(tables.load(spark, sf_dir, "documents"), "text", "doc_id")


_QUALITY_ORACLE = f"""
WITH w AS (
  SELECT doc_id, text, STRING_SPLIT(text, ' ') AS words FROM documents),
stats AS (
  SELECT doc_id,
         CAST(LEN(words) AS BIGINT) AS n_words,
         CAST(LEN(LIST_FILTER(words, x -> x IN ({_in_list(text.LANG_STOPWORDS["en"])}))) AS BIGINT) AS n_stop,
         CAST(LEN(LIST_DISTINCT(words)) AS BIGINT) AS n_unique,
         LENGTH(text) >= 100 AND LENGTH(text) <= 20000 AS len_ok
  FROM w)
SELECT CAST(doc_id AS BIGINT) AS id,
       ROUND(CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS stopword_ratio,
       ROUND(CAST(n_unique AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS unique_ratio,
       len_ok,
       ROUND(CAST(CASE WHEN CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) > 0.01 THEN 0.4 ELSE 0.0 END
             + CASE WHEN CAST(n_unique AS DOUBLE) / CAST(n_words AS DOUBLE) > 0.3 THEN 0.3 ELSE 0.0 END
             + CASE WHEN len_ok THEN 0.3 ELSE 0.0 END AS DOUBLE), 2) AS quality
FROM stats
"""


@df_query("text_quality_score", _QUALITY_ORACLE)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_score(tables.load(spark, sf_dir, "documents"), "text", "doc_id")


_VOTE_EXPRS = ",\n         ".join(
    f"CAST(LEN(LIST_FILTER(words, x -> x IN ({_in_list(stops)}))) AS BIGINT) AS vote_{lang}"
    for lang, stops in text.LANG_STOPWORDS.items()
)
_VOTE_ROWS = " UNION ALL ".join(
    f"SELECT id, '{lang}' AS lang, vote_{lang} AS vote FROM votes"
    for lang in text.LANG_STOPWORDS
)

_LANG_ORACLE = f"""
WITH w AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS words FROM documents),
votes AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         {_VOTE_EXPRS}
  FROM w),
unpivoted AS ({_VOTE_ROWS}),
pred AS (
  SELECT id, lang AS predicted_lang
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY vote DESC, lang DESC) AS rn
        FROM unpivoted) t
  WHERE rn = 1)
SELECT v.id, p.predicted_lang,
       {", ".join(f"v.vote_{lang}" for lang in text.LANG_STOPWORDS)}
FROM votes v JOIN pred p ON p.id = v.id
"""


@df_query("text_language_id", _LANG_ORACLE)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.language_id(tables.load(spark, sf_dir, "documents"), "text", "doc_id")


_WINNOW_ORACLE = """
WITH words AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
bg AS (SELECT doc_id,
              UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(w) - 1),
                                    i -> w[i] || ' ' || w[i+1])) AS bgram,
              UNNEST(GENERATE_SERIES(1, LEN(w) - 1)) AS i
       FROM words),
hashed AS (SELECT doc_id, i, md5(bgram) AS h FROM bg)
SELECT DISTINCT CAST(doc_id AS BIGINT) AS id,
       MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fingerprint
FROM hashed
"""


@df_query("text_winnowing_fingerprints", _WINNOW_ORACLE)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.winnowing_fingerprints(
        tables.load(spark, sf_dir, "documents"), "text", "doc_id", window=5
    )


_TFIDF_ORACLE = """
WITH tokens AS (
  SELECT doc_id AS id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents),
tf AS (SELECT id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM tokens GROUP BY 1, 2),
idf AS (SELECT term,
               ROUND(LN((SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) / COUNT(*)), 8) AS idf
        FROM tf GROUP BY term),
w AS (SELECT tf.id, tf.term, tf.tf * idf.idf AS w FROM tf JOIN idf USING (term)),
norms AS (SELECT id, SQRT(CAST(SUM(CAST(w * w AS DECIMAL(18,10))) AS DOUBLE)) AS nrm
          FROM w GROUP BY id),
dots AS (
  SELECT q.id AS query_id, c.id AS neighbor_id,
         SUM(CAST(q.w * c.w AS DECIMAL(18,10))) AS dot
  FROM w q JOIN w c ON c.term = q.term AND c.id <> q.id
  WHERE q.id < 5
  GROUP BY 1, 2),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         ROUND(CAST(d.dot AS DOUBLE) / (nq.nrm * nc.nrm), 6) AS cosine
  FROM dots d
  JOIN norms nq ON nq.id = d.query_id
  JOIN norms nc ON nc.id = d.neighbor_id)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored) t
WHERE rnk <= 3
"""


@df_query("text_tfidf_topk", _TFIDF_ORACLE)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.tfidf_topk(
        tables.load(spark, sf_dir, "documents"), "text", "doc_id", n_queries=5, k=3
    )


@df_query(
    "text_fingerprints",
    """
    SELECT CAST(doc_id AS BIGINT) AS id,
           md5(LOWER(text)) AS fp_full,
           md5(SUBSTR(LOWER(text), 1, 256)) AS fp_prefix,
           CAST(FLOOR(LENGTH(LOWER(text)) / 100) * 100 AS BIGINT) AS len_bucket
    FROM documents
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprints(tables.load(spark, sf_dir, "documents"), "text", "doc_id")


# --- PII redaction: regexes are fixed-shape so Java regex and RE2 agree;
# the fixture word-soup contains no PII, so counts are zero and the
# redacted text equals the input — the synthetic-payload unit test
# (tests/test_timeseries.py-adjacent) covers real hits.

_PII_ORACLE = r"""
SELECT CAST(doc_id AS BIGINT) AS id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<email>', 'g'),
           '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<ipv4>', 'g'),
         '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b', '<phone>', 'g') AS text_redacted,
       CAST(LEN(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(LEN(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
       CAST(LEN(regexp_extract_all(text, '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b')) AS BIGINT) AS n_phone
FROM documents
"""


@df_query("text_redact_pii", _PII_ORACLE)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.redact_pii(tables.load(spark, sf_dir, "documents"), "text", "doc_id")


# --- intra-document repetition removal (first-occurrence word dedup).

_DEDUP_WORDS_ORACLE = """
WITH w AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word,
         GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS p
  FROM documents),
f AS (SELECT doc_id, word, MIN(p) AS p0 FROM w GROUP BY doc_id, word)
SELECT CAST(doc_id AS BIGINT) AS id,
       STRING_AGG(word, ' ' ORDER BY p0) AS text_dedup,
       CAST(COUNT(*) AS BIGINT) AS n_unique
FROM f GROUP BY doc_id
"""


@df_query("text_dedup_words", _DEDUP_WORDS_ORACLE)
def text_dedup_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.dedup_words(tables.load(spark, sf_dir, "documents"), "text", "doc_id")


# Blocked fuzzy matching over customer names: prefix-15 blocking bounds
# each block at 1000 ids (the last 3 digits are free) at ANY scale;
# levenshtein is identical in both engines, so the pair set + distances
# hash-match exactly.
_FUZZY_MAX_DIST = 1

_FUZZY_ORACLE = f"""
WITH k AS (
  SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS s,
         SUBSTR(c_name, 1, 15) AS b0
  FROM customer)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
FROM k a JOIN k b ON a.b0 = b.b0 AND a.id < b.id
WHERE levenshtein(a.s, b.s) <= {_FUZZY_MAX_DIST}
"""


@df_query("text_fuzzy_match_pairs", _FUZZY_ORACLE)
def text_fuzzy_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tables.load(spark, sf_dir, "customer")
    return text.fuzzy_match_pairs(
        cust,
        "c_name",
        "c_custkey",
        max_dist=_FUZZY_MAX_DIST,
        blocks=[F.substring(F.col("c_name"), 1, 15)],
    )


# Character-bigram repetition stats: exact integer counts + rational
# divisions only (no entropy/log — libm is not bit-portable), so the
# oracle matches bit-for-bit. Aggregated per language to keep the
# result compact.
_CHAR_NGRAM_ORACLE = """
WITH pos AS (
  SELECT doc_id, lang, UNNEST(GENERATE_SERIES(1, LENGTH(text) - 1)) AS p, text
  FROM documents),
bg AS (SELECT doc_id, lang, SUBSTR(text, p, 2) AS bg FROM pos),
cnt AS (SELECT doc_id, lang, bg, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2, 3),
per_doc AS (
  SELECT CAST(doc_id AS BIGINT) AS id, lang,
         CAST(SUM(c) AS BIGINT) AS n_bigrams,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS distinct_ratio,
         ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS top_ratio
  FROM cnt GROUP BY doc_id, lang)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_distinct) AS BIGINT) AS min_distinct,
       ROUND(CAST(SUM(CAST(distinct_ratio AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*), 6) AS avg_distinct_ratio,
       ROUND(CAST(MAX(top_ratio) AS DOUBLE), 6) AS max_top_ratio
FROM per_doc GROUP BY lang
"""


@df_query("text_char_ngram_stats", _CHAR_NGRAM_ORACLE)
def text_char_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    stats = text.char_ngram_stats(docs, "text", "doc_id")
    joined = stats.join(
        docs.select(F.col("doc_id").alias("id"), "lang"), "id"
    )
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("n_distinct").cast("bigint").alias("min_distinct"),
        F.round(
            F.sum(F.col("distinct_ratio").cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_distinct_ratio"),
        F.round(F.max("top_ratio"), 6).alias("max_top_ratio"),
    )


# Benchmark-contamination check: probe set = every 50th document (stand-in
# for an eval/benchmark suite), 5-gram overlap against the whole corpus.
# Probe documents themselves come back ratio=1.0 (they ARE in the corpus)
# — the built-in sanity signal for the pipeline.
_CONTAMINATION_N = 5
_CONTAMINATION_ORACLE = """
WITH words AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
dg AS (SELECT DISTINCT doc_id,
              UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(w) - 4),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS gram
       FROM words),
pg AS (SELECT DISTINCT gram FROM dg WHERE doc_id % 50 = 0)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(p.gram) AS BIGINT) AS n_contaminated,
       ROUND(CAST(COUNT(p.gram) AS DOUBLE) / COUNT(*), 6) AS contamination_ratio
FROM dg d LEFT JOIN pg p USING (gram)
GROUP BY d.doc_id
"""


@df_query("text_contamination_check", _CONTAMINATION_ORACLE)
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    probes = docs.filter(F.col("doc_id") % 50 == 0)
    return text.contamination_check(
        docs, probes, "text", "doc_id", "text", n=_CONTAMINATION_N
    )


# Boilerplate detection: trigrams appearing in >= 3 documents are
# template/boilerplate; per-doc boilerplate share. The fixture's
# duplicated documents guarantee a non-trivial boilerplate set.
_BOILERPLATE_ORACLE = """
WITH words AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
dg AS (SELECT DISTINCT doc_id,
              UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(w) - 2),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
       FROM words),
bp AS (SELECT gram FROM dg GROUP BY gram HAVING COUNT(*) >= 3)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(b.gram) AS BIGINT) AS n_boilerplate,
       ROUND(CAST(COUNT(b.gram) AS DOUBLE) / COUNT(*), 6) AS boilerplate_ratio
FROM dg d LEFT JOIN bp b USING (gram)
GROUP BY d.doc_id
"""


@df_query("text_boilerplate_ngrams", _BOILERPLATE_ORACLE)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return text.boilerplate_ngrams(docs, "text", "doc_id", n=3, min_df=3)


# --- vocabulary-coverage (OOV-rate) scoring: top-20 corpus vocab so OOV
# is non-trivial at fixture scale; rank tie-break (count desc, word asc).

_VOCAB_N = 20

_VOCAB_ORACLE = f"""
WITH ws AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents),
vocab AS (
  SELECT w, rank FROM (
    SELECT w, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w ASC) AS rank
    FROM ws GROUP BY w)
  WHERE rank <= {_VOCAB_N}),
scored AS (SELECT s.doc_id, v.rank FROM ws s LEFT JOIN vocab v ON v.w = s.w)
SELECT CAST(doc_id AS BIGINT) AS id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(CASE WHEN rank IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       ROUND(CAST(SUM(CASE WHEN rank IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate,
       COALESCE(ROUND(CAST(SUM(rank) AS DOUBLE) / CAST(COUNT(rank) AS DOUBLE), 6), 0.0)
         AS mean_vocab_rank
FROM scored GROUP BY doc_id
"""


@df_query("text_vocab_coverage", _VOCAB_ORACLE)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return text.vocab_coverage(docs, "text", "doc_id", vocab_size=_VOCAB_N)


# --- document chunking (context-window splitting) + contiguous
# sequence packing into fixed-capacity training bins.

_CHUNK_WORDS = 24
_PACK_CAP = 64

# NULL/empty docs: coalesce to '' and pin n_words to 0 (matching the
# operator's no-phantom-words contract for sequence packing)
_CHUNK_CTE = f"""
w AS (SELECT doc_id, COALESCE(text, '') AS ctext,
             STRING_SPLIT(COALESCE(text, ''), ' ') AS words FROM documents),
n AS (SELECT doc_id, ctext, words,
             GREATEST(CAST(CEIL(LEN(words) / {float(_CHUNK_WORDS)}) AS BIGINT), 1) AS n_chunks
      FROM w),
chunks AS (
  SELECT doc_id, t.i AS chunk_idx,
         ARRAY_TO_STRING(words[t.i * {_CHUNK_WORDS} + 1 : (t.i + 1) * {_CHUNK_WORDS}], ' ') AS chunk_text,
         CASE WHEN LENGTH(ctext) = 0 THEN 0
              ELSE LEAST(LEN(words) - t.i * {_CHUNK_WORDS}, {_CHUNK_WORDS}) END AS n_words
  FROM n, UNNEST(range(0, n_chunks)) AS t(i))
"""

_CHUNK_ORACLE = f"""
WITH {_CHUNK_CTE}
SELECT CAST(doc_id AS BIGINT) AS id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       chunk_text, CAST(n_words AS BIGINT) AS n_words
FROM chunks
"""


@df_query("text_chunk_documents", _CHUNK_ORACLE)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return text.chunk_documents(docs, "text", "doc_id", chunk_words=_CHUNK_WORDS)


_PACK_ORACLE = f"""
WITH {_CHUNK_CTE},
cum AS (
  SELECT doc_id, chunk_idx, n_words,
         COALESCE(SUM(n_words) OVER (ORDER BY doc_id, chunk_idx
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS bef
  FROM chunks)
SELECT CAST(doc_id AS BIGINT) AS id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(bef // {_PACK_CAP} AS BIGINT) AS bin_id,
       CAST(bef % {_PACK_CAP} AS BIGINT) AS bin_offset
FROM cum
"""


@df_query("text_pack_sequences", _PACK_ORACLE)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    chunks = text.chunk_documents(docs, "text", "doc_id", chunk_words=_CHUNK_WORDS)
    packed = text.pack_chunks_contiguous(chunks, _PACK_CAP)
    return packed.select("id", "chunk_idx", "n_words", "bin_id", "bin_offset")


# sharded packing (the 100 TB shape): bins never cross a source shard,
# so the cumulative window hash-partitions by shard instead of moving
# the corpus to one task. bin_id is shard-local.
_PACK_SHARDED_ORACLE = f"""
WITH {_CHUNK_CTE},
sh AS (SELECT c.doc_id, d.source AS shard, c.chunk_idx, c.n_words
       FROM chunks c JOIN documents d ON d.doc_id = c.doc_id),
cum AS (
  SELECT doc_id, shard, chunk_idx, n_words,
         COALESCE(SUM(n_words) OVER (PARTITION BY shard
                                     ORDER BY doc_id, chunk_idx
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS bef
  FROM sh)
SELECT CAST(doc_id AS BIGINT) AS id, shard,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(bef // {_PACK_CAP} AS BIGINT) AS bin_id,
       CAST(bef % {_PACK_CAP} AS BIGINT) AS bin_offset
FROM cum
"""


@df_query("text_pack_sequences_sharded", _PACK_SHARDED_ORACLE)
def text_pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    chunks = text.chunk_documents(docs, "text", "doc_id", chunk_words=_CHUNK_WORDS)
    sharded = chunks.join(
        docs.select(F.col("doc_id").alias("id"), F.col("source").alias("shard")),
        "id",
    )
    packed = text.pack_chunks_sharded(sharded, _PACK_CAP, "shard")
    return packed.select(
        "id", "shard", "chunk_idx", "n_words", "bin_id", "bin_offset"
    )


# corpus-trained unigram-LM cross-entropy (CCNet-style quality signal):
# per-token -ln p rounded to 8 and summed as DECIMAL, so the only float
# op crossing engines (ln) is rounded before aggregation.
_LM_XENT_ORACLE = """
WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
model AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n_t FROM tok GROUP BY term),
tot AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM model),
logp AS (SELECT term,
                CAST(ROUND(-LN(CAST(n_t + 1 AS DOUBLE) / CAST(n + v AS DOUBLE)), 8)
                     AS DECIMAL(18,8)) AS nll
         FROM model, tot)
SELECT CAST(t.doc_id AS BIGINT) AS id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(l.nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS xent_nats
FROM tok t JOIN logp l ON l.term = t.term
GROUP BY t.doc_id
"""


@df_query("text_lm_cross_entropy", _LM_XENT_ORACLE)
def text_lm_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return text.lm_unigram_cross_entropy(docs, "text", "doc_id")


# interpolated-bigram LM cross-entropy: DuckDB zips the parallel
# UNNESTs positionally (Postgres semantics), reproducing the Spark
# zip_with bigram stream exactly.
_LM_BI_LAM = 0.75

_LM_BIGRAM_ORACLE = f"""
WITH dt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
big AS (
  SELECT doc_id,
         UNNEST(toks[1:len(toks)-1]) AS prev,
         UNNEST(toks[2:len(toks)]) AS cur
  FROM dt WHERE len(toks) >= 2),
firsts AS (SELECT doc_id, CAST(NULL AS VARCHAR) AS prev, toks[1] AS cur
           FROM dt WHERE len(toks) >= 1),
stream AS (SELECT * FROM firsts UNION ALL SELECT * FROM big),
uni AS (SELECT cur, CAST(COUNT(*) AS BIGINT) AS n_t FROM stream GROUP BY cur),
tot AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM uni),
prefix AS (SELECT prev, CAST(COUNT(*) AS BIGINT) AS n_prev FROM big GROUP BY prev),
bg AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS n_ab FROM big GROUP BY prev, cur),
scored AS (
  SELECT s.doc_id,
         CAST(ROUND(-LN(
           CASE WHEN s.prev IS NULL
                THEN CAST(u.n_t + 1 AS DOUBLE) / CAST(t.n + t.v AS DOUBLE)
                ELSE {_LM_BI_LAM} * (CAST(b.n_ab AS DOUBLE) / CAST(p.n_prev AS DOUBLE))
                     + {1.0 - _LM_BI_LAM} * (CAST(u.n_t + 1 AS DOUBLE) / CAST(t.n + t.v AS DOUBLE))
           END), 8) AS DECIMAL(18,8)) AS nll
  FROM stream s
  JOIN uni u ON u.cur = s.cur
  CROSS JOIN tot t
  LEFT JOIN prefix p ON p.prev = s.prev
  LEFT JOIN bg b ON b.prev = s.prev AND b.cur = s.cur)
SELECT CAST(doc_id AS BIGINT) AS id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS xent_nats
FROM scored GROUP BY doc_id
"""


@df_query("text_lm_bigram_cross_entropy", _LM_BIGRAM_ORACLE)
def text_lm_bigram_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return text.lm_bigram_cross_entropy(docs, "text", "doc_id", lam=_LM_BI_LAM)


def _compression_values_oracle(sf_dir: str) -> str:
    """Driver-side replay with the SAME container zlib at the same
    level — deterministic for a fixed library build."""
    import zlib
    from decimal import ROUND_HALF_UP, Decimal

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = []
    for i, t in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()):
        if t is None:
            continue
        raw = t.encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        if raw:
            r = float(
                Decimal(repr(comp / len(raw))).quantize(
                    Decimal("0.000001"), ROUND_HALF_UP
                )
            )
            out.append(f"({int(i)}, {len(raw)}, {comp}, {r!r})")
        else:
            out.append(f"({int(i)}, 0, {comp}, NULL)")
    rows = ", ".join(out)
    return f"""
    SELECT CAST(id AS BIGINT) AS id, CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST(n_deflate AS BIGINT) AS n_deflate, CAST(ratio AS DOUBLE) AS ratio
    FROM (VALUES {rows}) AS t(id, n_bytes, n_deflate, ratio)
    """


@df_query("text_compression_ratio", _compression_values_oracle)
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return text.compression_ratio(docs, "text", "doc_id")


# Okapi BM25 retrieval: fixed probe query over the fixture vocabulary.
_BM25_TERMS = ["spark", "query", "window"]
_BM25_K = 10

_BM25_TERM_LIST = ", ".join(f"'{t}'" for t in _BM25_TERMS)

_BM25_ORACLE = f"""
WITH base AS (
  SELECT doc_id AS id, len(string_split(text, ' ')) AS dl FROM documents),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM base),
tok AS (
  SELECT doc_id AS id, UNNEST(string_split(text, ' ')) AS term FROM documents),
tf AS (
  SELECT t.id, b.dl, t.term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok t JOIN base b ON b.id = t.id
  WHERE t.term IN ({_BM25_TERM_LIST})
  GROUP BY t.id, b.dl, t.term),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t FROM tf GROUP BY term),
idf AS (
  SELECT d.term, s.avgdl,
         ROUND(LN(1.0 + (CAST(s.n AS DOUBLE) - d.df_t + 0.5) / (CAST(d.df_t AS DOUBLE) + 0.5)), 8) AS idf
  FROM dfq d, stats s),
contrib AS (
  SELECT tf.id,
         CAST(ROUND(i.idf * (CAST(tf.tf AS DOUBLE) * 2.2)
                    / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(tf.dl AS DOUBLE) / i.avgdl)),
                    8) AS DECIMAL(18,8)) AS c
  FROM tf JOIN idf i ON i.term = tf.term),
scored AS (
  SELECT id, ROUND(CAST(SUM(c) AS DOUBLE), 6) AS score FROM contrib GROUP BY id)
SELECT CAST(id AS BIGINT) AS id, score, CAST(rnk AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) AS rnk FROM scored) t
WHERE rnk <= {_BM25_K}
"""


@df_query("text_bm25_topk", _BM25_ORACLE)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return text.bm25_topk(docs, "text", "doc_id", _BM25_TERMS, _BM25_K)


# Hybrid doc-to-doc retrieval: BM25 against doc 0's vocabulary fused
# with dense cosine neighbors of embedding 0 by Reciprocal Rank Fusion
# (documents and embeddings are id-aligned in the fixtures).
_HY_QDOC = 0
_HY_K = 10
_HY_C = 60

_HYBRID_ORACLE = f"""
WITH base AS (
  SELECT doc_id AS id, len(string_split(text, ' ')) AS dl FROM documents),
qterms AS (
  SELECT DISTINCT UNNEST(string_split(text, ' ')) AS term
  FROM documents WHERE doc_id = {_HY_QDOC}),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM base),
tok AS (
  SELECT doc_id AS id, UNNEST(string_split(text, ' ')) AS term FROM documents),
tf AS (
  SELECT t.id, b.dl, t.term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok t JOIN base b ON b.id = t.id
  WHERE t.term IN (SELECT term FROM qterms)
  GROUP BY t.id, b.dl, t.term),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t FROM tf GROUP BY term),
idf AS (
  SELECT d.term, s.avgdl,
         ROUND(LN(1.0 + (CAST(s.n AS DOUBLE) - d.df_t + 0.5) / (CAST(d.df_t AS DOUBLE) + 0.5)), 8) AS idf
  FROM dfq d, stats s),
contrib AS (
  SELECT tf.id,
         CAST(ROUND(i.idf * (CAST(tf.tf AS DOUBLE) * 2.2)
                    / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(tf.dl AS DOUBLE) / i.avgdl)),
                    8) AS DECIMAL(18,8)) AS c
  FROM tf JOIN idf i ON i.term = tf.term),
lex AS (
  SELECT id, CAST(rnk AS BIGINT) AS rank
  FROM (SELECT id, ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) AS rnk
        FROM (SELECT id, ROUND(CAST(SUM(c) AS DOUBLE), 6) AS score
              FROM contrib WHERE id <> {_HY_QDOC} GROUP BY id) s) t
  WHERE rnk <= {_HY_K}),
el AS (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x,
              GENERATE_SUBSCRIPTS(embedding, 1) AS i
       FROM embeddings),
norms AS (SELECT vec_id,
                 SQRT(CAST(CAST(SUM(CAST(ROUND(x * x * 1e12) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12) AS nrm
          FROM el GROUP BY vec_id),
dots AS (
  SELECT ca.vec_id AS id,
         CAST(SUM(CAST(ROUND(qa.x * ca.x * 1e12) AS BIGINT)) AS BIGINT) AS dot
  FROM el qa JOIN el ca ON ca.i = qa.i AND ca.vec_id <> {_HY_QDOC}
  WHERE qa.vec_id = {_HY_QDOC}
  GROUP BY ca.vec_id),
dense AS (
  SELECT id, CAST(rnk AS BIGINT) AS rank
  FROM (SELECT d.id,
               ROW_NUMBER() OVER (
                 ORDER BY ROUND((CAST(d.dot AS DOUBLE) / 1e12) / (nq.nrm * nc.nrm), 6) DESC,
                          d.id ASC) AS rnk
        FROM dots d
        JOIN norms nq ON nq.vec_id = {_HY_QDOC}
        JOIN norms nc ON nc.vec_id = d.id) t
  WHERE rnk <= {_HY_K}),
fused AS (
  SELECT COALESCE(l.id, de.id) AS id,
         ROUND(CAST(
           COALESCE(CAST(ROUND(1.0 / ({_HY_C}.0 + CAST(l.rank AS DOUBLE)), 8) AS DECIMAL(18,8)), 0)
           + COALESCE(CAST(ROUND(1.0 / ({_HY_C}.0 + CAST(de.rank AS DOUBLE)), 8) AS DECIMAL(18,8)), 0)
         AS DOUBLE), 8) AS rrf_score
  FROM lex l FULL OUTER JOIN dense de ON de.id = l.id)
SELECT CAST(id AS BIGINT) AS id, rrf_score, CAST(rnk AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_score DESC, id ASC) AS rnk FROM fused) t
WHERE rnk <= {_HY_K}
"""


@df_query("hybrid_rrf_retrieval", _HYBRID_ORACLE)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-to-doc hybrid retrieval: lexical BM25 (query = doc 0's
    vocabulary) + dense cosine neighbors of embedding 0, combined by
    Reciprocal Rank Fusion — the standard hybrid-search stack as one
    DataFrame composition."""
    from datafusion_server_spark.operators import similarity

    docs = tables.load(spark, sf_dir, "documents")
    emb = tables.load(spark, sf_dir, "embeddings")
    lex = text.bm25_doc_query(docs, "text", "doc_id", _HY_QDOC, _HY_K)
    dense = similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id") == _HY_QDOC), _HY_K
    ).select(F.col("neighbor_id").alias("id"), "rank")
    return text.rrf_fuse(lex.select("id", "rank"), dense, _HY_K, c=_HY_C)


# corpus diversity: per-doc fraction of distinct trigrams shared with
# any other document (the n-gram half of Self-BLEU).
_SELF_OVERLAP_ORACLE = """
WITH words AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
grams AS (SELECT DISTINCT doc_id,
                 UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(w) - 2),
                                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
          FROM words),
dfreq AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS dfr FROM grams GROUP BY g)
SELECT CAST(gr.doc_id AS BIGINT) AS id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN d.dfr >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       ROUND(CAST(SUM(CASE WHEN d.dfr >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS overlap_ratio
FROM grams gr JOIN dfreq d ON d.g = gr.g
GROUP BY gr.doc_id
"""


@df_query("text_self_overlap_diversity", _SELF_OVERLAP_ORACLE)
def text_self_overlap_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return text.self_overlap_scores(docs, "text", "doc_id")


# PMI collocations: top adjacent word pairs by pointwise mutual
# information (pairs seen >= 5 times).
_PMI_K, _PMI_MIN = 15, 5

_PMI_ORACLE = f"""
WITH dt AS (SELECT string_split(text, ' ') AS toks FROM documents),
toks AS (SELECT UNNEST(toks) AS term FROM dt),
toks2 AS (SELECT term FROM toks WHERE term <> ''),
uni AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n_t FROM toks2 GROUP BY term),
pr AS (
  SELECT UNNEST(toks[1:len(toks)-1]) AS l, UNNEST(toks[2:len(toks)]) AS r
  FROM dt WHERE len(toks) >= 2),
pr2 AS (SELECT l, r FROM pr WHERE l <> '' AND r <> ''),
big AS (SELECT l, r, CAST(COUNT(*) AS BIGINT) AS n_pair FROM pr2 GROUP BY l, r),
tot AS (SELECT (SELECT CAST(SUM(n_t) AS BIGINT) FROM uni) AS nt,
               (SELECT CAST(SUM(n_pair) AS BIGINT) FROM big) AS np),
scored AS (
  SELECT b.l AS "left", b.r AS "right", b.n_pair,
         ROUND(LN((CAST(b.n_pair AS DOUBLE) / CAST(t.np AS DOUBLE))
                  / ((CAST(ua.n_t AS DOUBLE) / CAST(t.nt AS DOUBLE))
                     * (CAST(ub.n_t AS DOUBLE) / CAST(t.nt AS DOUBLE)))), 6) AS pmi
  FROM big b
  JOIN uni ua ON ua.term = b.l
  JOIN uni ub ON ub.term = b.r, tot t
  WHERE b.n_pair >= {_PMI_MIN})
SELECT "left", "right", n_pair, pmi, CAST(rnk AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, "left" ASC, "right" ASC) AS rnk
      FROM scored) t
WHERE rnk <= {_PMI_K}
"""


@df_query("text_pmi_collocations", _PMI_ORACLE)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return text.pmi_collocations(docs, "text", "doc_id", _PMI_K, _PMI_MIN)


# per-doc term entropy (+ normalized): repetitiveness signal.
_ENTROPY_ORACLE = """
WITH tok AS (SELECT doc_id AS id, UNNEST(string_split(text, ' ')) AS term FROM documents),
tok2 AS (SELECT id, term FROM tok WHERE term <> ''),
tf AS (SELECT id, term, CAST(COUNT(*) AS BIGINT) AS c FROM tok2 GROUP BY id, term),
per_doc AS (SELECT id, CAST(SUM(c) AS BIGINT) AS n_terms,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct
            FROM tf GROUP BY id),
contrib AS (
  SELECT t.id,
         CAST(ROUND(-(CAST(t.c AS DOUBLE) / CAST(p.n_terms AS DOUBLE))
                    * LN(CAST(t.c AS DOUBLE) / CAST(p.n_terms AS DOUBLE)), 8)
              AS DECIMAL(18,8)) AS h
  FROM tf t JOIN per_doc p ON p.id = t.id),
ent AS (SELECT id, SUM(h) AS hs FROM contrib GROUP BY id)
SELECT CAST(p.id AS BIGINT) AS id, p.n_terms, p.n_distinct,
       ROUND(CAST(e.hs AS DOUBLE), 6) AS entropy_nats,
       CASE WHEN p.n_distinct > 1
            THEN ROUND(CAST(e.hs AS DOUBLE) / LN(CAST(p.n_distinct AS DOUBLE)), 6) END AS entropy_norm
FROM per_doc p JOIN ent e ON e.id = p.id
"""


@df_query("text_term_entropy", _ENTROPY_ORACLE)
def text_term_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return text.term_entropy(docs, "text", "doc_id")


# per-language LM quality aggregate: mean/extremes of the corpus-LM
# cross-entropy by lang — the quality-by-domain rollup (which source is
# drifting garbage) over the existing xent subplan.
_XENT_BY_LANG_ORACLE = """
WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
model AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n_t FROM tok GROUP BY term),
tot AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM model),
logp AS (SELECT term,
                CAST(ROUND(-LN(CAST(n_t + 1 AS DOUBLE) / CAST(n + v AS DOUBLE)), 8)
                     AS DECIMAL(18,8)) AS nll
         FROM model, tot),
xent AS (SELECT t.doc_id,
                ROUND(CAST(SUM(l.nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS x
         FROM tok t JOIN logp l ON l.term = t.term GROUP BY t.doc_id)
SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(CAST(ROUND(x.x, 6) AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_xent,
       MIN(x.x) AS min_xent, MAX(x.x) AS max_xent
FROM documents d JOIN xent x ON x.doc_id = d.doc_id
GROUP BY d.lang
"""


@df_query("text_lm_xent_by_lang", _XENT_BY_LANG_ORACLE)
def text_lm_xent_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    xent = text.lm_unigram_cross_entropy(docs, "text", "doc_id")
    return (
        docs.select(F.col("doc_id").alias("id"), "lang")
        .join(xent, "id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.sum(F.round(F.col("xent_nats"), 6).cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_xent"),
            F.min("xent_nats").alias("min_xent"),
            F.max("xent_nats").alias("max_xent"),
        )
    )


# Zipf fit: the log-log rank-frequency slope of the top-N terms
# (natural language ~ -1; synthetic/templated corpora deviate) — the
# "does this corpus look like language" sanity stat.
_ZIPF_N = 200

_ZIPF_ORACLE = f"""
WITH tok AS (SELECT UNNEST(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS f FROM tok WHERE term <> '' GROUP BY term),
ranked AS (
  SELECT f, CAST(ROW_NUMBER() OVER (ORDER BY f DESC, term ASC) AS BIGINT) AS r
  FROM tf),
pts AS (
  SELECT ROUND(LN(CAST(r AS DOUBLE)), 8) AS x, ROUND(LN(CAST(f AS DOUBLE)), 8) AS y
  FROM ranked WHERE r <= {_ZIPF_N}),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(18,8))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(18,8))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * y, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(x * x, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sxx
  FROM pts)
SELECT n AS n_terms_fit,
       ROUND((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS zipf_slope,
       ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx) / CAST(n AS DOUBLE), 6) AS intercept
FROM mom
"""


@df_query("text_zipf_slope", _ZIPF_ORACLE)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_server_spark.operators.scale import ranked_topk

    docs = tables.load(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    # the fit uses only the top-N terms; distinct terms scale with the
    # corpus, so select them with TakeOrderedAndProject, not a global
    # rank window over the whole vocabulary
    pts = (
        ranked_topk(tf, [F.desc("f"), F.asc("term")], _ZIPF_N, "r")
        .select(
            F.round(F.log(F.col("r").cast("double")), 8).alias("x"),
            F.round(F.log(F.col("f").cast("double")), 8).alias("y"),
        )
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(18,8)")).alias("__sx"),
        F.sum(F.col("y").cast("decimal(18,8)")).alias("__sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 4).cast("decimal(38,4)")).alias("__sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 4).cast("decimal(38,4)")).alias("__sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return mom.select(
        F.col("n").alias("n_terms_fit"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


# Rank-Biased Overlap (Webber et al. 2010) between the lexical (BM25
# doc-query) and dense (cosine) top-K rankings for the same query doc —
# the principled top-weighted agreement measure between two rankers
# (truncated to depth K; the p^d tail beyond K is dropped, standard for
# fixed-depth lists). Per-depth overlap via a depth explode over the
# two K-row lists.
_RBO_P = 0.9

_RBO_ORACLE = f"""
WITH base AS (
  SELECT doc_id AS id, len(string_split(text, ' ')) AS dl FROM documents),
qterms AS (
  SELECT DISTINCT UNNEST(string_split(text, ' ')) AS term
  FROM documents WHERE doc_id = {_HY_QDOC}),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM base),
tok AS (
  SELECT doc_id AS id, UNNEST(string_split(text, ' ')) AS term FROM documents),
tf AS (
  SELECT t.id, b.dl, t.term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok t JOIN base b ON b.id = t.id
  WHERE t.term IN (SELECT term FROM qterms)
  GROUP BY t.id, b.dl, t.term),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t FROM tf GROUP BY term),
idf AS (
  SELECT d.term, s.avgdl,
         ROUND(LN(1.0 + (CAST(s.n AS DOUBLE) - d.df_t + 0.5) / (CAST(d.df_t AS DOUBLE) + 0.5)), 8) AS idf
  FROM dfq d, stats s),
contrib AS (
  SELECT tf.id,
         CAST(ROUND(i.idf * (CAST(tf.tf AS DOUBLE) * 2.2)
                    / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(tf.dl AS DOUBLE) / i.avgdl)),
                    8) AS DECIMAL(18,8)) AS c
  FROM tf JOIN idf i ON i.term = tf.term),
lex AS (
  SELECT id, CAST(rnk AS BIGINT) AS rank
  FROM (SELECT id, ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) AS rnk
        FROM (SELECT id, ROUND(CAST(SUM(c) AS DOUBLE), 6) AS score
              FROM contrib WHERE id <> {_HY_QDOC} GROUP BY id) s) t
  WHERE rnk <= {_HY_K}),
el AS (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x,
              GENERATE_SUBSCRIPTS(embedding, 1) AS i
       FROM embeddings),
norms AS (SELECT vec_id,
                 SQRT(CAST(CAST(SUM(CAST(ROUND(x * x * 1e12) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12) AS nrm
          FROM el GROUP BY vec_id),
dots AS (
  SELECT ca.vec_id AS id,
         CAST(SUM(CAST(ROUND(qa.x * ca.x * 1e12) AS BIGINT)) AS BIGINT) AS dot
  FROM el qa JOIN el ca ON ca.i = qa.i AND ca.vec_id <> {_HY_QDOC}
  WHERE qa.vec_id = {_HY_QDOC}
  GROUP BY ca.vec_id),
dense AS (
  SELECT id, CAST(rnk AS BIGINT) AS rank
  FROM (SELECT d.id,
               ROW_NUMBER() OVER (
                 ORDER BY ROUND((CAST(d.dot AS DOUBLE) / 1e12) / (nq.nrm * nc.nrm), 6) DESC,
                          d.id ASC) AS rnk
        FROM dots d
        JOIN norms nq ON nq.vec_id = {_HY_QDOC}
        JOIN norms nc ON nc.vec_id = d.id) t
  WHERE rnk <= {_HY_K}),
depths AS (SELECT UNNEST(RANGE(1, {_HY_K + 1})) AS d),
ovl AS (
  SELECT dp.d,
         CAST((SELECT COUNT(*) FROM lex l JOIN dense de ON de.id = l.id
               WHERE l.rank <= dp.d AND de.rank <= dp.d) AS BIGINT) AS o
  FROM depths dp)
SELECT CAST({_HY_K} AS BIGINT) AS depth,
       ROUND((1.0 - {_RBO_P}) * CAST(SUM(
         CAST(ROUND(POWER({_RBO_P}, CAST(d - 1 AS DOUBLE)) * CAST(o AS DOUBLE) / CAST(d AS DOUBLE), 8) AS DECIMAL(18,8))
       ) AS DOUBLE), 6) AS rbo
FROM ovl
"""


@df_query("eval_rbo_lexical_vs_dense", _RBO_ORACLE)
def eval_rbo_lexical_vs_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_server_spark.operators import similarity

    docs = tables.load(spark, sf_dir, "documents")
    emb = tables.load(spark, sf_dir, "embeddings")
    lex = text.bm25_doc_query(docs, "text", "doc_id", _HY_QDOC, _HY_K).select(
        "id", F.col("rank").alias("rl")
    )
    dense = similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id") == _HY_QDOC), _HY_K
    ).select(F.col("neighbor_id").alias("id"), F.col("rank").alias("rd"))
    depths = spark.range(1, _HY_K + 1).select(F.col("id").alias("d"))
    joined = lex.join(dense, "id")
    overlaps = depths.join(
        joined, (F.col("rl") <= F.col("d")) & (F.col("rd") <= F.col("d")), "left"
    ).groupBy("d").agg(F.count("id").cast("bigint").alias("o"))
    term = F.round(
        F.pow(F.lit(_RBO_P), (F.col("d") - 1).cast("double"))
        * F.col("o").cast("double")
        / F.col("d").cast("double"),
        8,
    ).cast("decimal(18,8)")
    return overlaps.agg(
        F.lit(_HY_K).cast("bigint").alias("depth"),
        F.round((1.0 - _RBO_P) * F.sum(term).cast("double"), 6).alias("rbo"),
    )


# vocabulary coverage curve: fraction of the corpus token stream covered
# by the top-k most frequent terms, for the tokenizer/vocab sizing
# decision (how big must the vocab be before OOV is negligible).
_VCURVE_KS = [10, 50, 100, 500, 1000]

_VCURVE_ORACLE = f"""
WITH tok AS (SELECT UNNEST(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS f FROM tok WHERE term <> '' GROUP BY term),
ranked AS (
  SELECT f, CAST(ROW_NUMBER() OVER (ORDER BY f DESC, term ASC) AS BIGINT) AS r
  FROM tf),
tot AS (SELECT CAST(SUM(f) AS BIGINT) AS n FROM ranked),
ks AS (SELECT UNNEST([{", ".join(str(k) for k in _VCURVE_KS)}]) AS k)
SELECT CAST(ks.k AS BIGINT) AS vocab_k,
       CAST(SUM(CASE WHEN ranked.r <= ks.k THEN ranked.f ELSE 0 END) AS BIGINT) AS covered_tokens,
       ROUND(CAST(SUM(CASE WHEN ranked.r <= ks.k THEN ranked.f ELSE 0 END) AS DOUBLE)
             / CAST((SELECT n FROM tot) AS DOUBLE), 6) AS coverage
FROM ranked, ks
GROUP BY ks.k
"""


@df_query("text_vocab_coverage_curve", _VCURVE_ORACLE)
def text_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage needs EVERY term's rank (the curve integrates the full
    frequency table), so top-k doesn't apply; the rank is the two-level
    range-partitioned ``distributed_rank`` — at web-scale vocabulary
    (billions of distinct terms) a single-partition rank window here
    would be the largest one-task funnel in the package."""
    from datafusion_server_spark.operators.scale import distributed_rank

    docs = tables.load(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    ranked = distributed_rank(tf, [F.desc("f"), F.asc("term")], "r")
    tot = ranked.agg(F.sum("f").cast("bigint").alias("__n"))
    ks = spark.createDataFrame([(k,) for k in _VCURVE_KS], "k bigint")
    return (
        ranked.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("r") <= F.col("k"), F.col("f")).otherwise(0))
            .cast("bigint")
            .alias("covered_tokens")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("k").alias("vocab_k"),
            "covered_tokens",
            F.round(
                F.col("covered_tokens").cast("double") / F.col("__n").cast("double"), 6
            ).alias("coverage"),
        )
    )


# --- CCNet-style perplexity-band pruning (r7) --------------------------------
# CCNet (arXiv:1911.00359) keeps the middle perplexity band per
# language: head = suspiciously-easy boilerplate, tail = noise. Band
# membership = within-language xent rank thirds, integer arithmetic.
#
# Scale shape: a lang-partitioned rank window would funnel each
# language's ENTIRE slice through one task (|langs| tasks for the whole
# corpus). Instead the rank is the two-level range-partitioned
# distributed_rank over the total order (lang, xent, id); the
# within-language rank is global_rank minus the language's broadcast
# cumulative offset (|langs| rows). Fully distributed at any corpus
# size.

_CCNET_ORACLE = """
WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
model AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n_t FROM tok GROUP BY term),
tot AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM model),
logp AS (SELECT term,
                CAST(ROUND(-LN(CAST(n_t + 1 AS DOUBLE) / CAST(n + v AS DOUBLE)), 8)
                     AS DECIMAL(18,8)) AS nll
         FROM model, tot),
xent AS (
  SELECT t.doc_id AS id,
         ROUND(CAST(SUM(l.nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS xent_nats
  FROM tok t JOIN logp l ON l.term = t.term
  GROUP BY t.doc_id),
jl AS (
  SELECT x.id, d.lang, x.xent_nats,
         ROW_NUMBER() OVER (PARTITION BY d.lang
                            ORDER BY x.xent_nats ASC, x.id ASC) AS r,
         COUNT(*) OVER (PARTITION BY d.lang) AS nl
  FROM xent x JOIN documents d ON d.doc_id = x.id)
SELECT CAST(id AS BIGINT) AS id, lang, xent_nats,
       CASE WHEN 3 * r <= nl THEN 'head'
            WHEN 3 * r <= 2 * nl THEN 'middle'
            ELSE 'tail' END AS band
FROM jl
"""


@df_query("prune_ccnet_perplexity_band", _CCNET_ORACLE)
def prune_ccnet_perplexity_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_server_spark.operators.scale import distributed_rank

    docs = tables.load(spark, sf_dir, "documents")
    xent = text.lm_unigram_cross_entropy(docs, "text", "doc_id").select(
        "id", "xent_nats"
    )
    j = xent.join(docs.selectExpr("doc_id AS id", "lang"), "id")
    ranked = distributed_rank(
        j, [F.asc("lang"), F.asc("xent_nats"), F.asc("id")], "__gr"
    )
    # bounded window: exclusive prefix over the per-LANGUAGE counts
    # (|langs|-bounded — the corpus-scaling rank above is distributed)
    offsets = (
        j.groupBy("lang")
        .agg(F.expr("CAST(COUNT(1) AS BIGINT) AS __nl"))
        .selectExpr(
            "lang",
            "__nl",
            "COALESCE(SUM(__nl) OVER (ORDER BY lang"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),"
            " CAST(0 AS BIGINT)) AS __off",
        )
    )
    return ranked.join(F.broadcast(offsets), "lang").selectExpr(
        "CAST(id AS BIGINT) AS id",
        "lang",
        "xent_nats",
        "CASE WHEN 3 * (__gr - __off) <= __nl THEN 'head' "
        "WHEN 3 * (__gr - __off) <= 2 * __nl THEN 'middle' "
        "ELSE 'tail' END AS band",
    )


# --- vocabulary richness estimators (r7) ---------------------------------------
# How many word types does the corpus REALLY have beyond the observed
# sample? Bias-corrected Chao1 (V + f1(f1-1)/(2(f2+1)) — defined for
# every f2 including 0, and the recommended small-sample form)
# and Good-Turing unseen mass (f1/N — the probability the next token
# is a NEW type) from the frequencies-of-frequencies table — the
# tokenizer-sizing / crawl-coverage estimators. All inputs are exact
# BIGINT aggregates; the statistics are closed forms.

_RICHNESS_ORACLE = """
WITH tok AS (SELECT UNNEST(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS f FROM tok WHERE term <> '' GROUP BY term),
ff AS (SELECT CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
              CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
              CAST(COUNT(*) AS BIGINT) AS v,
              CAST(SUM(f) AS BIGINT) AS n
       FROM tf)
SELECT n AS n_tokens, v AS n_types, f1 AS n_hapax, f2 AS n_dis,
       ROUND(CAST(v AS DOUBLE)
             + CAST(f1 AS DOUBLE) * CAST(f1 - 1 AS DOUBLE)
               / (2.0 * CAST(f2 + 1 AS DOUBLE)), 6) AS chao1,
       ROUND(CAST(f1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gt_unseen_mass
FROM ff
"""


@df_query("text_vocab_richness", _RICHNESS_ORACLE)
def text_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bias-corrected Chao1 richness floor + Good-Turing unseen-type
    mass from one term-frequency aggregation and one 4-count reduction
    — closed forms over BIGINT counts, defined for every corpus (the
    f2+1 denominator never divides by zero)."""
    docs = tables.load(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    ff = tf.agg(
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).cast("bigint").alias("f1"),
        F.sum(F.when(F.col("f") == 2, 1).otherwise(0)).cast("bigint").alias("f2"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
        F.sum("f").cast("bigint").alias("n"),
    )
    return ff.select(
        F.col("n").alias("n_tokens"),
        F.col("v").alias("n_types"),
        F.col("f1").alias("n_hapax"),
        F.col("f2").alias("n_dis"),
        F.round(
            F.col("v").cast("double")
            + F.col("f1").cast("double")
            * (F.col("f1") - 1).cast("double")
            / (F.lit(2.0) * (F.col("f2") + 1).cast("double")),
            6,
        ).alias("chao1"),
        F.round(F.col("f1").cast("double") / F.col("n").cast("double"), 6).alias(
            "gt_unseen_mass"
        ),
    )


# --- source-vocabulary overlap (r7) --------------------------------------------
# Jaccard overlap of the DISTINCT vocabularies of every source pair —
# the corpus-diversity audit ("are src3 and src11 the same crawl twice?").
# One distinct (source, term) projection, one term-keyed self-join to
# pair counts, inclusion-exclusion for the union: output bounded by
# |sources|^2 / 2 pairs.

_SRC_OVERLAP_ORACLE = """
WITH st AS (SELECT DISTINCT source, UNNEST(string_split(text, ' ')) AS term
            FROM documents),
stc AS (SELECT source, term FROM st WHERE term <> ''),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS v FROM stc GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM stc a JOIN stc b ON b.term = a.term AND a.source < b.source
  GROUP BY 1, 2)
SELECT i.src_a, i.src_b, sa.v AS v_a, sb.v AS v_b, i.n_common,
       ROUND(CAST(i.n_common AS DOUBLE)
             / CAST(sa.v + sb.v - i.n_common AS DOUBLE), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.source = i.src_a
JOIN sizes sb ON sb.source = i.src_b
"""


@df_query("profile_source_vocab_overlap", _SRC_OVERLAP_ORACLE)
def profile_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jaccard of per-source distinct vocabularies (duplicate-
    crawl detector at the SOURCE level). The self-join keys on term —
    each term contributes its source-pair combinations, bounded by
    |sources|^2 per term — and the output is |sources|-pair bounded."""
    docs = tables.load(spark, sf_dir, "documents")
    stc = (
        docs.select("source", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    sizes = stc.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    a = stc.select(F.col("source").alias("src_a"), "term")
    b = stc.select(F.col("source").alias("src_b"), "term")
    inter = (
        a.join(b, "term")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    out = (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("v").alias("v_a"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("v").alias("v_b"))),
            "src_b",
        )
    )
    return out.select(
        "src_a",
        "src_b",
        "v_a",
        "v_b",
        "n_common",
        F.round(
            F.col("n_common").cast("double")
            / (F.col("v_a") + F.col("v_b") - F.col("n_common")).cast("double"),
            6,
        ).alias("jaccard"),
    )


# --- langid confusion vs the fixture label (r7) --------------------------------
# The stopword-vote language identifier evaluated against the corpus
# truth label: per (true, predicted) confusion cell + per-true-lang
# recall — bounded |langs|^2 grid, the monitoring row a langid gate
# ships with.

_LANGID_CONF_ORACLE = f"""
SELECT d.lang AS true_lang, q.predicted_lang,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER (PARTITION BY d.lang) AS DOUBLE), 6)
         AS share_of_true
FROM ({_LANG_ORACLE}) q
JOIN documents d ON d.doc_id = q.id
GROUP BY d.lang, q.predicted_lang
"""


@df_query("eval_langid_confusion", _LANGID_CONF_ORACLE)
def eval_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    pred = text.language_id(docs, "text", "doc_id").select(
        F.col("id"), "predicted_lang"
    )
    truth = docs.select(
        F.col("doc_id").alias("id"), F.col("lang").alias("true_lang")
    )
    cell = (
        pred.join(truth, "id")
        .groupBy("true_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = cell.groupBy("true_lang").agg(F.sum("n").cast("bigint").alias("__t"))
    return cell.join(F.broadcast(tot), "true_lang").select(
        "true_lang",
        "predicted_lang",
        "n",
        F.round(F.col("n").cast("double") / F.col("__t").cast("double"), 6).alias(
            "share_of_true"
        ),
    )


# r9: T5/UL2 span-corruption denoising prep — block-aligned
# deterministic masking (operators/text.py::span_corruption docstring
# has the arithmetic). The oracle re-derives every step relationally:
# positional unnest (the GENERATE_SERIES zip), the same md5-residue
# select/length/offset math with true integer // (equal to the
# operator's small-residue form: (h // a) % b == ((h % (a*b)) // a) % b),
# sentinel numbering via dense_rank over masked blocks, and ordered
# STRING_AGG reassembly — digest equality proves the full strings.
_SPAN_CORRUPTION_ORACLE = """
WITH tok AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         UNNEST(GENERATE_SERIES(0, LEN(STRING_SPLIT(text, ' ')) - 1)) AS p,
         UNNEST(STRING_SPLIT(text, ' ')) AS w
  FROM documents),
base AS (
  SELECT id, p, w, p // 8 AS blk,
         CAST(('0x' || substr(md5('span:' || CAST(id AS VARCHAR) || ':'
                                  || CAST(p // 8 AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM tok),
feat AS (
  SELECT *, CASE WHEN h % 4 = 0 THEN 1 + ((h // 4) % 3) ELSE 0 END AS L
  FROM base),
feat2 AS (
  SELECT *, CASE WHEN L > 0 THEN (h // 12) % (8 - L + 1) END AS off
  FROM feat),
flags AS (
  SELECT *,
         (L > 0 AND (p % 8) >= off AND (p % 8) < off + L) AS masked,
         (L > 0 AND (p % 8) = off) AS first
  FROM feat2),
spanned AS (
  SELECT *, CASE WHEN masked THEN
      DENSE_RANK() OVER (PARTITION BY id, masked ORDER BY blk) - 1 END AS k
  FROM flags)
SELECT id AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT CASE WHEN masked THEN blk END) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
       md5(COALESCE(STRING_AGG(
         CASE WHEN NOT masked THEN w
              WHEN first THEN '<extra_id_' || CAST(k AS VARCHAR) || '>' END,
         ' ' ORDER BY p), '')) AS inputs_md5,
       md5(COALESCE(STRING_AGG(
         CASE WHEN masked THEN
           CASE WHEN first THEN '<extra_id_' || CAST(k AS VARCHAR) || '> ' || w
                ELSE w END END,
         ' ' ORDER BY p), '')) AS targets_md5
FROM spanned GROUP BY id
"""


@df_query("text_span_corruption", _SPAN_CORRUPTION_ORACLE)
def text_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic T5/UL2 span-corruption examples over documents:
    per-doc (n_tokens, n_spans, n_masked, inputs/targets digests),
    computed entirely with per-row JVM higher-order functions — no
    explode, no shuffle."""
    docs = tables.load(spark, sf_dir, "documents")
    return text.span_corruption(docs, "text", "doc_id")
