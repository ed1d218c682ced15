"""Text-analysis operators (SURVEY.md §2.E) over ``documents``.

LLM-training-data text metrics as pure JVM-side expressions — no
Python UDFs anywhere in this module: tokenization, quality scoring,
language-ID heuristics, token counting, and fingerprinting are all
built-in-function compositions, so they run inside whole-stage
codegen and scale linearly with document count (embarrassingly
parallel, zero shuffles except final aggregates).

Portability: every function here has an exact DuckDB-SQL twin
(split → string_split_regex, md5 → md5, higher-order filter →
list_filter), which is what makes the oracles exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog, expand_parallelism

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731

# Deterministic stopword sets for the langid heuristic + quality
# score. (Tiny by design: the heuristic must be exactly portable.)
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "on")
STOPWORDS_ES = ("el", "la", "de", "y", "en", "es", "un", "una")
STOPWORDS_FR = ("le", "la", "de", "et", "en", "est", "un", "une")
STOPWORDS_DE = ("der", "die", "das", "und", "in", "ist", "ein", "eine")

_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"  # BPE-ish: runs of letters / digits / single punct

# Inverted shingle-index document-frequency ceiling, shared by every
# bucket-blocked pair operator (dedup.py, corpus.py, graphs.py and
# text_winnow_overlap below). Defined here — the import-order root of
# that module family — so each oracle f-string can interpolate it.
MAX_SHINGLE_DF = 64


def tokens_col(text: str = "text") -> Column:
    """Whitespace tokens of a trimmed text column (JVM-side)."""
    return F.split(F.trim(F.col(text)), r"\s+")


def _stop_hits(tokens: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def _sql_stop_hits(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(toks, t -> list_contains([{lst}], t)))"


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + composite score.

    Features: char length, word count, mean word length, stopword
    ratio, punctuation ratio, uppercase ratio. Score is a fixed
    linear blend — deterministic, no model. One narrow projection
    over documents; groupless, shuffle-free.
    """
    docs = Catalog(spark, sf_dir).documents
    toks = tokens_col()
    n_words = F.size(toks)
    n_chars = F.length("text")
    stop = _stop_hits(toks, STOPWORDS_EN)
    punct = n_chars - F.length(F.regexp_replace("text", r"[.,!?;:]", ""))
    score = (
        F.least(n_words / F.lit(200.0), F.lit(1.0)) * 0.5
        + (stop / n_words) * 0.3
        + (1 - punct / n_chars) * 0.2
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_chars.cast("bigint").alias("n_chars_calc"),
        _R4(n_chars / n_words, "avg_word_len"),
        _R4(stop / n_words, "stopword_ratio"),
        _R4(punct / n_chars, "punct_ratio"),
        _R4(score, "quality_score"),
    )


TEXT_QUALITY_SQL = f"""
SELECT doc_id,
       len(toks) AS n_words,
       CAST(length(text) AS BIGINT) AS n_chars_calc,
       round(length(text) / CAST(len(toks) AS DOUBLE), 4) AS avg_word_len,
       round({_sql_stop_hits(STOPWORDS_EN)} / CAST(len(toks) AS DOUBLE), 4) AS stopword_ratio,
       round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / CAST(length(text) AS DOUBLE), 4) AS punct_ratio,
       round(least(len(toks) / 200.0, 1.0) * 0.5
             + ({_sql_stop_hits(STOPWORDS_EN)} / CAST(len(toks) AS DOUBLE)) * 0.3
             + (1 - (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / CAST(length(text) AS DOUBLE)) * 0.2, 4) AS quality_score
FROM (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
"""


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (deterministic heuristic).

    Counts hits against four tiny stopword profiles and picks the
    argmax (ties → 'und'). At 100 TB this is the cheap first-pass
    filter before any model-based langid; runs entirely in codegen.
    """
    docs = Catalog(spark, sf_dir).documents
    toks = tokens_col()
    en, es, fr, de = (
        _stop_hits(toks, STOPWORDS_EN),
        _stop_hits(toks, STOPWORDS_ES),
        _stop_hits(toks, STOPWORDS_FR),
        _stop_hits(toks, STOPWORDS_DE),
    )
    best = F.greatest(en, es, fr, de)
    pred = (
        F.when(best == F.lit(0), "und")
        .when(en == best, "en")
        .when(es == best, "es")
        .when(fr == best, "fr")
        .otherwise("de")
    )
    return docs.select(
        "doc_id",
        "lang",
        en.alias("en_hits"),
        es.alias("es_hits"),
        fr.alias("fr_hits"),
        de.alias("de_hits"),
        pred.alias("pred_lang"),
    )


TEXT_LANGID_SQL = f"""
SELECT doc_id, lang,
       en_hits, es_hits, fr_hits, de_hits,
       CASE WHEN greatest(en_hits, es_hits, fr_hits, de_hits) = 0 THEN 'und'
            WHEN en_hits = greatest(en_hits, es_hits, fr_hits, de_hits) THEN 'en'
            WHEN es_hits = greatest(en_hits, es_hits, fr_hits, de_hits) THEN 'es'
            WHEN fr_hits = greatest(en_hits, es_hits, fr_hits, de_hits) THEN 'fr'
            ELSE 'de' END AS pred_lang
FROM (
  SELECT doc_id, lang,
         {_sql_stop_hits(STOPWORDS_EN)} AS en_hits,
         {_sql_stop_hits(STOPWORDS_ES)} AS es_hits,
         {_sql_stop_hits(STOPWORDS_FR)} AS fr_hits,
         {_sql_stop_hits(STOPWORDS_DE)} AS de_hits
  FROM (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
)
"""


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens
    (letter runs / digit runs / single symbols) + chars-per-token —
    the standard pre-tokenizer cost estimate for LLM corpora."""
    docs = Catalog(spark, sf_dir).documents
    ws = F.size(tokens_col())
    bpe = F.size(F.regexp_extract_all(F.lower("text"), F.lit(_TOKEN_RE), 0))
    return docs.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        _R4(F.length("text") / bpe, "chars_per_token"),
    )


TEXT_TOKENS_SQL = rf"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '{_TOKEN_RE}')) AS n_bpe_tokens,
       round(length(text) / CAST(len(regexp_extract_all(lower(text), '{_TOKEN_RE}')) AS DOUBLE), 4) AS chars_per_token
FROM documents
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: full-text md5, normalized-text md5
    (lower+trim → whitespace-insensitive), and the minimum word-
    5-gram shingle hash (a 1-hash MinHash — the rolling-fingerprint
    primitive dedup builds on)."""
    # tokens materialized first: an inline split() referenced inside
    # the transform lambda would re-tokenize once per shingle (no CSE
    # into higher-order-function bodies)
    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", "text", tokens_col().alias("toks")
    )
    toks = F.col("toks")
    norm = F.concat_ws(" ", toks)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(4), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 5)),
    )
    return docs.select(
        "doc_id",
        F.md5("text").alias("md5_raw"),
        F.md5(norm).alias("md5_norm"),
        F.array_min(F.transform(shingles, F.md5)).alias("min_shingle_md5"),
    )


TEXT_FINGERPRINT_SQL = r"""
SELECT doc_id,
       md5(text) AS md5_raw,
       md5(array_to_string(toks, ' ')) AS md5_norm,
       list_aggregate(list_transform(
           generate_series(1, greatest(len(toks) - 4, 1)),
           i -> md5(array_to_string(toks[i:i+4], ' '))), 'min') AS min_shingle_md5
FROM (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks FROM documents)
"""


QUERIES: dict[str, tuple] = {
    "text_quality": (text_quality, TEXT_QUALITY_SQL),
    "text_langid": (text_langid, TEXT_LANGID_SQL),
    "text_tokens": (text_tokens, TEXT_TOKENS_SQL),
    "text_fingerprint": (text_fingerprint, TEXT_FINGERPRINT_SQL),
}


def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document.

    Classic two-aggregate shape: term frequencies (doc × term
    groupBy) and document frequencies (term groupBy) share one
    exploded scan; idf joins back on the bounded term key. The
    final per-doc top-k is a window over ≤|vocab| rows per doc.
    ln() in both engines; deterministic tie-break on term.
    """
    docs = expand_parallelism(Catalog(spark, sf_dir).documents)
    terms = docs.select("doc_id", F.explode(tokens_col()).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("_cnt"))
    doc_len = tf.groupBy("doc_id").agg(F.sum("_cnt").alias("_len"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(doc_len, "doc_id")
        .join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            ((F.col("_cnt") / F.col("_len")) * F.log(F.col("_n") / F.col("_df"))).alias("_tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("_tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", _R4(F.col("_tfidf"), "tfidf"), "rank")
    )


TEXT_TFIDF_SQL = r"""
WITH terms AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS cnt FROM terms GROUP BY 1, 2
), dl AS (
  SELECT doc_id, sum(cnt) AS len FROM tf GROUP BY 1
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id, tf.term,
         (cnt / CAST(len AS DOUBLE)) * ln((SELECT count(*) FROM documents) / CAST(df AS DOUBLE)) AS tfidf
  FROM tf JOIN dl USING (doc_id) JOIN df USING (term)
)
SELECT doc_id, term, round(tfidf, 4) AS tfidf, rank
FROM (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS INTEGER) AS rank
      FROM scored)
WHERE rank <= 3
"""


def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 word bigrams — the n-gram frequency table
    (explode + bounded-key groupBy + deterministic top-k)."""
    # tokens materialized first (no CSE into HOF lambdas — see
    # text_fingerprint)
    docs = expand_parallelism(Catalog(spark, sf_dir).documents).select(
        tokens_col().alias("toks")
    )
    toks = F.col("toks")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


TEXT_TOP_BIGRAMS_SQL = r"""
SELECT bigram, count(*) AS n
FROM (
  SELECT unnest(list_transform(generate_series(1, greatest(len(toks) - 1, 1)),
                i -> array_to_string(toks[i:i+1], ' '))) AS bigram
  FROM (SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents)
)
GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT 20
"""


def text_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus profile: doc counts, length stats, language
    mix — the monitoring query every ingest pipeline publishes."""
    docs = Catalog(spark, sf_dir).documents
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        _R4(F.avg("n_chars"), "avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


TEXT_CORPUS_STATS_SQL = """
SELECT source, count(*) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       count(DISTINCT lang) AS n_langs
FROM documents
GROUP BY source
"""


QUERIES.update(
    {
        "text_tfidf": (text_tfidf, TEXT_TFIDF_SQL),
        "text_top_bigrams": (text_top_bigrams, TEXT_TOP_BIGRAMS_SQL),
        "text_corpus_stats": (text_corpus_stats, TEXT_CORPUS_STATS_SQL),
    }
)


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit per source: OLS slope of ln(freq) vs ln(rank)
    over the source's token frequency table (natural corpora slope
    ≈ −1; synthetic/templated text flattens toward 0 — a cheap
    distribution-shape fingerprint for incoming feeds).

    Token frequencies are one hash aggregate; ranking windows only
    over the (bounded) per-source vocabulary; the fit is a single
    algebraic regr_slope/intercept/r2 aggregate — no iteration.
    """
    docs = expand_parallelism(Catalog(spark, sf_dir).documents).select(
        "source", F.explode(tokens_col()).alias("w")
    )
    tf = docs.groupBy("source", "w").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("source").orderBy(F.desc("freq"), F.asc("w"))
    ranked = tf.withColumn("rank", F.row_number().over(w))
    lf, lr = F.log(F.col("freq").cast("double")), F.log(F.col("rank").cast("double"))
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab_size"),
        _R4(F.regr_slope(lf, lr), "zipf_slope"),
        _R4(F.regr_intercept(lf, lr), "zipf_intercept"),
        _R4(F.regr_r2(lf, lr), "zipf_r2"),
    )


TEXT_ZIPF_SQL = r"""
WITH tf AS (
  SELECT source, w, count(*) AS freq
  FROM (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents)
  GROUP BY 1, 2
), ranked AS (
  SELECT source, freq,
         row_number() OVER (PARTITION BY source ORDER BY freq DESC, w ASC) AS rank
  FROM tf
)
SELECT source,
       count(*) AS vocab_size,
       round(regr_slope(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 4) AS zipf_slope,
       round(regr_intercept(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 4) AS zipf_intercept,
       round(regr_r2(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 4) AS zipf_r2
FROM ranked
GROUP BY source
"""

QUERIES["text_zipf_fit"] = (text_zipf_fit, TEXT_ZIPF_SQL)

_FH_DIM = 64


def text_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bag-of-words: each token hashes to one of 64
    buckets (first md5 byte mod 64 — portable), giving a fixed-dim
    count vector per document with NO vocabulary build, no shuffle,
    and no OOV problem — the streaming-safe text vectorizer.

    The whole op is one codegen projection (tokens → bucket ints →
    per-bucket counts via filter/size); output carries the vector
    fingerprint + summary stats so the row stays narrow at scale.
    """
    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", tokens_col().alias("toks")
    )
    buckets = F.transform(
        "toks",
        lambda w: F.conv(F.substring(F.md5(w), 1, 2), 16, 10).cast("int") % _FH_DIM,
    )
    b = docs.select("doc_id", F.size("toks").alias("n_tokens"), buckets.alias("b"))
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(_FH_DIM - 1)),
        lambda i: F.size(F.filter("b", lambda x: x == i)),
    )
    c = b.select("doc_id", "n_tokens", counts.alias("vec"))
    return c.select(
        "doc_id",
        "n_tokens",
        F.size(F.filter("vec", lambda v: v > 0)).alias("nnz"),
        F.array_max("vec").alias("max_count"),
        F.md5(F.array_join("vec", ",")).alias("vec_md5"),
    )


TEXT_FEATURE_HASH_SQL = rf"""
WITH b AS (
  SELECT doc_id, len(toks) AS n_tokens,
         list_transform(toks, w -> CAST('0x' || substr(md5(w), 1, 2) AS INTEGER) % {_FH_DIM}) AS b
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents)
), c AS (
  SELECT doc_id, n_tokens,
         list_transform(generate_series(0, {_FH_DIM - 1}),
                        i -> len(list_filter(b, x -> x = i))) AS vec
  FROM b
)
SELECT doc_id, n_tokens,
       len(list_filter(vec, v -> v > 0)) AS nnz,
       list_max(vec) AS max_count,
       md5(array_to_string(vec, ',')) AS vec_md5
FROM c
"""

QUERIES["text_feature_hash"] = (text_feature_hash, TEXT_FEATURE_HASH_SQL)


WINNOW_K = 16  # char k-gram length
WINNOW_W = 8  # winnowing window (selection guarantee: k + w - 1 chars)


def text_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS-style) fingerprint overlap: per doc, hash all
    char 16-grams of the normalized text, take the minimum hash of
    every 8-hash sliding window, and keep the distinct selected
    values as the document signature — any shared substring of
    ≥ k + w − 1 = 23 chars is GUARANTEED to produce a shared
    fingerprint. Cross-doc overlap via the inverted fingerprint
    index (hot fingerprints df-capped and dropped — a fingerprint in
    >64 docs is boilerplate carrying no plagiarism signal), reported
    as the top-20 pairs by shared-fingerprint count with the overlap
    coefficient shared/min(|A|,|B|).

    Scale: signatures are per-row codegen (no shuffle); the pair
    stage is the same bounded inverted-index shape as
    dedup_ngram_jaccard — one shuffle on the fingerprint key, pair
    work Σ df², never corpus².
    """
    from etl_gov_spark.operators.dedup import (
        MAX_SHINGLE_DF,
        bounded_buckets,
        pair_structs,
    )

    # r16 OPTIMIZATION (guide §2.5 input skew / §1.2 algorithm
    # first): the compact documents parquet arrives as ONE scan
    # split, so the ~10M md5 evaluations of the signature stage ran
    # on a single core. Widening to cluster parallelism before the
    # per-row hash work cut the signature stage 6.99 → 0.60 s at
    # sf0.1 (values unchanged — per-row computation).
    docs = expand_parallelism(Catalog(spark, sf_dir).documents).select(
        "doc_id", F.lower(F.trim(F.col("text"))).alias("s")
    )
    s = F.col("s")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - (WINNOW_K - 1), F.lit(1))),
        lambda i: F.conv(
            F.substring(F.md5(s.substr(i, F.lit(WINNOW_K))), 1, 8), 16, 10
        ).cast("long"),
    )
    sigs = docs.select("doc_id", grams.alias("h")).select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size("h") - (WINNOW_W - 1), F.lit(1))
                ),
                lambda j: F.array_min(F.slice("h", j, WINNOW_W)),
            )
        ).alias("fps"),
    )
    index = sigs.select(
        F.struct("doc_id", F.size("fps").alias("nf")).alias("dn"),
        F.explode("fps").alias("f"),
    )
    buckets = bounded_buckets(
        index.groupBy("f")
        .agg(F.array_sort(F.collect_list("dn")).alias("ds"))
        .filter(F.size("ds") > 1),
        "ds",
        MAX_SHINGLE_DF,
        "text_winnow_overlap",
    )
    inter = (
        buckets.select(F.explode(pair_structs(F.col("ds"))).alias("p"))
        .groupBy(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.a.nf").alias("nf_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.b.nf").alias("nf_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    # distributed top-k, rank re-derived on the 20 survivors
    w = [F.desc("n_shared"), F.asc("doc_a"), F.asc("doc_b")]
    return (
        inter.orderBy(*w)
        .limit(20)
        .withColumn("rank", F.row_number().over(Window.orderBy(*w)))
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(
                F.col("n_shared") / F.least("nf_a", "nf_b"), 4
            ).alias("overlap_coeff"),
            "rank",
        )
    )


TEXT_WINNOW_SQL = f"""
WITH d AS (
  SELECT doc_id, lower(trim(text)) AS s FROM documents
), g AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(s) - {WINNOW_K - 1}, 1)),
                        i -> CAST('0x' || substr(md5(substr(s, i, {WINNOW_K})), 1, 8) AS BIGINT)) AS h
  FROM d
), sigs AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, greatest(len(h) - {WINNOW_W - 1}, 1)),
                                      j -> list_min(h[j:j+{WINNOW_W - 1}]))) AS fps
  FROM g
), idx AS (
  SELECT doc_id, len(fps) AS nf, unnest(fps) AS f FROM sigs
), keep AS (
  SELECT f FROM idx GROUP BY f HAVING count(*) BETWEEN 2 AND {MAX_SHINGLE_DF}
), inter AS (
  SELECT a.doc_id AS doc_a, a.nf AS nf_a, b.doc_id AS doc_b, b.nf AS nf_b,
         count(*) AS n_shared
  FROM idx a JOIN idx b ON a.f = b.f AND a.doc_id < b.doc_id
  WHERE a.f IN (SELECT f FROM keep)
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, n_shared,
       round(n_shared / CAST(least(nf_a, nf_b) AS DOUBLE), 4) AS overlap_coeff,
       rank
FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY n_shared DESC, doc_a ASC, doc_b ASC) AS INTEGER) AS rank
  FROM inter
)
WHERE rank <= 20
"""

QUERIES["text_winnow_overlap"] = (text_winnow_overlap, TEXT_WINNOW_SQL)


def _marks(col: Column, pattern: str) -> Column:
    """Count non-overlapping runs matching ``pattern`` by collapsing
    each run to one '#' and counting the marks — identical regex
    semantics in Spark (Java regex) and DuckDB (RE2) for the simple
    character classes used here. Literal '#' already present in the
    input is stripped first so it can't inflate the mark count."""
    marked = F.regexp_replace(F.regexp_replace(col, "#", ""), pattern, "#")
    return (
        F.length(marked) - F.length(F.regexp_replace(marked, "#", ""))
    ).cast("long")


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the readability feature
    corpus-quality filters gate on (too-low = legalese/garble,
    too-high = trivial/listicle). Syllables are approximated by
    vowel-group runs (the standard cheap estimator), sentences by
    terminal-punctuation runs (min 1). Pure per-row codegen regex
    algebra: no shuffle, no Python, linear at any corpus size."""
    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", "source", F.lower(F.col("text")).alias("s")
    )
    n_words = F.greatest(_marks(F.col("s"), r"[a-z0-9']+"), F.lit(1))
    n_sent = F.greatest(_marks(F.col("s"), r"[.!?]+"), F.lit(1))
    n_syll = F.greatest(_marks(F.col("s"), r"[aeiouy]+"), F.lit(1))
    flesch = (
        F.lit(206.835)
        - 1.015 * (n_words.cast("double") / n_sent)
        - 84.6 * (n_syll.cast("double") / n_words)
    )
    return docs.select(
        "doc_id",
        "source",
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        F.round(flesch, 4).alias("flesch"),
        F.when(flesch >= 60, "easy")
        .when(flesch >= 30, "standard")
        .otherwise("difficult")
        .alias("band"),
    )


TEXT_READABILITY_SQL = r"""
WITH d AS (
  SELECT doc_id, source, replace(lower(text), '#', '') AS s FROM documents
), m AS (
  SELECT doc_id, source,
         greatest(len(regexp_replace(s, '[a-z0-9'']+', '#', 'g'))
                  - len(regexp_replace(regexp_replace(s, '[a-z0-9'']+', '#', 'g'), '#', '', 'g')), 1) AS n_words,
         greatest(len(regexp_replace(s, '[.!?]+', '#', 'g'))
                  - len(regexp_replace(regexp_replace(s, '[.!?]+', '#', 'g'), '#', '', 'g')), 1) AS n_sentences,
         greatest(len(regexp_replace(s, '[aeiouy]+', '#', 'g'))
                  - len(regexp_replace(regexp_replace(s, '[aeiouy]+', '#', 'g'), '#', '', 'g')), 1) AS n_syllables
  FROM d
)
SELECT doc_id, source, n_words, n_sentences, n_syllables,
       round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                     - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) AS flesch,
       CASE WHEN 206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                         - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words) >= 60 THEN 'easy'
            WHEN 206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                         - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words) >= 30 THEN 'standard'
            ELSE 'difficult' END AS band
FROM m
"""

QUERIES["text_readability"] = (text_readability, TEXT_READABILITY_SQL)


def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM cross-entropy, top-20 most surprising
    docs — the second-order quality filter: corpus_unigram_logprob
    catches rare WORDS, this catches implausible word ORDER
    (shuffled text, spam keyword stuffing, OCR damage) that a
    unigram model scores as perfectly normal.

    Model: add-one-smoothed bigram probabilities
    P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V) trained on the corpus
    itself. Three shuffles, all on uniform token keys: bigram
    counts, unigram counts, then the per-doc score join; V and
    nothing else crosses the driver. Adjacent pairs come from
    zipping the token array against its own tail — no positional
    explode, no window.
    """
    docs = expand_parallelism(Catalog(spark, sf_dir).documents).select(
        "doc_id", tokens_col().alias("toks")
    )
    uni = docs.select(F.explode("toks").alias("w"))
    c1 = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    vocab = c1.agg(F.count(F.lit(1)).alias("v"))
    pairs = (
        docs.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(toks, 1, size(toks) - 1)"),
                    F.expr("slice(toks, 2, size(toks) - 1)"),
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b")["0"].alias("w1"), F.col("b")["1"].alias("w2"))
    )
    c2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    scored = (
        pairs.join(c2, ["w1", "w2"])
        .join(c1.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            _R4(
                F.avg(
                    -F.log(
                        (F.col("c2") + 1) / (F.col("c1") + F.col("v")).cast("double")
                    )
                ),
                "cross_entropy",
            ),
        )
    )
    # distributed top-k, rank re-derived on the 20 survivors
    w = [F.desc("cross_entropy"), F.asc("doc_id")]
    return (
        scored.orderBy(*w)
        .limit(20)
        .withColumn("rank", F.row_number().over(Window.orderBy(*w)).cast("int"))
        .select("doc_id", "n_bigrams", "cross_entropy", "rank")
    )


TEXT_BIGRAM_PERPLEXITY_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), c1 AS (
  SELECT w, count(*) AS c1 FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
), v AS (SELECT count(*) AS v FROM c1),
pairs AS (
  SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
  FROM toks WHERE len(t) >= 2
), c2 AS (
  SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY 1, 2
), scored AS (
  SELECT p.doc_id, count(*) AS n_bigrams,
         round(avg(-ln((c2.c2 + 1) / CAST(c1.c1 + v.v AS DOUBLE))), 4) AS cross_entropy
  FROM pairs p
  JOIN c2 USING (w1, w2)
  JOIN c1 ON c1.w = p.w1
  CROSS JOIN v
  GROUP BY p.doc_id
)
SELECT doc_id, n_bigrams, cross_entropy, rank
FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY cross_entropy DESC, doc_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= 20
"""

QUERIES["text_bigram_perplexity"] = (text_bigram_perplexity, TEXT_BIGRAM_PERPLEXITY_SQL)


_TFIDF_PAIR_MAX_DF = 64
_TFIDF_PAIR_MIN_COS = 0.4


def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted near-duplicate detection: document pairs whose
    TF-IDF cosine over DISCRIMINATIVE terms (2 ≤ df ≤ 64) exceeds
    0.4 — the weighted companion to the Jaccard dedup family: two
    docs sharing a few rare terms score high even when their
    boilerplate differs.

    The df cap is the metric's definition, not a hidden truncation:
    ubiquitous terms carry ~zero idf anyway, and capping df bounds
    every posting list, so pair generation is Σ df² ≤ 64·Σ df —
    linear-ish in corpus size, never corpus². Same inverted-index
    join discipline as ``dedup_ngram_jaccard``; weights instead of
    set bits.
    """
    docs = expand_parallelism(Catalog(spark, sf_dir).documents)
    terms = docs.select("doc_id", F.explode(tokens_col()).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("cnt"))
    doc_len = tf.groupBy("doc_id").agg(F.sum("cnt").alias("len"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    w = (
        tf.join(df_.filter(
            (F.col("df") >= 2) & (F.col("df") <= _TFIDF_PAIR_MAX_DF)
        ), "term")
        .join(doc_len, "doc_id")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                (F.col("cnt") / F.col("len")) * F.log(F.col("n") / F.col("df")),
                6,
            ).alias("w"),
        )
    )
    norm = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nm")
    )
    a = w.alias("a")
    b = w.alias("b")
    dots = (
        a.join(b, "term")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    na = norm.select(F.col("doc_id").alias("doc_a"), F.col("nm").alias("na"))
    nb = norm.select(F.col("doc_id").alias("doc_b"), F.col("nm").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            _R4(F.col("dot") / (F.col("na") * F.col("nb")), "cosine"),
        )
        .filter(F.col("cosine") >= _TFIDF_PAIR_MIN_COS)
    )


Q_TFIDF_COSINE_PAIRS_SQL = rf"""
WITH terms AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS cnt FROM terms GROUP BY 1, 2
), dl AS (
  SELECT doc_id, sum(cnt) AS len FROM tf GROUP BY 1
), dfs AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
  HAVING count(*) BETWEEN 2 AND {_TFIDF_PAIR_MAX_DF}
), w AS (
  SELECT tf.doc_id, tf.term,
         round((cnt / CAST(len AS DOUBLE))
               * ln((SELECT count(*) FROM documents) / CAST(df AS DOUBLE)),
               6) AS w
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id)
), norm AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nm FROM w GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d.doc_a, d.doc_b,
       round(d.dot / (na.nm * nb.nm), 4) AS cosine
FROM dots d
JOIN norm na ON na.doc_id = d.doc_a
JOIN norm nb ON nb.doc_id = d.doc_b
WHERE round(d.dot / (na.nm * nb.nm), 4) >= {_TFIDF_PAIR_MIN_COS}
"""

QUERIES["q_tfidf_cosine_pairs"] = (q_tfidf_cosine_pairs, Q_TFIDF_COSINE_PAIRS_SQL)


_RAKE_TOP = 20


def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction, corpus-wide top 20: split each
    document into candidate phrases at stopword boundaries, score
    words by degree/frequency over the whole corpus, score a phrase
    as the sum of its word scores (the RAKE convention) — unsupervised keyphrase mining with zero model weights,
    the classic first pass over an unlabeled corpus.

    Phrase splitting is one regexp_split (JVM-side); word stats are
    two bounded-key aggregates over the exploded phrase words; the
    final ranking is a window over distinct phrases. Degree here is
    the RAKE convention: Σ(phrase length) over the phrases
    containing the word.
    """
    stop_pat = r"\b(?:" + "|".join(STOPWORDS_EN) + r")\b"
    docs = expand_parallelism(Catalog(spark, sf_dir).documents).select(
        "doc_id", F.lower(F.trim("text")).alias("t")
    )
    phrases = docs.select(
        F.explode(F.split(F.col("t"), stop_pat)).alias("p")
    ).select(F.trim(F.regexp_replace("p", r"\s+", " ")).alias("p")).filter(
        (F.col("p") != "") & (F.size(F.split(F.col("p"), " ")) <= 4)
    )
    ph_words = phrases.select(
        "p",
        F.split(F.col("p"), " ").alias("ws"),
    ).select("p", F.size("ws").alias("plen"), F.explode("ws").alias("w"))
    word_stats = ph_words.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("degree"),
    )
    occ = phrases.groupBy("p").agg(F.count(F.lit(1)).alias("n_occur"))
    rep_words = occ.select(
        "p", "n_occur", F.explode(F.split(F.col("p"), " ")).alias("w")
    )
    scored = (
        rep_words.join(F.broadcast(word_stats), "w")
        .groupBy("p", "n_occur")
        .agg(F.round(F.sum(F.col("degree") / F.col("freq")), 6).alias("_s"))
    )
    # distributed top-k, rank re-derived on the k survivors
    w = [F.desc("_s"), F.asc("p")]
    return (
        scored.orderBy(*w)
        .limit(_RAKE_TOP)
        .withColumn("rank", F.row_number().over(Window.orderBy(*w)))
        .select("rank", F.col("p").alias("phrase"), _R4(F.col("_s"), "score"), "n_occur")
    )


def _rake_sql() -> str:
    stop = "|".join(STOPWORDS_EN)
    return rf"""
WITH docs AS (
  SELECT doc_id, lower(trim(text)) AS t FROM documents
), raw_phrases AS (
  SELECT unnest(string_split_regex(t, '\b(?:{stop})\b')) AS p FROM docs
), phrases AS (
  SELECT trim(regexp_replace(p, '\s+', ' ', 'g')) AS p FROM raw_phrases
), kept AS (
  SELECT p FROM phrases
  WHERE p != '' AND len(string_split(p, ' ')) <= 4
), ph_words AS (
  SELECT p, len(string_split(p, ' ')) AS plen,
         unnest(string_split(p, ' ')) AS w
  FROM kept
), word_stats AS (
  SELECT w, count(*) AS freq, sum(plen) AS degree FROM ph_words GROUP BY w
), occ AS (
  SELECT p, count(*) AS n_occur FROM kept GROUP BY p
), rep_words AS (
  SELECT p, n_occur, unnest(string_split(p, ' ')) AS w FROM occ
), scored AS (
  SELECT rw.p, rw.n_occur,
         round(sum(ws.degree / CAST(ws.freq AS DOUBLE)), 6) AS s
  FROM rep_words rw JOIN word_stats ws USING (w)
  GROUP BY rw.p, rw.n_occur
)
SELECT CAST(row_number() OVER (ORDER BY s DESC, p ASC) AS INTEGER) AS rank,
       p AS phrase, round(s, 4) AS score, n_occur
FROM scored
ORDER BY rank LIMIT {_RAKE_TOP}
"""


QUERIES["text_rake_keyphrases"] = (text_rake_keyphrases, _rake_sql())


def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation against ground truth: the confusion
    matrix of the 8-language char-n-gram classifier
    (``text_langid_trigram`` — widened from the 4-lang stopword
    first pass in round 11) vs the corpus `lang` label, with
    per-cell share of the true class — the eval loop closed
    warehouse-side (the classifier predicts; this scores).

    Reuses the classifier's own DataFrame (one plan, no second
    scan) and reduces to a |langs|² aggregate.
    """
    pred = text_langid_trigram(spark, sf_dir).select("lang", "pred_lang")
    cell = pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("lang")
    return cell.select(
        "lang",
        "pred_lang",
        "n",
        _R4(F.col("n") / F.sum("n").over(tot), "share_of_true"),
        (F.col("lang") == F.col("pred_lang")).alias("correct"),
    )


TEXT_LANGID_CONFUSION_SQL = f"""
WITH pred AS ({{TRIGRAM_SQL}}),
cell AS (
  SELECT lang, pred_lang, count(*) AS n FROM pred GROUP BY 1, 2
)
SELECT lang, pred_lang, n,
       round(n / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE), 4)
         AS share_of_true,
       lang = pred_lang AS correct
FROM cell
"""

QUERIES["text_langid_confusion"] = (
    text_langid_confusion,
    TEXT_LANGID_CONFUSION_SQL,
)


_PMI_MIN_COUNT = 5
_PMI_TOP = 20


def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by pointwise mutual information: adjacent
    bigrams scoring log₂ p(ab)/(p(a)p(b)) with a min-count floor —
    the information-weighted upgrade over ``text_top_bigrams``'
    raw counts (raw counts surface 'of the'; PMI surfaces names
    and technical terms).

    Bigrams come from one zip-with-shift projection; unigram and
    bigram tables are bounded-key aggregates; the score join is
    broadcast on the word marginals.
    """
    docs = expand_parallelism(Catalog(spark, sf_dir).documents).select(
        tokens_col().alias("t")
    )
    bi = docs.select(
        F.explode(
            F.expr(
                "filter(zip_with(t, slice(t, 2, size(t)),"
                " (a, b) -> struct(a AS w1, b AS w2)), p -> p.w2 IS NOT NULL)"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("nb"))
    uni = docs.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("nu")
    )
    tot_b = bc.agg(F.sum("nb").alias("tb"))
    tot_u = uni.agg(F.sum("nu").alias("tu"))
    j = (
        bc.filter(F.col("nb") >= _PMI_MIN_COUNT)
        .join(F.broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("nu", "n1")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("nu", "n2")), "w2")
        .crossJoin(F.broadcast(tot_b))
        .crossJoin(F.broadcast(tot_u))
    )
    pmi = F.log2(
        (F.col("nb") / F.col("tb"))
        / ((F.col("n1") / F.col("tu")) * (F.col("n2") / F.col("tu")))
    )
    # distributed top-k, rank re-derived on the k survivors
    wtop = [F.desc(F.round(pmi, 6)), F.asc("w1"), F.asc("w2")]
    return (
        j.orderBy(*wtop)
        .limit(_PMI_TOP)
        .withColumn("rank", F.row_number().over(Window.orderBy(*wtop)))
        .select("rank", "w1", "w2", F.col("nb").alias("n_bigram"), _R4(pmi, "pmi"))
    )


TEXT_PMI_SQL = rf"""
WITH toks AS (
  SELECT string_split_regex(trim(text), '\s+') AS t FROM documents
), bi AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM toks, unnest(range(1, len(t))) AS r(i)
), bc AS (
  SELECT w1, w2, count(*) AS nb FROM bi GROUP BY 1, 2
), uni AS (
  SELECT unnest(t) AS w FROM toks
), uc AS (
  SELECT w, count(*) AS nu FROM uni GROUP BY w
), tots AS (
  SELECT (SELECT sum(nb) FROM bc) AS tb, (SELECT sum(nu) FROM uc) AS tu
), scored AS (
  SELECT b.w1, b.w2, b.nb,
         log2((b.nb / CAST(t.tb AS DOUBLE))
              / ((u1.nu / CAST(t.tu AS DOUBLE))
                 * (u2.nu / CAST(t.tu AS DOUBLE)))) AS pmi
  FROM bc b
  JOIN uc u1 ON u1.w = b.w1
  JOIN uc u2 ON u2.w = b.w2
  CROSS JOIN tots t
  WHERE b.nb >= {_PMI_MIN_COUNT}
)
SELECT CAST(row_number() OVER (ORDER BY round(pmi, 6) DESC, w1 ASC, w2 ASC)
            AS INTEGER) AS rank,
       w1, w2, nb AS n_bigram, round(pmi, 4) AS pmi
FROM scored
ORDER BY rank LIMIT {_PMI_TOP}
"""

QUERIES["text_pmi_bigrams"] = (text_pmi_bigrams, TEXT_PMI_SQL)


_DELTA_TOP_WORDS = 50
_DELTA_TOP_PAIRS = 15


def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometry between sources: z-score each
    source's relative frequency of the corpus top-50 words, Delta =
    mean |z_a − z_b| over the word panel, report the most similar
    source pairs — the standard authorship/provenance distance a
    document-forensics team runs before any model.

    Everything is bounded: top-50 vocabulary (one top-k window),
    |sources|×50 frequency grid, |sources|² pair matrix. The fact
    table is scanned ONCE: the corpus contracts to a cached
    (source, word) count table in a single tokenize pass, and the
    global frequencies, per-source totals, and panel counts are all
    derived from that contraction (at 100 TB the alternative — three
    consumers each re-expanding the tokenize — is three full corpus
    scans for one answer).
    """
    sw = (
        expand_parallelism(Catalog(spark, sf_dir).documents)
        .select("source", F.explode(tokens_col()).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .localCheckpoint(eager=False)  # materialize the contraction once
    )
    freq = sw.groupBy("w").agg(F.sum("cw").alias("c"))
    # distributed top-k over the unbounded vocabulary
    panel = (
        freq.orderBy(F.desc("c"), F.asc("w"))
        .limit(_DELTA_TOP_WORDS)
        .select("w")
    )
    src_tot = sw.groupBy("source").agg(F.sum("cw").alias("n"))
    counts = sw.join(F.broadcast(panel), "w").select("source", "w", "cw")
    # full source × panel grid: a panel word a source never uses is
    # STILL stylometric signal (f = 0), not a missing row
    grid = src_tot.select("source", "n").crossJoin(F.broadcast(panel))
    cell = (
        grid.join(counts, ["source", "w"], "left")
        .select(
            "source",
            "w",
            F.round(
                F.coalesce("cw", F.lit(0)) / F.col("n"), 8
            ).alias("f"),
        )
    )
    stats = cell.groupBy("w").agg(
        F.avg("f").alias("mu"), F.stddev_samp("f").alias("sd")
    )
    z = (
        cell.join(F.broadcast(stats), "w")
        .select(
            "source", "w",
            F.round((F.col("f") - F.col("mu")) / F.col("sd"), 6).alias("z"),
        )
        # bounded |sources|x50 panel, consumed twice by the pair
        # self-join below: checkpoint so the grid/stats tier runs once
        .localCheckpoint(eager=False)
    )
    a, b = z.alias("a"), z.alias("b")
    delta = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.avg(F.abs(F.col("a.z") - F.col("b.z"))), 6).alias("_d"),
        )
    )
    # distributed top-k, rank re-derived on the k survivors
    wtop = [F.asc("_d"), F.asc("src_a"), F.asc("src_b")]
    return (
        delta.orderBy(*wtop)
        .limit(_DELTA_TOP_PAIRS)
        .withColumn("rank", F.row_number().over(Window.orderBy(*wtop)))
        .select("rank", "src_a", "src_b", "n_words", _R4(F.col("_d"), "delta"))
    )


TEXT_BURROWS_SQL = rf"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS w
  FROM documents
), freq AS (
  SELECT w, count(*) AS c FROM toks GROUP BY w
), panel AS (
  SELECT w FROM (
    SELECT w, row_number() OVER (ORDER BY c DESC, w ASC) AS rk FROM freq
  ) WHERE rk <= {_DELTA_TOP_WORDS}
), src_tot AS (
  SELECT source, count(*) AS n FROM toks GROUP BY source
), counts AS (
  SELECT t.source, t.w, count(*) AS cw
  FROM toks t JOIN panel p ON p.w = t.w
  GROUP BY t.source, t.w
), cell AS (
  SELECT st.source, p.w,
         round(coalesce(c.cw, 0) / CAST(st.n AS DOUBLE), 8) AS f
  FROM src_tot st CROSS JOIN panel p
  LEFT JOIN counts c ON c.source = st.source AND c.w = p.w
), stats AS (
  SELECT w, avg(f) AS mu, stddev_samp(f) AS sd FROM cell GROUP BY w
), z AS (
  SELECT c.source, c.w, round((c.f - s.mu) / s.sd, 6) AS z
  FROM cell c JOIN stats s USING (w)
), delta AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_words,
         round(avg(abs(a.z - b.z)), 6) AS d
  FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2
)
SELECT CAST(row_number() OVER (ORDER BY d ASC, src_a ASC, src_b ASC)
            AS INTEGER) AS rank,
       src_a, src_b, n_words, round(d, 4) AS delta
FROM delta
ORDER BY rank LIMIT {_DELTA_TOP_PAIRS}
"""

QUERIES["text_burrows_delta"] = (text_burrows_delta, TEXT_BURROWS_SQL)


def text_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ for the langid classifier vs ground truth —
    agreement corrected for chance (accuracy flatters a classifier
    on skewed label mixes; κ doesn't). One number + the raw
    accuracy next to it, computed from the same single-scan
    prediction plan as the confusion matrix — scored over the
    8-language ``text_langid_trigram`` classifier since round 11.
    """
    pred = text_langid_trigram(spark, sf_dir).select("lang", "pred_lang")
    cell = pred.groupBy("lang", "pred_lang").agg(F.count(F.lit(1)).alias("n"))
    rows_m = cell.groupBy(F.col("lang").alias("k")).agg(
        F.sum("n").alias("row_m")
    )
    cols_m = cell.groupBy(F.col("pred_lang").alias("k")).agg(
        F.sum("n").alias("col_m")
    )
    # p_e sums row×col over ALL classes, including ones with an
    # empty diagonal cell — a full outer join on the class label
    marg = rows_m.join(cols_m, "k", "full").select(
        F.coalesce("row_m", F.lit(0)).alias("row_m"),
        F.coalesce("col_m", F.lit(0)).alias("col_m"),
    )
    t_po = cell.agg(
        F.sum("n").alias("t"),
        F.sum(
            F.when(F.col("lang") == F.col("pred_lang"), F.col("n"))
        ).alias("diag"),
    )
    agg = marg.crossJoin(F.broadcast(t_po)).agg(
        F.max("t").alias("n_docs"),
        (F.max("diag") / F.max("t")).alias("po"),
        (
            F.sum(F.col("row_m") * F.col("col_m"))
            / (F.max("t") * F.max("t"))
        ).alias("pe"),
    )
    return agg.select(
        "n_docs",
        _R4(F.col("po"), "accuracy"),
        _R4(F.col("pe"), "chance_agreement"),
        _R4(
            (F.col("po") - F.col("pe")) / (1 - F.col("pe")), "cohen_kappa"
        ),
    )


TEXT_COHEN_KAPPA_SQL = f"""
WITH pred AS ({{TRIGRAM_SQL}}),
cell AS (
  SELECT lang, pred_lang, count(*) AS n FROM pred GROUP BY 1, 2
), rows_m AS (
  SELECT lang AS k, sum(n) AS row_m FROM cell GROUP BY lang
), cols_m AS (
  SELECT pred_lang AS k, sum(n) AS col_m FROM cell GROUP BY pred_lang
), marg AS (
  SELECT coalesce(r.row_m, 0) AS row_m, coalesce(c.col_m, 0) AS col_m
  FROM rows_m r FULL OUTER JOIN cols_m c USING (k)
), t_po AS (
  SELECT sum(n) AS t,
         sum(CASE WHEN lang = pred_lang THEN n END) AS diag
  FROM cell
), agg AS (
  SELECT max(t) AS n_docs,
         max(diag) / CAST(max(t) AS DOUBLE) AS po,
         sum(row_m * col_m) / (CAST(max(t) AS DOUBLE) * max(t)) AS pe
  FROM marg CROSS JOIN t_po
)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       round(po, 4) AS accuracy,
       round(pe, 4) AS chance_agreement,
       round((po - pe) / (1 - pe), 4) AS cohen_kappa
FROM agg
"""

QUERIES["text_cohen_kappa"] = (text_cohen_kappa, TEXT_COHEN_KAPPA_SQL)


def text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K per source — the classical
    vocabulary-richness statistic (Yule 1944), 10⁴·(S₂−S₁)/S₁² over
    the word-frequency spectrum (S₁ = tokens, S₂ = Σ f²):
    size-robust where a raw type/token ratio is not, high K =
    repetitive vocabulary (template/boilerplate sources), low K =
    diverse text. Complements ``text_zipf_fit`` (shape of the
    frequency law) and ``corpus_heaps_law`` (vocab growth) with the
    per-source repetitiveness scalar.

    One tokenize pass contracts to (source, word) counts — the same
    contraction shape as the Burrows-Delta panel — then two bounded
    per-source aggregates. Linear, one shuffle on the uniform
    (source, word) key.
    """
    sw = (
        expand_parallelism(Catalog(spark, sf_dir).documents)
        .select("source", F.explode(tokens_col()).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    return (
        sw.groupBy("source")
        .agg(
            F.sum("f").alias("s1"),
            F.sum(F.col("f") * F.col("f")).alias("s2"),
            F.count(F.lit(1)).alias("n_types"),
        )
        .select(
            "source",
            F.col("s1").alias("n_tokens"),
            "n_types",
            _R4(
                1e4 * (F.col("s2") - F.col("s1")) / (F.col("s1") * F.col("s1")),
                "yule_k",
            ),
        )
        .orderBy("source")
    )


TEXT_YULE_SQL = r"""
WITH sw AS (
  SELECT source, w, count(*) AS f
  FROM (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents)
  GROUP BY 1, 2
)
SELECT source,
       CAST(sum(f) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       round(1e4 * (sum(f * f) - sum(f))
             / (CAST(sum(f) AS DOUBLE) * sum(f)), 4) AS yule_k
FROM sw GROUP BY source ORDER BY source
"""

QUERIES["text_yule_k"] = (text_yule_k, TEXT_YULE_SQL)


_BURSTY_TOP = 25
_BURSTY_MIN_DF = 5


def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Church & Gale 1995): per word, mean
    occurrences PER DOCUMENT THAT CONTAINS IT (cf/df) — near 1 for
    function-like words spread thinly everywhere, high for topical
    words that "burst" within the few documents they appear in. The
    top-25 burstiest terms (df ≥ 5) are the topical-vocabulary card
    that separates content terms from connective tissue — the
    statistic behind better-than-TF term weighting and stopword
    induction.

    One tokenize pass contracts to (word, doc) counts, then one
    word-level aggregate (cf = Σ, df = count) and a bounded top-k.
    Linear; the contraction key is uniform.
    """
    wd = (
        expand_parallelism(Catalog(spark, sf_dir).documents)
        .select("doc_id", F.explode(tokens_col()).alias("w"))
        .groupBy("w", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = wd.groupBy("w").agg(
        F.sum("c").alias("cf"), F.count(F.lit(1)).alias("df")
    )
    # distributed top-k, rank re-derived on the k survivors
    wtop = [F.desc(F.col("cf") / F.col("df")), F.asc("w")]
    return (
        stats.filter(F.col("df") >= _BURSTY_MIN_DF)
        .orderBy(*wtop)
        .limit(_BURSTY_TOP)
        .withColumn("rank", F.row_number().over(Window.orderBy(*wtop)))
        .select(
            "rank", "w", "cf", "df",
            _R4(F.col("cf") / F.col("df"), "burstiness"),
        )
    )


TEXT_BURSTINESS_SQL = rf"""
WITH wd AS (
  SELECT w, doc_id, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents)
  GROUP BY 1, 2
), stats AS (
  SELECT w, CAST(sum(c) AS BIGINT) AS cf, CAST(count(*) AS BIGINT) AS df
  FROM wd GROUP BY w
)
SELECT CAST(row_number() OVER (ORDER BY cf / CAST(df AS DOUBLE) DESC, w ASC)
            AS INTEGER) AS rank,
       w, cf, df,
       round(cf / CAST(df AS DOUBLE), 4) AS burstiness
FROM stats
WHERE df >= {_BURSTY_MIN_DF}
ORDER BY rank LIMIT {_BURSTY_TOP}
"""

QUERIES["text_term_burstiness"] = (text_term_burstiness, TEXT_BURSTINESS_SQL)


def text_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stopword fingerprint: the share of tokens hitting
    each language's stopword list — a 4-number language-mix signature
    per source that cross-checks ``text_langid`` (a source claiming
    'en' with a high Spanish-stopword share is mislabeled or mixed).

    One token explode + membership against 4 tiny literal arrays
    (codegen), one bounded source rollup.
    """
    docs = Catalog(spark, sf_dir).documents.select(
        "source", F.explode(tokens_col()).alias("w")
    )
    lists = {
        "en": STOPWORDS_EN,
        "es": STOPWORDS_ES,
        "fr": STOPWORDS_FR,
        "de": STOPWORDS_DE,
    }
    aggs = [F.count(F.lit(1)).alias("n_tokens")]
    for lang, words in lists.items():
        hit = F.col("w").isin(*words).cast("double")
        aggs.append(_R4(F.avg(hit), f"stop_share_{lang}"))
    return docs.groupBy("source").agg(*aggs)


def _stopword_profile_sql() -> str:
    lists = {
        "en": STOPWORDS_EN,
        "es": STOPWORDS_ES,
        "fr": STOPWORDS_FR,
        "de": STOPWORDS_DE,
    }
    shares = ", ".join(
        "round(avg(CASE WHEN w IN ({vals}) THEN 1.0 ELSE 0.0 END), 4)"
        " AS stop_share_{lang}".format(
            vals=", ".join(f"'{w}'" for w in words), lang=lang
        )
        for lang, words in lists.items()
    )
    return rf"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS w
  FROM documents
)
SELECT source, count(*) AS n_tokens, {shares}
FROM toks GROUP BY source
"""


QUERIES["text_stopword_profile"] = (
    text_stopword_profile,
    _stopword_profile_sql(),
)


def text_word_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-length distribution per language: mean/p90 characters
    per token and the long-word (≥8 chars) share — the
    morphology-sensitive signal that separates compounding languages
    from analytic ones, and (in a training corpus) flags sources
    whose 'words' are actually URLs or hashes.

    One explode, one bounded language rollup; p90 is the exact
    interpolated percentile (``percentile`` ≡ ``quantile_cont``).
    """
    docs = Catalog(spark, sf_dir).documents.select(
        "lang", F.explode(tokens_col()).alias("w")
    ).select("lang", F.length("w").alias("wl"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        _R4(F.avg("wl"), "mean_len"),
        _R4(F.percentile("wl", F.lit(0.9)), "p90_len"),
        _R4(F.avg((F.col("wl") >= 8).cast("double")), "long_word_share"),
    )


TEXT_WORD_LENGTH_SQL = r"""
WITH toks AS (
  SELECT lang, length(unnest(string_split_regex(trim(text), '\s+'))) AS wl
  FROM documents
)
SELECT lang, count(*) AS n_tokens,
       round(avg(wl), 4) AS mean_len,
       round(quantile_cont(wl, 0.9), 4) AS p90_len,
       round(avg(CASE WHEN wl >= 8 THEN 1.0 ELSE 0.0 END), 4)
         AS long_word_share
FROM toks GROUP BY lang
"""

QUERIES["text_word_length_profile"] = (
    text_word_length_profile,
    TEXT_WORD_LENGTH_SQL,
)


def text_hapax_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena profile per source: the share of vocabulary
    types seen exactly once and the token mass they carry — the
    lexical-freshness signal (natural prose runs ~40-60% hapax
    types; templated or machine-generated text collapses toward
    zero; OCR noise inflates it past 70%). Complements
    ``corpus_heaps_law``'s growth curve with a per-source snapshot.

    One (source, word) contraction, one bounded source rollup.
    """
    counts = (
        Catalog(spark, sf_dir).documents.select(
            "source", F.explode(tokens_col()).alias("w")
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hapax = (F.col("c") == 1).cast("long")
    return counts.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("c").alias("n_tokens"),
        F.sum(hapax).alias("n_hapax"),
        _R4(F.avg(hapax.cast("double")), "hapax_type_share"),
        _R4(F.sum(hapax) / F.sum("c"), "hapax_token_share"),
    )


TEXT_HAPAX_SQL = r"""
WITH counts AS (
  SELECT source, w, count(*) AS c FROM (
    SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS w
    FROM documents
  ) GROUP BY 1, 2
)
SELECT source, count(*) AS n_types,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(avg(CASE WHEN c = 1 THEN 1.0 ELSE 0.0 END), 4)
         AS hapax_type_share,
       round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
             / CAST(sum(c) AS DOUBLE), 4) AS hapax_token_share
FROM counts GROUP BY source
"""

QUERIES["text_hapax_profile"] = (text_hapax_profile, TEXT_HAPAX_SQL)


def text_digit_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-token density per source: the share of tokens that
    are pure digits, contain any digit, or are alphanumeric mixes —
    the cheap table/boilerplate/serial-number detector every text
    filter stack runs before spending model-based quality scores
    (prose sits near zero; scraped tables and logs light up).

    One explode + three codegen regex predicates, bounded source
    rollup.
    """
    toks = Catalog(spark, sf_dir).documents.select(
        "source", F.explode(tokens_col()).alias("w")
    )
    pure = F.col("w").rlike(r"^\d+$").cast("double")
    any_d = F.col("w").rlike(r"\d").cast("double")
    mixed = (
        F.col("w").rlike(r"\d") & F.col("w").rlike(r"[A-Za-z]")
    ).cast("double")
    return toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        _R4(F.avg(pure), "pure_digit_share"),
        _R4(F.avg(any_d), "any_digit_share"),
        _R4(F.avg(mixed), "alnum_mix_share"),
    )


TEXT_DIGIT_DENSITY_SQL = r"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS w
  FROM documents
)
SELECT source, count(*) AS n_tokens,
       round(avg(CASE WHEN regexp_matches(w, '^\d+$') THEN 1.0 ELSE 0.0 END), 4)
         AS pure_digit_share,
       round(avg(CASE WHEN regexp_matches(w, '\d') THEN 1.0 ELSE 0.0 END), 4)
         AS any_digit_share,
       round(avg(CASE WHEN regexp_matches(w, '\d')
                       AND regexp_matches(w, '[A-Za-z]')
                      THEN 1.0 ELSE 0.0 END), 4) AS alnum_mix_share
FROM toks GROUP BY source
"""

QUERIES["text_digit_density"] = (text_digit_density, TEXT_DIGIT_DENSITY_SQL)


# ---------------------------------------------------------------------------
# Char-n-gram language ID (round 11: widens the 4-lang stopword
# heuristic to 8 languages)
# ---------------------------------------------------------------------------

# Distinctive character n-grams per language — tiny public-knowledge
# frequency-list constants (space-padded trigrams for Latin scripts,
# single high-frequency hanzi for zh). Deliberately small so the
# profiles stay exactly portable to the oracle; tie precedence is the
# tuple order below.
LANGID_PROFILES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", (" th", "the", "he ", "ing", "nd ")),
    ("es", (" de", "de ", " la", "os ", "ión")),
    ("fr", (" le", "le ", " et", "ent", "aux")),
    ("de", ("der", "ein", "ich", "sch", "und")),
    ("it", ("zio", " di", "di ", "che", " il")),
    ("pt", (" da", "ão ", "os ", " de", "em ")),
    ("nl", ("een", "het", "van", " en", "ij ")),
    ("zh", ("的", "是", "了", "在", "不")),
)


def _profile_score(pats: tuple[str, ...]) -> Column:
    """Occurrences of every profile n-gram in lower(text), summed:
    per pattern, (len − len(after removal)) / len(pattern) — exact
    integer counting with identical semantics in both engines."""
    lower = F.lower(F.col("text"))
    total = None
    for p in pats:
        cnt = (F.length(lower) - F.length(F.replace(lower, F.lit(p), F.lit("")))) / len(p)
        total = cnt if total is None else total + cnt
    return total.cast("long")


def _sql_profile_score(pats: tuple[str, ...]) -> str:
    return " + ".join(
        f"CAST((length(lower(text)) - length(replace(lower(text), '{p}', ''))) / {len(p)} AS BIGINT)"
        for p in pats
    )


def text_langid_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-n-gram-profile language ID over 8 languages — the wider
    second pass behind ``text_langid``'s 4-lang stopword first pass
    (the standard trigram-profile method, Cavnar & Trenkle 1994,
    collapsed to fixed distinctive-n-gram counting so it stays a
    deterministic same-expression-both-sides oracle). Argmax score
    with fixed tie precedence; 'und' when no profile fires.

    One codegen projection per doc (40 replace/length pairs), zero
    shuffles — the shape that runs as a cheap map at 100 TB.
    """
    docs = Catalog(spark, sf_dir).documents
    scores = {lang: _profile_score(p) for lang, p in LANGID_PROFILES}
    best = F.greatest(*scores.values())
    pred = F.when(best == F.lit(0), "und")
    for lang, _ in LANGID_PROFILES:
        pred = pred.when(scores[lang] == best, lang)
    return docs.select(
        "doc_id",
        "lang",
        *[scores[lang].alias(f"s_{lang}") for lang, _ in LANGID_PROFILES],
        pred.otherwise("und").alias("pred_lang"),
    )


def _langid_trigram_sql() -> str:
    score_cols = ",\n       ".join(
        f"{_sql_profile_score(p)} AS s_{lang}" for lang, p in LANGID_PROFILES
    )
    all_s = ", ".join(f"s_{lang}" for lang, _ in LANGID_PROFILES)
    cases = "\n            ".join(
        f"WHEN s_{lang} = greatest({all_s}) THEN '{lang}'"
        for lang, _ in LANGID_PROFILES
    )
    return f"""
WITH scored AS (
  SELECT doc_id, lang,
       {score_cols}
  FROM documents
)
SELECT doc_id, lang, {all_s},
       CASE WHEN greatest({all_s}) = 0 THEN 'und'
            {cases}
            ELSE 'und' END AS pred_lang
FROM scored
"""


TEXT_LANGID_TRIGRAM_SQL = _langid_trigram_sql()

QUERIES["text_langid_trigram"] = (text_langid_trigram, TEXT_LANGID_TRIGRAM_SQL)


# The confusion/κ eval loop scores the trigram classifier (defined
# above their textual position): substitute its SQL into their
# oracle CTEs and re-register the final strings.
TEXT_LANGID_CONFUSION_SQL = TEXT_LANGID_CONFUSION_SQL.format(
    TRIGRAM_SQL=TEXT_LANGID_TRIGRAM_SQL
)
TEXT_COHEN_KAPPA_SQL = TEXT_COHEN_KAPPA_SQL.format(
    TRIGRAM_SQL=TEXT_LANGID_TRIGRAM_SQL
)
QUERIES["text_langid_confusion"] = (
    text_langid_confusion,
    TEXT_LANGID_CONFUSION_SQL,
)
QUERIES["text_cohen_kappa"] = (text_cohen_kappa, TEXT_COHEN_KAPPA_SQL)


# code-vs-prose routing thresholds (symbol-density heuristic)
_CODE_KEYWORDS = (
    "def", "return", "import", "class", "function", "var", "const",
    "if", "else", "for", "while", "void", "int", "public", "static",
)


def text_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing screen — the cheap first-pass router a
    mixed crawl needs before tokenizer/quality stages diverge (code
    and prose get different pipelines): symbol-density features
    (brace/semicolon/operator rate, camelCase and snake_case token
    rates, keyword hits) fold into a fixed linear score; census per
    source with the routed share and mean feature profile.

    All features are regexp counts over the raw text — pure codegen,
    shuffle-free until the bounded per-source rollup. Score and
    shares use the integer-path 4-dp readout.
    """
    docs = Catalog(spark, sf_dir).documents
    n_chars = F.length("text")
    toks = tokens_col()
    n_toks = F.size(toks)

    def rate(pattern: str) -> Column:
        return (
            n_chars - F.length(F.regexp_replace("text", pattern, ""))
        ).cast("double") / n_chars

    sym = rate(r"[{}();=<>\[\]]")
    camel = F.size(
        F.filter(toks, lambda t: t.rlike("^[a-z]+[A-Z][A-Za-z]*$"))
    ).cast("double") / n_toks
    snake = F.size(
        F.filter(toks, lambda t: t.rlike("^[a-z0-9]+_[a-z0-9_]+$"))
    ).cast("double") / n_toks
    kw_arr = F.array(*[F.lit(k) for k in _CODE_KEYWORDS])
    kw = F.size(F.filter(toks, lambda t: F.array_contains(kw_arr, t))).cast(
        "double"
    ) / n_toks
    score = sym * 4.0 + camel * 2.0 + snake * 2.0 + kw * 1.0
    feat = docs.filter((n_chars > 0) & (n_toks > 0)).select(
        "source",
        score.alias("score"),
        sym.alias("sym"),
        camel.alias("camel"),
        snake.alias("snake"),
        kw.alias("kw"),
    )
    r4 = lambda c: F.round(c * 10000.0) / 10000.0  # noqa: E731
    return (
        feat.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("score") >= 0.05, 1).otherwise(0)).alias(
                "n_routed_code"
            ),
            r4(
                F.avg(F.when(F.col("score") >= 0.05, 1.0).otherwise(0.0))
            ).alias("code_share"),
            r4(F.avg("score")).alias("mean_score"),
            r4(F.avg("sym")).alias("mean_symbol_rate"),
            r4(F.avg("camel")).alias("mean_camel_rate"),
            r4(F.avg("snake")).alias("mean_snake_rate"),
            r4(F.avg("kw")).alias("mean_keyword_rate"),
        )
        .orderBy("source")
    )


_KW_SQL = ", ".join(f"'{k}'" for k in _CODE_KEYWORDS)

TEXT_CODE_DETECTION_SQL = rf"""
WITH feat AS (
  SELECT source,
         CAST(length(text) - length(regexp_replace(text, '[{{}}();=<>\[\]]', '', 'g')) AS DOUBLE)
           / length(text) AS sym,
         CAST(len(list_filter(toks, t -> regexp_matches(t, '^[a-z]+[A-Z][A-Za-z]*$'))) AS DOUBLE)
           / len(toks) AS camel,
         CAST(len(list_filter(toks, t -> regexp_matches(t, '^[a-z0-9]+_[a-z0-9_]+$'))) AS DOUBLE)
           / len(toks) AS snake,
         CAST(len(list_filter(toks, t -> list_contains([{_KW_SQL}], t))) AS DOUBLE)
           / len(toks) AS kw
  FROM (
    SELECT source, text, string_split_regex(trim(text), '\s+') AS toks
    FROM documents WHERE length(text) > 0
  ) WHERE len(toks) > 0
), scored AS (
  SELECT source, sym, camel, snake, kw,
         sym * 4.0 + camel * 2.0 + snake * 2.0 + kw * 1.0 AS score
  FROM feat
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN score >= 0.05 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_routed_code,
       round(avg(CASE WHEN score >= 0.05 THEN 1.0 ELSE 0.0 END) * 10000.0)
         / 10000.0 AS code_share,
       round(avg(score) * 10000.0) / 10000.0 AS mean_score,
       round(avg(sym) * 10000.0) / 10000.0 AS mean_symbol_rate,
       round(avg(camel) * 10000.0) / 10000.0 AS mean_camel_rate,
       round(avg(snake) * 10000.0) / 10000.0 AS mean_snake_rate,
       round(avg(kw) * 10000.0) / 10000.0 AS mean_keyword_rate
FROM scored GROUP BY source ORDER BY source
"""

QUERIES["text_code_detection"] = (text_code_detection, TEXT_CODE_DETECTION_SQL)


# ---------------------------------------------------------------------------
# BM25 lexical retrieval (Okapi / Lucene form)
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_QUERY_STRIDE = 50  # every 50th doc acts as the query
_BM25_QUERY_TERMS = 8  # rarest distinct tokens per query doc
_BM25_TOP_K = 10
# Hard ceiling on the query workload: only strided doc_ids BELOW
# stride*cap qualify, so |Q| <= 4096 no matter the corpus size and
# the broadcast query map is constant-bounded (a real serving
# workload is a bounded query log, not a corpus-linear sample).
# A pure local filter — no rank window, no shuffle. Test SFs have
# max doc_id < 204800, so the cap only binds at sf1+.
_BM25_MAX_QUERIES = 4096


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical top-10 retrieval — the standard sparse scorer
    beside the dense ANN family (hybrid retrieval prep runs BOTH
    over the same corpus): every 50th document (capped at the first
    ``_BM25_MAX_QUERIES`` strided ids, so the query workload — and
    its broadcast — is constant-bounded at any corpus size)
    contributes a query —
    its 8 RAREST distinct tokens by corpus df (df-asc, term-asc
    tiebreak: deterministic in both engines, and the discriminative
    terms a real query matches on), requiring df ≥ 2 (a df=1 term
    occurs only in the query doc itself, and self-matches are
    excluded). No df ceiling: idf itself downweights saturated
    terms, and this synthetic corpus's 31-word unigram vocabulary
    (every word in most docs) means any absolute or relative cap
    empties the query set — the SCALE control is the rarest-8
    selection, which on a Zipfian real corpus picks short posting
    lists (per-query join cost = Σ df over 8 terms), plus the fact
    that a production query workload is a bounded set, not a
    corpus-stride sample. Candidates score by the Lucene-form
    Okapi BM25

        Σ_t ln(1 + (N − df + 0.5)/(df + 0.5)) ·
            tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen))

    with k1=1.2, b=0.75; idf/N/avglen use EXACT corpus stats.

    Scale: postings + doc lengths are two map-side-combined
    aggregates on uniform keys; the score join is query-term ×
    capped-posting-list (≤ |Q|·8·64 rows); avglen/N are 1-row
    broadcasts; final per-query top-k is a bounded window over the
    candidate set.
    """
    docs = expand_parallelism(Catalog(spark, sf_dir).documents)
    terms = docs.select("doc_id", F.explode(tokens_col()).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_len = tf.groupBy("doc_id").agg(F.sum("tf").alias("dlen"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = doc_len.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dlen").alias("avglen")
    )
    qcand = (
        docs.filter(
            (F.col("doc_id") % _BM25_QUERY_STRIDE == 0)
            & (F.col("doc_id") < _BM25_QUERY_STRIDE * _BM25_MAX_QUERIES)
        )
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.array_distinct(tokens_col())).alias("term"),
        )
        .join(df_.filter(F.col("df") >= 2), "term")
    )
    wq = Window.partitionBy("q_id").orderBy(F.asc("df"), F.asc("term"))
    qterms = (
        qcand.withColumn("_qr", F.row_number().over(wq))
        .filter(F.col("_qr") <= _BM25_QUERY_TERMS)
        .select("q_id", "term", "df")  # df carried: no vocab re-join
    )
    idf = F.log(
        1.0
        + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (
        F.col("tf")
        * (_BM25_K1 + 1.0)
        / (
            F.col("tf")
            + _BM25_K1
            * (1.0 - _BM25_B + _BM25_B * F.col("dlen") / F.col("avglen"))
        )
    )
    # The query-term set is the BOUNDED side (≤ _BM25_MAX_QUERIES·8
    # rows by the hard cap above, corpus-size-independent); broadcast
    # it explicitly. Left to stats, Spark broadcast the POSTINGS
    # table here — fine
    # at toy scale, but the middle regime (postings fit in memory
    # but are millions of rows) builds a giant single-threaded hash
    # relation, measured 11× slower than streaming postings against
    # the 8k-row query map at the sf1 candidate mass.
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .filter(F.col("doc_id") != F.col("q_id"))
        .join(doc_len, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("q_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("matched_terms"),
            F.round(F.sum(idf * tf_part), 6).alias("_s"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("_s"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _BM25_TOP_K)
        .select(
            "q_id",
            F.col("doc_id").alias("cand_id"),
            "matched_terms",
            (F.round(F.col("_s") * 10000.0) / 10000.0).alias("bm25"),
            "rank",
        )
    )


TEXT_BM25_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), terms AS (
  SELECT doc_id, unnest(t) AS term FROM toks
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2
), doc_len AS (
  SELECT doc_id, sum(tf) AS dlen FROM tf GROUP BY 1
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), stats AS (
  SELECT count(*) AS n, avg(dlen) AS avglen FROM doc_len
), qcand AS (
  SELECT q.q_id, q.term, df.df
  FROM (SELECT doc_id AS q_id, unnest(list_distinct(t)) AS term
        FROM toks WHERE doc_id % {_BM25_QUERY_STRIDE} = 0
          AND doc_id < {_BM25_QUERY_STRIDE * _BM25_MAX_QUERIES}) q
  JOIN df ON df.term = q.term AND df.df >= 2
), qterms AS (
  SELECT q_id, term
  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY df ASC, term ASC) AS _qr
        FROM qcand)
  WHERE _qr <= {_BM25_QUERY_TERMS}
), scored AS (
  SELECT q.q_id, tf.doc_id,
         count(*) AS matched_terms,
         round(sum(
           ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({_BM25_K1} + 1.0)
             / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                + {_BM25_B} * dl.dlen / s.avglen))
         ), 6) AS _s
  FROM qterms q
  JOIN df ON df.term = q.term
  JOIN tf ON tf.term = q.term
  JOIN doc_len dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  WHERE tf.doc_id <> q.q_id
  GROUP BY 1, 2
)
SELECT q_id, doc_id AS cand_id, CAST(matched_terms AS BIGINT) AS matched_terms,
       round(_s * 10000.0) / 10000.0 AS bm25, rank
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
                                    ORDER BY _s DESC, doc_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= {_BM25_TOP_K}
"""

QUERIES["text_bm25_topk"] = (text_bm25_topk, TEXT_BM25_SQL)
