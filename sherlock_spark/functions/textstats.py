"""Text analysis: token counting, quality scoring, language ID,
fingerprinting — all JVM-side column expressions (no Python in the hot
path); each has a closed-form SQL oracle where exactness is possible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sherlock_spark.functions.spread import spread

# tiny per-language stopword sets for the n-gram/stopword language
# heuristic (public common function words)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "dans", "pour"],
    "es": ["el", "la", "los", "las", "es", "una", "con", "por", "para", "que"],
    "it": ["il", "la", "che", "di", "non", "una", "per", "con", "sono", "della"],
}

EN_STOPWORDS = LANG_STOPWORDS["en"]

# BPE-ish token regex: word runs or single non-word non-space chars
TOKEN_REGEX = r"\w+|[^\w\s]"


def token_count(text: Column) -> Column:
    """Whitespace-agnostic token count over TOKEN_REGEX. Pattern passed
    as a literal column — embedding it in an F.expr SQL string would
    need double backslash escaping.
    """
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0)))


def with_text_stats(documents: DataFrame) -> DataFrame:
    """Per-document quality features: word/char/token counts, average
    word length, punctuation ratio, stopword ratio, distinct-word ratio.
    """
    words = F.split("text", " ")
    stop_array = F.array(*[F.lit(word) for word in EN_STOPWORDS])
    return spread(documents).select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(words).alias("n_words"),
        token_count(F.col("text")).alias("n_tokens"),
        F.round(
            F.aggregate(
                words, F.lit(0).cast("double"), lambda acc, w: acc + F.length(w)
            )
            / F.size(words),
            4,
        ).alias("avg_word_len"),
        F.round(
            F.size(F.filter(words, lambda w: F.arrays_overlap(stop_array, F.array(F.lower(w)))))
            / F.size(words),
            4,
        ).alias("stopword_ratio"),
        F.round(
            F.size(F.array_distinct(words)) / F.size(words), 4
        ).alias("distinct_ratio"),
    )


def quality_score(stats: DataFrame) -> DataFrame:
    """Scalar quality score in [0,1]: rewards mid-length documents, a
    plausible stopword share and lexical diversity (the usual pretraining
    heuristics, composed from the feature columns).
    """
    length_term = F.least(F.col("n_words") / F.lit(100.0), F.lit(1.0))
    diversity_term = F.col("distinct_ratio")
    stop_term = F.lit(1.0) - F.abs(F.col("stopword_ratio") - F.lit(0.3))
    return stats.withColumn(
        "quality",
        F.round((length_term + diversity_term + stop_term) / 3.0, 4),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Stopword-vote language ID: the language whose stopword set hits
    the document's word set most wins; ties break lexicographically;
    zero hits -> 'und' (undetermined).
    """
    words = F.array_distinct(F.split(F.lower(F.col("text")), " "))
    scores = [
        F.struct(
            F.size(
                F.array_intersect(
                    words, F.array(*[F.lit(w) for w in stopwords])
                )
            ).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, stopwords in sorted(LANG_STOPWORDS.items())
    ]
    # max by (hits, reversed-lang) = first lexicographic lang on ties:
    # array_max picks max struct lexicographically (hits then lang), so
    # to prefer the *smallest* lang on equal hits we sort desc by lang
    # and rely on array_max keeping the max lang — instead do it simply:
    best = F.aggregate(
        F.array(*scores),
        F.struct(F.lit(-1).alias("hits"), F.lit("und").alias("lang")),
        lambda acc, s: F.when(s["hits"] > acc["hits"], s).otherwise(acc),
    )
    return spread(documents).select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "pred_lang"
        ),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct word set — cheap exact-dedup key robust to word order.
    """
    return spread(documents).select(
        "doc_id",
        F.md5(
            F.concat_ws(
                " ", F.array_sort(F.array_distinct(F.split("text", " ")))
            )
        ).alias("fingerprint"),
    )


def tfidf_top_terms(documents: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms: (doc_id, term, score, rank).

    tf = raw in-document count, idf = ln(N / df) with df = number of
    documents containing the term; score = tf * idf rounded to 6
    decimals BEFORE ranking so the DuckDB oracle ranks the identical
    key (rank order on the raw double could differ across engines in
    the last ulp of ln()); residual ties break on the term string.
    The usual keyword-extraction primitive a pretraining pipeline runs
    for topic bucketing / quality filters.

    Scale shape: explode -> two hash aggregations (doc-term counts,
    then document frequency — both map-side combinable), one join on
    term (df table is corpus-vocabulary-sized; broadcast when small,
    shuffle join otherwise — left to AQE), corpus size N as a
    single-row broadcast cross join, and a PER-DOCUMENT window for the
    top-k (partitioned by doc_id — never a global sort).
    """
    from pyspark.sql import Window

    words = spread(documents).select(
        "doc_id",
        F.explode(F.split(F.lower("text"), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = documents.agg(
        F.count("*").cast("double").alias("n_docs")
    )
    scored = (
        tf.join(df_tbl, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    window = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "score", F.col("rank").cast("long").alias("rank"))
    )


# -- deterministic stratified sampling ------------------------------------


def stratified_sample(
    documents: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    stratum_col: str = "lang",
    salt: str = "mix-v1",
) -> DataFrame:
    """Hash-deterministic stratified sampling — the domain-mixing
    primitive of a pretraining data recipe ("keep 50% of en, 20% of de,
    ..."). A document is kept iff the first 8 hex chars of
    ``md5(salt || ':' || doc_id)`` sort below the stratum's threshold.

    Deterministic and engine-portable by construction (md5 of the same
    string, lexicographic hex compare — no RNG, no float rounding), so
    re-runs, retries, and incremental appends sample the SAME rows:
    the property that makes a 100-TB sampling job resumable. Pure
    map-side — one projection + filter, no shuffle; the rate CASE is a
    broadcast-free literal expression.
    """

    def threshold(rate: float) -> str:
        n = min(max(int(rate * 16**8), 0), 16**8)
        # rate >= 1.0 must exceed every 8-hex bucket; format(16**8) is
        # the 9-char "100000000", which sorts BELOW "1aaaaaaa" under the
        # lexicographic compare and would silently drop ~15/16 of rows.
        return "g" if n == 16**8 else format(n, "08x")

    bucket = F.substring(
        F.md5(
            F.concat(
                F.lit(salt + ":"), F.col("doc_id").cast("string")
            )
        ),
        1,
        8,
    )
    expr = F.lit(threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        expr = F.when(
            F.col(stratum_col) == stratum, F.lit(threshold(rate))
        ).otherwise(expr)
    return documents.filter(bucket < expr)


# -- PII redaction ---------------------------------------------------------

# portable (Java regex + RE2) patterns: no backrefs, no lookaround
EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PHONE_REGEX = r"\+?[0-9]{1,2}[- ][0-9]{3}[- .][0-9]{3}[- .][0-9]{4}"


def redact_pii(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Replace email addresses and phone-number shapes with typed
    placeholder tokens, reporting per-document match counts.

    Both patterns avoid Java-only regex features (backreferences,
    lookaround) so the same strings compile identically under RE2 —
    the oracle replays them verbatim. All JVM column expressions
    (regexp_count / regexp_replace): map-side, codegen'd, no Python.
    """
    text = F.col(text_col)
    return spread(documents).withColumns(
        {
            "n_emails": F.regexp_count(text, F.lit(EMAIL_REGEX)).cast("long"),
            "n_phones": F.regexp_count(
                F.regexp_replace(text, EMAIL_REGEX, "<EMAIL>"),
                F.lit(PHONE_REGEX),
            ).cast("long"),
            text_col: F.regexp_replace(
                F.regexp_replace(text, EMAIL_REGEX, "<EMAIL>"),
                PHONE_REGEX,
                "<PHONE>",
            ),
        }
    )


# -- repetition statistics (Gopher-style quality rules) ----------------------


def repetition_stats(
    documents: DataFrame, top_n: int = 2, dup_n: int = 5
) -> DataFrame:
    """Within-document repetition signals — the Gopher/MassiveText
    repetition filters (Rae et al. 2021 §A1.1) re-expressed as two
    word-count aggregations:

    - ``top{top_n}gram_frac``: fraction of the document's characters
      covered by its most frequent word ``top_n``-gram (occurrences x
      n-gram length / n_chars; ties break to the lexicographically
      smallest n-gram so both engines pick the same one).
    - ``dup{dup_n}gram_frac``: fraction of characters covered by word
      ``dup_n``-grams that occur more than once (overlaps counted per
      occurrence, so boilerplate-heavy docs can exceed 1.0 — the filter
      thresholds well below that; documented, not clamped).
    - ``dup_word_frac``: fraction of word occurrences that are repeats
      of an earlier word (1 - distinct/total).

    Scale shape: n-grams come from an index `sequence` + `slice` over
    the split array (JVM, no Python), then ONE explode + two hash
    aggregations per n-gram size — the word-count pattern, fully
    partial-aggregatable; the per-doc top-1 is a window over the
    (doc, gram) counts (never global). Documents shorter than the
    n-gram yield zero fractions via the left join.
    """
    from pyspark.sql import Window

    words = F.split("text", " ")
    base = spread(documents).select(
        "doc_id",
        F.length("text").alias("n_chars"),
        words.alias("w"),
    )

    def gram_counts(n: int) -> DataFrame:
        # sequence(1, 0) DESCENDS in Spark (step defaults to -1), so a
        # doc shorter than the n-gram must yield an empty index array
        # explicitly, not via the upper bound
        idx = F.when(
            F.size("w") >= n, F.sequence(F.lit(1), F.size("w") - n + 1)
        ).otherwise(F.array().cast("array<int>"))
        grams = F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice("w", i, n))
        )
        return (
            base.select("doc_id", F.explode(grams).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("cnt"))
        )

    top = gram_counts(top_n)
    win = Window.partitionBy("doc_id").orderBy(
        F.col("cnt").desc(), F.col("g").asc()
    )
    top1 = (
        top.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("doc_id", (F.col("cnt") * F.length("g")).alias("top_chars"))
    )
    dup = (
        gram_counts(dup_n)
        .filter(F.col("cnt") > 1)
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.length("g")).alias("dup_chars"))
    )
    return (
        base.join(top1, "doc_id", "left")
        .join(dup, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.coalesce(F.col("top_chars"), F.lit(0)) / F.col("n_chars"), 4
            ).alias(f"top{top_n}gram_frac"),
            F.round(
                F.coalesce(F.col("dup_chars"), F.lit(0)) / F.col("n_chars"), 4
            ).alias(f"dup{dup_n}gram_frac"),
            F.round(
                F.lit(1.0) - F.size(F.array_distinct("w")) / F.size("w"), 4
            ).alias("dup_word_frac"),
        )
    )
