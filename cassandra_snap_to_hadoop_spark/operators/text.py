"""Text analysis operators (SURVEY §2-J5/J6/J7/J9 + north-star text ops):
tokenization, language ID, quality scoring, token counting, fingerprinting.

Everything is built-in-expression based (codegen, no UDFs): at 100 TB the
text pipeline is a pure map stage — no shuffle until the corpus-level
aggregates (term stats), which are plain hash aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.io import fan_out
from cassandra_snap_to_hadoop_spark.operators.dedup import normalize_text

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Real pipelines plug a fastText-style model in via pandas UDF; the heuristic
# keeps language-ID deterministic and SQL-mirrorable for the oracle.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "for", "with"),
    "de": ("der", "die", "und", "das", "ist", "mit", "von", "ein"),
    "es": ("el", "la", "de", "que", "los", "con", "una", "por"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour"),
    "zh": ("de5", "shi4", "zai4", "you3", "he2", "wo3", "le5", "bu4"),
}

# A BPE-ish token: word chars, or a single non-space symbol — approximates
# subword pre-tokenization (public GPT-2/tiktoken-style split, simplified).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    """Whitespace tokens of normalized text."""
    return F.split(normalize_text(col), " ")


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish token count via regexp matches (letters runs / digit runs /
    single symbols) — a deterministic proxy for subword token budgets."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0))


def marker_hits(col: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens of ``col`` are in the marker list."""
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens(col), lambda w: F.array_contains(marker_arr, w)))


def language_id(col: Column) -> Column:
    """Heuristic language ID: argmax of marker-token hits, 'und' when no
    marker matches.  Deterministic tie-break on language code order."""
    scored = [
        F.struct(marker_hits(col, LANG_MARKERS[lang]).alias("hits"), F.lit(lang).alias("lang"))
        for lang in sorted(LANG_MARKERS)
    ]
    # array_max picks (max hits, max lang-code) — invert lang for asc tiebreak
    best = F.array_max(F.array(*scored))
    return F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(F.lit("und"))


def language_id_learned(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    train_mod: int = 10,
) -> DataFrame:
    """Learned language ID: a naive-Bayes unigram model trained on a
    held-out corpus slice, applied to the rest — no hand-curated lexicon.

    Marker/top-token approaches fail when languages share one vocabulary
    and differ only in token FREQUENCIES.  So: train docs (``id %
    train_mod == 0``) yield Laplace-smoothed per-language unigram
    log-probs ln((c+1)/(N+V)); a test doc's score for a language is the
    sum of its tokens' log-probs; argmax wins.  (On the synthetic harness
    corpus the lang labels are independent of the text — measured: all 5
    langs draw uniformly from one 31-word vocabulary — so NO classifier
    can beat the label prior there; accuracy-with-signal is asserted on a
    constructed corpus in tests/test_llm_ops.py.)

    Determinism across engines: per-token log-probs are quantized to 1e-6
    (single ln per (lang, token) — libm-identical in practice) and summed
    as exact integers, so the argmax never hinges on float association
    order.  The model (langs x vocab grid) broadcasts regardless of corpus
    size — training is one distributed aggregation, scoring one broadcast
    join + hash aggregate.
    """
    from pyspark.sql.window import Window

    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.explode(tokens(F.col(text_col))).alias("w"),
    )
    train = words.filter(F.col("doc_id") % train_mod == 0)
    # r11 (guide §2.4): the (lang, token) count relation feeds the lang
    # domain, the vocabulary domain and the grid join — cut once, and
    # derive both distinct domains from it (a lang/token appears in
    # counts iff it appears in train — identical sets), so the train
    # explode runs once, not four times.
    counts = (
        train.groupBy("lang", "w")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    # full (lang x train-vocab) grid so unseen (lang, token) pairs get the
    # smoothing floor instead of silently dropping out of the join
    grid = (
        counts.select("lang").distinct()
        .crossJoin(counts.select("w").distinct())
        .join(counts, ["lang", "w"], "left")
        .select("lang", "w", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    w_lang = Window.partitionBy("lang")
    model = grid.select(
        F.col("lang").alias("plang"),
        "w",
        F.round(
            F.log(
                (F.col("c") + 1).cast("double")
                / (F.sum("c").over(w_lang) + F.count("*").over(w_lang)).cast("double")
            )
            * 1e6
        )
        .cast("long")
        .alias("lp_q"),
    )
    test_words = words.filter(F.col("doc_id") % train_mod != 0)
    scores = (
        test_words.join(F.broadcast(model), "w")
        .groupBy("doc_id", "plang")
        .agg(F.sum("lp_q").alias("score"))
    )
    w_arg = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("plang"))
    best = (
        scores.withColumn("rn", F.row_number().over(w_arg))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("plang").alias("pred"))
    )
    return (
        docs.filter(F.col(id_col) % train_mod != 0)
        .select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("true_lang"))
        .join(best, "doc_id", "left")
        .select("doc_id", "true_lang", F.coalesce(F.col("pred"), F.lit("und")).alias("pred_lang"))
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style quality features (PAPERS.md corpus): length bounds,
    mean word length, symbol/digit ratios, repetition.  Adds feature columns
    + a composite ``quality_ok`` flag; thresholds follow the published
    Gopher rules, adapted to the synthetic corpus ranges."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    mean_wl = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0.0), lambda a, w: a + F.length(w).cast("double")) / n_tok,
    )
    n_chars = F.length(t)
    digit_ratio = F.when(
        n_chars > 0, F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("double") / n_chars
    ).otherwise(0.0)
    space_ratio = F.when(
        n_chars > 0, F.length(F.regexp_replace(t, r"[^ ]", "")).cast("double") / n_chars
    ).otherwise(0.0)
    distinct_ratio = F.when(n_tok > 0, F.size(F.array_distinct(toks)).cast("double") / n_tok)
    return df.select(
        "*",
        n_tok.cast("int").alias("n_tokens"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(space_ratio, 4).alias("space_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_token_ratio"),
        (
            (n_tok >= 10)
            & (n_tok <= 1000)
            & (mean_wl >= 2)
            & (mean_wl <= 12)
            & (distinct_ratio >= 0.2)
        )
        .cast("int")
        .alias("quality_ok"),
    )


def doc_fingerprint(col: Column) -> Column:
    """J9-adjacent rolling fingerprint: fold tokens through
    h = xxhash64(h, token), in token order.  Order-sensitive (unlike a
    bag-of-words hash) and computed as one codegen'd fold — the streaming
    shape of a Rabin-Karp rolling hash, using xxhash64 as the mixer so the
    fold can't overflow under ANSI arithmetic."""
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, w: F.xxhash64(acc, w),
    )


def term_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """J6: (doc, term, tf) long format — the base relation for TF-IDF."""
    return (
        fan_out(df).select(F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("doc", "term")
        .agg(F.count("*").alias("tf"))
    )


def tf_idf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """J7: tf * ln(N / df) per (doc, term).

    Single-scan formulation: document frequency comes from a COUNT window
    over the tf relation partitioned by term — NOT a separate
    ``tf.groupBy(term)`` + join, which (without caching) duplicates the tf
    subtree in the physical plan and tokenizes/explodes the whole corpus a
    second time.  At 100 TB the corpus scan+explode dominates everything,
    so one scan + one extra term-shuffle of the compact (doc, term, tf)
    relation strictly beats two scans + a join.  tf already holds one row
    per (doc, term), so the window count IS the document frequency — no
    distinct expansion.
    """
    from pyspark.sql.window import Window

    tf = term_frequencies(df, id_col, text_col)
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    with_df = tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
    return with_df.crossJoin(F.broadcast(n_docs)).select(
        "doc",
        "term",
        "tf",
        F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4).alias("tfidf"),
    )


def repetition_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """J9 repetition profile (Gopher-style boilerplate rules): per document,
    the exact-integer counts behind duplicate-2-gram fraction, vocabulary
    size, and hottest-token mass.  Ratios are left to the consumer so the
    outputs stay engine-exact integers.

    Non-distinct 2-grams are built positionally (``sequence`` + ``slice``);
    texts under 2 tokens yield an empty gram array (same downward-counting
    ``sequence(1, 0)`` guard as dedup.shingles).  The hottest-token count is
    O(tokens x vocab) per row via nested HOFs — fine for document-length
    rows, and the whole profile stays a no-shuffle codegen map stage.
    """
    w = tokens(F.col(text_col))
    grams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.slice(w, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    t = df.select(F.col(id_col), w.alias("__w"), grams.alias("__grams"))
    # r11 (guide §1.2 per-task work): the hottest-token count used to be
    # O(tokens × vocab) per row (per distinct token, filter the whole
    # token array).  Max multiplicity ≡ the longest equal-run of the
    # SORTED token array, so one array_sort + one linear fold computes
    # the identical integer in O(n log n) per row.  (NULL-text rows stay
    # NULL through sort/aggregate exactly as through the old
    # distinct/transform chain.)
    run = lambda acc, x: F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
    max_tok = F.aggregate(
        F.array_sort(F.col("__w")),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run(acc, x).alias("run"),
            F.greatest(acc["best"], run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return t.select(
        id_col,
        F.size("__w").cast("int").alias("n_tokens"),
        F.size("__grams").cast("int").alias("n_2grams"),
        F.size(F.array_distinct("__grams")).cast("int").alias("n_distinct_2grams"),
        F.size(F.array_distinct("__w")).cast("int").alias("n_distinct_tokens"),
        max_tok.cast("int").alias("max_token_count"),
    )
