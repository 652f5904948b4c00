"""Text analysis operators: language-ID, quality scoring, token counts,
fingerprinting.  All JVM-side expressions (regexp/translate/split) —
whole-stage-codegen friendly, no Python in the hot path."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..charsets import HOMOGLYPH_DST, HOMOGLYPH_SRC

# Tiny stopword list matched to the synthetic corpora (deterministic).
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "on", "for")


def words_arr(t: F.Column) -> F.Column:
    """THE whitespace word tokenizer (lower → split \\s+ → drop
    empties) — single definition; its DuckDB twin is the `_WORDS_SQL`-
    family CTEs, and oracle parity requires the two to stay in
    lock-step, so never inline a variant."""
    return F.filter(F.split(F.lower(t), r"\s+"), lambda w: w != F.lit(""))


def script_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc character-class counts + heuristic language guess (R6
    analog at the DataFrame level): latin vs cyrillic vs other."""
    t = F.col(text_col)
    n_latin = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    n_cyr = F.length(F.regexp_replace(t, "[^Ѐ-ӿ]", ""))
    n_digit = F.length(F.regexp_replace(t, "[^0-9]", ""))
    return docs.select(
        "doc_id",
        n_latin.cast("long").alias("n_latin"),
        n_cyr.cast("long").alias("n_cyr"),
        n_digit.cast("long").alias("n_digit"),
        F.when(n_cyr > n_latin, F.lit("cyrillic"))
        .when(n_latin > 0, F.lit("latin"))
        .otherwise(F.lit("other"))
        .alias("script_guess"),
    )


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + word-regex token counts and length stats.

    Token arrays are staged as columns first — Catalyst doesn't CSE
    repeated subexpressions, so inline split() would re-run per use."""
    t = F.col(text_col)
    staged = docs.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        F.filter(F.split(t, r"\s+"), lambda w: w != F.lit("")).alias("_ws"),
        F.filter(
            F.split(t, r"[^A-Za-z0-9]+"), lambda w: w != F.lit("")
        ).alias("_wd"),
    )
    return staged.select(
        "doc_id",
        F.size("_ws").cast("long").alias("n_ws_tokens"),
        F.size("_wd").cast("long").alias("n_word_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(
            F.length(F.array_join(F.col("_ws"), ""))
            / F.greatest(F.size("_ws"), F.lit(1)),
            4,
        ).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Boilerpipe-flavored quality features + a composite score:
    stopword ratio, punctuation density, token length — the same
    signal family the extraction classifier uses (D3), as columns."""
    t = F.col(text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    staged = docs.select(
        "doc_id",
        words_arr(t).alias("_tk"),
        F.length(F.regexp_replace(t, r"[^!?.,;:]", "")).alias("_np"),
        F.greatest(F.length(t), F.lit(1)).alias("_nc"),
    )
    toks = F.col("_tk")
    n_tok = F.greatest(F.size(toks), F.lit(1))
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    stop_ratio = n_stop / n_tok
    punct_ratio = F.col("_np") / F.col("_nc")
    score = F.round(
        F.least(F.size(toks) / F.lit(100.0), F.lit(1.0)) * 0.5
        + stop_ratio * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2,
        4,
    )
    return staged.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        score.alias("quality_score"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stable document fingerprints: exact md5 over normalized text and
    a first-8-hex-digit rolling-prefix variant (cheap clustering key)."""
    norm = F.lower(
        F.trim(
            F.regexp_replace(
                F.translate(F.col(text_col), HOMOGLYPH_SRC, HOMOGLYPH_DST),
                r"\s+",
                " ",
            )
        )
    )
    fp = F.md5(norm)
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("fingerprint8"),
    )


def kmv_distinct_shingles(docs: DataFrame, k: int = 256) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch over the corpus's
    3-word shingles (the MinHash feature space — ~16k distinct here).

    Unlike HLL, the md5-based KMV is fully DETERMINISTIC and
    engine-agnostic, so an external SQL oracle reproduces the estimate
    bit-for-bit: u = first 48 bits of md5(shingle) / 2^48 ∈ [0,1);
    estimate = (k−1) / max(k smallest u), or the exact count when fewer
    than k values exist (the k-min set then IS the value set).  At
    scale the k-smallest pass is a per-partition top-k then a
    k·partitions merge (Spark's sort+limit does exactly this — no
    global sort materialization), and sketches of partitions/streams
    union by merging their k-min sets.
    Returns one row: (n_exact, kmv_estimate, rel_err).
    """
    from .dedup import _shingle_rows

    shingles = _shingle_rows(docs, "w3").select("w").distinct()
    u = shingles.select(
        (
            F.conv(F.substring(F.md5("w"), 1, 12), 16, 10).cast("double")
            / F.lit(float(2**48))
        ).alias("u")
    )
    kmin = u.orderBy(F.col("u").asc()).limit(k)
    est = kmin.agg(
        F.when(
            F.count("*") < k, F.count("*").cast("double")
        )
        .otherwise(F.round(F.lit(float(k - 1)) / F.max("u"), 2))
        .alias("kmv_estimate")
    )
    exact = shingles.agg(F.count("*").alias("n_exact"))
    return (
        exact.crossJoin(est)
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("kmv_estimate") - F.col("n_exact"))
                / F.col("n_exact"),
                4,
            ),
        )
        .select("n_exact", "kmv_estimate", "rel_err")
    )


# Engine-portable redaction patterns: RE2-safe subset (no lookaround,
# no backreferences) so Spark (Java regex) and any RE2 engine (DuckDB)
# rewrite byte-identically.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
NUM_RE = r"[0-9]+"


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    the pretraining-data staple the quality gate composes with):

    - ``dup_word_frac``   = 1 − distinct words / total words
    - ``top_2gram_frac``  = occurrences of the most frequent word
      2-gram / total 2-grams (boilerplate and spam repeat phrases)

    Plan shape: words staged per row (lambda-CSE pitfall), 2-grams
    exploded → one (doc_id, gram) hash-agg with map-side combine →
    per-doc max/sum.  Empty and <2-word docs report 0 repetition (an
    empty doc is not "maximally repetitive" — the quality gate that
    composes on these signals must not spam-flag blanks).
    """
    staged = docs.select("doc_id", words_arr(F.col(text_col)).alias("_w"))
    base = staged.select(
        "doc_id",
        F.size("_w").cast("long").alias("n_words"),
        F.size(F.array_distinct("_w")).cast("long").alias("n_distinct"),
        F.when(
            F.size("_w") >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size("_w") - 2),
                lambda k: F.concat_ws(
                    " ", F.element_at("_w", k + 1), F.element_at("_w", k + 2)
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("_g2"),
    )
    grams = base.select("doc_id", F.explode("_g2").alias("g"))
    gstats = (
        grams.groupBy("doc_id", "g")
        .agg(F.count("*").alias("_c"))
        .groupBy("doc_id")
        .agg(
            F.max("_c").alias("_top"),
            F.sum("_c").alias("_tot"),
        )
    )
    return (
        base.join(gstats, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.round(
                F.when(
                    F.col("n_words") > 0,
                    F.lit(1.0)
                    - F.col("n_distinct") / F.col("n_words").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_word_frac"),
            F.coalesce(F.col("_tot"), F.lit(0)).cast("long").alias("n_2grams"),
            F.round(
                F.coalesce(
                    F.col("_top") / F.col("_tot").cast("double"), F.lit(0.0)
                ),
                6,
            ).alias("top_2gram_frac"),
        )
    )


def tfidf_topk(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Per-document top-k TF-IDF terms — the classic keyword/topic
    signal a curation pipeline uses for domain mixing and near-topic
    sampling.

    tf = term count within the doc; idf = ln(N / df) with N = corpus
    row count and df = docs containing the term; score rounded 6dp and
    ranked on the ROUNDED value with a term tie-break, so a 1-ulp ln
    difference between engines cannot reorder equal-rounded scores.
    (Residual cross-engine risk, shared with every rounded-float
    oracle here: a score landing within an ulp of a 6dp rounding
    boundary could round differently per engine — accepted and
    monitored by the tri-scale contract gate.)  Plan: one (doc, term)
    count agg (map-side combine), a term-keyed df agg joined back
    (term key — high cardinality, no skew funnel), a per-doc window.
    """
    words = docs.select(
        "doc_id", F.explode(words_arr(F.col(text_col))).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("_tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    n = docs.agg(F.count("*").cast("double").alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("_tf") * F.log(F.col("_n") / F.col("_df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "rank", "tfidf")
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc mean unigram negative log-probability — the
    SQL-expressible analog of the KenLM-perplexity quality filter
    (CCNet-style): gibberish and off-distribution text scores HIGH,
    fluent in-distribution text scores LOW.

    p(w) = corpus count(w) / total tokens (self-estimated — the corpus
    is its own LM, exactly CCNet's in-domain framing);
    score = mean over doc tokens of −ln p(w), rounded 6dp.  Plan: one
    (term) count agg + broadcast total + term-keyed join back to the
    doc term counts — two shuffles on high-cardinality keys, no skew
    funnel.  Docs with no tokens are ABSENT from the output (nothing
    to score) — left-join against the corpus and coalesce if one row
    per doc is required.
    """
    words = docs.select(
        "doc_id", F.explode(words_arr(F.col(text_col))).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("_tf"))
    cf = tf.groupBy("term").agg(F.sum("_tf").alias("_cf"))
    tot = cf.agg(F.sum("_cf").cast("double").alias("_tot"))
    scored = (
        tf.join(cf, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("_tf").cast("long").alias("n_tokens"),
            F.round(
                F.sum(
                    F.col("_tf") * -F.log(F.col("_cf") / F.col("_tot"))
                )
                / F.sum("_tf"),
                6,
            ).alias("mean_neg_logprob"),
        )
    )
    return scored


def redacted_col(text_col: str = "text") -> F.Column:
    """THE redaction expression (emails → <EMAIL>, urls → <URL>, digit
    runs → <NUM>) — single definition shared by ta6 (which pins it by
    md5 against the DuckDB oracle) and the `redact` pipeline stage, so
    the two can never silently diverge."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"),
            URL_RE,
            "<URL>",
        ),
        NUM_RE,
        "<NUM>",
    )


def redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII/noise scrubbing (training-data curation staple): emails →
    <EMAIL>, urls → <URL>, digit runs → <NUM>, with per-doc counts of
    what was redacted and an md5 fingerprint of the redacted text (the
    value the oracle pins).  Pure JVM regexp — codegen, no UDF."""
    t = F.col(text_col)
    redacted = redacted_col(text_col)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(URL_RE))).cast("long").alias("n_urls"),
        F.size(F.regexp_extract_all(t, F.lit(NUM_RE))).cast("long").alias("n_nums"),
        F.md5(redacted).alias("redacted_md5"),
    )


def _gram_rows(
    df: DataFrame, n: int, text_col: str
) -> DataFrame:
    """(doc_id, g): every word *n*-gram of every doc — words via THE
    shared ``words_arr`` tokenizer (oracle lock-step), grams sliced
    from the staged array (lambda-CSE pitfall), docs shorter than *n*
    words contribute none."""
    staged = df.select("doc_id", words_arr(F.col(text_col)).alias("_w"))
    grams = (
        F.when(
            F.size("_w") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("_w") - n),
                lambda k: F.array_join(F.slice("_w", k + 1, n), " "),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
    )
    return staged.select("doc_id", F.explode(grams).alias("g"))


def _contamination_hits(
    docs: DataFrame, probes: DataFrame, n: int, text_col: str
) -> DataFrame:
    """(doc_id, n_hits) for docs with ≥1 probe-n-gram occurrence —
    the shared core of ``contamination_flags`` (which left-joins it
    back for zero-fill) and ``contaminated_ids`` (which doesn't)."""
    probe_grams = _gram_rows(probes, n, text_col).select("g").distinct()
    return (
        _gram_rows(docs, n, text_col)
        .join(F.broadcast(probe_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


def contaminated_ids(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Just the (doc_id) rows that share any probe n-gram — the
    anti-join right side for a decontamination DROP, without
    ``contamination_flags``' zero-fill left join (which would evaluate
    the docs subtree a third time; CLAUDE.md UDF-subtree rule)."""
    return _contamination_hits(docs, probes, n, text_col).select("doc_id")


def contamination_flags(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 §C / Gopher pretraining
    staple): flag every document sharing ANY word *n*-gram with the
    probe (evaluation/benchmark) corpus, so training data can be
    scrubbed of test-set leakage.

    Returns (doc_id, n_hits, contaminated): *n_hits* = number of
    n-gram OCCURRENCES in the doc that appear anywhere in the probe
    set; every doc gets a row (zero-hit docs included — the common
    downstream move is an anti-join on ``contaminated``).

    100 TB shape: the probe set is an eval suite — tiny next to the
    corpus (≲1e6 distinct grams) — so its DISTINCT grams BROADCAST and
    the corpus side is one linear gram explode hit by a broadcast hash
    join; the corpus is never shuffled, and the only exchange is the
    per-doc count aggregation on doc_id (narrow rows).  At larger
    probe sets swap the broadcast for a bloom-filter pushdown; the
    plan shape is otherwise unchanged.
    """
    hits = _contamination_hits(docs, probes, n, text_col)
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
