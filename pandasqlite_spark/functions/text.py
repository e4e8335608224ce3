"""Text-analysis operators for training-data pipelines (SURVEY.md §2.D).

All four operators are pure ``pyspark.sql.functions`` column expressions
— JVM-side, whole-stage-codegen'd, no Python in the hot path — so they
scale linearly over a 100 TB documents table with zero shuffles (the
queries are per-row; only the optional aggregations shuffle).

Tokenization contract (shared with :mod:`pandasqlite_spark.functions.dedup`
and every DuckDB oracle): ``split(trim(lower(text)), '\\s+')``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandasqlite_spark.operators.common import load

# Small English function-word list for the n-gram/stopword language
# heuristic (public-knowledge stopwords, not tied to any model).
EN_STOPWORDS = (
    "the", "a", "an", "of", "to", "in", "and", "is", "for", "on",
    "with", "as", "at", "by", "from", "or", "that", "this", "it", "be",
)

_SW_SQL = "(" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + ")"


def tokens(col: str = "text") -> Column:
    return F.split(F.trim(F.lower(F.col(col))), r"\s+")


def token_count(col: str = "text") -> Column:
    """Whitespace token count — the cheap estimator; a BPE-ish regex
    variant is ``bpe_piece_count``."""
    return F.size(tokens(col))


def bpe_piece_count(col: str = "text") -> Column:
    """BPE-ish piece count: words + digit runs + punctuation marks each
    count as pieces (a regex proxy for subword tokenizers)."""
    return F.size(
        F.expr(rf"regexp_extract_all(lower({col}), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)")
    )


def stopword_ratio(col: str = "text") -> Column:
    toks = tokens(col)
    hits = F.expr(f"size(filter(split(trim(lower({col})), '\\\\s+'), x -> x IN {_SW_SQL}))")
    return hits.cast("double") / F.size(toks)


def language_guess(col: str = "text", threshold: float = 0.08) -> Column:
    """n-gram/stopword heuristic language ID: English function-word hit
    ratio above ``threshold`` ⇒ 'en'.  (Container has no langid libs —
    the heuristic is the real operator, not a stub.)"""
    return F.when(stopword_ratio(col) >= threshold, "en").otherwise("other")


def quality_score(col: str = "text") -> Column:
    """Composite quality in [0,1]: length saturation + lexical diversity
    + alpha-character ratio — standard pretraining-corpus heuristics."""
    toks = tokens(col)
    n = F.size(toks).cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    length_sat = F.least(F.lit(1.0), n / F.lit(100.0))
    alpha_ratio = (
        F.length(F.regexp_replace(F.lower(F.col(col)), "[^a-z]", "")).cast("double")
        / F.length(col)
    )
    return F.round(0.4 * length_sat + 0.3 * distinct_ratio + 0.3 * alpha_ratio, 9)


def repetition_ratio(col: str = "text") -> Column:
    """Duplicate-token mass ``1 - distinct/total`` — the cheap
    repetitious-text signal (high values flag boilerplate / template
    spam for the quality gate).  Row-local, codegen'd, no shuffle."""
    toks = tokens(col)
    return F.round(
        F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 9
    )


# PII patterns shared verbatim by the Spark query and the DuckDB oracle
# (subset of regex syntax valid in both Java regex and RE2).
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"


def redact_pii(col) -> Column:
    """Mask emails then phone numbers with typed placeholders — the
    standard pre-training scrub pass.  Two chained ``regexp_replace``
    calls: row-local, JVM-side, no shuffle, linear over 100 TB."""
    c = col if isinstance(col, Column) else F.col(col)
    c = F.regexp_replace(c, EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(c, PHONE_RE, "[PHONE]")


def fingerprint(col: str = "text") -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (the classic "fingerprint" dedup key)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


# --- query keys -----------------------------------------------------------


def q_text_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count().alias("n_tokens"),
        bpe_piece_count().alias("n_pieces"),
        F.length("text").alias("n_chars_live"),
    )


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(stopword_ratio(), 9).alias("sw_ratio"),
        language_guess().alias("lang_guess"),
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score().alias("quality"))


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint().alias("fp"))


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.filter(F.size(tokens()) > 0).select(
        "doc_id", repetition_ratio().alias("rep_ratio")
    )


FREQUENT_CUT = 5


def rare_token_ratio(docs: DataFrame, cut: int = FREQUENT_CUT) -> DataFrame:
    """Per-doc fraction of tokens that are corpus-RARE (frequency ≤
    ``cut``) — a gibberish/OCR-noise quality gate (junk text is full of
    tokens the corpus has never seen; fluent text reuses the head of
    the Zipf curve).

    Scale design: the join side is the FREQUENT token set (freq >
    cut) — the small head of the Zipf distribution — which broadcasts;
    rare count = total − frequent-matches, so the unbounded rare
    vocabulary is never joined or collected.  The token-frequency
    aggregate itself map-side-combines to ~|vocab| rows per partition.
    The ratio divides exact longs in IEEE double — engine-identical."""
    toks = docs.select("doc_id", F.explode(tokens()).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    frequent = freq.filter(F.col("n") > cut).select("tok")
    per_doc = toks.join(F.broadcast(frequent), "tok", "left_semi").groupBy(
        "doc_id"
    ).agg(F.count(F.lit(1)).alias("n_frequent"))
    totals = docs.select("doc_id", F.size(tokens()).cast("bigint").alias("n_tokens"))
    return (
        totals.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_frequent", F.lit(0))).alias("n_rare"),
            (
                (F.col("n_tokens") - F.coalesce("n_frequent", F.lit(0))).cast("double")
                / F.col("n_tokens")
            ).alias("rare_ratio"),
        )
    )


def q_text_rare_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rare_token_ratio(load(spark, sf_dir, "documents"))


def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction correctness probe: the synthetic corpus contains no
    PII, so the query first splices a deterministic email + phone
    (derived from ``doc_id``) into each document, then runs the real
    ``redact_pii`` operator over the spliced text.  Both engines build
    the identical input, so the oracle checks the redaction itself."""
    d = load(spark, sf_dir, "documents")
    spliced = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-010-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return d.select("doc_id", redact_pii(spliced).alias("redacted"))


def q_corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) token accounting — the first number any
    pretraining run needs.  Single scan, row-local token counts, one
    tiny groupBy (map-side partials carry one row per lang×source per
    partition; the exchange moves a few hundred rows at any corpus
    size)."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count()).alias("total_tokens"),
        F.sum(bpe_piece_count()).alias("total_pieces"),
    )


def length_quantiles(df: DataFrame, value_col: str, by: str, *, exact: bool = True) -> DataFrame:
    """Per-group p50/p90/p99 of ``value_col``.  ``exact=True`` uses
    interpolated ``percentile`` (per-group sort — fine when groups fit
    an executor, as lang-level groups do); at 100 TB with huge groups
    flip to ``exact=False`` → ``approx_percentile`` (t-digest sketch,
    mergeable map-side partials, no per-group sort)."""
    fn = "percentile" if exact else "approx_percentile"
    return df.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.expr(f"{fn}({value_col}, 0.5)"), 6).alias("p50"),
        F.round(F.expr(f"{fn}({value_col}, 0.9)"), 6).alias("p90"),
        F.round(F.expr(f"{fn}({value_col}, 0.99)"), 6).alias("p99"),
    )


def q_corpus_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return length_quantiles(
        load(spark, sf_dir, "documents"), "n_chars", "lang", exact=True
    )


_VOCAB_SIZE = 512


def vocab_encode(df: DataFrame, vocab_size: int = _VOCAB_SIZE) -> DataFrame:
    """Dictionary-encode each document's token stream against a
    frequency-ranked vocabulary (id 1 = most frequent token; ties break
    lexicographically; out-of-vocabulary → 0) — the id-mapping step
    every tokenizer pipeline runs between text and training tensors.

    Scale shape: one posexplode (row-local fan-out), one groupBy for
    the term histogram (map-side combined: #distinct-tokens rows, not
    #token occurrences), a rank window over that *small* histogram, a
    **broadcast** join of the ≤vocab_size dictionary against the token
    stream (no shuffle of the 100 TB side), and one groupBy(doc_id) to
    re-assemble sequences — co-partitioned with nothing, so exactly one
    big shuffle keyed on doc_id.  `collect_list` order is made
    deterministic by sorting (pos, id) structs, not by trusting arrival
    order."""
    from pyspark.sql import Window as W

    toks = df.select(
        "doc_id", F.posexplode(tokens()).alias("pos", "tok")
    ).filter(F.col("tok") != "")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "tok",
            F.row_number()
            .over(W.orderBy(F.desc("n"), "tok"))
            .alias("tid"),
        )
        .filter(F.col("tid") <= vocab_size)
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .withColumn("tid", F.coalesce("tid", F.lit(0)))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "tid"))).alias("ps"))
        .select(
            "doc_id",
            F.transform("ps", lambda s: s.tid).alias("token_ids"),
        )
    )


def q_text_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_encode(load(spark, sf_dir, "documents"))


def quantile_normalize(docs: DataFrame, col: str = "n_chars") -> DataFrame:
    """Cross-source quantile normalization: map each document's
    within-source rank onto the GLOBAL value distribution, so a quality
    threshold means the same thing for every source — the calibration
    step before mixing heterogeneous corpora (each crawl/source scores
    on its own scale).

    Entirely integer arithmetic: within-source rank r of n_g maps to
    global rank ``1 + (r−1)(N−1) div (n_g−1)`` and picks that order
    statistic — no float percentile anywhere, so the result hash-exact.
    The global rank is one unpartitioned window (the exact method's
    cost — at extreme N substitute the equi-depth histogram bounds and
    map ranks onto bucket representatives instead)."""
    from pyspark.sql import Window as W

    d = docs.select("doc_id", "source", F.col(col).alias("x"))
    ws = W.partitionBy("source").orderBy("x", "doc_id")
    wsc = W.partitionBy("source")
    wg = W.orderBy("x", "doc_id")
    ranked = (
        d.withColumn("r", F.row_number().over(ws))
        .withColumn("n_g", F.count(F.lit(1)).over(wsc))
        .withColumn("n_all", F.count(F.lit(1)).over(W.partitionBy()))
    )
    target = F.expr(
        "CASE WHEN n_g = 1 THEN 1 + (n_all - 1) div 2 "
        "ELSE 1 + ((r - 1) * (n_all - 1)) div (n_g - 1) END"
    )
    glob = d.select("x", "doc_id").withColumn("gr", F.row_number().over(wg)).select(
        F.col("gr").alias("target"), F.col("x").alias("norm_x")
    )
    return (
        ranked.withColumn("target", target)
        .join(glob, "target")
        .select("doc_id", "source", "x", "norm_x")
        .orderBy("doc_id")
    )


def q_corpus_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quantile_normalize(load(spark, sf_dir, "documents"))


def q_pipeline_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A composed training-data curation pipeline — the operators above
    chained the way a 100 TB corpus job would run them: language filter
    → quality gate → normalized dedup (keep lowest doc_id) → per-doc
    stats.  Entirely JVM-side expressions; the only shuffle is the
    dedup groupBy."""
    from pandasqlite_spark.functions.dedup import normalize_text

    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "text",
        language_guess().alias("lang_guess"),
        quality_score().alias("quality"),
        token_count().alias("n_tokens"),
        fingerprint().alias("fp"),
    )
    kept = scored.filter((F.col("lang_guess") == "en") & (F.col("quality") > 0.55))
    w_norm = kept.withColumn("norm", normalize_text())
    from pyspark.sql import Window as W

    w = W.partitionBy("norm").orderBy("doc_id")
    return (
        w_norm.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "n_tokens", "quality", "fp")
    )


def q_text_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency, top-20: the n-gram table every
    tokenizer-training / contamination-check pipeline builds.  Explode
    is row-local; the only shuffle is the count groupBy (partial-agg:
    the exchange carries one row per distinct bigram per partition)."""
    d = load(spark, sf_dir, "documents")
    toks = tokens()
    bigrams = F.expr(
        "transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))"
    )
    return (
        d.select(toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


def bigram_lm_score(docs: DataFrame) -> DataFrame:
    """Per-document n-gram language-model quality score (the
    CCNet/KenLM-style perplexity filter, as a pure Spark pipeline):
    train a bigram model on the corpus itself — ``p(w2|w1) =
    c(w1 w2) / c(w1 ·)`` — then score every document by its mean bigram
    log-probability.  Low scores flag unnatural text (boilerplate,
    gibberish, OCR noise) for the quality gate.

    Scale shape: bigram extraction is row-local (``transform`` over the
    token array, no explode-then-window); the model is ONE
    partial-aggregated groupBy, collapsing 100 TB of text to a
    vocabulary²-bounded count table, which then broadcasts back onto
    the per-doc bigram stream — corpus rows are never shuffled, only
    aggregated counts move.  Scoring is a broadcast join + one groupBy
    per doc.  (Unsmoothed is exact here because the model is trained on
    the scoring corpus, so every bigram has count ≥ 1; a held-out
    deployment would add smoothing in the same expressions.)"""
    t = docs.select("doc_id", tokens().alias("t")).filter(F.size("t") >= 2)
    big = t.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))")
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    model = c12.join(c1, "w1")
    return (
        big.join(F.broadcast(model), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(F.log(F.col("c12").cast("double") / F.col("c1"))), 6).alias("avg_logp"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
        .orderBy("doc_id")
    )


def q_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_lm_score(load(spark, sf_dir, "documents"))


def langid_confusion(docs: DataFrame) -> DataFrame:
    """Confusion matrix of the heuristic language-ID against the
    labeled ``lang`` column — the eval readout that turns `text-langid`
    from a feature into a measured classifier (per-cell counts +
    row-normalized rates).  One groupBy on the (actual, predicted)
    pair; the rate join is labels×labels rows."""
    pred = docs.select(F.col("lang").alias("actual"), language_guess().alias("predicted"))
    cells = pred.groupBy("actual", "predicted").agg(F.count(F.lit(1)).alias("n"))
    row_tot = cells.groupBy("actual").agg(F.sum("n").alias("t"))
    return (
        cells.join(row_tot, "actual")
        .select(
            "actual", "predicted", "n",
            F.round(F.col("n") / F.col("t"), 6).alias("rate"),
        )
        .orderBy("actual", "predicted")
    )


def q_text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return langid_confusion(load(spark, sf_dir, "documents"))


def zipf_fit(docs: DataFrame) -> DataFrame:
    """Zipf-law fit over the corpus rank-frequency curve: OLS of
    ``ln(freq)`` on ``ln(rank)`` — the slope's magnitude is the Zipf
    exponent (natural language ≈ 1; gibberish/templated corpora
    deviate), making this a one-row corpus-health signature.

    Scale shape: token frequencies are one partial-aggregated groupBy
    (vocab-bounded); the rank window and the 5 moment sums run over the
    VOCAB table, not the corpus.  Moments are sums of doubles (logs),
    so unlike :func:`~pandasqlite_spark.functions.analytics
    .linreg_exact` they are order-sensitive in the last bits — the
    6-dp rounding absorbs it (≪ 1 ulp-per-term accumulation at vocab
    sizes)."""
    from pyspark.sql import Window as W

    freq = (
        docs.select(F.explode(tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = freq.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("n"), "tok"))
    ).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    g = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return g.select(
        F.col("k").cast("bigint").alias("vocab_size"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("k"), 6).alias(
            "intercept"
        ),
    )


def q_text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zipf_fit(load(spark, sf_dir, "documents"))


NB_ALPHA = 1  # Laplace smoothing count


def naive_bayes_self_score(docs: DataFrame) -> DataFrame:
    """Multinomial Naive Bayes trained ON the corpus labels
    (``source``) and scored back over the same docs — "ML training as
    relational algebra": class priors and Laplace-smoothed token
    likelihoods are two partial-aggregated groupBys; scoring is a
    broadcast join of the (class × token) log-likelihood table onto the
    per-doc token stream plus a per-doc argmax.  The standard cheap
    text classifier for corpus routing (and the template for any
    count-based model: the "model" is an aggregate, "inference" is a
    broadcast join).

    Determinism: all probabilities are ratios of exact integer counts
    (+α smoothing); log-sums per doc round to 6 dp; argmax breaks ties
    on class name.  Emits (doc_id, predicted, match_actual).

    Parallelism (round 9, guide §2.5): the tokenize+explode and the
    per-(token, class) log-likelihood fan-out all execute map-side in
    the scan task; an under-split layout (sf1 = 1–2 row groups)
    serialized ~|tokens|·|classes| rows of log() arithmetic onto 2 of
    32 cores (the measured 46.1 s sf1 wall).  The skinny (doc_id,
    source, text) projection is spread to session parallelism first —
    a no-op when the scan already has enough splits."""
    from pandasqlite_spark.operators.common import spread_scan

    base = spread_scan(docs.select("doc_id", "source", "text"), "doc_id")
    toks = base.select("doc_id", "source", F.explode(tokens()).alias("tok"))
    vocab_n = toks.select("tok").distinct().count()
    class_tok = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    class_tot = toks.groupBy("source").agg(F.count(F.lit(1)).alias("t"))
    n_docs = docs.count()
    priors = docs.groupBy("source").agg(
        (F.log(F.count(F.lit(1)) / F.lit(float(n_docs)))).alias("log_prior")
    )
    classes = class_tot.select(F.col("source").alias("cls"), "t")
    # every (doc-token, class) pair: smoothed log-likelihood
    pairs = toks.select("doc_id", "tok", F.col("source").alias("actual")).crossJoin(
        F.broadcast(classes)
    )
    ll = (
        pairs.join(
            F.broadcast(class_tok.withColumnsRenamed({"source": "cls"})),
            ["cls", "tok"],
            "left",
        )
        .select(
            "doc_id", "actual", "cls",
            F.log(
                (F.coalesce("c", F.lit(0)) + F.lit(NB_ALPHA))
                / (F.col("t") + F.lit(NB_ALPHA) * F.lit(float(vocab_n)))
            ).alias("lp"),
        )
        .groupBy("doc_id", "actual", "cls")
        .agg(F.round(F.sum("lp"), 6).alias("loglik"))
    )
    scored = ll.join(
        F.broadcast(priors.withColumnsRenamed({"source": "cls"})), "cls"
    ).select(
        "doc_id", "actual", "cls",
        F.round(F.col("loglik") + F.col("log_prior"), 6).alias("score"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("score"), "cls")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("cls").alias("predicted"),
            (F.col("cls") == F.col("actual")).alias("match_actual"),
        )
        .orderBy("doc_id")
    )


def q_text_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return naive_bayes_self_score(load(spark, sf_dir, "documents"))


HASH_DIM = 32


def hashing_vectorizer(docs: DataFrame, dim: int = HASH_DIM) -> DataFrame:
    """Feature-hashing vectorizer (the HashingTF trick): every token
    hashes to one of ``dim`` feature slots, per-doc slot counts form a
    fixed-width sparse vector — text → numeric features with NO
    vocabulary to build, broadcast, or version, which is why the
    hashing trick survives at corpus scale where a fitted vocabulary
    becomes a coordination problem.

    Emitted long-form (doc_id, slot, n) — the sparse representation a
    downstream trainer consumes; one row-local explode + one
    partial-aggregated groupBy on (doc_id, slot).  md5-slot assignment
    keeps the vector engine-reproducible (xxhash64 is the production
    swap, same shape)."""
    toks = docs.select("doc_id", F.explode(tokens()).alias("tok"))
    slot = (
        F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("bigint") % dim
    ).cast("int")
    return (
        toks.select("doc_id", slot.alias("slot"))
        .groupBy("doc_id", "slot")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("doc_id", "slot")
    )


def q_text_hashing_vectorizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hashing_vectorizer(load(spark, sf_dir, "documents"))


def readability_score(col: str = "text") -> Column:
    """Flesch reading-ease with the standard cheap heuristics (vowel
    groups ≈ syllables, ``[.!?]`` runs ≈ sentences) — the classic
    document-quality feature next to ``quality_score``.  Pure built-in
    regex/arithmetic expressions: row-local, codegen'd, zero Python."""
    words = F.size(tokens(col))
    sentences = F.greatest(
        F.lit(1), F.size(F.expr(f"regexp_extract_all({col}, '[.!?]+', 0)"))
    )
    syllables = F.size(
        F.expr(f"regexp_extract_all(lower({col}), '[aeiouy]+', 0)")
    )
    return F.round(
        F.lit(206.835)
        - F.lit(1.015) * words.cast("double") / sentences
        - F.lit(84.6) * syllables.cast("double") / words,
        6,
    )


def code_likeness(col: str = "text") -> Column:
    """Heuristic code-vs-prose score in [0,1] — the filter every
    pretraining corpus runs to route code away from (or into) the text
    mix: symbol density (`{}[]();=<>`), digit density, and
    underscore_identifier density, equally weighted.  Pure codegen'd
    regex arithmetic, row-local."""
    n = F.length(col).cast("double")
    sym = F.length(F.regexp_replace(F.col(col), r"[^{}\[\]();=<>]", "")).cast("double")
    dig = F.length(F.regexp_replace(F.col(col), "[^0-9]", "")).cast("double")
    und = F.size(F.expr(f"regexp_extract_all({col}, '[a-z]+_[a-z_]+', 0)")).cast(
        "double"
    )
    toks = F.size(tokens(col)).cast("double")
    return F.round(
        F.least(
            F.lit(1.0),
            (sym / n) * 10 + (dig / n) * 2 + (und / toks),
        ),
        6,
    )


def q_text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.filter(F.length("text") > 0).select(
        "doc_id", code_likeness().alias("code_score")
    )


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.filter(F.size(tokens()) > 0).select(
        "doc_id", readability_score().alias("flesch")
    )


def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic relevance /
    keyword-extraction signal for corpus triage.

    Scale shape: two partial-aggregated shuffles (term counts per doc,
    then document frequency per term) + one broadcast of the 1-row
    corpus count; the per-doc top-k is a rank-filter window partitioned
    by doc_id, so no skew (documents are the natural unit).  The idf is
    kept as the rational ``(N+1)/(df+1)`` (no ``ln``): libm log is not
    bit-identical across engines, but IEEE multiply/divide are, so the
    scores hash-match the oracle exactly.
    """
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens()).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            (
                F.col("tf").cast("double")
                * (
                    (F.col("n_docs") + F.lit(1)).cast("double")
                    / (F.col("df") + F.lit(1)).cast("double")
                )
            ).alias("tf_idf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tf_idf").desc(), F.col("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "tf_idf")
    )


def q_text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count histogram in buckets of 20 — the length-distribution
    data-quality probe; integer bucketing keeps it engine-exact."""
    d = load(spark, sf_dir, "documents")
    bucket = (F.size(tokens()) / 20).cast("int") * 20
    return (
        d.select(bucket.alias("bucket_lo"))
        .groupBy("bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


CHUNK_SIZE = 64  # tokens per chunk
CHUNK_STRIDE = 48  # chunk start spacing (CHUNK_SIZE - CHUNK_STRIDE overlap)


def chunk_documents(
    df: DataFrame, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE, sort: bool = True
) -> DataFrame:
    """Sliding-window document chunking — the RAG/embedding prep pass:
    each doc explodes into overlapping ``size``-token windows whose
    starts are ``stride`` apart (tail chunks may be shorter).

    Pure built-in array ops (`split` → `sequence` → `explode` →
    `slice`), so chunking is row-local and codegen'd: no shuffle, no
    Python, and output size is (n_tokens / stride)× input — the fan-out
    is data-parallel and never concentrates on one task."""
    toks = tokens()
    d = df.select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("nt")
    ).filter(F.col("nt") > 0)
    nchunks = F.expr(f"cast(ceil(nt / {stride}.0) as int)")
    out = (
        d.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), nchunks - 1)))
        .select(
            "doc_id",
            "chunk_idx",
            F.array_join(
                F.slice(F.col("toks"), F.col("chunk_idx") * stride + 1, size), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(size), F.col("nt") - F.col("chunk_idx") * stride
            ).alias("n_chunk_tokens"),
        )
    )
    # the sort is presentation-only (oracle row order); the operator
    # itself is shuffle-free — asserted in tests/test_analytics.py
    return out.orderBy("doc_id", "chunk_idx") if sort else out


def q_text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(load(spark, sf_dir, "documents"))


BM25_TERMS = ("spark", "window")  # query terms for the ranking key
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...] = BM25_TERMS,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top: int = 20,
) -> DataFrame:
    """Okapi BM25 ranking of documents for a bag of query terms — the
    standard lexical-retrieval scorer (quality filtering by topicality,
    eval-set retrieval baselines).

    Scale shape: one explode → (doc, term) partial-aggregated tf
    groupBy restricted to the |terms| query tokens, a broadcast join of
    the |terms|-row df table, and one 1-row (N, avgdl) broadcast; the
    final top-k is TakeOrderedAndProject.  tf/dl/df/N are exact
    integers; the idf's ``ln`` is the only libm call, absorbed by
    ROUND(…, 6) (same contract as the entropy/lift keys).

    Parallelism (round 9, guide §2.5): the tokenize+explode subtrees
    (the dl pass and the term-filtered tf pass — kept as separate
    concurrent codegen pipelines per the round-9 single-pass negative
    result above) run map-side in the scan task; spreading the skinny
    (doc_id, text) projection first lets both pipelines run at session
    parallelism when the file layout under-splits.  All reductions
    below the spread are integer counts; the one double sum is per-doc
    over ≤|terms| rows under ROUND(…, 6)."""
    from pandasqlite_spark.operators.common import spread_scan

    base = spread_scan(docs.select("doc_id", "text"), "doc_id")
    toks = base.select("doc_id", F.explode(tokens()).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        toks.filter(F.col("tok").isin(*terms))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    corpus = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
    ).crossJoin(F.broadcast(dl.agg(F.sum("dl").alias("sum_dl"))))
    nd = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl").cast("double") / nd
    idf = F.log(
        F.lit(1.0)
        + (nd - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tfd = F.col("tf").cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
    )
    term_score = idf * ((tfd * F.lit(k1 + 1.0)) / (tfd + norm))
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(top)
    )


def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_scores(load(spark, sf_dir, "documents"))


QUERIES = {
    "corpus-quantile-normalize": q_corpus_quantile_normalize,
    "pipeline-compose": q_pipeline_compose,
    "text-bm25": q_text_bm25,
    "text-chunk-overlap": q_text_chunk_overlap,
    "text-tokenize": q_text_tokenize,
    "text-langid": q_text_langid,
    "text-quality-score": q_text_quality,
    "text-fingerprint": q_text_fingerprint,
    "text-bigram-freq": q_text_bigram_freq,
    "text-bigram-lm-score": q_text_bigram_lm,
    "text-readability-score": q_text_readability,
    "text-code-detect": q_text_code_detect,
    "text-hashing-vectorizer": q_text_hashing_vectorizer,
    "text-naive-bayes": q_text_naive_bayes,
    "text-zipf-fit": q_text_zipf_fit,
    "text-langid-confusion": q_text_langid_confusion,
    "text-length-histogram": q_text_length_histogram,
    "text-repetition": q_text_repetition,
    "text-rare-token-ratio": q_text_rare_token_ratio,
    "text-tfidf": q_text_tfidf,
    "text-vocab-encode": q_text_vocab_encode,
    "text-pii-redact": q_text_pii_redact,
    "corpus-token-budget": q_corpus_token_budget,
    "corpus-length-quantiles": q_corpus_length_quantiles,
}

_TOKS = r"string_split_regex(trim(lower(text)), '\s+')"

_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)

_SPLICED = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or 555-010-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)

ORACLES = {
    "corpus-quantile-normalize": """
        WITH d AS (SELECT doc_id, source, n_chars AS x FROM documents),
        ranked AS (
          SELECT doc_id, source, x,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY x, doc_id) AS r,
                 COUNT(*) OVER (PARTITION BY source) AS n_g,
                 COUNT(*) OVER () AS n_all
          FROM d),
        g_ranks AS (
          SELECT ROW_NUMBER() OVER (ORDER BY x, doc_id) AS target, x AS norm_x
          FROM d),
        t AS (
          SELECT doc_id, source, x,
                 CASE WHEN n_g = 1 THEN 1 + (n_all - 1) // 2
                      ELSE 1 + ((r - 1) * (n_all - 1)) // (n_g - 1) END AS target
          FROM ranked)
        SELECT t.doc_id, t.source, t.x, g.norm_x
        FROM t JOIN g_ranks g USING (target)
        ORDER BY t.doc_id
    """,

    "text-langid-confusion": f"""
        WITH pred AS (
          SELECT lang AS actual,
                 CASE WHEN len(list_filter({_TOKS}, x -> x IN {_SW_SQL}))
                           / CAST(len({_TOKS}) AS DOUBLE) >= 0.08
                      THEN 'en' ELSE 'other' END AS predicted
          FROM documents),
        cells AS (
          SELECT actual, predicted, COUNT(*) AS n
          FROM pred GROUP BY 1, 2),
        rt AS (SELECT actual, SUM(n) AS t FROM cells GROUP BY actual)
        SELECT c.actual, c.predicted, c.n,
               ROUND(c.n / CAST(rt.t AS DOUBLE), 6) AS rate
        FROM cells c JOIN rt USING (actual)
        ORDER BY c.actual, c.predicted
    """,
    "text-zipf-fit": f"""
        WITH freq AS (
          SELECT tok, COUNT(*) AS n
          FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
          GROUP BY tok),
        ranked AS (
          SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS DOUBLE)) AS x,
                 ln(CAST(n AS DOUBLE)) AS y
          FROM freq),
        g AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS k,
                 SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx
          FROM ranked)
        SELECT CAST(k AS BIGINT) AS vocab_size,
               ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS zipf_slope,
               ROUND((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx) / k, 6)
                 AS intercept
        FROM g
    """,
    "text-naive-bayes": f"""
        WITH toks AS (
          SELECT doc_id, source, unnest({_TOKS}) AS tok FROM documents),
        vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM toks),
        ct AS (SELECT source AS cls, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        tot AS (SELECT source AS cls, COUNT(*) AS t FROM toks GROUP BY 1),
        pri AS (
          SELECT source AS cls,
                 ln(COUNT(*) / (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents))
                   AS log_prior
          FROM documents GROUP BY 1),
        pairs AS (
          SELECT t.doc_id, t.tok, t.source AS actual, tot.cls, tot.t
          FROM toks t CROSS JOIN tot),
        ll AS (
          SELECT p.doc_id, p.actual, p.cls,
                 ROUND(SUM(ln((COALESCE(ct.c, 0) + 1)
                              / (p.t + 1.0 * v.v))), 6) AS loglik
          FROM pairs p
          LEFT JOIN ct ON ct.cls = p.cls AND ct.tok = p.tok, vocab v
          GROUP BY 1, 2, 3),
        sc AS (
          SELECT ll.doc_id, ll.actual, ll.cls,
                 ROUND(ll.loglik + pri.log_prior, 6) AS score
          FROM ll JOIN pri USING (cls))
        SELECT doc_id, cls AS predicted, cls = actual AS match_actual
        FROM (
          SELECT doc_id, actual, cls, score,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, cls) AS rn
          FROM sc)
        WHERE rn = 1 ORDER BY doc_id
    """,
    "text-hashing-vectorizer": f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
        SELECT doc_id,
               CAST(('0x' || substr(md5(tok), 1, 4))::BIGINT % 32 AS INTEGER)
                 AS slot,
               COUNT(*) AS n
        FROM toks
        GROUP BY doc_id, slot
        ORDER BY doc_id, slot
    """,
    "text-code-detect": f"""
        SELECT doc_id,
               ROUND(LEAST(1.0,
                 (CAST(len(regexp_extract_all(text, '[{{}}\\[\\]();=<>]')) AS DOUBLE)
                    / len(text)) * 10
                 + (CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                    / len(text)) * 2
                 + CAST(len(regexp_extract_all(text, '[a-z]+_[a-z_]+')) AS DOUBLE)
                    / len({_TOKS})), 6) AS code_score
        FROM documents WHERE len(text) > 0
    """,
    "text-readability-score": f"""
        SELECT doc_id,
               ROUND(206.835
                     - 1.015 * CAST(len({_TOKS}) AS DOUBLE)
                       / GREATEST(1, len(regexp_extract_all(text, '[.!?]+')))
                     - 84.6 * CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
                       / len({_TOKS}), 6) AS flesch
        FROM documents WHERE len({_TOKS}) > 0
    """,
    "text-bigram-lm-score": f"""
        WITH d AS (
          SELECT doc_id, {_TOKS} AS t FROM documents
          WHERE len({_TOKS}) >= 2),
        x AS (
          SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM d),
        big AS (
          SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM x),
        c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
        c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1)
        SELECT doc_id,
               ROUND(AVG(ln(CAST(c12 AS DOUBLE) / c1)), 6) AS avg_logp,
               COUNT(*) AS n_bigrams
        FROM big JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
        GROUP BY doc_id
    """,
    "text-vocab-encode": f"""
        WITH toks AS (
          SELECT doc_id, u.tok, u.pos
          FROM documents,
               LATERAL (SELECT unnest({_TOKS}) AS tok,
                               generate_subscripts({_TOKS}, 1) AS pos) u
          WHERE u.tok <> ''),
        vocab AS (
          SELECT tok,
                 row_number() OVER (ORDER BY count(*) DESC, tok) AS tid
          FROM toks GROUP BY tok QUALIFY tid <= 512)
        SELECT t.doc_id,
               list(CAST(COALESCE(v.tid, 0) AS INTEGER) ORDER BY t.pos)
                 AS token_ids
        FROM toks t LEFT JOIN vocab v USING (tok)
        GROUP BY t.doc_id
    """,
    "text-chunk-overlap": f"""
        WITH d AS (
          SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS nt
          FROM documents),
        x AS (
          SELECT doc_id, toks, nt,
                 unnest(range(0, CAST(ceil(nt / 48.0) AS INTEGER))) AS chunk_idx
          FROM d WHERE nt > 0)
        SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
               array_to_string(
                 list_slice(toks, chunk_idx * 48 + 1, chunk_idx * 48 + 64),
                 ' ') AS chunk_text,
               CAST(LEAST(64, nt - chunk_idx * 48) AS INTEGER) AS n_chunk_tokens
        FROM x ORDER BY doc_id, chunk_idx
    """,
    "text-pii-redact": f"""
        SELECT doc_id,
               regexp_replace(
                 regexp_replace({_SPLICED},
                                '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}',
                                '[EMAIL]', 'g'),
                 '\\d{{3}}-\\d{{3}}-\\d{{4}}', '[PHONE]', 'g') AS redacted
        FROM documents
    """,
    "corpus-token-budget": f"""
        SELECT lang, source, COUNT(*) AS n_docs,
               CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens,
               CAST(SUM(len(regexp_extract_all(lower(text),
                    '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS BIGINT) AS total_pieces
        FROM documents GROUP BY lang, source
    """,
    "corpus-length-quantiles": """
        SELECT lang, COUNT(*) AS n_docs,
               ROUND(quantile_cont(n_chars, 0.5), 6) AS p50,
               ROUND(quantile_cont(n_chars, 0.9), 6) AS p90,
               ROUND(quantile_cont(n_chars, 0.99), 6) AS p99
        FROM documents GROUP BY lang
    """,
    "text-repetition": f"""
        SELECT doc_id,
               ROUND(1.0 - CAST(len(list_distinct({_TOKS})) AS DOUBLE)
                     / len({_TOKS}), 9) AS rep_ratio
        FROM documents WHERE len({_TOKS}) > 0
    """,
    "text-rare-token-ratio": f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
        freq AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
        frequent AS (SELECT tok FROM freq WHERE n > 5),
        per_doc AS (
          SELECT t.doc_id, COUNT(*) AS n_frequent
          FROM toks t JOIN frequent f ON t.tok = f.tok
          GROUP BY t.doc_id),
        totals AS (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
                   FROM documents)
        SELECT totals.doc_id, n_tokens,
               n_tokens - COALESCE(n_frequent, 0) AS n_rare,
               CAST(n_tokens - COALESCE(n_frequent, 0) AS DOUBLE) / n_tokens
                 AS rare_ratio
        FROM totals LEFT JOIN per_doc ON totals.doc_id = per_doc.doc_id
    """,
    "text-bm25": f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
        tf AS (
          SELECT doc_id, tok, COUNT(*) AS tf FROM toks
          WHERE tok IN ('spark', 'window') GROUP BY 1, 2),
        dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        corpus AS (
          SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                 (SELECT SUM(dl) FROM dl) AS sum_dl)
        SELECT tf.doc_id,
               ROUND(SUM(
                 ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                          / (CAST(df AS DOUBLE) + 0.5))
                 * ((CAST(tf AS DOUBLE) * 2.2)
                    / (CAST(tf AS DOUBLE)
                       + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
                                / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
               ), 6) AS bm25
        FROM tf
        JOIN dfreq USING (tok)
        JOIN dl USING (doc_id), corpus
        GROUP BY tf.doc_id
        ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
    "text-tfidf": f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        s AS (
          SELECT tf.doc_id, tf.tok,
                 CAST(tf.tf AS DOUBLE)
                   * (CAST(n.n_docs + 1 AS DOUBLE) / CAST(dfreq.df + 1 AS DOUBLE))
                   AS tf_idf
          FROM tf JOIN dfreq USING (tok), n),
        r AS (
          SELECT doc_id, tok, tf_idf,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY tf_idf DESC, tok) AS rn
          FROM s)
        SELECT doc_id, tok, tf_idf FROM r WHERE rn <= 3
    """,
    "text-bigram-freq": f"""
        WITH t AS (SELECT {_TOKS} AS t FROM documents WHERE len({_TOKS}) >= 2),
        bg AS (
          SELECT unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS bigram
          FROM t)
        SELECT bigram, COUNT(*) AS n FROM bg
        GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
    """,
    "text-length-histogram": f"""
        SELECT CAST(len({_TOKS}) // 20 * 20 AS INTEGER) AS bucket_lo,
               COUNT(*) AS n_docs
        FROM documents GROUP BY 1
    """,
    "pipeline-compose": f"""
        WITH scored AS (
          SELECT doc_id, text,
                 CASE WHEN CAST(len(list_filter({_TOKS}, x -> x IN {_SW_SQL}))
                           AS DOUBLE) / len({_TOKS}) >= 0.08
                      THEN 'en' ELSE 'other' END AS lang_guess,
                 ROUND(0.4 * LEAST(1.0, CAST(len({_TOKS}) AS DOUBLE) / 100.0)
                     + 0.3 * (CAST(len(list_distinct({_TOKS})) AS DOUBLE)
                              / CAST(len({_TOKS}) AS DOUBLE))
                     + 0.3 * (CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                                   AS DOUBLE) / length(text)), 9) AS quality,
                 CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
                 md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fp
          FROM documents),
        kept AS (
          SELECT *, {_NORM} AS norm FROM scored
          WHERE lang_guess = 'en' AND quality > 0.55),
        deduped AS (
          SELECT doc_id, n_tokens, quality, fp,
                 ROW_NUMBER() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
          FROM kept)
        SELECT doc_id, n_tokens, quality, fp FROM deduped WHERE rn = 1
    """,
    "text-tokenize": f"""
        SELECT doc_id,
               CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
                    AS INTEGER) AS n_pieces,
               CAST(length(text) AS INTEGER) AS n_chars_live
        FROM documents
    """,
    "text-langid": f"""
        SELECT doc_id,
               ROUND(CAST(len(list_filter({_TOKS}, x -> x IN {_SW_SQL})) AS DOUBLE)
                     / len({_TOKS}), 9) AS sw_ratio,
               CASE WHEN CAST(len(list_filter({_TOKS}, x -> x IN {_SW_SQL})) AS DOUBLE)
                         / len({_TOKS}) >= 0.08
                    THEN 'en' ELSE 'other' END AS lang_guess
        FROM documents
    """,
    "text-quality-score": f"""
        SELECT doc_id,
               ROUND(0.4 * LEAST(1.0, CAST(len({_TOKS}) AS DOUBLE) / 100.0)
                   + 0.3 * (CAST(len(list_distinct({_TOKS})) AS DOUBLE)
                            / CAST(len({_TOKS}) AS DOUBLE))
                   + 0.3 * (CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                                 AS DOUBLE) / length(text)), 9) AS quality
        FROM documents
    """,
    "text-fingerprint": f"""
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fp
        FROM documents
    """,
}


# ---------------------------------------------------------------------------
# BPE merge derivation — the pair-counting core of tokenizer training
# ---------------------------------------------------------------------------

BPE_MERGES = 3


def bpe_merges(
    docs: DataFrame, n_merges: int = BPE_MERGES, _plan_probe: list | None = None
) -> DataFrame:
    """Derive the first ``n_merges`` BPE merge rules from the corpus:
    start from character symbols, repeatedly count adjacent symbol
    pairs weighted by word frequency, and merge the most frequent pair
    (ties → lexicographic).  This is the distributed pair-counting loop
    at the heart of tokenizer training; ``n_merges`` here is the
    operator contract, production runs raise it.

    Scale shape: each round is one explode → partial-aggregated pair
    groupBy over the word-frequency table (|vocab| rows — the corpus
    collapses to distinct words FIRST, so round cost is bound by
    vocabulary, not corpus size); only the 1-row argmax is collected
    per round (the k-means/MMR per-round pull).  Pair application uses
    leftmost non-overlapping ``replace`` applied twice — deterministic
    and identical in both engines (documented approximation of
    textbook run-pairing for degenerate ``aaa…`` runs).  Counts are
    integers, symbols are strings: nothing floating reaches the hash."""
    words = (
        docs.select(F.explode(tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seq = F.concat(F.lit(" "), F.regexp_replace("word", "(.)", "$1 "))
    w = words.select(seq.alias("seq"), "freq")
    w.cache()
    out: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        syms = w.select(F.split(F.trim("seq"), " ").alias("l"), "freq").filter(
            F.size("l") >= 2
        )
        pair = F.expr(
            "transform(sequence(1, size(l)-1),"
            " i -> struct(element_at(l, i) AS a, element_at(l, i+1) AS b))"
        )
        top = (
            syms.select(F.explode(pair).alias("p"), "freq")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0].a, top[0].b, top[0].cnt
        out.append((step, a, b, a + b, cnt))
        pat, rep = f" {a} {b} ", f" {a}{b} "
        w = w.select(
            F.replace(F.replace(F.col("seq"), F.lit(pat), F.lit(rep)),
                      F.lit(pat), F.lit(rep)).alias("seq"),
            "freq",
        # per-round lineage truncation: without it the plan nests one
        # replace-on-replace layer per merge and analysis cost grows
        # with n_merges (same device as kmeans_lloyd/connected comps)
        ).localCheckpoint(eager=False)
        if _plan_probe is not None:
            _plan_probe.append(len(w._jdf.queryExecution().analyzed().toString().splitlines()))
    return docs.sparkSession.createDataFrame(
        out, "step int, left_sym string, right_sym string, merged string, cnt bigint"
    )


def q_text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_merges(load(spark, sf_dir, "documents"))


QUERIES["text-bpe-merges"] = q_text_bpe_merges


def _bpe_oracle(n_merges: int = BPE_MERGES) -> str:
    """Unrolled pair-count/merge rounds mirroring :func:`bpe_merges`:
    w{i} is the symbolized vocabulary after i merges, m{i} the i-th
    selected pair (argmax of frequency-weighted adjacent-pair counts,
    lexicographic tie-break), applied with the same double ``replace``."""
    ctes = [
        """w0 AS (
          SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq,
                 COUNT(*) AS freq
          FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
                FROM documents)
          GROUP BY 1)"""
    ]
    for i in range(1, n_merges + 1):
        p = i - 1
        ctes.append(
            f"""pc{i} AS (
              SELECT l[i] AS a, l[i+1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
              FROM (SELECT string_split(trim(seq), ' ') AS l,
                           unnest(range(1, len(string_split(trim(seq), ' ')))) AS i,
                           freq
                    FROM w{p}) s
              GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""m{i} AS (
              SELECT a, b, a || b AS merged, cnt FROM pc{i}
              ORDER BY cnt DESC, a, b LIMIT 1)"""
        )
        ctes.append(
            f"""w{i} AS (
              SELECT replace(replace(seq, ' ' || a || ' ' || b || ' ',
                                          ' ' || a || b || ' '),
                             ' ' || a || ' ' || b || ' ',
                             ' ' || a || b || ' ') AS seq, freq
              FROM w{p}, m{i})"""
        )
    final = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS INTEGER) AS step, a AS left_sym, b AS right_sym,"
        f" merged, cnt FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    cte_block = ",\n    ".join(ctes)
    return f"""
    WITH {cte_block}
    {final}
    ORDER BY step
"""


ORACLES["text-bpe-merges"] = _bpe_oracle()


KN_DISCOUNT = 0.75
KN_TOP = 20


def kneser_ney_bigrams(docs: DataFrame, d: float = KN_DISCOUNT, top: int = KN_TOP) -> DataFrame:
    """Kneser-Ney smoothed bigram probabilities for the corpus's
    ``top`` most frequent bigrams — the modern LM smoothing that backs
    off to CONTINUATION counts ("how many contexts does w₂ complete?")
    instead of raw unigram frequency:

        P_KN(w₂|w₁) = max(c₁₂−d, 0)/c₁ + (d·N₁₊(w₁·)/c₁) · N₁₊(·w₂)/D

    (N₁₊(w₁·) = distinct continuations of w₁, N₁₊(·w₂) = distinct
    contexts of w₂, D = distinct bigram types).  Shown next to the MLE
    ratio so the smoothing effect is visible per row.

    Scale shape: bigram extraction is row-local (``transform``, no
    explode-then-window); ONE partial-aggregated groupBy collapses the
    corpus to the vocabulary²-bounded bigram table, and every N₁₊ /
    total is a further aggregate OF THAT TABLE — corpus rows never
    shuffle twice.  Every quantity is an exact integer; each output
    probability is one fixed IEEE expression per row (no float
    aggregation), so the table is engine-exact."""
    t = docs.select("doc_id", tokens().alias("t")).filter(F.size("t") >= 2)
    big = t.select(
        F.explode(
            F.expr("transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))")
        ).alias("b")
    ).select("b.w1", "b.w2")
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n_fwd")
    )
    n_bwd = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n_bwd"))
    dd = c12.agg(F.count(F.lit(1)).alias("d_types"))
    p_mle = F.col("c12").cast("double") / F.col("c1")
    p_kn = (
        (F.greatest(F.col("c12").cast("double") - F.lit(d), F.lit(0.0)) / F.col("c1"))
        + ((F.lit(d) * F.col("n_fwd")) / F.col("c1"))
        * (F.col("n_bwd").cast("double") / F.col("d_types"))
    )
    return (
        c12.join(c1, "w1")
        .join(F.broadcast(n_bwd), "w2")
        .crossJoin(F.broadcast(dd))
        .select(
            "w1", "w2", "c12", "c1", "n_fwd", "n_bwd",
            F.round(p_mle, 6).alias("p_mle"),
            F.round(p_kn, 6).alias("p_kn"),
        )
        .orderBy(F.col("c12").desc(), "w1", "w2")
        .limit(top)
    )


def q_text_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kneser_ney_bigrams(load(spark, sf_dir, "documents"))


QUERIES["text-kneser-ney-lm"] = q_text_kneser_ney

ORACLES["text-kneser-ney-lm"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    big AS (
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks WHERE len(t) >= 2) s),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY 1, 2),
    c1 AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1, COUNT(*) AS n_fwd
      FROM c12 GROUP BY 1),
    nb AS (SELECT w2, COUNT(*) AS n_bwd FROM c12 GROUP BY 1),
    dd AS (SELECT COUNT(*) AS d_types FROM c12)
    SELECT c12.w1, c12.w2, c12.c12, c1.c1, c1.n_fwd, nb.n_bwd,
           ROUND(CAST(c12.c12 AS DOUBLE) / c1.c1, 6) AS p_mle,
           ROUND((GREATEST(CAST(c12.c12 AS DOUBLE) - {KN_DISCOUNT}, 0.0) / c1.c1)
                 + (({KN_DISCOUNT} * c1.n_fwd) / c1.c1)
                 * (CAST(nb.n_bwd AS DOUBLE) / dd.d_types), 6) AS p_kn
    FROM c12 JOIN c1 USING (w1) JOIN nb USING (w2), dd
    ORDER BY c12.c12 DESC, c12.w1, c12.w2 LIMIT {KN_TOP}
"""


TTR_WIN = 50
TTR_STRIDE = 25


def windowed_ttr(docs: DataFrame, win: int = TTR_WIN, stride: int = TTR_STRIDE) -> DataFrame:
    """Windowed type-token ratio (MATTR-style lexical diversity): TTR
    over overlapping ``win``-token windows, emitted per window — the
    length-robust diversity signal (global TTR shrinks with document
    length; windowing removes that bias).  Low-diversity windows flag
    boilerplate/repetition locally, complementing the doc-level
    ``text-repetition`` mass.

    Entirely row-local (``transform`` + ``slice`` + ``array_distinct``
    inside codegen — no explode-shuffle, no UDF), so it costs one scan
    at any corpus size; counts are integers and the per-window ratio is
    one division."""
    t = docs.select("doc_id", tokens().alias("toks")).filter(F.size("toks") >= 1)
    wins = t.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(toks) - 1, {stride}),"
                f" st -> named_struct('st', st, 'w', slice(toks, st + 1, {win})))"
            )
        ).alias("r"),
    )
    return wins.select(
        "doc_id",
        (F.col("r.st") / stride).cast("int").alias("win_idx"),
        F.size("r.w").alias("n_tokens"),
        F.size(F.array_distinct("r.w")).alias("n_distinct"),
        F.round(
            F.size(F.array_distinct("r.w")).cast("double") / F.size("r.w"), 6
        ).alias("ttr"),
    ).orderBy("doc_id", "win_idx")


def q_text_windowed_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windowed_ttr(load(spark, sf_dir, "documents"))


QUERIES["text-windowed-ttr"] = q_text_windowed_ttr

ORACLES["text-windowed-ttr"] = f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
      WHERE len({_TOKS}) >= 1),
    wins AS (
      SELECT doc_id, st, toks[st + 1 : st + {TTR_WIN}] AS w
      FROM (SELECT doc_id, toks, unnest(range(0, len(toks), {TTR_STRIDE})) AS st
            FROM t) s)
    SELECT doc_id,
           CAST(st // {TTR_STRIDE} AS INTEGER) AS win_idx,
           CAST(len(w) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(w)) AS INTEGER) AS n_distinct,
           ROUND(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6) AS ttr
    FROM wins ORDER BY doc_id, win_idx
"""


LOGODDS_ALPHA0 = 100.0  # total Dirichlet prior mass
LOGODDS_TOP = 15


def log_odds_terms(docs: DataFrame, top: int = LOGODDS_TOP) -> DataFrame:
    """Monroe et al. "fightin' words": which terms distinguish source
    src0 from src1, via log-odds-ratios with an informative Dirichlet
    prior drawn from the whole corpus — the statistically-sound version
    of "compare the top word lists" (raw frequency differences drown in
    common words; the prior regularizes rare ones).  Emits the ``top``
    src0-leaning terms by z-score.

    Scale shape: ONE explode → (term, source) conditional count groupBy
    collapses the corpus to the vocabulary; the prior, δ and variance
    are fixed IEEE expressions per vocabulary row (integer inputs), so
    scores — and the z ordering — are engine-identical."""
    toks = docs.filter(F.col("source").isin("src0", "src1")).select(
        "source", F.explode(tokens()).alias("tok")
    )
    counts = toks.groupBy("tok").agg(
        F.count(F.when(F.col("source") == "src0", 1)).alias("c1"),
        F.count(F.when(F.col("source") == "src1", 1)).alias("c2"),
    )
    tot = counts.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1") + F.col("c2")).alias("ftot"),
    )
    j = counts.crossJoin(F.broadcast(tot))
    f = F.col("c1") + F.col("c2")
    prior = (F.lit(LOGODDS_ALPHA0) * f.cast("double")) / F.col("ftot")
    a0 = F.lit(LOGODDS_ALPHA0)
    t1 = F.log(
        (F.col("c1") + prior)
        / (F.col("n1").cast("double") + a0 - F.col("c1") - prior)
    )
    t2 = F.log(
        (F.col("c2") + prior)
        / (F.col("n2").cast("double") + a0 - F.col("c2") - prior)
    )
    var = 1.0 / (F.col("c1") + prior) + 1.0 / (F.col("c2") + prior)
    z = (t1 - t2) / F.sqrt(var)
    return (
        j.select(
            "tok", "c1", "c2",
            F.round(t1 - t2, 6).alias("delta"),
            F.round(z, 6).alias("z"),
        )
        .orderBy(F.col("z").desc(), "tok")
        .limit(top)
    )


def q_text_log_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    return log_odds_terms(load(spark, sf_dir, "documents"))


QUERIES["text-log-odds-terms"] = q_text_log_odds

ORACLES["text-log-odds-terms"] = f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS}) AS tok FROM documents
      WHERE source IN ('src0', 'src1')),
    counts AS (
      SELECT tok,
             COUNT(CASE WHEN source = 'src0' THEN 1 END) AS c1,
             COUNT(CASE WHEN source = 'src1' THEN 1 END) AS c2
      FROM toks GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
             CAST(SUM(c1 + c2) AS BIGINT) AS ftot
      FROM counts),
    s AS (
      SELECT tok, c1, c2,
             ln((c1 + ({LOGODDS_ALPHA0} * CAST(c1 + c2 AS DOUBLE)) / ftot)
                / (CAST(n1 AS DOUBLE) + {LOGODDS_ALPHA0} - c1
                   - ({LOGODDS_ALPHA0} * CAST(c1 + c2 AS DOUBLE)) / ftot))
             - ln((c2 + ({LOGODDS_ALPHA0} * CAST(c1 + c2 AS DOUBLE)) / ftot)
                  / (CAST(n2 AS DOUBLE) + {LOGODDS_ALPHA0} - c2
                     - ({LOGODDS_ALPHA0} * CAST(c1 + c2 AS DOUBLE)) / ftot)) AS delta,
             1.0 / (c1 + ({LOGODDS_ALPHA0} * CAST(c1 + c2 AS DOUBLE)) / ftot)
             + 1.0 / (c2 + ({LOGODDS_ALPHA0} * CAST(c1 + c2 AS DOUBLE)) / ftot) AS var
      FROM counts, tot)
    SELECT tok, c1, c2, ROUND(delta, 6) AS delta,
           ROUND(delta / sqrt(var), 6) AS z
    FROM s
    -- rank on the ROUNDED z (like the engine side): the raw doubles
    -- can differ in the last ulp between engines, flipping tok ties
    ORDER BY z DESC, tok LIMIT {LOGODDS_TOP}
"""


RAKE_N_STOP = 5
RAKE_TOP = 15


def rake_keyphrases(docs: DataFrame, top: int = RAKE_TOP) -> DataFrame:
    """RAKE keyphrase extraction: token streams split at STOPWORDS into
    candidate phrases; member words scored by ``degree/frequency``
    (degree = co-occurrence mass inside phrases) and phrases ranked by
    an exact aggregate ratio ``Σdegree / Σfrequency`` — tf-idf surfaces
    WORDS, RAKE surfaces multi-word PHRASES.  Stopwords here are the
    corpus's 5 most frequent tokens (corpus-derived, deterministic; a
    real deployment passes a language stoplist).

    Determinism: the standard per-word-ratio sum is float-order
    sensitive, so this uses the aggregate-ratio form — both numerator
    and denominator are exact integer sums, ONE division per phrase.
    Scale shape: stopwords are a 5-row broadcast; phrase segmentation
    is one per-doc window (stop-count prefix sums as phrase ids);
    scoring is two vocabulary-bounded groupBys."""
    toks = docs.select(
        "doc_id", F.posexplode(tokens()).alias("pos", "tok")
    )
    stop = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(RAKE_N_STOP)
        .select("tok", F.lit(True).alias("is_stop"))
    )
    marked = toks.join(F.broadcast(stop), "tok", "left").select(
        "doc_id", "pos", "tok", F.coalesce("is_stop", F.lit(False)).alias("is_stop")
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    phrased = marked.withColumn(
        "phrase_id", F.sum(F.col("is_stop").cast("int")).over(w)
    ).filter(~F.col("is_stop"))
    # collect_list order is NOT contractual in Spark — sort by pos inside
    # the aggregate so phrase text is order-deterministic under any
    # repartitioning between the window and this groupBy.
    phrases = phrased.groupBy("doc_id", "phrase_id").agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(pos, tok))), r -> r.tok)"),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    # word stats over phrase members: freq = occurrences, degree = Σ plen
    members = phrased.join(phrases, ["doc_id", "phrase_id"]).select("tok", "plen")
    wstat = members.groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
    )
    scored = (
        phrased.join(F.broadcast(wstat), "tok")
        .groupBy("doc_id", "phrase_id")
        .agg(F.sum("deg").alias("sdeg"), F.sum("freq").alias("sfreq"))
        .join(phrases, ["doc_id", "phrase_id"])
        .filter(F.col("plen") >= 2)
    )
    return (
        scored.select(
            "phrase",
            "plen",
            F.round(F.col("sdeg").cast("double") / F.col("sfreq"), 6).alias("score"),
        )
        .groupBy("phrase", "plen", "score")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("score").desc(), "phrase")
        .limit(top)
    )


def q_text_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rake_keyphrases(load(spark, sf_dir, "documents"))


QUERIES["text-rake-keyphrases"] = q_text_rake

ORACLES["text-rake-keyphrases"] = f"""
    WITH toks AS (
      SELECT doc_id, i AS pos, tk[i] AS tok
      FROM (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i
            FROM (SELECT doc_id, {_TOKS} AS tk FROM documents) d0) d),
    stop AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS n FROM toks GROUP BY 1
        ORDER BY n DESC, tok LIMIT {RAKE_N_STOP})),
    marked AS (
      SELECT doc_id, pos, tok, tok IN (SELECT tok FROM stop) AS is_stop
      FROM toks),
    phrased AS (
      SELECT doc_id, pos, tok, phrase_id FROM (
        SELECT doc_id, pos, tok, is_stop,
               SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
                 PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING)
                 AS phrase_id
        FROM marked) m
      WHERE NOT is_stop),
    phrases AS (
      SELECT doc_id, phrase_id,
             string_agg(tok, ' ' ORDER BY pos) AS phrase,
             COUNT(*) AS plen
      FROM phrased GROUP BY 1, 2),
    wstat AS (
      SELECT p.tok, COUNT(*) AS freq, CAST(SUM(ph.plen) AS BIGINT) AS deg
      FROM phrased p JOIN phrases ph USING (doc_id, phrase_id)
      GROUP BY 1),
    scored AS (
      SELECT p.doc_id, p.phrase_id,
             CAST(SUM(w.deg) AS BIGINT) AS sdeg,
             CAST(SUM(w.freq) AS BIGINT) AS sfreq
      FROM phrased p JOIN wstat w USING (tok)
      GROUP BY 1, 2)
    SELECT ph.phrase, ph.plen,
           ROUND(CAST(s.sdeg AS DOUBLE) / s.sfreq, 6) AS score,
           COUNT(*) AS n_occurrences
    FROM scored s JOIN phrases ph USING (doc_id, phrase_id)
    WHERE ph.plen >= 2
    GROUP BY ph.phrase, ph.plen, ROUND(CAST(s.sdeg AS DOUBLE) / s.sfreq, 6)
    ORDER BY score DESC, phrase LIMIT {RAKE_TOP}
"""


def hapax_ratio(docs: DataFrame) -> DataFrame:
    """Per-source hapax-legomena share: the fraction of each source's
    vocabulary that occurs exactly once in that source — the lexical
    long-tail health signature that pairs with `text-zipf-fit` (a
    natural corpus sits near 0.4–0.6; templated/synthetic text
    collapses the tail, near-zero; OCR noise inflates it).

    Whitespace tokens (the repo-wide canonical tokenizer) explode
    row-locally; the only shuffles are the (source, token) frequency
    groupBy and the |vocab|-bounded source rollup — both map-side
    combinable, and nothing downstream of the collapse ever touches
    corpus rows again.  Ratio = one double division over exact longs.
    """
    toks = docs.select("source", F.explode(tokens()).alias("tok"))
    freq = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n"))
    return (
        freq.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("vocab"),
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("hapax"),
        )
        .select(
            "source",
            "vocab",
            "hapax",
            F.round(F.col("hapax").cast("double") / F.col("vocab"), 6).alias(
                "hapax_ratio"
            ),
        )
        .orderBy("source")
    )


def q_text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hapax_ratio(load(spark, sf_dir, "documents"))


QUERIES["text-hapax-ratio"] = q_text_hapax_ratio

ORACLES["text-hapax-ratio"] = f"""
    WITH freq AS (
      SELECT source, tok, COUNT(*) AS n
      FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
      GROUP BY 1, 2)
    SELECT source, COUNT(*) AS vocab,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS hapax_ratio
    FROM freq GROUP BY source ORDER BY source
"""
