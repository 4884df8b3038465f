"""Text analysis over the ``documents`` table: tokenization, quality
scoring, language-ID heuristic, fingerprinting.

Every function is a pure JVM-side column expression (whole-stage codegen;
no Python), and each has a matching ANSI-SQL formulation for the DuckDB
oracle (see ``__spark_entry__.oracle_sql``).  The shared cross-engine
64-bit-ish hash is ``h56``: the first 14 hex chars of md5 as a bigint —
identical in Spark (``conv(..,16,10)``) and DuckDB (``('0x'||..)::bigint``).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["tokens", "token_count", "stopword_ratio", "quality_score",
           "lang_guess", "fingerprint", "h56", "STOPWORDS",
           "bigram_nll"]

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(col) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(F.col(col) if isinstance(col, str) else col),
                   r"\s+")


def token_count(col) -> Column:
    return F.size(tokens(col))


# Simplified GPT-2-style pre-tokenizer: contraction suffixes, then
# space-prefixed letter runs / digit runs / punctuation runs.  ASCII-only
# alternatives keep Java-regex (Spark) and RE2 (DuckDB) agreement:
# leftmost-first vs leftmost-longest only diverge when a shorter earlier
# alternative overlaps a longer later one, which these cannot.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^ \ta-zA-Z0-9]+"


def bpe_token_count(col) -> Column:
    """Number of BPE-ish pre-tokens (whitespace runs yield none)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0))


def stopword_ratio(col) -> Column:
    toks = tokens(col)
    stop = F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))
    return F.size(stop) / F.size(toks)


def quality_score(text_col, n_chars_col) -> Column:
    """Length / mean-token-length / stopword components, each clamped to
    [0, 1]; the score is their mean.  Deliberately simple so the oracle
    SQL states the identical formula."""
    ntok = token_count(text_col).cast("double")
    nch = (F.col(n_chars_col) if isinstance(n_chars_col, str)
           else n_chars_col).cast("double")
    len_component = F.least(ntok / F.lit(100.0), F.lit(1.0))
    mean_tok = nch / F.greatest(ntok, F.lit(1.0))
    tok_len_component = F.when((mean_tok >= 3) & (mean_tok <= 10), 1.0) \
        .otherwise(0.5)
    stop_component = F.least(stopword_ratio(text_col) * 4, F.lit(1.0))
    return F.round((len_component + tok_len_component + stop_component) / 3, 4)


def lang_guess(col) -> Column:
    """Script-range heuristic language ID (n-gram-free, SQL-portable)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.when(c.rlike("[一-鿿]"), "zh")
             .when(c.rlike("[぀-ヿ]"), "ja")
             .when(c.rlike("[Ѐ-ӿ]"), "ru")
             .when(c.rlike("[֐-׿]"), "he")
             .when(c.rlike("[؀-ۿ]"), "ar")
             .otherwise("en"))


def fingerprint(col) -> Column:
    """Document fingerprint: md5 of lowercased, whitespace-collapsed text
    (cross-engine identical)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def h56(col_or_expr) -> Column:
    """Cross-engine 56-bit hash (see module docstring)."""
    c = F.col(col_or_expr) if isinstance(col_or_expr, str) else col_or_expr
    return F.conv(F.substring(F.md5(c), 1, 14), 16, 10).cast("bigint")


def bigram_nll(documents):
    """CCNet-style language-model quality scoring: an add-one-smoothed
    BIGRAM LM trained on the corpus itself scores every document by
    average negative log-likelihood — the perplexity signal a
    CCNet/Gopher-style pipeline buckets documents with (high avg_nll =
    unusual/low-quality text relative to the corpus).

    Deterministic and fully engine-side: the bigram context zips
    MAP-SIDE (``arrays_zip(toks, shift(toks))`` before the explode, so
    the token relation needs NO doc-keyed window shuffle — a lag()
    formulation shuffles the exploded corpus by doc_id), the unigram/
    bigram count tables broadcast back onto the tokens (vocab-bounded
    — at open-web scale pre-filter counts to c >= 2 or switch the
    join to shuffle), and the first token of each doc scores against
    the smoothed unigram.  P(cur|prev) = (c2+1)/(c1(prev)+V);
    P(first) = (c1+1)/(N+V).  Output: (doc_id, n_tokens, avg_nll
    rounded to 4 — both engines sum IEEE doubles, so rounding absorbs
    association-order noise)."""
    # the module's shared tokenizer expression (token_stats parity);
    # like every \s+ oracle pair this relies on the corpus carrying
    # no \x0B (Java \s matches it, RE2/DuckDB \s does not)
    toks = tokens(F.lower(F.col("text")))
    prevs = F.concat(F.array(F.lit(None).cast("string")),
                     F.slice(toks, 1, F.greatest(F.size(toks) - 1,
                                                 F.lit(0))))
    tok = (documents.where(F.col("text").isNotNull())
           .select("doc_id",
                   F.explode(F.arrays_zip(toks.alias("cur"),
                                          prevs.alias("prev")))
                    .alias("z"))
           .select("doc_id", F.col("z.cur").alias("cur"),
                   F.col("z.prev").alias("prev")))
    uni = tok.groupBy(F.col("cur").alias("w")) \
             .agg(F.count("*").alias("c1"))
    big = (tok.where(F.col("prev").isNotNull())
           .groupBy(F.col("prev").alias("bp"), F.col("cur").alias("bc"))
           .agg(F.count("*").alias("c2")))
    # n/v derive from the vocab-sized unigram table — re-aggregating
    # the exploded corpus would be a whole extra pass at scale
    consts = uni.agg(F.sum("c1").alias("n"), F.count("*").alias("v"))
    unip = uni.select(F.col("w").alias("wp"), F.col("c1").alias("c1p"))
    t = (tok
         .join(F.broadcast(uni), tok["cur"] == uni["w"])
         .join(F.broadcast(unip), tok["prev"] == unip["wp"], "left")
         .join(F.broadcast(big),
               (tok["prev"] == big["bp"]) & (tok["cur"] == big["bc"]),
               "left")
         .crossJoin(F.broadcast(consts)))
    nll = F.when(
        F.col("prev").isNull(),
        -F.log((F.col("c1") + F.lit(1.0))
               / (F.col("n") + F.col("v")))
    ).otherwise(
        -F.log((F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0))
               / (F.col("c1p") + F.col("v"))))
    return (t.groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.round(F.avg(nll), 4).alias("avg_nll")))
