"""Text analysis for training-data pipelines — all JVM built-ins.

* language-ID      — marker-stopword n-gram heuristic (regexp_count
                     votes per language, argmax via greatest-struct)
* quality scoring  — length / punctuation / stopword-ratio features
* token counting   — whitespace words + BPE-ish subword regex
* fingerprinting   — md5 of whitespace-normalized text + a 64-bit
                     content hash (xxhash64) for cheap equality joins

Every expression is a deterministic SQL-expressible function so the
DuckDB oracle can replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# marker words per language (tiny, deterministic heuristic — the kind
# of n-gram table a real langid model compresses)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "los", "es", "de"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "that", "for"]

WORD_RE = r"[a-zA-Z0-9]+"
SUBTOKEN_RE = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"


def _marker_count(text_col: str, words: list[str]) -> F.Column:
    # \b only for ASCII-word markers: Java's \b uses \w=[A-Za-z0-9_],
    # so a boundary NEVER matches adjacent to CJK characters — with it,
    # the zh markers scored 0 on every Chinese document and the argmax
    # fell through to 'en'. Unsegmented scripts count plain substring
    # occurrences (the standard heuristic — there are no word
    # boundaries to anchor to).
    if all(w.isascii() for w in words):
        pat = r"\b(" + "|".join(words) + r")\b"
    else:
        pat = "(" + "|".join(words) + ")"
    return F.regexp_count(F.lower(F.col(text_col)), F.lit(pat))


def lang_scores(text_col: str = "text") -> list[F.Column]:
    return [
        _marker_count(text_col, ws).alias(f"score_{lang}")
        for lang, ws in LANG_MARKERS.items()
    ]


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """argmax over marker-vote scores; deterministic tiebreak by the
    fixed language order (en, de, fr, es, zh)."""
    scored = docs.select(F.col(id_col), *lang_scores(text_col))
    # greatest(struct(score, -order)) picks max score, earliest lang on tie
    langs = list(LANG_MARKERS)
    best = F.greatest(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("s"),
                F.lit(len(langs) - i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    return scored.select(
        id_col,
        best["lang"].alias("pred_lang"),
        best["s"].cast("long").alias("pred_score"),
    )


def quality_features(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword-ratio features + a composite
    quality score in [0,1]."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = F.regexp_count(t, F.lit(WORD_RE))
    n_punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    n_stop = _marker_count(text_col, STOPWORDS)
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    mean_word_len = F.when(n_words > 0, (n_chars - n_words + 1) / n_words
                           ).otherwise(F.lit(0.0))
    length_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    # no rounding anywhere: the expression tree is pure IEEE double
    # arithmetic, so identical inputs give bit-identical outputs across
    # engines (rounding half-way semantics differ between engines)
    quality = (
        0.4 * length_score
        + 0.3 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.3 * (1 - F.least(punct_ratio * 10, F.lit(1.0)))
    )
    return docs.select(
        id_col,
        n_chars.cast("long").alias("n_chars_text"),
        n_words.cast("long").alias("n_words"),
        n_punct.cast("long").alias("n_punct"),
        n_stop.cast("long").alias("n_stopwords"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        quality.alias("quality_score"),
    )


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    t = F.col(text_col)
    # filter the empty token: split('', '\s+') returns [''] (size 1),
    # so an empty/whitespace-only doc would report n_words=1 and slip
    # past length gates keyed on n_words >= 1 — the same filter every
    # other tokenizer in this module applies
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != "")
    return docs.select(
        id_col,
        F.size(words).cast("long").alias("n_words"),
        F.regexp_count(t, F.lit(SUBTOKEN_RE)).cast("long").alias("n_subtokens"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return docs.select(
        id_col,
        F.md5(norm).alias("fingerprint"),
        F.xxhash64(norm).alias("fingerprint64"),
        F.length(norm).cast("long").alias("norm_len"),
    )


def repetition_features(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Repetition-based quality signals (the word-level core of the
    Gopher rules — Rae et al. 2021, arXiv:2112.11446 §A1.1: repeated
    content is the strongest low-quality indicator at web scale):

    * ``distinct_word_frac``  — |distinct words| / |words|
    * ``top_2gram`` / ``top_2gram_frac`` — the most frequent word
      2-gram (ties: lexicographically smallest) and its share of all
      2-gram occurrences

    Two explode+aggregate passes, all JVM built-ins; the SQL oracle
    replays them expression-for-expression."""
    from pyspark.sql import Window as W

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )
    base = docs.select(F.col(id_col).alias("_id"), toks.alias("_t"))

    words = (
        base.select("_id", F.explode("_t").alias("_w"))
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_words"),
            F.countDistinct("_w").alias("n_distinct_words"),
        )
    )

    grams = base.select(
        "_id",
        F.explode(
            F.when(
                F.size("_t") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - 1),
                    lambda i: F.concat_ws(" ", F.slice(F.col("_t"), i, 2)),
                ),
            ).otherwise(F.array())
        ).alias("_g"),
    )
    gcnt = grams.groupBy("_id", "_g").agg(F.count("*").alias("_c"))
    w = W.partitionBy("_id").orderBy(F.desc("_c"), F.asc("_g"))
    top = (
        gcnt.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "_id", F.col("_g").alias("top_2gram"),
            F.col("_c").alias("_topc"),
        )
    )
    totals = gcnt.groupBy("_id").agg(F.sum("_c").alias("_n2"))

    # join back FROM the doc base: a zero-token document must still
    # emit a row (n_words=0, null frac) — every other per-doc feature
    # operator here preserves all docs, and an inner-join consumer
    # would silently lose the empties otherwise
    return (
        base.select("_id")
        .join(words, "_id", "left")
        .join(top, "_id", "left").join(totals, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_words"), F.lit(0)).cast("long")
            .alias("n_words"),
            (F.col("n_distinct_words").cast("double") / F.col("n_words"))
            .alias("distinct_word_frac"),
            F.coalesce(F.col("top_2gram"), F.lit("")).alias("top_2gram"),
            F.coalesce(
                F.col("_topc").cast("double") / F.col("_n2"), F.lit(0.0)
            ).alias("top_2gram_frac"),
        )
    )


def tfidf_topk(docs: DataFrame, k: int = 3, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document top-k terms by TF-IDF — the keyword-extraction /
    salient-term primitive of corpus analysis pipelines.

    Scoring is deliberately transcendental-free:

        score = (tf / doc_len) · ((N + 1) / (df + 1))

    — two IEEE divisions and one multiply, each correctly rounded on
    every engine, so the RANKING (not just the rounded score) is
    bit-identical between Spark and the SQL oracle. A log-idf variant
    would hinge on ulp-level libm agreement for near-ties.

    Scale shape: one explode + (doc, term) hash aggregation, then two
    narrow window passes (doc_len over doc, df over term) and a final
    per-doc top-k window — every shuffle carries only (doc_id, term,
    tf). N (corpus size) is a broadcast scalar. Ties: score desc, term
    asc."""
    from pyspark.sql import Window as W

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )
    tf = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    n = docs.select(F.count("*").cast("double").alias("_n"))
    scored = (
        tf.withColumn("dl", F.sum("tf").over(W.partitionBy("doc_id")))
        .withColumn("df", F.count("*").over(W.partitionBy("term")))
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            (F.col("tf").cast("double") / F.col("dl").cast("double"))
            * ((F.col("_n") + F.lit(1.0))
               / (F.col("df").cast("double") + F.lit(1.0))),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id", "term", F.round("score", 9).alias("score"), "rank"
        )
    )


# conservative, engine-portable PII patterns: no lookaround, no \b
# dialect traps — the same pattern strings compile identically under
# Java regex (Spark) and RE2/PCRE-style engines (DuckDB oracle)
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}"),
    ("phone", r"\+?[0-9][0-9()\-. ]{7,}[0-9]"),
)


def redact_pii(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """PII redaction — the scrub pass every released training corpus
    runs: emails, IPv4 addresses, and phone-like digit runs replaced by
    typed placeholders (``<EMAIL>`` …), plus per-doc match counts for
    audit. Pure ``regexp_replace``/``regexp_count`` built-ins (JVM,
    whole-stage codegen); patterns avoid lookaround so the SQL oracle
    replays them verbatim. Order matters (emails first: their local
    parts can contain digit runs a later pattern would mangle) and is
    pinned by PII_PATTERNS."""
    out = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(
            F.regexp_count(out, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return docs.select(
        id_col, *counts, out.alias("clean_text"),
    )


def pack_chunks(docs: DataFrame, k: int = 64, stride: int | None = None,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Sequence packing: split each document into ≤``k``-token chunks
    with ``stride`` (default k → disjoint; < k → overlapping windows) —
    the context-window chunking pass of an LLM training pipeline.

    JVM-side: tokenize once, build chunk start positions with
    ``sequence``, slice per start, explode. Output one row per chunk
    (doc_id, chunk_idx, n_tokens, chunk_text); the final short chunk is
    kept (training pipelines pad it). Chunk starts are 1-based token
    positions 1, 1+stride, … up to the last start that begins a new
    chunk (a start past the end would duplicate the tail)."""
    stride = int(stride if stride is not None else k)
    if stride <= 0 or k <= 0:
        raise ValueError("k and stride must be positive")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
    n = F.size("_t")
    # starts: 1, 1+stride, ... while start <= max(n-?, 1). Keep at least
    # one chunk for empty/short docs; never start past the end.
    last_start = F.greatest(
        ((F.ceil((n - F.lit(k)).cast("double") / F.lit(stride)))
         .cast("long") * F.lit(stride) + 1),
        F.lit(1),
    )
    # clamp: a start must have at least one NEW token (start <= n) and
    # cover the tail exactly once
    last_start = F.least(last_start, F.greatest(n, F.lit(1)))
    starts = F.sequence(F.lit(1).cast("long"), last_start,
                        F.lit(stride).cast("long"))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            ((s - 1) / stride).cast("int").alias("chunk_idx"),
            F.slice(F.col("_t"), s, k).alias("ctoks"),
        ),
    )
    exploded = base.select(
        "doc_id", F.explode(chunks).alias("_c")
    ).select(
        "doc_id",
        F.col("_c.chunk_idx").alias("chunk_idx"),
        F.size("_c.ctoks").cast("long").alias("n_tokens"),
        F.concat_ws(" ", F.col("_c.ctoks")).alias("chunk_text"),
    )
    return exploded


# ---------------------------------------------------------------------------
# HTML → text extraction (the input_hint per-row invariant)
# ---------------------------------------------------------------------------

def render_html(docs: DataFrame, text_col: str = "text",
                out_col: str = "html") -> DataFrame:
    """Deterministic text → page-HTML construction (the inverse fixture
    for :func:`extract_text`): entity-escape the body and wrap it with
    head/style/script/comment chrome. Used by tests and the
    ``doc_extract_text`` contract to synthesize a Common-Crawl-shaped
    ``html BINARY`` column from a known-good text column, so the
    extraction invariant (byte-identical text per row — input_hint) is
    checkable against an oracle that never runs the extractor."""
    esc = F.col(text_col)
    esc = F.regexp_replace(esc, r"&", "&amp;")
    esc = F.regexp_replace(esc, r"<", "&lt;")
    esc = F.regexp_replace(esc, r">", "&gt;")
    page = F.concat(
        F.lit("<html><head><title>d</title><style>body{margin:0}</style>"
              "<script>var n=1&&2;</script></head>\n<body><!-- crawl -->"),
        esc,
        F.lit("</body></html>"),
    )
    return docs.withColumn(out_col, F.encode(page, "UTF-8"))


def extract_text(pages: DataFrame, html_col: str = "html",
                 out_col: str = "text_extracted") -> DataFrame:
    """Main-content text extraction from the ``html BINARY`` column of
    the Common-Crawl-style pages table (input_hint layout) — the
    per-row invariant of the north rule is that this extraction is
    byte-identical per url, so the operator must be deterministic and
    entity-exact, not best-effort.

    Pure JVM ``regexp_replace`` chain (no Python in the path, scans
    stay columnar):

      1. drop ``<script>``/``<style>`` blocks (content is code, not text)
      2. drop HTML comments
      3. drop every remaining tag
      4. decode the five predefined XML entities (&lt; &gt; &quot;
         &#39; then &amp; LAST — the standard unescape order, so
         double-escaped input survives round-trips)

    The regex subset is shared with DuckDB's RE2 (``(?s)`` inline flag,
    non-greedy ``.*?``, no lookaround), so an oracle can replay it —
    but the contract query grades the stronger fact instead: extracted
    text hashes equal the hashes of the ORIGINAL text column the page
    was rendered from (the oracle never runs this chain).

    Reference analogue: decompress(compress(x)) bit-exactness
    (mtscomp tests.py round-trip family) — here the "codec" is
    render/extract over the page payload instead of the sample matrix.
    """
    t = F.decode(F.col(html_col), "UTF-8")
    # main content = the <body> element (head chrome — title, style,
    # script, meta — is never page text); pages without a body tag
    # (fragments) fall through whole
    body_re = r"(?is).*<body[^>]*>(.*?)</body>.*"
    t = F.when(
        t.rlike(r"(?is)<body[^>]*>"), F.regexp_replace(t, body_re, "$1")
    ).otherwise(t)
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", "")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", "")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", "")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", "")
    t = F.regexp_replace(t, r"&lt;", "<")
    t = F.regexp_replace(t, r"&gt;", ">")
    t = F.regexp_replace(t, r"&quot;", "\"")
    t = F.regexp_replace(t, r"&#39;", "'")
    t = F.regexp_replace(t, r"&amp;", "&")
    return pages.withColumn(out_col, t)


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
    shard_size: int = 4096,
) -> DataFrame:
    """Sharded inverted index: term → posting-list shards of
    ``(doc_id, tf)`` structs, each sorted by doc id.

    The web-scale hazard of a naive ``groupBy(term).collect_list`` is
    the stopword row: one term present in 10¹¹ documents would demand
    a single 10¹¹-element array in one task. Postings are therefore
    SHARDED (the Lucene-segment layout): each term's df (a partial-
    aggregated count) fixes ``n_shards = ceil(df / shard_size)``, a
    posting lands in shard ``doc_id % n_shards``, and the per-(term,
    shard) array is bounded to ~``shard_size`` elements regardless of
    term heat — hot terms just span more rows. ``max_df`` drops
    corpus-stopwords outright (the standard index-time cut);
    ``min_df`` drops hapax noise. Everything is deterministic JVM
    built-ins: tf/df partial aggregations, one join of the tiny term
    table back onto postings (AQE broadcasts it when small), and an
    in-kernel ``array_sort`` per bounded shard.

    Returns ``(term, df, shard, n_in_shard, postings)`` with
    ``postings: array<struct<doc_id:long, tf:long>>``.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )
    tf = (
        docs.select(F.col(id_col).alias("_id"),
                    F.explode(toks).alias("term"))
        .groupBy("term", "_id")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    dfreq = dfreq.filter(F.col("df") >= min_df)
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    n_shards = F.ceil(F.col("df") / shard_size).cast("long")
    sharded = (
        tf.join(dfreq.select("term", "df", n_shards.alias("_ns")), "term")
        .select(
            "term", "df",
            (F.col("_id") % F.col("_ns")).cast("long").alias("shard"),
            "_id", "tf",
        )
    )
    return (
        sharded.groupBy("term", "df", "shard")
        .agg(
            F.count("*").cast("long").alias("n_in_shard"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_id").cast("long").alias("doc_id"),
                        F.col("tf").cast("long").alias("tf"),
                    )
                )
            ).alias("postings"),
        )
    )


# ---------------------------------------------------------------------------
# n-gram language-model coverage scoring (CCNet-style quality signal)
# ---------------------------------------------------------------------------


def _bigrams(text_col: str) -> F.Column:
    """Token bigrams as 'w1 w2' strings — the corpus tokenizer
    (lower/trim/split, empty tokens dropped) zipped against itself at
    offset 1, all JVM array built-ins."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def train_bigram_lm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    train_pct: int = 80,
    train_filter: F.Column | None = None,
) -> DataFrame:
    """Bigram language model counts from a deterministic hash split of
    the corpus — the mergeable core of the CCNet/KenLM-style quality
    filter (Wenzek et al. 2020: docs scored by an n-gram LM trained on
    reference text; here the reference split is carved from the corpus
    itself by the hash_split rule so both engines rebuild it exactly).

    Returns (bigram, c_bigram, c_head): occurrence counts of each
    bigram and of its HEAD word as-a-bigram-head (Σ c_bigram over w1 —
    a same-key window over the aggregate, no second tokenize pass), so
    P(w2|w1) = c_bigram / c_head derives at read time. Counts are
    exact longs and ADD across corpus shards — train incrementally
    like the rollup tiers.

    Scale shape: explode → one partial-aggregated groupBy(bigram)
    (map-side combine collapses the heavy head before the shuffle) +
    one head-key window. The model is a table, not a driver object —
    never collected.
    """
    from pyspark.sql import Window as W

    if not 0 < int(train_pct) <= 100:
        raise ValueError(f"train_pct must be in (0,100]: {train_pct}")
    if train_filter is not None:
        # caller-supplied split predicate (e.g. an engine-portable
        # modulus rule for cross-engine-replayable contracts); the
        # xxhash64 bucket below is the production default
        train = docs.where(train_filter)
    else:
        bucket = F.pmod(
            F.xxhash64(F.col(id_col), F.lit(int(seed)).cast("long")),
            F.lit(100),
        )
        train = docs.where(bucket < int(train_pct))
    bg = train.select(F.explode(_bigrams(text_col)).alias("bigram"))
    counts = bg.groupBy("bigram").agg(
        F.count("*").cast("long").alias("c_bigram")
    )
    head = F.substring_index(F.col("bigram"), " ", 1)
    w = W.partitionBy(head)
    return counts.select(
        "bigram", "c_bigram",
        F.sum("c_bigram").over(w).cast("long").alias("c_head"),
    )


def lm_coverage_score(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against a bigram LM: per doc,

    * ``n_pairs``  — bigrams in the document (long)
    * ``n_hits``   — bigrams found in the model (long)
    * ``sum_c_bigram`` / ``sum_c_head`` — Σ model counts over hit
      pairs (long; familiar mass ≈ how 'reference-like' the text is)
    * ``ll_score`` — Σ log(c_bigram/c_head), the log-likelihood
      under the LM (double, transcendental — for ranking/filtering
      ONLY, never for a hashed contract projection; the four exact
      longs above are the graded quantities)

    Out-of-vocabulary pairs contribute to ``n_pairs`` alone — the OOV
    rate (1 − n_hits/n_pairs) is the CCNet "unknown mass" signal.
    Docs with no bigram (≤1 token) keep n_pairs = 0.

    Scale shape: explode → LEFT join on the bigram key (AQE picks
    broadcast when the model is small, sort-merge on the narrow
    (id, bigram) pairs otherwise — both sides shuffle at most once)
    → one partial-aggregated groupBy(id). Zipf-head bigrams ('of
    the') are hot join keys, but the model side is unique per bigram
    so the join only fans out to the pairs that exist; no all-pairs
    hazard.
    """
    pairs = docs.select(
        F.col(id_col), F.explode_outer(_bigrams(text_col)).alias("bigram")
    )
    j = pairs.join(lm, on="bigram", how="left")
    return j.groupBy(id_col).agg(
        F.count("bigram").cast("long").alias("n_pairs"),
        F.count("c_bigram").cast("long").alias("n_hits"),
        F.coalesce(F.sum("c_bigram"), F.lit(0)).cast("long")
        .alias("sum_c_bigram"),
        F.coalesce(F.sum("c_head"), F.lit(0)).cast("long")
        .alias("sum_c_head"),
        F.sum(
            F.log(F.col("c_bigram").cast("double"))
            - F.log(F.col("c_head").cast("double"))
        ).alias("ll_score"),
    )


def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
    min_count: int = 2,
) -> DataFrame:
    """Paragraph-level exact dedup — the C4 cleaning rule (Raffel et
    al. 2020 §2.2 dedups at sub-document granularity; boilerplate
    paragraphs — cookie banners, nav footers — repeat across MANY
    documents that are nowhere near whole-doc duplicates): split each
    document on ``sep``, md5-key each paragraph, and REMOVE every
    occurrence except the corpus-wide canonical one (smallest
    (doc_id, position)) of any paragraph repeating ``min_count``+
    times. Documents reassemble from their surviving paragraphs in
    original order; a document can come back empty (fully
    boilerplate).

    Returns (id, text, n_paragraphs, n_dropped) with the cleaned
    text. Deterministic: canonical selection is a min over
    (doc_id, pos), no hash order involved.

    Scale shape: posexplode → (key → canonical) from ONE partial-
    aggregated groupBy over (md5, min struct), a left join back on
    the 16-byte key (narrow — paragraphs ride the shuffle once for
    grouping, once for reassembly), and a per-doc sort_array over
    POSITIONS (bounded by paragraphs-per-doc, not corpus size).
    """
    import re as _re

    # F.split takes a REGEX: escape the literal separator (an
    # unescaped ". " would split on any-char-plus-space), while
    # array_join below reassembles with the literal form
    parts = F.split(F.col(text_col), _re.escape(sep))
    ex = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(parts).alias("_pos", "_p"),
    )
    keyed = ex.select(
        "_id", "_pos", "_p", F.unhex(F.md5("_p")).alias("_w")
    )
    stats = keyed.groupBy("_w").agg(
        F.count("*").alias("_c"),
        F.min(F.struct("_id", "_pos")).alias("_canon"),
    )
    survivors = (
        keyed.join(stats, "_w")
        .where(
            (F.col("_c") < int(min_count))
            | ((F.col("_canon._id") == F.col("_id"))
               & (F.col("_canon._pos") == F.col("_pos")))
        )
    )
    rebuilt = survivors.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_p"))),
                lambda s: s["_p"],
            ),
            sep,
        ).alias("text"),
        F.count("*").alias("_kept"),
    )
    totals = docs.select(
        F.col(id_col).alias("_id"),
        F.size(parts).cast("long").alias("n_paragraphs"),
    )
    return (
        totals.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("text", F.lit("")).alias("text"),
            "n_paragraphs",
            (F.col("n_paragraphs") - F.coalesce("_kept", F.lit(0)))
            .cast("long").alias("n_dropped"),
        )
    )
