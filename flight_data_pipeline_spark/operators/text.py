"""Text-analysis operators for training-data pipelines (extension
scope per BASELINE.json: language-ID, quality scoring, token counting,
document fingerprinting).

Everything here is built-in column expressions (split / filter /
transform / md5 / regexp) — JVM-side, whole-stage codegen, no Python
in the hot path. At 100 TB these are embarrassingly parallel
map-side ops: no shuffle at all until a downstream aggregate.
"""

from __future__ import annotations

# compression_ratio's pandas_udf resolves its postponed type hints
# (PEP 563 strings under `from __future__ import annotations`) against
# THIS module's globals, so `pd` must live here, not inside the
# function — but guarded, so every other operator (all pure Column
# expressions) stays importable on a pandas-less driver.
try:
    import pandas as pd
except ImportError:  # pragma: no cover - container always has pandas
    pd = None  # compression_ratio() will fail at use, nothing else
import pyspark.sql.functions as F
from pyspark.sql import Column

# Small English stopword core — used for both quality scoring and the
# stopword-based language heuristic. Deliberately tiny and pinned: the
# oracle SQL must embed the identical set.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# Per-language marker tokens for the stopword-overlap language-ID
# heuristic (n-gram profiles degenerate to token profiles on the
# whitespace-soup fixture corpus; real corpora would use char 3-grams).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("的", "是", "了", "在", "我"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the corpus is space-separated)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Token count — whitespace split size."""
    return F.size(tokens(text))


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def stopword_count(text: Column, stopwords=STOPWORDS) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))


def stopword_ratio(text: Column) -> Column:
    """Stopword fraction of all tokens — a standard quality signal."""
    return stopword_count(text) / token_count(text)


def quality_band(text: Column, min_tokens: int = 10, max_tokens: int = 500,
                 min_stop: float = 0.0, max_stop: float = 0.8) -> Column:
    """Length + stopword-ratio quality gate → 'good' / 'low'. The
    flag-don't-drop discipline (etl_job.py:213-218) applies: callers
    filter on the band only when they choose to."""
    n = token_count(text)
    ratio = stopword_ratio(text)
    ok = n.between(min_tokens, max_tokens) & ratio.between(min_stop, max_stop)
    return F.when(ok, F.lit("good")).otherwise(F.lit("low"))


def bow_fingerprint(text: Column) -> Column:
    """Bag-of-words document fingerprint: md5 of the sorted distinct
    token set. Collides for token-permutation duplicates — the exact-
    dedup key one step coarser than raw-text md5. (Rolling/content-
    defined fingerprints are in dedup.simhash for the hash-family
    variant.)"""
    return F.md5(F.concat_ws(" ", F.array_sort(distinct_tokens(text))))


# Polynomial rolling-hash parameters (Rabin–Karp form). The per-token
# base hash is the first 8 hex digits of md5 — chosen because md5 is
# bit-identical across engines, so the DuckDB oracle can mirror the
# fingerprint exactly (xxhash64 cannot be mirrored).
ROLL_BASE = 31
ROLL_MOD = 1_000_000_007


def token_hash32(t: Column) -> Column:
    """Deterministic 32-bit token hash both engines can compute:
    first 8 hex digits of md5, parsed as an integer."""
    return F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")


def rolling_hash(text: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash
    h = (h·B + hash(token)) mod M over the token SEQUENCE — unlike
    bow_fingerprint, permuted documents get different fingerprints.
    One linear fold per row, no shuffle; intermediate values stay
    < 2^37 so 64-bit arithmetic never overflows."""
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * ROLL_BASE + token_hash32(t)) % ROLL_MOD,
    )


def _ngram_structs(toks: Column, n: int) -> Column:
    """Aligned-shift n-gram positions as an array of n-field structs:
    ``arrays_zip(slice(toks,1,m), slice(toks,2,m), …)`` with
    ``m = size - n + 1`` — every shifted slice has exactly m elements
    so the zip never null-pads. All non-lambda built-ins: stays in
    whole-stage codegen, unlike a ``transform`` lambda over a
    ``sequence`` (higher-order functions are interpreted per element —
    measured 4× slower building the same 250k grams at sf0.1).
    Documents shorter than n yield one struct of the whole document,
    null-padded — via ``F.get`` (0-indexed), which returns null past
    the end under ANSI mode where ``element_at`` would throw
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT — and ``concat_ws`` collapses
    the nulls to the all-tokens gram."""
    m = F.size(toks) - (n - 1)
    return F.when(
        F.size(toks) >= n,
        F.arrays_zip(*[F.slice(toks, k + 1, m).alias(str(k)) for k in range(n)]),
    ).otherwise(F.array(F.struct(
        *[F.get(toks, k).alias(str(k)) for k in range(n)])))


def _gram_text(struct_col: Column, n: int) -> Column:
    return F.concat_ws(" ", *[struct_col[str(k)] for k in range(n)])


def ngrams(text: Column, n: int = 3) -> Column:
    """Token n-gram shingles as a per-row array op — no explode, no
    shuffle. Built on the codegen'd aligned-shift zip; only the final
    string join runs under a (interpreted) transform lambda. Callers
    that explode immediately should use :func:`ngram_explode`, which
    moves that join after the explode and is lambda-free end-to-end."""
    structs = _ngram_structs(tokens(text), n)
    return F.transform(structs, lambda s: _gram_text(s, n))


def ngram_explode(df, text_col: str, n: int, *keep_cols: str,
                  gram_col: str = "g"):
    """``df`` → one row per token n-gram: (keep_cols…, gram string).
    The fast path for every inverted-index consumer (boilerplate,
    decontamination, duplicated-coverage, minhash shingles): the
    gram string is concatenated AFTER the explode, so the whole
    pipeline — split, shifted slices, zip, explode, concat — is
    non-lambda built-ins inside whole-stage codegen (measured 4×
    vs exploding the ``ngrams`` array at sf0.1). Still perfectly
    map-side: no shuffle until the caller aggregates."""
    structs = _ngram_structs(tokens(F.col(text_col)), n)
    return (
        df.select(*keep_cols, F.explode(structs).alias("__gs"))
        .select(*keep_cols, _gram_text(F.col("__gs"), n).alias(gram_col))
    )


def chunk_tokens(text: Column, chunk_size: int = 64,
                 stride: int = 48) -> Column:
    """Split a document into token chunks of ``chunk_size`` starting
    every ``stride`` tokens (stride < chunk_size ⇒ overlapping
    chunks — the context-window preparation step of training-data
    pipelines). Pure per-row array ops (sequence → filter → slice):
    no explode until the caller chooses to, no shuffle, no UDF."""
    toks = tokens(text)
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    return F.transform(
        F.filter(starts, lambda s: s < n),
        lambda s: F.concat_ws(" ", F.slice(toks, s + 1, chunk_size)),
    )


def lang_scores(text: Column) -> Column:
    """Marker-token hit counts per candidate language → map column."""
    toks = distinct_tokens(text)
    return F.map_from_arrays(
        F.array(*[F.lit(lang) for lang in LANG_MARKERS]),
        F.array(*[
            F.size(F.filter(
                toks,
                lambda t: F.array_contains(
                    F.array(*[F.lit(m) for m in LANG_MARKERS[lang]]), t),
            ))
            for lang in LANG_MARKERS
        ]),
    )


def predict_lang(text: Column, default: str = "en") -> Column:
    """Language-ID heuristic: argmax of marker-token hits, ties and
    zero-hit rows → ``default``. One pass over the token array."""
    scores = lang_scores(text)
    entries = F.map_entries(scores)  # array<struct<key,value>>
    best = F.aggregate(
        entries,
        F.struct(F.lit(default).alias("key"), F.lit(0).alias("value")),
        lambda acc, e: F.when(e["value"] > acc["value"], e).otherwise(acc),
    )
    return best["key"]


# BPE-ish pre-tokenization: letter runs, digit runs, and single
# punctuation marks as separate tokens (the shape GPT-2-style
# pre-tokenizers produce before merges). Same regex on both engines.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def regex_tokens(text: Column) -> Column:
    """BPE-ish regex tokenization — letter/digit runs + punctuation
    singletons via regexp_extract_all (codegen'd, no UDF)."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)


def regex_token_count(text: Column) -> Column:
    return F.size(regex_tokens(text))


def punct_ratio(text: Column) -> Column:
    """Punctuation characters per non-space character — a standard
    quality signal (noise/boilerplate detection)."""
    n_punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    n_chars = F.length(F.regexp_replace(text, r"\s", ""))
    return n_punct / F.greatest(n_chars, F.lit(1))


# PII surface patterns (email, dotted-quad IP) and a C4-style token
# blocklist. The patterns are deliberately RE2-compatible so the same
# regex runs on Spark (java.util.regex) and the DuckDB oracle (RE2).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
BLOCKLIST = ("slow", "dup")


def pii_match_count(text: Column, pattern: str) -> Column:
    """Occurrences of a PII pattern — regexp_extract_all(…, 0) so the
    whole match (not a group) is counted; codegen'd, no UDF."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def blocklist_hits(text: Column, blocklist=BLOCKLIST) -> Column:
    """Token-exact blocklist hit count (the C4 badwords rule shape:
    flag documents containing any listed token)."""
    return F.size(F.filter(
        tokens(text), lambda t: t.isin(*blocklist)))


def redact_blocklist(text: Column, blocklist=BLOCKLIST,
                     mask: str = "[REDACTED]") -> Column:
    """Token-exact redaction: rewrite the document with every
    blocklisted token replaced by ``mask`` — the *transform* side of
    the C4 badwords rule (blocklist_hits is the audit side; the
    pipeline policy is flag-don't-drop, so redaction keeps the doc).

    Pure higher-order expression (transform + array_join), fully
    codegen'd map-side work: no UDF, no shuffle, safe inside any scan
    at any scale. Token-exact (not substring) so "duplicate" is never
    mangled by the "dup" entry."""
    masked = F.transform(
        tokens(text),
        lambda t: F.when(t.isin(*blocklist), F.lit(mask)).otherwise(t),
    )
    return F.array_join(masked, " ")


def compression_ratio() -> Column:
    """Deflate compression ratio of the document text — compressed
    bytes / raw bytes. The repetition-and-boilerplate quality signal
    several published curation recipes threshold on (highly
    compressible ⇒ template/repetitive content; near-1 ⇒ high-entropy
    text or noise): it catches long-range repetition that n-gram
    ratios miss.

    This is the one text op that genuinely needs Python (no zlib in
    Spark SQL expressions), so it takes the sanctioned slow path: an
    Arrow-batched pandas_udf — per-BATCH Python invocation over
    columnar buffers, never per-row plan interpretation (SURVEY.md
    §2.11). zlib level pinned at 6; deflate output is deterministic
    for a fixed level, so the column is stable across runs and
    executors. NULL text → NULL."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(one)

    return _ratio


def compression_ratio_col(text: Column) -> Column:
    """Apply compression_ratio() to a text column."""
    return compression_ratio()(text)


CLF_SCALE = 1000  # integer weight domain [-CLF_SCALE, CLF_SCALE]


def classifier_weight_sum(text: Column) -> Column:
    """Hashed-linear classifier features for one document as a struct
    ``(w_sum BIGINT, n_feat BIGINT)``: each distinct token's weight is
    md5-derived in integer space [-1000, 1000] (the hashing trick with
    an engine-neutral hash), summed EXACTLY — so accept/confidence
    decisions are integer comparisons that can never flip on float
    association. Shared by the batch checked query
    (plans/text_queries.quality_classifier_scores) and the streaming
    gate (stateless expression — identical under readStream), so the
    two can never diverge. Map-side only; md5/conv are codegen'd."""
    toks = distinct_tokens(text)
    w = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10)
        .cast("long") % 2001 - CLF_SCALE,
    )
    return F.struct(
        F.aggregate(w, F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("w_sum"),
        F.size(toks).cast("long").alias("n_feat"),
    )


def classifier_sigmoid(w_sum: Column, n_feat: Column) -> Column:
    """Mean-weight sigmoid score in (0, 1) from the exact integer
    feature sums — the only floating step of the classifier."""
    return 1.0 / (1.0 + F.exp(-(w_sum / (F.lit(CLF_SCALE) * n_feat))))


HASHING_TF_DIM = 1024


def hashing_tf(df, text_col: str, *keep_cols: str,
               dim: int = HASHING_TF_DIM):
    """Hashing-trick term-frequency features (the HashingTF
    vectorizer) in SPARSE RELATION form: one (keep_cols…, idx, tf)
    row per non-zero feature, idx = md5(token) mod dim — no
    vocabulary table, no fit step, memory O(non-zeros). md5 (not
    xxhash64) keeps the feature space reconstructible in any engine,
    so downstream checksums hash-check cross-engine. The relation
    form is the representation that scales: a dense array<double>
    per doc is dim×rows cells regardless of sparsity, while this is
    exactly the non-zeros and feeds joins/aggregations directly
    (classifier dot products become relation joins on idx)."""
    toks = df.select(
        *keep_cols,
        F.explode(F.split(F.col(text_col), " ")).alias("__t"),
    ).where(F.length("__t") > 0)
    idx = (
        F.conv(F.substring(F.md5(F.col("__t")), 1, 8), 16, 10)
        .cast("long") % dim
    )
    return (
        toks.select(*keep_cols, idx.alias("idx"))
        .groupBy(*keep_cols, "idx")
        .agg(F.count("*").alias("tf"))
    )


def bm25_term_score_micro(tf: Column, dl: Column, df_: Column,
                          n: Column, s: Column,
                          k1: float = 1.2, b: float = 0.75) -> Column:
    """One BM25 term contribution in integer MICRO-UNITS — the exact
    expression tree shared by the batch scorer
    (plans/text_queries.bm25_doc_scores) and the incremental-index
    consumer (streaming/pipeline_stream.bm25_topk_from_index), so
    "batch recompute" and "stream-maintained index" scores are equal
    BY CONSTRUCTION. Inputs are exact integers (tf, doc length,
    document frequency, corpus doc count, corpus token count); every
    float op is IEEE correctly-rounded on identical operands, and the
    floor-to-micro-units happens per (doc, term) BEFORE any sum, so
    downstream addition is association-free BIGINT arithmetic."""
    idf = F.log(F.lit(1.0) + (n - df_ + F.lit(0.5)) / (df_ + F.lit(0.5)))
    score = (idf * (tf * F.lit(k1 + 1.0))
             / (tf + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b)
                   * (dl / (s.cast("double") / n)))))
    return F.floor(score * F.lit(10 ** 6) + F.lit(0.5)).cast("long")
