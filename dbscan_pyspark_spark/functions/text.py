"""Text-analysis column expressions (north-star extensions, SURVEY.md §2.10).

Everything here is a pure ``pyspark.sql.functions`` composition (JVM-side,
codegen-friendly) designed to be re-expressible in ANSI SQL for the DuckDB
oracle: tokenization, n-gram shingles, quality stats, fingerprinting, and
an n-gram/stopword language-ID heuristic. No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small function-word profile per language. The scoring is a plain
# count-of-profile-hits ratio — deterministic and SQL-expressible.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization: ``split(trim(text), '\\s+')``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_tokens(text: Column | str) -> Column:
    """A BPE-ish regex segmentation: word pieces, numbers, punctuation
    runs — the common pre-tokenizer shape (letters+ | digits+ | other)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"), 0)


def normalized(text: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics to single spaces, trim —
    the canonical form used for fingerprints and exact near-dup.

    Implemented as split-on-junk-runs + array_join, NOT the textbook
    double ``regexp_replace``: the output is character-identical
    (runs of non-alphanumerics become one separator, edge runs
    vanish, NULL stays NULL — ``array_join``, not ``concat_ws``,
    precisely so NULL propagates), but in this Spark 4.1 build
    ``RegExpReplace`` / ``RLike`` execute CHARACTER-CLASS patterns
    ~50x slower than ``StringSplit`` / ``RegExpExtractAll`` run the
    equivalent class: measured 119 s vs 2.6 s for one normalization
    pass over 2M 420-char docs on local[32]. Isolated A/B: a literal
    pattern through regexp_replace is fast (0.9 s at 2M), the same
    data through the class pattern is 113 s, and the identical class
    through split/extract_all is 2-6 s — so it is the
    replace/rlike-side class-pattern execution, not regex per se,
    pattern recompilation, or data volume. The DuckDB oracles keep
    the regexp_replace spelling — equivalence is pinned by every
    normalized-text contract query's value hash. Known cross-ENGINE
    edge (pre-existing, unrelated to this rewrite — the old Spark
    spelling produced the identical output): Spark's lower() maps
    U+0130 'İ' to 'i' + combining dot (junk -> split point) where
    DuckDB's maps it to plain 'i'; exotic Unicode case mappings
    differ between JVMs and other engines, so the canonical form is
    only cross-engine-stable for ASCII-cased text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.array_join(
        F.filter(
            F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != F.lit("")
        ),
        " ",
    )


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized(text))


def shingles_from_tokens(toks: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles from a *materialized* token-array column.

    ``toks`` must be a bound column, not an expression: Spark does no
    common-subexpression elimination inside higher-order-function
    lambdas, so an expression there would be re-evaluated once per
    array element (measured 10x slowdown on the documents table).
    """
    toks = F.col(toks) if isinstance(toks, str) else toks
    k = F.size(toks) - (n - 1)
    # guard: sequence(1,0) would DESCEND ([1,0]) and ANSI element_at
    # throws on out-of-range — short texts get an empty shingle set
    return F.when(
        k >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles of the normalized text, as strings.

    Convenience form over an inline expression — fine for one-off use,
    but hot paths should materialize the token column and call
    :func:`shingles_from_tokens` (see note there).
    """
    return shingles_from_tokens(F.split(normalized(text), " "), n)


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(sw)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Heuristic [0,1] quality: length band + mean token length band +
    low punctuation density. Deterministic arithmetic only."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    n_toks = token_count(c)
    mean_tok = F.when(n_toks > 0, n_chars / n_toks).otherwise(F.lit(0.0))
    # length minus total kept-run length == count of chars outside the
    # class; RegExpExtractAll sidesteps RegExpReplace's measured 50x
    # class-pattern execution cost (see normalized())
    punct = F.length(c) - F.length(
        F.array_join(
            F.regexp_extract_all(c, F.lit("[a-zA-Z0-9 ]+"), 0), ""
        )
    )
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    len_band = F.when((n_chars >= 100) & (n_chars <= 2000), 1.0).when(
        n_chars >= 30, 0.5
    ).otherwise(0.0)
    tok_band = F.when((mean_tok >= 3.0) & (mean_tok <= 12.0), 1.0).otherwise(0.5)
    return F.round((len_band + tok_band + (1.0 - punct_ratio)) / 3.0, 4)


def lang_scores(text: Column | str) -> Column:
    """Map of language -> profile-hit count over the token set."""
    toks = tokens(text)
    pairs = [
        F.struct(
            F.lit(lang).alias("lang"),
            F.size(F.filter(toks, lambda t: F.lower(t).isin(words))).alias("hits"),
        )
        for lang, words in LANG_PROFILES.items()
    ]
    return F.array(*pairs)


def lang_id(text: Column | str, default: str = "und") -> Column:
    """argmax language by profile hits; ties to alphabetical lang;
    'und' when no profile word occurs at all."""
    scores = lang_scores(text)
    best = F.array_min(
        F.transform(scores, lambda s: F.struct((-s["hits"]).alias("neg"), s["lang"].alias("lang")))
    )
    total = F.aggregate(scores, F.lit(0), lambda acc, s: acc + s["hits"])
    return F.when(total > 0, best["lang"]).otherwise(F.lit(default))


def repetition_ratio(toks: Column | str, n: int = 3) -> Column:
    """Intra-document repeated-n-gram ratio (a Gopher-style quality
    signal): ``1 - distinct_ngrams/total_ngrams``, 0.0 for documents
    too short to form an n-gram. Pure array expressions over the bound
    token column — no explode, no shuffle: a projection."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    # shingles_from_tokens is already distinct; the raw n-gram count
    # comes from the token count directly
    total = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    n_distinct = F.size(shingles_from_tokens(toks, n))
    return F.when(
        total <= 0, F.lit(0.0)
    ).otherwise(1.0 - n_distinct / total)


def redactions(text: Column | str, pattern: str) -> Column:
    """Struct(redacted string, n_redactions int): every regex match
    replaced with ``[REDACTED]`` plus the match count — the scrubbing
    primitive (PII patterns, secrets) a training pipeline runs before
    anything else sees the text. Built-in regexp expressions only."""
    c = F.col(text) if isinstance(text, str) else text
    # split-on-pattern + rejoin == regexp_replace with a constant
    # replacement (Java split keeps leading/trailing empties at
    # edge matches, so boundaries reassemble exactly), minus
    # RegExpReplace's measured 50x class-pattern execution cost (see
    # normalized()). Constraint: `pattern` must not match the empty
    # string (PII patterns are non-empty-match by construction).
    return F.struct(
        F.array_join(F.split(c, pattern, -1), "[REDACTED]").alias(
            "redacted"
        ),
        F.size(F.regexp_extract_all(c, F.lit(pattern), 0)).alias(
            "n_redactions"
        ),
    )


def strip_html(text: Column | str) -> Column:
    """Struct(clean_text string, n_tags int): markup tags removed and
    the five core named character entities decoded — the first-pass
    HTML cleanup a web-crawl curation pipeline runs before any quality
    or dedup stage sees the text.

    Tag removal is split-on-pattern + rejoin (the ``redactions``
    discipline: RegExpReplace executes class patterns ~50x slower than
    StringSplit runs the same class — BASELINE.md round-8 A/B); the
    pattern ``</?[A-Za-z!][^<>]*>`` drops well-formed element tags,
    comments, and doctypes while leaving unbalanced or non-markup
    angle brackets alone: a tag must open with a letter (or ``!``) as
    real HTML requires, so ``a < b`` and ``< e >`` stay content, and
    excluding ``<`` INSIDE the tag body stops a stray ``<`` from
    swallowing everything up to the next real tag's ``>``. Entity decoding
    is a chain of LITERAL ``replace`` calls — pure JVM StringReplace —
    in the one order that cannot double-decode: ``&amp;`` last, so
    ``&amp;lt;`` correctly yields the literal text ``&lt;``. Numeric
    entities (``&#NNN;``) are NOT decoded — that needs a codepoint
    constructor Spark SQL lacks JVM-side; documents needing it go
    through the Arrow unicode stage. Fully ANSI-SQL-expressible
    (DuckDB: ``regexp_replace(..., 'g')`` + the same replace chain),
    so the ``doc_html_strip`` contract query is hash-exact."""
    c = F.col(text) if isinstance(text, str) else text
    tag = r"</?[A-Za-z!][^<>]*>"
    untagged = F.array_join(F.split(c, tag, -1), "")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        untagged = F.replace(untagged, F.lit(ent), F.lit(ch))
    return F.struct(
        untagged.alias("clean_text"),
        F.size(F.regexp_extract_all(c, F.lit(tag), 0)).alias("n_tags"),
    )


# http(s) URL shape: optional userinfo (no spaces/slashes before the
# @), host of word/dot/dash chars, optional :port, optional path up to
# whitespace, an angle bracket, or a quote. The pattern text is
# engine-parity-hardened: quote characters appear only as \x22/\x27
# escapes (so the IDENTICAL string embeds in a single-quoted SQL
# literal) and whitespace is the EXPLICIT Java \s set — spelled out
# because RE2's \s lacks vertical tab (\x0B), the one character where
# the shorthands disagree. Java regex (Spark) and RE2 (DuckDB) then
# extract identical spans — the hash-exact oracle requirement.
_WS = r" \t\n\x0B\f\r"
URL_PATTERN = (
    r"https?://(?:[^" + _WS + r"<>@/\x22\x27]*@)?[\w.\-]+(?::\d+)?"
    r"(?:/[^" + _WS + r"<>\x22\x27]*)?"
)
_HOST_PATTERN = r"https?://(?:[^" + _WS + r"<>@/\x22\x27]*@)?([\w.\-]+)"


def extract_urls(text: Column | str) -> Column:
    """All http(s) URLs in document order (array<string>) — JVM-side
    ``regexp_extract_all``, the crawl-curation primitive feeding
    domain frequency, blocklists, and link-graph stages."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(URL_PATTERN), 0)


def url_host(url: Column | str) -> Column:
    """Lowercased host of an http(s) URL: the authority minus
    userinfo and port. Empty string for non-URL input (regexp_extract
    semantics — same in DuckDB)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(c, _HOST_PATTERN, 1))


def url_registrable_domain(url: Column | str) -> Column:
    """Last-two-label domain of the URL's host ('sub.example.com' ->
    'example.com') — the public-suffix-list-free heuristic that is
    exact for generic TLDs; a PSL join refines ccTLDs when one is
    available. Empty for hosts with fewer than two labels."""
    return F.regexp_extract(url_host(url), r"([\w\-]+\.[\w\-]+)$", 1)
