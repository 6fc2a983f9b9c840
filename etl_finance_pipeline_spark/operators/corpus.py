"""Corpus preparation operators: document chunking, PII redaction,
deterministic stratified sampling.

Charter extensions (training-data pipeline; no reference counterpart —
the reference stops at OHLCV candles). All three are pure column
expressions: JVM-side, whole-stage-codegen, zero shuffles except where
noted, and each has an exact DuckDB oracle.

Scale notes:
 * chunk_documents is explode-based — output rows ≈ corpus_chars /
   stride. The explode preserves the input partitioning (no shuffle);
   downstream per-chunk work (embedding, tokenizing) starts co-located
   with its document.
 * redact_pii is a regexp_replace chain — one projection, no shuffle.
 * stratified_sample keeps a row iff hash(key) mod 1e6 < frac×1e6 —
   deterministic across runs/executors/engines (unlike ``rand()``
   sampling, which cannot be oracle-checked or reproduced), stable
   under re-partitioning, and composable: the same key always lands in
   the same side, so samples drawn at different times agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_finance_pipeline_spark.functions.scalar import portable_hash64

#: (pattern, replacement) — RE2/Java-regex-compatible PII patterns.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}", "[PHONE]"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
]

_SAMPLE_SCALE = 1_000_000


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 500,
    overlap: int = 100,
) -> DataFrame:
    """Split each document into fixed-width character chunks with
    *overlap* (the standard pre-embedding window): chunk i covers
    ``[1 + i·stride, 1 + i·stride + chunk_chars)`` (1-based),
    stride = chunk_chars − overlap. Every document yields ≥ 1 chunk;
    the last chunk may be short.

    Output: (id, chunk_id, chunk_start, chunk_text). Explode of a
    ``sequence`` — narrow, no shuffle, partitioning preserved.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    stride = chunk_chars - overlap
    n = F.length(F.col(text_col))
    # number of chunks: ceil(max(n - overlap, 1) / stride) via int math
    num = F.greatest(
        (n - F.lit(overlap) + F.lit(stride - 1)).cast("long") / F.lit(stride),
        F.lit(1),
    ).cast("long")
    out = df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), num - 1)).alias("chunk_id"),
        F.col(text_col),
    )
    start = (F.col("chunk_id") * stride + 1).cast("int")
    return out.select(
        id_col,
        "chunk_id",
        start.alias("chunk_start"),
        F.substring(F.col(text_col), start, chunk_chars).alias("chunk_text"),
    )


def luhn_card_audit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Credit-card PII audit with CHECKSUM validation — the split
    every real scrubber makes: a regex finds card-SHAPED tokens
    (13–19 digits, optional dash grouping), the Luhn mod-10 checksum
    decides which are actual card numbers (a 16-digit order id fails
    it 90% of the time, so redacting candidates alone destroys data
    for nothing). Per-token digit fold in pure expressions — one
    exchange-free codegen projection, no UDF; the DuckDB twin folds
    the identical arithmetic.

    Output: (id, cc_candidates, cc_valid, has_valid_card).
    """
    from etl_finance_pipeline_spark.functions.text import tokens

    cands = F.filter(
        F.transform(tokens(text_col), lambda w: F.translate(w, "-", "")),
        lambda c: c.rlike("^[0-9]{13,19}$"),
    )

    def luhn_ok(c: Column) -> Column:
        n = F.length(c)

        def term(acc: Column, i: Column) -> Column:
            d = c.substr(n - i + 1, F.lit(1)).cast("int")
            dbl = d + d
            return acc + F.when(
                i % 2 == 0,
                F.when(dbl > 9, dbl - 9).otherwise(dbl),
            ).otherwise(d)

        return F.aggregate(F.sequence(F.lit(1), n), F.lit(0), term) % 10 == 0

    valid = F.size(F.filter(cands, luhn_ok))
    return df.select(
        F.col(id_col),
        F.size(cands).cast("long").alias("cc_candidates"),
        valid.cast("long").alias("cc_valid"),
        (valid > 0).alias("has_valid_card"),
    )


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Replace PII spans (emails, phones, IPv4) with typed tags and
    count replacements per row. One codegen projection; patterns are
    restricted to the RE2 ∩ Java-regex dialect so the DuckDB oracle
    and any future native engine agree byte-for-byte."""
    pats = patterns if patterns is not None else PII_PATTERNS
    clean: Column = F.col(text_col)
    counts = []
    for i, (pat, tag) in enumerate(pats):
        counts.append(F.regexp_count(clean, F.lit(pat)).alias(f"n_redacted_{i}"))
        clean = F.regexp_replace(clean, pat, tag)
    return df.select(
        *[c for c in df.columns if c != text_col],
        clean.alias(text_col),
        *counts,
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    seq_tokens: int = 2048,
    num_shards: int = 8,
    shard_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Concat-and-split sequence packing: documents are laid out in a
    deterministic order and cut into fixed *seq_tokens* training
    sequences; each document is assigned the sequence in which it
    STARTS, with its token offset. This is the standard pretraining
    batch-prep step (maximize tokens per sequence, no padding waste).

    A global layout would need a single-partition cumsum, so documents
    are hash-sharded first and packed per shard — each shard is an
    independent token stream (num_shards ≥ cluster cores at scale; the
    window cumsum then parallelizes across shards). Deterministic:
    shard = portable_hash(id) and order = id, so re-runs and engines
    agree exactly.

    *shard_col*/*order_col* override the hash layout with existing
    columns — e.g. the (shard, position) a prior :func:`shuffle_shard`
    assigned, so packing preserves the shuffled order instead of
    re-sharding by id.

    Output: (shard, seq_id, id, n_tokens, seq_offset).
    """
    from pyspark.sql.window import Window

    if shard_col is not None:
        out = df.select(
            F.col(shard_col).alias("shard"),
            F.col(id_col),
            F.col(order_col or id_col).alias("_ord"),
            F.col(tokens_col).cast("long").alias("n_tokens"),
        )
        w = Window.partitionBy("shard").orderBy("_ord", id_col)
        start = F.sum("n_tokens").over(w) - F.col("n_tokens")
        return out.select(
            "shard",
            F.floor(start / F.lit(float(seq_tokens))).cast("long").alias("seq_id"),
            id_col,
            "n_tokens",
            F.pmod(start, F.lit(seq_tokens)).cast("long").alias("seq_offset"),
        )
    shard = F.pmod(portable_hash64(F.col(id_col).cast("string")), num_shards)
    out = df.select(
        shard.alias("shard"), F.col(id_col), F.col(tokens_col).cast("long").alias("n_tokens")
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")  # tokens before this doc
    return out.select(
        "shard",
        F.floor(start / F.lit(float(seq_tokens))).cast("long").alias("seq_id"),
        id_col,
        "n_tokens",
        F.pmod(start, F.lit(seq_tokens)).cast("long").alias("seq_offset"),
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    strata_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    ``portable_hash64(key) mod 1e6 < fraction(stratum) × 1e6``.

    Hash-gated, not ``rand()``-gated: reproducible across runs and
    engines, independent of partitioning, and consistent — re-sampling
    a grown corpus keeps every previously selected key, so incremental
    pipelines don't churn their training mix. For sampling joined
    tables, gate both sides on the same key and the sample stays
    referentially intact.
    """
    bucket = F.pmod(portable_hash64(F.col(key_col).cast("string")), _SAMPLE_SCALE)
    frac: Column = F.lit(float(default_fraction))
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == value, F.lit(float(f))).otherwise(frac)
    return df.filter(bucket < (frac * _SAMPLE_SCALE).cast("long"))


def shuffle_shard(
    df: DataFrame,
    id_col: str = "doc_id",
    num_shards: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Deterministic global shuffle + sharding for training-data
    output: every row gets a pseudo-random but reproducible
    (shard, position) from a seeded portable hash of its id. The
    standard last step before writing a pretraining corpus — destroys
    source ordering (documents from one crawl/source must not be
    adjacent) while staying bit-reproducible across runs AND engines
    (no rand(), no partition-order dependence).

    One shuffle (the position window's partition-by-shard sort);
    shards are independent streams, so parallelism = num_shards —
    size it ≥ cluster cores at scale, exactly like pack_sequences.

    Output: input columns + (shard, position).
    """
    from pyspark.sql.window import Window

    key = portable_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(f"#shuffle{seed}"))
    )
    out = df.withColumn("_skey", key).withColumn(
        "shard", F.pmod(F.col("_skey"), num_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_skey", id_col)
    return (
        out.withColumn("position", (F.row_number().over(w) - 1).cast("long"))
        .drop("_skey")
    )


def feature_hash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 256,
) -> DataFrame:
    """Hashing-trick text features (Weinberger et al. 2009): each
    token lands in bucket ``h1(token) % dim`` with sign from ``h2``'s
    low bit, and per-document bucket sums form a fixed-width sparse
    feature vector with no vocabulary pass — the stateless
    featurizer that scales to any corpus because there is nothing to
    fit, broadcast, or look up.

    Output is long-form (id, feature_idx, feature_val), the layout a
    downstream trainer or sparse-matrix writer consumes; one explode
    + one map-side-combinable sum, keyed (id, bucket).
    """
    from etl_finance_pipeline_spark.functions.text import tokens
    from etl_finance_pipeline_spark.operators.sketch import hash_word

    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("_w"))
    idx = hash_word(F.col("_w"), 1) % dim
    sign = F.when(hash_word(F.col("_w"), 16) % 2 == 0, F.lit(1)).otherwise(
        F.lit(-1)
    )
    return (
        toks.select(F.col(id_col), idx.alias("feature_idx"), sign.alias("_s"))
        .groupBy(id_col, "feature_idx")
        .agg(F.sum("_s").alias("feature_val"))
    )


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, "A-Res"): each row draws a deterministic uniform
    ``u = hash(key)/2^60`` and is ranked by priority
    ``ln(u)/w`` (equivalently ``u^(1/w)``) — the k highest priorities
    are a weighted sample without replacement, each item's inclusion
    probability proportional to its weight. This is the data-mixing
    primitive (upweight rare domains, downweight boilerplate) that a
    training pipeline runs over the whole corpus.

    Deterministic and engine-portable: the "randomness" is the md5
    hash word, so the selected set is reproducible across runs,
    engines, and partitionings — re-drawing after a corpus append
    only displaces items at the selection boundary.

    Scale shape: a narrow map computes priorities; selection is a
    global top-k — TakeOrderedAndProject (per-partition heaps + a
    k-row driver merge), never a global sort. Rows with
    non-positive weight are excluded (they'd never be sampled).

    Output: input columns + ``priority`` (higher = selected first).
    """
    from etl_finance_pipeline_spark.operators.sketch import (
        HASH_BITS,
        hash_word,
    )

    # +1 clamps u strictly away from 0: a hash of exactly 0 (one md5
    # prefix in 2^60) would make log(u) NULL in Spark but -inf in
    # ANSI engines, silently dropping that row from the sample. With
    # the shift u ∈ (0, 1] and both engines agree.
    u = (hash_word(F.col(key_col).cast("string"), 1) + F.lit(1)) / F.lit(
        float(1 << HASH_BITS)
    )
    pri = F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("priority", pri)
        # priority = ln(u)/w is negative; the BEST draw is the one
        # closest to zero -> descending order, key tiebreak
        .orderBy(F.col("priority").desc(), F.col(key_col))
        .limit(k)
    )


def domain_cap_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    cap: int,
) -> DataFrame:
    """Per-domain volume cap for training-mix balance: domains at or
    under *cap* documents keep everything; larger domains keep a
    hash-gated fraction ≈ cap/n — the standard guard against one bulk
    domain (crawl dumps, boilerplate mirrors) swamping the mixture.

    Deliberately PROBABILISTIC at the boundary (kept count is
    binomial around the cap, not exactly it): an exact cap needs a
    per-domain ranking window — one task sorting the biggest domain,
    the classic skew cliff — while the hash gate is a narrow map over
    a broadcast of per-domain counts. Deterministic per key: the same
    document survives every rerun and engine.

    Output: input rows that survive the cap + ``domain_total``.
    """
    counts = df.groupBy(domain_col).agg(F.count("*").alias("domain_total"))
    gate = F.pmod(
        portable_hash64(F.col(key_col).cast("string")), _SAMPLE_SCALE
    )
    keep = (F.col("domain_total") <= cap) | (
        gate
        < F.floor(
            F.lit(cap) * _SAMPLE_SCALE / F.col("domain_total")
        ).cast("long")
    )
    return df.join(F.broadcast(counts), domain_col).filter(keep)


def canonical_host(col: Column) -> Column:
    """Canonical host of a URL-ish string — RefinedWeb's first-stage
    URL normalization (Penedo et al. 2023 §3.1): lowercase + trim,
    then strip scheme, userinfo, path/query/fragment, port, and ONE
    leading ``www.`` label. Pure anchored-regex codegen, no UDF; the
    anchoring makes Spark's replace-all and the oracle's
    replace-first semantics identical.
    """
    s = F.lower(F.trim(col))
    s = F.regexp_replace(s, r"^[a-z][a-z0-9+.\-]*://", "")
    s = F.regexp_replace(s, r"[/?#].*$", "")
    s = F.regexp_replace(s, r"^[^@/]*@", "")
    s = F.regexp_replace(s, r":[0-9]+$", "")
    return F.regexp_replace(s, r"^www\.", "")


def registrable_domain(host: Column, levels: int = 2) -> Column:
    """Last *levels* dot-labels of a host — the registrable-domain
    rollup key (``cdn.src3.com`` → ``src3.com``). Hosts with fewer
    labels pass through unchanged. (A public-suffix list would
    replace the fixed level count in a production deployment; the
    operator contract — canonical host → rollup key → anti-join — is
    unchanged by that swap.)"""
    parts = F.split(host, r"\.")
    return F.when(
        F.size(parts) >= levels,
        F.array_join(F.slice(parts, -levels, levels), "."),
    ).otherwise(host)


def domain_filter(
    df: DataFrame,
    blocklist: list[str],
    url_col: str = "url",
    levels: int = 2,
) -> DataFrame:
    """URL blocklist filter — the curation stage every crawl pipeline
    runs first (RefinedWeb, C4): canonicalize each document's URL to
    its host, roll up to the registrable domain, and drop documents
    whose domain is blocklisted via a BROADCAST left-anti join (the
    blocklist is list-sized by definition; the corpus never
    shuffles).

    Output: surviving input rows + (host, domain).
    """
    spark = df.sparkSession
    out = df.withColumn("host", canonical_host(F.col(url_col))).withColumn(
        "domain", registrable_domain(F.col("host"), levels)
    )
    bdf = spark.createDataFrame([(b,) for b in blocklist], "domain string")
    return out.join(F.broadcast(bdf), "domain", "left_anti")


def domain_rollup(
    df: DataFrame,
    url_col: str = "url",
    levels: int = 2,
) -> DataFrame:
    """Per-registrable-domain census over canonicalized URLs: document
    count and distinct-subdomain count — the volume profile that
    feeds blocklist curation and :func:`domain_cap_sample` caps. One
    map-side-combinable aggregate keyed by domain.

    Output: (domain, n_docs, n_hosts).
    """
    out = df.withColumn("host", canonical_host(F.col(url_col))).withColumn(
        "domain", registrable_domain(F.col("host"), levels)
    )
    return out.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("host").cast("long").alias("n_hosts"),
    )


#: query parameters stripped by url_canonicalize — the ubiquitous
#: click/campaign trackers (the public "ClearURLs"-style core set).
#: A name here is matched as a full parameter name, case-insensitive.
TRACKING_PARAM_RE = "utm_[a-z0-9_]+|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src"

#: percent-escapes decoded by url_canonicalize: the RFC 3986
#: UNRESERVED punctuation, the only octets whose encoded and decoded
#: forms are equivalent by spec (alphanumerics would add 62 rewrite
#: rules for noise real crawls rarely emit — documented approximation)
_PCT_UNRESERVED = (("%2d", "-"), ("%2e", "."), ("%5f", "_"), ("%7e", "~"))


def url_canonicalize(
    df: DataFrame,
    url_col: str = "url",
    canon_col: str = "url_canon",
    key_col: str = "url_key",
) -> DataFrame:
    """Full-URL canonicalization — the cheapest, highest-yield gate of
    crawl curation, run BEFORE any content is touched (stage −0.5 of
    the WARC build). Two outputs per row:

    *canon_col* — the display/canonical form: scheme and host
    lowercased (path case PRESERVED — paths are case-sensitive by
    spec), userinfo dropped, default ports (:80/:443) stripped,
    fragment dropped, duplicate slashes collapsed, one trailing slash
    stripped, RFC 3986 unreserved punctuation percent-decoded,
    tracking parameters (``TRACKING_PARAM_RE``) removed, remaining
    query parameters SORTED (order is not identity-bearing).

    *key_col* — the cross-snapshot identity key, Heritrix/Wayback
    SURT-style aggressive form: the canonical form lowercased in
    full, scheme dropped, one leading ``www.`` dropped — the key two
    fetches of the same page share across crawl snapshots even when
    scheme, case, or tracking decoration differ. URL-level exact
    dedup (:func:`url_dedup`) groups on this.

    Entirely anchored-regex + array codegen — no UDF, no shuffle; at
    100 TB this rides the WARC scan as one more projection. Every
    rule is replayed verbatim by the DuckDB oracle twin.
    """
    t = F.trim(F.col(url_col))
    scheme = F.lower(F.regexp_extract(t, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(t, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", "")
    auth = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    tail = F.regexp_replace(rest, r"^[^/?#]*", "")
    host = F.regexp_replace(
        F.regexp_replace(F.lower(auth), r"^[^@/]*@", ""), r":(80|443)$", ""
    )
    tail2 = F.regexp_replace(tail, r"#.*$", "")  # fragment off first
    rawpath = F.regexp_extract(tail2, r"^([^?]*)", 1)
    rawq = F.regexp_extract(tail2, r"\?(.*)$", 1)
    p = rawpath
    for enc, dec in _PCT_UNRESERVED:
        p = F.regexp_replace(p, "(?i)" + enc, dec)
    p = F.regexp_replace(p, "//+", "/")
    p = F.regexp_replace(p, "(.)/$", "$1")
    path = F.when((p == "") & (host != ""), F.lit("/")).otherwise(p)
    q = F.regexp_replace(
        F.concat(F.lit("&"), rawq),
        f"(?i)&({TRACKING_PARAM_RE})=[^&]*",
        "",
    )
    q = F.regexp_replace(q, "^&", "")
    q = F.array_join(
        F.array_sort(F.filter(F.split(q, "&"), lambda x: x != "")), "&"
    )
    qpart = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    canon = F.concat(
        F.when(scheme == "", F.lit("")).otherwise(
            F.concat(scheme, F.lit("://"))
        ),
        host,
        path,
        qpart,
    )
    key = F.lower(
        F.concat(F.regexp_replace(host, r"^www\.", ""), path, qpart)
    )
    return df.withColumn(canon_col, canon).withColumn(key_col, key)


def url_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    key_col: str = "url_key",
) -> DataFrame:
    """URL-level exact dedup across crawl snapshots: canonicalize
    (:func:`url_canonicalize`), group on the aggressive identity key,
    keep the MINIMUM id per key (deterministic keep-first — the
    earliest fetch), and report how many snapshots collapsed into it.
    One map-combinable ``min/count`` aggregate keyed by url_key —
    exactly the exact-dedup shuffle shape, but over the URL key
    instead of a content hash, which is why it runs BEFORE payloads
    are parsed: at 100 TB it prunes refetches at header-scan cost.

    Output: (url_key, *id_col* kept, n_snapshots).
    """
    keyed = url_canonicalize(df, url_col=url_col, key_col=key_col)
    return keyed.groupBy(key_col).agg(
        F.min(id_col).cast("long").alias(id_col),
        F.count("*").cast("long").alias("n_snapshots"),
    )


#: attribute soup inside an opening tag: unquoted chars OR an intact
#: double-/single-quoted value — per-quote alternation, so a '>'
#: inside a quoted attribute never ends the tag early and mismatched
#: quote pairs never match (round-12 ADVICE). RE2 ∩ Java dialect.
_TAG_ATTRS = "(?:[^>\"']|\"[^\"]*\"|'[^']*')"

#: href attribute of anchor tags — group 1 is the QUOTED href value
#: (quotes INCLUDED; callers strip the first/last char) so one capture
#: group serves both quote styles without backreferences (RE2 has
#: none). Shared verbatim with the DuckDB oracle twin.
HREF_RE = f"(?is)<a\\s{_TAG_ATTRS}*?href=(\"[^\"]*\"|'[^']*')"

#: hrefs that are not web links (or are intra-page): never edges
_NON_WEB_HREF_RE = "^(?i)(javascript:|mailto:|tel:|data:|#)"

#: a path segment that is NOT exactly "." or ".." — RE2-safe (no
#: lookahead): doesn't start with a dot, or starts with one dot +
#: a non-dot, or starts with two dots + at least one more char
_PATH_SEG_RE = r"(\.[^/.][^/]*|\.\.[^/]+|[^/.][^/]*)"

#: head of a resolved link URL: scheme://authority, protocol-relative
#: //authority, or a bare host (scheme-less canonical pages) — the
#: part RFC 3986 §5.2.4 dot-segment removal must never touch
_URL_HEAD_RE = r"^([a-z][a-z0-9+.\-]*://[^/?#]*|//[^/?#]*|[^/?#]*)"

#: nesting depth the bounded rewrite handles before failing loudly
_DOT_SEGMENT_DEPTH = 4


#: a bare "." or ".." path segment anywhere — the gate that decides
#: whether an href enters the §5.2.4 rewrite at all
_DOTTED_RE = r"(^|/)\.\.?(/|$)"


def _dot_chain(p: Column) -> Column:
    """RFC 3986 §5.2.4 remove_dot_segments over a PATH expression
    (authority and query already split off), as a BOUNDED regexp
    rewrite chain — the spec's stack algorithm is iterative;
    ``_DOT_SEGMENT_DEPTH`` sequential collapse passes cover real
    markup, and deeper nesting trips the post-explode guard in
    :func:`_explode_resolved` rather than emitting a wrong key.
    Every pattern is RE2 ∩ Java, matching the DuckDB twin in
    plans/training_data.py:_sql_dot_segments verbatim."""
    # "." segments: mid-path (passes cover consecutive /././), then
    # a trailing "/."
    for _ in range(3):
        p = F.regexp_replace(p, r"/\./", "/")
    p = F.regexp_replace(p, r"/\.$", "/")
    # "seg/../" collapse — sequential passes unwind nesting AND
    # sibling chains (each replacement can expose the next match)
    for _ in range(_DOT_SEGMENT_DEPTH):
        p = F.regexp_replace(p, f"/{_PATH_SEG_RE}/\\.\\./", "/")
    for _ in range(2):
        p = F.regexp_replace(p, f"/{_PATH_SEG_RE}/\\.\\.$", "/")
    # excess ".." at the root pops an empty stack: "/../" -> "/"
    for _ in range(3):
        p = F.regexp_replace(p, r"^/\.\./", "/")
    return F.regexp_replace(p, r"^/\.\.$", "/")


def link_extract(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url_canon",
    levels: int = 2,
) -> DataFrame:
    """Outlink extraction — the step that turns a parsed crawl into a
    LINK GRAPH (CommonCrawl's host/domain-level web graphs are built
    exactly this way): pull every ``<a href>`` target out of the page
    markup, resolve it against the page's canonical URL (*url_col*,
    normally :func:`url_canonicalize` output), and roll the target up
    to its registrable domain so domain-level centrality
    (domain-authority PageRank) can consume real crawl structure.

    Resolution follows RFC 3986's five relative-reference shapes:
    absolute (``scheme://…`` kept as-is), protocol-relative (``//h/p``
    gains the page scheme), query-only (``?q=2`` replaces the query
    against the full base path, §5.3), root-relative (``/p`` gains
    scheme+host), and relative (``p`` resolves against the page
    path's directory). Dot segments (``./``, ``../``) are removed per
    §5.2.4 via a bounded rewrite chain that fails loudly past
    ``_DOT_SEGMENT_DEPTH`` nesting — so ``a.com/x/../p`` and
    ``a.com/p`` produce the SAME frontier/dedup key. Non-web and
    intra-page hrefs (``javascript:``/``mailto:``/``tel:``/``data:``/
    bare ``#…``) are dropped.

    Entirely regexp codegen + one explode — no UDF, no shuffle; at
    100 TB this rides the same scan as :func:`html_extract` and the
    edge aggregate downstream is the only exchange.

    Output: input columns + (href, link_url, link_host, link_domain,
    page_domain, is_external).
    """
    hrefs = F.transform(
        F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), 1),
        # group 1 carries its quotes (RE2 forbids backreferences, so
        # one group must serve both quote styles) — strip them here
        lambda x: x.substr(F.lit(2), F.length(x) - 2),
    )
    arr = F.transform(
        F.filter(
            hrefs,
            lambda h: (h != "") & ~h.rlike(_NON_WEB_HREF_RE),
        ),
        lambda h: F.struct(h.alias("href")),
    )
    return _explode_resolved(df, arr, url_col, levels, ())


def _explode_resolved(
    df: DataFrame,
    arr: Column,
    url_col: str,
    levels: int,
    fields: tuple[str, ...],
) -> DataFrame:
    """RFC 3986 resolution + registrable-domain rollup over *arr*, an
    ``array<struct<fields…, href>>`` of per-anchor records — the
    shared back half of :func:`link_extract` and :func:`anchor_texts`.
    Explodes to one row per anchor, adding (link_url, link_host,
    link_domain, page_domain, is_external).

    Every per-anchor computation happens INSIDE generator-side
    ``transform`` lambdas, so each stage's inputs are lambda-variable
    field references (cheap) and the exploded struct is a real
    attribute: Catalyst's CollapseProject / predicate pushdown cannot
    re-inline the extraction regexes into downstream consumers. The
    earlier column-at-a-time formulation re-expanded the whole
    resolve chain at every reference — measured 3–7× planning/codegen
    inflation and re-executed regexes per reference at runtime."""
    base = F.col(url_col)
    scheme = F.regexp_extract(base, r"^([a-z][a-z0-9+.\-]*)://", 1)
    sp = F.when(scheme == "", F.lit("")).otherwise(
        F.concat(scheme, F.lit("://"))
    )
    hostpath = F.regexp_replace(
        F.regexp_replace(base, r"^[a-z][a-z0-9+.\-]*://", ""), r"\?.*$", ""
    )
    page_host = F.regexp_extract(hostpath, r"^([^/]*)", 1)
    # canonical paths always carry at least '/', so this never eats
    # the host label
    dirp = F.regexp_replace(hostpath, r"[^/]*$", "")

    def _plus(s: Column, names: tuple[str, ...], **extra: Column) -> Column:
        return F.struct(
            *[s[n].alias(n) for n in names],
            *[c.alias(n) for n, c in extra.items()],
        )

    def _raw(h: Column) -> Column:
        return (
            F.when(h.rlike(r"^(?i)[a-z][a-z0-9+.\-]*://"), h)
            .when(
                h.startswith("//"),
                F.when(scheme == "", h).otherwise(
                    F.concat(scheme, F.lit(":"), h)
                ),
            )
            # RFC 3986 §5.3: a query-only reference replaces the query
            # against the FULL base path — hostpath is exactly
            # host+path with the base query already stripped
            .when(h.startswith("?"), F.concat(sp, hostpath, h))
            .when(h.startswith("/"), F.concat(sp, page_host, h))
            .otherwise(F.concat(sp, dirp, h))
        )

    f0 = (*fields, "href")
    arr = F.transform(
        arr, lambda s: _plus(s, f0, link_url=_raw(s["href"]))
    )

    def _dotfix(s: Column) -> Column:
        lu = s["link_url"]
        head = F.regexp_extract(lu, _URL_HEAD_RE, 1)
        rest = lu.substr(F.length(head) + 1, F.lit(1 << 30))
        fixed = F.concat(
            head,
            _dot_chain(F.regexp_replace(rest, r"\?.*$", "")),
            F.regexp_extract(rest, r"(\?.*)$", 1),
        )
        # gated: clean hrefs (the overwhelming majority) skip the
        # rewrite chain entirely
        return F.when(s["href"].rlike(_DOTTED_RE), fixed).otherwise(lu)

    arr = F.transform(arr, lambda s: _plus(s, f0, link_url=_dotfix(s)))

    def _host(s: Column) -> Column:
        lu = s["link_url"]
        return F.when(
            lu.startswith("//"),
            canonical_host(F.regexp_replace(lu, r"^//", "")),
        ).otherwise(canonical_host(lu))

    f1 = (*f0, "link_url")
    arr = F.transform(arr, lambda s: _plus(s, f1, link_host=_host(s)))
    f2 = (*f1, "link_host")
    arr = F.transform(
        arr,
        lambda s: _plus(
            s, f2, link_domain=registrable_domain(s["link_host"], levels)
        ),
    )
    out = df.withColumn("_lnk", F.explode(arr))
    for f in (*f2, "link_domain"):
        out = out.withColumn(f, F.col("_lnk")[f])
    out = (
        out.drop("_lnk")
        .withColumn(
            "page_domain",
            registrable_domain(canonical_host(base), levels),
        )
        .withColumn(
            "is_external", F.col("link_domain") != F.col("page_domain")
        )
    )
    # loud ceiling: a dotted href whose resolved PATH still carries a
    # bare "." / ".." segment nested deeper than the bounded chain —
    # fail in-plan, never emit a wrong dedup/frontier key
    residual = F.col("href").rlike(_DOTTED_RE) & F.regexp_replace(
        F.col("link_url"), r"\?.*$", ""
    ).rlike(_DOTTED_RE)
    return out.filter(
        F.assert_true(
            ~residual,
            F.concat(
                F.lit(
                    "link dot-segment nesting exceeds depth "
                    f"{_DOT_SEGMENT_DEPTH}: "
                ),
                F.col("link_url"),
            ),
        ).isNull()
    )


#: a full anchor element (group 0) — parsed further by anchor_texts.
#: Attribute soup uses the per-quote alternation so a '>' inside a
#: quoted href stays inside the opening tag (round-12 ADVICE).
_ANCHOR_EL_RE = (
    f"(?is)<a\\s{_TAG_ATTRS}*?href=(?:\"[^\"]*\"|'[^']*')"
    f"{_TAG_ATTRS}*>.*?</a>"
)

#: the opening tag's inner text: everything after the first correctly
#: quote-balanced '>' up to the closing tag
_ANCHOR_INNER_RE = f"(?is)^<a{_TAG_ATTRS}*>(.*)</a>$"

#: rel attribute carrying the nofollow token (Google 2005; every
#: production link graph drops these edges before ranking)
_NOFOLLOW_RE = "(?is)rel=(?:\"[^\"]*nofollow|'[^']*nofollow)"


def anchor_texts(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url_canon",
    levels: int = 2,
) -> DataFrame:
    """Anchor-text extraction — the (target, text) corpus crawl
    pipelines mine for retrieval/query-doc training data (the
    CommonCrawl anchor-text dataset shape) and the attribute-aware
    twin of :func:`link_extract`: each ``<a>`` element yields its
    resolved target AND its visible text (tag-stripped,
    entity-unescaped, ws-normalized like html_extract blocks) plus a
    ``nofollow`` flag from the rel attribute — the links a ranking
    graph must NOT count (paid placements, UGC). Non-web hrefs are
    dropped as in link_extract.

    Same scale shape: regexp codegen + one explode, no shuffle; the
    per-anchor parse happens inside generator-side lambdas exactly as
    in :func:`_explode_resolved`.

    Output: input columns + (anchor_text, nofollow, href, link_url,
    link_host, link_domain, page_domain, is_external).
    """

    def _unescape(c: Column) -> Column:
        for ent, rep in HTML_ENTITY_RULES:
            c = F.replace(c, F.lit(ent), F.lit(rep))
        return c

    def _mk(a: Column) -> Column:
        hq = F.regexp_extract(a, HREF_RE, 1)
        inner = F.regexp_extract(a, _ANCHOR_INNER_RE, 1)
        return F.struct(
            _ws_norm(
                _unescape(F.regexp_replace(inner, _HTML_TAG_RE, " "))
            ).alias("anchor_text"),
            a.rlike(_NOFOLLOW_RE).alias("nofollow"),
            # HREF_RE's group carries its quotes (see link_extract)
            hq.substr(F.lit(2), F.length(hq) - 2).alias("href"),
        )

    arr = F.filter(
        F.transform(
            F.regexp_extract_all(
                F.col(html_col), F.lit(_ANCHOR_EL_RE), 0
            ),
            _mk,
        ),
        lambda s: (s["href"] != "")
        & ~s["href"].rlike(_NON_WEB_HREF_RE),
    )
    return _explode_resolved(
        df, arr, url_col, levels, ("anchor_text", "nofollow")
    )


# --------------------------------------------------------------------
# robots.txt politeness — the gate a crawler applies BEFORE fetching
# --------------------------------------------------------------------

#: the rule block addressed to everyone ("User-agent: *") — group 1 is
#: the block body, ended by the next User-agent line or end-of-file.
#: Non-greedy + explicit terminator alternation, no lookahead (RE2 ∩
#: Java, though the oracle derives outcomes arithmetically).
_ROBOTS_STAR_BLOCK_RE = (
    "(?is)(?:^|\\n)user-agent:[ \\t]*\\*[ \\t]*\\r?\\n"
    "(.*?)(\\nuser-agent:|$)"
)

#: one Allow/Disallow line inside a block (group 0; type and path are
#: re-extracted per line)
_ROBOTS_RULE_LINE_RE = "(?im)^[ \\t]*(allow|disallow):[ \\t]*([^\\r\\n# ]*)"


def synthesize_robots(
    hosts: DataFrame, host_col: str = "host", out_col: str = "robots_txt"
) -> DataFrame:
    """Deterministic per-host robots.txt payload — the same
    synthesize-the-payload-in-engine fixture device as
    :func:`synthesize_html` (media lanes synthesize WAV/PNG bytes the
    same way): every byte is a function of the host's numeric index
    (``src{k}.com`` → k), so the DuckDB oracle can derive each
    longest-match outcome arithmetically without parsing anything.

    The payload exercises the semantics a real parser must honor:
    a ``*`` group with Crawl-delay and host-dependent Allow/Disallow
    rules (including the Allow-overrides-Disallow longest-match case
    ``Allow: /p/1`` vs ``Disallow: /p/``, and a full ``Disallow: /``
    block on k=7), followed by a DIFFERENT user-agent's group
    (``badbot`` — Disallow everything) that the ``*`` parse must NOT
    leak rules from.
    """
    k = F.regexp_extract(F.col(host_col), r"([0-9]+)", 1).cast("int")
    body = F.concat(
        F.lit("# synthetic robots\nUser-agent: *\nCrawl-delay: "),
        (k % 4 + 1).cast("string"),
        F.lit("\n"),
        F.when(
            k % 3 == 0, F.lit("Disallow: /p/\nAllow: /p/1\n")
        ).otherwise(F.lit("")),
        F.when(k % 4 == 1, F.lit("Disallow: /mirror\n")).otherwise(
            F.lit("")
        ),
        F.when(k == 7, F.lit("Disallow: /\n")).otherwise(F.lit("")),
        F.when(k % 5 == 2, F.lit("Allow: /ref\n")).otherwise(F.lit("")),
        F.lit("\nUser-agent: badbot\nDisallow: /\n"),
    )
    return hosts.withColumn(out_col, body)


def robots_rules(
    df: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Parse robots.txt payloads into the ``*`` group's Allow/Disallow
    rule rows — the parse every crawler runs once per host before
    scheduling fetches (RFC 9309). Group isolation is real: only the
    ``User-agent: *`` block's rules are emitted, so another agent's
    ``Disallow: /`` never leaks into the default policy. Rules with
    an EMPTY path are dropped at parse time (RFC 9309 §2.2.2: an
    empty pattern matches nothing — ``Disallow:`` alone means allow
    everything).

    Regexp codegen + one explode over a hosts-sized frame (the
    control-plane table of a crawl: ~1 row per host, broadcast
    downstream). Output: (*host_col*, rule_type, rule_path).
    """
    block = F.regexp_extract(
        F.col(robots_col), _ROBOTS_STAR_BLOCK_RE, 1
    )
    rules = F.filter(
        F.transform(
            F.regexp_extract_all(block, F.lit(_ROBOTS_RULE_LINE_RE), 0),
            lambda r: F.struct(
                F.lower(
                    F.regexp_extract(r, r"(?i)(allow|disallow)", 1)
                ).alias("rule_type"),
                F.regexp_extract(r, r":[ \t]*([^\r\n# ]*)", 1).alias(
                    "rule_path"
                ),
            ),
        ),
        lambda s: s["rule_path"] != "",
    )
    out = df.withColumn("_r", F.explode(rules))
    return out.select(
        F.col(host_col),
        F.col("_r")["rule_type"].alias("rule_type"),
        F.col("_r")["rule_path"].alias("rule_path"),
    )


def robots_delays(
    df: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
    default_delay: int = 1,
) -> DataFrame:
    """Per-host Crawl-delay from the ``*`` group (seconds; hosts whose
    robots omit it get *default_delay*) — the number a polite
    scheduler turns into a per-host fetch budget. Narrow map over the
    hosts-sized frame. Output: (*host_col*, crawl_delay)."""
    block = F.regexp_extract(
        F.col(robots_col), _ROBOTS_STAR_BLOCK_RE, 1
    )
    d = F.regexp_extract(block, r"(?im)^[ \t]*crawl-delay:[ \t]*([0-9]+)", 1)
    return df.select(
        F.col(host_col),
        F.when(d == "", F.lit(default_delay))
        .otherwise(d.cast("int"))
        .cast("int")
        .alias("crawl_delay"),
    )


#: one <url> block inside a sitemap urlset (group 0)
_SITEMAP_URL_RE = "(?is)<url>.*?</url>"


def synthesize_sitemap(
    hosts: DataFrame, host_col: str = "host", out_col: str = "sitemap_xml"
) -> DataFrame:
    """Deterministic per-host sitemap.xml payload — the discovery-side
    fixture twin of :func:`synthesize_robots` (sitemaps.org protocol):
    host ``src{k}.com`` advertises ``k % 3 + 2`` URL entries with
    ``<loc>`` paths and ``<lastmod>`` months all derived from (k, j),
    so the DuckDB oracle enumerates the exact entry set
    arithmetically. Entry j: loc path ``/s/{(k * 7 + j) % 12}``,
    lastmod month ``(k + j) % 12 + 1``."""
    k = F.regexp_extract(F.col(host_col), r"([0-9]+)", 1).cast("int")
    entry = lambda j: F.concat(  # noqa: E731
        F.lit("<url><loc>https://"),
        F.col(host_col),
        F.lit("/s/"),
        ((k * 7 + j) % 12).cast("string"),
        F.lit("</loc><lastmod>2026-"),
        F.lpad(((k + j) % 12 + 1).cast("string"), 2, "0"),
        F.lit("-01</lastmod></url>"),
    )
    body = F.concat(
        F.lit('<?xml version="1.0"?><urlset>'),
        F.aggregate(
            F.sequence(F.lit(0), k % 3 + 1),
            F.lit(""),
            lambda acc, j: F.concat(acc, entry(j)),
        ),
        F.lit("</urlset>"),
    )
    return hosts.withColumn(out_col, body)


def sitemap_parse(
    df: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Parse sitemap.xml payloads into per-URL rows — the crawl's
    OTHER discovery channel (robots points at it; real crawlers merge
    sitemap-advertised URLs into the link-derived frontier). Per
    ``<url>`` block: the ``<loc>`` target and the ``<lastmod>`` month
    (the freshness hint recrawl scheduling consumes). Same
    generator-lambda shape as the anchor parse: per-entry regexes run
    inside the transform over each block, the explode emits struct
    attributes, zero shuffles.

    Output: (*host_col*, loc, lastmod_month).
    """
    arr = F.transform(
        F.regexp_extract_all(
            F.col(xml_col), F.lit(_SITEMAP_URL_RE), 0
        ),
        lambda u: F.struct(
            F.regexp_extract(u, r"(?is)<loc>(.*?)</loc>", 1).alias(
                "loc"
            ),
            F.regexp_extract(
                u, r"(?is)<lastmod>[0-9]{4}-([0-9]{2})", 1
            )
            .try_cast("int")
            .alias("lastmod_month"),
        ),
    )
    out = df.withColumn("_u", F.explode(arr))
    keep = [c for c in df.columns if c != xml_col]
    return out.select(
        *keep,
        F.col("_u")["loc"].alias("loc"),
        F.col("_u")["lastmod_month"].alias("lastmod_month"),
    ).filter(F.col("loc") != "")


#: one <sitemap> block inside a sitemapindex (group 0)
_SITEMAP_REF_RE = "(?is)<sitemap>.*?</sitemap>"


def synthesize_sitemap_index(
    hosts: DataFrame, host_col: str = "host", out_col: str = "sitemap_index_xml"
) -> DataFrame:
    """Deterministic per-host sitemapindex payload (sitemaps.org
    nesting — large sites shard their sitemap and publish an index of
    the shards): host ``src{k}.com`` advertises two child sitemaps
    ``/sitemap-{0,1}.xml``. Callers pre-filter to the index-publishing
    hosts; every byte is a function of the host string."""
    ref = lambda i: F.concat(  # noqa: E731
        F.lit("<sitemap><loc>https://"),
        F.col(host_col),
        F.lit(f"/sitemap-{i}.xml</loc></sitemap>"),
    )
    body = F.concat(
        F.lit('<?xml version="1.0"?><sitemapindex>'),
        ref(0),
        ref(1),
        F.lit("</sitemapindex>"),
    )
    return hosts.withColumn(out_col, body)


def sitemap_index_parse(
    df: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_index_xml",
) -> DataFrame:
    """Parse a sitemapindex into per-child rows — the first level of
    the (bounded, depth-2 per the sitemaps.org spec: an index may not
    reference another index) recursive sitemap fetch. Same
    generator-lambda + explode shape as :func:`sitemap_parse`.

    Output: (*host_col*, child_loc)."""
    arr = F.transform(
        F.regexp_extract_all(F.col(xml_col), F.lit(_SITEMAP_REF_RE), 0),
        lambda u: F.regexp_extract(u, r"(?is)<loc>(.*?)</loc>", 1),
    )
    return (
        df.withColumn("child_loc", F.explode(arr))
        .filter(F.col("child_loc") != "")
        .select(F.col(host_col), F.col("child_loc"))
    )


def synthesize_child_sitemap(
    children: DataFrame,
    host_col: str = "host",
    child_col: str = "child_loc",
    out_col: str = "sitemap_xml",
) -> DataFrame:
    """Deterministic child-sitemap payload for each (host, child)
    pair the index advertised: shard i of host ``src{k}.com`` carries
    ``k % 2 + 2`` entries, entry j at ``/sx/{(k*5 + i*3 + j) % 12}``
    with lastmod month ``(k + i + j) % 12 + 1`` — the same ``<url>``
    block shape :func:`sitemap_parse` consumes."""
    k = F.regexp_extract(F.col(host_col), r"([0-9]+)", 1).cast("int")
    i = F.regexp_extract(F.col(child_col), r"sitemap-([0-9]+)", 1).cast(
        "int"
    )
    entry = lambda j: F.concat(  # noqa: E731
        F.lit("<url><loc>https://"),
        F.col(host_col),
        F.lit("/sx/"),
        ((k * 5 + i * 3 + j) % 12).cast("string"),
        F.lit("</loc><lastmod>2026-"),
        F.lpad(((k + i + j) % 12 + 1).cast("string"), 2, "0"),
        F.lit("-01</lastmod></url>"),
    )
    body = F.concat(
        F.lit('<?xml version="1.0"?><urlset>'),
        F.aggregate(
            F.sequence(F.lit(0), k % 2 + 1),
            F.lit(""),
            lambda acc, j: F.concat(acc, entry(j)),
        ),
        F.lit("</urlset>"),
    )
    return children.withColumn(out_col, body)


#: a <meta name=robots> element (group 0) — name quoted either way or
#: bare; content parsed per-element by meta_robots
_META_ROBOTS_EL_RE = (
    "(?is)<meta\\s[^>]*name\\s*=\\s*"
    "(?:\"robots\"|'robots'|robots[\\s>])[^>]*>"
)

#: a <link rel=canonical> element (group 0)
_CANONICAL_EL_RE = (
    "(?is)<link\\s[^>]*rel\\s*=\\s*"
    "(?:\"canonical\"|'canonical'|canonical[\\s>])[^>]*>"
)


def _attr_value(el: Column, attr: str) -> Column:
    """Value of *attr* inside element text *el* — double- or
    single-quoted (per-quote alternation; no backreferences)."""
    dq = F.regexp_extract(el, f'(?is){attr}\\s*=\\s*"([^"]*)"', 1)
    sq = F.regexp_extract(el, f"(?is){attr}\\s*=\\s*'([^']*)'", 1)
    return F.when(dq != "", dq).otherwise(sq)


def synthesize_directives(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Inject deterministic page-level indexing directives into the
    synthesized ``<head>`` — the fixture twin of
    :func:`synthesize_html` for the directives a real crawler honors
    AFTER robots.txt lets it fetch: ``<meta name=robots>``
    (noindex / nofollow / none / all, with quote- and case-variants
    so the parser is actually exercised) and ``<link rel=canonical>``
    (RFC 6596; absolute for ``id % 6 == 2`` pointing at page group
    ``(id%100·3+7)%100`` on the page's own registrable host,
    root-relative ``/canon/{id%50}`` for ``id % 6 == 5``), plus
    hreflang alternate clusters (``id % 4 == 1`` declares
    ``id%3 + 2`` language variants ``en/de/fr/es`` with BOTH
    attribute orders, the multilingual variant graph bitext curation
    mines), an AI-training opt-out meta (``id % 29 == 11`` declares
    ``noai, noimageai`` — the DeviantArt/Bing TDM opt-out convention
    a training-data pipeline must honor), and a ``<link
    rel=license>`` declaration (``id % 9 == 2`` CC BY-SA,
    ``id % 9 == 5`` CC BY-NC — the license gate code/corpus curation
    filters on). Every byte is a function of *id_col*, so the DuckDB
    oracle derives each directive arithmetically."""
    d = F.col(id_col)
    content = (
        F.when(d % 23 == 7, F.lit("none"))
        .when((d % 11 == 4) & (d % 2 == 0), F.lit("NOINDEX"))
        .when(d % 11 == 4, F.lit("noindex"))
        .when(d % 13 == 6, F.lit("nofollow, noarchive"))
        .when(d % 19 == 3, F.lit("all"))
    )
    meta = F.when(
        content.isNotNull(),
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit("<meta name='ROBOTS' content='"),
                content,
                F.lit("'>"),
            ),
        ).otherwise(
            F.concat(
                F.lit('<meta name="robots" content="'),
                content,
                F.lit('">'),
            )
        ),
    ).otherwise(F.lit(""))
    href = F.when(
        d % 6 == 2,
        F.concat(
            F.lit("https://src"),
            ((d % 100) % 20).cast("string"),
            F.lit(".com/a.b/"),
            (((d % 100) * 3 + 7) % 100).cast("string"),
        ),
    ).when(d % 6 == 5, F.concat(F.lit("/canon/"), (d % 50).cast("string")))
    link = F.when(
        href.isNotNull(),
        F.concat(F.lit('<link rel="canonical" href="'), href, F.lit('">')),
    ).otherwise(F.lit(""))
    lang = lambda j: F.element_at(  # noqa: E731
        F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es")),
        (j + 1).cast("int"),
    )
    alt_href = lambda j: F.concat(  # noqa: E731
        F.lit("https://src"),
        (d % 20).cast("string"),
        F.lit(".com/"),
        lang(j),
        F.lit("/a.b/"),
        (d % 100).cast("string"),
    )
    alt = lambda j: F.when(  # noqa: E731
        j % 2 == 0,
        F.concat(
            F.lit('<link rel="alternate" hreflang="'),
            lang(j),
            F.lit('" href="'),
            alt_href(j),
            F.lit('">'),
        ),
    ).otherwise(
        F.concat(
            F.lit("<link hreflang='"),
            lang(j),
            F.lit("' href='"),
            alt_href(j),
            F.lit("' rel='alternate'>"),
        )
    )
    alts = F.when(
        d % 4 == 1,
        F.aggregate(
            F.sequence(F.lit(0), d % 3 + 1),
            F.lit(""),
            lambda acc, j: F.concat(acc, alt(j)),
        ),
    ).otherwise(F.lit(""))
    optout = F.when(
        d % 29 == 11,
        F.lit('<meta name="robots" content="noai, noimageai">'),
    ).otherwise(F.lit(""))
    lic_url = F.when(
        d % 9 == 2,
        F.lit("https://creativecommons.org/licenses/by-sa/4.0/"),
    ).when(
        d % 9 == 5,
        F.lit("https://creativecommons.org/licenses/by-nc/4.0/"),
    )
    lic = F.when(
        lic_url.isNotNull(),
        F.concat(F.lit('<link rel="license" href="'), lic_url, F.lit('">')),
    ).otherwise(F.lit(""))
    return df.withColumn(
        html_col,
        F.regexp_replace(
            F.col(html_col),
            F.lit("^<html><head>"),
            F.concat(F.lit("<html><head>"), meta, optout, link, alts, lic),
        ),
    )


def meta_robots(
    df: DataFrame, html_col: str = "html"
) -> DataFrame:
    """Parse page-level robots meta directives (the HTML complement
    of the site-level robots.txt gate): every ``<meta name=robots>``
    element's content is tokenized (comma-split, ws-stripped,
    case-folded) and OR-combined across elements per the
    multiple-robots-meta rule; ``none`` ≡ ``noindex, nofollow``;
    ``all`` asserts nothing. Pure regexp + array codegen over the
    page scan — no shuffle, no UDF.

    Output: input columns + (robots_content — first element's
    content, lowercased, NULL when no robots meta — noindex,
    nofollow_meta)."""
    metas = F.regexp_extract_all(
        F.col(html_col), F.lit(_META_ROBOTS_EL_RE), 0
    )
    contents = F.transform(metas, lambda m: F.lower(_attr_value(m, "content")))

    def has(tok: str) -> Column:
        return F.exists(
            contents,
            lambda c: F.array_contains(
                F.split(F.regexp_replace(c, r"\s+", ""), ","), tok
            ),
        )

    return (
        df.withColumn("robots_content", F.get(contents, 0))
        .withColumn("noindex", has("noindex") | has("none"))
        .withColumn("nofollow_meta", has("nofollow") | has("none"))
        # TDM opt-out tokens (DeviantArt/Bing convention): content
        # owners declining AI-training use — a training-data pipeline
        # honors these at the corpus gate, not just the index gate
        .withColumn("noai", has("noai"))
        .withColumn("noimageai", has("noimageai") | has("noai"))
    )


def canonical_links(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url_canon",
    levels: int = 2,
) -> DataFrame:
    """Extract each page's declared canonical URL (``<link
    rel=canonical>``, RFC 6596) and resolve it against the page's
    canonical URL through the SAME RFC 3986 chain as
    :func:`link_extract` — the signal dedup uses to collapse
    syndicated copies and snapshot decoration onto one indexed
    identity. First declaration wins when duplicated (the
    Google-documented rule). Pages declaring no canonical are DROPPED
    (callers coalesce to self-canonical).

    Output: input columns + (href, link_url, link_host, link_domain,
    page_domain, is_external) for declaring pages — ``link_url`` is
    the resolved canonical target."""
    els = F.regexp_extract_all(F.col(html_col), F.lit(_CANONICAL_EL_RE), 0)
    arr = F.slice(
        F.filter(
            F.transform(
                els, lambda m: F.struct(_attr_value(m, "href").alias("href"))
            ),
            lambda s: (s["href"] != "")
            & ~s["href"].rlike(_NON_WEB_HREF_RE),
        ),
        1,
        1,
    )
    return _explode_resolved(df, arr, url_col, levels, ())


#: soft-404 phrase heuristic — shared verbatim with the DuckDB twin
SOFT404_RE = (
    "(?i)(404|page not found|not found|does not exist|"
    "no longer available|nothing here)"
)


def soft404_flag(
    df: DataFrame, text_col: str = "text", short_chars: int = 150
) -> DataFrame:
    """Soft-404 detection over EXTRACTED page text — the error pages
    served with HTTP 200 that a status-code filter can't catch (the
    Bar-Yossef et al. problem): the standard two-signal heuristic —
    an error phrase (``SOFT404_RE``) AND a short body (error pages
    are terse; *short_chars* sits between the planted error template
    and the fixture's text-length floor). Soft-404s are crawl noise
    the corpus funnel must drop and the frontier should stop
    refetching. Pure narrow map riding the extraction scan.

    Output: input columns + (body_chars, has_error_phrase, is_short,
    is_soft404)."""
    has = F.col(text_col).rlike(SOFT404_RE)
    short = F.length(text_col) < short_chars
    return (
        df.withColumn("body_chars", F.length(text_col).cast("long"))
        .withColumn("has_error_phrase", has)
        .withColumn("is_short", short)
        .withColumn("is_soft404", has & short)
    )


#: a <link rel=license> element (group 0)
_LICENSE_EL_RE = (
    "(?is)<link\\s[^>]*rel\\s*=\\s*"
    "(?:\"license\"|'license'|license[\\s>])[^>]*>"
)

#: short license code from a creativecommons-style license URL
_LICENSE_CODE_RE = r"/licenses/([a-z\-]+)/"


def license_links(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Extract the page's declared license (``<link rel=license>``,
    HTML spec) and reduce CC-style URLs to their short code — the
    signal license-aware curation filters on (code corpora keep
    permissive licenses; NC-licensed text is excluded from commercial
    training sets). First declaration wins. Pure regexp projection on
    the page scan.

    Output: input columns + (license_url — NULL when undeclared —
    license_code — e.g. ``by-sa``, NULL when the URL carries no
    recognizable code)."""
    els = F.regexp_extract_all(F.col(html_col), F.lit(_LICENSE_EL_RE), 0)
    first = F.get(els, 0)
    url = F.when(first.isNotNull(), _attr_value(first, "href"))
    code = F.regexp_extract(url, _LICENSE_CODE_RE, 1)
    return df.withColumn("license_url", url).withColumn(
        "license_code", F.when(code != "", code)
    )


#: a <link rel=alternate> element (group 0) — rel may precede or
#: follow the other attributes
_ALTERNATE_EL_RE = (
    "(?is)<link\\s[^>]*rel\\s*=\\s*"
    "(?:\"alternate\"|'alternate'|alternate[\\s>])[^>]*>"
)


def hreflang_links(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Extract hreflang alternate declarations (``<link
    rel=alternate hreflang=…>``) — the page-declared multilingual
    variant graph: the language-version clusters bitext curation
    mines for parallel-document candidates and multilingual balancing
    uses for per-language accounting. Elements lacking an hreflang
    attribute (feeds, alternate stylesheets) are dropped. Regexp +
    one explode riding the page scan — same shape as the anchor
    parse, zero shuffles.

    Output: input columns + (hreflang — lowercased BCP 47 tag —
    href), one row per declaration; non-declaring pages are
    dropped."""
    els = F.regexp_extract_all(F.col(html_col), F.lit(_ALTERNATE_EL_RE), 0)
    arr = F.filter(
        F.transform(
            els,
            lambda m: F.struct(
                F.lower(_attr_value(m, "hreflang")).alias("hreflang"),
                _attr_value(m, "href").alias("href"),
            ),
        ),
        lambda s: (s["hreflang"] != "") & (s["href"] != ""),
    )
    out = df.withColumn("_alt", F.explode(arr))
    return out.select(
        *df.columns,
        F.col("_alt")["hreflang"].alias("hreflang"),
        F.col("_alt")["href"].alias("href"),
    )


def redirect_resolve(
    starts: DataFrame,
    mapping: DataFrame,
    key_col: str = "url_key",
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 4,
    broadcast_map: bool = True,
) -> DataFrame:
    """Resolve HTTP redirect chains to their final target — the
    fetch-log post-processing every crawl runs so frontier, dedup,
    and ranking all key on the page that actually serves content.
    *mapping* is the (src → dst) redirect relation (from fetch logs;
    one row per redirecting key); *starts* carries the keys to
    resolve. Bounded chain-following: *max_hops* unrolled left joins
    (crawlers cap redirect depth the same way — curl defaults to 50,
    production crawlers 5-10), a visited set per row for cycle
    detection, and explicit terminal status instead of silent
    truncation.

    Scale shape: each hop is one equi-join keyed on the current
    target — *broadcast_map* (default) fits the common case where the
    redirecting subset is control-plane-sized; pass ``False`` when
    the map is fetch-log-sized and both sides should hash-partition
    by key. No iteration state leaves the executors (the visited set
    is a ≤ *max_hops* element array column).

    Output: (src_key, final_key, hops, status) with status in
    ``ok`` (chain fully resolved), ``cycle`` (target already
    visited), ``too_many_hops`` (an outgoing edge remains after
    *max_hops*)."""
    m = mapping.select(
        F.col(src_col).alias("_ms"), F.col(dst_col).alias("_md")
    )
    if broadcast_map:
        m = F.broadcast(m)
    df = (
        starts.select(F.col(key_col))
        .distinct()
        .select(
            F.col(key_col).alias("src_key"),
            F.col(key_col).alias("final_key"),
            F.lit(0).alias("hops"),
            F.array(F.col(key_col)).alias("_seen"),
            F.lit("ok").alias("status"),
        )
    )
    for _ in range(max_hops):
        j = df.join(
            m,
            (F.col("final_key") == F.col("_ms"))
            & (F.col("status") == "ok"),
            "left",
        )
        step = F.col("_md")
        cyc = step.isNotNull() & F.array_contains(F.col("_seen"), step)
        fwd = step.isNotNull() & ~cyc
        df = j.select(
            "src_key",
            F.when(fwd, step).otherwise(F.col("final_key")).alias(
                "final_key"
            ),
            F.when(fwd, F.col("hops") + 1)
            .otherwise(F.col("hops"))
            .alias("hops"),
            F.when(fwd, F.array_append(F.col("_seen"), step))
            .otherwise(F.col("_seen"))
            .alias("_seen"),
            F.when(cyc, F.lit("cycle"))
            .otherwise(F.col("status"))
            .alias("status"),
        )
    j = df.join(
        m,
        (F.col("final_key") == F.col("_ms")) & (F.col("status") == "ok"),
        "left",
    )
    return j.select(
        "src_key",
        "final_key",
        "hops",
        F.when(F.col("_md").isNotNull(), F.lit("too_many_hops"))
        .otherwise(F.col("status"))
        .alias("status"),
    )


def robots_gate(
    cands: DataFrame,
    rules: DataFrame,
    url_key_col: str = "url_key",
    host_col: str = "host",
) -> DataFrame:
    """Apply parsed robots rules to fetch candidates with RFC 9309
    longest-match precedence: among the ``*`` group's rules whose
    path is a prefix of the candidate's path, the LONGEST path wins,
    and on a length tie Allow beats Disallow (the Google/RFC tie
    rule). Candidates with no matching rule are allowed. *cands* must
    be unique on (*url_key_col*) and carry *host_col* (or it is
    derived as the key's authority prefix); *rules* is
    :func:`robots_rules` output.

    Scale shape: rules are a hosts-sized control-plane table →
    broadcast join against the frontier; longest-match is one
    map-side-combinable max(struct) aggregate keyed by the candidate
    — no window, no sort. At 100 TB the frontier is the only big
    side and it partitions by its own key.

    Output: (*url_key_col*, *host_col*, allowed, rule_type,
    rule_path) — rule fields NULL when no rule matched.
    """
    c = cands
    if host_col not in c.columns:
        c = c.withColumn(
            host_col,
            F.regexp_extract(F.col(url_key_col), r"^([^/]*)", 1),
        )
    path = F.regexp_replace(F.col(url_key_col), r"^[^/]*", "")
    j = c.withColumn("_path", path).join(
        F.broadcast(rules), host_col, "left"
    )
    hit = F.col("rule_path").isNotNull() & F.col("_path").startswith(
        F.col("rule_path")
    )
    best = F.max(
        F.when(
            hit,
            F.struct(
                F.length("rule_path").alias("l"),
                (F.col("rule_type") == "allow")
                .cast("int")
                .alias("a"),
                F.col("rule_path").alias("p"),
                F.col("rule_type").alias("t"),
            ),
        )
    )
    agg = j.groupBy(url_key_col, host_col).agg(best.alias("_b"))
    return agg.select(
        url_key_col,
        host_col,
        (
            F.col("_b").isNull() | (F.col("_b")["t"] == "allow")
        ).alias("allowed"),
        F.col("_b")["t"].alias("rule_type"),
        F.col("_b")["p"].alias("rule_path"),
    )


def fim_samples(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gate_col: str | None = None,
    rate_pct: int = 50,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fill-in-the-middle sample prep for code pretraining (Bavarian
    et al. 2022): split each eligible document at two deterministic
    character positions 0 ≤ i ≤ j ≤ n into (prefix, middle, suffix)
    and render the FIM orderings —

        PSM: <fim_prefix>P <fim_suffix>S <fim_middle>M
        SPM: <fim_suffix>S <fim_prefix>P <fim_middle>M

    A document is transformed iff *gate_col* (when given — e.g.
    code_detect's is_code route) is true AND a portable per-doc hash
    clears *rate_pct* (the paper's FIM rate); PSM vs SPM is a second
    hash bit (50/50). Everything — gates, split points, rendering —
    derives from md5 of (id, tag), so the DuckDB oracle replays the
    identical samples; like span_corruption, the rendered sample is
    emitted as an md5 fingerprint rather than megabytes of string.
    One exchange-free projection: at 100 TB this rides the code-route
    scan, no shuffle, no UDF, no state.

    Output: (*id_col*, keep_cols..., mode ∈ {psm, spm, plain},
    n_chars, fim_i, fim_j [NULL for plain], sample_md5).
    """
    reserved = {"mode", "n_chars", "fim_i", "fim_j", "sample_md5"}
    clash = reserved & ({id_col} | set(keep_cols))
    if clash:
        raise ValueError(
            f"fim_samples: column(s) {sorted(clash)} collide with "
            "output columns — rename or drop them upstream"
        )
    t = F.col(text_col)
    n = F.length(t)

    def h(tag: str) -> Column:
        return portable_hash64(
            F.concat(F.col(id_col).cast("string"), F.lit(tag))
        )

    gated = h("#fim") % 100 < rate_pct
    if gate_col is not None:
        gated = F.col(gate_col) & gated
    i = h("#fi") % (n + 1)
    j = i + h("#fj") % (n - i + 1)
    mode = (
        F.when(~gated, F.lit("plain"))
        .when(h("#fo") % 2 == 0, F.lit("psm"))
        .otherwise(F.lit("spm"))
    )
    pre = t.substr(F.lit(1), i)
    mid = t.substr(i + 1, j - i)
    suf = t.substr(j + 1, n - j)
    sample = (
        F.when(F.col("_fim_mode") == "plain", t)
        .when(
            F.col("_fim_mode") == "psm",
            F.concat(
                F.lit("<fim_prefix>"),
                pre,
                F.lit("<fim_suffix>"),
                suf,
                F.lit("<fim_middle>"),
                mid,
            ),
        )
        .otherwise(
            F.concat(
                F.lit("<fim_suffix>"),
                suf,
                F.lit("<fim_prefix>"),
                pre,
                F.lit("<fim_middle>"),
                mid,
            )
        )
    )
    # internal intermediate so a pre-existing 'mode' input column is
    # never silently overwritten; aliased back to 'mode' on output
    out = df.withColumn("_fim_mode", mode)
    return out.select(
        id_col,
        *keep_cols,
        F.col("_fim_mode").alias("mode"),
        n.cast("long").alias("n_chars"),
        F.when(F.col("_fim_mode") != "plain", i).cast("long").alias("fim_i"),
        F.when(F.col("_fim_mode") != "plain", j).cast("long").alias("fim_j"),
        F.md5(sample).alias("sample_md5"),
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic dataset split (train/val/test by default,
    0.9/0.05/0.05): each key hashes into [0, 1e6) and the splits own
    consecutive ranges in the given order. A pure narrow map — the
    same key lands in the same split on every run, engine, and
    partitioning, and (unlike ``randomSplit``) membership survives
    corpus appends: new keys join splits in proportion, old keys
    never migrate (no train/test leakage across retrains).
    """
    w = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(w.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1")
    bucket = F.pmod(
        portable_hash64(F.col(key_col).cast("string")), _SAMPLE_SCALE
    )
    expr = None
    acc = 0.0
    items = list(w.items())
    for name, frac in items[:-1]:
        acc += frac
        bound = int(acc * _SAMPLE_SCALE)
        cond = bucket < bound
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    expr = (
        expr.otherwise(F.lit(items[-1][0]))
        if expr is not None
        else F.lit(items[-1][0])
    )
    return df.withColumn(out_col, expr)


def negative_pairs(
    df: DataFrame,
    key_col: str,
    n_total: int,
    k: int = 4,
) -> DataFrame:
    """Pseudo-random negative partners for contrastive training: each
    anchor draws *k* partners as ``hash(key, j) mod n_total`` over a
    dense 0..n_total−1 id space — a narrow map (explode of k struct
    literals, no shuffle, no join) that is reproducible across runs
    and engines, so the training pairs a run saw can always be
    re-derived. Self-draws are dropped (an anchor never partners
    itself); callers needing hard-negative hygiene anti-join the
    output against their near-dup pair set (the same frame
    minhash_lsh_pairs / set_similarity_join emit).

    Output: (anchor, draw, partner), draw in 0..k−1.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("draw"),
                F.pmod(
                    portable_hash64(
                        F.concat_ws(":", F.col(key_col).cast("string"), F.lit(str(j)))
                    ),
                    F.lit(n_total),
                ).alias("partner"),
            )
            for j in range(k)
        ]
    )
    return (
        df.select(F.col(key_col).alias("anchor"), F.explode(cells).alias("_c"))
        .select("anchor", F.col("_c.draw").alias("draw"), F.col("_c.partner").alias("partner"))
        .filter(F.col("partner") != F.col("anchor"))
    )


def segment_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    words_per_line: int | None = None,
) -> DataFrame:
    """Explode documents into ordered (id, pos, line) units.

    Two segmentations, one contract:
     * ``delimiter`` (default newline) — real lines/paragraphs, the
       CCNet/RefinedWeb unit. Treated as a LITERAL string (quoted
       with ``\\Q…\\E`` before reaching the regex-based split), so
       callers can pass '.', '|' or '||' without silently splitting
       on every character — matching the DuckDB oracle's literal
       ``string_split`` semantics.
     * ``words_per_line=k`` — deterministic fixed-width pseudo-lines
       of k whitespace tokens for corpora that carry no newlines
       (this repo's synthetic fixture); the last line may be short.

    Narrow explode, no shuffle; ``pos`` is the 0-based line index so
    callers can reassemble the document in order.
    """
    if words_per_line is not None:
        from etl_finance_pipeline_spark.functions.text import tokens

        toked = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
        k = words_per_line
        n_lines = F.ceil(F.size(F.col("_toks")) / F.lit(k)).cast("int")
        lines = F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.concat_ws(
                " ", F.slice(F.col("_toks"), (i * k + 1).cast("int"), k)
            ),
        )
        seg = toked.select(F.col(id_col), F.posexplode(lines))
    else:
        # \Q...\E = java.util.regex.Pattern.quote: the delimiter is a
        # literal, never a pattern. An embedded \E cannot break out —
        # re-quote around it the way Pattern.quote does.
        quoted = "\\Q" + delimiter.replace("\\E", "\\E\\\\E\\Q") + "\\E"
        seg = df.select(
            F.col(id_col), F.posexplode(F.split(F.col(text_col), quoted))
        )
    return seg.select(id_col, F.col("pos"), F.col("col").alias("line"))


def line_dedup(
    lines: DataFrame,
    id_col: str = "doc_id",
    min_docs: int = 2,
    keep: str = "none",
) -> DataFrame:
    """Cross-document line/paragraph deduplication — the CCNet /
    RefinedWeb boilerplate-removal pass: a line whose exact text
    occurs in >= ``min_docs`` DISTINCT documents is boilerplate
    (headers, navigation, license blobs) and is removed from every
    document (``keep='none'``) or from all but its globally first
    occurrence by (doc, pos) (``keep='first'``).

    Input is the (id, pos, line) frame from :func:`segment_lines`;
    output is one row per SURVIVING line with a ``doc_frequency``
    column. Use :func:`reassemble_lines` to fold back to documents.

    Scale shape (100 TB): one aggregate keyed by the line text
    (map-side combinable count-distinct via the (line, doc) pre-agg)
    and one equi-join of the exploded corpus back on the line key.
    Line text is a high-cardinality key with Zipf head (empty lines,
    standard boilerplate) — the pre-aggregate collapses each hot line
    to one row per doc before the distinct count, so no single
    reducer sees a hot line's full corpus fan-in.
    """
    if keep not in ("none", "first"):
        raise ValueError("keep must be 'none' or 'first'")
    per_doc = lines.groupBy("line", id_col).agg(F.min("pos").alias("_minpos"))
    stats = per_doc.groupBy("line").agg(
        F.count("*").alias("doc_frequency"),
        F.min(F.struct(F.col(id_col), F.col("_minpos"))).alias("_first"),
    )
    joined = lines.join(stats, "line")
    survive = F.col("doc_frequency") < F.lit(min_docs)
    if keep == "first":
        survive = survive | (
            (F.col("_first")[id_col] == F.col(id_col))
            & (F.col("_first._minpos") == F.col("pos"))
        )
    return joined.filter(survive).select(
        id_col, "pos", "line", F.col("doc_frequency").cast("long").alias("doc_frequency")
    )


def reassemble_lines(
    lines: DataFrame,
    id_col: str = "doc_id",
    joiner: str = "\n",
) -> DataFrame:
    """Fold a (id, pos, line) frame back into one document per row,
    lines in original order: (id, n_lines, text). One aggregate keyed
    by the document; the sort happens inside each collected array
    (array_sort on (pos, line) structs), never as a global sort."""
    return (
        lines.groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("line")))
                    ),
                    lambda s: s["line"],
                ),
                joiner,
            ).alias("text"),
        )
        .withColumn("n_lines", F.col("n_lines").cast("long"))
    )


def c4_line_filter(
    lines: DataFrame,
    min_words: int = 5,
    require_terminal: bool = True,
    terminal_class: str = "[.!?\"']",
) -> DataFrame:
    """The C4 line-level heuristics (Raffel et al. 2020 §2.2): keep a
    line only if it has >= ``min_words`` whitespace words and (when
    ``require_terminal``) ends in terminal punctuation. Input/output
    is the (id, pos, line) frame from :func:`segment_lines` — a
    narrow filter, no shuffle."""
    keep = F.size(F.split(F.trim(F.col("line")), r"\s+")) >= min_words
    if require_terminal:
        keep = keep & F.rtrim(F.col("line")).rlike(terminal_class + "$")
    return lines.filter(keep)


def c4_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    words_per_line: int | None = None,
    min_words: int = 5,
    require_terminal: bool = True,
    bad_substrings: tuple[str, ...] = ("{", "lorem ipsum"),
    min_kept_lines: int = 3,
    joiner: str = "\n",
) -> DataFrame:
    """Full C4 cleaning pass: line filter + document-level drops.

    A document is dropped when its raw text contains any of
    ``bad_substrings`` (C4 drops curly-brace pages as code and the
    'lorem ipsum' placeholder), or when fewer than ``min_kept_lines``
    lines survive the line filter (C4's >=3-sentence floor).
    ``drop_reason`` reports the FIRST matching rule in the order
    (bad_substring..., too_few_lines, kept) — a deterministic CASE
    chain. Output: (id, n_lines, kept_lines, c4_drop, drop_reason,
    text) where ``text`` is the kept lines re-joined (NULL for
    dropped documents).

    Scale shape: one narrow explode+filter, one per-doc aggregate
    (keyed by doc, map-side combinable), one broadcast-free equi-join
    of two doc-keyed frames that AQE plans as a single exchange each.
    """
    from etl_finance_pipeline_spark.operators.corpus import (  # self, for clarity
        reassemble_lines,
        segment_lines,
    )

    seg = segment_lines(
        df, id_col, text_col, delimiter=delimiter, words_per_line=words_per_line
    )
    totals = seg.groupBy(id_col).agg(F.count("*").alias("n_lines"))
    kept = c4_line_filter(
        seg, min_words=min_words, require_terminal=require_terminal
    )
    folded = reassemble_lines(kept, id_col, joiner=joiner).withColumnRenamed(
        "n_lines", "kept_lines"
    ).withColumnRenamed("text", "_clean")
    base = df.select(F.col(id_col), F.lower(F.col(text_col)).alias("_raw"))
    out = (
        base.join(totals, id_col, "left")
        .join(folded, id_col, "left")
        .withColumn("kept_lines", F.coalesce("kept_lines", F.lit(0)))
        .withColumn("n_lines", F.coalesce("n_lines", F.lit(0)))
    )
    reason = F.when(
        F.col("kept_lines") < min_kept_lines, F.lit("too_few_lines")
    ).otherwise(F.lit("kept"))
    for s in reversed(bad_substrings):
        reason = F.when(
            F.contains(F.col("_raw"), F.lit(s.lower())), F.lit("bad_substring")
        ).otherwise(reason)
    return out.select(
        id_col,
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("kept_lines").cast("long").alias("kept_lines"),
        (reason != "kept").alias("c4_drop"),
        reason.alias("drop_reason"),
        F.when(reason == "kept", F.col("_clean")).alias("text"),
    )


#: (pattern, replacement) pairs for unicode text normalization, applied
#: in order. Patterns stay in the Java-regex ∩ RE2 common dialect and
#: embed the unicode characters literally, so the DuckDB oracle runs
#: the byte-identical chain. Part of the deterministic contract.
TEXT_NORM_RULES: list[tuple[str, str]] = [
    ("[\u2018\u2019\u201a\u201b]", "'"),  # curly single quotes
    ('[\u201c\u201d\u201e\u201f]', '"'),  # curly double quotes
    ("[\u2013\u2014\u2015\u2212]", "-"),  # en/em/bar dashes, minus
    ("\u2026", "..."),  # ellipsis
    # exotic spaces: nbsp, figure, thin, zwsp, narrow-nbsp, ideographic
    ("[\u00a0\u2007\u2009\u200b\u202f\u3000]", " "),
    ("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", ""),  # controls (keep \n, \r)
    ("[ \\t]+", " "),  # collapse runs
]


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
) -> DataFrame:
    """Unicode normalization for corpus prep — the standard pre-dedup
    canonicalization (curly quotes/dashes/ellipsis folding, exotic
    spaces, control-char strip, whitespace collapse, trim) so that
    visually-identical documents hash identically downstream.

    One regexp_replace chain inside whole-stage codegen — narrow, no
    shuffle; adds ``{out}`` plus before/after char counts.
    """
    clean: Column = F.col(text_col)
    for pat, rep in TEXT_NORM_RULES:
        clean = F.regexp_replace(clean, pat, rep)
    clean = F.trim(clean)
    return (
        df.withColumn(out_col, clean)
        .withColumn("n_chars_before", F.length(text_col).cast("long"))
        .withColumn("n_chars_after", F.length(out_col).cast("long"))
    )


def incremental_line_dedup(
    batch_lines: DataFrame,
    corpus_lines: DataFrame,
    id_col: str = "doc_id",
    min_docs: int = 1,
) -> DataFrame:
    """Ingest-time boilerplate removal: drop every line of an incoming
    BATCH whose text already occurs in >= ``min_docs`` distinct
    documents of the STANDING corpus — the incremental twin of
    :func:`line_dedup` (same contract as incremental substring dedup:
    the standing corpus is never reshuffled for the batch).

    The batch's DISTINCT line set broadcasts onto ONE corpus pass
    (batches are ingest-sized by definition); only the matched lines'
    doc frequencies come back, and the batch filters against that
    broadcast-sized table. At production scale the corpus line
    frequencies are precomputed at ingest and this becomes a pure
    lookup.

    Input/output: (id, pos, line) frames from :func:`segment_lines`;
    output adds ``corpus_doc_frequency`` (0 when unseen).
    """
    batch_set = batch_lines.select("line").distinct()
    freqs = (
        corpus_lines.join(F.broadcast(batch_set), "line", "left_semi")
        .groupBy("line", id_col)
        .agg(F.lit(1).alias("_one"))
        .groupBy("line")
        .agg(F.count("*").alias("corpus_doc_frequency"))
    )
    out = batch_lines.join(F.broadcast(freqs), "line", "left").withColumn(
        "corpus_doc_frequency",
        F.coalesce("corpus_doc_frequency", F.lit(0)).cast("long"),
    )
    return out.filter(F.col("corpus_doc_frequency") < min_docs).select(
        id_col, "pos", "line", "corpus_doc_frequency"
    )


def line_repetition_stats(
    lines: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher's within-document repetition signals at LINE granularity
    (Rae et al. §A1.1: 'fraction of duplicate lines' and 'fraction of
    characters in duplicated lines'): a page that repeats its own
    nav/footer blocks fails these before any cross-doc pass runs.

    Input is the (id, pos, line) frame from :func:`segment_lines`.
    For each repeated line value with in-doc count c, its c−1 extra
    occurrences count as duplicates. Output per doc: n_lines,
    n_distinct_lines, dup_line_frac, dup_char_frac (6-dp rounded).
    Two map-side-combinable aggregates keyed by (doc, line) then doc —
    no joins, no skew exposure beyond the doc key.
    """
    from etl_finance_pipeline_spark.functions.scalar import portable_round

    per_line = lines.groupBy(id_col, "line").agg(
        F.count("*").alias("_c")
    ).withColumn("_len", F.length("line"))
    agg = per_line.groupBy(id_col).agg(
        F.sum("_c").alias("_n"),
        F.count("*").alias("_d"),
        F.sum(F.col("_c") - 1).alias("_dup"),
        F.sum((F.col("_c") - 1) * F.col("_len")).alias("_dup_chars"),
        F.sum(F.col("_c") * F.col("_len")).alias("_chars"),
    )
    return agg.select(
        id_col,
        F.col("_n").cast("long").alias("n_lines"),
        F.col("_d").cast("long").alias("n_distinct_lines"),
        portable_round(F.col("_dup") / F.col("_n"), 6).alias("dup_line_frac"),
        portable_round(
            F.col("_dup_chars") / F.col("_chars"), 6
        ).alias("dup_char_frac"),
    )


def source_token_kl(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Per-source token-distribution divergence from the corpus —
    KL(P_source ‖ P_corpus) over unigram frequencies, the mixture
    diagnostic behind DoReMi-style domain reweighting (Xie et al.
    2023): a source whose token distribution sits far from the
    mixture is the one whose weight moves the mixture most.

    P_source's support is a subset of P_corpus's by construction, so
    the sum Σ p·ln(p/q) is always finite. Both distributions come
    from ONE token-count aggregate keyed (source, token); the corpus
    marginal is a second rollup of the same frame — vocabulary-sized,
    broadcast back. ln noise across engines sits ~9 orders below the
    6-dp rounding (normalized ratios, bounded sums).

    Output: (group, n_tokens, n_types, kl).
    """
    from etl_finance_pipeline_spark.functions.text import tokens

    toks = df.select(
        F.col(group_col).alias("_grp"), F.explode(tokens(text_col)).alias("_w")
    )
    per = toks.groupBy("_grp", "_w").agg(F.count("*").alias("_c"))
    # vocabulary-sized frames from here on
    per = per.localCheckpoint(eager=True)  # feeds corpus rollup AND the join
    corpus = per.groupBy("_w").agg(F.sum("_c").alias("_cq"))
    totals = per.groupBy("_grp").agg(
        F.sum("_c").alias("_tp"), F.count("*").alias("_types")
    )
    grand = corpus.agg(F.sum("_cq").alias("_tq"))
    p = F.col("_c") / F.col("_tp")
    q = F.col("_cq") / F.col("_tq")
    from etl_finance_pipeline_spark.functions.scalar import portable_round

    return (
        per.join(corpus, "_w")
        .join(F.broadcast(totals), "_grp")
        .crossJoin(F.broadcast(grand))
        .groupBy("_grp")
        .agg(
            F.first("_tp").alias("_nt"),
            F.first("_types").alias("_nty"),
            F.sum(p * F.log(p / q)).alias("_kl"),
        )
        .select(
            F.col("_grp").alias(group_col),
            F.col("_nt").cast("long").alias("n_tokens"),
            F.col("_nty").cast("long").alias("n_types"),
            portable_round(F.col("_kl"), round_digits).alias("kl"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Frequency-pruned vocabulary coverage: tokens whose CORPUS count
    reaches *min_count* form the vocabulary; each document reports how
    many of its tokens fall outside it — the tokenizer-prep diagnostic
    (what does a min-count cutoff cost, per document) every vocab
    build runs before committing to a size.

    One corpus token-count aggregate + one join back on the token key
    (hot stopwords are 1:1 with their count row — AQE-splittable) +
    one doc-keyed rollup.

    Output: (id, n_tokens, n_oov, oov_frac).
    """
    from etl_finance_pipeline_spark.functions.scalar import portable_round
    from etl_finance_pipeline_spark.functions.text import tokens

    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("_w"))
    counts = toks.groupBy("_w").agg(F.count("*").alias("_c"))
    return (
        toks.join(counts, "_w")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("_n"),
            F.sum(F.when(F.col("_c") < min_count, 1).otherwise(0)).alias(
                "_oov"
            ),
        )
        .select(
            F.col(id_col),
            F.col("_n").cast("long").alias("n_tokens"),
            F.col("_oov").cast("long").alias("n_oov"),
            portable_round(F.col("_oov") / F.col("_n"), round_digits).alias(
                "oov_frac"
            ),
        )
    )


# ---------------------------------------------------------------------
# HTML/markup text extraction (jusText-lite) — the curation funnel's
# stage 0. Every web pipeline (C4, RefinedWeb, FineWeb) starts from
# raw HTML; everything downstream (c4_clean, gopher_rules, dedup)
# assumes already-clean text. No reference counterpart.
# ---------------------------------------------------------------------

#: block-level tags that delimit candidate text blocks; inline tags
#: (<a>, <b>, <span>) stay INSIDE their block so anchor text can be
#: measured against the block that contains it. Non-capturing groups:
#: capture groups change split semantics in some engines.
HTML_BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|nav|footer|header|h[1-6]|li|ul|ol|br|title|body"
    r"|html|head|table|tr|td|th|section|article|aside|blockquote)"
    r"(?:\s[^>]*)?/?>"
)

#: invisible/markup-only regions removed wholesale before block
#: splitting, in order. Lazy quantifiers; RE2 ∩ Java-regex dialect so
#: the DuckDB oracle runs the identical chain.
HTML_STRIP_RES: tuple[str, ...] = (
    r"(?s)<!--.*?-->",
    r"(?is)<head[^>]*>.*?</head>",
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
)

_HTML_ANCHOR_RE = r"(?is)<a[^>]*>(.*?)</a>"
_HTML_TAG_RE = r"<[^>]*>"

#: default anchor-text share above which a block is boilerplate; the
#: oracle CTE builder reads THIS constant, so engine and twin cannot
#: drift apart.
HTML_MAX_LINK_DENSITY = 0.3

#: the common named/numeric entities real pages carry, unescaped in
#: THIS order — ``&amp;`` must come last or ``&amp;lt;`` would
#: double-unescape to ``<`` instead of the literal ``&lt;`` the page
#: encoded. ``&nbsp;`` becomes a plain space BEFORE whitespace
#: collapsing so it merges with neighboring runs. Literal (non-regex)
#: replaces in both engines.
HTML_ENTITY_RULES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _ws_norm(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
    max_link_density: float = HTML_MAX_LINK_DENSITY,
    block_joiner: str = " ",
) -> DataFrame:
    """jusText-lite main-text extraction (Pomikálek 2011's
    link-density heuristic, reduced to its deterministic core): strip
    comments, <head>, <script> and <style> regions; split the rest
    into blocks at block-level tags; keep a block iff its tag-stripped
    text is non-empty AND its anchor-text share is at most
    *max_link_density* (navigation, footers, share bars and ad units
    are link-dominated; body prose is not); unescape the common HTML
    entities (``HTML_ENTITY_RULES`` — ``&amp;`` last, so encoded
    entities round-trip correctly); re-join kept blocks with
    *block_joiner* (pass ``"\\n"`` to hand each block to a line-based
    downstream pass like :func:`c4_clean` as its own line).

    One whole-stage-codegen projection chain — regexp_replace cascade,
    one split, one transform-to-(text, keep)-struct per block (each
    block's features are computed exactly once — no HOF sibling
    re-evaluation), filter, array_join. Zero shuffles, zero UDFs; at
    100 TB this is a narrow map over the raw crawl.

    The density compare multiplies integer lengths by an IEEE double
    literal — bit-identical in any engine, so the DuckDB twin running
    the same chain is an exact oracle.

    Tag model: a regex over well-formed-ish markup (a '>' inside a
    quoted attribute value closes the tag early, as in every
    regex-based extractor). Malformed pages degrade to extra/merged
    blocks, never to an error — and both engines degrade identically,
    so the oracle contract holds on any input.

    Output: input columns + *out_col* (extracted text, possibly '').
    """
    h = F.col(html_col)
    for pat in HTML_STRIP_RES:
        h = F.regexp_replace(h, pat, " ")
    blocks = F.split(h, HTML_BLOCK_SPLIT_RE)

    def _unescape(c: Column) -> Column:
        for ent, rep in HTML_ENTITY_RULES:
            c = F.replace(c, F.lit(ent), F.lit(rep))
        return c

    def _feat(b: Column) -> Column:
        btext = _ws_norm(_unescape(F.regexp_replace(b, _HTML_TAG_RE, " ")))
        ltext = _ws_norm(
            _unescape(
                F.regexp_replace(
                    F.array_join(
                        F.regexp_extract_all(b, F.lit(_HTML_ANCHOR_RE), 1), " "
                    ),
                    _HTML_TAG_RE,
                    " ",
                )
            )
        )
        keep = (F.length(btext) > 0) & (
            F.length(ltext).cast("double")
            <= F.length(btext).cast("double") * F.lit(float(max_link_density))
        )
        return F.struct(btext.alias("t"), keep.alias("k"))

    structs = F.transform(blocks, _feat)
    # every kept block is non-empty and already ws-normalized, so the
    # join needs no final collapse — and a structural joiner (newline)
    # must survive untouched for line-based downstream passes
    out = F.array_join(
        F.transform(F.filter(structs, lambda s: s["k"]), lambda s: s["t"]),
        block_joiner,
    )
    return df.withColumn(out_col, out)


def synthesize_html(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "html",
) -> DataFrame:
    """Wrap fixture text in a deterministic HTML page — the same
    synthesize-the-payload-in-engine device the media lanes use for
    WAV/PNG/JPEG bytes (multimodal.py), applied to markup: a <head>
    with title/style/script, a nav bar, per-id variants (an
    entity-encoded prose block, an inline script + ad unit, or a
    comment + pagination list), the
    document text as body prose under an <h1>, a share bar, and a
    link-heavy footer. Every byte is a function of (id, text), so the
    DuckDB oracle concatenates the identical payload and the
    extraction contract can be verified end to end.

    Expected :func:`html_extract` output for this payload:
    ``Latest post {ws-normalized text}`` (variant 0 prepends the
    unescaped ``Q&A section <closed>`` block) — the <h1> is deliberately
    CONSTANT so exact-duplicate documents stay exact duplicates after
    extraction (the funnel's dedup stage runs downstream of this).

    The partners block (link-only, so jusText's density gate drops it
    from extraction) carries the page's CROSS-DOMAIN outlinks — an
    absolute partner link skewed toward lower-indexed domains, a
    protocol-relative mirror on ``id % 5 == 3``, and a purely relative
    local link on ``id % 3 == 0`` — giving :func:`link_extract` real
    anchors to resolve and the domain-authority PageRank a real crawl
    graph to consume (the CommonCrawl host-graph shape).
    """
    d = F.col(id_col)
    i = d.cast("string")
    partner = (F.floor(d / 20).cast("long") % (d % 20 + 1)).cast("string")
    partners = F.concat(
        F.lit('<div class="partners"><a href="https://src'),
        partner,
        F.lit('.com/p/'),
        (d % 100).cast("string"),
        F.lit('">Partner</a>'),
        F.when(
            d % 5 == 3,
            F.concat(
                F.lit(' <a href="//src'),
                ((d + 1) % 20).cast("string"),
                F.lit('.com/mirror">Mirror</a>'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit(' <a href="local/'),
                (d % 7).cast("string"),
                F.lit('">Local</a>'),
            ),
        ).otherwise(F.lit("")),
        # a paid placement: cross-domain but rel="nofollow" — the link
        # the ranking graph must NOT count (anchor_texts flags it,
        # domain_authority excludes it)
        F.when(
            d % 7 == 1,
            F.concat(
                F.lit(' <a href="https://src'),
                ((d * 3 + 5) % 20).cast("string"),
                F.lit('.com/ref" rel="nofollow">Sponsored</a>'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</div>"),
    )
    extra = (
        F.when(
            d % 3 == 1,
            F.lit(
                '<script>inline()</script>'
                '<div class="ad"><a href="/buy">Buy now</a></div>'
            ),
        )
        .when(
            d % 3 == 2,
            F.lit(
                '<!-- rendered 2026 -->'
                '<ul><li><a href="/p1">Prev</a></li>'
                '<li><a href="/p2">Next</a></li></ul>'
            ),
        )
        .otherwise(
            # variant 0: an entity-encoded prose block — the extractor
            # must unescape what the page encoded
            F.lit("<p>Q&amp;A section &lt;closed&gt;</p>")
        )
    )
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        i,
        F.lit(
            "</title><style>body{margin:0}</style>"
            "<script>var a=1;</script></head><body>"
            '<nav><a href="/">Home</a> <a href="/about">About</a> '
            '<a href="/tags">Tags</a></nav>'
        ),
        extra,
        F.lit('<h1>Latest post</h1><div class="main"><p>'),
        F.col(text_col),
        F.lit(
            '</p></div><div class="share"><a href="/s/tw">Tweet</a> '
            '<a href="/s/fb">Share</a></div>'
        ),
        partners,
        F.lit(
            '<footer><a href="/terms">Terms</a> '
            '<a href="/privacy">Privacy</a> (c) 2026 example.com</footer>'
            "</body></html>"
        ),
    )
    return df.withColumn(out_col, html)


def html_tables(
    df: DataFrame,
    id_cols: tuple[str, ...] = ("doc_id",),
    html_col: str = "html",
) -> DataFrame:
    """Structured-data extraction from page markup: every ``<table>``
    in the document unfolds into one row PER CELL — (table_idx,
    row_idx, col_idx, is_header, cell) — the standard path for
    table-QA / table-grounding training data (and the lane WebTables/
    TURL-style corpora are built from). Cell text is tag-stripped,
    entity-unescaped (``HTML_ENTITY_RULES``) and whitespace-normalized
    exactly like :func:`html_extract` blocks, so a cell carrying
    inline markup or encoded entities lands as clean text.

    Three chained regexp_extract_all + posexplode stages (tables →
    rows → cells) — all codegen, zero shuffles, zero UDFs; at 100 TB
    this rides the same payload scan as html_extract. The same
    regex-over-markup caveat applies: well-formed-ish tables parse
    exactly; nested tables degrade to the outer table's region
    (documented, both engines would degrade identically).

    Output: (*id_cols*, table_idx, row_idx, col_idx, is_header, cell).
    Documents without tables contribute no rows.
    """
    tables = F.regexp_extract_all(
        F.col(html_col), F.lit(r"(?is)<table[^>]*>(.*?)</table>"), 1
    )
    ids = [F.col(c) for c in id_cols]
    d1 = df.select(
        *ids, F.posexplode(tables).alias("table_idx", "_tbl")
    )
    rows = F.regexp_extract_all(
        F.col("_tbl"), F.lit(r"(?is)<tr[^>]*>(.*?)</tr>"), 1
    )
    d2 = d1.select(
        *ids, "table_idx", F.posexplode(rows).alias("row_idx", "_row")
    )
    # full-match extraction (group 0) keeps the tag name so <th> can
    # flag header cells after the fact
    cells = F.regexp_extract_all(
        F.col("_row"), F.lit(r"(?is)<t[dh][^>]*>.*?</t[dh]>"), 0
    )
    d3 = d2.select(
        *ids,
        "table_idx",
        "row_idx",
        F.posexplode(cells).alias("col_idx", "_cell"),
    )

    def _unescape(c: Column) -> Column:
        for ent, rep in HTML_ENTITY_RULES:
            c = F.replace(c, F.lit(ent), F.lit(rep))
        return c

    cell_text = _ws_norm(
        _unescape(F.regexp_replace(F.col("_cell"), _HTML_TAG_RE, " "))
    )
    return d3.select(
        *ids,
        "table_idx",
        "row_idx",
        "col_idx",
        F.lower(F.col("_cell")).startswith("<th").alias("is_header"),
        cell_text.alias("cell"),
    )


def synthesize_warc(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "html",
    url_col: str = "url",
    blob_col: str = "blob_id",
    out_col: str = "warc",
) -> DataFrame:
    """Wrap per-document payloads in deterministic WARC-style record
    envelopes and concatenate them into multi-record crawl blobs —
    the :func:`synthesize_html` payload device extended one framing
    level down (ISO 28500's response-record shape, reduced to its
    deterministic core: version line, named headers, Content-Length
    framing, double-CRLF terminators). Every byte is a function of
    (id, url, payload), so a DuckDB oracle concatenates the identical
    blob and the parse contract can be verified end to end.

    Content-Length counts CODE POINTS, not octets — both engines'
    ``length``/``substr`` are code-point-based, so the framing
    round-trips exactly in either; a real WARC writer counts octets.

    Records within a blob are concatenated in ascending id order (one
    aggregate; the blob grouping column is caller-supplied).

    Output: one row per blob — (blob_col, out_col).
    """
    rec = F.concat(
        F.lit(
            "WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:doc:"
        ),
        F.col(id_col).cast("string"),
        F.lit(">\r\nWARC-Target-URI: "),
        F.col(url_col),
        F.lit("\r\nContent-Length: "),
        F.length(payload_col).cast("string"),
        F.lit("\r\n\r\n"),
        F.col(payload_col),
        F.lit("\r\n\r\n"),
    )
    return (
        df.select(
            F.col(blob_col),
            F.struct(F.col(id_col).alias("_id"), rec.alias("_rec")).alias(
                "_s"
            ),
        )
        .groupBy(blob_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("_s")), lambda s: s["_rec"]
                ),
                "",
            ).alias(out_col)
        )
    )


def warc_parse(
    df: DataFrame,
    warc_col: str = "warc",
) -> DataFrame:
    """Parse multi-record WARC-style crawl blobs back into one row
    per record: split at the record magic (``WARC/1.0`` + CRLF),
    read the named headers, and recover the payload by
    CONTENT-LENGTH FRAMING from the header terminator (double CRLF)
    — with a per-record ``length_ok`` flag comparing the framed
    extent against the record's actual extent, so truncated or
    corrupt framing is quarantinable rather than silent.

    One narrow projection chain (split → transform → explode): zero
    shuffles, zero UDFs — at 100 TB this is stage −1's map over raw
    crawl files. Degradation contract as in :func:`html_extract`: a
    payload containing the record magic splits early in ANY
    string-primitive engine, and both engines degrade identically.
    Header parsing is TRY semantics — a fragment missing its
    Content-Length / record-id headers (the other half of an
    adversarial split) yields NULL fields and ``length_ok = false``,
    never a cast error — so the oracle holds and the lane stays
    fail-visible on ANY input.

    Output: (doc_id, uri, content_length, length_ok, payload).
    """
    recs = F.filter(
        F.split(F.col(warc_col), "WARC/1\\.0\r\n"),
        lambda r: F.length(r) > 0,
    )

    def _num(r: Column, pat: str) -> Column:
        s = F.regexp_extract(r, pat, 1)
        return F.when(s != "", s.cast("long"))  # NULL when absent

    def _parse(r: Column) -> Column:
        p = F.instr(r, "\r\n\r\n")
        cl = _num(r, "Content-Length: ([0-9]+)")
        return F.struct(
            _num(r, "<urn:doc:([0-9]+)>").alias("doc_id"),
            F.regexp_extract(r, "WARC-Target-URI: ([^\r]+)", 1).alias("uri"),
            cl.alias("content_length"),
            r.substr(p + F.lit(4), F.coalesce(cl, F.lit(0))).alias(
                "payload"
            ),
            F.coalesce(
                F.length(r) == p + F.lit(7) + cl, F.lit(False)
            ).alias("length_ok"),
        )

    return df.select(
        F.explode(F.transform(recs, _parse)).alias("_r")
    ).select("_r.*")


def pack_bins(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    seq_tokens: int = 2048,
    num_shards: int = 8,
    shard_col: str | None = None,
) -> DataFrame:
    """First-fit-decreasing bin packing per shard WITHOUT splitting
    documents — the packer real pretraining pipelines want when a
    document must not straddle a sequence boundary (contrast
    :func:`pack_sequences`, the concat-and-split layout). Documents
    are hash-sharded (same deterministic shard as pack_sequences),
    then each shard runs the classic FFD walk: sort by
    (tokens desc, id asc), place each document into the FIRST open
    bin with room, else open a new bin. A document longer than
    *seq_tokens* gets a bin of its own (reported overfull rather
    than split or dropped — the caller's length filter runs
    upstream).

    The walk is inherently sequential IN ITS SHARD, so shards are
    the parallelism unit (size num_shards ≥ cluster cores at scale).
    One shuffle to group by shard; the kernel is an Arrow-batched
    applyInPandas — pure integer arithmetic, deterministic,
    replayable by a recursive-CTE oracle walking the identical order.
    Pass *shard_col* to pack WITHIN a precomputed shard assignment
    (e.g. shuffle_shard's output) instead of the built-in id hash —
    the pack_sequences injection point, mirrored.

    The first-fit scan window holds only bins that can still accept
    the SMALLEST remaining document: sizes are sorted descending, so
    that minimum is a constant of the shard, and any bin whose
    residual capacity drops below it can never receive another
    document — it is retired from the window the moment it crosses
    the cutoff. Cost is O(docs × active bins), not O(docs × bins
    ever opened); with near-capacity documents the window stays O(1).

    Rows with a NULL or NEGATIVE token count are dropped up front: a
    negative count would make ``cap - t`` exceed the capacity and
    silently corrupt every later placement in its bin, so it is
    treated as invalid input, never packed.

    Output: (shard, bin_id, id, n_tokens, bin_fill) — bin_id is
    0-based per shard; bin_fill is the bin's FINAL fill, repeated on
    every member row (the per-bin efficiency readout without a
    second join).
    """
    import pandas as pd

    cap = int(seq_tokens)
    if shard_col is None:
        shard = F.pmod(
            portable_hash64(F.col(id_col).cast("string")), num_shards
        )
    else:
        shard = F.col(shard_col)
    src = df.filter(
        F.col(tokens_col).isNotNull() & (F.col(tokens_col) >= 0)
    ).select(
        shard.cast("int").alias("shard"),
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )
    id_type = src.schema[id_col].dataType.simpleString()
    out_schema = (
        f"shard int, bin_id long, {id_col} {id_type}, "
        "n_tokens long, bin_fill long"
    )

    def _ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        n = len(pdf)
        fills = np.zeros(n, dtype=np.int64)  # final fill, by bin id
        bins = np.empty(n, dtype=np.int64)
        nbins = 0
        toks = pdf["n_tokens"].to_numpy(dtype=np.int64)
        # retirement cutoff: a bin with residual < the smallest
        # remaining size never fits anything again (desc order makes
        # the minimum constant); the scan window (act_*) keeps only
        # live bins, in opening order, so first-fit stays exact
        t_min = int(toks[n - 1]) if n else 0
        act_ids = np.empty(n, dtype=np.int64)
        act_fills = np.empty(n, dtype=np.int64)
        nact = 0
        for i in range(n):
            t = toks[i]
            # "first open bin" is one argmax over a boolean mask of
            # the ACTIVE window — vectorized, ~100× lower constant
            # than a Python loop over bins
            ok = act_fills[:nact] <= cap - t
            if ok.any():
                j = int(ok.argmax())
                b = int(act_ids[j])
                fills[b] += t
                if fills[b] > cap - t_min:  # retire: shift window
                    act_ids[j : nact - 1] = act_ids[j + 1 : nact]
                    act_fills[j : nact - 1] = act_fills[j + 1 : nact]
                    nact -= 1
                else:
                    act_fills[j] = fills[b]
            else:
                b = nbins
                fills[b] = t
                nbins += 1
                if t <= cap - t_min:
                    act_ids[nact] = b
                    act_fills[nact] = t
                    nact += 1
            bins[i] = b
        pdf["bin_id"] = bins
        pdf["bin_fill"] = fills[bins]
        return pdf[["shard", "bin_id", id_col, "n_tokens", "bin_fill"]]

    return src.groupBy("shard").applyInPandas(_ffd, out_schema)
