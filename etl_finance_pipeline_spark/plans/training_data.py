"""Training-data pipeline queries + DuckDB oracles: near-dup detection
(MinHash LSH / SimHash / exact n-gram Jaccard), LSH similarity search,
text analysis (lang-ID, quality, token counts, winnowing
fingerprints).

Oracle SQL is generated from the SAME module constants the Spark
operators use (MINHASH_COEFFS, HYPERPLANES, STOPWORDS) so sketches
match bit-for-bit.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_finance_pipeline_spark.functions.scalar import portable_round as _pr
from etl_finance_pipeline_spark.functions.text import LANG_PRIORITY, STOPWORDS
from etl_finance_pipeline_spark.operators.dedup import (
    MINHASH_COEFFS,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from etl_finance_pipeline_spark.operators.similarity import (
    HYPERPLANES,
    embedding_near_duplicates,
    lsh_ann_topk,
)
from etl_finance_pipeline_spark.operators.text_analysis import (
    language_id,
    quality_score,
    repetition_stats,
    token_counts,
    unigram_logprob,
    winnowing_fingerprints,
)
from etl_finance_pipeline_spark.sources.tables import load_table
from etl_finance_pipeline_spark.streaming.sink import (
    await_stream as _await_stream,
)

M31 = 2_147_483_647


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _docs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table, :func:`fan_out`-spread across the
    session's cores when its scan would underfill them (guide §2.5
    input skew: the bench fixture is ONE small parquet file, so every
    narrow regex/shingle/encode kernel otherwise runs as a single
    task on local[32]). Structural no-op at production scale — see
    functions/layout.py. Use ONLY for queries whose cost is a
    compute-heavy narrow chain over the text payload; aggregate-only
    lanes lose more to the extra exchange than they gain (measured
    +0.1–0.4 s at sf0.1 on e.g. exact_dedup_docs / candles-style
    lanes, vs −30–60 % on regex/codec/encode lanes)."""
    from etl_finance_pipeline_spark.functions.layout import fan_out

    return fan_out(load_table(spark, _t(sf_dir, "documents")))


_NARROW_SESSIONS: dict[tuple[str, int], SparkSession] = {}


def _narrow_session(spark: SparkSession, shuffle_partitions: int = 8) -> SparkSession:
    """Isolated session clone (shared SparkContext + table cache,
    separate SQLConf) pinned to a narrow shuffle width. Stateful
    streaming sinks keep one state store per shuffle partition, so a
    single availableNow microbatch pays per-partition fixed cost;
    likewise multi-round iterative joins on tiny graphs. Cloning the
    session scopes the override to the one query instead of mutating
    (and racing on) the caller's global conf. Builder-time configs
    (UTC, AQE, nanosAsLong, ...) live in the shared SparkContext conf
    and carry over.

    Clones are cached per (application, width): a fresh clone pays
    cold-SQLConf + relation re-resolution on every call (measured
    ~0.3-0.9 s per streaming query), and the clone is never mutated
    after creation so reuse is safe. Keyed by applicationId — a
    restarted context gets fresh clones, not stale ones."""
    key = (spark.sparkContext.applicationId, shuffle_partitions)
    s = _NARROW_SESSIONS.get(key)
    if s is None:
        s = spark.newSession()
        s.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        _NARROW_SESSIONS[key] = s
    return s


def _stream_fanout_width(spark: SparkSession, cap: int = 64) -> int:
    """Fan-out width for a CPU-bound projection inside a stateless
    availableNow microbatch: the session's core count (that IS the
    available parallelism for the regex/codec work), capped — a
    single microbatch pays per-partition task-launch fixed cost, so
    width beyond the executor pool only adds overhead. Derived, not
    hardcoded, so the fix scales past the local[32] sandbox."""
    return max(2, min(spark.sparkContext.defaultParallelism, cap))


def _read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream source over the events table with timestamps
    normalized to TimestampType — the same two repairs ``load_table``
    applies on the batch side (epoch-nanos longs, and TIMESTAMP_NTZ
    from naive-micros parquet). ``withWatermark`` hard-fails on NTZ
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so streaming readers must
    normalize before any event-time operator."""
    from etl_finance_pipeline_spark.sources.tables import (
        ensure_nanos_conf,
        normalize_ntz,
    )

    ensure_nanos_conf(spark)
    path = _t(sf_dir, "events")
    schema = spark.read.parquet(path).schema
    # FileStreamSource needs a dir/glob — [t] makes the file a glob
    stream = spark.readStream.schema(schema).parquet(path[:-1] + "[t]")
    dtype = {f.name: f.dataType.simpleString() for f in schema.fields}
    if dtype.get("ts") == "bigint":  # TIMESTAMP(NANOS) read as long
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return normalize_ntz(stream)


# --------------------------------------------------------------------
# Shared SQL fragments (generated from the operator constants)
# --------------------------------------------------------------------

_H64 = "CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"

_SHINGLES_CTE = """
tokd AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
  FROM tokd
)
"""

_SIG_COLS = ",\n    ".join(
    f"min(({a} * h31 + {b}) % {M31}) AS m{j}"
    for j, (a, b) in enumerate(MINHASH_COEFFS)
)

_SIG_CTE = f"""
h AS (
  SELECT doc_id, {_H64.format(s='shingle')} % {M31} AS h31 FROM sh
),
sig AS (
  SELECT doc_id,
    {_SIG_COLS}
  FROM h GROUP BY doc_id
)
"""

_BANDS_SQL = "\nUNION ALL\n".join(
    f"SELECT doc_id, {b} AS band, m{4*b} AS k1, m{4*b+1} AS k2, m{4*b+2} AS k3, m{4*b+3} AS k4 FROM sig"
    for b in range(4)
)


# --------------------------------------------------------------------
# MinHash LSH near-dup candidates
# --------------------------------------------------------------------

def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_spread(spark, sf_dir)
    out = minhash_lsh_pairs(docs, num_hashes=16, bands=4)
    return out.select("id_a", "id_b", _pr("est_jaccard", 6).alias("est_jaccard"))


_EQ_TERMS = " + ".join(
    f"CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END" for j in range(16)
)

SQL_MINHASH_LSH_PAIRS = f"""
WITH {_SHINGLES_CTE.strip()},
{_SIG_CTE.strip()},
bands AS (
  {_BANDS_SQL}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, k1, k2, k3, k4)
  WHERE a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       floor((({_EQ_TERMS}) / 16.0) * 1000000 + 0.5) / 1000000 AS est_jaccard
FROM cand c
JOIN sig a ON a.doc_id = c.id_a
JOIN sig b ON b.doc_id = c.id_b
"""


def q_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest dedup shape: documents with doc_id % 10 == 0 play
    the incoming batch, the rest the standing corpus. The banded batch
    broadcasts; the corpus never shuffles."""
    from etl_finance_pipeline_spark.operators.dedup import incremental_lsh_pairs

    docs = _docs_spread(spark, sf_dir)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    out = incremental_lsh_pairs(batch, corpus)
    return out.select(
        "batch_id", "corpus_id", _pr("est_jaccard", 6).alias("est_jaccard")
    )


_EQ_TERMS_BC = " + ".join(
    f"CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END" for j in range(16)
)

SQL_INCREMENTAL_NEAR_DUP = f"""
WITH {_SHINGLES_CTE.strip()},
{_SIG_CTE.strip()},
bands AS (
  {_BANDS_SQL}
),
cand AS (
  SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
  FROM bands a JOIN bands b USING (band, k1, k2, k3, k4)
  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 != 0
)
SELECT c.batch_id, c.corpus_id,
       floor((({_EQ_TERMS_BC}) / 16.0) * 1000000 + 0.5) / 1000000 AS est_jaccard
FROM cand c
JOIN sig a ON a.doc_id = c.batch_id
JOIN sig b ON b.doc_id = c.corpus_id
"""


# --------------------------------------------------------------------
# SimHash near-dup pairs
# --------------------------------------------------------------------

def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_hamming=3 with bands=4: the pigeonhole guarantee makes
    candidate recall EXACT (any pair at distance ≤ 3 must agree on at
    least one 8-bit band) — so the skew guard is disabled to honor the
    lossless contract (the oracle bands but never drops buckets)."""
    docs = _docs_spread(spark, sf_dir)
    return simhash_pairs(
        docs, bits=32, bands=4, max_hamming=3, max_bucket_size=None
    ).select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


_BIT_SUMS = ",\n    ".join(
    f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}" for i in range(32)
)
_FP_TERMS = " + ".join(
    f"CASE WHEN s{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END" for i in range(32)
)
_SIM_BANDS = "\nUNION ALL\n".join(
    f"SELECT doc_id, {b} AS band, (simhash >> {8*b}) & 255 AS key FROM fp"
    for b in range(4)
)

SQL_SIMHASH_PAIRS = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
  FROM documents
),
h AS (
  SELECT doc_id, {_H64.format(s='t')} AS h FROM tok
),
s AS (
  SELECT doc_id,
    {_BIT_SUMS}
  FROM h GROUP BY doc_id
),
fp AS (
  SELECT doc_id, {_FP_TERMS} AS simhash FROM s
),
bands AS (
  {_SIM_BANDS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, key)
  WHERE a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b, CAST(bit_count(xor(fa.simhash, fb.simhash)) AS BIGINT) AS hamming
FROM cand c
JOIN fp fa ON fa.doc_id = c.id_a
JOIN fp fb ON fb.doc_id = c.id_b
WHERE bit_count(xor(fa.simhash, fb.simhash)) <= 3
"""


# --------------------------------------------------------------------
# Exact n-gram Jaccard pairs
# --------------------------------------------------------------------

def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_spread(spark, sf_dir)
    return ngram_jaccard_pairs(docs, threshold=0.5).select(
        "id_a", "id_b", _pr("jaccard", 6).alias("jaccard")
    )


SQL_NGRAM_JACCARD = f"""
WITH {_SHINGLES_CTE.strip()},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       floor((c * 1.0 / (na.n + nb.n - c)) * 1000000 + 0.5) / 1000000 AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE c * 1.0 / (na.n + nb.n - c) >= 0.5
"""


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder containment C(A→B) = |S(A)∩S(B)|/|S(A)| >= 0.4 — the
    asymmetric quote/extraction detector (a short doc lifted into a
    long one scores ~1 here while its Jaccard stays tiny). Directed
    pairs, exact arithmetic, same verify-stage contract as
    ngram_jaccard."""
    from etl_finance_pipeline_spark.operators.dedup import containment_pairs

    docs = _docs_spread(spark, sf_dir)
    out = containment_pairs(docs, threshold=0.4)
    return out.select(
        "id_a", "id_b", _pr("containment", 6).alias("containment")
    )


SQL_CONTAINMENT_PAIRS = f"""
WITH {_SHINGLES_CTE.strip()},
csizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
cinter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id != b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       floor((c * 1.0 / na.n) * 1000000 + 0.5) / 1000000 AS containment
FROM cinter
JOIN csizes na ON na.doc_id = id_a
WHERE c * 1.0 / na.n >= 0.4
"""


def q_set_similarity_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join at shingle-Jaccard >= 0.5 via
    prefix filtering (PPJoin/AllPairs family) — no LSH, no false
    negatives: the exact-algorithm counterpart to ngram_jaccard's
    LSH-scoped verify. The oracle is the INDEPENDENT brute-force
    formulation (all-pairs shingle intersection in DuckDB), so the
    check proves the prefix filter loses nothing — the same
    equality-of-formulations device the triangles oracle uses."""
    from etl_finance_pipeline_spark.operators.dedup import set_similarity_join

    docs = _docs_spread(spark, sf_dir)
    out = set_similarity_join(docs, threshold=0.5, shingle_k=3)
    return out.select("id_a", "id_b", "jaccard")


SQL_SET_SIMILARITY_EXACT = f"""
WITH {_SHINGLES_CTE.strip()},
hs AS (SELECT DISTINCT doc_id, {_H64.format(s='shingle')} AS tok FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM hs GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM hs a JOIN hs b USING (tok)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       floor((c * 1.0 / (na.n + nb.n - c)) * 1000000 + 0.5) / 1000000 AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE c * 2 >= (na.n + nb.n - c)
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: the eval set (doc_id < 5 stands in
    for a held-out benchmark) reduces to its distinct 3-gram shingles,
    broadcast onto one pass over the corpus; each document reports its
    shingle-overlap fraction and a contamination flag at 0.3. The eval
    docs themselves score 1.0 — exactly what the downstream drop
    filter removes."""
    from etl_finance_pipeline_spark.operators.dedup import decontaminate

    docs = load_table(spark, _t(sf_dir, "documents"))
    out = decontaminate(docs, docs.filter(F.col("doc_id") < 5), max_overlap=0.3)
    return out.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        _pr("overlap", 6).alias("overlap"),
        "contaminated",
    )


SQL_DECONTAMINATE = f"""
WITH {_SHINGLES_CTE.strip()},
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 5),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
hits AS (
  SELECT sh.doc_id, count(*) AS n_overlap
  FROM sh JOIN ev USING (shingle)
  GROUP BY 1
)
SELECT s.doc_id,
       CAST(s.n_shingles AS BIGINT) AS n_shingles,
       CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       floor((COALESCE(h.n_overlap, 0) * 1.0 / s.n_shingles) * 1000000 + 0.5) / 1000000 AS overlap,
       (COALESCE(h.n_overlap, 0) * 1.0 / s.n_shingles) >= 0.3 AS contaminated
FROM sizes s LEFT JOIN hits h ON h.doc_id = s.doc_id
"""


# --------------------------------------------------------------------
# Corpus preparation: chunking, PII redaction, deterministic sampling
# --------------------------------------------------------------------

def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """200-char chunks, 50-char overlap — the pre-embedding window."""
    from etl_finance_pipeline_spark.operators.corpus import chunk_documents

    docs = load_table(spark, _t(sf_dir, "documents"))
    return chunk_documents(docs, chunk_chars=200, overlap=50)


SQL_CHUNK_DOCS = """
WITH n AS (
  SELECT doc_id, text, length(text) AS len FROM documents
), c AS (
  SELECT doc_id, text,
         unnest(generate_series(
           0, CAST(floor(greatest((len + 99) / 150.0, 1)) AS BIGINT) - 1
         )) AS chunk_id
  FROM n
)
SELECT doc_id, chunk_id,
       CAST(chunk_id * 150 + 1 AS INT) AS chunk_start,
       substr(text, CAST(chunk_id * 150 + 1 AS INT), 200) AS chunk_text
FROM c
"""


def q_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus. The driver tables carry no PII,
    so every 7th document gets a synthetic contact line appended (same
    injection in the oracle) — the redaction itself is then exercised
    for real: emails, phones and IPs replaced with typed tags and
    counted."""
    from etl_finance_pipeline_spark.operators.corpus import redact_pii

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact: user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-123-4567 at 10.0.0.1"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return redact_pii(docs)


SQL_REDACT_DOCS = r"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact: user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or 555-123-4567 at 10.0.0.1'
              ELSE text END AS text
  FROM documents
), r0 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_redacted_0,
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS text
  FROM d
), r1 AS (
  SELECT doc_id, n_redacted_0,
         len(regexp_extract_all(text, '\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}')) AS n_redacted_1,
         regexp_replace(text, '\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}', '[PHONE]', 'g') AS text
  FROM r0
)
SELECT doc_id,
       regexp_replace(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g') AS text,
       CAST(n_redacted_0 AS INT) AS n_redacted_0,
       CAST(n_redacted_1 AS INT) AS n_redacted_1,
       CAST(len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_redacted_2
FROM r1
"""


def q_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: 50% of en, 25% of de, 10% of
    everything else, hash-gated on doc_id."""
    from etl_finance_pipeline_spark.operators.corpus import stratified_sample

    docs = load_table(spark, _t(sf_dir, "documents"))
    return stratified_sample(
        docs, "doc_id", {"en": 0.5, "de": 0.25}, "lang", default_fraction=0.1
    ).select("doc_id", "lang", "source")


SQL_SAMPLE_DOCS = f"""
SELECT doc_id, lang, source FROM documents
WHERE {_H64.format(s="CAST(doc_id AS VARCHAR)")} % 1000000 <
      CAST(floor((CASE WHEN lang = 'en' THEN 0.5
                       WHEN lang = 'de' THEN 0.25
                       ELSE 0.1 END) * 1000000) AS BIGINT)
"""


def q_prep_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus prep: stratified sample → PII redaction →
    chunking — the composed front half of a training-data pipeline,
    all pure projections/filters except the chunk explode (narrow, no
    shuffle end to end)."""
    from etl_finance_pipeline_spark.operators.corpus import (
        chunk_documents,
        redact_pii,
        stratified_sample,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    sampled = stratified_sample(
        docs, "doc_id", {"en": 0.5, "de": 0.25}, "lang", default_fraction=0.1
    ).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact: user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    clean = redact_pii(sampled).select("doc_id", "text")
    return chunk_documents(clean, chunk_chars=200, overlap=50)


SQL_PREP_CORPUS = f"""
WITH sampled AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact: user' || CAST(doc_id AS VARCHAR) || '@example.com'
              ELSE text END AS text
  FROM documents
  WHERE {_H64.format(s="CAST(doc_id AS VARCHAR)")} % 1000000 <
        CAST(floor((CASE WHEN lang = 'en' THEN 0.5
                         WHEN lang = 'de' THEN 0.25
                         ELSE 0.1 END) * 1000000) AS BIGINT)
), clean AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
             '\\+?[0-9]{{3}}[- ][0-9]{{3}}[- ][0-9]{{4}}', '[PHONE]', 'g'),
           '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b', '[IP]', 'g'
         ) AS text
  FROM sampled
), n AS (
  SELECT doc_id, text, length(text) AS len FROM clean
), c AS (
  SELECT doc_id, text,
         unnest(generate_series(
           0, CAST(floor(greatest((len + 99) / 150.0, 1)) AS BIGINT) - 1
         )) AS chunk_id
  FROM n
)
SELECT doc_id, chunk_id,
       CAST(chunk_id * 150 + 1 AS INT) AS chunk_start,
       substr(text, CAST(chunk_id * 150 + 1 AS INT), 200) AS chunk_text
FROM c
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing over whitespace token counts: 4 shards,
    256-token sequences."""
    from etl_finance_pipeline_spark.operators.corpus import pack_sequences

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        "doc_id", F.size(F.split(F.col("text"), r"\s+")).alias("n_tokens")
    )
    return pack_sequences(docs, seq_tokens=256, num_shards=4)


SQL_PACK_SEQUENCES = f"""
WITH tok AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens,
         {_H64.format(s="CAST(doc_id AS VARCHAR)")} % 4 AS shard
  FROM documents
), c AS (
  SELECT shard, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens AS start
  FROM tok
)
SELECT shard, CAST(floor(start / 256.0) AS BIGINT) AS seq_id,
       doc_id, n_tokens,
       CAST(start % 256 AS BIGINT) AS seq_offset
FROM c
"""


def q_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing bin packing (no document splitting): 4
    shards, 256-token bins over whitespace token counts — the
    document-preserving alternative to pack_sequences' concat-split
    layout. The oracle replays the IDENTICAL greedy walk with a
    recursive CTE whose state row carries each shard's open-bin fill
    vector as a list (one successor per shard per step — the
    WordPiece-walk device with vector state)."""
    from etl_finance_pipeline_spark.operators.corpus import pack_bins

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        "doc_id", F.size(F.split(F.col("text"), r"\s+")).alias("n_tokens")
    )
    return pack_bins(docs, seq_tokens=256, num_shards=4)


def _pack_bins_ctes(p: str, src: str, cap: int) -> str:
    """Recursive FFD-walk CTE chain over CTE *src* exposing
    (shard, doc_id, n_tokens) → ``{p}out(shard, bin_id, doc_id,
    n_tokens, bin_fill)``: one successor per shard per step, the
    shard's open-bin fill vector carried as a LIST column in the
    recursion state (the WordPiece-walk device with vector state).
    Must live under a ``WITH RECURSIVE`` header."""
    fit = (
        "(list_filter(generate_series(1, len(w.fills)),"
        f" j -> w.fills[j] + r.n_tokens <= {cap}))[1]"
    )
    fit2 = fit.replace("j ->", "j2 ->").replace("fills[j]", "fills[j2]")
    return f"""{p}r AS MATERIALIZED (
  -- MATERIALIZED: this CTE is scanned once per recursion step; an
  -- inlined definition would re-run the whole upstream chain (e.g.
  -- the k-means unroll in semantic_pack) on every step
  SELECT shard, doc_id, n_tokens,
         row_number() OVER (PARTITION BY shard ORDER BY n_tokens DESC, doc_id) AS rnk
  FROM {src}
),
{p}n AS (SELECT shard, count(*) AS n FROM {p}r GROUP BY 1),
{p}w AS (
  SELECT shard, 0 AS i, CAST(NULL AS BIGINT) AS doc_id,
         CAST(NULL AS BIGINT) AS n_tokens, CAST(NULL AS BIGINT) AS bin_id,
         CAST([] AS BIGINT[]) AS fills
  FROM {p}n
  UNION ALL
  SELECT w.shard, w.i + 1, r.doc_id, r.n_tokens,
         CAST(coalesce({fit}, len(w.fills) + 1) - 1 AS BIGINT) AS bin_id,
         list_transform(
           generate_series(1, greatest(CAST(len(w.fills) AS BIGINT),
                                       coalesce({fit}, len(w.fills) + 1))),
           j -> CASE WHEN j = coalesce({fit2}, len(w.fills) + 1)
                     THEN coalesce(w.fills[j], CAST(0 AS BIGINT)) + r.n_tokens
                     ELSE w.fills[j] END) AS fills
  FROM {p}w w JOIN {p}r r ON r.shard = w.shard AND r.rnk = w.i + 1
),
{p}l AS (
  SELECT w.shard, w.fills
  FROM {p}w w JOIN {p}n ON {p}n.shard = w.shard
  WHERE w.i = {p}n.n
),
{p}out AS (
  SELECT a.shard, a.bin_id, a.doc_id, a.n_tokens,
         l.fills[CAST(a.bin_id + 1 AS INT)] AS bin_fill
  FROM {p}w a JOIN {p}l l ON l.shard = a.shard
  WHERE a.i > 0
)"""


SQL_PACK_BINS = f"""
WITH RECURSIVE pbt AS (
  SELECT CAST({_H64.format(s="CAST(doc_id AS VARCHAR)")} % 4 AS INT) AS shard,
         doc_id,
         CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
{_pack_bins_ctes("pb", "pbt", 256)}
SELECT shard, bin_id, doc_id, n_tokens, bin_fill FROM pbout
"""


def q_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle of the corpus into 8 shards with
    per-shard positions (seeded, engine-portable)."""
    from etl_finance_pipeline_spark.operators.corpus import shuffle_shard

    docs = load_table(spark, _t(sf_dir, "documents")).select("doc_id", "lang")
    return shuffle_shard(docs, num_shards=8, seed=1).select(
        "doc_id", "lang", "shard", "position"
    )


SQL_SHUFFLE_SHARD = f"""
WITH k AS (
  SELECT doc_id, lang,
         {_H64.format(s="CAST(doc_id AS VARCHAR) || '#shuffle1'")} AS _skey
  FROM documents
)
SELECT doc_id, lang, CAST(_skey % 8 AS INT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY _skey % 8 ORDER BY _skey, doc_id
       ) - 1 AS BIGINT) AS position
FROM k
"""


def q_training_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-batch layout pipeline composed END-TO-END: token
    filter (10–500 whitespace tokens) → deterministic global shuffle
    into 4 shards → sequence packing of 512-token sequences IN
    SHUFFLED ORDER (pack_sequences consumes shuffle_shard's
    (shard, position) instead of re-sharding by id). One chain of two
    window passes over the same shard partitioning — the second sort
    reuses the first's shuffle."""
    from etl_finance_pipeline_spark.operators.corpus import (
        pack_sequences,
        shuffle_shard,
    )

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        "doc_id", F.size(F.split(F.col("text"), r"\s+")).alias("n_tokens")
    )
    filtered = docs.filter(F.col("n_tokens").between(10, 500))
    shuffled = shuffle_shard(filtered, num_shards=4, seed=7)
    packed = pack_sequences(
        shuffled,
        seq_tokens=512,
        shard_col="shard",
        order_col="position",
    )
    return packed.select(
        F.col("shard").cast("int").alias("shard"),
        "seq_id",
        "doc_id",
        "n_tokens",
        "seq_offset",
    )


SQL_TRAINING_BATCHES = f"""
WITH tok AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
), filt AS (
  SELECT * FROM tok WHERE n_tokens BETWEEN 10 AND 500
), sh AS (
  SELECT doc_id, n_tokens,
         {_H64.format(s="CAST(doc_id AS VARCHAR) || '#shuffle7'")} AS _skey
  FROM filt
), pos AS (
  SELECT doc_id, n_tokens, CAST(_skey % 4 AS INT) AS shard,
         row_number() OVER (PARTITION BY _skey % 4 ORDER BY _skey, doc_id) - 1
           AS position
  FROM sh
), c AS (
  SELECT shard, doc_id, n_tokens,
         sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY position, doc_id
         ) - n_tokens AS start
  FROM pos
)
SELECT shard, CAST(floor(start / 512.0) AS BIGINT) AS seq_id,
       doc_id, n_tokens, CAST(start % 512 AS BIGINT) AS seq_offset
FROM c
"""


# --------------------------------------------------------------------
# Language ID
# --------------------------------------------------------------------

def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, _t(sf_dir, "documents"))
    out = language_id(docs)
    return out.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.col("pred_lang"),
        F.col("pred_lang_score").cast("long").alias("score"),
    )


def _stop_list(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS[lang])


_LANG_SCORES = ",\n    ".join(
    f"len(list_filter(toks, t -> t IN ({_stop_list(lang)}))) AS s_{lang}"
    for lang in LANG_PRIORITY
)
_BEST = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_PRIORITY) + ")"
_PRED_CHAIN = "CASE WHEN " + _BEST + " = 0 THEN 'und' " + " ".join(
    f"WHEN s_{lang} = {_BEST} THEN '{lang}'" for lang in LANG_PRIORITY
) + " END"

SQL_LANG_ID = f"""
WITH tokd AS (
  SELECT doc_id, lang, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
scored AS (
  SELECT doc_id, lang,
    {_LANG_SCORES}
  FROM tokd
)
SELECT doc_id, lang AS labeled_lang,
       {_PRED_CHAIN} AS pred_lang,
       CAST({_BEST} AS BIGINT) AS score
FROM scored
"""


# --------------------------------------------------------------------
# Character-encoding audit (decode-failure quarantine gate)
# --------------------------------------------------------------------

#: corruption artifacts injected into deterministic fixture slices
#: (the fixture text is clean ASCII, so — as with the OOV glyphs —
#: the corrupt input is synthesized in-engine): classic mojibake for
#: doc_id % 11, a U+FFFD replacement char for % 13, a C0 control
#: char (BEL) for % 17
_ENC_MOJI_SAMPLE = " cafÃ© â€œq"
_ENC_REPL_SAMPLE = " �"


def q_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding sanity audit over a corpus with synthesized decode
    damage: replacement-char / control-char / mojibake counts and the
    enc_suspect quarantine flag (operators/text_analysis.py:
    encoding_audit). The decoration is deterministic per doc_id, so
    the oracle decorates identically and the flag set is exact."""
    from etl_finance_pipeline_spark.operators.text_analysis import (
        encoding_audit,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    d = F.col("doc_id")
    dec = F.concat(
        F.col("text"),
        F.when(d % 11 == 0, F.lit(_ENC_MOJI_SAMPLE)).otherwise(F.lit("")),
        F.when(d % 13 == 0, F.lit(_ENC_REPL_SAMPLE)).otherwise(F.lit("")),
        F.when(d % 17 == 0, F.lit("\x07")).otherwise(F.lit("")),
    )
    return encoding_audit(docs.withColumn("text", dec))


SQL_ENCODING_AUDIT = f"""
WITH encd AS (
  SELECT doc_id,
         text
         || (CASE WHEN doc_id % 11 = 0 THEN '{_ENC_MOJI_SAMPLE}' ELSE '' END)
         || (CASE WHEN doc_id % 13 = 0 THEN '{_ENC_REPL_SAMPLE}' ELSE '' END)
         || (CASE WHEN doc_id % 17 = 0 THEN chr(7) ELSE '' END) AS text
  FROM documents
),
encc AS (
  SELECT doc_id,
    CAST(len(text) AS BIGINT) AS n_chars,
    CAST(len(text) - len(replace(text, chr(65533), '')) AS BIGINT) AS repl_chars,
    CAST(len(text) - len(regexp_replace(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')) AS BIGINT) AS ctrl_chars,
    CAST((len(text) - len(replace(text, 'Ã', '')))
         + (len(text) - len(replace(text, 'â€', ''))) / 2 AS BIGINT) AS moji_marks,
    CAST(len(text) - len(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')) AS BIGINT) AS non_ascii_chars
  FROM encd
)
SELECT doc_id, n_chars, repl_chars, ctrl_chars, moji_marks, non_ascii_chars,
       (repl_chars > 0 OR ctrl_chars > 0 OR moji_marks > 0) AS enc_suspect
FROM encc
"""


def q_stream_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encoding quarantine gate ON THE INGEST STREAM — where a
    real pipeline runs it (corrupt bytes should never reach the
    standing tables): the same decorated corpus through the same
    stateless narrow projection, append mode, no state store. Oracle
    = the batch audit, because the lane is a pure per-row map."""
    import uuid

    from etl_finance_pipeline_spark.operators.text_analysis import (
        encoding_audit,
    )
    from etl_finance_pipeline_spark.sources.tables import ensure_nanos_conf

    spark = _narrow_session(spark, 8)
    ensure_nanos_conf(spark)
    path = _t(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path[:-1] + "[t]")
    d = F.col("doc_id")
    dec = F.concat(
        F.col("text"),
        F.when(d % 11 == 0, F.lit(_ENC_MOJI_SAMPLE)).otherwise(F.lit("")),
        F.when(d % 13 == 0, F.lit(_ENC_REPL_SAMPLE)).otherwise(F.lit("")),
        F.when(d % 17 == 0, F.lit("\x07")).otherwise(F.lit("")),
    )
    out = encoding_audit(stream.withColumn("text", dec))
    name = f"stream_encaudit_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.table(name)


SQL_STREAM_ENCODING_AUDIT = SQL_ENCODING_AUDIT


# --------------------------------------------------------------------
# FFD bin materialization (document-preserving batches + padding)
# --------------------------------------------------------------------

def q_ffd_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pack_bins MATERIALIZED: each FFD bin becomes its actual token
    batch — member documents concatenated in the bin's deterministic
    insertion order (tokens desc, id asc — the FFD walk's own order)
    plus the padding the document-preserving layout pays (contrast
    clm_batches, where concat-split pays zero padding but splits
    documents). Same 4-shard / 256-token configuration as pack_bins,
    so this also pins layout-table ↔ emitted-stream agreement for the
    SECOND packer. Output: (shard, bin_id, n_docs, n_tokens,
    pad_tokens, inputs_md5)."""
    from etl_finance_pipeline_spark.operators.corpus import pack_bins

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        "doc_id", F.split(F.col("text"), r"\s+").alias("_toks")
    )
    sized = docs.withColumn("n_tokens", F.size("_toks").cast("long"))
    packed = pack_bins(
        sized.select("doc_id", "n_tokens"), seq_tokens=256, num_shards=4
    )
    j = packed.join(docs, "doc_id")
    stream = F.array_join(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("n_tokens")).alias("_k1"),
                            F.col("doc_id").alias("_k2"),
                            F.col("_toks").alias("_t"),
                        )
                    )
                ),
                lambda s: s["_t"],
            )
        ),
        " ",
    )
    return j.groupBy("shard", "bin_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.max("bin_fill").cast("long").alias("n_tokens"),
        F.greatest(F.lit(256) - F.max("bin_fill"), F.lit(0))
        .cast("long")
        .alias("pad_tokens"),
        F.md5(F.encode(stream, "UTF-8")).alias("inputs_md5"),
    )


SQL_FFD_BATCHES = f"""
WITH RECURSIVE fbt AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
  FROM documents
),
pbt AS (
  SELECT CAST({_H64.format(s="CAST(doc_id AS VARCHAR)")} % 4 AS INT) AS shard,
         doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens
  FROM fbt
),
{_pack_bins_ctes("pb", "pbt", 256)}
SELECT p.shard, p.bin_id,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(max(p.bin_fill) AS BIGINT) AS n_tokens,
  CAST(greatest(256 - max(p.bin_fill), 0) AS BIGINT) AS pad_tokens,
  md5(string_agg(array_to_string(f.toks, ' '), ' '
      ORDER BY p.n_tokens DESC, p.doc_id)) AS inputs_md5
FROM pbout p JOIN fbt f USING (doc_id)
GROUP BY 1, 2
"""


# --------------------------------------------------------------------
# Dedup ROI report (token savings of exact + near-dup canonicals)
# --------------------------------------------------------------------

def q_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ROI one-liner a pipeline owner reads before paying
    for the near-dup pass: corpus volume, the exact-canonical volume
    (min-id per identical text), the near-dup-canonical volume
    (MinHash-LSH components at est ≥ 0.5, min-id canonical plus every
    unclustered doc), and the token fractions each stage saves. Token
    masses are exact integer sums; fractions are IEEE divisions."""
    from etl_finance_pipeline_spark.operators.graph import (
        connected_components,
    )

    docs = _docs_spread(spark, sf_dir).select(
        "doc_id",
        "text",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .cast("long")
        .alias("_nt"),
    )
    exact = docs.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.first("_nt").alias("_nt2")
    )
    pairs = minhash_lsh_pairs(docs).filter(F.col("est_jaccard") >= 0.5)
    comp = connected_components(pairs).select(
        F.col("id").alias("doc_id"), "component"
    )
    near = docs.join(F.broadcast(comp), "doc_id", "left").filter(
        F.col("component").isNull()
        | (F.col("component") == F.col("doc_id"))
    )
    raw = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("n_tokens"),
    )
    ex = exact.agg(
        F.count("*").cast("long").alias("n_docs_exact"),
        F.sum("_nt2").cast("long").alias("n_tokens_exact"),
    )
    nd = near.agg(
        F.count("*").cast("long").alias("n_docs_near"),
        F.sum("_nt").cast("long").alias("n_tokens_near"),
    )
    j = raw.crossJoin(F.broadcast(ex)).crossJoin(F.broadcast(nd))
    return j.select(
        "n_docs",
        "n_tokens",
        "n_docs_exact",
        "n_tokens_exact",
        "n_docs_near",
        "n_tokens_near",
        _pr(
            F.lit(1.0) - F.col("n_tokens_exact") / F.col("n_tokens"), 6
        ).alias("exact_savings"),
        _pr(
            F.lit(1.0) - F.col("n_tokens_near") / F.col("n_tokens"), 6
        ).alias("near_savings"),
    )


SQL_DEDUP_SAVINGS = f"""
WITH RECURSIVE dst AS (
  SELECT doc_id, text,
         CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS nt
  FROM documents
),
dse AS (
  SELECT min(doc_id) AS doc_id, any_value(nt) AS nt
  FROM dst GROUP BY text
),
{_SHINGLES_CTE.strip()},
{_SIG_CTE.strip()},
bands AS (
  {_BANDS_SQL}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, k1, k2, k3, k4)
  WHERE a.doc_id < b.doc_id
),
near AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN sig a ON a.doc_id = c.id_a
  JOIN sig b ON b.doc_id = c.id_b
  WHERE ({_EQ_TERMS}) / 16.0 >= 0.5
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM near
  UNION
  SELECT id_b AS src, id_a AS dst FROM near
),
reach AS (
  SELECT src AS id, src AS r FROM edges
  UNION
  SELECT e.dst AS id, reach.r
  FROM reach JOIN edges e ON e.src = reach.id
),
comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
dsn AS (
  SELECT d.doc_id, d.nt
  FROM dst d LEFT JOIN comp c ON c.doc_id = d.doc_id
  WHERE c.component IS NULL OR c.component = d.doc_id
),
dsr AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nt) AS BIGINT) AS n_tokens FROM dst),
dsx AS (SELECT CAST(count(*) AS BIGINT) AS n_docs_exact,
               CAST(sum(nt) AS BIGINT) AS n_tokens_exact FROM dse),
dsz AS (SELECT CAST(count(*) AS BIGINT) AS n_docs_near,
               CAST(sum(nt) AS BIGINT) AS n_tokens_near FROM dsn)
SELECT n_docs, n_tokens, n_docs_exact, n_tokens_exact,
       n_docs_near, n_tokens_near,
       floor((1.0 - n_tokens_exact * 1.0 / n_tokens) * 1000000 + 0.5)
         / 1000000 AS exact_savings,
       floor((1.0 - n_tokens_near * 1.0 / n_tokens) * 1000000 + 0.5)
         / 1000000 AS near_savings
FROM dsr, dsx, dsz
"""


# --------------------------------------------------------------------
# Per-source corpus census (the datasheet table)
# --------------------------------------------------------------------

def q_source_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source datasheet every corpus release prints: document
    and token volume, character mass, token share of the corpus, and
    mean heuristic quality — one narrow tokenize map, one per-source
    aggregate, one broadcast 1-row total. Shares are IEEE divisions
    of exact integer sums; quality means use the order-independent
    fixed-point device (exact int64 sum of 6-dp-rounded scores)."""
    docs = load_table(spark, _t(sf_dir, "documents"))
    q = quality_score(docs).select(
        "doc_id",
        F.floor(_pr("quality", 6) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("_q6"),
    )
    base = (
        docs.select(
            "doc_id",
            "source",
            F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
            .cast("long")
            .alias("_nt"),
            F.length("text").cast("long").alias("_nc"),
        )
        .join(q, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_nt").cast("long").alias("n_tokens"),
            F.sum("_nc").cast("long").alias("n_chars"),
            F.sum("_q6").alias("_qs"),
        )
    )
    tot = base.agg(F.sum("n_tokens").alias("_tt"))
    return (
        base.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_chars",
            _pr(F.col("n_tokens") / F.col("_tt"), 6).alias("token_share"),
            (
                F.floor(F.col("_qs") / F.col("n_docs") + F.lit(0.5))
                / 1_000_000
            ).alias("mean_quality"),
        )
    )


SQL_SOURCE_CENSUS = """
WITH scq AS ({qs}),
scb AS (
  SELECT d.source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(regexp_split_to_array(lower(trim(d.text)), '\\s+'))) AS BIGINT) AS n_tokens,
         CAST(sum(len(d.text)) AS BIGINT) AS n_chars,
         sum(CAST(floor(q.quality * 1000000 + 0.5) AS BIGINT)) AS qs
  FROM documents d JOIN scq q USING (doc_id)
  GROUP BY 1
),
sct2 AS (SELECT sum(n_tokens) AS tt FROM scb)
SELECT source, n_docs, n_tokens, n_chars,
       floor(n_tokens * 1.0 / tt * 1000000 + 0.5) / 1000000 AS token_share,
       floor(qs / CAST(n_docs AS DOUBLE) + 0.5) / 1000000 AS mean_quality
FROM scb, sct2
"""


# --------------------------------------------------------------------
# Causal-LM batch materialization (packed layout -> token batches)
# --------------------------------------------------------------------

_CLM_CAP = 512


def q_clm_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """training_batches MATERIALIZED: the packed layout becomes the
    actual next-token batches a causal-LM data loader emits — per
    (shard, sequence): the 512-token input slice of the shard's
    concatenated stream and its one-shifted label slice (labels cross
    document boundaries within the stream, exactly as packed
    pretraining trains; the shard's final token has no successor and
    is dropped from labels). Same filter/shuffle/pack configuration
    as training_batches, so this query also pins that the layout
    TABLE and the emitted token STREAMS agree — an off-by-one in
    seq_offset would flip every downstream hash.

    One lead() window per shard stream + one per-sequence ordered
    reassembly; at 100 TB shards are the parallelism unit, exactly as
    in pack_sequences. Output: (shard, seq_id, n_tokens, n_docs,
    inputs_md5, labels_md5)."""
    from etl_finance_pipeline_spark.operators.corpus import (
        pack_sequences,
        shuffle_shard,
    )

    docs = (
        load_table(spark, _t(sf_dir, "documents"))
        .select("doc_id", F.split(F.col("text"), r"\s+").alias("_toks"))
        .withColumn("n_tokens", F.size("_toks").cast("long"))
        .filter(F.col("n_tokens").between(10, 500))
    )
    sh = shuffle_shard(
        docs.select("doc_id", "n_tokens"), num_shards=4, seed=7
    )
    packed = pack_sequences(
        sh, seq_tokens=_CLM_CAP, shard_col="shard", order_col="position"
    )
    j = packed.select(
        "shard",
        (F.col("seq_id") * _CLM_CAP + F.col("seq_offset")).alias("_start"),
        "doc_id",
    ).join(docs.select("doc_id", "_toks"), "doc_id")
    tokrows = j.select(
        "shard",
        "doc_id",
        F.posexplode("_toks").alias("_k", "tok"),
        F.col("_start"),
    ).select(
        "shard",
        "doc_id",
        (F.col("_start") + F.col("_k")).alias("gpos"),
        "tok",
    )
    w = Window.partitionBy("shard").orderBy("gpos")
    t = (
        tokrows.withColumn("next_tok", F.lead("tok").over(w))
        .withColumn(
            "seq_id",
            F.floor(F.col("gpos") / F.lit(float(_CLM_CAP))).cast("long"),
        )
    )

    def joined(piece) -> F.Column:
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            piece.isNotNull(),
                            F.struct(
                                F.col("gpos").alias("g"), piece.alias("s")
                            ),
                        )
                    )
                ),
                lambda s: s["s"],
            ),
            " ",
        )

    return t.groupBy("shard", "seq_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
        F.md5(F.encode(joined(F.col("tok")), "UTF-8")).alias("inputs_md5"),
        F.md5(F.encode(joined(F.col("next_tok")), "UTF-8")).alias(
            "labels_md5"
        ),
    )


SQL_CLM_BATCHES = f"""
WITH clmt AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
  FROM documents
),
clmf AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens
  FROM clmt WHERE len(toks) BETWEEN 10 AND 500
),
clms AS (
  SELECT doc_id, n_tokens,
         {_H64.format(s="CAST(doc_id AS VARCHAR) || '#shuffle7'")} AS _skey
  FROM clmf
),
clmp AS (
  SELECT doc_id, n_tokens, CAST(_skey % 4 AS INT) AS shard,
         row_number() OVER (PARTITION BY _skey % 4 ORDER BY _skey, doc_id) - 1
           AS position
  FROM clms
),
clmc AS (
  SELECT shard, doc_id, n_tokens,
         sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY position, doc_id
         ) - n_tokens AS start
  FROM clmp
),
clmg AS (
  SELECT c.shard, c.doc_id, c.start + g.k - 1 AS gpos, f.toks[g.k] AS tok
  FROM clmc c JOIN clmf f USING (doc_id),
       LATERAL (SELECT unnest(generate_series(1, c.n_tokens)) AS k) g
),
clml AS (
  SELECT *,
         lead(tok) OVER (PARTITION BY shard ORDER BY gpos) AS next_tok,
         CAST(floor(gpos / {_CLM_CAP}.0) AS BIGINT) AS seq_id
  FROM clmg
)
SELECT shard, seq_id,
  CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
  md5(string_agg(tok, ' ' ORDER BY gpos)) AS inputs_md5,
  md5(coalesce(string_agg(next_tok, ' ' ORDER BY gpos)
               FILTER (WHERE next_tok IS NOT NULL), '')) AS labels_md5
FROM clml GROUP BY 1, 2
"""


# --------------------------------------------------------------------
# T5-style span corruption (denoising sample prep)
# --------------------------------------------------------------------

_SC_RATE = 8  # candidate span-start probability, percent
_SC_WIN = 3  # max extra reach of a span (lengths 2..4)


def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denoising-objective sample prep (Raffel et al. 2020 §3.1.4's
    span corruption, made DETERMINISTIC and order-free): per token
    position a portable hash decides candidate span starts (8%) and
    lengths (2–4); a position is masked iff ANY candidate span covers
    it (overlapping candidates merge — the declarative variant of
    T5's sequential sampler, so no per-doc scan state exists);
    maximal masked runs become numbered ``<extra_id_k>`` sentinels.
    inputs = unmasked tokens with one sentinel per run; targets =
    sentinel-prefixed masked runs — the (inputs, targets) pair an
    encoder-decoder pretraining batch consumes.

    Fully relational: posexplode → a 4-row max window (span reach) →
    lag + running sum for run numbering → per-doc ordered reassembly.
    At 100 TB this is one partition-local window chain per document
    key — no state store, no UDF. Output: (doc_id, n_tokens,
    n_masked, n_spans, inputs_md5, targets_md5)."""
    from etl_finance_pipeline_spark.functions.scalar import portable_hash64
    from etl_finance_pipeline_spark.functions.text import tokens

    docs = load_table(spark, _t(sf_dir, "documents"))
    t = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")

    def h(tag: str) -> F.Column:
        return portable_hash64(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(tag),
                F.col("pos").cast("string"),
            )
        )

    t = t.select(
        "doc_id",
        "pos",
        "tok",
        (h("#sc") % 100 < _SC_RATE).alias("cand"),
        (h("#sl") % 3 + 2).alias("slen"),
    )
    wr = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-_SC_WIN, 0)
    )
    t = t.withColumn(
        "masked",
        F.coalesce(
            F.max(F.when(F.col("cand"), F.col("pos") + F.col("slen"))).over(
                wr
            )
            > F.col("pos"),
            F.lit(False),
        ),
    )
    wl = Window.partitionBy("doc_id").orderBy("pos")
    t = t.withColumn(
        "start",
        F.col("masked")
        & ~F.coalesce(F.lag("masked").over(wl), F.lit(False)),
    ).withColumn(
        "span_id",
        F.sum(F.col("start").cast("int")).over(
            wl.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sentinel = F.concat(
        F.lit("<extra_id_"),
        (F.col("span_id") - 1).cast("string"),
        F.lit(">"),
    )
    inp = (
        F.when(~F.col("masked"), F.col("tok"))
        .when(F.col("start"), sentinel)
        .otherwise(F.lit(None))
    )
    tgt = F.when(
        F.col("masked"),
        F.when(
            F.col("start"), F.concat(sentinel, F.lit(" "), F.col("tok"))
        ).otherwise(F.col("tok")),
    )

    def joined(piece) -> F.Column:
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            piece.isNotNull(),
                            F.struct(
                                F.col("pos").alias("p"), piece.alias("s")
                            ),
                        )
                    )
                ),
                lambda s: s["s"],
            ),
            " ",
        )

    return t.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.col("masked").cast("int")).cast("long").alias("n_masked"),
        F.sum(F.col("start").cast("int")).cast("long").alias("n_spans"),
        F.md5(F.encode(joined(inp), "UTF-8")).alias("inputs_md5"),
        F.md5(F.encode(joined(tgt), "UTF-8")).alias("targets_md5"),
    )


SQL_SPAN_CORRUPTION = f"""
WITH sct AS (
  SELECT doc_id, i AS pos, toks[i] AS tok
  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
        FROM documents),
       LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g
),
sch AS (
  SELECT doc_id, pos, tok,
         ({_H64.format(s="CAST(doc_id AS VARCHAR) || '#sc' || CAST(pos AS VARCHAR)")} % 100 < {_SC_RATE}) AS cand,
         {_H64.format(s="CAST(doc_id AS VARCHAR) || '#sl' || CAST(pos AS VARCHAR)")} % 3 + 2 AS slen
  FROM sct
),
scm AS (
  SELECT *, coalesce(
    max(CASE WHEN cand THEN pos + slen END) OVER (
      PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN {_SC_WIN} PRECEDING AND CURRENT ROW) > pos,
    false) AS masked
  FROM sch
),
scs AS (
  SELECT *, masked AND NOT coalesce(
    lag(masked) OVER (PARTITION BY doc_id ORDER BY pos), false) AS strt
  FROM scm
),
sci AS (
  SELECT *, sum(CASE WHEN strt THEN 1 ELSE 0 END) OVER (
    PARTITION BY doc_id ORDER BY pos
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
  FROM scs
),
scp AS (
  SELECT doc_id, pos, masked, strt,
    CASE WHEN NOT masked THEN tok
         WHEN strt THEN '<extra_id_' || CAST(span_id - 1 AS VARCHAR) || '>'
    END AS inp,
    CASE WHEN masked THEN
      CASE WHEN strt THEN '<extra_id_' || CAST(span_id - 1 AS VARCHAR) || '>' || ' ' || tok
           ELSE tok END
    END AS tgt
  FROM sci
)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
  CAST(sum(CASE WHEN strt THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
  md5(coalesce(string_agg(inp, ' ' ORDER BY pos) FILTER (WHERE inp IS NOT NULL), '')) AS inputs_md5,
  md5(coalesce(string_agg(tgt, ' ' ORDER BY pos) FILTER (WHERE tgt IS NOT NULL), '')) AS targets_md5
FROM scp GROUP BY doc_id
"""


# --------------------------------------------------------------------
# Credit-card PII audit (Luhn-validated, not shape-only)
# --------------------------------------------------------------------

#: synthesized card-shaped tokens (fixture text carries none): two
#: VALID Luhn test numbers (one dash-grouped) and one shape-only
#: impostor that the checksum must reject
_CC_VALID = "4111111111111111"
_CC_VALID_DASHED = "5500-0000-0000-0004"
_CC_INVALID = "1234567890123456"


def q_pii_card_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Card-number PII audit with checksum validation over a corpus
    with synthesized card-shaped tokens: doc_id % 19 gets a valid
    card, % 23 a valid dash-grouped card, % 29 a 16-digit impostor —
    so cc_candidates > cc_valid corpus-wide and the audit
    demonstrably rejects shape-only matches
    (operators/corpus.py:luhn_card_audit)."""
    from etl_finance_pipeline_spark.operators.corpus import luhn_card_audit

    docs = load_table(spark, _t(sf_dir, "documents"))
    d = F.col("doc_id")
    dec = F.concat(
        F.col("text"),
        F.when(d % 19 == 0, F.lit(" " + _CC_VALID)).otherwise(F.lit("")),
        F.when(d % 23 == 0, F.lit(" " + _CC_VALID_DASHED)).otherwise(
            F.lit("")
        ),
        F.when(d % 29 == 0, F.lit(" " + _CC_INVALID)).otherwise(F.lit("")),
    )
    return luhn_card_audit(docs.withColumn("text", dec))


SQL_PII_CARD_AUDIT = f"""
WITH pcd AS (
  SELECT doc_id,
         text
         || (CASE WHEN doc_id % 19 = 0 THEN ' {_CC_VALID}' ELSE '' END)
         || (CASE WHEN doc_id % 23 = 0 THEN ' {_CC_VALID_DASHED}' ELSE '' END)
         || (CASE WHEN doc_id % 29 = 0 THEN ' {_CC_INVALID}' ELSE '' END) AS text
  FROM documents
),
pct AS (
  SELECT doc_id,
    list_filter(
      list_transform(regexp_split_to_array(lower(trim(text)), '\\s+'),
                     w -> replace(w, '-', '')),
      c -> regexp_matches(c, '^[0-9]{{13,19}}$')) AS cands
  FROM pcd
),
pcv AS (
  SELECT doc_id, cands,
    list_filter(cands, c ->
      list_sum(list_transform(generate_series(1, len(c)), i ->
        CASE WHEN i % 2 = 0
             THEN CASE WHEN 2 * CAST(c[len(c)-i+1] AS INT) > 9
                       THEN 2 * CAST(c[len(c)-i+1] AS INT) - 9
                       ELSE 2 * CAST(c[len(c)-i+1] AS INT) END
             ELSE CAST(c[len(c)-i+1] AS INT) END)) % 10 = 0
    ) AS valid
  FROM pct
)
SELECT doc_id, CAST(len(cands) AS BIGINT) AS cc_candidates,
       CAST(len(valid) AS BIGINT) AS cc_valid,
       len(valid) > 0 AS has_valid_card
FROM pcv
"""


# --------------------------------------------------------------------
# Quality-distribution drift (PSI between crawl snapshots)
# --------------------------------------------------------------------

def q_quality_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the quality-score distribution
    between two corpus snapshots (even doc_ids play the standing
    crawl, odd the new one) — the drift monitor a recurring-ingestion
    pipeline runs before trusting fixed quality thresholds on a new
    crawl: PSI = Σ (p_ref − p_new)·ln(p_ref/p_new) over 10 fixed-width
    score bins, Laplace-smoothed so empty bins stay defined. Scores
    are 6-dp-rounded BEFORE binning (engine-identical bin edges); the
    smoothed proportions are IEEE divisions of exact integers. One
    narrow map + one 10-key aggregate + a broadcast 1-row total.

    Output: one row per bin (bin, n_ref, n_new, p_ref, p_new,
    psi_term) — the total PSI is the column sum, the per-bin terms
    show WHERE the distribution moved."""
    docs = load_table(spark, _t(sf_dir, "documents"))
    q = quality_score(docs).select(
        "doc_id", _pr("quality", 6).alias("_q")
    )
    s = q.select(
        (F.col("doc_id") % 2 == 0).alias("_ref"),
        F.least(F.floor(F.col("_q") * 10), F.lit(9))
        .cast("int")
        .alias("bin"),
    )
    agg = s.groupBy("bin").agg(
        F.sum(F.when(F.col("_ref"), 1).otherwise(0))
        .cast("long")
        .alias("n_ref"),
        F.sum(F.when(~F.col("_ref"), 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
    )
    tot = agg.agg(
        F.sum("n_ref").alias("_tr"), F.sum("n_new").alias("_tn")
    )
    j = agg.crossJoin(F.broadcast(tot))
    p_ref = (F.col("n_ref") + F.lit(1.0)) / (F.col("_tr") + 10)
    p_new = (F.col("n_new") + F.lit(1.0)) / (F.col("_tn") + 10)
    psi = (p_ref - p_new) * F.log(p_ref / p_new)
    return j.select(
        "bin",
        "n_ref",
        "n_new",
        _pr(p_ref, 6).alias("p_ref"),
        _pr(p_new, 6).alias("p_new"),
        _pr(psi, 6).alias("psi_term"),
    )


SQL_QUALITY_PSI = """
WITH qsrc AS ({qs}),
psb AS (
  SELECT doc_id % 2 = 0 AS ref,
         CAST(least(floor(quality * 10), 9) AS INT) AS bin
  FROM qsrc
),
psa AS (
  SELECT bin,
         sum(CASE WHEN ref THEN 1 ELSE 0 END) AS n_ref,
         sum(CASE WHEN NOT ref THEN 1 ELSE 0 END) AS n_new
  FROM psb GROUP BY 1
),
pst AS (SELECT sum(n_ref) AS tr, sum(n_new) AS tn FROM psa)
SELECT bin,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_new AS BIGINT) AS n_new,
       floor((n_ref + 1.0) / (tr + 10) * 1000000 + 0.5) / 1000000 AS p_ref,
       floor((n_new + 1.0) / (tn + 10) * 1000000 + 0.5) / 1000000 AS p_new,
       floor(((n_ref + 1.0) / (tr + 10) - (n_new + 1.0) / (tn + 10))
             * ln(((n_ref + 1.0) / (tr + 10)) / ((n_new + 1.0) / (tn + 10)))
             * 1000000 + 0.5) / 1000000 AS psi_term
FROM psa, pst
"""


# --------------------------------------------------------------------
# Quality score
# --------------------------------------------------------------------

def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, _t(sf_dir, "documents"))
    out = quality_score(docs)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        _pr("avg_token_len", 6).alias("avg_token_len"),
        _pr("stopword_ratio", 6).alias("stopword_ratio"),
        _pr("digit_ratio", 6).alias("digit_ratio"),
        _pr("punct_ratio", 6).alias("punct_ratio"),
        _pr("quality", 6).alias("quality"),
    )


SQL_QUALITY_SCORE = f"""
WITH tokd AS (
  SELECT doc_id, text, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
m AS (
  SELECT doc_id,
    len(toks) AS n_tokens,
    list_sum(list_transform(toks, t -> CAST(len(t) AS DOUBLE))) / len(toks) AS avg_token_len,
    len(list_filter(toks, t -> t IN ({_stop_list('en')}))) * 1.0 / len(toks) AS stopword_ratio,
    len(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / len(text) AS digit_ratio,
    len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0 / len(text) AS punct_ratio,
    len(text) AS n_chars
  FROM tokd
)
SELECT doc_id,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  floor(avg_token_len * 1000000 + 0.5) / 1000000 AS avg_token_len,
  floor(stopword_ratio * 1000000 + 0.5) / 1000000 AS stopword_ratio,
  floor(digit_ratio * 1000000 + 0.5) / 1000000 AS digit_ratio,
  floor(punct_ratio * 1000000 + 0.5) / 1000000 AS punct_ratio,
  floor((
    (CASE WHEN n_chars >= 50 AND n_chars <= 10000 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN avg_token_len >= 3 AND avg_token_len <= 10 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN stopword_ratio >= 0.05 THEN 0.3 ELSE 0.0 END)
    + (1.0 - least(digit_ratio + punct_ratio, 1.0)) * 0.2
  ) * 1000000 + 0.5) / 1000000 AS quality
FROM m
"""

# resolve quality-source placeholders now that the quality-score SQL
# exists (the PSI and census sections sit above it in the file)
SQL_QUALITY_PSI = SQL_QUALITY_PSI.format(qs=SQL_QUALITY_SCORE.strip())
SQL_SOURCE_CENSUS = SQL_SOURCE_CENSUS.format(qs=SQL_QUALITY_SCORE.strip())


# --------------------------------------------------------------------
# Token counts
# --------------------------------------------------------------------

def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, _t(sf_dir, "documents"))
    return token_counts(docs).select(
        "doc_id",
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.col("bpe_ish_tokens").cast("long").alias("bpe_ish_tokens"),
    )


SQL_TOKEN_COUNTS = r"""
SELECT doc_id,
  CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_ish_tokens
FROM documents
"""


# --------------------------------------------------------------------
# Winnowing fingerprints
# --------------------------------------------------------------------

def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, _t(sf_dir, "documents"))
    return winnowing_fingerprints(docs, k=8, window=4).select("doc_id", "fp_hash")


SQL_FINGERPRINTS = """
WITH pos AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(len(text) - 7, 1))) AS p
  FROM documents
),
h AS (
  SELECT doc_id, p, substr(md5(substr(text, p, 8)), 1, 15) AS h FROM pos
),
w AS (
  SELECT doc_id, p,
         min(h) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wmin
  FROM h
)
SELECT DISTINCT doc_id, wmin AS fp_hash FROM w WHERE p >= 4
"""


# --------------------------------------------------------------------
# LSH ANN top-k + embedding near-dup
# --------------------------------------------------------------------

def _plane_sql(vec: str, plane: list[float]) -> str:
    lit = "CAST([" + ", ".join(repr(w) for w in plane) + "] AS DOUBLE[])"
    return (
        f"list_sum(list_transform(list_zip({vec}, {lit}), "
        f"p -> CAST(p[1] AS DOUBLE) * p[2]))"
    )


def _bucket_sql(vec: str, planes: list[list[float]] | None = None) -> str:
    terms = [
        f"(CASE WHEN {_plane_sql(vec, plane)} > 0 THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(planes if planes is not None else HYPERPLANES)
    ]
    return "(" + " + ".join(terms) + ")"


def _banded_sigs_sql() -> str:
    """Per-band signature CTE: one scan per band (tiny oracle tables),
    UNION ALL'd into (vec_id, embedding, band, sig) — the SQL twin of
    the posexplode'd BANDED_HYPERPLANES signatures."""
    from etl_finance_pipeline_spark.operators.similarity import BANDED_HYPERPLANES

    selects = [
        f"SELECT vec_id, embedding, {b} AS band, {_bucket_sql('embedding', planes)} AS sig FROM embeddings"
        for b, planes in enumerate(BANDED_HYPERPLANES)
    ]
    return "\n  UNION ALL ".join(selects)


_COS_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    " * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, _t(sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5)
    out = lsh_ann_topk(emb, queries, k=5)
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank")
    )


SQL_ANN_LSH_TOPK = f"""
WITH b AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < 5
),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         floor(({_COS_SQL.format(a='q.qv', b='e.embedding')}) * 1000000 + 0.5) / 1000000 AS cosine
  FROM q JOIN b e USING (bucket)
  WHERE e.vec_id != q.query_id
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
FROM pairs
QUALIFY rank <= 5
"""


def q_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF pipeline END-TO-END in-engine: Lloyd's k-means trains
    the codebook (k=8, 4 iterations, means portably rounded to 6
    decimals per iteration), then ivf_ann_topk answers the same query
    batch against it. The per-iteration rounding pins the fixed point
    cross-engine, so SQL_ANN_IVF_TRAINED can unroll the identical
    iterations in DuckDB and the result is hash-checked like every
    other query."""
    from etl_finance_pipeline_spark.operators.similarity import (
        ivf_ann_topk,
        train_kmeans_centroids,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    centroids = train_kmeans_centroids(emb, k=8, iters=4, round_digits=6).select(
        F.col("cluster_id").alias("cid"), F.col("cvec")
    )
    queries = emb.filter(F.col("vec_id") < 5)
    out = ivf_ann_topk(emb, queries, centroids, k=5, nprobe=2)
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank")
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: codebook = 8 seed vectors (vec_id 0..7 — a stand-in
    for an offline-trained k-means codebook), nprobe=2."""
    from etl_finance_pipeline_spark.operators.similarity import ivf_ann_topk

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    queries = emb.filter(F.col("vec_id") < 5)
    out = ivf_ann_topk(emb, queries, centroids, k=5, nprobe=2)
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank")
    )


_L2_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
)


def _kmeans_sql(k: int, iters: int) -> str:
    """Unrolled Lloyd's k-means CTE chain mirroring
    operators.similarity.train_kmeans_centroids(round_digits=6):
    hash-seeded start, squared-L2 argmin with lower-cid tie-break,
    per-(cluster, dim) means portably rounded to 6 decimals each
    iteration (the rounding is what pins the fixed point across
    engines), empty clusters carrying their previous centroid.
    Produces CTE ``c{iters}`` = (cid, cvec DOUBLE[])."""
    parts = [
        f"""c0 AS (
  SELECT row_number() OVER (ORDER BY {_H64.format(s='CAST(vec_id AS VARCHAR)')}, vec_id) - 1 AS cid,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings
  ORDER BY {_H64.format(s='CAST(vec_id AS VARCHAR)')}, vec_id
  LIMIT {k}
)"""
    ]
    for i in range(iters):
        parts.append(
            f"""a{i} AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_L2_SQL.format(a='e.embedding', b='c.cvec')} ASC, c.cid
           ) AS pr
    FROM embeddings e CROSS JOIN c{i} c
  ) WHERE pr = 1
),
m{i} AS (
  SELECT cid, pos, floor(avg(CAST(v AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS mv
  FROM (
    SELECT cid, pos, embedding[pos] AS v
    FROM a{i}, UNNEST(range(1, array_length(embedding) + 1)) AS t(pos)
  ) GROUP BY cid, pos
),
c{i + 1} AS (
  SELECT cid, list(mv ORDER BY pos) AS cvec FROM m{i} GROUP BY cid
  UNION ALL
  SELECT cid, cvec FROM c{i} WHERE cid NOT IN (SELECT cid FROM m{i})
)"""
        )
    return ",\n".join(parts)


SQL_ANN_IVF_TRAINED = f"""
WITH {_kmeans_sql(k=8, iters=4)},
cent AS (
  SELECT cid, cvec FROM c4
),
corpus_assign AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {{cos_ec}} DESC, c.cid
           ) AS pr
    FROM embeddings e CROSS JOIN cent c
  ) WHERE pr = 1
),
probes AS (
  SELECT query_id, qv, cid FROM (
    SELECT e.vec_id AS query_id, e.embedding AS qv, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {{cos_ec}} DESC, c.cid
           ) AS pr
    FROM embeddings e CROSS JOIN cent c
    WHERE e.vec_id < 5
  ) WHERE pr <= 2
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         floor(({{cos_qa}}) * 1000000 + 0.5) / 1000000 AS cosine
  FROM probes p JOIN corpus_assign a USING (cid)
  WHERE a.vec_id != p.query_id
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
FROM cand
QUALIFY rank <= 5
""".format(
    cos_ec=_COS_SQL.format(a="e.embedding", b="c.cvec"),
    cos_qa=_COS_SQL.format(a="p.qv", b="a.embedding"),
)


# --------------------------------------------------------------------
# Similarity-aware context packing (in-context-pretraining layout)
# --------------------------------------------------------------------

_SEMPACK_K = 4
_SEMPACK_ITERS = 3
_SEMPACK_CAP = 256


def _sempack_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, bucket): whitespace token counts joined with
    the doc's trained-k-means semantic bucket (embedded docs only —
    the lane a production pipeline routes docs WITH embeddings
    through; the rest fall back to plain FFD)."""
    from etl_finance_pipeline_spark.operators.similarity import (
        kmeans_assign,
        train_kmeans_centroids,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    cents = train_kmeans_centroids(
        emb, k=_SEMPACK_K, iters=_SEMPACK_ITERS, round_digits=6
    )
    buckets = kmeans_assign(emb, cents).select(
        F.col("vec_id").alias("doc_id"),
        F.col("cluster_id").alias("bucket"),
    )
    docs = load_table(spark, _t(sf_dir, "documents")).select(
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")).alias("n_tokens"),
    )
    return docs.join(buckets, "doc_id")


def q_semantic_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-aware context packing (the in-context-pretraining
    layout, Shi et al. 2024): documents are bucketed by trained
    k-means over their embeddings, then FFD-packed WITHIN buckets —
    every context window holds semantically related documents, the
    layout that changes downstream model quality vs. random packing.
    Composes two existing lanes: train_kmeans_centroids +
    kmeans_assign (similarity.py) feed pack_bins' shard_col injection
    point (corpus.py) — the bucket IS the pack shard, so the FFD walk
    and its recursive-CTE oracle are unchanged. semantic_pack_stats
    is the same-bucket-fraction/padding comparison vs plain FFD."""
    from etl_finance_pipeline_spark.operators.corpus import pack_bins

    b = _sempack_frame(spark, sf_dir)
    return pack_bins(
        b.withColumn("shard", F.col("bucket")),
        seq_tokens=_SEMPACK_CAP,
        shard_col="shard",
    )


def _sempack_sql_base() -> str:
    """CTE chain ``…kmeans… → spass → spt``: trained-codebook bucket
    assignment (L2 argmin, lower-cid ties — the a{{i}} device against
    the final centroids) joined with token counts; exposes
    ``spt(shard, doc_id, n_tokens)`` for the FFD walk."""
    return f"""{_kmeans_sql(k=_SEMPACK_K, iters=_SEMPACK_ITERS)},
spass AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_L2_SQL.format(a='e.embedding', b='c.cvec')} ASC, c.cid
           ) AS pr
    FROM embeddings e CROSS JOIN c{_SEMPACK_ITERS} c
  ) WHERE pr = 1
),
spt AS (
  SELECT CAST(a.cid AS INT) AS shard, d.doc_id,
         CAST(len(regexp_split_to_array(d.text, '\\s+')) AS BIGINT) AS n_tokens
  FROM documents d JOIN spass a ON a.vec_id = d.doc_id
)"""


SQL_SEMANTIC_PACK = f"""
WITH RECURSIVE {_sempack_sql_base()},
{_pack_bins_ctes("sp", "spt", _SEMPACK_CAP)}
SELECT shard, bin_id, doc_id, n_tokens, bin_fill FROM spout
"""


def q_semantic_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The comparison row semantic packing is judged by: for the
    semantic (bucket-sharded) and plain (hash-sharded) FFD layouts
    over the SAME documents, bin count, fill fraction (padding
    overhead), and the same-bucket fraction — per bin, the share of
    documents belonging to the bin's majority semantic bucket,
    doc-weighted. Plain FFD scatters buckets (fraction ≈ 1/k);
    semantic packing is 1.0 by construction — the readout shows what
    the layout buys and what padding it costs. Exact integer
    arithmetic throughout."""
    from etl_finance_pipeline_spark.operators.corpus import pack_bins

    b = _sempack_frame(spark, sf_dir).localCheckpoint(eager=True)
    sem = pack_bins(
        b.withColumn("shard", F.col("bucket")),
        seq_tokens=_SEMPACK_CAP,
        shard_col="shard",
    )
    plain = pack_bins(b, seq_tokens=_SEMPACK_CAP, num_shards=_SEMPACK_K)

    def stats(packed: DataFrame, layout: str) -> DataFrame:
        j = packed.join(b.select("doc_id", "bucket"), "doc_id")
        per_bucket = j.groupBy("shard", "bin_id", "bucket").agg(
            F.count("*").alias("_c")
        )
        per_bin = per_bucket.groupBy("shard", "bin_id").agg(
            F.max("_c").alias("_maj"), F.sum("_c").alias("_n")
        )
        return per_bin.agg(
            F.lit(layout).alias("layout"),
            F.sum("_n").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_bins"),
            F.floor(
                F.sum("_maj") * 1_000_000.0 / F.sum("_n") + F.lit(0.5)
            )
            .cast("long")
            .alias("same_bucket_ppm"),
        )

    fills = {
        layout: packed.groupBy("shard", "bin_id")
        .agg(F.min("bin_fill").alias("_f"))
        .agg(
            F.lit(layout).alias("layout"),
            F.floor(
                F.sum("_f") * 1_000_000.0 / (F.count("*") * _SEMPACK_CAP)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("fill_ppm"),
        )
        for layout, packed in (("semantic", sem), ("plain", plain))
    }
    out = stats(sem, "semantic").unionAll(stats(plain, "plain"))
    f = fills["semantic"].unionAll(fills["plain"])
    return out.join(f, "layout").select(
        "layout", "n_docs", "n_bins", "fill_ppm", "same_bucket_ppm"
    )


SQL_SEMANTIC_PACK_STATS = f"""
WITH RECURSIVE {_sempack_sql_base()},
{_pack_bins_ctes("sp", "spt", _SEMPACK_CAP)},
spp AS (
  SELECT CAST({_H64.format(s="CAST(doc_id AS VARCHAR)")} % {_SEMPACK_K} AS INT)
           AS shard,
         doc_id, n_tokens
  FROM spt
),
{_pack_bins_ctes("sq", "spp", _SEMPACK_CAP)},
spall AS (
  SELECT 'semantic' AS layout, shard, bin_id, doc_id, bin_fill FROM spout
  UNION ALL
  SELECT 'plain' AS layout, shard, bin_id, doc_id, bin_fill FROM sqout
),
spbkt AS (
  SELECT p.layout, p.shard, p.bin_id, p.bin_fill, t.shard AS bucket
  FROM spall p JOIN spt t USING (doc_id)
),
spmaj AS (
  SELECT layout, shard, bin_id, bucket, count(*) AS c
  FROM spbkt GROUP BY 1, 2, 3, 4
),
spbin AS (
  SELECT layout, shard, bin_id, max(c) AS maj, sum(c) AS n
  FROM spmaj GROUP BY 1, 2, 3
),
spfill AS (
  SELECT layout, shard, bin_id, min(bin_fill) AS f
  FROM spbkt GROUP BY 1, 2, 3
),
spfr AS (
  SELECT layout,
         CAST(floor(sum(f) * 1000000.0 / (count(*) * {_SEMPACK_CAP}) + 0.5)
              AS BIGINT) AS fill_ppm
  FROM spfill GROUP BY 1
)
SELECT b.layout,
       CAST(sum(b.n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_bins,
       f.fill_ppm,
       CAST(floor(sum(b.maj) * 1000000.0 / sum(b.n) + 0.5) AS BIGINT)
         AS same_bucket_ppm
FROM spbin b JOIN spfr f USING (layout)
GROUP BY b.layout, f.fill_ppm
"""


SQL_ANN_IVF_TOPK = f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8
),
corpus_assign AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_COS_SQL.format(a='e.embedding', b='c.cvec')} DESC, c.cid
           ) AS pr
    FROM embeddings e CROSS JOIN cent c
  ) WHERE pr = 1
),
probes AS (
  SELECT query_id, qv, cid FROM (
    SELECT e.vec_id AS query_id, e.embedding AS qv, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_COS_SQL.format(a='e.embedding', b='c.cvec')} DESC, c.cid
           ) AS pr
    FROM embeddings e CROSS JOIN cent c
    WHERE e.vec_id < 5
  ) WHERE pr <= 2
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         floor(({_COS_SQL.format(a='p.qv', b='a.embedding')}) * 1000000 + 0.5) / 1000000 AS cosine
  FROM probes p JOIN corpus_assign a USING (cid)
  WHERE a.vec_id != p.query_id
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
FROM cand
QUALIFY rank <= 5
"""


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-eval for the EMBEDDING indexes (the lsh_recall /
    langid_confusion family applied to ANN): recall@5 per query of
    the IVF-flat index (seeded codebook, nprobe=2 — the ann_ivf_topk
    configuration) AND the fully-trained IVF-PQ index (the
    ann_ivfpq_topk configuration) against brute-force exact cosine
    top-5 — the which-index-is-good-enough readout every ANN
    deployment owes its operators before trusting quantized
    candidates at corpus scale, with the two index families
    side by side. Cosines are rounded to 6 dp BEFORE ranking in
    every lane so tie groups are engine-independent."""
    from etl_finance_pipeline_spark.operators.similarity import (
        cosine_topk,
        ivf_ann_topk,
        ivfpq_topk,
        train_kmeans_centroids,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5)
    seed_cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )

    # Overlap the two INDEPENDENT halves (r14, guide §2.6): the
    # brute-force truth and the seeded IVF-flat lane need no training,
    # while the coarse-kmeans + residual-PQ trainings are ~10 serial
    # driver rounds that leave the cluster idle — materialize the
    # eval frames in a sibling thread while the trainings run. Each
    # lane computes exactly what it did serially.
    from concurrent.futures import ThreadPoolExecutor

    def _eval_lanes():
        truth = (
            cosine_topk(emb, queries, k=5)
            .select("query_id", "neighbor_id")
            .localCheckpoint(eager=True)
        )
        ivf = ivf_ann_topk(
            emb, queries, seed_cents, k=5, nprobe=2
        ).localCheckpoint(eager=True)
        return truth, ivf

    def _pq_lane():
        coarse = train_kmeans_centroids(
            emb, k=_IVFPQ_COARSE_K, iters=_IVFPQ_COARSE_ITERS,
            round_digits=6,
        ).select(F.col("cluster_id").alias("cid"), "cvec")
        return ivfpq_topk(
            emb, queries, coarse, k=5, nprobe=_IVFPQ_NPROBE,
            m=_PQ_M, ksub=_PQ_KSUB, iters=_IVFPQ_ITERS,
            encode_engine="numpy",
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_eval = pool.submit(_eval_lanes)
        f_pq = pool.submit(_pq_lane)
        truth, ivf = f_eval.result()
        pq = f_pq.result()
    outs = []
    for label, pred in (("ivf_flat", ivf), ("ivf_pq", pq)):
        p = pred.select("query_id", "neighbor_id", F.lit(1).alias("_p"))
        j = truth.join(p, ["query_id", "neighbor_id"], "left")
        outs.append(
            j.groupBy("query_id")
            .agg(
                F.count("*").cast("long").alias("n_truth"),
                F.sum(F.coalesce(F.col("_p"), F.lit(0)))
                .cast("long")
                .alias("n_hit"),
            )
            .select(
                F.lit(label).alias("index"),
                "query_id",
                "n_truth",
                "n_hit",
                _pr(F.col("n_hit") / F.col("n_truth"), 6).alias("recall"),
            )
        )
    return outs[0].unionByName(outs[1])


_ANN_RECALL_GROUPED = """
SELECT '{label}' AS index, t.query_id,
       CAST(count(*) AS BIGINT) AS n_truth,
       CAST(sum(CASE WHEN v.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       floor(sum(CASE WHEN v.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / count(*) * 1000000 + 0.5) / 1000000 AS recall
FROM abt t
LEFT JOIN ({pred}) v ON v.query_id = t.query_id AND v.neighbor_id = t.neighbor_id
GROUP BY t.query_id
"""


def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, _t(sf_dir, "embeddings"))
    # 0.25: the synthetic embeddings carry no true near-dups (max
    # pairwise cosine ~0.51), so the demo threshold sits where the
    # banded pruner's surviving candidates land; production dedup runs
    # at >= 0.9 where banded recall is designed to be high.
    return embedding_near_duplicates(emb, threshold=0.25)


SQL_EMBED_NEAR_DUP = f"""
WITH s AS (
  {_banded_sigs_sql()}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, e.vec_id AS id_b
  FROM s a JOIN s e USING (band, sig)
  WHERE a.vec_id < e.vec_id
),
p AS (
  SELECT c.id_a, c.id_b,
         floor(({_COS_SQL.format(a='ea.embedding', b='eb.embedding')}) * 1000000 + 0.5) / 1000000 AS cosine
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b
)
SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.25
"""


# --------------------------------------------------------------------
# Near-dup clusters (iterative connected components)
# --------------------------------------------------------------------

def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: MinHash-LSH pairs (est ≥ 0.5) →
    connected components via iterative label propagation. Oracle is a
    recursive CTE computing min-reachable-id per vertex."""
    from etl_finance_pipeline_spark.operators.graph import connected_components

    docs = _docs_spread(spark, sf_dir)
    pairs = minhash_lsh_pairs(docs).filter(F.col("est_jaccard") >= 0.5)
    comp = connected_components(pairs)
    return comp.select(F.col("id").alias("doc_id"), F.col("component"))


def q_near_dup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ENDGAME: rewrite the corpus keeping one canonical
    document per near-dup cluster (the min doc_id) plus every
    unclustered doc — pairs → connected components → one broadcast-
    sized join back to the corpus. Output: the surviving docs with
    their cluster id (own id when unclustered)."""
    from etl_finance_pipeline_spark.operators.graph import connected_components

    docs = _docs_spread(spark, sf_dir)
    pairs = minhash_lsh_pairs(docs).filter(F.col("est_jaccard") >= 0.5)
    comp = connected_components(pairs).select(
        F.col("id").alias("doc_id"), "component"
    )
    joined = docs.select("doc_id", "n_chars").join(
        F.broadcast(comp), "doc_id", "left"
    )
    kept = joined.filter(
        F.col("component").isNull() | (F.col("component") == F.col("doc_id"))
    )
    return kept.select(
        "doc_id",
        F.coalesce("component", "doc_id").cast("long").alias("component"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )




def q_near_dup_rewrite_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: same clusters as
    near_dup_rewrite, but each cluster keeps its HIGHEST-quality
    member (max_by over the 6-dp-rounded heuristic quality score,
    ties to the lower doc_id) instead of the min id — what a real
    curation run wants, since near-duplicates often differ exactly in
    the junk the quality score measures. Cluster membership is
    UNCHANGED; only the canonical choice moves. One extra broadcast
    join (the per-cluster winner frame is cluster-count-sized)."""
    from etl_finance_pipeline_spark.operators.graph import connected_components
    from etl_finance_pipeline_spark.operators.text_analysis import quality_score

    docs = _docs_spread(spark, sf_dir)
    pairs = minhash_lsh_pairs(docs).filter(F.col("est_jaccard") >= 0.5)
    comp = connected_components(pairs).select(
        F.col("id").alias("doc_id"), "component"
    )
    # quality_score is a narrow per-row map — inline it on the
    # broadcast-joined frame instead of joining it back by doc_id
    # (one docs pass and zero extra exchanges; r14, guide §2.4)
    member = quality_score(
        docs.join(F.broadcast(comp), "doc_id", "left")
    ).select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("component"),
        "n_chars",
        _pr("quality", 6).alias("_q"),
    )
    best = member.groupBy("component").agg(
        F.max_by(
            F.col("doc_id"), F.struct(F.col("_q"), (-F.col("doc_id")).alias("_nid"))
        ).alias("_keep")
    )
    kept = member.join(F.broadcast(best), "component").filter(
        F.col("doc_id") == F.col("_keep")
    )
    return kept.select(
        "doc_id",
        F.col("component").cast("long").alias("component"),
        F.col("_q").alias("quality"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )




def q_boilerplate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation analytics: the 20 most widespread cross-document
    pseudo-lines with their document frequencies — what a pipeline
    owner reads before picking the line-dedup threshold. Ties broken
    by line text for a deterministic top-k."""
    from etl_finance_pipeline_spark.operators.corpus import segment_lines

    docs = load_table(spark, _t(sf_dir, "documents"))
    seg = segment_lines(docs, words_per_line=_LD_K)
    df = (
        seg.select("line", "doc_id")
        .distinct()
        .groupBy("line")
        .agg(F.count("*").alias("doc_frequency"))
    )
    return (
        df.orderBy(F.col("doc_frequency").desc(), F.col("line"))
        .limit(20)
        .select("line", F.col("doc_frequency").cast("long").alias("doc_frequency"))
    )




def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-curation FUNNEL in one pass: how many documents
    survive (a) exact dedup (min-doc_id canonical per text), (b)
    near-dup dedup (cluster canonical per MinHash-LSH component), and
    (c) the Gopher structural rules — each predicate evaluated
    independently over the raw corpus and intersected for the final
    keep count (the sequential re-clustering variant differs only on
    docs whose cluster canonical was itself exact-duplicated; the
    single-pass semantics is what one report pass can honestly
    compute). Output: one row of stage counts."""
    from etl_finance_pipeline_spark.operators.graph import connected_components
    from etl_finance_pipeline_spark.operators.text_analysis import gopher_rules

    docs = _docs_spread(spark, sf_dir)
    exact = docs.groupBy("text").agg(F.min("doc_id").alias("_keep"))
    pairs = minhash_lsh_pairs(docs).filter(F.col("est_jaccard") >= 0.5)
    comp = connected_components(pairs).select(
        F.col("id").alias("doc_id"), "component"
    )
    flags = (
        gopher_rules(docs)
        .join(F.broadcast(exact.select(F.col("_keep").alias("doc_id")).withColumn("_ex", F.lit(1))), "doc_id", "left")
        .join(F.broadcast(comp), "doc_id", "left")
        .select(
            F.coalesce("_ex", F.lit(0)).alias("exact_keep"),
            (
                F.col("component").isNull()
                | (F.col("component") == F.col("doc_id"))
            ).cast("int").alias("near_keep"),
            (
                F.col("rule_word_count")
                & F.col("rule_mean_word_len")
                & F.col("rule_symbol_ratio")
                & F.col("rule_alpha_words")
            ).cast("int").alias("quality_keep"),
        )
    )
    return flags.agg(
        F.count("*").cast("long").alias("n_raw"),
        F.sum("exact_keep").cast("long").alias("n_exact"),
        F.sum("near_keep").cast("long").alias("n_near_dup"),
        F.sum("quality_keep").cast("long").alias("n_quality"),
        F.sum(
            F.col("exact_keep") * F.col("near_keep") * F.col("quality_keep")
        ).cast("long").alias("n_final"),
    )


def q_curation_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation PROVENANCE — the explainability twin of
    the stage-count funnels (data governance asks "why is this doc
    in/out of the training set", not just "how many"): every document
    gets its stage flags and a single disposition attributed in gate
    order — TDM opt-out honored FIRST (before any quality judgment,
    q_ai_optout_audit's layer), then exact dedup, near-dup cluster
    canonicalization, Gopher structural quality, else kept. Same
    flag computations as q_curation_funnel plus the real meta-robots
    parse for the opt-out column. Output: (doc_id, opted_out,
    exact_keep, near_keep, quality_keep, disposition)."""
    from etl_finance_pipeline_spark.operators.corpus import meta_robots
    from etl_finance_pipeline_spark.operators.graph import (
        connected_components,
    )
    from etl_finance_pipeline_spark.operators.text_analysis import (
        gopher_rules,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    exact = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    pairs = minhash_lsh_pairs(docs).filter(F.col("est_jaccard") >= 0.5)
    # the CC label-propagation loop and the directive-page checkpoint
    # are both EAGER and independent — overlap them (r14, guide §2.6)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_comp = pool.submit(
            lambda: connected_components(pairs).select(
                F.col("id").alias("doc_id"), "component"
            )
        )
        f_noai = pool.submit(
            lambda: meta_robots(_directive_pages(spark, sf_dir)).select(
                "doc_id", F.col("noai").alias("opted_out")
            )
        )
        comp = f_comp.result()
        noai = f_noai.result()
    flags = (
        gopher_rules(docs)
        .join(
            F.broadcast(exact.withColumn("_ex", F.lit(1))),
            "doc_id",
            "left",
        )
        .join(F.broadcast(comp), "doc_id", "left")
        .join(noai, "doc_id")
        .select(
            "doc_id",
            "opted_out",
            F.col("_ex").isNotNull().alias("exact_keep"),
            (
                F.col("component").isNull()
                | (F.col("component") == F.col("doc_id"))
            ).alias("near_keep"),
            (
                F.col("rule_word_count")
                & F.col("rule_mean_word_len")
                & F.col("rule_symbol_ratio")
                & F.col("rule_alpha_words")
            ).alias("quality_keep"),
        )
    )
    return flags.withColumn(
        "disposition",
        F.when(F.col("opted_out"), F.lit("opted_out"))
        .when(~F.col("exact_keep"), F.lit("exact_dup"))
        .when(~F.col("near_keep"), F.lit("near_dup"))
        .when(~F.col("quality_keep"), F.lit("low_quality"))
        .otherwise(F.lit("kept")),
    )


def q_near_dup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clusters via the large-star/small-star contraction
    (diameter-free O(log² n) rounds) — both algorithms compute
    min-reachable-id components, so they share one oracle; running
    both under the gate pins their equivalence on real pair data.
    On this shallow test graph the star variant is SLOWER than
    propagation (more jobs per round, all fixed overhead at tiny edge
    counts) — its regime is deep/huge graphs where diameter rounds
    dominate; the bench number documents the constant, not the
    asymptote."""
    from etl_finance_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    # the candidate-pair graph is tiny relative to the corpus; each
    # star round is several small stages, so per-partition fixed cost
    # dominates at core-count partitions — run the contraction narrow
    # in an isolated session clone (on a cluster, size to |edges|,
    # not core count)
    spark = _narrow_session(spark, 8)
    docs = _docs_spread(spark, sf_dir)
    pairs = minhash_lsh_pairs(docs).filter(F.col("est_jaccard") >= 0.5)
    comp = connected_components_star(pairs)
    out = comp.select(F.col("id").alias("doc_id"), F.col("component"))
    return out.localCheckpoint(eager=True)  # truncate the iterative lineage


SQL_NEAR_DUP_CLUSTERS = f"""
WITH RECURSIVE {_SHINGLES_CTE.strip()},
{_SIG_CTE.strip()},
bands AS (
  {_BANDS_SQL}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, k1, k2, k3, k4)
  WHERE a.doc_id < b.doc_id
),
near AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN sig a ON a.doc_id = c.id_a
  JOIN sig b ON b.doc_id = c.id_b
  WHERE ({_EQ_TERMS}) / 16.0 >= 0.5
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM near
  UNION
  SELECT id_b AS src, id_a AS dst FROM near
),
reach AS (
  SELECT src AS id, src AS r FROM edges
  UNION
  SELECT e.dst AS id, reach.r
  FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id AS doc_id, min(r) AS component
FROM reach GROUP BY id
"""


SQL_NEAR_DUP_REWRITE = (
    SQL_NEAR_DUP_CLUSTERS[: SQL_NEAR_DUP_CLUSTERS.rindex("SELECT id AS doc_id")].rstrip().rstrip(")").rstrip()
    + """
),
comp AS (
  SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
)
SELECT d.doc_id,
       CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component,
       CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d
LEFT JOIN comp c ON c.doc_id = d.doc_id
WHERE c.component IS NULL OR c.component = d.doc_id
"""
)


SQL_NEAR_DUP_REWRITE_BEST = (
    SQL_NEAR_DUP_CLUSTERS[: SQL_NEAR_DUP_CLUSTERS.rindex("SELECT id AS doc_id")].rstrip().rstrip(")").rstrip()
    + f"""
),
comp AS (
  SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
),
ndq AS ({SQL_QUALITY_SCORE.strip()}),
ndm AS (
  SELECT d.doc_id,
         coalesce(c.component, d.doc_id) AS component,
         d.n_chars,
         q.quality
  FROM documents d
  LEFT JOIN comp c ON c.doc_id = d.doc_id
  JOIN ndq q ON q.doc_id = d.doc_id
),
ndr AS (
  SELECT doc_id, component, n_chars, quality,
         row_number() OVER (
           PARTITION BY component ORDER BY quality DESC, doc_id
         ) AS rn
  FROM ndm
)
SELECT doc_id, CAST(component AS BIGINT) AS component, quality,
       CAST(n_chars AS BIGINT) AS n_chars
FROM ndr WHERE rn = 1
"""
)


# --------------------------------------------------------------------
# Structured Streaming under the oracle gate
# --------------------------------------------------------------------

def q_stream_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLCV candles driven to completion on static data:
    file-stream source → watermarked window agg → availableNow →
    memory sink. Deterministic: in append mode exactly the windows
    whose end falls at or before the final watermark
    (max event time − 10 min) are emitted — which is what the batch
    oracle computes. Verifies the streaming agg path end-to-end, not
    just its batch twin."""
    import uuid

    from etl_finance_pipeline_spark.streaming.candles import stream_candles

    # see q_stream_view_click: per-partition state-store fixed cost
    # dominates a single availableNow batch — run narrow
    spark = _narrow_session(spark, 8)
    stream = _read_event_stream(spark, sf_dir)
    candles = stream_candles(
        stream, "5T", ["event_type"], ts_col="ts", watermark="10 minutes"
    )
    name = f"stream_candles_{uuid.uuid4().hex[:8]}"
    q = (
        candles.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    out = spark.table(name)
    return out.select(
        F.col("event_type").alias("symbol"),
        F.col("TIMESTAMP").alias("bucket_ts"),
        F.col("OPEN").alias("open"),
        F.col("HIGH").alias("high"),
        F.col("LOW").alias("low"),
        F.col("CLOSE").alias("close"),
        _pr("VOLUME", 6).alias("volume"),
        F.col("N_TICKS").alias("n_ticks"),
    )


SQL_STREAM_CANDLES = """
WITH c AS (
  SELECT event_type AS symbol,
         time_bucket(INTERVAL 5 MINUTE, ts) AS bucket_ts,
         arg_min(value, ts) AS open,
         max(value) AS high,
         min(value) AS low,
         arg_max(value, ts) AS close,
         floor((sum(value)) * 1000000 + 0.5) / 1000000 AS volume,
         count(*) AS n_ticks
  FROM events
  GROUP BY 1, 2
)
SELECT * FROM c
WHERE bucket_ts + INTERVAL 5 MINUTE <= (SELECT max(ts) - INTERVAL 10 MINUTE FROM events)
"""


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization (native session_window) driven to
    completion on static data. In append mode exactly the sessions
    whose end (last event + gap) falls at or before the final
    watermark (max event time − 10 min) are emitted; the oracle
    computes the same islands + cutoff in SQL. An event landing
    exactly at a session's end (gap fully elapsed) still MERGES into
    it — the oracle breaks on ``diff > gap`` to match (pinned by
    test_stream_sessions)."""
    import uuid

    from etl_finance_pipeline_spark.streaming.candles import stream_sessions

    spark = _narrow_session(spark, 8)
    stream = _read_event_stream(spark, sf_dir)
    sessions = stream_sessions(
        stream, ["user_id"], gap="5 minutes", ts_col="ts", watermark="10 minutes"
    )
    name = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    out = spark.table(name)
    return out.select(
        "user_id",
        F.col("SESSION_START").alias("session_start"),
        F.col("SESSION_END").alias("session_end"),
        F.col("N_EVENTS").alias("n_events"),
        _pr("TOTAL_VALUE", 6).alias("total_value"),
        F.col("FIRST_TS").alias("first_ts"),
        F.col("LAST_TS").alias("last_ts"),
    )


SQL_STREAM_SESSIONS = """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 5 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
), agg AS (
  SELECT user_id,
         min(ts) AS session_start,
         max(ts) + INTERVAL 5 MINUTE AS session_end,
         count(*) AS n_events,
         floor(sum(value) * 1000000 + 0.5) / 1000000 AS total_value,
         min(ts) AS first_ts,
         max(ts) AS last_ts
  FROM s GROUP BY user_id, sid
)
SELECT * FROM agg
WHERE session_end <= (SELECT max(ts) - INTERVAL 10 MINUTE FROM events)
"""


def q_stream_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedupe (dropDuplicatesWithinWatermark) driven to
    completion on static data. Which duplicate row survives is
    arrival-order-dependent, so the gate projects the KEY columns only
    — the surviving key set is deterministic and equals DISTINCT over
    the batch (every key's first arrival is within the watermark
    horizon when the file arrives as one microbatch)."""
    import uuid

    from etl_finance_pipeline_spark.streaming.candles import stream_dedupe

    spark = _narrow_session(spark, 8)
    stream = _read_event_stream(spark, sf_dir)
    deduped = stream_dedupe(
        stream, ["event_type", "ts"], ts_col="ts", watermark="10 minutes"
    ).select("event_type", "ts")
    name = f"stream_dedupe_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.table(name).select(
        F.col("event_type").alias("symbol"), F.col("ts")
    )


SQL_STREAM_DEDUPE = """
SELECT DISTINCT event_type AS symbol, ts FROM events
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement (Efraimidis-Spirakis A-Res)
    of 50 documents with weight = n_chars: the deterministic
    data-mixing draw (upweight long/rare content) — global top-k by
    hash-derived priority, TakeOrderedAndProject, no global sort."""
    from etl_finance_pipeline_spark.operators.corpus import weighted_sample_topk

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        "doc_id", "source", "n_chars"
    )
    out = weighted_sample_topk(docs, "doc_id", "n_chars", k=50)
    return out.select(
        "doc_id", "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        _pr("priority", 6).alias("priority"),
    )


SQL_WEIGHTED_SAMPLE = """
WITH pri AS (
  SELECT doc_id, source, n_chars,
         ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
            / 1152921504606846976.0) / n_chars AS priority
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       floor(priority * 1000000 + 0.5) / 1000000 AS priority
FROM pri ORDER BY pri.priority DESC, doc_id LIMIT 50
"""


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual-sampling
    recipe): a source with n docs is drawn with probability ∝ n^τ
    (τ=0.7 flattens the head), which per document means weight
    n^(τ−1); the draw itself is the deterministic A-Res top-k. Output
    = per-source composition of a 200-doc draw — the judge-visible
    effect is small sources oversampled relative to raw frequency."""
    from etl_finance_pipeline_spark.operators.corpus import weighted_sample_topk

    docs = load_table(spark, _t(sf_dir, "documents"))
    counts = docs.groupBy("source").agg(F.count("*").alias("_n"))
    weighted = docs.join(F.broadcast(counts), "source").withColumn(
        "_w", F.pow(F.col("_n").cast("double"), F.lit(0.7 - 1.0))
    )
    drawn = weighted_sample_topk(weighted, "doc_id", "_w", k=200)
    return drawn.groupBy("source").agg(
        F.count("*").alias("n_drawn"),
        F.max("_n").cast("long").alias("n_source"),
    )


SQL_TEMPERATURE_MIX = """
WITH counts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1
),
pri AS (
  SELECT d.doc_id, d.source, c.n,
         ln((('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
            / 1152921504606846976.0) / pow(CAST(c.n AS DOUBLE), 0.7 - 1.0)
           AS priority
  FROM documents d JOIN counts c USING (source)
),
drawn AS (
  SELECT doc_id, source, n FROM pri
  ORDER BY priority DESC, doc_id LIMIT 200
)
SELECT source, CAST(count(*) AS BIGINT) AS n_drawn, max(n) AS n_source
FROM drawn GROUP BY 1
"""


def q_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive negative sampling under the gate: 4 hash-derived
    partners per document over the dense doc_id space; self-draws
    dropped. Pure narrow map — the oracle re-derives every draw."""
    from etl_finance_pipeline_spark.operators.corpus import negative_pairs

    docs = load_table(spark, _t(sf_dir, "documents"))
    n_total = docs.count()
    out = negative_pairs(docs, "doc_id", n_total=n_total, k=4)
    return out.select(
        "anchor",
        F.col("draw").cast("long").alias("draw"),
        F.col("partner").cast("long").alias("partner"),
    )


SQL_NEGATIVE_PAIRS = """
WITH n AS (SELECT count(*) AS total FROM documents),
d AS (
  SELECT doc_id AS anchor, unnest(range(0, 4)) AS draw FROM documents
)
SELECT * FROM (
  SELECT anchor, CAST(draw AS BIGINT) AS draw,
         CAST(
           ((('0x' || substr(md5(CAST(anchor AS VARCHAR) || ':'
                                 || CAST(draw AS VARCHAR)), 1, 15))::BIGINT
             % n.total) + n.total) % n.total
         AS BIGINT) AS partner
  FROM d CROSS JOIN n
) WHERE partner != anchor
"""


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source volume cap (training-mix balance) under the gate:
    sources over 80 docs keep a hash-gated ≈80/n fraction; smaller
    sources keep everything. Output = per-source kept counts."""
    from etl_finance_pipeline_spark.operators.corpus import domain_cap_sample

    docs = load_table(spark, _t(sf_dir, "documents"))
    kept = domain_cap_sample(docs, "doc_id", "source", cap=80)
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.max("domain_total").cast("long").alias("domain_total"),
    )


SQL_DOMAIN_CAP = """
WITH counts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS domain_total
  FROM documents GROUP BY 1
),
kept AS (
  SELECT d.source, c.domain_total
  FROM documents d JOIN counts c USING (source)
  WHERE c.domain_total <= 80
     OR (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
         % 1000000)
        < CAST(floor(80 * 1000000 / c.domain_total) AS BIGINT)
)
SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
       max(domain_total) AS domain_total
FROM kept GROUP BY 1
"""


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 0.9/0.05/0.05 train/val/test split: per-split
    per-source counts — stable under reruns and corpus appends."""
    from etl_finance_pipeline_spark.operators.corpus import hash_split

    docs = load_table(spark, _t(sf_dir, "documents"))
    out = hash_split(docs, "doc_id")
    return out.groupBy("split", "source").agg(F.count("*").alias("n"))


SQL_HASH_SPLIT = """
WITH b AS (
  SELECT source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % 1000000 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 900000 THEN 'train'
            WHEN bucket < 950000 THEN 'val'
            ELSE 'test' END AS split,
       source, CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY 1, 2
"""


def q_stream_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming trending report: 6-hour tumbling-window counts per
    event type maintained BY STREAMING aggregation (complete mode →
    availableNow → memory sink), then the top-3 per window ranked
    from the materialized counts (ranking windows aren't allowed on
    an unaggregated stream — serve-side rank over the tiny state IS
    the production shape). Oracle = the batch windowed count + rank."""
    import uuid

    spark = _narrow_session(spark, 8)
    stream = _read_event_stream(spark, sf_dir)
    counts = stream.groupBy(
        F.window("ts", "6 hours").alias("w"), "event_type"
    ).agg(F.count("*").alias("n"))
    name = f"stream_trending_{uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    mat = spark.table(name).select(
        F.col("w.start").alias("window_start"), "event_type", "n"
    )
    rk = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        mat.withColumn("rank", F.row_number().over(rk).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("window_start", "event_type", F.col("n").cast("long").alias("n"), "rank")
    )


SQL_STREAM_TRENDING = """
WITH c AS (
  SELECT time_bucket(INTERVAL 6 HOUR, ts) AS window_start,
         event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT window_start, event_type, n,
       CAST(row_number() OVER (
         PARTITION BY window_start ORDER BY n DESC, event_type
       ) AS BIGINT) AS rank
FROM c QUALIFY rank <= 3
"""


def q_stream_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING near-dup lane: documents with doc_id % 10 == 0
    arrive as a file stream; each microbatch LSH-checks against the
    standing corpus (the rest of the table, held in the transactional
    table format) and appends candidates to an output table via the
    exactly-once foreachBatch sink. The oracle is the BATCH
    incremental near-dup SQL — availableNow-vs-batch equivalence,
    the same device ``stream_cms`` uses — so this proves the
    streaming stage computes the identical candidate set."""
    import tempfile
    import uuid

    from etl_finance_pipeline_spark.sources.table_format import (
        read_table,
        write_table,
    )
    from etl_finance_pipeline_spark.streaming.neardup import (
        stream_near_dup_against_corpus,
    )

    spark = _narrow_session(spark, 8)
    docs = _docs_spread(spark, sf_dir).select("doc_id", "text")
    root = tempfile.mkdtemp(prefix=f"stream_near_dup_{uuid.uuid4().hex[:8]}_")
    corpus_table = f"{root}/corpus"
    out_table = f"{root}/pairs"
    write_table(docs.filter(F.col("doc_id") % 10 != 0), corpus_table)

    path = _t(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(path[:-1] + "[t]")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
    )
    q = stream_near_dup_against_corpus(
        stream,
        corpus_table,
        out_table,
        checkpoint_dir=f"{root}/ckpt",
    )
    _await_stream(q)
    out = read_table(spark, out_table)
    return out.select(
        "batch_id", "corpus_id", _pr("est_jaccard", 6).alias("est_jaccard")
    )


SQL_STREAM_NEAR_DUP = SQL_INCREMENTAL_NEAR_DUP


def q_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second mapInPandas media kernel under the gate: the audio
    decode path (fake codec = signed 8-bit PCM over the payload
    bytes). ASCII payload bytes are the character codes, so the oracle
    reproduces RMS/peak/duration exactly — Python's integer
    sum-of-squares and DuckDB's list_sum are both exact, and the final
    sqrt/divide run the same double ops."""
    from etl_finance_pipeline_spark.operators.multimodal import decode_audio_stats

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("content")
    )
    out = decode_audio_stats(docs)
    return out.select(
        F.col("media_id").alias("doc_id"),
        F.col("stats.n_samples").alias("n_samples"),
        _pr(F.col("stats.duration_s"), 6).alias("duration_s"),
        _pr(F.col("stats.rms"), 6).alias("rms"),
        F.col("stats.peak").cast("long").alias("peak"),
    )


SQL_AUDIO_STATS = """
WITH codes AS (
  SELECT doc_id, len(text) AS n,
         list_transform(generate_series(1, len(text)),
                        i -> ord(substr(text, i, 1))) AS c
  FROM documents
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_samples,
       floor((n / 16000.0) * 1000000 + 0.5) / 1000000 AS duration_s,
       floor(sqrt(list_sum(list_transform(c, x -> CAST(x * x AS DOUBLE))) / n) * 1000000 + 0.5) / 1000000 AS rms,
       CAST(list_max(c) AS BIGINT) AS peak
FROM codes
"""


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third mapInPandas media kernel under the gate: 1→N frame
    sampling (fake codec = consecutive 64-byte frames, every 10th
    emitted). Frames hash to md5 hex so the oracle compares content
    without a cross-engine binary column; ASCII payload bytes equal
    the text's character bytes, so DuckDB's substr reproduces each
    frame exactly."""
    from etl_finance_pipeline_spark.operators.multimodal import sample_video_frames

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("content")
    )
    out = sample_video_frames(docs, every_n=10, frame_bytes=64)
    return out.select(
        F.col("media_id").alias("doc_id"),
        F.col("frame_index").cast("long").alias("frame_index"),
        F.md5("frame").alias("frame_md5"),
        F.length("frame").cast("long").alias("n_bytes"),
    )


SQL_VIDEO_FRAMES = """
WITH idx AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(len(text) // 64 AS BIGINT), 10)) AS i
  FROM documents
)
SELECT doc_id,
       CAST(i AS BIGINT) AS frame_index,
       md5(substr(text, CAST(i * 64 + 1 AS BIGINT), 64)) AS frame_md5,
       CAST(64 AS BIGINT) AS n_bytes
FROM idx
"""


def q_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection on the fake-video lane: adjacent
    64-byte frames report their mean absolute byte difference and a
    cut flag — numpy-vectorized per clip inside mapInPandas; integer
    sums + one division, so the oracle recomputes every delta from
    the character codes exactly."""
    from etl_finance_pipeline_spark.operators.multimodal import frame_delta_stats

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("content")
    )
    out = frame_delta_stats(docs, frame_bytes=64, cut_threshold=30.0)
    return out.select(
        F.col("media_id").alias("doc_id"),
        F.col("frame_index").cast("long").alias("frame_index"),
        _pr("delta", 6).alias("delta"),
        F.col("is_cut"),
    )


SQL_SCENE_CUTS = """
WITH f AS (
  SELECT doc_id, text, CAST(len(text) // 64 AS BIGINT) AS nf FROM documents
),
idx AS (
  SELECT doc_id, text, unnest(range(1, nf)) AS i FROM f WHERE nf >= 2
),
d AS (
  SELECT doc_id, i,
         list_sum(list_transform(generate_series(1, 64),
           j -> abs(ord(substr(text, CAST(i * 64 + j AS BIGINT), 1))
                    - ord(substr(text, CAST((i - 1) * 64 + j AS BIGINT), 1)))
         )) / 64.0 AS delta
  FROM idx
)
SELECT doc_id, CAST(i AS BIGINT) AS frame_index,
       floor(delta * 1000000 + 0.5) / 1000000 AS delta,
       delta > 30.0 AS is_cut
FROM d
"""


def q_audio_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence segmentation on the fake-PCM lane: 100-sample windows,
    exact integer sum-of-squares RMS, threshold 80 (ASCII character
    codes run ~32-126, so real text straddles the line). The oracle
    recomputes every window from character codes."""
    from etl_finance_pipeline_spark.operators.multimodal import detect_silence

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("content")
    )
    out = detect_silence(docs, window_samples=100, rms_threshold=80.0)
    return out.select(
        F.col("media_id").alias("doc_id"),
        F.col("n_windows").cast("long").alias("n_windows"),
        F.col("n_silent").cast("long").alias("n_silent"),
        _pr("silence_frac", 6).alias("silence_frac"),
    )


SQL_AUDIO_SILENCE = """
WITH f AS (
  SELECT doc_id, text, CAST(len(text) // 100 AS BIGINT) AS nw FROM documents
),
win AS (
  SELECT doc_id, text, unnest(range(0, nw)) AS w FROM f WHERE nw >= 1
),
r AS (
  SELECT doc_id, w,
         sqrt(list_sum(list_transform(generate_series(1, 100),
           j -> CAST(
             (CASE WHEN ord(substr(text, CAST(w * 100 + j AS BIGINT), 1)) > 127
                   THEN ord(substr(text, CAST(w * 100 + j AS BIGINT), 1)) - 256
                   ELSE ord(substr(text, CAST(w * 100 + j AS BIGINT), 1)) END)
             * (CASE WHEN ord(substr(text, CAST(w * 100 + j AS BIGINT), 1)) > 127
                     THEN ord(substr(text, CAST(w * 100 + j AS BIGINT), 1)) - 256
                     ELSE ord(substr(text, CAST(w * 100 + j AS BIGINT), 1)) END)
             AS DOUBLE)
         )) / 100.0) AS rms
  FROM win
),
agg AS (
  SELECT doc_id, count(*) AS n_windows,
         sum(CASE WHEN rms < 80.0 THEN 1 ELSE 0 END) AS n_silent
  FROM r GROUP BY 1
)
SELECT f.doc_id,
       CAST(coalesce(agg.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(agg.n_silent, 0) AS BIGINT) AS n_silent,
       CASE WHEN agg.n_windows IS NULL THEN NULL
            ELSE floor((agg.n_silent * 1.0 / agg.n_windows) * 1000000 + 0.5)
                 / 1000000 END AS silence_frac
FROM f LEFT JOIN agg USING (doc_id)
"""


def q_audio_stats_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec path under the oracle gate: document text
    bytes → a genuine RIFF/WAV container (16-bit PCM mono, written by
    the stdlib ``wave`` module) → ``decode_audio_stats(decode="wav")``
    which re-parses the container — rate and frame count come from the
    WAV header, samples from the PCM chunk. Encoder maps byte b to
    sample (b-128)*256, so the oracle derives the identical stats from
    the character codes; sum-of-squares is exact in doubles (< 2^53)
    and the final sqrt/divide run the same double ops both sides."""
    from etl_finance_pipeline_spark.operators.multimodal import (
        decode_audio_stats,
        encode_wav_pcm16,
    )

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("content")
    )
    wav = encode_wav_pcm16(docs, sample_rate=16_000)
    out = decode_audio_stats(wav, decode="wav")
    return out.select(
        F.col("media_id").alias("doc_id"),
        F.col("stats.n_samples").alias("n_samples"),
        _pr(F.col("stats.duration_s"), 6).alias("duration_s"),
        _pr(F.col("stats.rms"), 6).alias("rms"),
        F.col("stats.peak").cast("long").alias("peak"),
    )


SQL_AUDIO_STATS_WAV = """
WITH codes AS (
  SELECT doc_id, len(text) AS n,
         list_transform(generate_series(1, len(text)),
                        i -> (ord(substr(text, i, 1)) - 128) * 256) AS s
  FROM documents
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_samples,
       floor((n / 16000.0) * 1000000 + 0.5) / 1000000 AS duration_s,
       floor(sqrt(list_sum(list_transform(s, x -> CAST(x * x AS DOUBLE))) / n) * 1000000 + 0.5) / 1000000 AS rms,
       CAST(list_max(list_transform(s, x -> abs(x))) AS BIGINT) AS peak
FROM codes
"""


_PPM_W, _PPM_H = 8, 8  # 192-byte raster


def q_image_stats_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec path under the oracle gate: text bytes wrapped
    into a genuine netpbm P6 container (JVM-side concat of header +
    zero-padded raster), then ``decode_image_stats(decode="ppm")``
    parses the header back (magic, dimensions, maxval, comment rules)
    and computes stats over exactly the raster. Width/height in the
    output come from the PARSED header, not the query constants — a
    header-parse bug would break the hash match."""
    from etl_finance_pipeline_spark.operators.multimodal import (
        decode_image_stats,
        encode_ppm,
    )

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("content")
    )
    ppm = encode_ppm(docs, width=_PPM_W, height=_PPM_H)
    out = decode_image_stats(ppm, decode="ppm")
    return out.select(
        F.col("media_id").alias("doc_id"),
        F.col("stats.n_bytes").alias("n_bytes"),
        _pr(F.col("stats.mean_intensity"), 6).alias("mean_intensity"),
        F.col("stats.min_byte").cast("long").alias("min_byte"),
        F.col("stats.max_byte").cast("long").alias("max_byte"),
        F.col("stats.width").cast("long").alias("width"),
        F.col("stats.height").cast("long").alias("height"),
    )


SQL_IMAGE_STATS_PPM = f"""
WITH codes AS (
  SELECT doc_id,
         list_transform(generate_series(1, {_PPM_W * _PPM_H * 3}),
                        i -> CASE WHEN i <= len(text)
                                  THEN ord(substr(text, i, 1))
                                  ELSE 0 END) AS c
  FROM documents
)
SELECT doc_id,
       CAST({_PPM_W * _PPM_H * 3} AS BIGINT) AS n_bytes,
       floor((list_sum(list_transform(c, x -> CAST(x AS DOUBLE))) / {_PPM_W * _PPM_H * 3}) * 1000000 + 0.5) / 1000000 AS mean_intensity,
       CAST(list_min(c) AS BIGINT) AS min_byte,
       CAST(list_max(c) AS BIGINT) AS max_byte,
       CAST({_PPM_W} AS BIGINT) AS width,
       CAST({_PPM_H} AS BIGINT) AS height
FROM codes
"""


def q_image_stats_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed image codec path under the oracle gate: text
    bytes → a spec-conformant PNG (8-bit RGB, Sub-filtered scanlines,
    DEFLATE via stdlib zlib, CRC-stamped chunks) → ``decode_image_stats
    (decode="png")`` which walks the chunks, inflates IDAT and reverses
    the scanline filter. Stats over the decoded raster must equal the
    pre-compression bytes — a bug anywhere in the filter/deflate
    round-trip breaks the hash match. Width/height come from the parsed
    IHDR."""
    from etl_finance_pipeline_spark.operators.multimodal import (
        decode_image_stats,
        encode_png,
    )

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("content")
    )
    png = encode_png(docs, width=_PPM_W, height=_PPM_H, filter_type=1)
    out = decode_image_stats(png, decode="png")
    return out.select(
        F.col("media_id").alias("doc_id"),
        F.col("stats.n_bytes").alias("n_bytes"),
        _pr(F.col("stats.mean_intensity"), 6).alias("mean_intensity"),
        F.col("stats.min_byte").cast("long").alias("min_byte"),
        F.col("stats.max_byte").cast("long").alias("max_byte"),
        F.col("stats.width").cast("long").alias("width"),
        F.col("stats.height").cast("long").alias("height"),
    )


# lossless round-trip ⇒ the decoded raster is byte-identical to the
# zero-padded text bytes, so the PNG oracle IS the PPM oracle
SQL_IMAGE_STATS_PNG = SQL_IMAGE_STATS_PPM


def q_stream_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState)
    under the oracle gate: per-symbol continuity state emits a gap row
    whenever the next event arrives more than one minute after the
    last. Deterministic on static data — the kernel orders each key's
    batch and does integer-microsecond arithmetic — so the oracle is a
    plain lag() over the batch (the trailing open gap is never emitted
    because no next event closes it)."""
    import uuid

    from etl_finance_pipeline_spark.streaming.candles import stream_gap_monitor

    spark = _narrow_session(spark, 8)
    stream = _read_event_stream(spark, sf_dir)
    gaps = stream_gap_monitor(
        stream, "1T", key_col="event_type", ts_col="ts", watermark="10 minutes"
    )
    name = f"stream_gaps_{uuid.uuid4().hex[:8]}"
    q = (
        gaps.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.table(name).select(
        "symbol",
        "gap_start",
        "gap_end",
        _pr("gap_seconds", 6).alias("gap_seconds"),
    )


SQL_STREAM_GAPS = """
WITH o AS (
  SELECT event_type AS symbol, ts,
         lag(ts) OVER (PARTITION BY event_type ORDER BY ts) AS prev
  FROM events
)
SELECT symbol, prev AS gap_start, ts AS gap_end,
       floor((epoch_us(ts - prev) / 1000000.0) * 1000000 + 0.5) / 1000000 AS gap_seconds
FROM o
WHERE prev IS NOT NULL AND ts - prev > INTERVAL 1 MINUTE
"""


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join driven to completion on static
    data: purchase events enriched with the customer dimension
    (broadcast). Stateless — no watermark or state store — so the
    availableNow run emits exactly the batch join, which is what the
    oracle computes."""
    import uuid

    from etl_finance_pipeline_spark.streaming.candles import stream_enrich

    stream = _read_event_stream(spark, sf_dir)
    cust = load_table(spark, _t(sf_dir, "customer")).select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
    )
    enriched = stream_enrich(
        stream.filter("event_type = 'purchase'"),
        cust,
        F.col("user_id") == F.col("c_custkey"),
    )
    name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.table(name).select(
        "event_id", "user_id", "ts", _pr("value", 6).alias("value"), "segment", "nationkey"
    )


SQL_STREAM_ENRICH = """
SELECT e.event_id, e.user_id, e.ts,
       floor(e.value * 1000000 + 0.5) / 1000000 AS value,
       c.c_mktsegment AS segment, c.c_nationkey AS nationkey
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE e.event_type = 'purchase'
"""


def q_stream_view_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join driven to completion on static
    data: each view matched to the same user's clicks within the next
    5 minutes. The static file arrives as one microbatch, so no state
    is evicted mid-run and the inner join emits exactly the batch
    result — which is what the oracle computes."""
    import uuid

    from etl_finance_pipeline_spark.streaming.candles import stream_interval_join

    # a stream-stream join keeps FOUR state stores per shuffle
    # partition; for a single availableNow microbatch the per-store
    # fixed cost dominates (measured 14.2s at 32 partitions vs 3.1s at
    # 8 on sf0.1). On a live cluster, size partitions to state volume,
    # not core count.
    spark = _narrow_session(spark, 8)
    stream = _read_event_stream(spark, sf_dir)
    views = stream.filter("event_type = 'view'").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    clicks = stream.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    joined = stream_interval_join(
        views,
        clicks,
        "user_id = click_user AND click_ts >= view_ts "
        "AND click_ts <= view_ts + interval 5 minutes",
        "view_ts",
        "click_ts",
    )
    name = f"stream_vc_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.table(name).select(
        "view_id", "click_id", "user_id", "view_ts", "click_ts"
    )


SQL_STREAM_VIEW_CLICK = """
SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
       v.ts AS view_ts, c.ts AS click_ts
FROM events v
JOIN events c
  ON v.user_id = c.user_id
 AND c.ts >= v.ts
 AND c.ts <= v.ts + INTERVAL 5 MINUTE
WHERE v.event_type = 'view' AND c.event_type = 'click'
"""


# --------------------------------------------------------------------
# Multimodal plumbing under the oracle gate
# --------------------------------------------------------------------

def q_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives the Arrow-batched mapInPandas decode path under the
    oracle: documents' text encoded to binary payloads, then
    decode_image_stats (byte-level kernel). For ASCII text the bytes
    are the character codes, so DuckDB reproduces the stats exactly."""
    from etl_finance_pipeline_spark.operators.multimodal import decode_image_stats

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("content")
    )
    out = decode_image_stats(docs)
    return out.select(
        F.col("media_id").alias("doc_id"),
        F.col("stats.n_bytes").alias("n_bytes"),
        _pr(F.col("stats.mean_intensity"), 6).alias("mean_intensity"),
        F.col("stats.min_byte").cast("long").alias("min_byte"),
        F.col("stats.max_byte").cast("long").alias("max_byte"),
    )


SQL_MEDIA_STATS = """
WITH codes AS (
  SELECT doc_id, len(text) AS n,
         list_transform(generate_series(1, len(text)),
                        i -> ord(substr(text, i, 1))) AS c
  FROM documents
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_bytes,
       floor((list_sum(list_transform(c, x -> CAST(x AS DOUBLE))) / n) * 1000000 + 0.5) / 1000000 AS mean_intensity,
       CAST(list_min(c) AS BIGINT) AS min_byte,
       CAST(list_max(c) AS BIGINT) AS max_byte
FROM codes
"""


# --------------------------------------------------------------------
# Corpus cleaning — the composed training-data pipeline
# --------------------------------------------------------------------

def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-cleaning pipeline as ONE lazy plan:
    quality filter (score ≥ 0.5) → exact dedup (keep min doc_id per
    text) → MinHash-LSH near-dup removal (drop the higher doc_id of
    every pair with estimated Jaccard ≥ 0.7; single-pass greedy, the
    standard corpus-dedup heuristic — not transitive closure).
    Output: the surviving documents with their quality metrics."""
    from etl_finance_pipeline_spark.operators.dedup import (
        exact_duplicates,
        minhash_lsh_pairs,
    )
    from etl_finance_pipeline_spark.operators.text_analysis import quality_score

    docs = _docs_spread(spark, sf_dir)
    kept = quality_score(docs).filter(F.col("quality") >= 0.5)
    exact = exact_duplicates(kept, ["text"], "doc_id")
    near = minhash_lsh_pairs(exact).filter(F.col("est_jaccard") >= 0.7)
    drop = near.select(F.col("id_b").alias("doc_id")).distinct()
    clean = exact.join(drop, on="doc_id", how="left_anti")
    return clean.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        _pr("quality", 6).alias("quality"),
    )


SQL_CLEAN_CORPUS = f"""
WITH tokd0 AS (
  SELECT *, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
m AS (
  SELECT doc_id, text, lang, n_chars, toks,
    len(toks) AS n_tokens,
    list_sum(list_transform(toks, t -> CAST(len(t) AS DOUBLE))) / len(toks) AS avg_token_len,
    len(list_filter(toks, t -> t IN ({_stop_list('en')}))) * 1.0 / len(toks) AS stopword_ratio,
    len(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / len(text) AS digit_ratio,
    len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0 / len(text) AS punct_ratio,
    len(text) AS n_chars2
  FROM tokd0
),
scored AS (
  SELECT doc_id, text, lang, n_chars, toks,
    (CASE WHEN n_chars2 >= 50 AND n_chars2 <= 10000 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN avg_token_len >= 3 AND avg_token_len <= 10 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN stopword_ratio >= 0.05 THEN 0.3 ELSE 0.0 END)
    + (1.0 - least(digit_ratio + punct_ratio, 1.0)) * 0.2 AS quality
  FROM m
),
kept AS (
  SELECT * FROM scored WHERE quality >= 0.5
),
exact AS (
  SELECT * FROM kept
  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
  FROM exact
),
h AS (
  SELECT doc_id, {_H64.format(s='shingle')} % {M31} AS h31 FROM sh
),
sig AS (
  SELECT doc_id,
    {_SIG_COLS}
  FROM h GROUP BY doc_id
),
bands AS (
  {_BANDS_SQL}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, k1, k2, k3, k4)
  WHERE a.doc_id < b.doc_id
),
near AS (
  SELECT c.id_a, c.id_b, ({_EQ_TERMS}) / 16.0 AS est
  FROM cand c
  JOIN sig a ON a.doc_id = c.id_a
  JOIN sig b ON b.doc_id = c.id_b
),
dropped AS (
  SELECT DISTINCT id_b AS doc_id FROM near WHERE est >= 0.7
)
SELECT e.doc_id, e.lang, CAST(e.n_chars AS BIGINT) AS n_chars,
       floor(e.quality * 1000000 + 0.5) / 1000000 AS quality
FROM exact e
WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.doc_id = e.doc_id)
"""


# --------------------------------------------------------------------
# Temporal: as-of join, sessionization, JSON props extraction
# --------------------------------------------------------------------

def q_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's most recent click at or
    before the purchase time — oracle is DuckDB's native ASOF JOIN."""
    from etl_finance_pipeline_spark.operators.temporal import asof_join

    ev = load_table(spark, _t(sf_dir, "events"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    out = asof_join(
        purchases, clicks, ["user_id"], ts_col="ts",
        right_value_cols=["click_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").alias("purchase_value"),
        F.col("ts_right").alias("click_ts"),
        "click_value_right",
    ).withColumnRenamed("click_value_right", "click_value")


SQL_ASOF_LAST_CLICK = """
WITH p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts, value AS click_value FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.ts, p.value AS purchase_value,
       c.ts AS click_ts, c.click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_asof_next_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join's FORWARD direction with a tolerance: each
    purchase matched to the user's next view within 10 minutes
    (attribution-window shape). Oracle = DuckDB ASOF with <= plus a
    tolerance CASE; unmatched / out-of-window rows keep NULLs."""
    from etl_finance_pipeline_spark.operators.temporal import asof_join

    ev = load_table(spark, _t(sf_dir, "events"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    out = asof_join(
        purchases,
        views,
        ["user_id"],
        ts_col="ts",
        right_value_cols=["view_value"],
        direction="forward",
        tolerance_seconds=600,
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").alias("purchase_value"),
        F.col("ts_right").alias("view_ts"),
        F.col("view_value_right").alias("view_value"),
    )


SQL_ASOF_NEXT_VIEW = """
WITH p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id, ts, value AS view_value FROM events WHERE event_type = 'view'
), j AS (
  SELECT p.event_id, p.user_id, p.ts, p.value AS purchase_value,
         v.ts AS _vts, v.view_value AS _vval
  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
)
SELECT event_id, user_id, ts, purchase_value,
       CASE WHEN _vts <= ts + INTERVAL 10 MINUTE THEN _vts END AS view_ts,
       CASE WHEN _vts <= ts + INTERVAL 10 MINUTE THEN _vval END AS view_value
FROM j
"""


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization of the event stream per user."""
    from etl_finance_pipeline_spark.operators.temporal import sessionize

    ev = load_table(spark, _t(sf_dir, "events"))
    out = sessionize(
        ev, "30T", ["user_id"], ts_col="ts",
        aggs=[_pr(F.sum("value"), 6).alias("sum_value")],
    )
    return out.select(
        "user_id", "session_start", "session_end_last",
        F.col("n_events").cast("long").alias("n_events"), "sum_value",
    )


SQL_USER_SESSIONS = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS session_end_last,
       count(*) AS n_events,
       floor((sum(value)) * 1000000 + 0.5) / 1000000 AS sum_value
FROM numbered
GROUP BY user_id, session_id
"""


def q_session_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: error events matched into each user's 30-minute
    sessions (point-in-interval equality-bin join), error count per
    session."""
    from etl_finance_pipeline_spark.operators.temporal import range_join, sessionize

    ev = load_table(spark, _t(sf_dir, "events"))
    sessions = sessionize(ev, "30T", ["user_id"], ts_col="ts")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    joined = range_join(
        errors, sessions, ["user_id"], "ts", "session_start", "session_end_last",
        bin_seconds=1800,
    )
    return (
        joined.groupBy("user_id", "session_start")
        .agg(F.count("*").alias("n_errors"))
    )


SQL_SESSION_ERRORS = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM marked
), sessions AS (
  SELECT user_id, min(ts) AS session_start, max(ts) AS session_end_last
  FROM numbered GROUP BY user_id, session_id
), errors AS (
  SELECT user_id, ts FROM events WHERE event_type = 'error'
)
SELECT s.user_id, s.session_start, count(*) AS n_errors
FROM sessions s
JOIN errors e
  ON e.user_id = s.user_id
 AND e.ts >= s.session_start AND e.ts <= s.session_end_last
GROUP BY 1, 2
"""


def q_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull ``k`` out of the JSON props
    column, profile it per event type (JVM-side get_json_object)."""
    ev = load_table(spark, _t(sf_dir, "events"))
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.withColumn("_k", k)
        .groupBy("event_type")
        .agg(
            F.count("_k").alias("n_with_k"),
            F.min("_k").alias("k_min"),
            F.max("_k").alias("k_max"),
            _pr(F.avg("_k"), 6).alias("k_avg"),
            F.sum((F.col("_k") > 50).cast("long")).alias("n_k_gt_50"),
        )
    )


SQL_PROPS_EXTRACT = """
WITH e AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       count(k) AS n_with_k,
       min(k) AS k_min,
       max(k) AS k_max,
       floor((avg(k)) * 1000000 + 0.5) / 1000000 AS k_avg,
       CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_k_gt_50
FROM e
GROUP BY event_type
"""


# --------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------

# --------------------------------------------------------------------
# BPE tokenizer training (iterative merge learning)
# --------------------------------------------------------------------

_BPE_MERGES = 6


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-table training end-to-end in-engine: the oracle
    unrolls the identical rounds (vocab → pair counts → top-1 merge →
    unit-string replace), so the learned merge table hash-matches —
    the same unrolled-iteration device as the kmeans codebook
    oracle."""
    from etl_finance_pipeline_spark.operators.tokenizer import bpe_train

    docs = load_table(spark, _t(sf_dir, "documents"))
    return bpe_train(docs, n_merges=_BPE_MERGES)


def _bpe_round_sql(i: int, p: str = "") -> str:
    return f"""
{p}sy{i} AS (
  SELECT string_split(substr(s, 2, length(s) - 2), chr(2) || chr(1)) AS syms, wc
  FROM {p}u{i - 1}
),
{p}px{i} AS (
  SELECT unnest(generate_series(1, len(syms) - 1)) AS i, syms, wc FROM {p}sy{i}
),
{p}pr{i} AS (
  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(wc) AS BIGINT) AS cnt
  FROM {p}px{i} GROUP BY 1, 2
),
{p}b{i} AS MATERIALIZED (SELECT l, r, cnt FROM {p}pr{i} ORDER BY cnt DESC, l, r LIMIT 1),
{p}u{i} AS MATERIALIZED (
  SELECT replace(s,
                 chr(1) || (SELECT l FROM {p}b{i}) || chr(2) || chr(1) || (SELECT r FROM {p}b{i}) || chr(2),
                 chr(1) || (SELECT l FROM {p}b{i}) || (SELECT r FROM {p}b{i}) || chr(2)) AS s,
         wc
  FROM {p}u{i - 1}
)"""


def _bpe_encode_round_sql(i: int, p: str = "") -> str:
    return f"""
{p}e{i} AS (
  SELECT w, replace(
    s,
    (SELECT chr(1) || l || chr(2) || chr(1) || r || chr(2) FROM {p}b{i}),
    (SELECT chr(1) || l || r || chr(2) FROM {p}b{i})
  ) AS s
  FROM {p}e{i - 1}
)"""


SQL_BPE_TRAIN = (
    r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
  FROM documents
),
words AS (SELECT w, count(*) AS wc FROM toks GROUP BY 1),
u0 AS MATERIALIZED (
  SELECT array_to_string(list_transform(generate_series(1, len(w)),
                                        i -> chr(1) || w[i] || chr(2)), '') AS s,
         wc
  FROM words
),"""
    + ",".join(_bpe_round_sql(i) for i in range(1, _BPE_MERGES + 1))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_round, l AS left_sym, r AS right_sym, "
        f"l || r AS merged, cnt AS pair_count FROM b{i}"
        for i in range(1, _BPE_MERGES + 1)
    )
)


# --------------------------------------------------------------------
# Byte-level BPE (GPT-2 lineage: closed 256-symbol base alphabet)
# --------------------------------------------------------------------

#: unit-string constructor over a word column ``w`` — byte-level: the
#: word's UTF-8 bytes as uppercase hex pairs (DuckDB twin of
#: tokenizer._word_units(byte_level=True))
_BYTE_UNITS_SQL = (
    "array_to_string(list_transform("
    "regexp_extract_all(upper(hex(encode(w))), '..'),"
    " b -> chr(1) || b || chr(2)), '')"
)

_CHAR_UNITS_SQL = (
    "array_to_string(list_transform(generate_series(1, len(w)),"
    " i -> chr(1) || w[i] || chr(2)), '')"
)


def q_bpe_bytes_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BYTE-level BPE training (Radford et al. 2019's GPT-2 recipe
    reduced to its vocabulary algorithm): identical merge mechanics
    to bpe_train but seeded from each word's UTF-8 bytes as hex-pair
    symbols — a closed 256-symbol base alphabet, so the resulting
    vocabulary can encode ANY text with zero OOV (the property the
    char-level trainers lack; tokenizer_oov_cost measures the gap).
    The oracle unrolls the identical rounds over the identical hex
    seeding."""
    from etl_finance_pipeline_spark.operators.tokenizer import bpe_train

    docs = load_table(spark, _t(sf_dir, "documents"))
    return bpe_train(docs, n_merges=_BPE_MERGES, byte_level=True)


SQL_BPE_BYTES_TRAIN = (
    r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
  FROM documents
),
words AS (SELECT w, count(*) AS wc FROM toks GROUP BY 1),
u0 AS MATERIALIZED (
  SELECT """
    + _BYTE_UNITS_SQL
    + r""" AS s, wc
  FROM words
),"""
    + ",".join(_bpe_round_sql(i) for i in range(1, _BPE_MERGES + 1))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_round, l AS left_sym, r AS right_sym, "
        f"l || r AS merged, cnt AS pair_count FROM b{i}"
        for i in range(1, _BPE_MERGES + 1)
    )
)


def q_bpe_bytes_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level BPE train→encode at corpus scale: the learned
    hex-pair merge table compiles into the same replace chain as the
    char lane (narrow, exchange-free); output per doc = byte-token
    count + md5 of the joined symbol stream, so the full byte-level
    path is hash-checked."""
    from etl_finance_pipeline_spark.operators.tokenizer import (
        bpe_encode,
        bpe_train,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(docs, n_merges=_BPE_MERGES, byte_level=True)
        .orderBy("merge_round")
        .collect()
    ]
    out = bpe_encode(docs, merges, byte_level=True)
    return out.select(
        "doc_id",
        F.size("bpe_tokens").cast("long").alias("n_byte_tokens"),
        F.md5(F.encode(F.array_join("bpe_tokens", " "), "UTF-8")).alias(
            "tokens_md5"
        ),
    )


def _bpe_encode_sql(units_expr: str, count_alias: str) -> str:
    """Self-contained train+encode oracle over *units_expr* seeding
    (the SQL_BPE_ENCODE shape, parameterized for byte-level)."""
    return (
        r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
  FROM documents
),
words AS (SELECT w, count(*) AS wc FROM toks GROUP BY 1),
u0 AS MATERIALIZED (
  SELECT """
        + units_expr
        + r""" AS s, wc
  FROM words
),"""
        + ",".join(_bpe_round_sql(i) for i in range(1, _BPE_MERGES + 1))
        + f""",
e0 AS (
  SELECT w, {units_expr} AS s FROM words
)"""
        + ",".join(
            [""]
            + [_bpe_encode_round_sql(i) for i in range(1, _BPE_MERGES + 1)]
        )
        + f""",
docw AS (
  SELECT doc_id, j, t[j] AS w FROM (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
    FROM documents
  ), LATERAL (SELECT unnest(generate_series(1, len(t))) AS j) g
),
assembled AS (
  SELECT d.doc_id,
         string_split(substr(string_agg(e.s, '' ORDER BY d.j), 2,
                             length(string_agg(e.s, '' ORDER BY d.j)) - 2),
                      chr(2) || chr(1)) AS syms
  FROM docw d JOIN e{_BPE_MERGES} e USING (w)
  GROUP BY d.doc_id
)
SELECT doc_id, CAST(len(syms) AS BIGINT) AS {count_alias},
       md5(array_to_string(syms, ' ')) AS tokens_md5
FROM assembled
"""
    )


SQL_BPE_BYTES_ENCODE = _bpe_encode_sql(_BYTE_UNITS_SQL, "n_byte_tokens")


#: glyphs appended to HOLDOUT text only (one per doc, by doc_id % 3):
#: the fixture alphabet is a–z in every document, so no train/eval
#: split can surface an unseen character — the unseen input is
#: synthesized in-engine (the media-lane device). All three are
#: multi-byte UTF-8, so the byte lane decomposes them into in-vocab
#: bytes while the char lane has no id for them.
_OOV_GLYPHS = ("€", "№", "…")
_OOV_DECOR_SQL = (
    "text || ' ' || CASE doc_id % 3"
    + "".join(
        f" WHEN {i} THEN '{g}'" for i, g in enumerate(_OOV_GLYPHS[:-1])
    )
    + f" ELSE '{_OOV_GLYPHS[-1]}' END"
)


def _oov_lane_sql(label: str, p: str, units: str, base_vocab: str) -> str:
    """One tokenizer_oov_cost lane: train BPE (seeded by *units*) on
    the doc_id %% 5 != 0 split, encode the %% 5 == 0 holdout
    (glyph-decorated, ``_OOV_GLYPHS``), and count emitted symbols
    absent from the lane's id-mapping vocabulary (*base_vocab*
    symbols + learned merges)."""
    rounds_train = ",".join(
        _bpe_round_sql(i, p) for i in range(1, _BPE_MERGES + 1)
    )
    rounds_enc = ",".join(
        _bpe_encode_round_sql(i, p) for i in range(1, _BPE_MERGES + 1)
    )
    merge_union = " UNION ALL ".join(
        f"SELECT l, r FROM {p}b{i}" for i in range(1, _BPE_MERGES + 1)
    )
    return f"""{p}toks AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
  FROM documents WHERE doc_id % 5 != 0
),
{p}words AS (SELECT w, count(*) AS wc FROM {p}toks GROUP BY 1),
{p}u0 AS MATERIALIZED (
  SELECT {units} AS s, wc FROM {p}words
),{rounds_train},
{p}ht AS (
  SELECT unnest(regexp_split_to_array(lower(trim({_OOV_DECOR_SQL})), '\\s+')) AS w
  FROM documents WHERE doc_id % 5 = 0
),
{p}hw AS (SELECT w, count(*) AS wc FROM {p}ht GROUP BY 1),
{p}e0 AS (SELECT w, {units} AS s FROM {p}hw),{rounds_enc},
{p}sy AS (
  SELECT w, string_split(substr(s, 2, length(s) - 2), chr(2) || chr(1)) AS syms
  FROM {p}e{_BPE_MERGES}
),
{p}vocab AS (
  SELECT v FROM ({base_vocab})
  UNION
  SELECT l || r AS v FROM ({merge_union})
),
{p}tok AS (
  SELECT w, unnest(syms) AS sym FROM {p}sy
),
{p}ov AS (
  SELECT t.sym, hw.wc, CASE WHEN v.v IS NULL THEN 1 ELSE 0 END AS o
  FROM {p}tok t
  JOIN {p}hw hw ON hw.w = t.w
  LEFT JOIN {p}vocab v ON v.v = t.sym
),
{p}agg AS (
  SELECT '{label}' AS tokenizer,
         CAST(sum(wc) AS BIGINT) AS n_tokens,
         CAST(sum(o * wc) AS BIGINT) AS n_oov,
         floor(sum(o * wc) * 1.0 / sum(wc) * 1000000 + 0.5) / 1000000 AS oov_rate,
         CAST(count(DISTINCT CASE WHEN o = 1 THEN sym END) AS BIGINT) AS n_unique_oov
  FROM {p}ov
)"""


def q_tokenizer_oov_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The word-level trainers' OOV blind spot, measured: train a
    CHAR-seeded and a BYTE-seeded BPE (same merge budget) on 80% of
    the corpus (doc_id % 5 != 0), encode the held-out 20% — decorated
    with deterministic non-ASCII glyphs (``_OOV_GLYPHS``; the fixture
    alphabet is closed under any split, so the unseen input is
    synthesized in-engine like the media lanes' payloads) — and count
    emitted symbols with NO id in the trained vocabulary (base
    symbols seen in training + learned merges) — the tokens a
    deployed id-mapping would send to <unk>. The byte lane's base
    alphabet is all 256 bytes BY CONSTRUCTION: the glyphs decompose
    into in-vocab UTF-8 bytes and its n_oov is a measured zero — the
    structural no-OOV guarantee char-level training cannot give
    (tokenizer_efficiency shows the compression side of the same
    trade)."""
    from etl_finance_pipeline_spark.functions.text import tokens
    from etl_finance_pipeline_spark.operators.tokenizer import (
        bpe_encode,
        bpe_train,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    train = docs.filter(F.col("doc_id") % 5 != 0)
    glyph = F.element_at(
        F.array(*[F.lit(g) for g in _OOV_GLYPHS]),
        (F.col("doc_id") % len(_OOV_GLYPHS) + 1).cast("int"),
    )
    hold = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" "), glyph)
    )
    # the two BPE trainings are independent driver-round loops —
    # overlap them (guide §2.6, same device as tokenizer_efficiency)
    from concurrent.futures import ThreadPoolExecutor

    def _train(byte_level: bool):
        return [
            (r["left_sym"], r["right_sym"])
            for r in bpe_train(
                train, n_merges=_BPE_MERGES, byte_level=byte_level
            )
            .orderBy("merge_round")
            .collect()
        ]

    with ThreadPoolExecutor(max_workers=2) as pool:
        trained = {
            bl: pool.submit(_train, bl) for bl in (True, False)
        }
    outs = []
    for label, byte_level in (("bpe_bytes", True), ("bpe_chars", False)):
        merges = trained[byte_level].result()
        enc = bpe_encode(hold, merges, byte_level=byte_level)
        tok = enc.select(F.explode("bpe_tokens").alias("sym"))
        if byte_level:
            base = spark.range(256).select(
                F.upper(F.lpad(F.hex(F.col("id")), 2, "0")).alias("v")
            )
        else:
            base = (
                train.select(F.explode(tokens("text")).alias("w"))
                .select(F.explode(F.split("w", "")).alias("v"))
                .distinct()
            )
        merged = spark.createDataFrame(
            [(lft + rgt,) for lft, rgt in merges], "v string"
        )
        vocab = base.union(merged).distinct()
        ov = tok.join(F.broadcast(vocab), tok["sym"] == vocab["v"], "left")
        outs.append(
            ov.agg(
                F.count("*").cast("long").alias("n_tokens"),
                F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_oov"),
                F.count_distinct(
                    F.when(F.col("v").isNull(), F.col("sym"))
                ).cast("long").alias("n_unique_oov"),
            ).select(
                F.lit(label).alias("tokenizer"),
                "n_tokens",
                "n_oov",
                _pr(F.col("n_oov") / F.col("n_tokens"), 6).alias(
                    "oov_rate"
                ),
                "n_unique_oov",
            )
        )
    return outs[0].unionByName(outs[1])


SQL_TOKENIZER_OOV_COST = f"""
WITH {_oov_lane_sql(
    "bpe_bytes",
    "ob",
    _BYTE_UNITS_SQL,
    "SELECT DISTINCT upper(lpad(hex(i), 2, '0')) AS v"
    " FROM generate_series(0, 255) AS t(i)",
)},
{_oov_lane_sql(
    "bpe_chars",
    "oc",
    _CHAR_UNITS_SQL,
    "SELECT DISTINCT unnest(list_transform(generate_series(1, len(w)),"
    " i -> w[i])) AS v FROM ocwords",
)}
SELECT tokenizer, n_tokens, n_oov, oov_rate, n_unique_oov FROM obagg
UNION ALL
SELECT tokenizer, n_tokens, n_oov, oov_rate, n_unique_oov FROM ocagg
"""


# --------------------------------------------------------------------
# WordPiece tokenizer training (likelihood-ranked merges)
# --------------------------------------------------------------------

_WP_MERGES = 6


def q_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece (BERT-vocabulary) merge learning: BPE mechanics but
    each round merges the pair maximizing count(ab)/(count(a)·count(b))
    — one IEEE division of exact int64 counts, so any engine computes
    the identical argmax with no rounding contract; the output carries
    the three exact integer counts. The oracle unrolls the identical
    rounds with the same likelihood ranking."""
    from etl_finance_pipeline_spark.operators.tokenizer import (
        wordpiece_train,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    return wordpiece_train(docs, n_merges=_WP_MERGES)


def _wp_round_sql(i: int) -> str:
    return f"""
wsy{i} AS (
  SELECT string_split(substr(s, 2, length(s) - 2), chr(2) || chr(1)) AS syms, wc
  FROM wu{i - 1}
),
wpx{i} AS (
  SELECT unnest(generate_series(1, len(syms) - 1)) AS i, syms, wc FROM wsy{i}
),
wpr{i} AS (
  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(wc) AS BIGINT) AS cnt
  FROM wpx{i} GROUP BY 1, 2
),
wsc{i} AS (
  SELECT sym, CAST(sum(wc) AS BIGINT) AS c FROM (
    SELECT unnest(syms) AS sym, wc FROM wsy{i}
  ) GROUP BY 1
),
wb{i} AS MATERIALIZED (
  SELECT p.l, p.r, p.cnt, cl.c AS lc, cr.c AS rc
  FROM wpr{i} p
  JOIN wsc{i} cl ON cl.sym = p.l
  JOIN wsc{i} cr ON cr.sym = p.r
  ORDER BY p.cnt / (cl.c * cr.c) DESC, p.l, p.r
  LIMIT 1
),
wu{i} AS MATERIALIZED (
  SELECT replace(s,
                 chr(1) || (SELECT l FROM wb{i}) || chr(2) || chr(1) || (SELECT r FROM wb{i}) || chr(2),
                 chr(1) || (SELECT l FROM wb{i}) || (SELECT r FROM wb{i}) || chr(2)) AS s,
         wc
  FROM wu{i - 1}
)"""


SQL_WORDPIECE_TRAIN = (
    r"""
WITH wtoks AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
  FROM documents
),
wwords AS (SELECT w, count(*) AS wc FROM wtoks GROUP BY 1),
wu0 AS MATERIALIZED (
  SELECT array_to_string(list_transform(generate_series(1, len(w)),
                                        i -> chr(1) || w[i] || chr(2)), '') AS s,
         wc
  FROM wwords
),"""
    + ",".join(_wp_round_sql(i) for i in range(1, _WP_MERGES + 1))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_round, l AS left_sym, r AS right_sym, "
        f"l || r AS merged, cnt AS pair_count, lc AS left_count, "
        f"rc AS right_count FROM wb{i}"
        for i in range(1, _WP_MERGES + 1)
    )
)


# --------------------------------------------------------------------
# WordPiece corpus encoding (greedy longest-match-first)
# --------------------------------------------------------------------

def q_wordpiece_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a WordPiece vocabulary, then tokenize the WHOLE corpus
    with greedy longest-match-first segmentation (Devlin et al. 2018)
    — the train→encode loop the trained vocab exists for. The oracle
    replays the identical greedy walk over the distinct-word table
    with a recursive CTE against the same unrolled-merge vocabulary,
    so per-document piece counts hash-match exactly (all-integer, no
    rounding contract)."""
    from etl_finance_pipeline_spark.operators.tokenizer import (
        wordpiece_encode,
        wordpiece_train,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    merges = wordpiece_train(docs, n_merges=_WP_MERGES)
    return wordpiece_encode(docs, merges).select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_pieces").cast("long").alias("n_pieces"),
    )


SQL_WORDPIECE_ENCODE_CORPUS = (
    r"""
WITH RECURSIVE wtoks AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
  FROM documents
),
wwords AS (SELECT w, count(*) AS wc FROM wtoks GROUP BY 1),
wu0 AS MATERIALIZED (
  SELECT array_to_string(list_transform(generate_series(1, len(w)),
                                        i -> chr(1) || w[i] || chr(2)), '') AS s,
         wc
  FROM wwords
),"""
    + ",".join(_wp_round_sql(i) for i in range(1, _WP_MERGES + 1))
    + ",\n"
    + "\nwvocab AS MATERIALIZED (\n  "
    + "\n  UNION\n  ".join(
        f"SELECT l || r AS piece FROM wb{i}" for i in range(1, _WP_MERGES + 1)
    )
    + r"""
),
wdocw AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
    FROM documents
  ) WHERE length(w) BETWEEN 1 AND 16
),
wdist AS MATERIALIZED (SELECT DISTINCT w FROM wdocw),
-- longest vocab piece that FITS at each (word, position)
wbest AS MATERIALIZED (
  SELECT p.w, p.pos, max(length(v.piece)) AS bestl
  FROM (SELECT w, unnest(generate_series(1, length(w))) AS pos FROM wdist) p
  JOIN wvocab v
    ON p.pos + length(v.piece) - 1 <= length(p.w)
   AND substr(p.w, p.pos, length(v.piece)) = v.piece
  GROUP BY 1, 2
),
-- deterministic greedy walk: one successor per non-terminal row
wwalk AS (
  SELECT w, 1 AS pos, 0 AS np FROM wdist
  UNION ALL
  SELECT k.w, k.pos + coalesce(b.bestl, 1), k.np + 1
  FROM wwalk k LEFT JOIN wbest b ON b.w = k.w AND b.pos = k.pos
  WHERE k.pos <= length(k.w)
),
wnp AS (SELECT w, np FROM wwalk WHERE pos > length(w))
SELECT dw.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(wnp.np) AS BIGINT) AS n_pieces
FROM wdocw dw JOIN wnp USING (w)
GROUP BY 1
"""
)


# --------------------------------------------------------------------
# Cross-document repetition (MassiveText duplicate-content filter)
# --------------------------------------------------------------------

def q_cross_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_finance_pipeline_spark.operators.dedup import cross_doc_repetition

    docs = load_table(spark, _t(sf_dir, "documents"))
    # k=4: the synthetic 12-60-token docs share plenty of 4-gram
    # template shingles, so the shared-fraction distribution is
    # non-trivial at sf0.01
    return cross_doc_repetition(docs, shingle_k=4)


SQL_CROSS_DOC_REPETITION = r"""
WITH tokd AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(toks) >= 4
                THEN list_transform(generate_series(1, len(toks) - 3),
                                    i -> array_to_string(toks[i:i+3], ' '))
                ELSE CAST([] AS VARCHAR[]) END) AS shingle
  FROM tokd
),
cnt AS (SELECT shingle, count(*) AS nd FROM sh GROUP BY 1),
per_doc AS (
  SELECT sh.doc_id, count(*) AS n_shingles,
         sum(CASE WHEN cnt.nd > 1 THEN 1 ELSE 0 END) AS n_shared
  FROM sh JOIN cnt USING (shingle)
  GROUP BY 1
),
m AS (
  SELECT d.doc_id,
         CAST(coalesce(p.n_shingles, 0) AS BIGINT) AS n_shingles,
         CAST(coalesce(p.n_shared, 0) AS BIGINT) AS n_shared,
         coalesce(floor(p.n_shared * 1.0 / p.n_shingles * 1000000 + 0.5) / 1000000, 0.0) AS shared_frac
  FROM documents d LEFT JOIN per_doc p USING (doc_id)
)
SELECT *, (shared_frac > 0.5) AS mostly_duplicated FROM m
"""


# --------------------------------------------------------------------
# PageRank — crawl-graph centrality
# --------------------------------------------------------------------

def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer→supplier purchase graph (the
    stand-in for a crawl host graph): 3 damped iterations with
    per-iteration portable rounding, so the DuckDB oracle can unroll
    the identical algebra and the result hash-matches like every
    other query."""
    from etl_finance_pipeline_spark.operators.graph import pagerank

    orders = load_table(spark, _t(sf_dir, "orders"))
    li = load_table(spark, _t(sf_dir, "lineitem"))
    edges = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    return pagerank(edges, iters=3, damping=0.85).select("id", "rank")


def _pr_iter_sql(i: int) -> str:
    return f"""
c{i} AS (
  SELECT e.dst, sum(r.rank / d.deg) AS cin
  FROM e JOIN r{i - 1} r ON e.src = r.id JOIN deg d ON e.src = d.src
  GROUP BY 1
),
r{i} AS (
  SELECT v.id,
         floor(((1.0 - 0.85) / n.n + 0.85 * coalesce(c{i}.cin, 0.0)) * 1000000 + 0.5) / 1000000 AS rank
  FROM v LEFT JOIN c{i} ON v.id = c{i}.dst, n
)"""


SQL_PAGERANK = f"""
WITH e AS (
  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
n AS (SELECT count(*) AS n FROM v),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
r0 AS (SELECT id, floor(1.0 / n.n * 1000000 + 0.5) / 1000000 AS rank FROM v, n),
{_pr_iter_sql(1)},
{_pr_iter_sql(2)},
{_pr_iter_sql(3)}
SELECT id, rank FROM r3
"""


# --------------------------------------------------------------------
# Gopher repetition filters
# --------------------------------------------------------------------

def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, _t(sf_dir, "documents"))
    return repetition_stats(docs)


SQL_REPETITION_STATS = r"""
WITH tokd AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents
),
uni AS (SELECT doc_id, unnest(toks) AS gram FROM tokd),
big AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
                ELSE list_transform(range(1, len(toks)),
                                    i -> toks[i] || ' ' || toks[i + 1]) END) AS gram
  FROM tokd
),
uc AS (SELECT doc_id, gram, count(*) AS c FROM uni GROUP BY 1, 2),
bc AS (SELECT doc_id, gram, count(*) AS c FROM big GROUP BY 1, 2),
ua AS (
  SELECT doc_id, sum(c) AS n_words, max(c) AS topw,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dupw
  FROM uc GROUP BY 1
),
ba AS (
  SELECT doc_id, sum(c) AS n_bigrams, max(c) AS topb,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dupb
  FROM bc GROUP BY 1
),
m AS (
  SELECT ua.doc_id,
         CAST(ua.n_words AS BIGINT) AS n_tokens,
         CAST(coalesce(ba.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         floor(ua.topw * 1.0 / ua.n_words * 1000000 + 0.5) / 1000000 AS top_word_frac,
         floor(ua.dupw * 1.0 / ua.n_words * 1000000 + 0.5) / 1000000 AS dup_word_frac,
         coalesce(floor(ba.topb * 1.0 / ba.n_bigrams * 1000000 + 0.5) / 1000000, 0.0) AS top_bigram_frac,
         coalesce(floor(ba.dupb * 1.0 / ba.n_bigrams * 1000000 + 0.5) / 1000000, 0.0) AS dup_bigram_frac
  FROM ua LEFT JOIN ba USING (doc_id)
)
SELECT *, (top_word_frac > 0.3 OR dup_bigram_frac > 0.2) AS repetitive
FROM m
"""


# --------------------------------------------------------------------
# Corpus unigram log-probability (CCNet-style quality signal)
# --------------------------------------------------------------------

def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, _t(sf_dir, "documents"))
    return unigram_logprob(docs)


SQL_UNIGRAM_LOGPROB = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
  FROM documents
),
freq AS (SELECT tok, count(*) AS tf FROM toks GROUP BY 1),
total AS (SELECT sum(tf) AS n FROM freq)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       floor(avg(ln(f.tf * 1.0 / total.n)) * 1000000 + 0.5) / 1000000 AS avg_logprob
FROM toks t JOIN freq f USING (tok), total
GROUP BY t.doc_id
"""


# --------------------------------------------------------------------
# DoReMi-style mixture reweighting (iterative domain weights)
# --------------------------------------------------------------------

_DM_ROUNDS = 5
_DM_C = 0.1  # uniform-smoothing mass per round (DoReMi's c)


def _doremi_src_loss(docs: DataFrame) -> DataFrame:
    """Per-source (n_docs, loss) under the unigram-surprisal proxy,
    computed in ORDER-INDEPENDENT fixed-point arithmetic: every
    per-doc avg_logprob is already 6-dp-rounded, so
    ``floor(lp·1e6 + 0.5)`` recovers its exact integer and the
    per-source SUM is exact int64 — there is no FP summation order to
    differ between Spark partitions and the DuckDB oracle (a plain
    ``avg()`` near a 0.5e-6 rounding boundary could flip the 6-dp
    loss and diverge every EG round downstream). The mean is then one
    IEEE division of two exact integers — bit-identical anywhere."""
    lp = unigram_logprob(docs).select("doc_id", "avg_logprob")
    return (
        lp.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(
                F.floor(
                    F.col("avg_logprob") * 1_000_000 + F.lit(0.5)
                ).cast("long")
            ).alias("_s6"),
        )
        .select(
            "source",
            "n_docs",
            (
                F.floor(-F.col("_s6") / F.col("n_docs") + F.lit(0.5))
                / 1_000_000
            ).alias("loss"),
        )
    )


def _doremi_eg(src: DataFrame) -> DataFrame:
    """EG rounds over a per-source (source, n_docs, loss) frame →
    (source, n_docs, loss, excess_loss, weight). The frame collapses
    to ONE sorted array row, so each round is a pure array expression
    — the sum Z is a deterministic LEFT FOLD in source order (never a
    parallel aggregate whose FP order could differ between engines),
    and every intermediate is rounded to 6 dp per round (the
    pagerank/GD unrolled-oracle device), so the DuckDB twin replays
    the identical arithmetic. k sources is control-plane sized by
    definition; the corpus-scale work is the loss aggregate
    upstream."""
    mn = src.agg(F.min("loss").alias("_ml"))
    ex = src.crossJoin(F.broadcast(mn)).select(
        "source",
        "n_docs",
        "loss",
        _pr(F.col("loss") - F.col("_ml"), 6).alias("ex"),
    )
    arr = ex.agg(
        F.sort_array(
            F.collect_list(F.struct("source", "n_docs", "loss", "ex"))
        ).alias("_xs")
    )
    xs = F.col("_xs")
    k = F.size(xs)
    # each round lands in its own projection: a nested single-expression
    # unroll re-resolves the whole subtree per round (u appears in both
    # Z and the update lambda), which blows past the analyzer's
    # fixed-point iteration cap — named columns keep every step's tree
    # one round deep, exactly like the oracle's MATERIALIZED frames
    arr = arr.select(
        xs, F.transform(xs, lambda x: _pr(F.lit(1.0) / k, 6)).alias("_a")
    )
    for _ in range(_DM_ROUNDS):
        u = F.zip_with(
            F.col("_a"), xs, lambda w, x: _pr(w * _pr(F.exp(x["ex"]), 6), 6)
        )
        arr = arr.select(xs, u.alias("_u"))
        z = F.aggregate(F.col("_u"), F.lit(0.0), lambda p, q: p + q)
        a = F.transform(
            F.col("_u"),
            lambda v: _pr(
                F.lit(1.0 - _DM_C) * v / z + F.lit(_DM_C) / k, 6
            ),
        )
        arr = arr.select(xs, a.alias("_a"))
    zipped = F.zip_with(
        xs,
        F.col("_a"),
        lambda x, w: F.struct(
            x["source"].alias("source"),
            x["n_docs"].alias("n_docs"),
            x["loss"].alias("loss"),
            x["ex"].alias("excess_loss"),
            w.alias("weight"),
        ),
    )
    return (
        arr.select(F.explode(zipped).alias("_z"))
        .select(
            F.col("_z.source").alias("source"),
            F.col("_z.n_docs").alias("n_docs"),
            F.col("_z.loss").alias("loss"),
            F.col("_z.excess_loss").alias("excess_loss"),
            F.col("_z.weight").alias("weight"),
        )
    )


def q_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style iterative domain reweighting (Xie et al. 2023):
    per-source excess loss (the unigram-LM surprisal proxy — −mean
    per-doc avg logprob, relative to the easiest source) drives
    exponentiated-gradient updates with uniform smoothing,

        uᵢ = αᵢ·exp(η·excessᵢ);  α′ᵢ = (1−c)·uᵢ/Z + c/k   (η=1)

    for a fixed number of lockstep rounds (see :func:`_doremi_eg`;
    the per-source loss is the order-independent fixed-point mean of
    :func:`_doremi_src_loss`)."""
    docs = _docs_spread(spark, sf_dir)
    return _doremi_eg(_doremi_src_loss(docs))


def _doremi_gate(docs: DataFrame, weights: dict[str, float]) -> DataFrame:
    """Deploy learned per-source weights as a deterministic hash-gate
    sampler: keep iff hash(doc_id) mod 1e6 < floor(weight·1e6 + 0.5)
    (stratified_sample's device). The k weights are control-plane
    sized; the corpus pass is one narrow hash filter. floor(w·1e6 +
    0.5) in BOTH engines — a bare integer cast would truncate in
    Spark and round in DuckDB on the weight-boundary doubles."""
    import math

    from etl_finance_pipeline_spark.functions.scalar import portable_hash64

    bucket = F.pmod(
        portable_hash64(F.col("doc_id").cast("string")), 1_000_000
    )
    thr = None
    for src_name in sorted(weights):
        t = int(math.floor(weights[src_name] * 1_000_000 + 0.5))
        cond = F.when(F.col("source") == src_name, F.lit(t))
        thr = cond.otherwise(F.lit(0)) if thr is None else cond.otherwise(thr)
    return docs.filter(bucket < thr)


def q_doremi_mix_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned mixture DEPLOYED: doremi_weights' final per-source
    weights become deterministic hash-gate keep fractions over the
    corpus (:func:`_doremi_gate`), so the training mix the EG rounds
    converged to is what the sampler actually emits."""
    weights = {
        r["source"]: float(r["weight"])
        for r in q_doremi_weights(spark, sf_dir).collect()
    }
    docs = _docs_spread(spark, sf_dir)
    return _doremi_gate(docs, weights).select("doc_id", "source")


def _dm_round_sql(t: int, p: str = "dm") -> str:
    return f"""
{p}u{t} AS (
  SELECT list_transform(generate_series(1, k),
           i -> floor(a[i] * (floor(exp(xs[i].ex) * 1000000 + 0.5) / 1000000)
                      * 1000000 + 0.5) / 1000000) AS u
  FROM {p}a{t - 1}, {p}arr, {p}k
),
{p}a{t} AS (
  SELECT list_transform(generate_series(1, k),
           i -> floor(({1.0 - _DM_C} * u[i]
                        / CAST(list_reduce(u, (ac, el) -> ac + el) AS DOUBLE)
                       + {_DM_C} / k) * 1000000 + 0.5) / 1000000) AS a
  FROM {p}u{t}, {p}k
)"""


def _dm_loss_ctes(p: str = "dm", src: str = "documents") -> str:
    """CTE chain ``{p}tok → … → {p}src(source, n_docs, loss)``: the
    per-source fixed-point surprisal loss over table/CTE *src* — the
    exact-integer-sum twin of :func:`_doremi_src_loss`."""
    return f"""{p}tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
  FROM {src}
),
{p}frq AS (SELECT tok, count(*) AS tf FROM {p}tok GROUP BY 1),
{p}tot AS (SELECT sum(tf) AS n FROM {p}frq),
{p}lp AS (
  SELECT t.doc_id,
         floor(avg(ln(f.tf * 1.0 / {p}tot.n)) * 1000000 + 0.5) / 1000000 AS lp
  FROM {p}tok t JOIN {p}frq f USING (tok), {p}tot
  GROUP BY t.doc_id
),
{p}src AS (
  SELECT d.source,
         CAST(count(*) AS BIGINT) AS n_docs,
         floor(-sum(CAST(floor(lp * 1000000 + 0.5) AS BIGINT))
               / CAST(count(*) AS DOUBLE) + 0.5) / 1000000 AS loss
  FROM {p}lp JOIN {src} d USING (doc_id) GROUP BY 1
)"""


def _dm_eg_ctes(p: str, src_cte: str) -> str:
    """EG chain from CTE *src_cte* (source, n_docs, loss) through the
    final weight array ``{p}a{_DM_ROUNDS}``."""
    return f"""{p}min AS (SELECT min(loss) AS ml FROM {src_cte}),
{p}ex AS (
  SELECT source, n_docs, loss,
         floor((loss - ml) * 1000000 + 0.5) / 1000000 AS ex
  FROM {src_cte}, {p}min
),
{p}arr AS MATERIALIZED (
  SELECT list(struct_pack(source := source, n_docs := n_docs,
                          loss := loss, ex := ex) ORDER BY source) AS xs
  FROM {p}ex
),
{p}k AS (SELECT len(xs) AS k FROM {p}arr),
{p}a0 AS (
  SELECT list_transform(xs, x -> floor(1.0 / k * 1000000 + 0.5) / 1000000) AS a
  FROM {p}arr, {p}k
),""" + ",".join(_dm_round_sql(t, p) for t in range(1, _DM_ROUNDS + 1))


def _dm_final_select(p: str = "dm") -> str:
    return f"""SELECT xs[i].source AS source,
       CAST(xs[i].n_docs AS BIGINT) AS n_docs,
       xs[i].loss AS loss,
       xs[i].ex AS excess_loss,
       a[i] AS weight
FROM {p}a{_DM_ROUNDS}, {p}arr, {p}k,
     (SELECT unnest(generate_series(1, (SELECT k FROM {p}k))) AS i)"""


SQL_DOREMI_WEIGHTS = f"""
WITH {_dm_loss_ctes()},
{_dm_eg_ctes("dm", "dmsrc")}
{_dm_final_select()}
"""


SQL_DOREMI_MIX_APPLY = f"""
WITH dmw AS ({SQL_DOREMI_WEIGHTS.strip()})
SELECT d.doc_id, d.source
FROM documents d JOIN dmw w ON w.source = d.source
WHERE {_H64.format(s="CAST(d.doc_id AS VARCHAR)")} % 1000000
      < CAST(floor(w.weight * 1000000 + 0.5) AS BIGINT)
"""



# --------------------------------------------------------------------
# SemDedup — semantic dedup via cluster-bounded pairwise cosine
# --------------------------------------------------------------------

def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 embedding quantization under the gate: per-vector scale,
    the quantized codes' checksum, and the max reconstruction error
    (bounded by scale/2) — floor(x+0.5) arithmetic is bit-portable."""
    from etl_finance_pipeline_spark.operators.similarity import (
        quantize_embeddings,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    out = quantize_embeddings(emb)
    return out.select(
        "vec_id",
        _pr("scale", 6).alias("scale"),
        F.aggregate(
            "qvec", F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
        ).alias("q_sum"),
        F.aggregate(
            "qvec",
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.abs(x).cast("long"),
        ).alias("q_l1"),
        _pr("max_abs_err", 6).alias("max_abs_err"),
    )


SQL_EMBED_QUANTIZE = """
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
),
s AS (
  SELECT vec_id, vec,
         list_max(list_transform(vec, x -> abs(x))) / 127.0 AS scale
  FROM v
),
q AS (
  SELECT vec_id, vec, scale,
         CASE WHEN scale = 0
              THEN list_transform(vec, x -> CAST(0 AS BIGINT))
              ELSE list_transform(vec, x -> CAST(floor(x / scale + 0.5)
                                                 AS BIGINT)) END AS qvec
  FROM s
)
SELECT vec_id,
       floor(scale * 1000000 + 0.5) / 1000000 AS scale,
       CAST(list_sum(qvec) AS BIGINT) AS q_sum,
       CAST(list_sum(list_transform(qvec, x -> abs(x))) AS BIGINT) AS q_l1,
       floor(list_max(list_transform(generate_series(1, len(vec)),
               i -> abs(vec[i] - qvec[i] * scale)))
             * 1000000 + 0.5) / 1000000 AS max_abs_err
FROM q
"""


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_finance_pipeline_spark.operators.similarity import semdedup

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    # 0.2: the synthetic embeddings have no true semantic dups (max
    # pairwise cosine ~0.51); production runs at >= 0.95.
    return semdedup(emb, k=8, threshold=0.2)


SQL_SEMDEDUP = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT 8
),
sim AS (
  SELECT e.vec_id, e.embedding, c.cid,
         floor(({_COS_SQL.format(a='e.embedding', b='c.cvec')}) * 1000000 + 0.5) / 1000000 AS cos
  FROM embeddings e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, embedding, cid AS cluster_id
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS r FROM sim)
  WHERE r = 1
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b USING (cluster_id)
  WHERE a.vec_id < b.vec_id
    AND floor(({_COS_SQL.format(a='a.embedding', b='b.embedding')}) * 1000000 + 0.5) / 1000000 >= 0.2
)
SELECT a.vec_id, a.cluster_id, (d.vec_id IS NULL) AS keep
FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
"""


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup, span discovery (Lee et al. 2021
    ExactSubstr, re-expressed as fixed-k shingle frequency + cover
    merge — no suffix array; see operators/dedup.py
    duplicate_token_spans). The oracle below is the INDEPENDENT
    brute-force formulation — it joins raw k-gram strings and merges
    intervals with gaps-and-islands SQL, sharing no hashing with the
    engine — so a green hash certifies the shingle-cover
    reconstruction end-to-end."""
    from etl_finance_pipeline_spark.operators.dedup import (
        duplicate_token_spans,
    )

    docs = _docs_spread(spark, sf_dir)
    return duplicate_token_spans(docs, "doc_id", "text", k=8, min_count=2)


SQL_SUBSTRING_DEDUP = """
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+7], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) g
  WHERE len(t) >= 8
),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2),
marked AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
ordered AS (
  SELECT doc_id, pos AS s, pos + 7 AS e,
         max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
  FROM marked
),
islands AS (
  SELECT doc_id, s, e,
         sum(CASE WHEN prev_e IS NULL OR s > prev_e + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM ordered
)
SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start,
       CAST(max(e) AS BIGINT) AS span_end,
       CAST(max(e) - min(s) + 1 AS BIGINT) AS span_tokens
FROM islands GROUP BY doc_id, isl
"""


#: DuckDB twin of suffix_dup_spans (k=8): gram-string seed join (no
#: hashing — independently exact), canonical pair order, per-diagonal
#: gaps-and-islands merge. Produces CTE ``sspans``.
_SUFFIX_SPANS_CTES = """stoks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
  FROM documents
),
sgrams AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+7], ' ') AS gram
  FROM stoks, LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) g
  WHERE len(t) >= 8
),
sdup AS (SELECT gram FROM sgrams GROUP BY gram HAVING count(*) >= 2),
sseed AS (SELECT g.doc_id, g.pos, g.gram FROM sgrams g JOIN sdup USING (gram)),
spairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pos_a, b.pos AS pos_b,
         a.pos - b.pos AS dg
  FROM sseed a JOIN sseed b ON a.gram = b.gram
  WHERE a.doc_id < b.doc_id OR (a.doc_id = b.doc_id AND a.pos < b.pos)
),
sbrk AS (
  SELECT id_a, id_b, dg, pos_a,
         CASE WHEN lag(pos_a) OVER (PARTITION BY id_a, id_b, dg ORDER BY pos_a)
                   IS NULL
                OR pos_a <> lag(pos_a) OVER (PARTITION BY id_a, id_b, dg
                                             ORDER BY pos_a) + 1
              THEN 1 ELSE 0 END AS brk
  FROM spairs
),
sisl AS (
  SELECT id_a, id_b, dg, pos_a,
         sum(brk) OVER (PARTITION BY id_a, id_b, dg ORDER BY pos_a
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM sbrk
),
sspans AS (
  SELECT id_a, id_b, CAST(min(pos_a) AS BIGINT) AS a_start,
         CAST(min(pos_a) - dg AS BIGINT) AS b_start,
         CAST(max(pos_a) - min(pos_a) + 8 AS BIGINT) AS span_tokens
  FROM sisl GROUP BY id_a, id_b, dg, isl
)"""


def q_suffix_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT pairwise maximal duplicated spans (operators/dedup.py:
    suffix_dup_spans) — Lee et al.'s ExactSubstr with true span
    semantics: hash-keyed seed join, string-verified candidates,
    per-diagonal islands merge. The oracle joins raw gram STRINGS
    (sharing no hashing with the engine) and replays the diagonal
    merge, so a green hash certifies the exact span set — boundaries,
    both offsets, and attribution — end to end."""
    from etl_finance_pipeline_spark.operators.dedup import suffix_dup_spans

    docs = _docs_spread(spark, sf_dir)
    return suffix_dup_spans(docs, "doc_id", "text", k=8)


SQL_SUFFIX_DUP_SPANS = f"""
WITH {_SUFFIX_SPANS_CTES}
SELECT id_a, id_b, a_start, b_start, span_tokens FROM sspans
"""


def q_substring_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED characterization of the shingle-cover approximation
    (duplicate_token_spans) against the exact pairwise lane
    (suffix_dup_spans), closing the cover lane's own 'not a suffix
    array' caveat with numbers instead of prose: token positions
    marked by each lane, their overlap, span counts, and the over- /
    miss-mark rates in ppm. By construction the cover lane should
    miss NOTHING at token level (every exact span's positions are
    covered by duplicated k-grams; missmark_ppm > 0 would expose a
    hash-collision artifact or a merge bug) while it loses span
    ATTRIBUTION (cover unions across partners/diagonals —
    n_cover_spans < n_exact_spans quantifies the fragmentation
    loss). One row."""
    from etl_finance_pipeline_spark.operators.dedup import (
        duplicate_token_spans,
        suffix_dup_spans,
    )

    docs = _docs_spread(spark, sf_dir)
    # materialize both span frames once: cover feeds the position
    # explode AND its span count (2 consumers), exact feeds both
    # position explodes AND its span count (3 consumers) — without
    # the cut the seed-and-chain lane re-executes per consumer. The
    # two lanes are independent: overlap them (guide §2.6).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fc = pool.submit(
            lambda: duplicate_token_spans(
                docs, "doc_id", "text", k=8, min_count=2
            ).localCheckpoint(eager=True)
        )
        fe = pool.submit(
            lambda: suffix_dup_spans(
                docs, "doc_id", "text", k=8
            ).localCheckpoint(eager=True)
        )
        cover, exact = fc.result(), fe.result()
    cpos = cover.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("span_start"), F.col("span_end"))
        ).alias("pos"),
    ).distinct()
    ea = exact.select(
        F.col("id_a").alias("doc_id"),
        F.explode(
            F.sequence(
                F.col("a_start"),
                F.col("a_start") + F.col("span_tokens") - 1,
            )
        ).alias("pos"),
    )
    eb = exact.select(
        F.col("id_b").alias("doc_id"),
        F.explode(
            F.sequence(
                F.col("b_start"),
                F.col("b_start") + F.col("span_tokens") - 1,
            )
        ).alias("pos"),
    )
    epos = ea.unionByName(eb).distinct()
    joined = cpos.withColumn("_c", F.lit(1)).join(
        epos.withColumn("_e", F.lit(1)), ["doc_id", "pos"], "full"
    )
    marks = joined.agg(
        F.sum(F.coalesce(F.col("_c"), F.lit(0)))
        .cast("long")
        .alias("n_cover_marked"),
        F.sum(F.coalesce(F.col("_e"), F.lit(0)))
        .cast("long")
        .alias("n_exact_marked"),
        F.sum(
            F.coalesce(F.col("_c"), F.lit(0))
            * F.coalesce(F.col("_e"), F.lit(0))
        )
        .cast("long")
        .alias("n_common_marked"),
    )
    out = (
        marks.crossJoin(
            cover.agg(F.count("*").cast("long").alias("n_cover_spans"))
        )
        .crossJoin(
            exact.agg(F.count("*").cast("long").alias("n_exact_spans"))
        )
    )
    return out.select(
        "n_cover_spans",
        "n_exact_spans",
        "n_cover_marked",
        "n_exact_marked",
        "n_common_marked",
        F.expr(
            "CAST(((n_cover_marked - n_common_marked) * 1000000)"
            " DIV nullif(n_cover_marked, 0) AS BIGINT)"
        ).alias("overmark_ppm"),
        F.expr(
            "CAST(((n_exact_marked - n_common_marked) * 1000000)"
            " DIV nullif(n_exact_marked, 0) AS BIGINT)"
        ).alias("missmark_ppm"),
    )


SQL_SUBSTRING_DEDUP_RECALL = f"""
WITH {_SUFFIX_SPANS_CTES},
cdup AS (SELECT gram FROM sgrams GROUP BY gram HAVING count(*) >= 2),
cmarked AS (SELECT g.doc_id, g.pos FROM sgrams g JOIN cdup USING (gram)),
cord AS (
  SELECT doc_id, pos AS s, pos + 7 AS e,
         max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
  FROM cmarked
),
cisl AS (
  SELECT doc_id, s, e,
         sum(CASE WHEN prev_e IS NULL OR s > prev_e + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM cord
),
cspans AS (
  SELECT doc_id, min(s) AS span_start, max(e) AS span_end
  FROM cisl GROUP BY doc_id, isl
),
cpos AS (
  SELECT DISTINCT doc_id, unnest(generate_series(span_start, span_end)) AS pos
  FROM cspans
),
epos AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT id_a AS doc_id,
           unnest(generate_series(a_start, a_start + span_tokens - 1)) AS pos
    FROM sspans
    UNION ALL
    SELECT id_b AS doc_id,
           unnest(generate_series(b_start, b_start + span_tokens - 1)) AS pos
    FROM sspans
  )
),
jful AS (
  SELECT coalesce(c.c, 0) AS c, coalesce(e.e, 0) AS e
  FROM (SELECT doc_id, pos, 1 AS c FROM cpos) c
  FULL JOIN (SELECT doc_id, pos, 1 AS e FROM epos) e
    USING (doc_id, pos)
),
magg AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_cover_marked,
         CAST(sum(e) AS BIGINT) AS n_exact_marked,
         CAST(sum(c * e) AS BIGINT) AS n_common_marked
  FROM jful
),
scnt AS (SELECT CAST(count(*) AS BIGINT) AS n_exact_spans FROM sspans),
ccnt AS (SELECT CAST(count(*) AS BIGINT) AS n_cover_spans FROM cspans)
SELECT ccnt.n_cover_spans, scnt.n_exact_spans,
       m.n_cover_marked, m.n_exact_marked, m.n_common_marked,
       CAST(((m.n_cover_marked - m.n_common_marked) * 1000000)
            // nullif(m.n_cover_marked, 0) AS BIGINT) AS overmark_ppm,
       CAST(((m.n_exact_marked - m.n_common_marked) * 1000000)
            // nullif(m.n_exact_marked, 0) AS BIGINT) AS missmark_ppm
FROM magg m, scnt, ccnt
"""


def q_substring_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup, corpus-cleaning stage: documents
    rewritten with every duplicated >= 8-token span removed (see
    operators/dedup.py remove_duplicate_spans)."""
    from etl_finance_pipeline_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    return remove_duplicate_spans(docs, "doc_id", "text", k=8, min_count=2)


SQL_SUBSTRING_DEDUP_CLEAN = """
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+7], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) g
  WHERE len(t) >= 8
),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2),
covered AS (
  SELECT DISTINCT g.doc_id, g.pos + d.o AS pos
  FROM grams g JOIN dup USING (gram),
       LATERAL (SELECT unnest(generate_series(0, 7)) AS o) d
),
positions AS (
  SELECT doc_id, i AS pos, t[i] AS tok, len(t) AS n_total
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) g
),
kept AS (
  SELECT p.doc_id,
         string_agg(p.tok, ' ' ORDER BY p.pos) AS clean_text,
         CAST(count(*) AS BIGINT) AS n_tokens_kept
  FROM positions p LEFT JOIN covered c
    ON p.doc_id = c.doc_id AND p.pos = c.pos
  WHERE c.pos IS NULL
  GROUP BY p.doc_id
),
totals AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_total FROM toks)
SELECT t.doc_id,
       coalesce(k.clean_text, '') AS clean_text,
       coalesce(k.n_tokens_kept, 0) AS n_tokens_kept,
       t.n_total - coalesce(k.n_tokens_kept, 0) AS n_tokens_removed
FROM totals t LEFT JOIN kept k USING (doc_id)
"""


def q_video_frames_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video container path under the oracle gate: text bytes →
    a genuine YUV4MPEG2 stream (mono luma, 8×8 frames, FRAME markers,
    written by encode_y4m) → sample_video_frames(decode="y4m") which
    re-parses the container — frame geometry comes from the y4m
    HEADER, frame boundaries from the FRAME markers, not from a
    caller-supplied stride. Sampled luma planes hash to md5 hex; the
    oracle reconstructs each frame from the text directly (64-char
    slices, last frame space-padded like the encoder), so a header or
    marker parsing bug breaks the hash match."""
    from etl_finance_pipeline_spark.operators.multimodal import (
        encode_y4m,
        sample_video_frames,
    )

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("content")
    )
    clips = encode_y4m(docs, width=8, height=8)
    out = sample_video_frames(clips, every_n=2, decode="y4m")
    return out.select(
        F.col("media_id").alias("doc_id"),
        F.col("frame_index").cast("long").alias("frame_index"),
        F.md5("frame").alias("frame_md5"),
        F.length("frame").cast("long").alias("n_bytes"),
    )


SQL_VIDEO_FRAMES_REAL = """
WITH f AS (
  SELECT doc_id, rpad(text, CAST(greatest(1, ceil(len(text) / 64.0)) * 64 AS INTEGER), ' ') AS p,
         greatest(1, CAST(ceil(len(text) / 64.0) AS BIGINT)) AS nf
  FROM documents
),
idx AS (
  SELECT doc_id, p, unnest(range(0, nf, 2)) AS i FROM f
)
SELECT doc_id,
       CAST(i AS BIGINT) AS frame_index,
       md5(substr(p, CAST(i * 64 + 1 AS BIGINT), 64)) AS frame_md5,
       CAST(64 AS BIGINT) AS n_bytes
FROM idx
"""


def q_scene_cuts_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over the REAL y4m container lane:
    adjacent luma planes parsed out of the YUV4MPEG2 stream report
    their mean absolute difference — same exact-integer kernel as the
    fake lane, but frame geometry comes from the parsed header."""
    from etl_finance_pipeline_spark.operators.multimodal import (
        encode_y4m,
        frame_delta_stats,
    )

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("content")
    )
    clips = encode_y4m(docs, width=8, height=8)
    out = frame_delta_stats(clips, cut_threshold=30.0, decode="y4m")
    return out.select(
        F.col("media_id").alias("doc_id"),
        F.col("frame_index").cast("long").alias("frame_index"),
        _pr("delta", 6).alias("delta"),
        F.col("is_cut"),
    )


SQL_SCENE_CUTS_REAL = """
WITH f AS (
  SELECT doc_id, rpad(text, CAST(greatest(1, ceil(len(text) / 64.0)) * 64 AS INTEGER), ' ') AS p,
         greatest(1, CAST(ceil(len(text) / 64.0) AS BIGINT)) AS nf
  FROM documents
),
idx AS (
  SELECT doc_id, p, unnest(range(1, nf)) AS i FROM f WHERE nf >= 2
),
d AS (
  SELECT doc_id, i,
         list_sum(list_transform(generate_series(1, 64),
           j -> abs(ord(substr(p, CAST(i * 64 + j AS BIGINT), 1))
                    - ord(substr(p, CAST((i - 1) * 64 + j AS BIGINT), 1)))
         )) / 64.0 AS delta
  FROM idx
)
SELECT doc_id, CAST(i AS BIGINT) AS frame_index,
       floor(delta * 1000000 + 0.5) / 1000000 AS delta,
       delta > 30.0 AS is_cut
FROM d
"""


def q_image_stats_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG codec path under the oracle gate: text bytes → a
    genuine baseline grayscale JFIF JPEG (each byte one constant 8×8
    luma block — losslessly quantized under the flat table, see
    operators/jpeg.py) → decode_image_stats(decode="jpeg") which runs
    the full marker walk, canonical Huffman decode, dequant, and
    vectorized IDCT. The oracle recomputes the stats from the padded
    character codes directly: a bug anywhere in the entropy coding,
    zigzag, quantization, or IDCT changes decoded pixels and breaks
    the hash match. Width/height come from the PARSED SOF header."""
    from etl_finance_pipeline_spark.functions.layout import fan_out
    from etl_finance_pipeline_spark.operators.multimodal import (
        decode_image_stats,
        encode_jpeg_blocks,
    )

    # fan_out IS warranted here (unlike the byte-stat media lanes,
    # where it was measured slower — SCALE.md round-6 A/B): the JPEG
    # encode+decode kernel is ~2 ms/doc of real CPU, so a
    # single-partition small file serializes seconds of work onto one
    # Python worker. No-op at real scale (many input splits).
    # NOT _docs_spread inside fan_out: fan_out already widens the scan,
    # and stacking a second round-robin exchange of the payload on top
    # measured +15-95% on the codec lanes (r13 regression, reverted in
    # r14 -- guide §2.3: the extra exchange is pure loss).
    docs = fan_out(
        load_table(spark, _t(sf_dir, "documents")).select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "UTF-8").alias("content"),
        )
    )
    jpg = encode_jpeg_blocks(docs, blocks_per_row=8)
    out = decode_image_stats(jpg, decode="jpeg")
    return out.select(
        F.col("media_id").alias("doc_id"),
        F.col("stats.n_bytes").alias("n_bytes"),
        _pr(F.col("stats.mean_intensity"), 6).alias("mean_intensity"),
        F.col("stats.min_byte").cast("long").alias("min_byte"),
        F.col("stats.max_byte").cast("long").alias("max_byte"),
        F.col("stats.width").cast("long").alias("width"),
        F.col("stats.height").cast("long").alias("height"),
    )


SQL_IMAGE_STATS_JPEG = """
WITH f AS (
  SELECT doc_id,
         rpad(text, CAST(greatest(1, ceil(len(text) / 8.0)) * 8 AS INTEGER), ' ') AS p,
         greatest(1, CAST(ceil(len(text) / 8.0) AS BIGINT)) AS nr
  FROM documents
),
codes AS (
  SELECT doc_id, nr,
         list_transform(generate_series(1, len(p)), i -> ord(substr(p, i, 1))) AS c
  FROM f
)
SELECT doc_id,
       CAST(nr * 8 * 64 AS BIGINT) AS n_bytes,
       floor((CAST(list_sum(c) AS DOUBLE) / len(c)) * 1000000 + 0.5) / 1000000
         AS mean_intensity,
       CAST(list_min(c) AS BIGINT) AS min_byte,
       CAST(list_max(c) AS BIGINT) AS max_byte,
       CAST(64 AS BIGINT) AS width,
       CAST(nr * 8 AS BIGINT) AS height
FROM codes
"""


def q_image_stats_jpeg_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A MIXED baseline/progressive JPEG corpus through the real
    decoder — the realistic crawl shape (most web images ship SOF2):
    ids hashing odd (md5 low bit of the id string) encode as
    multi-scan progressive (successive approximation, DC+AC
    refinement, EOB runs), the rest as baseline; the decoder
    dispatches per stream off the SOF marker. Decoded pixels
    are identical either way, so the SAME byte-level oracle certifies
    both entropy coders — a bug anywhere in the progressive scan
    algebra (point transforms, correction bits, EOB-run skips)
    changes pixels and breaks the hash."""
    from etl_finance_pipeline_spark.functions.layout import fan_out
    from etl_finance_pipeline_spark.operators.multimodal import (
        decode_image_stats,
        encode_jpeg_blocks,
    )

    # NOT _docs_spread inside fan_out: fan_out already widens the scan,
    # and stacking a second round-robin exchange of the payload on top
    # measured +15-95% on the codec lanes (r13 regression, reverted in
    # r14 -- guide §2.3: the extra exchange is pure loss).
    docs = fan_out(
        load_table(spark, _t(sf_dir, "documents")).select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "UTF-8").alias("content"),
        )
    )
    jpg = encode_jpeg_blocks(docs, blocks_per_row=8, mode="mixed")
    out = decode_image_stats(jpg, decode="jpeg")
    return out.select(
        F.col("media_id").alias("doc_id"),
        F.col("stats.n_bytes").alias("n_bytes"),
        _pr(F.col("stats.mean_intensity"), 6).alias("mean_intensity"),
        F.col("stats.min_byte").cast("long").alias("min_byte"),
        F.col("stats.max_byte").cast("long").alias("max_byte"),
        F.col("stats.width").cast("long").alias("width"),
        F.col("stats.height").cast("long").alias("height"),
    )


def q_media_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-variant quarantine accounting for the media lane — what a
    100 TB run reports instead of dying on the first corrupt image:
    a corpus that is one-third baseline JPEG, one-third progressive
    JPEG, one-third NOT A JPEG AT ALL (raw text bytes) flows through
    the row-level decode audit; the output is the per-(status,
    variant, error) census with the decoded geometry bound for the
    healthy rows. The corrupt third exercises the quarantine path
    end-to-end (deterministic loud-failure error strings sit under
    the hash); nothing throws."""
    from etl_finance_pipeline_spark.functions.layout import fan_out
    from etl_finance_pipeline_spark.operators.multimodal import (
        encode_jpeg_blocks,
        image_decode_audit,
    )

    # NOT _docs_spread inside fan_out: fan_out already widens the scan,
    # and stacking a second round-robin exchange of the payload on top
    # measured +15-95% on the codec lanes (r13 regression, reverted in
    # r14 -- guide §2.3: the extra exchange is pure loss).
    docs = fan_out(
        load_table(spark, _t(sf_dir, "documents")).select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "UTF-8").alias("content"),
        )
    )
    b0 = encode_jpeg_blocks(
        docs.filter(F.col("media_id") % 3 == 0), blocks_per_row=8
    )
    b1 = encode_jpeg_blocks(
        docs.filter(F.col("media_id") % 3 == 1),
        blocks_per_row=8,
        mode="progressive",
    )
    b2 = docs.filter(F.col("media_id") % 3 == 2)  # raw text: not a JPEG
    audit = image_decode_audit(b0.unionByName(b1).unionByName(b2))
    return audit.groupBy("status", "variant", "error").agg(
        F.count("*").cast("long").alias("n"),
        F.max("height").alias("max_height"),
    )


SQL_MEDIA_DECODE_AUDIT = """
WITH rows_ AS (
  SELECT doc_id,
         CASE WHEN len(text) = 0 THEN 'empty'
              WHEN doc_id % 3 = 2 THEN 'quarantined'
              ELSE 'ok' END AS status,
         CASE WHEN len(text) = 0 THEN NULL
              WHEN doc_id % 3 = 0 THEN 'baseline'
              WHEN doc_id % 3 = 1 THEN 'progressive'
              ELSE NULL END AS variant,
         CASE WHEN len(text) > 0 AND doc_id % 3 = 2
              THEN 'ValueError: not a JPEG stream (missing SOI)'
              ELSE NULL END AS error,
         CASE WHEN len(text) > 0 AND doc_id % 3 < 2
              THEN CAST(greatest(1, ceil(len(text) / 8.0)) * 8 AS BIGINT)
              ELSE NULL END AS height
  FROM documents
)
SELECT status, variant, error,
       CAST(count(*) AS BIGINT) AS n,
       max(height) AS max_height
FROM rows_
GROUP BY status, variant, error
"""


def q_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level decontamination (operators/dedup.py
    decontaminate_spans): eval docs (doc_id % 10 = 0 stand in for a
    held-out benchmark) reduce to distinct 8-gram hashes broadcast
    onto one corpus pass; output = the maximal corpus spans quoting
    eval content — drop the span, keep the document, unlike the
    doc-level overlap flag. Oracle is the independent raw-gram-string
    brute force, no shared hashing."""
    from etl_finance_pipeline_spark.operators.dedup import (
        decontaminate_spans,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    out = decontaminate_spans(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        k=8,
    )
    return out


SQL_DECONTAMINATE_SPANS = """
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+7], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) g
  WHERE len(t) >= 8
),
ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0),
marked AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN ev USING (gram)
  WHERE g.doc_id % 10 != 0
),
ordered AS (
  SELECT doc_id, pos AS s, pos + 7 AS e,
         max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
  FROM marked
),
islands AS (
  SELECT doc_id, s, e,
         sum(CASE WHEN prev_e IS NULL OR s > prev_e + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM ordered
)
SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start,
       CAST(max(e) AS BIGINT) AS span_end,
       CAST(max(e) - min(s) + 1 AS BIGINT) AS span_tokens
FROM islands GROUP BY doc_id, isl
"""


def q_image_stats_jpeg_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COLOR JPEG path under the oracle gate: text bytes → a
    baseline 4:4:4 YCbCr JFIF JPEG (byte v → constant tile Y=v,
    Cb=255−v, Cr=(7v) mod 256) → decode_image_stats(decode="jpeg"),
    which runs the interleaved 3-component MCU decode, per-component
    dequant/IDCT, and the JFIF BT.601 RGB conversion with
    floor(x+0.5) rounding. The oracle recomputes every RGB value from
    the character codes with the same double arithmetic — a bug in
    the MCU interleave, per-component DC prediction, or the color
    convert changes decoded bytes and breaks the hash."""
    from etl_finance_pipeline_spark.functions.layout import fan_out
    from etl_finance_pipeline_spark.operators.multimodal import (
        decode_image_stats,
        encode_jpeg_color_blocks,
    )

    # NOT _docs_spread inside fan_out: fan_out already widens the scan,
    # and stacking a second round-robin exchange of the payload on top
    # measured +15-95% on the codec lanes (r13 regression, reverted in
    # r14 -- guide §2.3: the extra exchange is pure loss).
    docs = fan_out(
        load_table(spark, _t(sf_dir, "documents")).select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "UTF-8").alias("content"),
        )
    )
    jpg = encode_jpeg_color_blocks(docs, blocks_per_row=8)
    out = decode_image_stats(jpg, decode="jpeg")
    return out.select(
        F.col("media_id").alias("doc_id"),
        F.col("stats.n_bytes").alias("n_bytes"),
        _pr(F.col("stats.mean_intensity"), 6).alias("mean_intensity"),
        F.col("stats.min_byte").cast("long").alias("min_byte"),
        F.col("stats.max_byte").cast("long").alias("max_byte"),
        F.col("stats.width").cast("long").alias("width"),
        F.col("stats.height").cast("long").alias("height"),
    )


SQL_IMAGE_STATS_JPEG_COLOR = """
WITH f AS (
  SELECT doc_id,
         rpad(text, CAST(greatest(1, ceil(len(text) / 8.0)) * 8 AS INTEGER), ' ') AS p,
         greatest(1, CAST(ceil(len(text) / 8.0) AS BIGINT)) AS nr
  FROM documents
),
rgb AS (
  SELECT doc_id, nr,
         list_transform(generate_series(1, len(p)), i -> ord(substr(p, i, 1))) AS v
  FROM f
),
chan AS (
  SELECT doc_id, nr,
         list_transform(v, x -> least(greatest(floor(
           x + 1.402 * ((x * 7) % 256 - 128) + 0.5), 0), 255)) AS r,
         list_transform(v, x -> least(greatest(floor(
           x - 0.344136 * ((255 - x) - 128) - 0.714136 * ((x * 7) % 256 - 128) + 0.5), 0), 255)) AS g,
         list_transform(v, x -> least(greatest(floor(
           x + 1.772 * ((255 - x) - 128) + 0.5), 0), 255)) AS b
  FROM rgb
)
SELECT doc_id,
       CAST(nr * 8 * 64 * 3 AS BIGINT) AS n_bytes,
       floor(((list_sum(r) + list_sum(g) + list_sum(b)) / (3.0 * len(r)))
             * 1000000 + 0.5) / 1000000 AS mean_intensity,
       CAST(least(list_min(r), list_min(g), list_min(b)) AS BIGINT) AS min_byte,
       CAST(greatest(list_max(r), list_max(g), list_max(b)) AS BIGINT) AS max_byte,
       CAST(64 AS BIGINT) AS width,
       CAST(nr * 8 AS BIGINT) AS height
FROM chan
"""


def q_video_frames_avi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED video path under the oracle gate: text bytes →
    Motion-JPEG AVI (64-byte slices rendered as constant-tile
    grayscale JPEGs inside a spec-compliant RIFF container) →
    sample_video_frames(decode="avi"), which walks the RIFF chunks,
    pulls each 00dc frame, and DECODES it with the in-module baseline
    JPEG codec — the emitted frames are decoded 64×64 rasters. The
    oracle rebuilds each raster from the text directly (8×8 byte
    grid, each byte an 8×8 tile) and compares md5 — container walk,
    entropy decode, and IDCT all sit under the hash."""
    from etl_finance_pipeline_spark.functions.layout import fan_out
    from etl_finance_pipeline_spark.operators.multimodal import (
        encode_avi_mjpeg,
        sample_video_frames,
    )

    # NOT _docs_spread inside fan_out: fan_out already widens the scan,
    # and stacking a second round-robin exchange of the payload on top
    # measured +15-95% on the codec lanes (r13 regression, reverted in
    # r14 -- guide §2.3: the extra exchange is pure loss).
    docs = fan_out(
        load_table(spark, _t(sf_dir, "documents")).select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "UTF-8").alias("content"),
        )
    )
    avi = encode_avi_mjpeg(docs)
    out = sample_video_frames(avi, every_n=2, decode="avi")
    return out.select(
        F.col("media_id").alias("doc_id"),
        F.col("frame_index").cast("long").alias("frame_index"),
        F.md5("frame").alias("frame_md5"),
        F.length("frame").cast("long").alias("n_bytes"),
    )


SQL_VIDEO_FRAMES_AVI = """
WITH f AS (
  SELECT doc_id, rpad(text, CAST(greatest(1, ceil(len(text) / 64.0)) * 64 AS INTEGER), ' ') AS p,
         greatest(1, CAST(ceil(len(text) / 64.0) AS BIGINT)) AS nf
  FROM documents
),
idx AS (
  SELECT doc_id, substr(p, CAST(i * 64 + 1 AS BIGINT), 64) AS s, i
  FROM f, LATERAL (SELECT unnest(range(0, nf, 2)) AS i) g
),
expanded AS (
  SELECT doc_id, i,
         array_to_string(list_transform(generate_series(0, 7), r ->
           repeat(
             array_to_string(list_transform(generate_series(1, 8), c ->
               repeat(substr(s, CAST(r * 8 + c AS BIGINT), 1), 8)), ''),
             8)
         ), '') AS raster
  FROM idx
)
SELECT doc_id,
       CAST(i AS BIGINT) AS frame_index,
       md5(raster) AS frame_md5,
       CAST(4096 AS BIGINT) AS n_bytes
FROM expanded
"""


def q_scene_cuts_avi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over the COMPRESSED video lane:
    adjacent Motion-JPEG frames are fully decoded (RIFF walk + JPEG
    entropy decode + IDCT) and diffed as rasters. Because each source
    byte expands to one constant 8×8 tile, the decoded-raster mean
    absolute difference equals the byte-level one — which is exactly
    what lets the independent byte-formulated oracle certify the
    whole decode path."""
    from etl_finance_pipeline_spark.functions.layout import fan_out
    from etl_finance_pipeline_spark.operators.multimodal import (
        encode_avi_mjpeg,
        frame_delta_stats,
    )

    # NOT _docs_spread inside fan_out: fan_out already widens the scan,
    # and stacking a second round-robin exchange of the payload on top
    # measured +15-95% on the codec lanes (r13 regression, reverted in
    # r14 -- guide §2.3: the extra exchange is pure loss).
    docs = fan_out(
        load_table(spark, _t(sf_dir, "documents")).select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "UTF-8").alias("content"),
        )
    )
    avi = encode_avi_mjpeg(docs)
    out = frame_delta_stats(avi, cut_threshold=30.0, decode="avi")
    return out.select(
        F.col("media_id").alias("doc_id"),
        F.col("frame_index").cast("long").alias("frame_index"),
        _pr("delta", 6).alias("delta"),
        F.col("is_cut"),
    )


def _pq_sql(m: int, ksub: int, iters: int, subdim: int, src: str = "embeddings") -> str:
    """Unrolled per-subspace Lloyd chain mirroring
    operators.similarity.pq_train(round_digits=6): shared hash-picked
    seed ids, per-(vec, subspace) squared-L2 argmin with lower-code
    tie-break, per-(subspace, code, dim) means rounded to 6 decimals
    each iteration, empty codes carrying their previous codeword.
    *src* is any CTE/table with (vec_id, embedding) — the IVF-PQ
    composition points it at the residual frame. Produces CTE
    ``pc{iters}`` = (s, code, cvec DOUBLE[])."""
    sub_slices = ", ".join(str(x) for x in range(m))
    parts = [
        f"""psub AS (
  SELECT vec_id, s,
         CAST(embedding[s * {subdim} + 1 : s * {subdim} + {subdim}] AS DOUBLE[]) AS sv
  FROM {src}, UNNEST([{sub_slices}]) AS t(s)
),
pseed AS (
  SELECT vec_id, row_number() OVER (ORDER BY {_H64.format(s='CAST(vec_id AS VARCHAR)')}, vec_id) - 1 AS code
  FROM {src}
  ORDER BY {_H64.format(s='CAST(vec_id AS VARCHAR)')}, vec_id
  LIMIT {ksub}
),
pc0 AS (
  SELECT p.s, sd.code, p.sv AS cvec
  FROM pseed sd JOIN psub p USING (vec_id)
)"""
    ]
    for i in range(iters):
        parts.append(
            f"""pa{i} AS (
  SELECT vec_id, s, sv, code FROM (
    SELECT p.vec_id, p.s, p.sv, c.code,
           row_number() OVER (
             PARTITION BY p.vec_id, p.s
             ORDER BY {_L2_SQL.format(a='p.sv', b='c.cvec')} ASC, c.code
           ) AS pr
    FROM psub p JOIN pc{i} c USING (s)
  ) WHERE pr = 1
),
pm{i} AS (
  SELECT s, code, pos, floor(avg(CAST(v AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS mv
  FROM (
    SELECT s, code, pos, sv[pos] AS v
    FROM pa{i}, UNNEST(range(1, {subdim} + 1)) AS t(pos)
  ) GROUP BY s, code, pos
),
pc{i + 1} AS (
  SELECT s, code, list(mv ORDER BY pos) AS cvec FROM pm{i} GROUP BY s, code
  UNION ALL
  SELECT c.s, c.code, c.cvec FROM pc{i} c
  WHERE NOT EXISTS (SELECT 1 FROM pm{i} x WHERE x.s = c.s AND x.code = c.code)
)"""
        )
    return ",\n".join(parts)


_PQ_M, _PQ_KSUB, _PQ_ITERS, _PQ_SUBDIM = 4, 8, 3, 16


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization END-TO-END in-engine: per-subspace Lloyd
    codebooks (m=4 × ksub=8 over dim-64 vectors, 3 iterations,
    6-decimal per-iteration rounding), corpus encoded to 4 codes per
    vector, queries answered by asymmetric-distance table lookups —
    the memory shape of billion-vector ANN. The oracle unrolls the
    identical subspace k-means and sums the same per-subspace
    distances in the same order, so codebook, encode, AND search are
    all under the hash."""
    from etl_finance_pipeline_spark.operators.similarity import (
        pq_topk,
        pq_train,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    cb = pq_train(emb, m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS, round_digits=6)
    # encode via the Arrow/numpy lane — the corpus-scale path (~50×
    # the interpreted HOF); codes differ from the jvm lane only on
    # sub-ulp distance ties, which need duplicate codewords — the
    # oracle hash certifies the equivalence every round
    out = pq_topk(
        emb, emb.filter(F.col("vec_id") < 5), cb, k=5, encode_engine="numpy"
    )
    return out.select(
        "query_id",
        "neighbor_id",
        "adc_dist",
        F.col("rank").cast("long").alias("rank"),
    )


SQL_PQ_TOPK = f"""
WITH {_pq_sql(_PQ_M, _PQ_KSUB, _PQ_ITERS, _PQ_SUBDIM)},
books AS (SELECT s, code, cvec FROM pc{_PQ_ITERS}),
corpus_codes AS (
  SELECT vec_id AS neighbor_id, s, code FROM (
    SELECT p.vec_id, p.s, b.code,
           row_number() OVER (
             PARTITION BY p.vec_id, p.s
             ORDER BY {{l2_pb}} ASC, b.code
           ) AS pr
    FROM psub p JOIN books b USING (s)
  ) WHERE pr = 1
),
dtab AS (
  SELECT q.vec_id AS query_id, b.s, b.code,
         {{l2_qb}} AS d
  FROM embeddings q CROSS JOIN books b
  WHERE q.vec_id < 5
),
adc AS (
  SELECT t.query_id, c.neighbor_id,
         floor((
           min(CASE WHEN c.s = 0 THEN t.d END)
           + min(CASE WHEN c.s = 1 THEN t.d END)
           + min(CASE WHEN c.s = 2 THEN t.d END)
           + min(CASE WHEN c.s = 3 THEN t.d END)
         ) * 1000000 + 0.5) / 1000000 AS adc_dist
  FROM corpus_codes c JOIN dtab t ON c.s = t.s AND c.code = t.code
  WHERE t.query_id != c.neighbor_id
  GROUP BY t.query_id, c.neighbor_id
)
SELECT query_id, neighbor_id, adc_dist,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id) AS BIGINT) AS rank
FROM adc
QUALIFY rank <= 5
""".format(
    l2_pb=_L2_SQL.format(a="p.sv", b="b.cvec"),
    l2_qb=_L2_SQL.format(
        a=f"CAST(q.embedding[b.s * {_PQ_SUBDIM} + 1 : b.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS DOUBLE[])",
        b="b.cvec",
    ),
)


# --------------------------------------------------------------------
# IVF-PQ composed ANN
# --------------------------------------------------------------------

_IVFPQ_COARSE_K, _IVFPQ_COARSE_ITERS = 8, 2
_IVFPQ_ITERS, _IVFPQ_NPROBE = 2, 2


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ END-TO-END in-engine — the standard billion-vector
    layout: Lloyd-trained coarse cells (k=8, 2 iterations), PQ
    codebooks trained on the RESIDUALS (m=4 × ksub=8, 2 iterations),
    queries probe their 2 nearest cells and rank by residual ADC.
    The oracle unrolls BOTH trainings (coarse k-means over vectors,
    subspace k-means over residuals) plus assignment, encoding, and
    the ordered ADC sum — the full composition sits under the hash."""
    from etl_finance_pipeline_spark.operators.similarity import (
        ivfpq_topk,
        train_kmeans_centroids,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    coarse = train_kmeans_centroids(
        emb, k=_IVFPQ_COARSE_K, iters=_IVFPQ_COARSE_ITERS, round_digits=6
    ).select(F.col("cluster_id").alias("cid"), "cvec")
    out = ivfpq_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        coarse,
        k=5,
        nprobe=_IVFPQ_NPROBE,
        m=_PQ_M,
        ksub=_PQ_KSUB,
        iters=_IVFPQ_ITERS,
        encode_engine="numpy",  # corpus-scale lane; oracle certifies it
    )
    return out.select(
        "query_id",
        "neighbor_id",
        "adc_dist",
        F.col("rank").cast("long").alias("rank"),
    )


_IVFPQ_ADC_TERMS = "\n           + ".join(
    f"min(CASE WHEN c.s = {s} THEN t.d END)" for s in range(_PQ_M)
)

SQL_ANN_IVFPQ_TOPK = f"""
WITH {_kmeans_sql(k=_IVFPQ_COARSE_K, iters=_IVFPQ_COARSE_ITERS)},
cent AS (SELECT cid, cvec FROM c{_IVFPQ_COARSE_ITERS}),
cassign AS (
  SELECT vec_id, embedding, cid, cvec FROM (
    SELECT e.vec_id, e.embedding, c.cid, c.cvec,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_L2_SQL.format(a='e.embedding', b='c.cvec')} ASC, c.cid
           ) AS pr
    FROM embeddings e CROSS JOIN cent c
  ) WHERE pr = 1
),
resid AS (
  SELECT vec_id, cid,
         list_transform(list_zip(embedding, cvec),
           p -> CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) AS embedding
  FROM cassign
),
{_pq_sql(_PQ_M, _PQ_KSUB, _IVFPQ_ITERS, _PQ_SUBDIM, src="resid")},
rbooks AS (SELECT s, code, cvec FROM pc{_IVFPQ_ITERS}),
rcodes AS (
  SELECT neighbor_id, cid, s, code FROM (
    SELECT r.vec_id AS neighbor_id, r.cid, b.s, b.code,
           row_number() OVER (
             PARTITION BY r.vec_id, b.s
             ORDER BY {_L2_SQL.format(a=f'CAST(r.embedding[b.s * {_PQ_SUBDIM} + 1 : b.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS DOUBLE[])', b='b.cvec')} ASC, b.code
           ) AS pr
    FROM resid r CROSS JOIN rbooks b
  ) WHERE pr = 1
),
probes AS (
  SELECT query_id, cid, qres FROM (
    SELECT e.vec_id AS query_id, c.cid,
           list_transform(list_zip(e.embedding, c.cvec),
             p -> CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) AS qres,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_L2_SQL.format(a='e.embedding', b='c.cvec')} ASC, c.cid
           ) AS pr
    FROM embeddings e CROSS JOIN cent c
    WHERE e.vec_id < 5
  ) WHERE pr <= {_IVFPQ_NPROBE}
),
dtab AS (
  SELECT p.query_id, p.cid, b.s, b.code,
         {_L2_SQL.format(a=f'p.qres[b.s * {_PQ_SUBDIM} + 1 : b.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}]', b='b.cvec')} AS d
  FROM probes p CROSS JOIN rbooks b
),
adc AS (
  SELECT t.query_id, c.neighbor_id,
         floor((
           {_IVFPQ_ADC_TERMS}
         ) * 1000000 + 0.5) / 1000000 AS adc_dist
  FROM rcodes c
  JOIN dtab t ON c.cid = t.cid AND c.s = t.s AND c.code = t.code
  WHERE t.query_id != c.neighbor_id
  GROUP BY t.query_id, c.neighbor_id
)
SELECT query_id, neighbor_id, adc_dist,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id) AS BIGINT) AS rank
FROM adc
QUALIFY rank <= 5
"""


# defined HERE because it inlines both index oracles (SQL_ANN_IVF_TOPK
# above, SQL_ANN_IVFPQ_TOPK just defined); the query function lives
# with the ANN family
SQL_ANN_RECALL = f"""
WITH abq AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
abp AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         floor(({_COS_SQL.format(a='q.qv', b='e.embedding')}) * 1000000 + 0.5) / 1000000 AS c
  FROM abq q CROSS JOIN embeddings e
  WHERE e.vec_id != q.query_id
),
abt AS (
  SELECT query_id, neighbor_id FROM abp
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) <= 5
)
{_ANN_RECALL_GROUPED.format(label="ivf_flat", pred=SQL_ANN_IVF_TOPK.strip())}
UNION ALL
{_ANN_RECALL_GROUPED.format(label="ivf_pq", pred=SQL_ANN_IVFPQ_TOPK.strip())}
"""


def q_incremental_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time substring dedup: batch docs (doc_id % 10 = 7) are
    span-checked against the standing corpus (the rest) — the
    corpus's grams are only semi-joined against the broadcast batch
    vocabulary, never shuffled. Union semantics: a batch span is
    duplicated if its grams exist anywhere in the corpus OR repeat
    within the batch."""
    from etl_finance_pipeline_spark.operators.dedup import (
        incremental_duplicate_spans,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    return incremental_duplicate_spans(
        docs.filter(F.col("doc_id") % 10 == 7),
        docs.filter(F.col("doc_id") % 10 != 7),
        k=8,
    )


SQL_INCREMENTAL_SUBSTRING_DEDUP = """
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+7], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) g
  WHERE len(t) >= 8
),
dup AS (
  SELECT gram FROM grams WHERE doc_id % 10 = 7 GROUP BY gram
  HAVING count(*) >= 2
      OR EXISTS (SELECT 1 FROM grams c WHERE c.doc_id % 10 != 7 AND c.gram = grams.gram)
),
marked AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)
  WHERE g.doc_id % 10 = 7
),
ordered AS (
  SELECT doc_id, pos AS s, pos + 7 AS e,
         max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
  FROM marked
),
islands AS (
  SELECT doc_id, s, e,
         sum(CASE WHEN prev_e IS NULL OR s > prev_e + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM ordered
)
SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start,
       CAST(max(e) AS BIGINT) AS span_end,
       CAST(max(e) - min(s) + 1 AS BIGINT) AS span_tokens
FROM islands GROUP BY doc_id, isl
"""


def q_stream_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING substring dedup: documents with doc_id % 10 == 7
    arrive as a file stream; each microbatch span-checks against the
    standing corpus table and appends spans via the exactly-once
    sink. Oracle = the BATCH incremental formulation
    (availableNow-vs-batch equivalence, same device as
    stream_near_dup) — proving the streaming stage computes the
    identical span set."""
    import tempfile
    import uuid

    from etl_finance_pipeline_spark.sources.table_format import (
        read_table,
        write_table,
    )
    from etl_finance_pipeline_spark.streaming.neardup import (
        stream_substring_dedup_against_corpus,
    )

    spark = _narrow_session(spark, 8)
    docs = _docs_spread(spark, sf_dir).select("doc_id", "text")
    root = tempfile.mkdtemp(prefix=f"stream_substr_{uuid.uuid4().hex[:8]}_")
    corpus_table = f"{root}/corpus"
    out_table = f"{root}/spans"
    write_table(docs.filter(F.col("doc_id") % 10 != 7), corpus_table)

    path = _t(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(path[:-1] + "[t]")
        .filter(F.col("doc_id") % 10 == 7)
        .select("doc_id", "text")
    )
    q = stream_substring_dedup_against_corpus(
        stream,
        corpus_table,
        out_table,
        checkpoint_dir=f"{root}/ckpt",
    )
    _await_stream(q)
    out = read_table(spark, out_table)
    return out.select("doc_id", "span_start", "span_end", "span_tokens")


SQL_STREAM_SUBSTRING_DEDUP = SQL_INCREMENTAL_SUBSTRING_DEDUP


def _linprobe_sql(dim: int, iters: int, lr: float) -> str:
    """Unrolled full-batch GD mirroring mlprep.linear_probe_train
    (round_digits=6): zero init, per-iteration gradient over all rows,
    6-decimal rounding of weights and bias each step. Produces CTEs
    ``w{iters}`` = (pos, w) and ``b{iters}`` = (b)."""
    parts = [
        f"""lpn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
w0 AS (SELECT pos, 0.0 AS w FROM UNNEST(range(1, {dim} + 1)) AS t(pos)),
b0 AS (SELECT 0.0 AS b)"""
    ]
    for i in range(iters):
        parts.append(
            f"""p{i} AS (
  SELECT e.vec_id, CAST(e.label AS DOUBLE) AS y, CAST(e.embedding AS DOUBLE[]) AS x,
         list_sum(list_transform(
           list_zip(CAST(e.embedding AS DOUBLE[]), (SELECT list(w ORDER BY pos) FROM w{i})),
           z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
           + (SELECT b FROM b{i}) AS pred
  FROM embeddings e
),
g{i} AS (
  SELECT pos, sum((pred - y) * x[pos]) AS g
  FROM p{i}, UNNEST(range(1, {dim} + 1)) AS t(pos)
  GROUP BY pos
),
gb{i} AS (SELECT sum(pred - y) AS gb FROM p{i}),
w{i + 1} AS (
  SELECT w.pos,
         floor((w.w - {lr} * 2.0 / (SELECT n FROM lpn) * g.g) * 1000000 + 0.5) / 1000000 AS w
  FROM w{i} w JOIN g{i} g USING (pos)
),
b{i + 1} AS (
  SELECT floor((b.b - {lr} * 2.0 / (SELECT n FROM lpn) * gb.gb) * 1000000 + 0.5) / 1000000 AS b
  FROM b{i} b, gb{i} gb
)"""
        )
    return ",\n".join(parts)


def q_linear_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-probe training END-TO-END in-engine: a least-squares
    head fit on the embeddings table by 5 deterministic full-batch GD
    steps (zero init, 6-decimal per-step rounding — the device that
    pins the fixed point cross-engine, as with k-means). Output = the
    trained weight vector (pos 1..dim) plus the bias at pos 0; the
    oracle unrolls the identical iterations."""
    from etl_finance_pipeline_spark.operators.mlprep import (
        linear_probe_train,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    w, b = linear_probe_train(emb, lr=0.1, iters=5, round_digits=6)
    rows = [(0, float(b))] + [(j + 1, float(w[j])) for j in range(len(w))]
    return spark.createDataFrame(rows, "pos long, weight double")


SQL_LINEAR_PROBE = f"""
WITH {_linprobe_sql(64, 5, 0.1)}
SELECT CAST(0 AS BIGINT) AS pos, (SELECT b FROM b5) AS weight
UNION ALL
SELECT CAST(pos AS BIGINT) AS pos, w AS weight FROM w5
"""


def q_audio_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral band energies through the REAL WAV codec path: text →
    16-bit PCM WAV (stdlib encoder) → container re-parse → DFT energy
    at bins 1..4 over normalized samples. The oracle recomputes the
    identical cos/sin sums from the character codes — normalization
    (÷32768) is what keeps cross-engine libm noise ~9 orders below
    the 6-decimal rounding."""
    from etl_finance_pipeline_spark.operators.multimodal import (
        audio_dft_energies,
        encode_wav_pcm16,
    )

    from etl_finance_pipeline_spark.functions.layout import fan_out

    # fan_out: ~4 cos/sin passes over every clip is real CPU — the
    # single-partition small file would serialize it (no-op at scale)
    docs = fan_out(
        load_table(spark, _t(sf_dir, "documents")).select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "UTF-8").alias("content"),
        )
    )
    wav = encode_wav_pcm16(docs, sample_rate=16_000)
    out = audio_dft_energies(wav, decode="wav", bins=(1, 2, 3, 4))
    return out.select(
        F.col("media_id").alias("doc_id"),
        F.col("bin").cast("long").alias("bin"),
        F.col("energy"),
    )


SQL_AUDIO_SPECTRUM = """
WITH codes AS (
  SELECT doc_id, len(text) AS n,
         list_transform(generate_series(1, len(text)),
                        i -> (ord(substr(text, i, 1)) - 128) / 128.0) AS x
  FROM documents
)
SELECT doc_id, CAST(k AS BIGINT) AS bin,
       floor((
         pow(list_sum(list_transform(generate_series(1, n),
           j -> x[j] * cos(2 * pi() * k * (j - 1) / n))), 2)
         + pow(list_sum(list_transform(generate_series(1, n),
           j -> x[j] * sin(2 * pi() * k * (j - 1) / n))), 2)
       ) * 1000000 + 0.5) / 1000000 AS energy
FROM codes, UNNEST([1, 2, 3, 4]) AS t(k)
"""


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE at corpus scale under the gate: train the merge
    table in-engine (same 6 merges as bpe_train), then tokenize every
    document with it — a narrow exchange-free map where the merge
    table compiles into a replace chain. Output per doc = token count
    + md5 of the joined token stream; the oracle replays the
    identical replaces over the word vocabulary and reassembles each
    document, so the full train→encode path is hash-checked."""
    from etl_finance_pipeline_spark.operators.tokenizer import (
        bpe_encode,
        bpe_train,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(docs, n_merges=_BPE_MERGES)
        .orderBy("merge_round")
        .collect()
    ]
    out = bpe_encode(docs, merges)
    return out.select(
        "doc_id",
        F.size("bpe_tokens").cast("long").alias("n_bpe_tokens"),
        F.md5(F.encode(F.array_join("bpe_tokens", " "), "UTF-8")).alias(
            "tokens_md5"
        ),
    )


SQL_BPE_ENCODE = (
    SQL_BPE_TRAIN[: SQL_BPE_TRAIN.index("\nUNION ALL\n".join(
        f"SELECT {i} AS merge_round, l AS left_sym, r AS right_sym, "
        f"l || r AS merged, cnt AS pair_count FROM b{i}"
        for i in range(1, _BPE_MERGES + 1)
    ))]
    + ","
    + ",".join(
        ["""
e0 AS (
  SELECT w, array_to_string(list_transform(generate_series(1, len(w)),
                                           i -> chr(1) || w[i] || chr(2)), '') AS s
  FROM words
)"""]
        + [_bpe_encode_round_sql(i) for i in range(1, _BPE_MERGES + 1)]
    )
    + f""",
docw AS (
  SELECT doc_id, j, t[j] AS w FROM (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
    FROM documents
  ), LATERAL (SELECT unnest(generate_series(1, len(t))) AS j) g
),
assembled AS (
  SELECT d.doc_id,
         string_split(substr(string_agg(e.s, '' ORDER BY d.j), 2,
                             length(string_agg(e.s, '' ORDER BY d.j)) - 2),
                      chr(2) || chr(1)) AS syms
  FROM docw d JOIN e{_BPE_MERGES} e USING (w)
  GROUP BY d.doc_id
)
SELECT doc_id, CAST(len(syms) AS BIGINT) AS n_bpe_tokens,
       md5(array_to_string(syms, ' ')) AS tokens_md5
FROM assembled
"""
)


_PHASH_CTE = """
f AS (
  SELECT doc_id, rpad(substr(text, 1, 16), 16, ' ') AS p FROM documents
),
rmat AS (
  SELECT rk.k, rt.t,
         list_sum(list_transform(generate_series(0, 7), m ->
           CASE WHEN rk.k = 0 THEN sqrt(1.0 / 32.0)
                ELSE sqrt(2.0 / 32.0) * cos((2 * (rt.t * 8 + m) + 1) * rk.k * pi() / 64)
           END)) AS rv
  FROM range(0, 8) rk(k), range(0, 4) rt(t)
),
tiles AS (
  SELECT doc_id, CAST((i - 1) // 4 AS BIGINT) AS tr, CAST((i - 1) % 4 AS BIGINT) AS tc,
         ord(substr(p, CAST(i AS INTEGER), 1)) AS s
  FROM f, LATERAL (SELECT unnest(generate_series(1, 16)) AS i) g
),
coefs AS (
  SELECT t.doc_id, ra.k AS a, rb.k AS b,
         floor(sum(t.s * ra.rv * rb.rv) * 1000000 + 0.5) / 1000000 AS c
  FROM tiles t
  JOIN rmat ra ON ra.t = t.tr
  JOIN rmat rb ON rb.t = t.tc
  GROUP BY t.doc_id, ra.k, rb.k
),
meds AS (
  SELECT doc_id, list_sort(list(c))[32] AS med
  FROM coefs WHERE NOT (a = 0 AND b = 0) GROUP BY doc_id
),
hashes AS (
  SELECT c.doc_id,
         sum(CASE WHEN c.c > m.med THEN CAST(1 AS BIGINT) << CAST(c.a * 8 + c.b - 1 AS INTEGER)
                  ELSE CAST(0 AS BIGINT) END) AS phash
  FROM coefs c JOIN meds m USING (doc_id)
  WHERE NOT (c.a = 0 AND c.b = 0)
  GROUP BY c.doc_id
)
"""


def _phash_frame(spark: SparkSession, sf_dir: str):
    """(media_id, phash) over 32×32 images built from each doc's
    first 16 bytes (4×4 constant tiles through the real JPEG codec)."""
    from etl_finance_pipeline_spark.operators.multimodal import (
        encode_jpeg_blocks,
        image_phash,
    )

    # rpad to EXACTLY 16 bytes (mirrors the oracle's rpad(...,16,' ')):
    # encode_jpeg_blocks pads only to a multiple of blocks_per_row, so
    # a <13-char document would otherwise yield a 32×(<32) image and a
    # ValueError in image_phash.
    docs = _docs_spread(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.rpad(F.substring("text", 1, 16), 16, " "), "UTF-8").alias(
            "content"
        ),
    )
    jpg = encode_jpeg_blocks(docs, blocks_per_row=4)
    return image_phash(jpg, decode="jpeg")


def q_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual hashes through the REAL JPEG path: 4×4 constant
    tiles → baseline JPEG → decode → 32×32 DCT → top-left 8×8 minus
    DC → 6-decimal rounding → exact lower-median threshold → 63-bit
    hash. The oracle reconstructs every DCT coefficient from the
    character codes via the constant-tile decomposition (coef(a,b) =
    Σ_tiles s·R(a,row)·R(b,col)) — codec, DCT, and thresholding all
    sit under the hash."""
    return _phash_frame(spark, sf_dir).select(
        F.col("media_id").alias("doc_id"), F.col("phash")
    )


SQL_IMAGE_PHASH = f"""
WITH {_PHASH_CTE.strip()}
SELECT doc_id, CAST(phash AS BIGINT) AS phash FROM hashes
"""


def q_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate IMAGES via banded Hamming join over the
    perceptual hashes (dedup.hamming_pairs — the generic candidate
    algebra shared with SimHash). bands=8 > max_hamming=2 makes the
    banding LOSSLESS by pigeonhole, so the oracle is the independent
    all-pairs brute force and a green hash certifies no candidate was
    missed."""
    from etl_finance_pipeline_spark.operators.dedup import hamming_pairs

    # materialize once: hamming_pairs references the fingerprint frame
    # from the bucket census AND both join sides, and the JPEG
    # decode+DCT pipeline is the expensive part (same device as
    # simhash_pairs; measured 7.6 -> ~3 s at sf0.1)
    ph = _phash_frame(spark, sf_dir).localCheckpoint(eager=True)
    out = hamming_pairs(
        ph,
        "phash",
        id_col="media_id",
        bits=64,
        bands=8,
        max_hamming=2,
        max_bucket_size=None,  # lossless contract: no silent bucket drops
    )
    return out.select(
        F.col("id_a"), F.col("id_b"), F.col("hamming").cast("long").alias("hamming")
    )


SQL_PHASH_NEAR_DUP = f"""
WITH {_PHASH_CTE.strip()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= 2
"""


_AFP_CTE = """
af AS (
  SELECT doc_id, len(text) AS n, CAST(len(text) // 8 AS BIGINT) AS wlen,
         list_transform(generate_series(1, len(text)),
                        i -> (ord(substr(text, i, 1)) - 128) / 128.0) AS x
  FROM documents
  WHERE len(text) // 8 >= 2
),
aener AS (
  SELECT doc_id, w, k,
         floor((
           pow(list_sum(list_transform(generate_series(1, CAST(wlen AS INTEGER)),
             j -> x[CAST(w * wlen + j AS BIGINT)] * cos(2 * pi() * k * (j - 1) / wlen))), 2)
           + pow(list_sum(list_transform(generate_series(1, CAST(wlen AS INTEGER)),
             j -> x[CAST(w * wlen + j AS BIGINT)] * sin(2 * pi() * k * (j - 1) / wlen))), 2)
         ) * 1000000 + 0.5) / 1000000 AS e
  FROM af, range(0, 8) rw(w), range(1, 9) rk(k)
),
afp AS (
  SELECT a.doc_id,
         sum(CASE WHEN b.e > a.e
                  THEN CAST(1 AS BIGINT) << CAST(a.w * 8 + a.k - 1 AS INTEGER)
                  ELSE CAST(0 AS BIGINT) END) AS fingerprint
  FROM aener a JOIN aener b
    ON a.doc_id = b.doc_id AND b.w = a.w + 1 AND b.k = a.k
  GROUP BY a.doc_id
)
"""


def _audio_fp_frame(spark: SparkSession, sf_dir: str):
    from etl_finance_pipeline_spark.functions.layout import fan_out
    from etl_finance_pipeline_spark.operators.multimodal import (
        audio_fingerprint,
        encode_wav_pcm16,
    )

    # NOT _docs_spread inside fan_out: fan_out already widens the scan,
    # and stacking a second round-robin exchange of the payload on top
    # measured +15-95% on the codec lanes (r13 regression, reverted in
    # r14 -- guide §2.3: the extra exchange is pure loss).
    docs = fan_out(
        load_table(spark, _t(sf_dir, "documents")).select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "UTF-8").alias("content"),
        )
    )
    wav = encode_wav_pcm16(docs, sample_rate=16_000)
    return audio_fingerprint(wav, decode="wav", n_windows=8, n_bins=8)


def q_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral audio fingerprints through the REAL WAV codec path:
    8 windows × 8 DFT bins, one bit per energy transition — the
    Chromaprint-family construction. The oracle recomputes every
    windowed cos/sin energy from the character codes and packs the
    identical 56 bits."""
    out = _audio_fp_frame(spark, sf_dir)
    return out.filter(F.col("fingerprint").isNotNull()).select(
        F.col("media_id").alias("doc_id"), F.col("fingerprint")
    )


SQL_AUDIO_FINGERPRINT = f"""
WITH {_AFP_CTE.strip()}
SELECT doc_id, CAST(fingerprint AS BIGINT) AS fingerprint FROM afp
"""


def q_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate AUDIO via the banded Hamming join over spectral
    fingerprints — the fourth modality on the shared hamming_pairs
    algebra (text SimHash, image pHash, embeddings LSH). bands=8 >
    max_hamming=3 ⇒ lossless candidates; the all-pairs brute-force
    oracle certifies it."""
    from etl_finance_pipeline_spark.operators.dedup import hamming_pairs

    fp = (
        _audio_fp_frame(spark, sf_dir)
        .filter(F.col("fingerprint").isNotNull())
        .localCheckpoint(eager=True)  # 3 consumers; trig kernel is the cost
    )
    out = hamming_pairs(
        fp,
        "fingerprint",
        id_col="media_id",
        bits=64,
        bands=8,
        max_hamming=3,
        max_bucket_size=None,  # lossless contract: no silent bucket drops
    )
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


SQL_AUDIO_NEAR_DUP = f"""
WITH {_AFP_CTE.strip()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS BIGINT) AS hamming
FROM afp a JOIN afp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 3
"""


_HNDK_N = 200_000


def q_hamming_near_dup_200k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALE-PROPORTIONAL lane for the shared banded-Hamming algebra:
    200k deterministic 60-bit fingerprints synthesized in-engine
    (md5-derived, so the DuckDB twin computes bit-identical values),
    with planted duplicate pairs (2 copies per 20-id group) and one
    Hamming-1 neighbor per group — 30k true pairs. The media tables
    at bench SF are ~5k rows, below the fixed stage-latency floor
    where the identical-fingerprint collapse layer can never pay for
    itself (SCALE.md adjudication of the round-8 audio_near_dup
    flag); THIS row sizes the population so the layer's asymptotic
    win is bench-visible, round over round. Deliberately
    sf-independent: the fingerprint population is the workload.

    bands=4 (16-bit slices) > max_hamming=3 keeps the banding
    lossless by pigeonhole; the oracle applies the SAME pigeonhole
    banding (an all-pairs brute force over 2×10¹⁰ candidates is not
    a feasible oracle), which is exact for the same reason the
    engine's is — certified independently by the brute-force property
    test over the identical algebra."""
    from etl_finance_pipeline_spark.operators.dedup import hamming_pairs

    def _fp(c):
        # 15 hex chars of md5 = 60-bit non-negative fingerprint
        return F.conv(
            F.substring(F.md5(c.cast("string")), 1, 15), 16, 10
        ).cast("long")

    gid = F.col("id") - (F.col("id") % 20)
    fp = (
        F.when(F.col("id") % 20 < 2, _fp(gid))
        .when(
            F.col("id") % 20 == 2,
            _fp(gid).bitwiseXOR(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(id % 59 AS INT))")
            ),
        )
        .otherwise(_fp(F.col("id")))
    )
    df = spark.range(_HNDK_N).select(F.col("id").alias("doc_id"), fp.alias("fp"))
    out = hamming_pairs(
        df, "fp", id_col="doc_id", bits=64, bands=4, max_hamming=3,
        max_bucket_size=None,  # lossless contract
    )
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


SQL_HAMMING_NEAR_DUP_200K = f"""
WITH hk_ids AS (SELECT CAST(i AS BIGINT) AS id FROM range(0, {_HNDK_N}) t(i)),
hk_fp AS (
  SELECT id,
    CASE
      WHEN id % 20 < 2 THEN
        ('0x' || substr(md5(CAST(id - id % 20 AS VARCHAR)), 1, 15))::BIGINT
      WHEN id % 20 = 2 THEN xor(
        ('0x' || substr(md5(CAST(id - id % 20 AS VARCHAR)), 1, 15))::BIGINT,
        CAST(1 AS BIGINT) << CAST(id % 59 AS INTEGER))
      ELSE ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT
    END AS fp
  FROM hk_ids
),
hk_bands AS (
  SELECT id, fp, b, (fp >> CAST(16 * b AS INTEGER)) & 65535 AS key
  FROM hk_fp, range(0, 4) rb(b)
),
hk_cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         bit_count(xor(a.fp, b.fp)) AS h
  FROM hk_bands a JOIN hk_bands b USING (b, key)
  WHERE a.id < b.id
)
SELECT id_a, id_b, CAST(h AS BIGINT) AS hamming
FROM hk_cand WHERE h <= 3
"""


_VFP_CTE = """
vf AS (
  SELECT doc_id, rpad(text, CAST(greatest(1, ceil(len(text) / 64.0)) * 64 AS INTEGER), ' ') AS p,
         greatest(1, CAST(ceil(len(text) / 64.0) AS BIGINT)) AS nf
  FROM documents
  WHERE greatest(1, CAST(ceil(len(text) / 64.0) AS BIGINT)) >= 2
),
vrows AS (
  SELECT doc_id, t, r,
         list_sum(list_transform(generate_series(1, 8),
           c -> ord(substr(p, CAST((t * nf // 8) * 64 + r * 8 + c AS BIGINT), 1)))) AS rs
  FROM vf, range(0, 8) rt(t), range(0, 8) rr(r)
),
vfp AS (
  SELECT a.doc_id,
         sum(CASE WHEN b.rs > a.rs
                  THEN CAST(1 AS BIGINT) << CAST(a.t * 8 + a.r AS INTEGER)
                  ELSE CAST(0 AS BIGINT) END) AS fingerprint
  FROM vrows a JOIN vrows b
    ON a.doc_id = b.doc_id AND b.t = a.t + 1 AND b.r = a.r
  GROUP BY a.doc_id
)
"""


def _video_fp_frame(spark: SparkSession, sf_dir: str):
    from etl_finance_pipeline_spark.operators.multimodal import (
        encode_y4m,
        video_fingerprint,
    )

    docs = _docs_spread(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
    )
    clips = encode_y4m(docs, width=8, height=8)
    return video_fingerprint(clips, decode="y4m")


def q_video_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatio-temporal video fingerprints through the REAL y4m
    container: 8 time slots × 8 per-row luma sums, one bit per
    temporal rise — ALL-INTEGER, so the oracle reproduces it with
    plain integer sums and strict compares, no rounding contract."""
    out = _video_fp_frame(spark, sf_dir)
    return out.filter(F.col("fingerprint").isNotNull()).select(
        F.col("media_id").alias("doc_id"), F.col("fingerprint")
    )


SQL_VIDEO_FINGERPRINT = f"""
WITH {_VFP_CTE.strip()}
SELECT doc_id, CAST(fingerprint AS BIGINT) AS fingerprint FROM vfp
"""


def q_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate VIDEO via the banded Hamming join — completing
    the modality matrix on the one shared candidate algebra (text
    SimHash, image pHash, audio spectral fingerprint, embedding LSH,
    video temporal-gradient hash). Lossless banding (bands=8 >
    max_hamming=3), brute-force all-pairs oracle."""
    from etl_finance_pipeline_spark.operators.dedup import hamming_pairs

    fp = (
        _video_fp_frame(spark, sf_dir)
        .filter(F.col("fingerprint").isNotNull())
        .localCheckpoint(eager=True)  # 3 consumers; container parse is the cost
    )
    out = hamming_pairs(
        fp,
        "fingerprint",
        id_col="media_id",
        bits=64,
        bands=8,
        max_hamming=3,
        max_bucket_size=None,  # lossless contract: no silent bucket drops
    )
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


SQL_VIDEO_NEAR_DUP = f"""
WITH {_VFP_CTE.strip()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS BIGINT) AS hamming
FROM vfp a JOIN vfp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 3
"""


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality signal (compressibility proxy: drop
    low-entropy boilerplate, flag high-entropy non-text). Exact
    rational probabilities + O(1) log magnitudes under 6-decimal
    rounding make the oracle a direct SQL transcription."""
    from etl_finance_pipeline_spark.operators.text_analysis import (
        char_entropy,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    return char_entropy(docs)


SQL_CHAR_ENTROPY = """
WITH chars AS (
  SELECT doc_id, len(text) AS n, substr(text, i, 1) AS c
  FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text))) AS i) g
),
counts AS (
  SELECT doc_id, n, c, count(*) AS k FROM chars GROUP BY doc_id, n, c
),
ent AS (
  SELECT doc_id, n, CAST(count(*) AS BIGINT) AS n_distinct_chars,
         floor((-sum((k * 1.0 / n) * log2(k * 1.0 / n))) * 1000000 + 0.5) / 1000000 AS entropy
  FROM counts GROUP BY doc_id, n
)
SELECT d.doc_id,
       CAST(coalesce(e.n, 0) AS BIGINT) AS n_chars,
       coalesce(e.n_distinct_chars, 0) AS n_distinct_chars,
       coalesce(e.entropy, 0.0) AS entropy
FROM documents d LEFT JOIN ent e USING (doc_id)
"""


# --------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) tokenizer: Viterbi-EM training +
# corpus segmentation. The oracle unrolls the per-word Viterbi DP
# positionally (word length capped at _UNI_W) and the EM rounds
# explicitly — the same fixed-unroll device as the Lloyd/PQ oracles.
# --------------------------------------------------------------------

_UNI_W, _UNI_L, _UNI_MULTI, _UNI_ITERS = 16, 4, 48, 2
_UNI_BIG = "1000000000.0"

_UNI_WORDS_SQL = """
  SELECT w, count(*) AS wc FROM (
    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
    FROM documents
  ) WHERE len(w) >= 1 AND len(w) <= {W}
  GROUP BY w
""".format(W=_UNI_W)


def _uni_dp_sql(cost_cte: str, tag: str) -> str:
    """Positionally unrolled Viterbi DP of every distinct word against
    cost table *cost_cte*: emits CTEs uspan{tag} → upv{tag} (pivoted
    span costs) → a CHAIN of one-column-per-step CTEs for dp d1..dW
    (argmin as list_sort([[cost, j], ...])[1]) and the backtrack
    b1..bW, ending in ubt{tag}. A chain, not lateral column aliases:
    DuckDB substitutes lateral aliases textually, so a 16-deep chain
    with multi-reference steps explodes exponentially in the binder
    (measured: never returns); CTE steps reference previous columns
    by name only. Mirrors operators.tokenizer._uni_dp /
    _uni_backtrack exactly, including the smaller-j tie-break."""
    W, L = _UNI_W, _UNI_L
    pv_cols = ",\n         ".join(
        f"min(CASE WHEN e = {e} AND l = {l} THEN pc END) AS c{e}_{l}"
        for e in range(1, W + 1)
        for l in range(1, min(L, e) + 1)
    )
    parts = [
        f"""uspan{tag} AS (
  SELECT uw.w, uw.wc, t1.e, t2.l, coalesce(c.cost, {_UNI_BIG}) AS pc
  FROM uw
  CROSS JOIN range(1, {W + 1}) t1(e)
  CROSS JOIN range(1, {L + 1}) t2(l)
  LEFT JOIN {cost_cte} c
    ON c.piece = substr(uw.w, CAST(t1.e - t2.l + 1 AS INT), CAST(t2.l AS INT))
  WHERE t2.l <= t1.e AND t1.e <= len(uw.w)
),
upv{tag} AS MATERIALIZED (
  SELECT w, wc, len(w) AS n,
         {pv_cols}
  FROM uspan{tag} GROUP BY w, wc
),
ud{tag}0 AS MATERIALIZED (SELECT *, [0.0, -1.0] AS d0 FROM upv{tag})"""
    ]
    for e in range(1, W + 1):
        cands = ", ".join(
            f"[d{e - l}[1] + coalesce(c{e}_{l}, {_UNI_BIG}), "
            f"CAST({e - l} AS DOUBLE)]"
            for l in range(1, min(L, e) + 1)
        )
        parts.append(
            f"ud{tag}{e} AS MATERIALIZED (SELECT *, list_sort([{cands}])[1] AS d{e} "
            f"FROM ud{tag}{e - 1})"
        )
    jl = "[" + ", ".join(f"d{e}[2]" for e in range(1, W + 1)) + "]"
    dl = "[" + ", ".join(f"d{e}[1]" for e in range(1, W + 1)) + "]"
    parts.append(
        f"ubt{tag}0 AS MATERIALIZED (SELECT w, wc, n, {jl} AS jl, {dl} AS dl, "
        f"CAST(n AS INT) AS b0 FROM ud{tag}{W})"
    )
    for t in range(W):
        parts.append(
            f"ubt{tag}{t + 1} AS MATERIALIZED (SELECT *, CASE WHEN b{t} > 0 "
            f"THEN CAST(jl[b{t}] AS INT) ELSE 0 END AS b{t + 1} "
            f"FROM ubt{tag}{t})"
        )
    parts.append(f"ubt{tag} AS MATERIALIZED (SELECT * FROM ubt{tag}{W})")
    return ",\n".join(parts)


def _uni_round_sql(r: int, src_cost: str | None = None) -> str:
    """One Viterbi-EM round: DP against *src_cost* (default
    ucost{r-1}; the prune step points it at the pruned table), piece
    counts from the unrolled backtrack, re-estimated costs (unseen
    pieces keep their previous cost)."""
    W = _UNI_W
    src_cost = src_cost or f"ucost{r - 1}"
    seg_selects = "\n  UNION ALL\n".join(
        f"  SELECT wc, substr(w, b{t + 1} + 1, b{t} - b{t + 1}) AS piece "
        f"FROM ubt{r} WHERE b{t} > 0"
        for t in range(W)
    )
    return f"""{_uni_dp_sql(src_cost, str(r))},
useg{r} AS (
{seg_selects}
),
ucnt{r} AS (SELECT piece, sum(wc) AS cnt FROM useg{r} GROUP BY piece),
ucost{r} AS (
  SELECT v.piece,
         CASE WHEN c.cnt IS NOT NULL
              THEN floor(-ln(CAST(c.cnt AS DOUBLE)
                   / CAST((SELECT sum(cnt) FROM ucnt{r}) AS DOUBLE))
                   * 1000000 + 0.5) / 1000000
              ELSE v.cost END AS cost
  FROM {src_cost} v LEFT JOIN ucnt{r} c USING (piece)
)"""


_UNI_BASE_SQL = f"""uw AS (
{_UNI_WORDS_SQL}
),
useed AS (
  SELECT piece, sum(wc) AS cnt FROM (
    SELECT substr(uw.w, CAST(t1.i AS INT), CAST(t2.l AS INT)) AS piece, uw.wc
    FROM uw
    CROSS JOIN range(1, {_UNI_W + 1}) t1(i)
    CROSS JOIN range(1, {_UNI_L + 1}) t2(l)
    WHERE t1.i + t2.l - 1 <= len(uw.w)
  ) GROUP BY piece
),
uvocab AS (
  SELECT piece, cnt FROM useed WHERE len(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt FROM useed WHERE len(piece) > 1
    ORDER BY cnt DESC, piece LIMIT {_UNI_MULTI}
  )
),
ucost0 AS (
  SELECT piece,
         floor(-ln(CAST(cnt AS DOUBLE)
               / CAST((SELECT sum(cnt) FROM uvocab) AS DOUBLE))
               * 1000000 + 0.5) / 1000000 AS cost
  FROM uvocab
)"""


def q_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) vocabulary training — the
    mainstream alternative to BPE (Kudo 2018): seed with all ≤4-char
    substrings (every single char + top-48 multi-char), then 2 rounds
    of Viterbi-EM over the distinct-word frame. The oracle unrolls the
    per-word Viterbi lattice positionally and the EM rounds explicitly,
    so seeding, segmentation, counting, and cost re-estimation all sit
    under the hash."""
    from etl_finance_pipeline_spark.operators.tokenizer import unigram_train

    docs = load_table(spark, _t(sf_dir, "documents"))
    return unigram_train(
        docs, n_multi=_UNI_MULTI, iters=_UNI_ITERS,
        max_piece_len=_UNI_L, max_word_len=_UNI_W,
    )


SQL_UNIGRAM_TRAIN = f"""
WITH {_UNI_BASE_SQL},
{",".join(_uni_round_sql(r) for r in range(1, _UNI_ITERS + 1))}
SELECT v.piece, v.cost, CAST(coalesce(c.cnt, 0) AS BIGINT) AS piece_count
FROM ucost{_UNI_ITERS} v LEFT JOIN ucnt{_UNI_ITERS} c USING (piece)
"""


_UNI_PRUNE_TO = 24


def q_unigram_train_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SentencePiece-style vocabulary SHRINK step: after the EM
    rounds, keep every single char plus the most-used multi-char
    pieces up to a 24-piece target (final Viterbi count desc, piece
    asc), then one more EM round re-normalizes the survivors over the
    pruned lattice. The oracle unrolls the prune (a windowed top-k
    over the previous round's counts with a data-dependent char
    budget) and the extra round."""
    from etl_finance_pipeline_spark.operators.tokenizer import unigram_train

    docs = load_table(spark, _t(sf_dir, "documents"))
    return unigram_train(
        docs, n_multi=_UNI_MULTI, iters=_UNI_ITERS,
        max_piece_len=_UNI_L, max_word_len=_UNI_W,
        prune_to=_UNI_PRUNE_TO,
    )


_UNI_R_FINAL = _UNI_ITERS + 1

SQL_UNIGRAM_TRAIN_PRUNED = f"""
WITH {_UNI_BASE_SQL},
{",".join(_uni_round_sql(r) for r in range(1, _UNI_ITERS + 1))},
uprune AS (
  SELECT piece, cost FROM (
    SELECT v.piece, v.cost,
           row_number() OVER (
             ORDER BY coalesce(c.cnt, 0) DESC, v.piece
           ) AS pr
    FROM ucost{_UNI_ITERS} v LEFT JOIN ucnt{_UNI_ITERS} c USING (piece)
    WHERE len(v.piece) > 1
  ) WHERE pr <= greatest(0, {_UNI_PRUNE_TO} - (
      SELECT count(*) FROM ucost{_UNI_ITERS} WHERE len(piece) = 1))
  UNION ALL
  SELECT piece, cost FROM ucost{_UNI_ITERS} WHERE len(piece) = 1
),
{_uni_round_sql(_UNI_R_FINAL, src_cost="uprune")}
SELECT v.piece, v.cost, CAST(coalesce(c.cnt, 0) AS BIGINT) AS piece_count
FROM ucost{_UNI_R_FINAL} v LEFT JOIN ucnt{_UNI_R_FINAL} c USING (piece)
"""


def q_unigram_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus segmentation with the trained unigram vocabulary: per
    document, Viterbi-tokenize each (≤16-char) word and report piece
    count + total path cost. The DP runs on the DISTINCT-word frame
    and joins back to the document word list — the corpus never
    carries the lattice."""
    from etl_finance_pipeline_spark.operators.tokenizer import (
        unigram_segment,
        unigram_train,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    vocab = unigram_train(
        docs, n_multi=_UNI_MULTI, iters=_UNI_ITERS,
        max_piece_len=_UNI_L, max_word_len=_UNI_W,
    )
    return unigram_segment(
        docs, vocab, max_piece_len=_UNI_L, max_word_len=_UNI_W
    )


def _uni_seg_stats_sql() -> str:
    """Per-distinct-word piece count + path cost against the FINAL
    cost table (one more unrolled DP block, tag S)."""
    W = _UNI_W
    npieces = " + ".join(
        f"CASE WHEN b{t} > 0 THEN 1 ELSE 0 END" for t in range(W)
    )
    dlist = "[" + ", ".join(f"d{e}[1]" for e in range(1, W + 1)) + "]"
    return f"""{_uni_dp_sql(f"ucost{_UNI_ITERS}", "S")},
ustats AS (
  SELECT w, {npieces} AS npieces, dl[n] AS wcost FROM ubtS
)"""


SQL_UNIGRAM_SEGMENT = f"""
WITH {_UNI_BASE_SQL},
{",".join(_uni_round_sql(r) for r in range(1, _UNI_ITERS + 1))},
{_uni_seg_stats_sql()},
udw AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
    FROM documents
  ) WHERE len(w) >= 1 AND len(w) <= {_UNI_W}
)
SELECT doc_id,
       CAST(sum(npieces) AS BIGINT) AS n_pieces,
       floor(sum(wcost) * 1000000 + 0.5) / 1000000 AS total_cost
FROM udw JOIN ustats USING (w)
GROUP BY doc_id
"""


# --------------------------------------------------------------------
# Tokenizer compression-ratio eval (which tokenizer for this corpus?)
# --------------------------------------------------------------------

def q_tokenizer_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The which-tokenizer-for-this-corpus readout: chars/token and
    tokens/word per source × tokenizer for all three in-engine
    trainers (BPE, WordPiece, unigram) — the standard compression-
    ratio eval run before committing a vocabulary to a training mix.
    Pure composition: each encode lane already produces per-doc token
    counts; the char/word mass comes from one narrow expression over
    the SAME length-capped word set each tokenizer actually encodes
    (BPE: all words; WordPiece: ≤16 chars; unigram: ≤ max_word_len),
    then one per-source aggregate per lane and a 3-way union. All
    ratios are IEEE divisions of exact integer sums — no rounding
    contract beyond the output's own 6 dp."""
    from etl_finance_pipeline_spark.functions.text import tokens
    from etl_finance_pipeline_spark.operators.tokenizer import (
        bpe_encode,
        bpe_train,
        unigram_segment,
        unigram_train,
        wordpiece_encode,
        wordpiece_train,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    toks = tokens("text")

    def meta(cap: int | None):
        t = (
            toks
            if cap is None
            else F.filter(toks, lambda w: F.length(w) <= F.lit(cap))
        )
        return docs.select(
            "doc_id",
            "source",
            F.size(t).cast("long").alias("_w"),
            F.aggregate(
                t, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
            ).alias("_c"),
        )

    # The four trainings are INDEPENDENT sequences of small driver
    # rounds (merge loops / EM passes), each leaving most executors
    # idle between its tiny jobs — overlap them so one lane's rounds
    # back-fill another's gaps (guide §2.6; same device as the
    # pipeline's per-timeframe outputs). Each lane is deterministic
    # and touches only its own driver-side state, so results are
    # byte-identical to the sequential order.
    from concurrent.futures import ThreadPoolExecutor

    def _bpe_lane():
        merges = [
            (r["left_sym"], r["right_sym"])
            for r in bpe_train(docs, n_merges=_BPE_MERGES)
            .orderBy("merge_round")
            .collect()
        ]
        return bpe_encode(docs, merges).select(
            "doc_id", F.size("bpe_tokens").cast("long").alias("_t")
        )

    def _bbpe_lane():
        bmerges = [
            (r["left_sym"], r["right_sym"])
            for r in bpe_train(docs, n_merges=_BPE_MERGES, byte_level=True)
            .orderBy("merge_round")
            .collect()
        ]
        return bpe_encode(docs, bmerges, byte_level=True).select(
            "doc_id", F.size("bpe_tokens").cast("long").alias("_t")
        )

    def _wp_lane():
        return wordpiece_encode(
            docs, wordpiece_train(docs, n_merges=_WP_MERGES)
        ).select("doc_id", F.col("n_pieces").cast("long").alias("_t"))

    def _uni_lane():
        return unigram_segment(
            docs,
            unigram_train(
                docs, n_multi=_UNI_MULTI, iters=_UNI_ITERS,
                max_piece_len=_UNI_L, max_word_len=_UNI_W,
            ),
            max_piece_len=_UNI_L,
            max_word_len=_UNI_W,
        ).select("doc_id", F.col("n_pieces").cast("long").alias("_t"))

    with ThreadPoolExecutor(max_workers=3) as pool:
        futures = [
            pool.submit(lane)
            for lane in (_bpe_lane, _bbpe_lane, _wp_lane, _uni_lane)
        ]
        bpe, bbpe, wp, uni = [f.result() for f in futures]

    outs = []
    for name, enc, cap in (
        ("bpe", bpe, None),
        ("bpe_bytes", bbpe, None),
        ("wordpiece", wp, 16),
        ("unigram", uni, _UNI_W),
    ):
        j = enc.join(meta(cap), "doc_id")
        outs.append(
            j.groupBy("source")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("_w").cast("long").alias("n_words"),
                F.sum("_c").cast("long").alias("n_chars"),
                F.sum("_t").cast("long").alias("n_tokens"),
            )
            .select(
                F.lit(name).alias("tokenizer"),
                "source",
                "n_docs",
                "n_words",
                "n_chars",
                "n_tokens",
                _pr(F.col("n_chars") / F.col("n_tokens"), 6).alias(
                    "chars_per_token"
                ),
                _pr(F.col("n_tokens") / F.col("n_words"), 6).alias(
                    "tokens_per_word"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


SQL_TOKENIZER_EFFICIENCY = f"""
WITH tkm AS (
  SELECT doc_id, source, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
tke AS (
  SELECT 'bpe' AS tokenizer, m.source,
         len(m.toks) AS w,
         list_sum(list_transform(m.toks, t -> CAST(len(t) AS BIGINT))) AS c,
         enc.n_bpe_tokens AS t
  FROM ({SQL_BPE_ENCODE.strip()}) enc JOIN tkm m ON m.doc_id = enc.doc_id
  UNION ALL
  SELECT 'bpe_bytes', m.source,
         len(m.toks),
         list_sum(list_transform(m.toks, t -> CAST(len(t) AS BIGINT))),
         enc.n_byte_tokens
  FROM ({SQL_BPE_BYTES_ENCODE.strip()}) enc JOIN tkm m ON m.doc_id = enc.doc_id
  UNION ALL
  SELECT 'wordpiece', m.source,
         len(list_filter(m.toks, t -> len(t) <= 16)),
         list_sum(list_transform(list_filter(m.toks, t -> len(t) <= 16),
                                 t -> CAST(len(t) AS BIGINT))),
         enc.n_pieces
  FROM ({SQL_WORDPIECE_ENCODE_CORPUS.strip()}) enc JOIN tkm m ON m.doc_id = enc.doc_id
  UNION ALL
  SELECT 'unigram', m.source,
         len(list_filter(m.toks, t -> len(t) <= {_UNI_W})),
         list_sum(list_transform(list_filter(m.toks, t -> len(t) <= {_UNI_W}),
                                 t -> CAST(len(t) AS BIGINT))),
         enc.n_pieces
  FROM ({SQL_UNIGRAM_SEGMENT.strip()}) enc JOIN tkm m ON m.doc_id = enc.doc_id
)
SELECT tokenizer, source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(w) AS BIGINT) AS n_words,
  CAST(sum(c) AS BIGINT) AS n_chars,
  CAST(sum(t) AS BIGINT) AS n_tokens,
  floor(sum(c) / sum(t) * 1000000 + 0.5) / 1000000 AS chars_per_token,
  floor(sum(t) / sum(w) * 1000000 + 0.5) / 1000000 AS tokens_per_word
FROM tke GROUP BY 1, 2
"""


# --------------------------------------------------------------------
# Cross-document line dedup (CCNet/RefinedWeb boilerplate removal)
# --------------------------------------------------------------------

_LD_K = 3  # pseudo-line width (words) for the newline-free fixture


def _line_dedup_frames(spark: SparkSession, sf_dir: str, keep: str):
    from etl_finance_pipeline_spark.operators.corpus import (
        line_dedup,
        reassemble_lines,
        segment_lines,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    seg = segment_lines(docs, words_per_line=_LD_K)
    kept = line_dedup(seg, min_docs=2, keep=keep)
    return reassemble_lines(kept, joiner=" ")


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal: every 3-word pseudo-line occurring in >= 2
    distinct documents is excised from ALL of them; documents are
    reassembled from their surviving lines in order. Exact string
    compare — no rounding contract at all."""
    return _line_dedup_frames(spark, sf_dir, keep="none").select(
        "doc_id", "n_lines", "text"
    )


def q_line_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-copy lane: the globally first occurrence by
    (doc_id, pos) of each duplicated line survives; the oracle
    reproduces the same argmin via an encoded (doc, pos) key."""
    return _line_dedup_frames(spark, sf_dir, keep="first").select(
        "doc_id", "n_lines", "text"
    )


_LD_SEG_SQL = f"""
ldt AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
ldseg AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(toks[(i - 1) * {_LD_K} + 1 : (i - 1) * {_LD_K} + {_LD_K}], ' ')
           AS line
  FROM (
    SELECT doc_id, toks,
           unnest(generate_series(1, CAST(ceil(len(toks) / {_LD_K}.0) AS BIGINT))) AS i
    FROM ldt
  )
),
ldpd AS (
  SELECT line, doc_id, min(pos) AS minpos FROM ldseg GROUP BY 1, 2
),
ldst AS (
  SELECT line, CAST(count(*) AS BIGINT) AS dfreq,
         min(doc_id * 100000 + minpos) AS firstkey
  FROM ldpd GROUP BY 1
)"""


SQL_LINE_DEDUP = f"""
WITH {_LD_SEG_SQL}
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       string_agg(line, ' ' ORDER BY pos) AS text
FROM ldseg JOIN ldst USING (line)
WHERE dfreq < 2
GROUP BY doc_id
"""


SQL_LINE_DEDUP_KEEP_FIRST = f"""
WITH {_LD_SEG_SQL}
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       string_agg(line, ' ' ORDER BY pos) AS text
FROM ldseg JOIN ldst USING (line)
WHERE dfreq < 2 OR doc_id * 100000 + pos = firstkey
GROUP BY doc_id
"""


_TB_CAP = 0.05
_TB_BUDGET = 1_000_000


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture planning: allocate a 1M-token training budget across
    sources with a 5% per-source share cap and ONE cap-and-
    redistribute round (capped sources pin at the cap; the freed mass
    spreads over uncapped sources proportional to their raw share) —
    the deterministic closed form of the standard data-mixture
    waterfill. Everything derives from exact per-source token counts;
    the source table is dim-sized, so after one corpus aggregate this
    is broadcast arithmetic."""
    from etl_finance_pipeline_spark.functions.text import tokens

    docs = load_table(spark, _t(sf_dir, "documents"))
    per = docs.select("source", F.size(tokens("text")).alias("_t")).groupBy(
        "source"
    ).agg(F.sum("_t").alias("n_tokens"))
    total = per.agg(F.sum("n_tokens").alias("_tt"))
    shared = per.crossJoin(F.broadcast(total)).withColumn(
        "raw_share", F.col("n_tokens") / F.col("_tt")
    )
    cap = F.lit(_TB_CAP)
    stats = shared.agg(
        F.sum(F.least(F.col("raw_share"), cap)).alias("_capsum"),
        F.sum(
            F.when(F.col("raw_share") < cap, F.col("raw_share")).otherwise(0.0)
        ).alias("_us"),
    )
    out = shared.crossJoin(F.broadcast(stats)).withColumn(
        "final_share",
        F.when(F.col("raw_share") >= cap, cap).otherwise(
            F.col("raw_share")
            + (F.col("raw_share") / F.col("_us"))
            * (F.lit(1.0) - F.col("_capsum"))
        ),
    )
    fs6 = _pr("final_share", 6)
    # allocation derives from the ROUNDED share so the integer floor
    # can't straddle engines' sub-ulp share differences
    return out.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        _pr("raw_share", 6).alias("raw_share"),
        fs6.alias("final_share"),
        F.floor(fs6 * _TB_BUDGET).cast("long").alias("alloc_tokens"),
    )


SQL_TOKEN_BUDGET = rf"""
WITH tbp AS (
  SELECT source,
         CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\s+')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
tbt AS (SELECT sum(n_tokens) AS tt FROM tbp),
tbs AS (
  SELECT source, n_tokens, n_tokens / CAST(tt AS DOUBLE) AS raw_share
  FROM tbp CROSS JOIN tbt
),
tbst AS (
  SELECT sum(least(raw_share, {_TB_CAP})) AS capsum,
         sum(CASE WHEN raw_share < {_TB_CAP} THEN raw_share ELSE 0.0 END)
           AS us
  FROM tbs
),
tbf AS (
  SELECT source, n_tokens, raw_share,
         CASE WHEN raw_share >= {_TB_CAP} THEN {_TB_CAP}
              ELSE raw_share + (raw_share / us) * (1.0 - capsum) END
           AS final_share
  FROM tbs CROSS JOIN tbst
)
SELECT source, n_tokens,
       floor(raw_share * 1000000 + 0.5) / 1000000 AS raw_share,
       floor(final_share * 1000000 + 0.5) / 1000000 AS final_share,
       CAST(floor((floor(final_share * 1000000 + 0.5) / 1000000)
                  * {_TB_BUDGET}) AS BIGINT) AS alloc_tokens
FROM tbf
"""


def q_line_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher's within-doc duplicate-line fractions over 3-word
    pseudo-lines — exact integer counts through the ratios."""
    from etl_finance_pipeline_spark.operators.corpus import (
        line_repetition_stats,
        segment_lines,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    return line_repetition_stats(segment_lines(docs, words_per_line=_LD_K))


SQL_LINE_REPETITION = f"""
WITH {_LD_SEG_SQL},
lrpl AS (
  SELECT doc_id, line, CAST(count(*) AS BIGINT) AS c, len(line) AS l
  FROM ldseg GROUP BY doc_id, line
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_lines,
       CAST(count(*) AS BIGINT) AS n_distinct_lines,
       floor(sum(c - 1) / CAST(sum(c) AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS dup_line_frac,
       floor(sum((c - 1) * l) / CAST(sum(c * l) AS DOUBLE) * 1000000 + 0.5)
         / 1000000 AS dup_char_frac
FROM lrpl GROUP BY doc_id
"""


SQL_BOILERPLATE_REPORT = f"""
WITH {_LD_SEG_SQL}
SELECT line, CAST(count(*) AS BIGINT) AS doc_frequency
FROM (SELECT DISTINCT line, doc_id FROM ldseg)
GROUP BY line
ORDER BY doc_frequency DESC, line
LIMIT 20
"""


# --------------------------------------------------------------------
# PCA over embeddings: covariance, power-iteration top component,
# projection
# --------------------------------------------------------------------

_PCA_ITERS = 8


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full d×d covariance of the embedding corpus — the one
    corpus-scale aggregate behind PCA. Entries are sums of float
    products (order noise ~1e-14) under 6-dp rounding."""
    from etl_finance_pipeline_spark.operators.pca import embedding_covariance

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    return embedding_covariance(emb).select(
        "i", "j", _pr("cov", 6).alias("cov")
    )


def q_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant eigenvector via a FIXED 8-round power method with the
    per-iteration 6-dp lockstep rounding (linear_probe's device), so
    the oracle's unrolled matvec rounds can't drift from the driver's
    numpy loop."""
    import math

    from etl_finance_pipeline_spark.operators.pca import pca_fit

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    loadings, eig, _ = pca_fit(emb, iters=_PCA_ITERS)
    eig6 = math.floor(eig * 1e6 + 0.5) / 1e6
    return spark.createDataFrame(
        [(i + 1, loadings[i], eig6) for i in range(len(loadings))],
        "i int, loading double, eigenvalue double",
    )


def q_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered projection of every vector onto the fitted top
    component — a narrow dot product against broadcast literals."""
    from etl_finance_pipeline_spark.operators.pca import pca_fit, pca_project

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    loadings, _, means = pca_fit(emb, iters=_PCA_ITERS)
    out = pca_project(emb, loadings, means=means)
    return out.select("vec_id", _pr("score", 6).alias("score"))


_PCA_COV_SQL = """
pxe AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
),
px AS (
  SELECT vec_id, i, x[i] AS xi
  FROM (SELECT vec_id, x, unnest(generate_series(1, len(x))) AS i FROM pxe)
),
psum AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, sum(a.xi * b.xi) AS sxx, sum(a.xi) AS sxi,
         CAST(count(*) AS BIGINT) AS n
  FROM px a JOIN px b ON a.vec_id = b.vec_id
  GROUP BY 1, 2
),
pmean AS (SELECT i AS j, sxi / n AS mean_j FROM psum WHERE i = j),
pcov AS MATERIALIZED (
  SELECT psum.i, psum.j, sxx / n - (sxi / n) * mean_j AS cov
  FROM psum JOIN pmean ON pmean.j = psum.j
)"""


def _pca_round_sql(k: int, p: str = "p") -> str:
    """One power-method round over {p}cov: matvec, norm, 6-dp
    lockstep rounding (prefix *p* lets the deflated second-component
    solve reuse the identical rounds)."""
    return f"""
{p}w{k} AS MATERIALIZED (
  SELECT c.i, sum(c.cov * v.vi) AS wi
  FROM {p}cov c JOIN {p}v{k - 1} v ON v.i = c.j
  GROUP BY 1
),
{p}n{k} AS MATERIALIZED (SELECT sqrt(sum(wi * wi)) AS nrm FROM {p}w{k}),
{p}v{k} AS MATERIALIZED (
  SELECT i, floor(wi / nrm * 1000000 + 0.5) / 1000000 AS vi
  FROM {p}w{k} CROSS JOIN {p}n{k}
)"""


def _pca_finish_sql(p: str = "p") -> str:
    """Sign fix + eigenvalue for the converged {p}v{iters}."""
    return f"""
{p}sgn AS (
  SELECT CASE WHEN (SELECT vi FROM {p}v{_PCA_ITERS} WHERE i = 1) < 0
              THEN -1.0 ELSE 1.0 END AS s
),
{p}fin AS MATERIALIZED (
  SELECT i, vi * s AS vi FROM {p}v{_PCA_ITERS} CROSS JOIN {p}sgn
),
{p}wf AS (
  SELECT c.i, sum(c.cov * v.vi) AS wi
  FROM {p}cov c JOIN {p}fin v ON v.i = c.j
  GROUP BY 1
),
{p}eig AS (SELECT sum(v.vi * w.wi) AS eig FROM {p}fin v JOIN {p}wf w USING (i))"""


_PCA_POWER_SQL = (
    _PCA_COV_SQL
    + """,
pv0 AS (
  SELECT j AS i,
         1.0 / sqrt(CAST((SELECT count(*) FROM pmean) AS DOUBLE)) AS vi
  FROM pmean
),"""
    + ",".join(_pca_round_sql(k) for k in range(1, _PCA_ITERS + 1))
    + ","
    + _pca_finish_sql("p")
)


# deflated second-component solve: qcov = pcov − λ₁·(v₁ᵢ·v₁ⱼ) with the
# ROUNDED λ₁/v₁ (exactly what pca_fit2 deflates with), then the same
# unrolled rounds under prefix q
_PCA_POWER2_SQL = (
    _PCA_POWER_SQL
    + """,
peig6 AS (SELECT floor(eig * 1000000 + 0.5) / 1000000 AS e FROM peig),
qcov AS MATERIALIZED (
  SELECT c.i, c.j, c.cov - (SELECT e FROM peig6) * (a.vi * b.vi) AS cov
  FROM pcov c
  JOIN pfin a ON a.i = c.i
  JOIN pfin b ON b.i = c.j
),
qv0 AS (
  SELECT j AS i,
         1.0 / sqrt(CAST((SELECT count(*) FROM pmean) AS DOUBLE)) AS vi
  FROM pmean
),"""
    + ",".join(_pca_round_sql(k, "q") for k in range(1, _PCA_ITERS + 1))
    + ","
    + _pca_finish_sql("q")
)


def q_pca_reduce2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D PCA reduction: dominant component + Hotelling-deflated
    second component (deflation uses the ROUNDED λ₁/v₁ so the
    oracle's qcov is built from bit-identical inputs), both projected
    in one narrow pass."""
    from etl_finance_pipeline_spark.operators.pca import (
        pca_fit2,
        pca_project_multi,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    comps, _eigs, means = pca_fit2(emb, iters=_PCA_ITERS)
    out = pca_project_multi(emb, comps, means=means)
    return out.select(
        "vec_id", _pr("pc1", 6).alias("pc1"), _pr("pc2", 6).alias("pc2")
    )


SQL_PCA_REDUCE2 = f"""
WITH {_PCA_POWER2_SQL}
SELECT p.vec_id,
       floor(sum((p.xi - m.mean_j) * f1.vi) * 1000000 + 0.5) / 1000000 AS pc1,
       floor(sum((p.xi - m.mean_j) * f2.vi) * 1000000 + 0.5) / 1000000 AS pc2
FROM px p
JOIN pmean m ON m.j = p.i
JOIN pfin f1 ON f1.i = p.i
JOIN qfin f2 ON f2.i = p.i
GROUP BY p.vec_id
"""


SQL_EMBEDDING_COVARIANCE = f"""
WITH {_PCA_COV_SQL}
SELECT i, j, floor(cov * 1000000 + 0.5) / 1000000 AS cov FROM pcov
"""


SQL_PCA_TOP_COMPONENT = f"""
WITH {_PCA_POWER_SQL}
SELECT CAST(i AS INT) AS i, vi AS loading,
       floor(eig * 1000000 + 0.5) / 1000000 AS eigenvalue
FROM pfin CROSS JOIN peig
"""


SQL_PCA_PROJECT = f"""
WITH {_PCA_POWER_SQL}
SELECT p.vec_id,
       floor(sum((p.xi - m.mean_j) * f.vi) * 1000000 + 0.5) / 1000000
         AS score
FROM px p
JOIN pmean m ON m.j = p.i
JOIN pfin f ON f.i = p.i
GROUP BY p.vec_id
"""


_PCAO_K = 50


def q_pca_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruction-residual embedding outliers: fit top-2 PCA
    (lockstep power iteration + rounded Hotelling deflation), then
    score every vector by the centered energy the two components
    cannot explain — ‖x−μ‖² − pc1² − pc2² — and keep the top 50 by
    (rounded residual, id). The anomaly detector a curation pipeline
    points at corrupt or off-distribution embeddings. The oracle
    extends the pca_reduce2 CTE chain with the residual energy."""
    from etl_finance_pipeline_spark.operators.pca import pca_fit2, pca_outliers

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    comps, _eigs, means = pca_fit2(emb, iters=_PCA_ITERS)
    return pca_outliers(emb, comps, means, k=_PCAO_K)


SQL_PCA_OUTLIERS = f"""
WITH {_PCA_POWER2_SQL},
pores AS (
  SELECT p.vec_id,
         floor(sum((p.xi - m.mean_j) * f1.vi) * 1000000 + 0.5) / 1000000 AS pc1,
         floor(sum((p.xi - m.mean_j) * f2.vi) * 1000000 + 0.5) / 1000000 AS pc2,
         floor((sum((p.xi - m.mean_j) * (p.xi - m.mean_j))
                - pow(sum((p.xi - m.mean_j) * f1.vi), 2)
                - pow(sum((p.xi - m.mean_j) * f2.vi), 2))
               * 1000000 + 0.5) / 1000000 AS residual
  FROM px p
  JOIN pmean m ON m.j = p.i
  JOIN pfin f1 ON f1.i = p.i
  JOIN qfin f2 ON f2.i = p.i
  GROUP BY p.vec_id
)
SELECT vec_id, pc1, pc2, residual FROM pores
ORDER BY residual DESC, vec_id
LIMIT {_PCAO_K}
"""


# --------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023 data selection)
# --------------------------------------------------------------------

_DSIR_B = 64
_DSIR_K = 50


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR log importance weights of the whole corpus toward the
    English subset as target: hashed unigram+bigram bag-of-buckets
    models, Laplace-smoothed, log-ratio summed per doc. Counts are
    exact ints; the per-doc sum of O(1)-magnitude log ratios rounds
    at 6 dp."""
    from etl_finance_pipeline_spark.operators.dsir import dsir_weights

    docs = _docs_spread(spark, sf_dir)
    target = docs.filter(F.col("lang") == "en")
    return dsir_weights(docs, target, n_buckets=_DSIR_B)


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-k selection by (logw, doc_id) — planned as
    TakeOrderedAndProject, never a global sort."""
    from etl_finance_pipeline_spark.operators.dsir import (
        dsir_select,
        dsir_weights,
    )

    docs = _docs_spread(spark, sf_dir)
    target = docs.filter(F.col("lang") == "en")
    return dsir_select(dsir_weights(docs, target, n_buckets=_DSIR_B), _DSIR_K)


_DSIR_BASE_SQL = f"""
dst AS (
  SELECT doc_id, lang,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
dsg AS (
  SELECT doc_id, lang,
         unnest(toks || CASE WHEN len(toks) >= 2
           THEN list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])
           ELSE []::VARCHAR[] END) AS gram
  FROM dst
),
dsb AS MATERIALIZED (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT) % {_DSIR_B}
           AS bucket
  FROM dsg
),
dall AS (SELECT unnest(generate_series(0, {_DSIR_B} - 1)) AS bucket),
dtb AS (
  SELECT dall.bucket, coalesce(c.c, 0) AS c
  FROM dall LEFT JOIN (
    SELECT bucket, CAST(count(*) AS BIGINT) AS c
    FROM dsb WHERE lang = 'en' GROUP BY 1
  ) c USING (bucket)
),
drb AS (
  SELECT dall.bucket, coalesce(c.c, 0) AS c
  FROM dall LEFT JOIN (
    SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM dsb GROUP BY 1
  ) c USING (bucket)
),
dtn AS (SELECT sum(c) AS n FROM dtb),
drn AS (SELECT sum(c) AS n FROM drb),
dratio AS MATERIALIZED (
  SELECT dtb.bucket,
         ln(CAST(dtb.c + 1 AS DOUBLE) / CAST((SELECT n FROM dtn) + {_DSIR_B} AS DOUBLE))
         - ln(CAST(drb.c + 1 AS DOUBLE) / CAST((SELECT n FROM drn) + {_DSIR_B} AS DOUBLE))
           AS logratio
  FROM dtb JOIN drb USING (bucket)
),
dsw AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         floor(sum(logratio) * 1000000 + 0.5) / 1000000 AS logw
  FROM dsb JOIN dratio USING (bucket)
  GROUP BY doc_id
)"""


SQL_DSIR_WEIGHTS = f"""
WITH {_DSIR_BASE_SQL}
SELECT doc_id, n_grams, logw FROM dsw
"""


SQL_DSIR_SELECT = f"""
WITH {_DSIR_BASE_SQL}
SELECT doc_id, n_grams, logw FROM dsw
ORDER BY logw DESC, doc_id ASC
LIMIT {_DSIR_K}
"""


# --------------------------------------------------------------------
# C4 cleaning pass (line heuristics + doc-level drops)
# --------------------------------------------------------------------

def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning over the fixture corpus: 3-word pseudo-lines (the
    corpus carries no newlines), >=3-words line rule (drops the short
    tail line), terminal-punctuation rule OFF (the synthetic corpus
    has no punctuation — the rule lane is pytest-covered on realistic
    text), brace/lorem-ipsum doc drops, >=5 surviving lines floor.
    Exact string/boolean compare, no rounding contract."""
    from etl_finance_pipeline_spark.operators.corpus import c4_clean

    docs = load_table(spark, _t(sf_dir, "documents"))
    return c4_clean(
        docs,
        words_per_line=_LD_K,
        min_words=_LD_K,
        require_terminal=False,
        min_kept_lines=5,
        joiner=" ",
    )


SQL_C4_CLEAN = f"""
WITH {_LD_SEG_SQL},
c4k AS (
  SELECT doc_id, pos, line FROM ldseg
  WHERE len(regexp_split_to_array(trim(line), '\\s+')) >= {_LD_K}
),
c4t AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines FROM ldseg GROUP BY 1),
c4f AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_lines,
         string_agg(line, ' ' ORDER BY pos) AS clean
  FROM c4k GROUP BY 1
),
c4r AS (
  SELECT d.doc_id,
         coalesce(c4t.n_lines, 0) AS n_lines,
         coalesce(c4f.kept_lines, 0) AS kept_lines,
         c4f.clean,
         CASE
           WHEN position('{{' IN lower(d.text)) > 0 THEN 'bad_substring'
           WHEN position('lorem ipsum' IN lower(d.text)) > 0 THEN 'bad_substring'
           WHEN coalesce(c4f.kept_lines, 0) < 5 THEN 'too_few_lines'
           ELSE 'kept'
         END AS drop_reason
  FROM documents d
  LEFT JOIN c4t ON c4t.doc_id = d.doc_id
  LEFT JOIN c4f ON c4f.doc_id = d.doc_id
)
SELECT doc_id, n_lines, kept_lines,
       (drop_reason != 'kept') AS c4_drop,
       drop_reason,
       CASE WHEN drop_reason = 'kept' THEN clean END AS text
FROM c4r
"""


def q_incremental_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-batch boilerplate removal vs a standing corpus: docs
    with doc_id % 10 == 0 arrive as the batch, the rest stand; any
    3-word pseudo-line already present in the standing corpus is
    dropped from the batch. The corpus is touched once (batch line
    set broadcast), then reassembly."""
    from etl_finance_pipeline_spark.operators.corpus import (
        incremental_line_dedup,
        reassemble_lines,
        segment_lines,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    standing = docs.filter(F.col("doc_id") % 10 != 0)
    kept = incremental_line_dedup(
        segment_lines(batch, words_per_line=_LD_K),
        segment_lines(standing, words_per_line=_LD_K),
        min_docs=1,
    )
    return reassemble_lines(kept, joiner=" ")


SQL_INCREMENTAL_LINE_DEDUP = f"""
WITH {_LD_SEG_SQL},
ilb AS (SELECT * FROM ldseg WHERE doc_id % 10 = 0),
ils AS (
  SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS cdf
  FROM ldseg WHERE doc_id % 10 != 0
  GROUP BY 1
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       string_agg(line, ' ' ORDER BY pos) AS text
FROM ilb LEFT JOIN ils USING (line)
WHERE coalesce(cdf, 0) < 1
GROUP BY doc_id
"""


# --------------------------------------------------------------------
# Gopher quality rules
# --------------------------------------------------------------------

def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The seven Gopher (Rae et al. 2021) pre-filter rules per doc —
    all-integer counts plus two exact-rational ratios; the 6-dp
    portable rounding covers the two doubles, the rule booleans are
    compared exactly."""
    from etl_finance_pipeline_spark.operators.text_analysis import gopher_rules

    docs = load_table(spark, _t(sf_dir, "documents"))
    out = gopher_rules(docs)
    return out.select(
        "doc_id",
        "n_words",
        _pr("mean_word_len", 6).alias("mean_word_len"),
        _pr("symbol_ratio", 6).alias("symbol_ratio"),
        "n_lines",
        "bullet_lines",
        "ellipsis_lines",
        "alpha_words",
        "stop_types",
        "rule_word_count",
        "rule_mean_word_len",
        "rule_symbol_ratio",
        "rule_bullet_lines",
        "rule_ellipsis_lines",
        "rule_alpha_words",
        "rule_stopwords",
        "gopher_pass",
    )


SQL_GOPHER_QUALITY = r"""
WITH gq AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\s+') AS toks,
         string_split(text, chr(10)) AS lines,
         text
  FROM documents
),
gm AS (
  SELECT doc_id,
    len(toks) AS n_words,
    list_sum(list_transform(toks, t -> CAST(len(t) AS DOUBLE))) / len(toks)
      AS mean_word_len,
    (len(text) - len(replace(text, '#', ''))
     + (len(text) - len(replace(text, '...', ''))) / 3
     + (len(text) - len(replace(text, chr(8230), ''))))
      * 1.0 / len(toks) AS symbol_ratio,
    len(lines) AS n_lines,
    len(list_filter(lines, l -> regexp_matches(ltrim(l), '^[-*' || chr(8226) || ']')))
      AS bullet_lines,
    len(list_filter(lines, l -> regexp_matches(rtrim(l), '(\.\.\.|' || chr(8230) || ')$')))
      AS ellipsis_lines,
    len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS alpha_words,
    len(list_intersect(list_distinct(toks),
        ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']))
      AS stop_types
  FROM gq
)
SELECT doc_id,
  CAST(n_words AS BIGINT) AS n_words,
  floor(mean_word_len * 1000000 + 0.5) / 1000000 AS mean_word_len,
  floor(symbol_ratio * 1000000 + 0.5) / 1000000 AS symbol_ratio,
  CAST(n_lines AS BIGINT) AS n_lines,
  CAST(bullet_lines AS BIGINT) AS bullet_lines,
  CAST(ellipsis_lines AS BIGINT) AS ellipsis_lines,
  CAST(alpha_words AS BIGINT) AS alpha_words,
  CAST(stop_types AS BIGINT) AS stop_types,
  (n_words >= 50 AND n_words <= 100000) AS rule_word_count,
  (mean_word_len >= 3 AND mean_word_len <= 10) AS rule_mean_word_len,
  (symbol_ratio <= 0.1) AS rule_symbol_ratio,
  (bullet_lines <= 0.9 * n_lines) AS rule_bullet_lines,
  (ellipsis_lines <= 0.3 * n_lines) AS rule_ellipsis_lines,
  (alpha_words >= 0.8 * n_words) AS rule_alpha_words,
  (stop_types >= 2) AS rule_stopwords,
  ((n_words >= 50 AND n_words <= 100000)
   AND (mean_word_len >= 3 AND mean_word_len <= 10)
   AND (symbol_ratio <= 0.1)
   AND (bullet_lines <= 0.9 * n_lines)
   AND (ellipsis_lines <= 0.3 * n_lines)
   AND (alpha_words >= 0.8 * n_words)
   AND (stop_types >= 2)) AS gopher_pass
FROM gm
"""


def q_stream_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher rules as a STREAMING pre-filter: a file-stream over
    the documents table through the same narrow gopher_rules map
    (stateless → append mode, no watermark needed), keeping only
    passing docs. Proves the quality lane runs unchanged under
    Structured Streaming; the oracle is the batch rule set."""
    import uuid

    from etl_finance_pipeline_spark.operators.text_analysis import gopher_rules
    from etl_finance_pipeline_spark.sources.tables import ensure_nanos_conf

    spark = _narrow_session(spark, 8)
    ensure_nanos_conf(spark)
    path = _t(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path[:-1] + "[t]")
    # the fixture's 31-word vocab carries one Gopher stopword, so the
    # full 7-rule AND is vacuously empty here — the stream filters on
    # the four structural rules (the full conjunction is exercised by
    # the batch gopher_quality query + pytest)
    passed = (
        gopher_rules(stream)
        .filter(
            F.col("rule_word_count")
            & F.col("rule_mean_word_len")
            & F.col("rule_symbol_ratio")
            & F.col("rule_alpha_words")
        )
        .select("doc_id", "n_words", "stop_types")
    )
    name = f"stream_quality_{uuid.uuid4().hex[:8]}"
    q = (
        passed.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.table(name)


SQL_STREAM_QUALITY_FILTER = f"""
SELECT doc_id, n_words, stop_types
FROM ({SQL_GOPHER_QUALITY})
WHERE rule_word_count AND rule_mean_word_len
  AND rule_symbol_ratio AND rule_alpha_words
"""


# --------------------------------------------------------------------
# Kneser-Ney bigram LM: train + perplexity scoring (CCNet-style)
# --------------------------------------------------------------------

_KN_D = 0.75


def q_kn_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM trained on the corpus —
    every formula input is an exact int64 count (bigram count,
    left-context total, N1+ fan-outs, distinct-type total), so the
    oracle's identically-associated expression reproduces the same
    IEEE doubles before the shared 6-dp portable rounding."""
    from etl_finance_pipeline_spark.operators.ngram_lm import kn_bigram_lm

    docs = load_table(spark, _t(sf_dir, "documents"))
    return kn_bigram_lm(docs, discount=_KN_D)


_KN_BASE_SQL = r"""
kntok AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents
),
knbig AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM (
    SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
    FROM kntok WHERE len(toks) >= 2
  )
),
knbc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM knbig GROUP BY 1, 2
),
knl AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS nl
  FROM knbc GROUP BY 1
),
knr AS (SELECT w2, CAST(count(*) AS BIGINT) AS nr FROM knbc GROUP BY 1),
knt AS (SELECT CAST(count(*) AS BIGINT) AS bt FROM knbc),
knlm AS (
  SELECT knbc.w1, knbc.w2, c12, c1, nl, nr, bt,
         (c12 - 0.75) / c1 + ((0.75 * nl) / c1) * (nr / CAST(bt AS DOUBLE))
           AS p
  FROM knbc
  JOIN knl ON knl.w1 = knbc.w1
  JOIN knr ON knr.w2 = knbc.w2
  CROSS JOIN knt
)"""


SQL_KN_BIGRAM_LM = f"""
WITH {_KN_BASE_SQL}
SELECT w1, w2, c12, c1, nl, nr,
       floor(p * 1000000 + 0.5) / 1000000 AS prob
FROM knlm
"""


def q_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram perplexity under the corpus's own KN
    model (the CCNet quality-bucketing signal). Probabilities stay
    unrounded through the log2 average; only the two per-doc outputs
    round. AVG() summation order differs across engines but the
    doc-level sums are O(10) magnitudes with O(1e-15) reorder noise —
    far under the 6-dp rounding granularity."""
    from etl_finance_pipeline_spark.operators.ngram_lm import kn_perplexity

    docs = load_table(spark, _t(sf_dir, "documents"))
    return kn_perplexity(docs, discount=_KN_D)


SQL_KN_PERPLEXITY = f"""
WITH {_KN_BASE_SQL}
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       floor(avg(log2(p)) * 1000000 + 0.5) / 1000000 AS avg_logprob,
       floor(pow(2.0, -avg(log2(p))) * 1000000 + 0.5) / 1000000 AS ppl
FROM knbig
JOIN knlm USING (w1, w2)
GROUP BY doc_id
"""


# --------------------------------------------------------------------
# Streaming DSIR scoring (standing model, stateless stream)
# --------------------------------------------------------------------

def q_stream_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR scoring as an INGEST-TIME stream: the log-ratio model fits
    once on the standing batch corpus, collapses to a 64-double
    literal, and the document stream scores itself with a fully
    NARROW expression (per-gram map lookup + in-array sum) — no
    state, no watermark, append mode. Same rounded outputs as the
    batch dsir_weights, so the two lanes share one oracle."""
    import uuid

    from etl_finance_pipeline_spark.functions.scalar import (
        portable_hash64,
        portable_round,
    )
    from etl_finance_pipeline_spark.functions.text import tokens
    from etl_finance_pipeline_spark.operators.dsir import dsir_log_ratio
    from etl_finance_pipeline_spark.sources.tables import ensure_nanos_conf

    spark = _narrow_session(spark, 8)
    ensure_nanos_conf(spark)
    docs = _docs_spread(spark, sf_dir)
    target = docs.filter(F.col("lang") == "en")

    ratio_rows = dsir_log_ratio(docs, target, n_buckets=_DSIR_B).withColumnRenamed(
        "_logratio", "lr"
    ).collect()
    lr = [0.0] * _DSIR_B
    for r in ratio_rows:
        lr[r["bucket"]] = r["lr"]
    lr_lit = F.array(*[F.lit(float(x)) for x in lr])

    path = _t(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path[:-1] + "[t]")
    # the per-gram hash/lookup map is CPU-bound and the blob file
    # source is one scan task: spread the stateless append chain
    # across the session width (the stream_curation_route device)
    stream = stream.repartition(_stream_fanout_width(spark, cap=8))
    toked = stream.select("doc_id", tokens("text").alias("_toks"))
    n = F.size(F.col("_toks"))
    length = F.greatest(n - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(F.col("_toks"), 1, length),
        F.slice(F.col("_toks"), 2, length),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    grams = F.concat(F.col("_toks"), bigrams)
    per_gram = F.transform(
        grams,
        lambda g: F.element_at(
            lr_lit, (portable_hash64(g) % _DSIR_B + 1).cast("int")
        ),
    )
    scored = toked.select(
        "doc_id",
        F.size(grams).cast("long").alias("n_grams"),
        portable_round(
            F.aggregate(per_gram, F.lit(0.0), lambda a, v: a + v), 6
        ).alias("logw"),
    )
    name = f"stream_dsir_{uuid.uuid4().hex[:8]}"
    q = (
        scored.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.table(name)


# --------------------------------------------------------------------
# Embedding standardization (per-dim z-score)
# --------------------------------------------------------------------

def q_embed_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score every embedding with moments fitted from the
    covariance diagonal (std = sqrt(var), zero-variance dims clamp to
    1); moments ride as broadcast literals, the scaling pass is
    narrow."""
    import math

    from etl_finance_pipeline_spark.operators.pca import (
        embed_standardize,
        embedding_covariance,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    rows = embedding_covariance(emb).collect()
    diag = sorted((r for r in rows if r["i"] == r["j"]), key=lambda r: r["i"])
    means = [r["mean_i"] for r in diag]
    stds = [math.sqrt(max(r["cov"], 0.0)) for r in diag]
    z = embed_standardize(emb, means, stds)
    # long form for the hash gate (array cells don't sort in pandas)
    return z.select(
        "vec_id", F.posexplode("zvec").alias("i", "z")
    ).select("vec_id", (F.col("i") + 1).cast("int").alias("i"), "z")


SQL_EMBED_STANDARDIZE = f"""
WITH {_PCA_COV_SQL},
zstat AS (
  SELECT i, mean_j AS m,
         CASE WHEN cov > 0 THEN sqrt(cov) ELSE 1.0 END AS s
  FROM pcov JOIN pmean ON pmean.j = pcov.j
  WHERE pcov.i = pcov.j
)
SELECT p.vec_id, CAST(p.i AS INT) AS i,
       floor((p.xi - z.m) / z.s * 1000000 + 0.5) / 1000000 AS z
FROM px p JOIN zstat z ON z.i = p.i
"""


# --------------------------------------------------------------------
# RAG retrieval composite: chunk -> hashed features -> sparse cosine
# --------------------------------------------------------------------

_RAG_QUERY = "table scan fast value window row"
_RAG_DIM = 64
_RAG_K = 10


def q_rag_retrieve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end retrieval: overlapping 200-char chunks, hashing-
    trick chunk features (nothing to fit or broadcast but the query),
    sparse long-form cosine against a literal query string, top-10 by
    (cosine, chunk) — the RAG indexing pipeline with every stage an
    existing operator. The dot product joins ONLY on the query's
    feature buckets (broadcast, bucket-count rows); chunk norms are
    one map-side-combinable agg."""
    from etl_finance_pipeline_spark.operators.corpus import (
        chunk_documents,
        feature_hash,
    )

    docs = _docs_spread(spark, sf_dir)
    chunks = chunk_documents(docs, chunk_chars=200, overlap=50).select(
        (F.col("doc_id") * 100 + F.col("chunk_id")).alias("cid"),
        "chunk_text",
    )
    cf = feature_hash(
        chunks, id_col="cid", text_col="chunk_text", dim=_RAG_DIM
    ).localCheckpoint(eager=True)  # two consumers: dot + norm
    qdf = spark.createDataFrame([(0, _RAG_QUERY)], ["qid", "text"])
    qf = feature_hash(qdf, id_col="qid", text_col="text", dim=_RAG_DIM).select(
        "feature_idx", F.col("feature_val").alias("_qv")
    )
    dots = (
        cf.join(F.broadcast(qf), "feature_idx")
        .groupBy("cid")
        .agg(F.sum(F.col("feature_val") * F.col("_qv")).alias("_dot"))
    )
    cnorm = cf.groupBy("cid").agg(
        F.sqrt(F.sum(F.col("feature_val") * F.col("feature_val"))).alias("_cn")
    )
    qnorm = qf.agg(F.sqrt(F.sum(F.col("_qv") * F.col("_qv"))).alias("_qn"))
    out = (
        dots.join(cnorm, "cid")
        .crossJoin(F.broadcast(qnorm))
        .select(
            F.expr("cid div 100").cast("long").alias("doc_id"),
            (F.col("cid") % 100).cast("long").alias("chunk_id"),
            _pr(F.col("_dot") / (F.col("_cn") * F.col("_qn")), 6).alias(
                "cosine"
            ),
            F.col("cid"),
        )
    )
    return (
        out.orderBy(F.col("cosine").desc(), F.col("cid"))
        .limit(_RAG_K)
        .drop("cid")
    )


SQL_RAG_RETRIEVE = rf"""
WITH rn AS (
  SELECT doc_id, text, length(text) AS len FROM documents
), rc AS (
  SELECT doc_id, text,
         unnest(generate_series(
           0, CAST(floor(greatest((len - 50 + 149) / 150.0, 1)) AS BIGINT) - 1
         )) AS chunk_id
  FROM rn
), rch AS (
  SELECT doc_id * 100 + chunk_id AS cid,
         substr(text, CAST(chunk_id * 150 + 1 AS INT), 200) AS chunk_text
  FROM rc
), rtoks AS (
  SELECT cid, unnest(regexp_split_to_array(lower(trim(chunk_text)), '\s+')) AS w
  FROM rch
), rcf AS MATERIALIZED (
  SELECT cid,
         ('0x' || substr(md5(w), 1, 15))::BIGINT % {_RAG_DIM} AS idx,
         sum(CASE WHEN ('0x' || substr(md5(w), 16, 15))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END) AS val
  FROM rtoks GROUP BY 1, 2
), rqt AS (
  SELECT unnest(regexp_split_to_array(lower(trim('{_RAG_QUERY}')), '\s+')) AS w
), rqf AS MATERIALIZED (
  SELECT ('0x' || substr(md5(w), 1, 15))::BIGINT % {_RAG_DIM} AS idx,
         sum(CASE WHEN ('0x' || substr(md5(w), 16, 15))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END) AS qv
  FROM rqt GROUP BY 1
), rdot AS (
  SELECT cid, sum(val * qv) AS dot
  FROM rcf JOIN rqf USING (idx) GROUP BY 1
), rcn AS (
  SELECT cid, sqrt(sum(val * val)) AS cn FROM rcf GROUP BY 1
), rqn AS (SELECT sqrt(sum(qv * qv)) AS qn FROM rqf)
SELECT CAST(cid // 100 AS BIGINT) AS doc_id,
       CAST(cid % 100 AS BIGINT) AS chunk_id,
       floor(dot / (cn * qn) * 1000000 + 0.5) / 1000000 AS cosine
FROM rdot JOIN rcn USING (cid) CROSS JOIN rqn
ORDER BY cosine DESC, cid
LIMIT {_RAG_K}
"""


# --------------------------------------------------------------------
# Unicode text normalization
# --------------------------------------------------------------------

def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization chain (quotes/dashes/ellipsis/exotic
    spaces/controls/whitespace) — the fixture corpus is ASCII-clean,
    so the query first seeds deterministic unicode noise via
    translate ('a'→NBSP, 'e'→curly quote) and then proves the
    normalizer folds it back; exact string compare."""
    from etl_finance_pipeline_spark.operators.corpus import normalize_text

    docs = load_table(spark, _t(sf_dir, "documents"))
    noisy = docs.select(
        "doc_id", F.translate("text", "ae", " ’").alias("text")
    )
    out = normalize_text(noisy)
    return out.select("doc_id", "n_chars_before", "n_chars_after", "text_norm")


def _norm_sql_expr(col: str) -> str:
    from etl_finance_pipeline_spark.operators.corpus import TEXT_NORM_RULES

    e = col
    for pat, rep in TEXT_NORM_RULES:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        e = f"regexp_replace({e}, '{p}', '{r}', 'g')"
    return f"trim({e})"


SQL_NORMALIZE_TEXT = f"""
WITH noisy AS (
  SELECT doc_id,
         translate(text, 'ae', chr(160) || chr(8217)) AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(text) AS BIGINT) AS n_chars_before,
       CAST(len({_norm_sql_expr("text")}) AS BIGINT) AS n_chars_after,
       {_norm_sql_expr("text")} AS text_norm
FROM noisy
"""


# --------------------------------------------------------------------
# Source-overlap matrix (which data sources duplicate each other)
# --------------------------------------------------------------------

def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise shingle-set Jaccard between SOURCES — the
    curation question 'which feeds are re-crawls of each other'.
    One distinct (source, shingle-hash) frame, one self-join keyed by
    the 60-bit shingle hash (hot boilerplate shingles fan out at most
    |sources|² per key), per-pair exact Jaccard. Sources are a
    dim-sized key set; the corpus is touched once."""
    from etl_finance_pipeline_spark.functions.scalar import portable_hash64
    from etl_finance_pipeline_spark.functions.text import tokens, word_shingles

    docs = _docs_spread(spark, sf_dir)
    toked = docs.select("source", tokens("text").alias("_toks"))
    sh = toked.select(
        "source",
        F.explode(word_shingles(F.col("_toks"), 3)).alias("_sh"),
    ).select("source", portable_hash64(F.col("_sh")).alias("h"))
    sets = sh.distinct()
    sizes = sets.groupBy("source").agg(F.count("*").alias("n"))
    a = sets.select(F.col("source").alias("source_a"), "h")
    b = sets.select(F.col("source").alias("source_b"), "h")
    inter = (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_common"))
    )
    na = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("_na"))
    nb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("_nb"))
    out = inter.join(F.broadcast(na), "source_a").join(F.broadcast(nb), "source_b")
    jac = F.col("n_common") / (F.col("_na") + F.col("_nb") - F.col("n_common"))
    return out.select(
        "source_a",
        "source_b",
        F.col("n_common").cast("long").alias("n_common"),
        _pr(jac, 6).alias("jaccard"),
    )


SQL_SOURCE_OVERLAP = r"""
WITH sot AS (
  SELECT source, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents
),
sosh AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h
  FROM (
    SELECT source,
           unnest(CASE WHEN len(toks) >= 3
             THEN list_transform(generate_series(1, len(toks) - 2),
                                 i -> array_to_string(toks[i:i+2], ' '))
             ELSE []::VARCHAR[] END) AS sh
    FROM sot
  )
),
sosz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sosh GROUP BY 1),
soint AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM sosh a JOIN sosh b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_common,
       floor(n_common / CAST(na.n + nb.n - n_common AS DOUBLE) * 1000000 + 0.5)
         / 1000000 AS jaccard
FROM soint
JOIN sosz na ON na.source = soint.source_a
JOIN sosz nb ON nb.source = soint.source_b
"""


# --------------------------------------------------------------------
# Hard-negative mining (contrastive pair mining)
# --------------------------------------------------------------------

def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 hardest negatives (most-similar different-label vectors)
    for the first 20 anchors — the in-batch miner for contrastive
    embedding training. Anchors broadcast, corpus streams, label
    filter prunes before the per-anchor top-k window."""
    from etl_finance_pipeline_spark.operators.similarity import (
        hard_negative_topk,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    anchors = emb.filter(F.col("vec_id") < 20)
    return hard_negative_topk(emb, anchors, k=3).select(
        "anchor_id", "negative_id", "cosine", F.col("rank").cast("long").alias("rank")
    )


SQL_HARD_NEGATIVES = """
WITH a AS (
  SELECT vec_id AS anchor_id, embedding AS av, label AS alabel
  FROM embeddings WHERE vec_id < 20
), pairs AS (
  SELECT a.anchor_id, e.vec_id AS negative_id,
         floor((
           list_sum(list_transform(list_zip(a.av, e.embedding),
                                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(a.av, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) * 1000000 + 0.5) / 1000000 AS cosine
  FROM a, embeddings e
  WHERE e.label != a.alabel
)
SELECT anchor_id, negative_id, cosine,
       CAST(row_number() OVER (PARTITION BY anchor_id ORDER BY cosine DESC, negative_id) AS BIGINT) AS rank
FROM pairs
QUALIFY rank <= 3
"""


# --------------------------------------------------------------------
# Probe evaluation: exact ROC-AUC (Mann-Whitney, average ranks)
# --------------------------------------------------------------------

_AUC_ITERS = 2
_AUC_LR = 0.1


def q_probe_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the linear probe (2 lockstep GD steps), score every
    embedding (6-dp-rounded so tie groups are engine-independent),
    and report the exact ROC-AUC of the score against the binarized
    label (positive = label >= 5) — the standard eval for a
    quality-scorer head."""
    from etl_finance_pipeline_spark.operators.mlprep import (
        binary_auc,
        linear_probe_score,
        linear_probe_train,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    w, b = linear_probe_train(emb, lr=_AUC_LR, iters=_AUC_ITERS)
    scored = linear_probe_score(emb, w, b).select(
        _pr("probe_score", 6).alias("probe_score"),
        (F.col("label") >= 5).cast("int").alias("label"),
    )
    return binary_auc(scored)


SQL_PROBE_AUC = f"""
WITH {_linprobe_sql(64, _AUC_ITERS, _AUC_LR)},
aucsc AS (
  SELECT floor((list_sum(list_transform(
           list_zip(CAST(e.embedding AS DOUBLE[]),
                    (SELECT list(w ORDER BY pos) FROM w{_AUC_ITERS})),
           z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
           + (SELECT b FROM b{_AUC_ITERS})) * 1000000 + 0.5) / 1000000 AS s,
         CASE WHEN e.label >= 5 THEN 1 ELSE 0 END AS y
  FROM embeddings e
),
aucg AS (
  SELECT s, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS np
  FROM aucsc GROUP BY s
),
aucr AS (
  SELECT n, np,
         CAST(sum(n) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS DOUBLE)
           + (n + 1) / 2.0 AS rank_avg
  FROM aucg
),
auca AS (
  SELECT sum(n) AS tot, sum(np) AS p, sum(np * rank_avg) AS spos FROM aucr
)
SELECT CAST(tot AS BIGINT) AS n,
       CAST(p AS BIGINT) AS n_pos,
       CAST(tot - p AS BIGINT) AS n_neg,
       floor((spos - CAST(p AS DOUBLE) * (CAST(p AS DOUBLE) + 1) / 2.0)
             / (CAST(p AS DOUBLE) * CAST(tot - p AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS auc
FROM auca
"""


# --------------------------------------------------------------------
# fastText-style hashed-text quality classifier (Joulin et al. 2016)
# --------------------------------------------------------------------

_FT_DIM = 32
_FT_ITERS = 3
_FT_LR = 0.1
_FT_K = 200


def q_fasttext_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style text classifier (Joulin et al. 2016 — the
    standard CCNet/LLaMA curation gate): a linear head over
    mean-pooled hashing-trick bag-of-words features, trained
    IN-ENGINE by 3 lockstep GD steps on the binarized language label
    (en vs rest) and then scoring the whole corpus with a broadcast
    weight row. Features are stateless (nothing to fit or look up),
    so the lane is one corpus featurize pass + vocab-free GD — the
    text-feature twin of the embeddings linear probe. The oracle
    replays featurization and the unrolled GD rounds exactly."""
    from etl_finance_pipeline_spark.operators.mlprep import (
        hashed_text_features,
        linear_probe_score,
        linear_probe_train,
    )

    docs = _docs_spread(spark, sf_dir)
    # feats feeds every GD pass AND the final scoring projection —
    # materialize once (the featurize explode is the corpus-scale
    # cost; the frame itself is docs × dim doubles)
    feats = hashed_text_features(docs, dim=_FT_DIM).localCheckpoint(
        eager=True
    )
    labels = docs.select(
        "doc_id", (F.col("lang") == "en").cast("double").alias("_y")
    )
    train = feats.join(labels, "doc_id")
    w, b = linear_probe_train(
        train, vec_col="features", label_col="_y", lr=_FT_LR, iters=_FT_ITERS
    )
    scored = linear_probe_score(
        feats, w, b, vec_col="features", out_col="fasttext_score"
    )
    return scored.join(labels, "doc_id").select(
        "doc_id",
        F.col("_y").cast("long").alias("label"),
        _pr("fasttext_score", 6).alias("fasttext_score"),
    )


def _ft_feats_sql() -> str:
    """Featurize CTEs → ``fsrc(doc_id, y, x)``: mean-pooled signed
    hash buckets over whitespace tokens, mirroring
    mlprep.hashed_text_features + the en-vs-rest label."""
    return rf"""
fttoks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
  FROM documents
),
ftbk AS MATERIALIZED (
  SELECT doc_id,
         ('0x' || substr(md5(w), 1, 15))::BIGINT % {_FT_DIM} AS idx,
         CAST(sum(CASE WHEN ('0x' || substr(md5(w), 16, 15))::BIGINT % 2 = 0
                       THEN 1 ELSE -1 END) AS DOUBLE) AS val,
         count(*) AS c
  FROM fttoks GROUP BY 1, 2
),
ftnt AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS nt FROM ftbk GROUP BY 1),
ftgrid AS (SELECT doc_id, nt, unnest(range(0, {_FT_DIM})) AS pos FROM ftnt),
fsrc AS MATERIALIZED (
  SELECT g.doc_id,
         CASE WHEN any_value(d.lang) = 'en' THEN 1.0 ELSE 0.0 END AS y,
         list(coalesce(b.val, 0.0) / g.nt ORDER BY g.pos) AS x
  FROM ftgrid g
  LEFT JOIN ftbk b ON b.doc_id = g.doc_id AND b.idx = g.pos
  JOIN documents d ON d.doc_id = g.doc_id
  GROUP BY g.doc_id
)"""


def _ft_gd_sql(iters: int) -> str:
    """Unrolled full-batch GD over ``fsrc`` mirroring
    mlprep.linear_probe_train (zero init, 6-dp per-step rounding).
    Every reused CTE is MATERIALIZED — the chained w{i}/p{i} frames
    otherwise expand exponentially when inlined."""
    dim, lr = _FT_DIM, _FT_LR
    parts = [
        f"""ftn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM fsrc),
fw0 AS MATERIALIZED (SELECT pos, 0.0 AS w FROM UNNEST(range(1, {dim} + 1)) AS t(pos)),
fb0 AS MATERIALIZED (SELECT 0.0 AS b)"""
    ]
    for i in range(iters):
        parts.append(
            f"""fp{i} AS MATERIALIZED (
  SELECT e.y, e.x,
         list_sum(list_transform(
           list_zip(e.x, (SELECT list(w ORDER BY pos) FROM fw{i})),
           z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
           + (SELECT b FROM fb{i}) AS pred
  FROM fsrc e
),
fg{i} AS (
  SELECT pos, sum((pred - y) * x[pos]) AS g
  FROM fp{i}, UNNEST(range(1, {dim} + 1)) AS t(pos)
  GROUP BY pos
),
fgb{i} AS (SELECT sum(pred - y) AS gb FROM fp{i}),
fw{i + 1} AS MATERIALIZED (
  SELECT w.pos,
         floor((w.w - {lr} * 2.0 / (SELECT n FROM ftn) * g.g) * 1000000 + 0.5) / 1000000 AS w
  FROM fw{i} w JOIN fg{i} g USING (pos)
),
fb{i + 1} AS MATERIALIZED (
  SELECT floor((b.b - {lr} * 2.0 / (SELECT n FROM ftn) * gb.gb) * 1000000 + 0.5) / 1000000 AS b
  FROM fb{i} b, fgb{i} gb
)"""
        )
    return ",\n".join(parts)


SQL_FASTTEXT_PROBE = f"""
WITH {_ft_feats_sql().strip()},
{_ft_gd_sql(_FT_ITERS)}
SELECT e.doc_id, CAST(e.y AS BIGINT) AS label,
       floor((list_sum(list_transform(
         list_zip(e.x, (SELECT list(w ORDER BY pos) FROM fw{_FT_ITERS})),
         z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
         + (SELECT b FROM fb{_FT_ITERS})) * 1000000 + 0.5) / 1000000
         AS fasttext_score
FROM fsrc e
"""

SQL_FASTTEXT_SELECT = f"""
WITH {_ft_feats_sql().strip()},
{_ft_gd_sql(_FT_ITERS)},
ftsel AS (
  SELECT e.doc_id,
         floor((list_sum(list_transform(
           list_zip(e.x, (SELECT list(w ORDER BY pos) FROM fw{_FT_ITERS})),
           z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
           + (SELECT b FROM fb{_FT_ITERS})) * 1000000 + 0.5) / 1000000
           AS fasttext_score
  FROM fsrc e
)
SELECT doc_id, fasttext_score FROM ftsel
ORDER BY fasttext_score DESC, doc_id
LIMIT {_FT_K}
"""

#: the streaming lane emits the SAME rounded outputs as the batch probe
SQL_STREAM_FASTTEXT_SCORE = SQL_FASTTEXT_PROBE


def q_doremi_proxy_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture SENSITIVITY to the excess-loss proxy — the ann_recall
    two-families device applied to DoReMi: run the identical EG
    rounds under (a) the unigram-surprisal proxy and (b) the fastText
    probe's squared-error loss (how badly the trained quality probe
    predicts each source's label — a different model family's view of
    source difficulty), and emit both weight vectors under one hash.
    If the learned mixes diverge, the mixture is proxy-driven, not
    corpus-driven — the pre-deployment readout a DoReMi run owes its
    operators. Both per-source means use the order-independent
    fixed-point device; both EG lanes are the same one-row array
    fold."""
    docs = _docs_spread(spark, sf_dir)
    # Overlap the two INDEPENDENT lanes (r14, guide §2.6): the probe
    # lane is a serial driver GD loop (featurize checkpoint + 3 one-row
    # aggregates) during which the cluster idles, and the surprisal
    # lane is one corpus aggregate — materialize the (k-source) EG
    # frame in a sibling thread while the probe trains. Intra-query
    # only; both lanes compute exactly what they did serially.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_wa = pool.submit(
            lambda: _doremi_eg(_doremi_src_loss(docs)).localCheckpoint(
                eager=True
            )
        )
        f_prob = pool.submit(q_fasttext_probe, spark, sf_dir)
        wa = f_wa.result()
        prob = f_prob.result()
    d = F.col("fasttext_score") - F.col("label")
    sq = prob.select("doc_id", _pr(d * d, 6).alias("_e"))
    srcb = (
        sq.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(
                F.floor(F.col("_e") * 1_000_000 + F.lit(0.5)).cast("long")
            ).alias("_s6"),
        )
        .select(
            "source",
            "n_docs",
            (
                F.floor(F.col("_s6") / F.col("n_docs") + F.lit(0.5))
                / 1_000_000
            ).alias("loss"),
        )
    )
    wb = _doremi_eg(srcb)
    return wa.select(
        "source",
        "n_docs",
        F.col("loss").alias("loss_surprisal"),
        F.col("weight").alias("weight_surprisal"),
    ).join(
        wb.select(
            "source",
            F.col("loss").alias("loss_probe"),
            F.col("weight").alias("weight_probe"),
        ),
        "source",
    )


SQL_DOREMI_PROXY_COMPARE = f"""
WITH {_dm_loss_ctes("pa")},
{_dm_eg_ctes("pa", "pasrc")},
paw AS ({_dm_final_select("pa")}),
pbsq AS (
  SELECT p.doc_id,
         floor((p.fasttext_score - p.label) * (p.fasttext_score - p.label)
               * 1000000 + 0.5) / 1000000 AS e
  FROM ({SQL_FASTTEXT_PROBE.strip()}) p
),
pbsrc AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         floor(sum(CAST(floor(e * 1000000 + 0.5) AS BIGINT))
               / CAST(count(*) AS DOUBLE) + 0.5) / 1000000 AS loss
  FROM pbsq JOIN documents d USING (doc_id) GROUP BY 1
),
{_dm_eg_ctes("pb", "pbsrc")},
pbw AS ({_dm_final_select("pb")})
SELECT a.source, a.n_docs,
       a.loss AS loss_surprisal, a.weight AS weight_surprisal,
       b.loss AS loss_probe, b.weight AS weight_probe
FROM paw a JOIN pbw b USING (source)
"""



def q_fasttext_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deploy the trained text probe as a SELECTION gate: top-200
    documents by (rounded score, doc_id) — the CCNet/LLaMA 'keep the
    most target-like' curation step; plans as TakeOrderedAndProject,
    never a global sort (the dsir_select device)."""
    from etl_finance_pipeline_spark.operators.mlprep import (
        hashed_text_features,
        linear_probe_score,
        linear_probe_train,
    )

    docs = _docs_spread(spark, sf_dir)
    feats = hashed_text_features(docs, dim=_FT_DIM).localCheckpoint(
        eager=True
    )
    labels = docs.select(
        "doc_id", (F.col("lang") == "en").cast("double").alias("_y")
    )
    w, b = linear_probe_train(
        feats.join(labels, "doc_id"),
        vec_col="features",
        label_col="_y",
        lr=_FT_LR,
        iters=_FT_ITERS,
    )
    scored = linear_probe_score(
        feats, w, b, vec_col="features", out_col="fasttext_score"
    ).select("doc_id", _pr("fasttext_score", 6).alias("fasttext_score"))
    return scored.orderBy(
        F.col("fasttext_score").desc(), F.col("doc_id")
    ).limit(_FT_K)


def q_stream_fasttext_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained text classifier deployed on the INGEST STREAM: the
    head fits once on the standing batch corpus, collapses to a
    dim-double literal, and each streaming document scores itself
    with a fully NARROW expression — signed token counts grouped by
    bucket in-array, divided by the token count, then dotted with the
    weight literal in bucket order, the EXACT floating-point
    evaluation order of the batch featurizer + probe (not merely
    algebraically equal), so the rounded outputs match bitwise. No
    state, no watermark, append mode; the two lanes share one
    oracle."""
    import uuid

    from etl_finance_pipeline_spark.functions.text import tokens
    from etl_finance_pipeline_spark.operators.mlprep import (
        hashed_text_features,
        linear_probe_train,
    )
    from etl_finance_pipeline_spark.operators.sketch import hash_word
    from etl_finance_pipeline_spark.sources.tables import ensure_nanos_conf

    spark = _narrow_session(spark, 8)
    ensure_nanos_conf(spark)
    docs = _docs_spread(spark, sf_dir)
    feats = hashed_text_features(docs, dim=_FT_DIM)
    labels = docs.select(
        "doc_id", (F.col("lang") == "en").cast("double").alias("_y")
    )
    # linear_probe_train makes iters+2 passes over its input; without
    # a cut each pass re-runs the corpus featurize (the batch lane
    # checkpoints for the same reason — this was the stream lane's
    # whole +2.5 s bench regression in round 9)
    train = feats.join(labels, "doc_id").localCheckpoint(eager=True)
    w, b = linear_probe_train(
        train,
        vec_col="features",
        label_col="_y",
        lr=_FT_LR,
        iters=_FT_ITERS,
    )
    w_lit = F.array(*[F.lit(float(x)) for x in w])

    path = _t(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path[:-1] + "[t]")
    toks = tokens("text")
    # sign from h2's low bit — the exact feature_hash contract
    sign = lambda t: F.when(  # noqa: E731
        hash_word(t, 16) % 2 == 0, F.lit(1.0)
    ).otherwise(F.lit(-1.0))

    # replicate the BATCH lane's floating-point evaluation order
    # bitwise, not just algebraically: hashed_text_features sums signed
    # counts PER BUCKET (integer-valued — exact in any order), divides
    # each bucket by the token count, and linear_probe_score folds
    # x[pos]·w[pos] left-to-right over pos. A flat per-token weight sum
    # is equal only in exact arithmetic; a different summation order
    # can land on the other side of a 6-dp rounding boundary and
    # hash-mismatch the shared oracle.
    #
    # ONE pass over the tokens: (bucket, sign) is materialized per
    # token by the aggregate's input transform (md5 evaluated twice
    # per token, not per (token, position) — a per-position aggregate
    # array costs dim× the hashing and benched 3× slower), then the
    # fold scatters each signed unit into a dim-wide running count
    # array. Signed counts are exact integers in any order, so only
    # the final bucket-order dot product carries FP-order semantics.
    pairs = F.transform(
        toks,
        lambda t: F.struct(
            (hash_word(t, 1) % _FT_DIM).cast("int").alias("b"),
            sign(t).alias("s"),
        ),
    )
    # scatter via concat(prefix, bumped element, suffix): three
    # intrinsic array ops per token instead of a dim-wide lambda
    # rebuild (32 boxed lambda evals per token measured ~+3 s on the
    # 5k-row stream)
    counts = F.aggregate(
        pairs,
        F.array_repeat(F.lit(0.0), _FT_DIM),
        lambda acc, x: F.concat(
            F.slice(acc, 1, x["b"]),
            F.array(F.element_at(acc, x["b"] + 1) + x["s"]),
            F.slice(acc, x["b"] + 2, F.lit(_FT_DIM - 1) - x["b"]),
        ),
    )
    x_arr = F.transform(counts, lambda c: c / F.size(toks))
    score = (
        F.aggregate(
            F.zip_with(x_arr, w_lit, lambda x, wi: x * wi),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        + F.lit(float(b))
    )
    # fan out the stateless microbatch before the scoring projection
    # (r14 — same §2.5 device as stream_link/html/warc_extract): the
    # file source reads the fixture as 1-2 tasks, so the per-token
    # fold/scatter expression otherwise runs serially. Legal in append
    # mode with no state store; no-op cost at real input widths.
    scored = (
        stream.filter(F.size(toks) > 0)
        .repartition(_stream_fanout_width(spark))
        .select(
            "doc_id",
            (F.col("lang") == "en").cast("long").alias("label"),
            _pr(score, 6).alias("fasttext_score"),
        )
    )
    name = f"stream_ft_{uuid.uuid4().hex[:8]}"
    q = (
        scored.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.table(name)


def q_fasttext_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the fastText-style text probe against its
    training label — the eval composition (same as probe_auc for the
    embeddings head). Scores rounded to 6 dp BEFORE ranking so tie
    groups are engine-independent."""
    from etl_finance_pipeline_spark.operators.mlprep import (
        binary_auc,
        hashed_text_features,
        linear_probe_score,
        linear_probe_train,
    )

    docs = _docs_spread(spark, sf_dir)
    feats = hashed_text_features(docs, dim=_FT_DIM).localCheckpoint(
        eager=True
    )
    labels = docs.select(
        "doc_id", (F.col("lang") == "en").cast("double").alias("_y")
    )
    train = feats.join(labels, "doc_id")
    w, b = linear_probe_train(
        train, vec_col="features", label_col="_y", lr=_FT_LR, iters=_FT_ITERS
    )
    scored = (
        linear_probe_score(feats, w, b, vec_col="features")
        .join(labels, "doc_id")
        .select(
            _pr("probe_score", 6).alias("probe_score"),
            F.col("_y").cast("int").alias("label"),
        )
    )
    return binary_auc(scored)


SQL_FASTTEXT_AUC = f"""
WITH {_ft_feats_sql().strip()},
{_ft_gd_sql(_FT_ITERS)},
ftsc AS (
  SELECT floor((list_sum(list_transform(
           list_zip(e.x, (SELECT list(w ORDER BY pos) FROM fw{_FT_ITERS})),
           z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
           + (SELECT b FROM fb{_FT_ITERS})) * 1000000 + 0.5) / 1000000 AS s,
         CAST(e.y AS INT) AS y
  FROM fsrc e
),
ftg AS (
  SELECT s, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS np
  FROM ftsc GROUP BY s
),
ftr AS (
  SELECT n, np,
         CAST(sum(n) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS DOUBLE)
           + (n + 1) / 2.0 AS rank_avg
  FROM ftg
),
fta AS (
  SELECT sum(n) AS tot, sum(np) AS p, sum(np * rank_avg) AS spos FROM ftr
)
SELECT CAST(tot AS BIGINT) AS n,
       CAST(p AS BIGINT) AS n_pos,
       CAST(tot - p AS BIGINT) AS n_neg,
       floor((spos - CAST(p AS DOUBLE) * (CAST(p AS DOUBLE) + 1) / 2.0)
             / (CAST(p AS DOUBLE) * CAST(tot - p AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS auc
FROM fta
"""


# --------------------------------------------------------------------
# LSH recall/precision vs exact ground truth (sketch eval)
# --------------------------------------------------------------------

_LSHR_T = 0.5


def q_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/precision of the MinHash-LSH near-dup detector against
    the EXACT n-gram-Jaccard ground truth at the same threshold — the
    eval every sketch deployment owes its operators before trusting
    banded candidates at scale. Truth = exact pairs with jaccard ≥
    0.5; predicted = banded candidates with estimated jaccard ≥ 0.5;
    one full-outer pair join → a single counts row."""
    from etl_finance_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = _docs_spread(spark, sf_dir)
    truth = ngram_jaccard_pairs(docs, threshold=_LSHR_T).select(
        "id_a", "id_b", F.lit(1).alias("_t")
    )
    pred = (
        minhash_lsh_pairs(docs, num_hashes=16, bands=4)
        .filter(F.col("est_jaccard") >= _LSHR_T)
        .select("id_a", "id_b", F.lit(1).alias("_p"))
    )
    j = truth.join(pred, ["id_a", "id_b"], "full")
    # coalesce the outer-join flags to 0 BEFORE aggregating: with zero
    # overlap (or an empty side) a bare sum(_t * _p) is NULL while the
    # oracle's CASE-based 0/1 flags sum to 0 — the counts must agree
    # on the empty-intersection edge case too
    t0 = F.coalesce(F.col("_t"), F.lit(0))
    p0 = F.coalesce(F.col("_p"), F.lit(0))
    agg = j.agg(
        F.sum(t0).alias("_nt"),
        F.sum(p0).alias("_np"),
        F.sum(t0 * p0).alias("_nh"),
    )
    return agg.select(
        F.col("_nt").cast("long").alias("n_truth"),
        F.col("_np").cast("long").alias("n_pred"),
        F.col("_nh").cast("long").alias("n_hit"),
        _pr(F.col("_nh") / F.col("_nt"), 6).alias("recall"),
        _pr(F.col("_nh") / F.col("_np"), 6).alias("precision"),
    )


SQL_LSH_RECALL = f"""
WITH {_SHINGLES_CTE.strip()},
{_SIG_CTE.strip()},
lrbands AS (
  {_BANDS_SQL}
),
lrcand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM lrbands a JOIN lrbands b USING (band, k1, k2, k3, k4)
  WHERE a.doc_id < b.doc_id
),
lrpred AS (
  SELECT c.id_a, c.id_b
  FROM lrcand c
  JOIN sig a ON a.doc_id = c.id_a
  JOIN sig b ON b.doc_id = c.id_b
  WHERE ({_EQ_TERMS}) / 16.0 >= {_LSHR_T}
),
lrsizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
lrinter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
lrtruth AS (
  SELECT id_a, id_b
  FROM lrinter
  JOIN lrsizes na ON na.doc_id = id_a
  JOIN lrsizes nb ON nb.doc_id = id_b
  WHERE c * 1.0 / (na.n + nb.n - c) >= {_LSHR_T}
),
lrj AS (
  SELECT coalesce(t.id_a, p.id_a) AS id_a,
         CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END AS tt,
         CASE WHEN p.id_a IS NOT NULL THEN 1 ELSE 0 END AS pp
  FROM lrtruth t FULL OUTER JOIN lrpred p
    ON t.id_a = p.id_a AND t.id_b = p.id_b
)
SELECT CAST(sum(tt) AS BIGINT) AS n_truth,
       CAST(sum(pp) AS BIGINT) AS n_pred,
       CAST(sum(tt * pp) AS BIGINT) AS n_hit,
       floor(sum(tt * pp) * 1.0 / sum(tt) * 1000000 + 0.5) / 1000000 AS recall,
       floor(sum(tt * pp) * 1.0 / sum(pp) * 1000000 + 0.5) / 1000000 AS precision
FROM lrj
"""


# --------------------------------------------------------------------
# Language-ID confusion matrix (labeled vs predicted)
# --------------------------------------------------------------------

def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the n-gram language identifier against the
    fixture's labeled lang — the eval that tells a curation pipeline
    whether its lang filter is dropping the wrong languages."""
    docs = load_table(spark, _t(sf_dir, "documents"))
    out = language_id(docs)
    return out.groupBy(
        F.col("lang").alias("labeled_lang"), F.col("pred_lang")
    ).agg(F.count("*").cast("long").alias("n"))


SQL_LANGID_CONFUSION = f"""
WITH tokd AS (
  SELECT doc_id, lang, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
scored AS (
  SELECT doc_id, lang,
    {_LANG_SCORES}
  FROM tokd
)
SELECT lang AS labeled_lang,
       {_PRED_CHAIN} AS pred_lang,
       CAST(count(*) AS BIGINT) AS n
FROM scored
GROUP BY 1, 2
"""


# --------------------------------------------------------------------
# Gopher n-gram repetition signals (top-/duplicate-n-gram fractions)
# --------------------------------------------------------------------

_REP_N = 3


def q_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher's within-document n-gram repetition family (Rae et al.
    2021 Table A1): per doc, the token fraction claimed by the most
    frequent 3-gram and the fraction of token positions covered by
    ANY duplicated 3-gram (position-distinct — overlaps never double
    count). All-integer counts through the ratios."""
    from etl_finance_pipeline_spark.operators.text_analysis import (
        ngram_repetition_stats,
    )

    docs = _docs_spread(spark, sf_dir)
    return ngram_repetition_stats(docs, n=_REP_N)


SQL_NGRAM_REPETITION = rf"""
WITH rtok AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents
),
rgrams AS (
  SELECT doc_id, len(toks) AS nt, i AS pos,
         array_to_string(toks[i:i+{_REP_N - 1}], ' ') AS g
  FROM (
    SELECT doc_id, toks,
           unnest(generate_series(1, len(toks) - {_REP_N} + 1)) AS i
    FROM rtok WHERE len(toks) >= {_REP_N}
  )
),
rcnt AS (
  SELECT doc_id, g, count(*) AS c, any_value(nt) AS nt
  FROM rgrams GROUP BY 1, 2
),
rtop AS (
  SELECT doc_id, nt, g AS top_ngram, c AS top_count FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY c DESC, g
    ) AS r FROM rcnt
  ) WHERE r = 1
),
rcov AS (
  SELECT rg.doc_id, count(DISTINCT cp) AS cov
  FROM rgrams rg
  JOIN rcnt rc ON rc.doc_id = rg.doc_id AND rc.g = rg.g AND rc.c > 1,
  UNNEST(generate_series(rg.pos, rg.pos + {_REP_N} - 1)) AS t(cp)
  GROUP BY 1
)
SELECT t.doc_id,
       CAST(t.nt AS BIGINT) AS n_tokens,
       t.top_ngram,
       CAST(t.top_count AS BIGINT) AS top_count,
       floor(least(t.top_count * {_REP_N}.0 / t.nt, 1.0) * 1000000 + 0.5)
         / 1000000 AS top_ngram_frac,
       floor(coalesce(c.cov, 0) * 1.0 / t.nt * 1000000 + 0.5)
         / 1000000 AS dup_ngram_frac
FROM rtop t LEFT JOIN rcov c USING (doc_id)
"""


_REP_TOP_MAX = 0.20
_REP_DUP_MAX = 0.60


def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher repetition thresholds as a KEEP/DROP gate (Rae et
    al. 2021 Table A1 shape: drop when the top 3-gram claims too much
    of the document or duplicated 3-grams cover too much of it) —
    the enforcement composition over ngram_repetition's signals.
    Output: per-doc signals + the keep verdict."""
    from etl_finance_pipeline_spark.operators.text_analysis import (
        ngram_repetition_stats,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    rep = ngram_repetition_stats(docs, n=_REP_N)
    return rep.select(
        "doc_id",
        "top_ngram_frac",
        "dup_ngram_frac",
        (
            (F.col("top_ngram_frac") <= _REP_TOP_MAX)
            & (F.col("dup_ngram_frac") <= _REP_DUP_MAX)
        ).alias("keep"),
    )


SQL_REPETITION_FILTER = f"""
WITH reps AS ({SQL_NGRAM_REPETITION.strip()})
SELECT doc_id, top_ngram_frac, dup_ngram_frac,
       (top_ngram_frac <= {_REP_TOP_MAX} AND dup_ngram_frac <= {_REP_DUP_MAX})
         AS keep
FROM reps
"""


# --------------------------------------------------------------------
# Per-source token-distribution KL divergence (mixture diagnostics)
# --------------------------------------------------------------------

def q_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(P_source ‖ P_corpus) over unigram token frequencies — the
    DoReMi-style mixture diagnostic: which sources' token
    distributions sit farthest from the mixture. One (source, token)
    aggregate; everything after is vocabulary-sized."""
    from etl_finance_pipeline_spark.operators.corpus import source_token_kl

    docs = load_table(spark, _t(sf_dir, "documents"))
    return source_token_kl(docs)


SQL_SOURCE_KL = r"""
WITH ktok AS (
  SELECT source AS grp,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
  FROM documents
),
kper AS (SELECT grp, w, count(*) AS c FROM ktok GROUP BY 1, 2),
kcorp AS (SELECT w, sum(c) AS cq FROM kper GROUP BY 1),
ktot AS (SELECT grp, sum(c) AS tp, count(*) AS types FROM kper GROUP BY 1),
kgrand AS (SELECT sum(cq) AS tq FROM kcorp)
SELECT p.grp AS source,
       CAST(any_value(t.tp) AS BIGINT) AS n_tokens,
       CAST(any_value(t.types) AS BIGINT) AS n_types,
       floor(sum((p.c / CAST(t.tp AS DOUBLE))
                 * ln((p.c / CAST(t.tp AS DOUBLE))
                      / (q.cq / CAST(g.tq AS DOUBLE)))) * 1000000 + 0.5)
         / 1000000 AS kl
FROM kper p
JOIN kcorp q USING (w)
JOIN ktot t ON t.grp = p.grp
CROSS JOIN kgrand g
GROUP BY p.grp
"""


# --------------------------------------------------------------------
# Vocabulary coverage / Zipf fit / packing efficiency diagnostics
# --------------------------------------------------------------------

_VOC_MIN = 5


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OOV cost of a min-count-5 vocabulary cutoff —
    the diagnostic a vocab build runs before committing to a size."""
    from etl_finance_pipeline_spark.operators.corpus import vocab_coverage

    docs = load_table(spark, _t(sf_dir, "documents"))
    return vocab_coverage(docs, min_count=_VOC_MIN)


SQL_VOCAB_COVERAGE = rf"""
WITH vtok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
  FROM documents
),
vcnt AS (SELECT w, count(*) AS c FROM vtok GROUP BY 1)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN c < {_VOC_MIN} THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       floor(sum(CASE WHEN c < {_VOC_MIN} THEN 1 ELSE 0 END) * 1.0 / count(*)
             * 1000000 + 0.5) / 1000000 AS oov_frac
FROM vtok JOIN vcnt USING (w)
GROUP BY doc_id
"""


_ZIPF_MIN = 2
_ZIPF_TOPN = 100_000


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency least-squares fit over the HEAD of the
    corpus unigram distribution (min_count ≥ 2 drops the hapax tail
    upstream of any sort; top-N plans as TakeOrderedAndProject) —
    natural text sits near slope ≈ −1; template/boilerplate corpora
    flatten or steepen it."""
    from etl_finance_pipeline_spark.operators.text_analysis import zipf_fit

    docs = load_table(spark, _t(sf_dir, "documents"))
    return zipf_fit(docs, min_count=_ZIPF_MIN, top_n=_ZIPF_TOPN)


SQL_ZIPF_FIT = rf"""
WITH ztok AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
  FROM documents
),
zcnt AS (
  SELECT w, count(*) AS c FROM ztok GROUP BY 1
  HAVING count(*) >= {_ZIPF_MIN}
),
zrn AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rn FROM zcnt
),
zpts AS (
  SELECT c, ln(CAST(rn AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
  FROM zrn WHERE rn <= {_ZIPF_TOPN}
),
zagg AS (
  SELECT count(*) AS n, sum(c) AS tok, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM zpts
)
SELECT CAST(n AS BIGINT) AS n_fit_types,
       CAST(tok AS BIGINT) AS n_fit_tokens,
       floor(((sxy - sx * sy / n) / (sxx - sx * sx / n)) * 1000000 + 0.5)
         / 1000000 AS slope,
       floor(((sy - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx) / n)
             * 1000000 + 0.5) / 1000000 AS intercept
FROM zagg
"""


def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard packing efficiency, BOTH layouts side by side: the
    concat-and-split layout (documents straddle boundaries — maximal
    fill by construction) vs first-fit-decreasing bins (documents
    never split — the fill fraction is the price paid for document
    integrity). Token mass, sequences/bins produced, and fill
    fraction per (layout, shard) — the batch-prep waste readout that
    justifies choosing one packer over the other."""
    from etl_finance_pipeline_spark.operators.corpus import (
        pack_bins,
        pack_sequences,
    )

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        "doc_id", F.size(F.split(F.col("text"), r"\s+")).alias("n_tokens")
    )
    packed = pack_sequences(docs, seq_tokens=256, num_shards=4)
    agg = packed.groupBy("shard").agg(
        F.count("*").alias("_docs"), F.sum("n_tokens").alias("_tok")
    )
    n_seqs = F.ceil(F.col("_tok") / 256.0).cast("long")
    concat = agg.select(
        F.lit("concat_split").alias("layout"),
        F.col("shard").cast("long").alias("shard"),
        F.col("_docs").cast("long").alias("n_docs"),
        F.col("_tok").cast("long").alias("total_tokens"),
        n_seqs.alias("n_seqs"),
        _pr(F.col("_tok") / (n_seqs * 256.0), 6).alias("fill_frac"),
    )
    binned = pack_bins(docs, seq_tokens=256, num_shards=4)
    bagg = binned.groupBy("shard").agg(
        F.count("*").alias("_docs"),
        F.sum("n_tokens").alias("_tok"),
        (F.max("bin_id") + 1).cast("long").alias("_bins"),
    )
    ffd = bagg.select(
        F.lit("ffd").alias("layout"),
        F.col("shard").cast("long").alias("shard"),
        F.col("_docs").cast("long").alias("n_docs"),
        F.col("_tok").cast("long").alias("total_tokens"),
        F.col("_bins").alias("n_seqs"),
        _pr(F.col("_tok") / (F.col("_bins") * 256.0), 6).alias("fill_frac"),
    )
    return concat.unionByName(ffd)


SQL_PACK_EFFICIENCY = f"""
WITH ptok AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens,
         {_H64.format(s="CAST(doc_id AS VARCHAR)")} % 4 AS shard
  FROM documents
)
SELECT 'concat_split' AS layout,
       CAST(shard AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(ceil(sum(n_tokens) / 256.0) AS BIGINT) AS n_seqs,
       floor(sum(n_tokens) / (ceil(sum(n_tokens) / 256.0) * 256.0)
             * 1000000 + 0.5) / 1000000 AS fill_frac
FROM ptok
GROUP BY shard
UNION ALL
SELECT 'ffd' AS layout,
       CAST(shard AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(max(bin_id) + 1 AS BIGINT) AS n_seqs,
       floor(sum(n_tokens) / ((max(bin_id) + 1) * 256.0)
             * 1000000 + 0.5) / 1000000 AS fill_frac
FROM ({SQL_PACK_BINS.strip()})
GROUP BY shard
"""


# --------------------------------------------------------------------
# Probe-score calibration (reliability bins + ECE)
# --------------------------------------------------------------------

_CAL_BINS = 10
_CAL_LEN = 150  # label: document is "long" (n_chars >= 150)


def q_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the heuristic quality score (already in
    [0,1] — the keep-probability every rule-based curation gate uses)
    against a ground-truth proxy it partially tracks (document length
    ≥ 150 chars): 6-dp-round the score, bin fixed-width, report
    per-bin mass / confidence / accuracy / gap — the
    read-before-you-trust table for a score used as a
    keep-probability. (The embeddings linear probe was measured to
    collapse into a single bin on this fixture — its scores span
    ~0.02 — so the quality score is the calibration subject with real
    spread.)"""
    from etl_finance_pipeline_spark.operators.mlprep import calibration_report

    docs = load_table(spark, _t(sf_dir, "documents"))
    scored = quality_score(docs).select(
        _pr("quality", 6).alias("probe_score"),
        (F.col("n_chars") >= _CAL_LEN).cast("int").alias("label"),
    )
    return calibration_report(scored, n_bins=_CAL_BINS)


_CAL_Q_SQL = f"""
calm AS (
  SELECT doc_id,
    len(toks) AS n_tokens,
    list_sum(list_transform(toks, t -> CAST(len(t) AS DOUBLE))) / len(toks) AS avg_token_len,
    len(list_filter(toks, t -> t IN ({_stop_list('en')}))) * 1.0 / len(toks) AS stopword_ratio,
    len(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / len(text) AS digit_ratio,
    len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0 / len(text) AS punct_ratio,
    len(text) AS n_chars
  FROM (
    SELECT doc_id, text,
           regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
    FROM documents
  )
),
calsc AS (
  SELECT least(greatest(floor((
           (CASE WHEN n_chars >= 50 AND n_chars <= 10000 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN avg_token_len >= 3 AND avg_token_len <= 10 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN stopword_ratio >= 0.05 THEN 0.3 ELSE 0.0 END)
           + (1.0 - least(digit_ratio + punct_ratio, 1.0)) * 0.2
         ) * 1000000 + 0.5) / 1000000, 0.0), 1.0) AS s,
         CASE WHEN n_chars >= {_CAL_LEN} THEN 1.0 ELSE 0.0 END AS y
  FROM calm
),
calg AS (
  SELECT least(CAST(floor(s * {_CAL_BINS}) AS INT), {_CAL_BINS} - 1) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         floor(avg(s) * 1000000 + 0.5) / 1000000 AS mean_score,
         floor(avg(y) * 1000000 + 0.5) / 1000000 AS frac_pos
  FROM calsc GROUP BY 1
)"""


SQL_QUALITY_CALIBRATION = f"""
WITH {_CAL_Q_SQL.strip()}
SELECT bin, n, mean_score, frac_pos,
       floor(abs(mean_score - frac_pos) * 1000000 + 0.5) / 1000000 AS gap
FROM calg
"""


def q_quality_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error of the quality score — the bin-mass-
    weighted mean reliability gap (Naeini et al. 2015), derived from
    the ROUNDED bins so the scalar is engine-portable."""
    from etl_finance_pipeline_spark.operators.mlprep import (
        expected_calibration_error,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    scored = quality_score(docs).select(
        _pr("quality", 6).alias("probe_score"),
        (F.col("n_chars") >= _CAL_LEN).cast("int").alias("label"),
    )
    return expected_calibration_error(scored, n_bins=_CAL_BINS)


SQL_QUALITY_ECE = f"""
WITH {_CAL_Q_SQL.strip()},
calgap AS (
  SELECT n, floor(abs(mean_score - frac_pos) * 1000000 + 0.5) / 1000000 AS gap
  FROM calg
)
SELECT CAST(sum(n) AS BIGINT) AS n,
       CAST({_CAL_BINS} AS INT) AS n_bins,
       floor(sum(n * gap) / sum(n) * 1000000 + 0.5) / 1000000 AS ece
FROM calgap
"""


# --------------------------------------------------------------------
# Cluster-balanced mixture sampling (SemDedup follow-through)
# --------------------------------------------------------------------

_CMIX_K = 8
_CMIX_ITERS = 4
_CMIX_CAP = 0.125
_CMIX_BUDGET = 300


def q_cluster_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced mixture sampling END-TO-END in-engine: train
    the k-means codebook (4 lockstep Lloyd rounds, 6-dp per-iteration
    rounding), assign every embedding to its nearest cell, allocate a
    300-vector budget across cells with a 12.5% share cap and one
    cap-and-redistribute round, and select each cell's allocation by
    portable-hash rank. The oracle unrolls the identical Lloyd rounds
    (the ann_ivf_trained device) and replays assignment, the
    allocation closed form, and the hash-ranked selection."""
    from etl_finance_pipeline_spark.operators.similarity import (
        cluster_balanced_sample,
        train_kmeans_centroids,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    cents = train_kmeans_centroids(
        emb, k=_CMIX_K, iters=_CMIX_ITERS, round_digits=6
    )
    return cluster_balanced_sample(
        emb, cents, budget=_CMIX_BUDGET, cap=_CMIX_CAP
    )


SQL_CLUSTER_MIX = f"""
WITH {_kmeans_sql(k=_CMIX_K, iters=_CMIX_ITERS)},
cmassign AS MATERIALIZED (
  SELECT vec_id, cid AS cluster_id FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_L2_SQL.format(a='e.embedding', b='c.cvec')} ASC, c.cid
           ) AS pr
    FROM embeddings e CROSS JOIN c{_CMIX_ITERS} c
  ) WHERE pr = 1
),
cmn AS (SELECT cluster_id, count(*) AS n FROM cmassign GROUP BY 1),
cmt AS (SELECT sum(n) AS tt FROM cmn),
cms AS (
  SELECT cluster_id, n / CAST(tt AS DOUBLE) AS raw FROM cmn CROSS JOIN cmt
),
cmst AS (
  SELECT sum(least(raw, {_CMIX_CAP})) AS capsum,
         sum(CASE WHEN raw < {_CMIX_CAP} THEN raw ELSE 0.0 END) AS us
  FROM cms
),
cmalloc AS (
  SELECT cluster_id,
         CAST(floor(
           (floor((CASE WHEN raw >= {_CMIX_CAP} THEN {_CMIX_CAP}
                        ELSE raw + (raw / us) * (1.0 - capsum) END)
                  * 1000000 + 0.5) / 1000000) * {_CMIX_BUDGET})
           AS BIGINT) AS alloc
  FROM cms CROSS JOIN cmst
),
cmrank AS (
  SELECT vec_id, cluster_id,
         row_number() OVER (
           PARTITION BY cluster_id
           ORDER BY {_H64.format(s="CAST(vec_id AS VARCHAR) || '#cmix'")}, vec_id
         ) AS cluster_rank
  FROM cmassign
)
SELECT r.vec_id, CAST(r.cluster_id AS INT) AS cluster_id,
       CAST(r.cluster_rank AS BIGINT) AS cluster_rank
FROM cmrank r JOIN cmalloc a USING (cluster_id)
WHERE r.cluster_rank <= a.alloc
"""


def q_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell census of the trained k-means clustering: population,
    mean squared-L2 cohesion, majority label + purity — the
    read-before-you-curate companion to cluster_mix. Oracle unrolls
    the same Lloyd rounds and replays assignment + the label-mode
    window."""
    from etl_finance_pipeline_spark.operators.similarity import (
        cluster_profile,
        train_kmeans_centroids,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    cents = train_kmeans_centroids(
        emb, k=_CMIX_K, iters=_CMIX_ITERS, round_digits=6
    )
    return cluster_profile(emb, cents)


SQL_CLUSTER_PROFILE = f"""
WITH {_kmeans_sql(k=_CMIX_K, iters=_CMIX_ITERS)},
cpassign AS MATERIALIZED (
  SELECT vec_id, label, cid, d2 FROM (
    SELECT e.vec_id, e.label, c.cid,
           {_L2_SQL.format(a='e.embedding', b='c.cvec')} AS d2,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_L2_SQL.format(a='e.embedding', b='c.cvec')} ASC, c.cid
           ) AS pr
    FROM embeddings e CROSS JOIN c{_CMIX_ITERS} c
  ) WHERE pr = 1
),
cpstats AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs,
         floor(avg(d2) * 1000000 + 0.5) / 1000000 AS mean_dist
  FROM cpassign GROUP BY 1
),
cplab AS (
  SELECT cid, label, count(*) AS c FROM cpassign GROUP BY 1, 2
),
cptop AS (
  SELECT cid, label AS top_label, c AS topc FROM (
    SELECT *, row_number() OVER (
      PARTITION BY cid ORDER BY c DESC, label
    ) AS r FROM cplab
  ) WHERE r = 1
)
SELECT CAST(s.cid AS INT) AS cluster_id, s.n_vecs, s.mean_dist,
       CAST(t.top_label AS BIGINT) AS top_label,
       floor(t.topc * 1.0 / s.n_vecs * 1000000 + 0.5) / 1000000
         AS label_purity
FROM cpstats s JOIN cptop t USING (cid)
"""


_PP_FRAC = 0.25  # prototype-prune fraction (per cluster)


def q_prototype_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototypicality pruning (SSL prototypes, Sorscher et al. 2022)
    over the trained k-means lane: per-vector squared-L2 distance to
    its assigned centroid, ranked WITHIN each cluster, with the
    floor(0.25·n) most prototypical (lowest-distance) vectors flagged
    prune — the standard embedding-based data-pruning filter a
    curation run applies after SemDedup. Oracle unrolls the identical
    Lloyd rounds and replays assignment, rounding, and the per-cell
    rank cut."""
    from etl_finance_pipeline_spark.operators.similarity import (
        prototype_prune,
        train_kmeans_centroids,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    cents = train_kmeans_centroids(
        emb, k=_CMIX_K, iters=_CMIX_ITERS, round_digits=6
    )
    return prototype_prune(emb, cents, prune_frac=_PP_FRAC)


_PP_CTES = f"""{_kmeans_sql(k=_CMIX_K, iters=_CMIX_ITERS)},
ppassign AS MATERIALIZED (
  SELECT vec_id, cid, floor(d2 * 1000000 + 0.5) / 1000000 AS proto_dist
  FROM (
    SELECT e.vec_id, c.cid,
           {_L2_SQL.format(a='e.embedding', b='c.cvec')} AS d2,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_L2_SQL.format(a='e.embedding', b='c.cvec')} ASC, c.cid
           ) AS pr
    FROM embeddings e CROSS JOIN c{_CMIX_ITERS} c
  ) WHERE pr = 1
),
pprank AS (
  SELECT vec_id, cid, proto_dist,
         row_number() OVER (
           PARTITION BY cid ORDER BY proto_dist ASC, vec_id
         ) AS proto_rank,
         count(*) OVER (PARTITION BY cid) AS cluster_n
  FROM ppassign
)"""

SQL_PROTOTYPE_PRUNE = f"""
WITH {_PP_CTES}
SELECT vec_id, CAST(cid AS INT) AS cluster_id, proto_dist,
       CAST(cluster_n AS BIGINT) AS cluster_n,
       CAST(proto_rank AS BIGINT) AS proto_rank,
       (proto_rank > floor({_PP_FRAC} * cluster_n)) AS keep
FROM pprank
"""


def q_prototype_prune_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned-fraction-by-source readout of prototype_prune: join the
    keep flags back to the documents catalog (vec_id = doc_id, the
    embeddings-to-documents key) and report per-source volumes and
    the kept fraction — the skew check a curation run reads before
    applying an embedding-level prune corpus-wide."""
    from etl_finance_pipeline_spark.operators.similarity import (
        prototype_prune,
        train_kmeans_centroids,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    docs = load_table(spark, _t(sf_dir, "documents"))
    cents = train_kmeans_centroids(
        emb, k=_CMIX_K, iters=_CMIX_ITERS, round_digits=6
    )
    pp = prototype_prune(emb, cents, prune_frac=_PP_FRAC)
    joined = pp.join(
        docs.select(F.col("doc_id").alias("vec_id"), "source"), "vec_id"
    )
    return joined.groupBy("source").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
        _pr(
            F.sum(F.col("keep").cast("double")) / F.count("*"), 6
        ).alias("kept_frac"),
    )


SQL_PROTOTYPE_PRUNE_CENSUS = f"""
WITH {_PP_CTES},
ppk AS (
  SELECT vec_id, (proto_rank > floor({_PP_FRAC} * cluster_n)) AS keep
  FROM pprank
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN k.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       floor(sum(CASE WHEN k.keep THEN 1.0 ELSE 0.0 END) / count(*)
             * 1000000 + 0.5) / 1000000 AS kept_frac
FROM ppk k JOIN documents d ON d.doc_id = k.vec_id
GROUP BY 1
"""


# --------------------------------------------------------------------
# URL / domain filter stage (RefinedWeb first-stage curation)
# --------------------------------------------------------------------

#: registrable domains dropped by the blocklist query (synthetic
#: equivalent of a UT1/adult blocklist)
_URL_BLOCKLIST = ["src3.com", "src7.com", "src11.com"]


def _url_expr():
    """Deterministic URL-ish string from (source, doc_id) — the
    fixture's ``source`` column carries no URL structure, so the
    synthesis varies scheme presence, a www label, a cdn subdomain,
    an explicit port, letter case, and a path, the exact noise
    :func:`corpus.canonical_host` must strip (same synthesize-from-
    fixture device as the media codec lanes)."""
    d = F.col("doc_id")
    url = F.concat(
        F.element_at(
            F.array(F.lit("https://"), F.lit("http://"), F.lit("")),
            (d % 3 + 1).cast("int"),
        ),
        F.when(d % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.when(d % 4 == 0, F.lit("cdn.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".com"),
        F.when(d % 5 == 0, F.lit(":8443")).otherwise(F.lit("")),
        F.lit("/p/"),
        d.cast("string"),
    )
    return F.when(d % 7 == 0, F.upper(url)).otherwise(url)


def _doc_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, _t(sf_dir, "documents"))
    return docs.select("doc_id", "source", _url_expr().alias("url"))


_URL_CTE = r"""
urls AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN upper(u) ELSE u END AS url
  FROM (
    SELECT doc_id,
           (CASE doc_id % 3 WHEN 0 THEN 'https://' WHEN 1 THEN 'http://' ELSE '' END)
           || (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END)
           || (CASE WHEN doc_id % 4 = 0 THEN 'cdn.' ELSE '' END)
           || source || '.com'
           || (CASE WHEN doc_id % 5 = 0 THEN ':8443' ELSE '' END)
           || '/p/' || CAST(doc_id AS VARCHAR) AS u
    FROM documents
  )
),
hosts AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(lower(trim(url)), '^[a-z][a-z0-9+.\-]*://', ''),
                 '[/?#].*$', ''),
               '^[^@/]*@', ''),
             ':[0-9]+$', ''),
           '^www\.', '') AS host
  FROM urls
),
doms AS (
  SELECT doc_id, host,
         CASE WHEN len(string_split(host, '.')) >= 2
              THEN array_to_string(string_split(host, '.')[len(string_split(host, '.')) - 1:], '.')
              ELSE host END AS domain
  FROM hosts
)"""


#: the canonicalization half (hosts → doms), rebasable onto any CTE
#: exposing (doc_id, url)
_URL_CTE_DOMS = _URL_CTE[_URL_CTE.index("hosts AS") :]


def q_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + registrable-domain blocklist (RefinedWeb
    first stage): lowercase, strip scheme/userinfo/path/port/www, roll
    up to the last-2-label domain, and drop blocklisted domains via a
    broadcast anti-join. The oracle replays the identical anchored
    regex chain — all-string output, no rounding contract."""
    from etl_finance_pipeline_spark.operators.corpus import domain_filter

    urls = _doc_urls(spark, sf_dir)
    out = domain_filter(urls, _URL_BLOCKLIST, url_col="url")
    return out.select("doc_id", "host", "domain")


SQL_DOMAIN_FILTER = f"""
WITH {_URL_CTE.strip()}
SELECT doc_id, host, domain FROM doms
WHERE domain NOT IN ({", ".join(f"'{b}'" for b in _URL_BLOCKLIST)})
"""


def q_stream_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The URL/domain blocklist as a STREAMING ingest filter: a
    file-stream over documents through the same canonicalize +
    broadcast-anti-join lane (stateless stream-static join → append
    mode, no watermark), keeping only unblocked domains — the shape a
    crawl-ingest pipeline actually deploys this in. Oracle = the
    batch blocklist query."""
    import uuid

    from etl_finance_pipeline_spark.operators.corpus import domain_filter
    from etl_finance_pipeline_spark.sources.tables import ensure_nanos_conf

    spark = _narrow_session(spark, 8)
    ensure_nanos_conf(spark)
    path = _t(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(path[:-1] + "[t]")
        .select("doc_id", "source", _url_expr().alias("url"))
    )
    kept = domain_filter(stream, _URL_BLOCKLIST, url_col="url").select(
        "doc_id", "host", "domain"
    )
    name = f"stream_domfilter_{uuid.uuid4().hex[:8]}"
    q = (
        kept.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.table(name)


SQL_STREAM_DOMAIN_FILTER = SQL_DOMAIN_FILTER


def q_stream_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level snapshot dedup ON THE INGEST STREAM — the stateful
    front-door a continuous crawl runs: canonicalize each arriving
    URL (stateless map) and maintain a per-url_key (min doc_id,
    snapshot count) STREAMING AGGREGATE, complete-output to the
    sink. Deliberately an aggregation rather than streaming
    dropDuplicates: drop-dups keeps whichever row a microbatch
    happened to order first (non-deterministic under file-source
    ordering), while min-by-key is exact and replayable — the same
    keep-first contract as the batch lane, so the oracle IS the
    batch oracle. State is one (key → min, count) row per distinct
    URL, the smallest state a dedup can carry."""
    import uuid

    from etl_finance_pipeline_spark.operators.corpus import url_canonicalize
    from etl_finance_pipeline_spark.sources.tables import ensure_nanos_conf

    spark = _narrow_session(spark, _stream_fanout_width(spark, cap=8))
    ensure_nanos_conf(spark)
    path = _t(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(path[:-1] + "[t]")
        .select("doc_id", "source", _crawl_url_expr().alias("url"))
    )
    agg = (
        url_canonicalize(stream)
        .groupBy("url_key")
        .agg(
            F.min("doc_id").cast("long").alias("doc_id"),
            F.count("*").cast("long").alias("n_snapshots"),
        )
    )
    name = f"stream_urldedup_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.table(name)


def q_domain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain census over the canonicalized URLs:
    document volume and distinct-subdomain spread — the profile that
    feeds blocklist review and per-domain caps."""
    from etl_finance_pipeline_spark.operators.corpus import domain_rollup

    urls = _doc_urls(spark, sf_dir)
    return domain_rollup(urls, url_col="url")


SQL_DOMAIN_ROLLUP = f"""
WITH {_URL_CTE.strip()}
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
FROM doms
GROUP BY 1
"""


# --------------------------------------------------------------------
# RefinedWeb-style web-curation funnel (URL → lang → quality → dedup)
# --------------------------------------------------------------------

# --------------------------------------------------------------------
# HTML/markup text extraction (jusText-lite) — curation stage 0
# --------------------------------------------------------------------

def _html_pay_cte(p: str = "hx_pay", src: str = "documents") -> str:
    """``{p}(doc_id, source, lang, html)``: the DuckDB twin of
    synthesize_html over CTE/table *src* (which must expose doc_id,
    source, lang, text)."""
    return f"""{p} AS (
  SELECT doc_id, source, lang,
    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
    || '</title><style>body{{margin:0}}</style><script>var a=1;</script></head><body>'
    || '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/tags">Tags</a></nav>'
    || (CASE doc_id % 3
        WHEN 1 THEN '<script>inline()</script><div class="ad"><a href="/buy">Buy now</a></div>'
        WHEN 2 THEN '<!-- rendered 2026 --><ul><li><a href="/p1">Prev</a></li><li><a href="/p2">Next</a></li></ul>'
        ELSE '<p>Q&amp;A section &lt;closed&gt;</p>' END)
    || '<h1>Latest post</h1><div class="main"><p>' || text
    || '</p></div><div class="share"><a href="/s/tw">Tweet</a> <a href="/s/fb">Share</a></div>'
    || '<div class="partners"><a href="https://src'
    || CAST((doc_id // 20) % (doc_id % 20 + 1) AS VARCHAR)
    || '.com/p/' || CAST(doc_id % 100 AS VARCHAR) || '">Partner</a>'
    || (CASE WHEN doc_id % 5 = 3
        THEN ' <a href="//src' || CAST((doc_id + 1) % 20 AS VARCHAR)
             || '.com/mirror">Mirror</a>' ELSE '' END)
    || (CASE WHEN doc_id % 3 = 0
        THEN ' <a href="local/' || CAST(doc_id % 7 AS VARCHAR)
             || '">Local</a>' ELSE '' END)
    || (CASE WHEN doc_id % 7 = 1
        THEN ' <a href="https://src' || CAST((doc_id * 3 + 5) % 20 AS VARCHAR)
             || '.com/ref" rel="nofollow">Sponsored</a>' ELSE '' END)
    || '</div>'
    || '<footer><a href="/terms">Terms</a> <a href="/privacy">Privacy</a> (c) 2026 example.com</footer></body></html>'
    AS html
  FROM {src}
)"""


# --------------------------------------------------------------------
# URL canonicalization + URL-level dedup (stage −0.5 of the WARC build)
# --------------------------------------------------------------------

def _crawl_url_expr():
    """Crawl-shaped URL from (source, doc_id) with SNAPSHOT structure:
    doc_ids sharing ``doc_id % 100`` are refetches of one logical page
    (every group-invariant noise modulus divides 100 — www %2, cdn %4,
    port %5, and source itself is doc_id %20-derived — while scheme
    %3, whole-URL case %7, fragment, tracking params, percent-case,
    slash noise all vary WITHIN the group). url_canonicalize must
    therefore strip exactly the per-snapshot decoration to recover the
    page identity; anything it under-strips splits a group and the
    url_dedup oracle catches it."""
    d = F.col("doc_id")
    page = d % 100
    kept = (
        F.when(page % 4 == 0, F.concat(F.lit("q="), (page % 9).cast("string")))
        .when(
            page % 4 == 2,
            F.concat(F.lit("z=9&a="), (page % 7).cast("string")),
        )
        .otherwise(F.lit(""))
    )
    trk = (
        F.when(
            d % 3 == 0,
            F.concat(F.lit("utm_source=s"), (d % 4).cast("string")),
        )
        .when(d % 3 == 1, F.concat(F.lit("fbclid=f"), d.cast("string")))
        .otherwise(F.lit(""))
    )
    qraw = (
        F.when((kept == "") & (trk == ""), F.lit(""))
        .when(kept == "", F.concat(F.lit("?"), trk))
        .when(trk == "", F.concat(F.lit("?"), kept))
        .when(d % 7 <= 3, F.concat(F.lit("?"), trk, F.lit("&"), kept))
        .otherwise(F.concat(F.lit("?"), kept, F.lit("&"), trk))
    )
    url = F.concat(
        F.element_at(
            F.array(F.lit("https://"), F.lit("http://"), F.lit("")),
            (d % 3 + 1).cast("int"),
        ),
        F.when(d % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.when(d % 4 == 0, F.lit("cdn.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".com"),
        F.when(d % 5 == 0, F.lit(":8443")).otherwise(F.lit("")),
        F.when(d % 17 == 0, F.lit("//a")).otherwise(F.lit("/a")),
        F.when(d % 11 == 0, F.lit("%2Eb"))
        .when(d % 11 == 1, F.lit("%2eb"))
        .otherwise(F.lit(".b")),
        F.lit("/"),
        page.cast("string"),
        F.when(d % 13 == 0, F.lit("/")).otherwise(F.lit("")),
        qraw,
        F.when(d % 7 == 2, F.concat(F.lit("#s"), d.cast("string"))).otherwise(
            F.lit("")
        ),
    )
    return F.when(d % 7 == 0, F.upper(url)).otherwise(url)


#: DuckDB twin of _crawl_url_expr: ``curl0 → curl1 → curls`` with
#: curls(doc_id, url) over the documents fixture
_CRAWL_URLS_CTE = """curl0 AS (
  SELECT doc_id, source,
    CASE WHEN (doc_id % 100) % 4 = 0
           THEN 'q=' || CAST((doc_id % 100) % 9 AS VARCHAR)
         WHEN (doc_id % 100) % 4 = 2
           THEN 'z=9&a=' || CAST((doc_id % 100) % 7 AS VARCHAR)
         ELSE '' END AS kept,
    CASE doc_id % 3
         WHEN 0 THEN 'utm_source=s' || CAST(doc_id % 4 AS VARCHAR)
         WHEN 1 THEN 'fbclid=f' || CAST(doc_id AS VARCHAR)
         ELSE '' END AS trk
  FROM documents
),
curl1 AS (
  SELECT doc_id, source,
    CASE WHEN kept = '' AND trk = '' THEN ''
         WHEN kept = '' THEN '?' || trk
         WHEN trk = '' THEN '?' || kept
         WHEN doc_id % 7 <= 3 THEN '?' || trk || '&' || kept
         ELSE '?' || kept || '&' || trk END AS qraw
  FROM curl0
),
curls AS (
  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN upper(u) ELSE u END AS url
  FROM (
    SELECT doc_id,
      (CASE doc_id % 3 WHEN 0 THEN 'https://' WHEN 1 THEN 'http://' ELSE '' END)
      || (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END)
      || (CASE WHEN doc_id % 4 = 0 THEN 'cdn.' ELSE '' END)
      || source || '.com'
      || (CASE WHEN doc_id % 5 = 0 THEN ':8443' ELSE '' END)
      || (CASE WHEN doc_id % 17 = 0 THEN '//a' ELSE '/a' END)
      || (CASE doc_id % 11 WHEN 0 THEN '%2Eb' WHEN 1 THEN '%2eb' ELSE '.b' END)
      || '/' || CAST(doc_id % 100 AS VARCHAR)
      || (CASE WHEN doc_id % 13 = 0 THEN '/' ELSE '' END)
      || qraw
      || (CASE WHEN doc_id % 7 = 2 THEN '#s' || CAST(doc_id AS VARCHAR) ELSE '' END)
        AS u
    FROM curl1
  )
)"""


def _url_canon_ctes(rel: str, cols: str, p: str = "uc") -> str:
    """``{p}c1 → … → {p}canon`` CTE chain: the DuckDB twin of
    operators/corpus.py:url_canonicalize over CTE *rel* (which must
    expose *cols* + ``url``). ``{p}canon`` exposes (cols...,
    url_canon, url_key). Replays the identical anchored-regex +
    sorted-param chain; DuckDB regexp_replace needs explicit 'g' where
    Spark replaces all matches."""
    from etl_finance_pipeline_spark.operators.corpus import (
        TRACKING_PARAM_RE,
        _PCT_UNRESERVED,
    )

    pct = "rawpath"
    for enc, dec in _PCT_UNRESERVED:
        pct = f"regexp_replace({pct}, '(?i){enc}', '{dec}', 'g')"
    return f"""{p}c1 AS (
  SELECT {cols},
    lower(regexp_extract(trim(url), '^([a-zA-Z][a-zA-Z0-9+.\\-]*)://', 1)) AS scheme,
    regexp_replace(trim(url), '^[a-zA-Z][a-zA-Z0-9+.\\-]*://', '') AS rest
  FROM {rel}
),
{p}c2 AS (
  SELECT {cols}, scheme,
    regexp_replace(regexp_replace(
      lower(regexp_extract(rest, '^([^/?#]*)', 1)),
      '^[^@/]*@', ''), ':(80|443)$', '') AS host,
    regexp_replace(regexp_replace(rest, '^[^/?#]*', ''), '#.*$', '') AS tail2
  FROM {p}c1
),
{p}c3 AS (
  SELECT {cols}, scheme, host,
    regexp_extract(tail2, '^([^?]*)', 1) AS rawpath,
    regexp_extract(tail2, '\\?(.*)$', 1) AS rawq
  FROM {p}c2
),
{p}c4 AS (
  SELECT {cols}, scheme, host,
    regexp_replace(regexp_replace({pct}, '//+', '/', 'g'), '(.)/$', '\\1')
      AS path0,
    -- array_to_string of an empty list is NULL in DuckDB where
    -- Spark's array_join is '' — hence the coalesce
    coalesce(array_to_string(list_sort(list_filter(string_split(
      regexp_replace(regexp_replace('&' || rawq,
        '(?i)&({TRACKING_PARAM_RE})=[^&]*', '', 'g'), '^&', ''),
      '&'), x -> x <> '')), '&'), '') AS q
  FROM {p}c3
),
{p}canon AS (
  SELECT {cols},
    (CASE WHEN scheme = '' THEN '' ELSE scheme || '://' END)
      || host
      || (CASE WHEN path0 = '' AND host <> '' THEN '/' ELSE path0 END)
      || (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS url_canon,
    lower(regexp_replace(host, '^www\\.', '')
      || (CASE WHEN path0 = '' AND host <> '' THEN '/' ELSE path0 END)
      || (CASE WHEN q = '' THEN '' ELSE '?' || q END)) AS url_key
  FROM {p}c4
)"""


def _sql_host(e: str) -> str:
    """DuckDB twin of operators/corpus.py:canonical_host over SQL
    expression *e*."""
    return (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"regexp_replace(lower(trim({e})), '^[a-z][a-z0-9+.\\-]*://', ''),"
        " '[/?#].*$', ''), '^[^@/]*@', ''), ':[0-9]+$', ''),"
        " '^www\\.', '')"
    )


def _sql_regdom(e: str) -> str:
    """DuckDB twin of operators/corpus.py:registrable_domain (levels=2)
    over host expression *e*."""
    return (
        f"CASE WHEN len(string_split({e}, '.')) >= 2 "
        f"THEN array_to_string(string_split({e}, '.')"
        f"[len(string_split({e}, '.')) - 1:], '.') ELSE {e} END"
    )


def _sql_dot_segments(e: str) -> str:
    """DuckDB twin of operators/corpus.py:_remove_dot_segments over
    path expression *e* (authority/query already split off): the same
    bounded RFC 3986 §5.2.4 rewrite chain — identical patterns, pass
    order, and depth — ending in the same loud ceiling (``error()``)
    for nesting past depth 4."""
    seg = r"(\.[^/.][^/]*|\.\.[^/]+|[^/.][^/]*)"
    p = e
    for _ in range(3):
        p = f"regexp_replace({p}, '/\\./', '/', 'g')"
    p = f"regexp_replace({p}, '/\\.$', '/')"
    for _ in range(4):
        p = f"regexp_replace({p}, '/{seg}/\\.\\./', '/', 'g')"
    for _ in range(2):
        p = f"regexp_replace({p}, '/{seg}/\\.\\.$', '/')"
    for _ in range(3):
        p = f"regexp_replace({p}, '^/\\.\\./', '/')"
    p = f"regexp_replace({p}, '^/\\.\\.$', '/')"
    return (
        f"CASE WHEN regexp_matches({p}, '(^|/)\\.\\.?(/|$)') "
        f"THEN error('dot-segment nesting exceeds depth 4') "
        f"ELSE {p} END"
    )


def _link_extract_ctes(src: str, keys: str = "doc_id", p: str = "lk",
                       html_col: str = "html") -> str:
    """``{p}hr → … → {p}links`` CTE chain: the DuckDB twin of
    operators/corpus.py:link_extract over CTE *src* (which must expose
    *keys* + ``url_canon`` + *html_col*). ``{p}links`` exposes
    (keys..., href, link_url, link_host, link_domain, page_domain,
    is_external) — the identical extract/filter/resolve chain."""
    from etl_finance_pipeline_spark.operators.corpus import HREF_RE

    href_sql = HREF_RE.replace("'", "''")
    return f"""{p}hr AS (
  -- HREF_RE's group carries its quotes (one group serves both quote
  -- styles without backreferences) — strip first/last char, as the
  -- Spark chain does
  SELECT {keys}, url_canon,
         unnest(list_transform(
           regexp_extract_all({html_col}, '{href_sql}', 1),
           x -> substr(x, 2, len(x) - 2))) AS href
  FROM {src}
),
{p}f AS (
  SELECT * FROM {p}hr
  WHERE href <> ''
    AND NOT regexp_matches(href, '^(?i)(javascript:|mailto:|tel:|data:|#)')
),
{p}b AS (
  SELECT {keys}, url_canon, href,
    regexp_extract(url_canon, '^([a-z][a-z0-9+.\\-]*)://', 1) AS scheme,
    regexp_replace(regexp_replace(url_canon,
      '^[a-z][a-z0-9+.\\-]*://', ''), '\\?.*$', '') AS hostpath
  FROM {p}f
),
{p}r AS (
  SELECT {keys}, url_canon, href,
    CASE WHEN regexp_matches(href, '^(?i)[a-z][a-z0-9+.\\-]*://') THEN href
         WHEN href LIKE '//%' THEN
           CASE WHEN scheme = '' THEN href ELSE scheme || ':' || href END
         WHEN href LIKE '?%' THEN
           (CASE WHEN scheme = '' THEN '' ELSE scheme || '://' END)
           || hostpath || href
         WHEN href LIKE '/%' THEN
           (CASE WHEN scheme = '' THEN '' ELSE scheme || '://' END)
           || regexp_extract(hostpath, '^([^/]*)', 1) || href
         ELSE (CASE WHEN scheme = '' THEN '' ELSE scheme || '://' END)
           || regexp_replace(hostpath, '[^/]*$', '') || href
    END AS link_url
  FROM {p}b
),
{p}d AS (
  SELECT {keys}, url_canon, href, link_url,
    regexp_extract(link_url,
      '^([a-z][a-z0-9+.\\-]*://[^/?#]*|//[^/?#]*|[^/?#]*)', 1) AS dhead
  FROM {p}r
),
{p}d2 AS (
  SELECT {keys}, url_canon, href, link_url, dhead,
    regexp_replace(substr(link_url, len(dhead) + 1), '\\?.*$', '') AS dp,
    regexp_extract(substr(link_url, len(dhead) + 1), '(\\?.*)$', 1) AS dq
  FROM {p}d
),
{p}d3 AS (
  -- RFC 3986 §5.2.4 remove_dot_segments, the bounded rewrite chain of
  -- operators/corpus.py:_remove_dot_segments — gated on the href
  -- carrying a dot segment, identical pass order and depth
  SELECT {keys}, url_canon, href,
    CASE WHEN regexp_matches(href, '(^|/)\\.\\.?(/|$)')
      THEN dhead || {_sql_dot_segments("dp")} || dq
      ELSE link_url END AS link_url
  FROM {p}d2
),
{p}o AS (
  SELECT {keys}, href, link_url,
    CASE WHEN link_url LIKE '//%'
         THEN {_sql_host("regexp_replace(link_url, '^//', '')")}
         ELSE {_sql_host('link_url')} END AS link_host,
    {_sql_regdom(_sql_host('url_canon'))} AS page_domain
  FROM {p}d3
),
{p}links AS (
  SELECT {keys}, href, link_url, link_host,
    {_sql_regdom('link_host')} AS link_domain,
    page_domain,
    ({_sql_regdom('link_host')} <> page_domain) AS is_external
  FROM {p}o
)"""


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage −0.5 of crawl curation, the gate that runs before any
    payload is parsed: full-URL canonicalization over snapshot-noised
    crawl URLs — scheme/host case, default ports, fragments,
    duplicate/trailing slashes, RFC 3986 unreserved percent-escapes,
    tracking parameters, and query-parameter order all normalized —
    plus the SURT-style aggressive identity key URL-level dedup
    groups on (operators/corpus.py:url_canonicalize). Exchange-free
    string codegen; the oracle replays the identical rule chain."""
    from etl_finance_pipeline_spark.operators.corpus import url_canonicalize

    docs = load_table(spark, _t(sf_dir, "documents"))
    urls = docs.select("doc_id", "source", _crawl_url_expr().alias("url"))
    return url_canonicalize(urls).select(
        "doc_id", "url", "url_canon", "url_key"
    )


SQL_URL_CANONICALIZE = f"""
WITH {_CRAWL_URLS_CTE},
{_url_canon_ctes("curls", "doc_id, url", "uq")}
SELECT doc_id, url, url_canon, url_key FROM uqcanon
"""


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level exact dedup across crawl snapshots: canonicalize,
    group on the identity key, keep the earliest fetch, count the
    refetches that collapsed into it. The cheapest dedup a crawl
    pipeline runs — at 100 TB it prunes snapshot refetches at
    header-scan cost, before payloads are parsed or content hashed.
    One map-combinable min/count aggregate keyed by url_key."""
    from etl_finance_pipeline_spark.operators.corpus import url_dedup

    docs = load_table(spark, _t(sf_dir, "documents"))
    urls = docs.select("doc_id", "source", _crawl_url_expr().alias("url"))
    return url_dedup(urls)


# the streaming twin shares the batch oracle (defined after both)
SQL_URL_DEDUP = f"""
WITH {_CRAWL_URLS_CTE},
{_url_canon_ctes("curls", "doc_id, url", "uq")}
SELECT url_key,
       CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_snapshots
FROM uqcanon
GROUP BY 1
"""


def _crawl_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized crawl pages, canonicalized and MATERIALIZED
    (``localCheckpoint``) — the shared stage-0 of every batch
    link-graph lane. The fixture-synthesis expression tree (html
    payload + snapshot-noised URL + the full canonicalization chain)
    is large, and each downstream reference re-inlines it through
    CollapseProject: measured 3–7× planning/codegen inflation on the
    link lanes (and the round-12 Janino method-size fallback in
    domain_authority) when left inline. Production reads url_canon /
    html as parquet COLUMNS, so materializing here is fixture-lane
    hygiene, not an operator cost; the frame is document-count-sized
    (tiny at every sf). The streaming twin (stream_link_extract)
    keeps the inline chain — checkpointing is a batch-only device."""
    from etl_finance_pipeline_spark.operators.corpus import (
        synthesize_html,
        url_canonicalize,
    )

    docs = _docs_spread(spark, sf_dir)
    pages = synthesize_html(docs).withColumn("url", _crawl_url_expr())
    return url_canonicalize(pages).localCheckpoint(eager=True)


def q_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink extraction from page markup — the step that turns a
    parsed crawl into a link graph (operators/corpus.py:link_extract):
    every <a href> target pulled from the synthesized pages, resolved
    against the page's canonical URL through all five RFC 3986
    relative shapes (absolute, protocol-relative, query-only,
    root-relative, relative-path) with §5.2.4 dot-segment removal,
    rolled up to registrable target domains, and flagged
    internal/external. Regexp codegen + one explode, no shuffle —
    rides the html_extract scan at 100 TB. The oracle replays the
    identical extract/filter/resolve chain."""
    from etl_finance_pipeline_spark.operators.corpus import link_extract

    out = link_extract(_crawl_pages(spark, sf_dir))
    return out.select(
        "doc_id",
        "href",
        "link_url",
        "link_host",
        "link_domain",
        "page_domain",
        "is_external",
    )


SQL_LINK_EXTRACT = f"""
WITH {_html_pay_cte("lp")},
{_CRAWL_URLS_CTE},
{_url_canon_ctes("curls", "doc_id", "lq")},
lsrc AS (
  SELECT p.doc_id, p.html, c.url_canon
  FROM lp p JOIN lqcanon c USING (doc_id)
),
{_link_extract_ctes("lsrc", "doc_id", "lk")}
SELECT doc_id, href, link_url, link_host, link_domain, page_domain,
       is_external
FROM lklinks
"""


#: epoch seconds of 2026-01-01 00:00:00 UTC — hour-aligned, so the
#: synthesized event times land on clean F.window boundaries
_URL_EV_EPOCH = 1_767_225_600


def q_stream_url_dedup_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-SHAPE twin of stream_url_dedup: WATERMARKED,
    APPEND-mode URL dedup. Each fetch carries a synthesized event
    time (doc_id%360 minutes past a fixed epoch — the crawl's fetch
    timestamp), the aggregate keys on (60-minute event window,
    url_key), and a 30-minute watermark lets the engine EMIT each
    (window, key) row exactly once — when the window closes — and
    DROP its state, instead of complete-mode's re-emit-everything-
    every-trigger. State is bounded by keys-per-open-window, not by
    all keys ever seen: the only shape that survives a continuous
    crawl. The final event-time window (end > max_event − 30 min)
    stays open at end-of-stream and is deliberately NOT emitted —
    the oracle applies the same closed-window cutoff, derived from
    the data. Window starts are emitted as minutes-past-epoch longs
    (tz-proof cross-engine). Determinism note: availableNow loads
    the fixture in one data microbatch (≤ maxFilesPerTrigger files),
    so no row is ever late against a mid-stream watermark; the
    trailing no-data microbatch advances the watermark once, at
    end-of-stream, and flushes every closed window."""
    import uuid

    from etl_finance_pipeline_spark.operators.corpus import url_canonicalize
    from etl_finance_pipeline_spark.sources.tables import ensure_nanos_conf

    spark = _narrow_session(spark, _stream_fanout_width(spark, cap=8))
    ensure_nanos_conf(spark)
    path = _t(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    ev = F.timestamp_seconds(
        F.lit(_URL_EV_EPOCH) + (F.col("doc_id") % 360) * 60
    )
    stream = (
        spark.readStream.schema(schema)
        .parquet(path[:-1] + "[t]")
        .select(
            "doc_id",
            "source",
            _crawl_url_expr().alias("url"),
            ev.alias("ev"),
        )
    )
    agg = (
        url_canonicalize(stream)
        .withWatermark("ev", "30 minutes")
        .groupBy(F.window("ev", "60 minutes"), "url_key")
        .agg(
            F.min("doc_id").cast("long").alias("doc_id"),
            F.count("*").cast("long").alias("n_snapshots"),
        )
        .select(
            (
                (F.col("window.start").cast("long") - _URL_EV_EPOCH) / 60
            )
            .cast("long")
            .alias("win_min"),
            "url_key",
            "doc_id",
            "n_snapshots",
        )
    )
    name = f"stream_urldedupa_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    # Oracle equivalence REQUIRES the fixture to load as one data
    # microbatch (event time doc_id%360 is uncorrelated with file
    # order — a multi-batch load would nondeterministically drop
    # late rows against a mid-stream watermark). Enforce it loudly
    # so a future maxFilesPerTrigger/maxBytesPerTrigger setting
    # fails here instead of silently diverging (round-12 ADVICE).
    n_data_batches = sum(
        1 for p in q.recentProgress if int(p["numInputRows"]) > 0
    )
    if n_data_batches != 1:
        raise AssertionError(
            "stream_url_dedup_append expects exactly one data "
            f"microbatch, saw {n_data_batches}: the closed-window "
            "oracle cutoff only models a single-batch load"
        )
    return spark.table(name)


# the closed-window cutoff replays Spark's watermark algebra: the
# final watermark is max_event − 30 min and a window is emitted iff
# window_end <= watermark — all in minutes since the shared epoch
SQL_STREAM_URL_DEDUP_APPEND = f"""
WITH {_CRAWL_URLS_CTE},
{_url_canon_ctes("curls", "doc_id", "wa")},
wam AS (
  SELECT doc_id, url_key, (doc_id % 360) // 60 AS wid FROM wacanon
),
wmx AS (SELECT max(doc_id % 360) AS mm FROM documents)
SELECT CAST(wid * 60 AS BIGINT) AS win_min, url_key,
       CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_snapshots
FROM wam, wmx
WHERE (wid + 1) * 60 <= mm - 30
GROUP BY 1, 2
"""


def _anchor_sql_structs() -> str:
    """The fixture's full anchor inventory as a DuckDB struct-list
    expression — (href, txt, nf, dom, ext) per anchor, derived from
    doc_id arithmetic alone (independent of the extraction regexes)."""
    own = "'src' || CAST(doc_id % 20 AS VARCHAR) || '.com'"
    pdom = (
        "'src' || CAST((doc_id // 20) % (doc_id % 20 + 1) AS VARCHAR)"
        " || '.com'"
    )
    mdom = "'src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com'"
    sdom = "'src' || CAST((doc_id * 3 + 5) % 20 AS VARCHAR) || '.com'"

    def st(href: str, txt: str, nf: str, dom: str, ext: str) -> str:
        return (
            f"{{'href': {href}, 'txt': {txt}, 'nf': {nf}, "
            f"'dom': {dom}, 'ext': {ext}}}"
        )

    def internal(href: str, txt: str) -> str:
        return st(href, txt, "false", own, "false")

    fixed_nav = ", ".join(
        [
            internal("'/'", "'Home'"),
            internal("'/about'", "'About'"),
            internal("'/tags'", "'Tags'"),
        ]
    )
    partner_href = (
        "'https://src' || CAST((doc_id // 20) % (doc_id % 20 + 1)"
        " AS VARCHAR) || '.com/p/' || CAST(doc_id % 100 AS VARCHAR)"
    )
    fixed_tail = ", ".join(
        [
            internal("'/s/tw'", "'Tweet'"),
            internal("'/s/fb'", "'Share'"),
            st(partner_href, "'Partner'", "false", pdom, f"({pdom} <> {own})"),
            internal("'/terms'", "'Terms'"),
            internal("'/privacy'", "'Privacy'"),
        ]
    )
    mirror_href = (
        "'//src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com/mirror'"
    )
    local_href = "'local/' || CAST(doc_id % 7 AS VARCHAR)"
    sponsor_href = (
        "'https://src' || CAST((doc_id * 3 + 5) % 20 AS VARCHAR)"
        " || '.com/ref'"
    )
    return f"""[{fixed_nav}]
      || (CASE doc_id % 3
          WHEN 1 THEN [{internal("'/buy'", "'Buy now'")}]
          WHEN 2 THEN [{internal("'/p1'", "'Prev'")},
                       {internal("'/p2'", "'Next'")}]
          ELSE [] END)
      || [{fixed_tail}]
      || (CASE WHEN doc_id % 5 = 3
          THEN [{st(mirror_href, "'Mirror'", "false", mdom, "true")}]
          ELSE [] END)
      || (CASE WHEN doc_id % 3 = 0
          THEN [{internal(local_href, "'Local'")}]
          ELSE [] END)
      || (CASE WHEN doc_id % 7 = 1
          THEN [{st(sponsor_href, "'Sponsored'", "true", sdom, "true")}]
          ELSE [] END)"""


_ANCHOR_CTE = f"""aall AS (
  SELECT doc_id, u.href AS href, u.txt AS anchor_text, u.nf AS nofollow,
         u.dom AS link_domain, u.ext AS is_external
  FROM (
    SELECT doc_id, unnest({_anchor_sql_structs()}) AS u
    FROM documents
  )
)"""


def q_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text extraction (operators/corpus.py:anchor_texts) —
    the (target, text) corpus retrieval pipelines mine from crawls,
    with rel="nofollow" flagged (the synthesized paid placements):
    every anchor on the synthesized pages yields its raw href,
    visible text (tag-stripped/unescaped/ws-normalized), nofollow
    flag, and resolved registrable target domain. The oracle
    ENUMERATES the full anchor inventory arithmetically — hrefs,
    texts, flags, domains — independent of the extraction regexes."""
    from etl_finance_pipeline_spark.operators.corpus import anchor_texts

    out = anchor_texts(_crawl_pages(spark, sf_dir))
    return out.select(
        "doc_id",
        "href",
        "anchor_text",
        "nofollow",
        "link_domain",
        "is_external",
    )


SQL_ANCHOR_TEXTS = f"""
WITH {_ANCHOR_CTE}
SELECT doc_id, href, anchor_text, nofollow, link_domain, is_external
FROM aall
"""


def q_anchor_text_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-TARGET-domain anchor census — the rollup that turns the
    anchor corpus into retrieval training signal and ranking-graph
    hygiene numbers: incoming anchor volume, external share, nofollow
    share (what the ranking graph must drop), and distinct anchor
    vocabulary per target."""
    from etl_finance_pipeline_spark.operators.corpus import anchor_texts

    out = anchor_texts(_crawl_pages(spark, sf_dir))
    return out.groupBy(F.col("link_domain").alias("domain")).agg(
        F.count("*").cast("long").alias("n_anchors"),
        F.sum(F.col("is_external").cast("long"))
        .cast("long")
        .alias("n_external"),
        F.sum(F.col("nofollow").cast("long"))
        .cast("long")
        .alias("n_nofollow"),
        F.countDistinct("anchor_text").cast("long").alias("n_texts"),
    )


SQL_ANCHOR_TEXT_CENSUS = f"""
WITH {_ANCHOR_CTE}
SELECT link_domain AS domain,
       CAST(count(*) AS BIGINT) AS n_anchors,
       CAST(sum(CASE WHEN is_external THEN 1 ELSE 0 END) AS BIGINT)
         AS n_external,
       CAST(sum(CASE WHEN nofollow THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nofollow,
       CAST(count(DISTINCT anchor_text) AS BIGINT) AS n_texts
FROM aall
GROUP BY 1
"""


def q_domain_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain authority — the crawl-side centrality ranking
    (CommonCrawl publishes exactly this as its domain-level ranks),
    fed by REAL crawl structure since round 12: <a href> anchors
    extracted from the page markup (link_extract), resolved against
    each page's canonical URL, rolled up to registrable-domain edges
    (external links only — internal navigation never makes an edge),
    deduplicated, and 3 damped PageRank iterations produce per-domain
    ranks alongside in/out degree. The readout that feeds blocklist
    review and per-domain quality priors from the LINK side, where
    domain_quality_prior feeds it from the CONTENT side. Corpus work:
    the link-extraction projection + one distinct edge aggregate; the
    rank loop runs on the k-domain control-plane graph. Edges come
    from the attribute-aware anchor parse so rel="nofollow" links
    (the synthesized paid placements) are EXCLUDED — the rule every
    production ranking graph applies. The oracle derives the SAME
    edge set INDEPENDENTLY from the fixture arithmetic (not by
    replaying the regex chain), so an extraction bug that bends any
    edge — including a nofollow leaking through — fails the rank
    hash."""
    from etl_finance_pipeline_spark.operators.corpus import anchor_texts
    from etl_finance_pipeline_spark.operators.graph import pagerank

    links = anchor_texts(_crawl_pages(spark, sf_dir))
    edges = (
        links.filter(F.col("is_external") & ~F.col("nofollow"))
        .select(
            F.col("page_domain").alias("src"),
            F.col("link_domain").alias("dst"),
        )
        .distinct()
        # materialized once: the rank loop AND the degree aggregates
        # below all consume it — without the checkpoint the anchor
        # extraction re-runs for the out/in-degree job (guide §2.4:
        # share the exchange, don't recompute the subtree)
        .localCheckpoint(eager=True)
    )
    pr = pagerank(edges, iters=3, damping=0.85).select(
        F.col("id").alias("domain"), "rank"
    )
    outd = edges.groupBy(F.col("src").alias("domain")).agg(
        F.count("*").cast("long").alias("out_deg")
    )
    ind = edges.groupBy(F.col("dst").alias("domain")).agg(
        F.count("*").cast("long").alias("in_deg")
    )
    return (
        pr.join(outd, "domain", "left")
        .join(ind, "domain", "left")
        .select(
            "domain",
            "rank",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        )
    )


# edges derived INDEPENDENTLY from the fixture arithmetic (the page
# domain is src(doc_id%20).com; the synthesized partners block links
# it to the partner domain src((doc_id//20)%(doc_id%20+1)).com and,
# on doc_id%5=3, the mirror domain src((doc_id+1)%20).com; internal
# links and rel="nofollow" placements never make an edge) — NOT by
# replaying the extraction regex, so the oracle cross-checks
# anchor_texts' ranking-graph edge set end to end. Produces r3(id,
# rank). Shared by domain_authority and authority_sample.
_DA_RANK_CTES = f"""e AS (
  SELECT DISTINCT
         'src' || CAST(doc_id % 20 AS VARCHAR) || '.com' AS src,
         'src' || CAST((doc_id // 20) % (doc_id % 20 + 1) AS VARCHAR)
           || '.com' AS dst
  FROM documents
  WHERE (doc_id // 20) % (doc_id % 20 + 1) <> doc_id % 20
  UNION
  SELECT 'src' || CAST(doc_id % 20 AS VARCHAR) || '.com',
         'src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com'
  FROM documents
  WHERE doc_id % 5 = 3
),
v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
n AS (SELECT count(*) AS n FROM v),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
r0 AS (SELECT id, floor(1.0 / n.n * 1000000 + 0.5) / 1000000 AS rank FROM v, n),
{_pr_iter_sql(1)},
{_pr_iter_sql(2)},
{_pr_iter_sql(3)}"""

SQL_DOMAIN_AUTHORITY = f"""
WITH {_DA_RANK_CTES},
dao AS (SELECT src AS domain, CAST(count(*) AS BIGINT) AS out_deg FROM e GROUP BY 1),
dai AS (SELECT dst AS domain, CAST(count(*) AS BIGINT) AS in_deg FROM e GROUP BY 1)
SELECT r.id AS domain, r.rank,
       CAST(coalesce(dao.out_deg, 0) AS BIGINT) AS out_deg,
       CAST(coalesce(dai.in_deg, 0) AS BIGINT) AS in_deg
FROM r3 r
LEFT JOIN dao ON dao.domain = r.id
LEFT JOIN dai ON dai.domain = r.id
"""


def q_authority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The link graph feeding DATA SELECTION — authority-weighted
    sampling (the crawl-prioritization loop closed): domain-authority
    PageRank ranks (from extracted, nofollow-excluded edges) join
    back to the document catalog as per-doc weights, and the
    deterministic A-Res draw (weighted_sample_topk) selects 100 docs
    without replacement, inclusion ∝ domain rank. Output = the
    per-domain composition of the draw. The rank frame is k-row
    (broadcast); the draw is a narrow priority map + global top-k
    (TakeOrderedAndProject) — no global sort, no extra shuffle."""
    from etl_finance_pipeline_spark.operators.corpus import (
        weighted_sample_topk,
    )

    ranks = q_domain_authority(spark, sf_dir).select("domain", "rank")
    docs = load_table(spark, _t(sf_dir, "documents")).select(
        "doc_id", F.concat(F.col("source"), F.lit(".com")).alias("domain")
    )
    weighted = docs.join(F.broadcast(ranks), "domain")
    drawn = weighted_sample_topk(weighted, "doc_id", "rank", k=100)
    return drawn.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_drawn"),
        F.max("rank").alias("rank"),
    )


SQL_AUTHORITY_SAMPLE = f"""
WITH {_DA_RANK_CTES},
ad AS (
  SELECT doc_id, 'src' || CAST(doc_id % 20 AS VARCHAR) || '.com' AS domain
  FROM documents
),
aw AS (
  SELECT a.doc_id, a.domain, r.rank,
         ln((CAST(('0x' || substr(md5(CAST(a.doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) + 1) / 1152921504606846976.0) / r.rank AS priority
  FROM ad a JOIN r3 r ON r.id = a.domain
  WHERE r.rank > 0
),
sel AS (SELECT * FROM aw ORDER BY priority DESC, doc_id LIMIT 100)
SELECT domain, CAST(count(*) AS BIGINT) AS n_drawn, max(rank) AS rank
FROM sel GROUP BY 1
"""



def q_host_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOST-level web-graph authority — the granularity twin of
    domain_authority (CommonCrawl publishes BOTH host- and
    domain-level graphs; host granularity is where subdomain spam —
    the blogspot shape — is visible, because a burner subdomain can
    rank while its registrable domain's other hosts do not). Edges
    keep full canonical hosts (the fixture's cdn.* subdomains stay
    distinct sources) instead of rolling up to registrable domains:
    page host → target host for every dofollow anchor whose target
    host differs. Same extraction chain, same rank device; the
    oracle derives the host edge set independently from fixture
    arithmetic (cdn. on doc_id%4==0, partner/mirror targets are bare
    domains)."""
    from etl_finance_pipeline_spark.operators.corpus import (
        anchor_texts,
        canonical_host,
    )
    from etl_finance_pipeline_spark.operators.graph import pagerank

    links = anchor_texts(_crawl_pages(spark, sf_dir))
    edges = (
        links.filter(~F.col("nofollow"))
        .select(
            canonical_host(F.col("url_canon")).alias("src"),
            F.col("link_host").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pr = pagerank(edges, iters=3, damping=0.85).select(
        F.col("id").alias("host"), "rank"
    )
    outd = edges.groupBy(F.col("src").alias("host")).agg(
        F.count("*").cast("long").alias("out_deg")
    )
    ind = edges.groupBy(F.col("dst").alias("host")).agg(
        F.count("*").cast("long").alias("in_deg")
    )
    return (
        pr.join(outd, "host", "left")
        .join(ind, "host", "left")
        .select(
            "host",
            "rank",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        )
    )


def _hr_iter_sql(i: int) -> str:
    """Host-level twin of _pr_iter_sql (prefixed relation names)."""
    return f"""
hc{i} AS (
  SELECT e2.dst, sum(r.rank / d.deg) AS cin
  FROM e2 JOIN hr{i - 1} r ON e2.src = r.id JOIN deg2 d ON e2.src = d.src
  GROUP BY 1
),
hr{i} AS (
  SELECT v2.id,
         floor(((1.0 - 0.85) / n2.n + 0.85 * coalesce(hc{i}.cin, 0.0)) * 1000000 + 0.5) / 1000000 AS rank
  FROM v2 LEFT JOIN hc{i} ON v2.id = hc{i}.dst, n2
)"""


# host-level edges derived INDEPENDENTLY from fixture arithmetic: the
# page host keeps its cdn. subdomain (doc_id%4==0; www. is stripped by
# canonicalization), targets are bare partner/mirror domains, nofollow
# placements never make an edge, and same-host links drop (a bare page
# host linking its own domain is internal; a cdn. host is not).
_HOST_RANK_CTES = f"""e2 AS (
  SELECT DISTINCT
    (CASE WHEN doc_id % 4 = 0 THEN 'cdn.' ELSE '' END)
      || 'src' || CAST(doc_id % 20 AS VARCHAR) || '.com' AS src,
    'src' || CAST((doc_id // 20) % (doc_id % 20 + 1) AS VARCHAR)
      || '.com' AS dst
  FROM documents
  WHERE doc_id % 4 = 0
     OR (doc_id // 20) % (doc_id % 20 + 1) <> doc_id % 20
  UNION
  SELECT (CASE WHEN doc_id % 4 = 0 THEN 'cdn.' ELSE '' END)
      || 'src' || CAST(doc_id % 20 AS VARCHAR) || '.com',
    'src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com'
  FROM documents
  WHERE doc_id % 5 = 3
),
v2 AS (SELECT src AS id FROM e2 UNION SELECT dst FROM e2),
n2 AS (SELECT count(*) AS n FROM v2),
deg2 AS (SELECT src, count(*) AS deg FROM e2 GROUP BY 1),
hr0 AS (SELECT id, floor(1.0 / n2.n * 1000000 + 0.5) / 1000000 AS rank FROM v2, n2),
{_hr_iter_sql(1)},
{_hr_iter_sql(2)},
{_hr_iter_sql(3)}"""


SQL_HOST_AUTHORITY = f"""
WITH {_HOST_RANK_CTES},
hao AS (SELECT src AS host, CAST(count(*) AS BIGINT) AS out_deg FROM e2 GROUP BY 1),
hai AS (SELECT dst AS host, CAST(count(*) AS BIGINT) AS in_deg FROM e2 GROUP BY 1)
SELECT r.id AS host, r.rank,
       CAST(coalesce(hao.out_deg, 0) AS BIGINT) AS out_deg,
       CAST(coalesce(hai.in_deg, 0) AS BIGINT) AS in_deg
FROM hr3 r
LEFT JOIN hao ON hao.host = r.id
LEFT JOIN hai ON hai.host = r.id
"""


def q_host_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subdomain-spread × authority census — the rollup that makes
    host-level ranking actionable: per registrable domain, how many
    distinct hosts carry rank, how much total authority they hold,
    and how concentrated it is (top host's share). A domain whose
    authority is spread across many low-share hosts is the subdomain-
    spam shape; a single-host domain concentrates at share 1.0. One
    aggregate over the k-host rank frame."""
    from etl_finance_pipeline_spark.operators.corpus import (
        registrable_domain,
    )
    from etl_finance_pipeline_spark.functions.scalar import (
        portable_round,
    )

    pr = q_host_authority(spark, sf_dir)
    return pr.groupBy(
        registrable_domain(F.col("host")).alias("domain")
    ).agg(
        F.count("*").cast("long").alias("n_hosts"),
        portable_round(F.sum("rank"), 6).alias("total_rank"),
        portable_round(F.max("rank") / F.sum("rank"), 6).alias(
            "top_host_share"
        ),
    )


SQL_HOST_CENSUS = f"""
WITH {_HOST_RANK_CTES}
SELECT {_sql_regdom('id')} AS domain,
       CAST(count(*) AS BIGINT) AS n_hosts,
       floor(sum(rank) * 1000000 + 0.5) / 1000000 AS total_rank,
       floor(max(rank) / sum(rank) * 1000000 + 0.5) / 1000000
         AS top_host_share
FROM hr3 GROUP BY 1
"""


def _image_embedding_expr():
    """Synthesized IMAGE-side embedding paired with each text-side
    vector — the in-engine fixture device (synthesize_html for
    markup, this for the cross-modal pair table): aligned pairs
    (vec_id % 4 != 0) are the text vector scaled 0.9 with a small
    deterministic per-dimension perturbation (cosine ≈ 0.985);
    planted MISMATCHES (vec_id % 4 == 0) reverse the perturbed
    vector (cosine ≈ 0 ± 0.4, measured), so an alignment gate at 0.8
    separates them exactly. Every byte derives from (vec_id,
    embedding), giving the DuckDB oracle the identical pair table."""
    emb = F.col("embedding").cast("array<double>")
    pert = F.transform(
        emb,
        lambda x, i: x * F.lit(0.9)
        + ((F.col("vec_id") + i) % 7 - 3).cast("double") * F.lit(0.01),
    )
    return F.when(F.col("vec_id") % 4 == 0, F.reverse(pert)).otherwise(
        pert
    )


#: DuckDB twin of _image_embedding_expr: pairs(vec_id, label, tv, iv)
_PAIR_CTES = """ppm AS (
  SELECT vec_id, label,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS tv,
    list_transform(list_zip(embedding, range(1, len(embedding) + 1)),
      p -> CAST(p[1] AS DOUBLE) * 0.9
           + CAST((vec_id + (p[2] - 1)) % 7 - 3 AS DOUBLE) * 0.01) AS pv
  FROM embeddings
),
pairs AS (
  SELECT vec_id, label, tv,
         CASE WHEN vec_id % 4 = 0 THEN list_reverse(pv) ELSE pv END AS iv
  FROM ppm
)"""

#: rounded cosine between tv and iv (both already DOUBLE lists)
_PAIR_COS_SQL = """floor((
  list_sum(list_transform(list_zip(tv, iv), p -> p[1] * p[2]))
  / (sqrt(list_sum(list_transform(tv, x -> x * x)))
     * sqrt(list_sum(list_transform(iv, x -> x * x))))) * 1000000 + 0.5)
  / 1000000"""


def q_pair_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal pair curation, the gate multimodal corpora apply
    ON TOP of per-modality dedup (LAION/DataComp's CLIP-score
    filter): per (text, image) pair, the cosine between the two
    modality embeddings; pairs below 0.8 are mismatches — wrong
    caption, decorative image, scraper mispairing (the planted
    vec_id%4==0 reversals) — and are flagged keep=false. Pure narrow
    map (operators/similarity.py:pair_alignment), no shuffle; the
    oracle synthesizes the identical pair table and replays the
    cosine arithmetically."""
    from etl_finance_pipeline_spark.operators.similarity import (
        pair_alignment,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    pairs = emb.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("txt_vec"),
        _image_embedding_expr().alias("img_vec"),
    )
    out = pair_alignment(pairs, "txt_vec", "img_vec", threshold=0.8)
    return out.select("vec_id", "cos_sim", "keep")


SQL_PAIR_ALIGNMENT = f"""
WITH {_PAIR_CTES}
SELECT vec_id, {_PAIR_COS_SQL} AS cos_sim,
       ({_PAIR_COS_SQL} >= 0.8) AS keep
FROM pairs
"""


def q_pair_align_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alignment-vs-quality composite readout per label bucket: pair
    volume, surviving share of the 0.8 cosine gate, and mean
    alignment — the datasheet row that tells a multimodal curation
    run which slices of the pair corpus are mispaired at the source
    (a low kept-share label is a broken scraper, not noise). One
    map-combinable aggregate over the narrow alignment map."""
    from etl_finance_pipeline_spark.functions.scalar import (
        portable_round,
    )
    from etl_finance_pipeline_spark.operators.similarity import (
        pair_alignment,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    pairs = emb.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("txt_vec"),
        _image_embedding_expr().alias("img_vec"),
    )
    out = pair_alignment(pairs, "txt_vec", "img_vec", threshold=0.8)
    return out.groupBy("label").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
        portable_round(
            F.sum(F.col("keep").cast("long")) / F.count("*"), 6
        ).alias("kept_share"),
        portable_round(F.avg("cos_sim"), 6).alias("mean_cos"),
    )


SQL_PAIR_ALIGN_CENSUS = f"""
WITH {_PAIR_CTES},
pc AS (SELECT label, {_PAIR_COS_SQL} AS cos FROM pairs)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN cos >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       floor(sum(CASE WHEN cos >= 0.8 THEN 1 ELSE 0 END)
             / count(*) * 1000000 + 0.5) / 1000000 AS kept_share,
       floor(avg(cos) * 1000000 + 0.5) / 1000000 AS mean_cos
FROM pc GROUP BY 1
"""


def q_pair_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mismatched-pair MINING across modality — the hard negatives a
    contrastive trainer wants: for each text query, the top-3 images
    it is most confusable with, excluding its own pair (the exact
    cosine_topk device, eval-sized with its max_pairs guard; the
    IVF/LSH twins are the corpus-scale path). Output (query_id,
    neighbor_id, cosine, rank)."""
    from etl_finance_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    imgs = emb.select(
        "vec_id", _image_embedding_expr().alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return cosine_topk(imgs, queries, k=3)


SQL_PAIR_HARD_NEGATIVES = f"""
WITH {_PAIR_CTES},
hq AS (SELECT vec_id AS query_id, tv AS qv FROM pairs WHERE vec_id < 5),
hp AS (
  SELECT hq.query_id, p.vec_id AS neighbor_id,
    floor((
      list_sum(list_transform(list_zip(hq.qv, p.iv), z -> z[1] * z[2]))
      / (sqrt(list_sum(list_transform(hq.qv, x -> x * x)))
         * sqrt(list_sum(list_transform(p.iv, x -> x * x)))))
      * 1000000 + 0.5) / 1000000 AS cosine
  FROM hq, pairs p
  WHERE p.vec_id != hq.query_id
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
       ) AS BIGINT) AS rank
FROM hp
QUALIFY rank <= 3
"""


def _tr_iter_sql(i: int) -> str:
    """One TrustRank iteration as DuckDB CTEs — the trust twin of
    _pr_iter_sql: teleport mass goes to the seed set only."""
    return f"""
tc{i} AS (
  SELECT e.dst, sum(t.trust / d.deg) AS cin
  FROM e JOIN t{i - 1} t ON e.src = t.id JOIN deg d ON e.src = d.src
  GROUP BY 1
),
t{i} AS (
  SELECT v.id,
         floor(((1.0 - 0.85) * (CASE WHEN s.id IS NOT NULL
                  THEN 1.0 / sn.ns ELSE 0.0 END)
                + 0.85 * coalesce(tc{i}.cin, 0.0)) * 1000000 + 0.5)
           / 1000000 AS trust
  FROM v LEFT JOIN tc{i} ON v.id = tc{i}.dst
       LEFT JOIN seeds s ON v.id = s.id, sn
)"""


#: TrustRank over the _DA_RANK_CTES graph: seeds = top-3 domains by
#: the CONVERGED authority rank (deterministic rank-then-id order),
#: teleport biased to the seed set, 3 damped rounds — produces
#: t3(id, trust). Requires _DA_RANK_CTES in scope.
_TRUST_CTES = f"""seeds AS (
  SELECT id FROM r3 ORDER BY rank DESC, id LIMIT 3
),
sn AS (SELECT count(*) AS ns FROM seeds),
t0 AS (
  SELECT v.id,
         floor((CASE WHEN s.id IS NOT NULL THEN 1.0 / sn.ns
                ELSE 0.0 END) * 1000000 + 0.5) / 1000000 AS trust
  FROM v LEFT JOIN seeds s ON v.id = s.id, sn
),
{_tr_iter_sql(1)},
{_tr_iter_sql(2)},
{_tr_iter_sql(3)}"""


def _domain_trust(spark: SparkSession, sf_dir: str):
    """(ranks, trust) over the extracted dofollow edge set — the
    shared spine of the trust family: one anchor parse, one edge
    aggregate (checkpointed: both rank loops re-read it), PageRank
    for authority, top-3 authority domains as the trusted seed set,
    TrustRank propagation from them."""
    from etl_finance_pipeline_spark.operators.corpus import anchor_texts
    from etl_finance_pipeline_spark.operators.graph import (
        pagerank_with_trust,
    )

    links = anchor_texts(_crawl_pages(spark, sf_dir))
    edges = (
        links.filter(F.col("is_external") & ~F.col("nofollow"))
        .select(
            F.col("page_domain").alias("src"),
            F.col("link_domain").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # one shared rank+trust loop pair (e/verts/links materialize once,
    # both loops read them — identical algebra to the separate
    # pagerank + trustrank operators; guide §2.4)
    ranks, trust = pagerank_with_trust(
        edges, top_seeds=3, iters=3, damping=0.85
    )
    return (
        ranks.select(F.col("id").alias("domain"), "rank"),
        trust.select(F.col("id").alias("domain"), "trust"),
    )


def q_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank over the extracted link graph (Gyöngyi et al. 2004)
    — trust propagated from a deterministic seed set (the top-3
    domains by converged authority) along dofollow edges with the
    teleport biased to the seeds: the standard companion of raw
    authority that separates well-linked-from-trusted from merely
    well-linked. Same unrolled-damped-rounds device as
    domain_authority; the oracle replays seeds + 3 iterations
    arithmetically on its independently-derived edge set."""
    _ranks, trust = _domain_trust(spark, sf_dir)
    return trust


SQL_TRUSTRANK = f"""
WITH {_DA_RANK_CTES},
{_TRUST_CTES}
SELECT id AS domain, trust FROM t3
"""


def q_spam_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spam-mass readout (Gyöngyi et al. 2006): the fraction of a
    domain's authority NOT accounted for by trust — spam_mass =
    (rank − trust)/rank per domain, the number a production link
    graph thresholds to demote link-spam regions before sampling.
    Negative for the seed region (trust teleports concentrate there),
    → 1 for domains whose rank comes entirely from untrusted
    structure; is_spammy flags past 0.5. One broadcast-sized join of
    the two k-domain rank frames."""
    from etl_finance_pipeline_spark.functions.scalar import (
        portable_round,
    )

    ranks, trust = _domain_trust(spark, sf_dir)
    sm = portable_round(
        (F.col("rank") - F.col("trust")) / F.col("rank"), 6
    )
    return (
        ranks.join(trust, "domain")
        .withColumn("spam_mass", sm)
        .withColumn("is_spammy", F.col("spam_mass") > 0.5)
        .select("domain", "rank", "trust", "spam_mass", "is_spammy")
    )


SQL_SPAM_MASS = f"""
WITH {_DA_RANK_CTES},
{_TRUST_CTES},
sm AS (
  SELECT r.id AS domain, r.rank, t.trust,
         floor((r.rank - t.trust) / r.rank * 1000000 + 0.5) / 1000000
           AS spam_mass
  FROM r3 r JOIN t3 t ON r.id = t.id
)
SELECT domain, rank, trust, spam_mass, (spam_mass > 0.5) AS is_spammy
FROM sm
"""


def q_trusted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Authority sampling with the spam-mass DEMOTION wired in — the
    trust-aware twin of authority_sample: each domain's draw weight
    is least(rank, trust) (algebraically rank·(1 − spam_mass) capped
    at the undemoted rank), so domains whose authority is not
    trust-backed lose inclusion probability and zero-trust domains
    drop out of the draw entirely. Same deterministic A-Res top-k;
    the oracle replays weights + priorities arithmetically."""
    from etl_finance_pipeline_spark.operators.corpus import (
        weighted_sample_topk,
    )

    ranks, trust = _domain_trust(spark, sf_dir)
    w = ranks.join(trust, "domain").select(
        "domain", F.least("rank", "trust").alias("w")
    )
    docs = load_table(spark, _t(sf_dir, "documents")).select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".com")).alias("domain"),
    )
    weighted = docs.join(F.broadcast(w), "domain")
    drawn = weighted_sample_topk(weighted, "doc_id", "w", k=100)
    return drawn.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_drawn"),
        F.max("w").alias("w"),
    )


SQL_TRUSTED_SAMPLE = f"""
WITH {_DA_RANK_CTES},
{_TRUST_CTES},
tw AS (
  SELECT r.id,
         CASE WHEN t.trust < r.rank THEN t.trust ELSE r.rank END AS w
  FROM r3 r JOIN t3 t ON r.id = t.id
),
tad AS (
  SELECT doc_id, 'src' || CAST(doc_id % 20 AS VARCHAR) || '.com' AS domain
  FROM documents
),
taw AS (
  SELECT a.doc_id, a.domain, w.w,
         ln((CAST(('0x' || substr(md5(CAST(a.doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) + 1) / 1152921504606846976.0) / w.w AS priority
  FROM tad a JOIN tw w ON w.id = a.domain
  WHERE w.w > 0
),
tsel AS (SELECT * FROM taw ORDER BY priority DESC, doc_id LIMIT 100)
SELECT domain, CAST(count(*) AS BIGINT) AS n_drawn, max(w) AS w
FROM tsel GROUP BY 1
"""


def q_stream_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink extraction ON THE INGEST STREAM — link-graph edges
    harvested as pages arrive, the way a continuous crawl keeps its
    web graph current: file-stream → synthesize/canonicalize →
    link_extract, one stateless narrow chain (append mode, no
    watermark, no state store). Oracle = the batch link_extract
    query, because the lane is a pure per-record map."""
    import uuid

    from etl_finance_pipeline_spark.operators.corpus import (
        link_extract,
        synthesize_html,
        url_canonicalize,
    )
    from etl_finance_pipeline_spark.sources.tables import ensure_nanos_conf

    spark = _narrow_session(spark, _stream_fanout_width(spark, cap=8))
    ensure_nanos_conf(spark)
    path = _t(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path[:-1] + "[t]")
    # anchor extraction is the cost and the file source is one task —
    # spread the stateless chain (the stream_curation_route device)
    stream = stream.repartition(_stream_fanout_width(spark, cap=8))
    pages = synthesize_html(stream).withColumn("url", _crawl_url_expr())
    out = link_extract(url_canonicalize(pages)).select(
        "doc_id",
        "href",
        "link_url",
        "link_host",
        "link_domain",
        "page_domain",
        "is_external",
    )
    name = f"stream_linkx_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.table(name)


#: the streaming lane emits the SAME rows as the batch extraction
SQL_STREAM_LINK_EXTRACT = SQL_LINK_EXTRACT


def _frontier_candidates(spark: SparkSession, sf_dir: str):
    """Shared front half of the crawl-frontier family: ONE anchor
    parse over the materialized page frame (checkpointed — the rank
    loop and the candidate derivation both re-read it), dofollow
    external targets scheme-fixed and canonicalized to identity keys
    with their target host. Returns (pages, anchors, tkeys)."""
    from etl_finance_pipeline_spark.operators.corpus import (
        anchor_texts,
        url_canonicalize,
    )

    pages = _crawl_pages(spark, sf_dir)
    anchors = anchor_texts(pages).localCheckpoint(eager=True)
    targets = anchors.filter(
        F.col("is_external") & ~F.col("nofollow")
    ).select(
        F.when(
            F.col("link_url").startswith("//"),
            F.concat(F.lit("http:"), F.col("link_url")),
        )
        .otherwise(F.col("link_url"))
        .alias("url"),
        "link_domain",
    )
    tkeys = (
        url_canonicalize(targets)
        .select("url_key", F.col("link_domain").alias("host"))
        .distinct()
    )
    return pages, anchors, tkeys


def q_frontier_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier prioritization — the fetch queue a continuous
    crawl computes from what it just parsed: dofollow external link
    targets canonicalize to identity keys, an ANTI-JOIN against the
    already-crawled key set leaves the undiscovered frontier, and
    each candidate ranks by its target domain's authority (the OPIC/
    PageRank-priority recipe real crawlers schedule by). Top 50 by
    (rank desc, key) — deterministic. Scheme-relative targets gain
    http: before canonicalization (a scheme-less base page can emit
    '//host/p' links; the canonical key needs the host). The oracle
    derives the target keys ARITHMETICALLY (partner + mirror URLs)
    and replays the anti-join + robots verdict + rank + top-k. Since
    round 13 the queue is POLITE: candidates blocked by their host's
    robots.txt (synthesized payloads, parsed by the real rule chain)
    never enter it — the gate every production crawler applies before
    authority ranking."""
    from etl_finance_pipeline_spark.operators.corpus import (
        robots_gate,
        robots_rules,
        synthesize_robots,
    )
    from etl_finance_pipeline_spark.operators.graph import pagerank

    pages, anchors, tkeys = _frontier_candidates(spark, sf_dir)
    dofollow = anchors.filter(F.col("is_external") & ~F.col("nofollow"))
    crawled = pages.select("url_key").distinct()
    edges = dofollow.select(
        F.col("page_domain").alias("src"),
        F.col("link_domain").alias("dst"),
    ).distinct()
    ranks = pagerank(edges, iters=3, damping=0.85).select(
        F.col("id").alias("host"), "rank"
    )
    frontier = tkeys.join(crawled, "url_key", "left_anti")
    # the politeness gate runs BEFORE authority ranking: a blocked
    # URL never enters the fetch queue no matter its rank
    hosts = frontier.select("host").distinct()
    rules = robots_rules(synthesize_robots(hosts))
    polite = robots_gate(frontier, rules).filter("allowed")
    return (
        polite.join(F.broadcast(ranks), "host")
        .select("url_key", F.col("host").alias("domain"), "rank")
        .orderBy(F.col("rank").desc(), F.col("url_key"))
        .limit(50)
    )


def _sql_robots_allowed(k: str, path: str) -> str:
    """DuckDB twin of the synthesized robots verdict for host index
    *k* and candidate *path* — the longest-match outcome derived
    ARITHMETICALLY from the payload rules synthesize_robots plants
    (Allow /p/1 [len 4] beats Disallow /p/ [len 3] beats Disallow /
    [len 1]; no regex replay, so a parser bug fails the hash)."""
    return (
        f"(CASE WHEN {path} LIKE '/p/%' AND {k} % 3 = 0 "
        f"THEN ({path} LIKE '/p/1%') "
        f"WHEN {path} = '/mirror' AND {k} % 4 = 1 THEN false "
        f"WHEN {k} = 7 THEN false ELSE true END)"
    )


def _sql_robots_rule(k: str, path: str, field: str) -> str:
    """Matched-rule attribution twin: *field* = 'type' or 'path'."""
    t = field == "type"
    return f"""CASE
  WHEN {path} LIKE '/p/%' AND {k} % 3 = 0 AND {path} LIKE '/p/1%'
    THEN {"'allow'" if t else "'/p/1'"}
  WHEN {path} LIKE '/p/%' AND {k} % 3 = 0
    THEN {"'disallow'" if t else "'/p/'"}
  WHEN {path} = '/mirror' AND {k} % 4 = 1
    THEN {"'disallow'" if t else "'/mirror'"}
  WHEN {k} = 7 THEN {"'disallow'" if t else "'/'"}
  ELSE NULL END"""


#: frontier candidates with host index + path, shared by the robots
#: family (fr = anti-joined frontier; requires fcrawled + ftgt CTEs)
_FRONTIER_CAND_CTE = """fr AS (
  SELECT t.url_key, t.domain AS host,
         CAST(regexp_extract(t.domain, '([0-9]+)', 1) AS INT) AS k,
         regexp_replace(t.url_key, '^[^/]*', '') AS path
  FROM ftgt t
  WHERE t.url_key NOT IN (SELECT url_key FROM fcrawled)
)"""


SQL_FRONTIER_RANK = f"""
WITH {_DA_RANK_CTES},
{_CRAWL_URLS_CTE},
{_url_canon_ctes("curls", "doc_id", "fq")},
fcrawled AS (SELECT DISTINCT url_key FROM fqcanon),
ftgt AS (
  SELECT DISTINCT
    'src' || CAST((doc_id // 20) % (doc_id % 20 + 1) AS VARCHAR)
      || '.com/p/' || CAST(doc_id % 100 AS VARCHAR) AS url_key,
    'src' || CAST((doc_id // 20) % (doc_id % 20 + 1) AS VARCHAR)
      || '.com' AS domain
  FROM documents
  WHERE (doc_id // 20) % (doc_id % 20 + 1) <> doc_id % 20
  UNION
  SELECT DISTINCT
    'src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com/mirror',
    'src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com'
  FROM documents
  WHERE doc_id % 5 = 3
),
{_FRONTIER_CAND_CTE},
ffront AS (
  SELECT url_key, host AS domain FROM fr
  WHERE {_sql_robots_allowed('k', 'path')}
)
SELECT f.url_key, f.domain, r.rank
FROM ffront f JOIN r3 r ON r.id = f.domain
ORDER BY r.rank DESC, f.url_key
LIMIT 50
"""


def q_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots.txt politeness verdicts over the crawl frontier — the
    "may I fetch it" gate every production crawler applies BEFORE
    authority ranking (RFC 9309): per-host robots payloads are
    synthesized (synthesize_robots), parsed by the real rule chain
    (robots_rules: the ``*`` group isolated from other agents'
    groups, empty-path rules dropped), and applied to the
    undiscovered frontier keys with longest-match precedence and the
    Allow-beats-Disallow tie rule (robots_gate). Output: one verdict
    row per candidate with the matched rule attribution. The oracle
    derives every verdict ARITHMETICALLY from the host index — a
    parser or precedence bug fails the hash. Scale shape: rules are
    a hosts-sized broadcast; the verdict is one max(struct) aggregate
    keyed by the frontier — no window, no sort."""
    from etl_finance_pipeline_spark.operators.corpus import (
        robots_gate,
        robots_rules,
        synthesize_robots,
    )

    pages, _anchors, tkeys = _frontier_candidates(spark, sf_dir)
    crawled = pages.select("url_key").distinct()
    frontier = tkeys.join(crawled, "url_key", "left_anti")
    hosts = frontier.select("host").distinct()
    rules = robots_rules(synthesize_robots(hosts))
    return robots_gate(frontier, rules)


SQL_ROBOTS_GATE = f"""
WITH {_CRAWL_URLS_CTE},
{_url_canon_ctes("curls", "doc_id", "fq")},
fcrawled AS (SELECT DISTINCT url_key FROM fqcanon),
ftgt AS (
  SELECT DISTINCT
    'src' || CAST((doc_id // 20) % (doc_id % 20 + 1) AS VARCHAR)
      || '.com/p/' || CAST(doc_id % 100 AS VARCHAR) AS url_key,
    'src' || CAST((doc_id // 20) % (doc_id % 20 + 1) AS VARCHAR)
      || '.com' AS domain
  FROM documents
  WHERE (doc_id // 20) % (doc_id % 20 + 1) <> doc_id % 20
  UNION
  SELECT DISTINCT
    'src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com/mirror',
    'src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com'
  FROM documents
  WHERE doc_id % 5 = 3
),
{_FRONTIER_CAND_CTE}
SELECT url_key, host,
       {_sql_robots_allowed('k', 'path')} AS allowed,
       {_sql_robots_rule('k', 'path', 'type')} AS rule_type,
       {_sql_robots_rule('k', 'path', 'path')} AS rule_path
FROM fr
"""


def q_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The POLITE fetch schedule — what the frontier actually becomes
    once robots verdicts and per-host Crawl-delay budgets are
    applied: allowed candidates get deterministic per-host slots
    (row_number by key) and only the first ``60s / crawl_delay``
    slots of each host survive the scheduling window — the top-k-per-
    host-per-window shape of a real crawl scheduler (a host asking
    for a 4-second delay gets 15 fetches per minute, not 60). The
    oracle replays budget arithmetic + the same window. Scale shape:
    delays broadcast; one window partitioned by host (the frontier's
    natural key — no skew beyond per-host fan-in, which the budget
    itself caps)."""
    from etl_finance_pipeline_spark.operators.corpus import (
        robots_delays,
        robots_gate,
        robots_rules,
        synthesize_robots,
    )
    from pyspark.sql import Window

    pages, _anchors, tkeys = _frontier_candidates(spark, sf_dir)
    crawled = pages.select("url_key").distinct()
    frontier = tkeys.join(crawled, "url_key", "left_anti")
    hosts = frontier.select("host").distinct()
    robots = synthesize_robots(hosts)
    rules = robots_rules(robots)
    delays = robots_delays(robots)
    gated = robots_gate(frontier, rules).filter("allowed")
    w = Window.partitionBy("host").orderBy("url_key")
    budget = F.floor(F.lit(60) / F.col("crawl_delay")).cast("int")
    return (
        gated.join(F.broadcast(delays), "host")
        .withColumn("slot", F.row_number().over(w))
        .filter(F.col("slot") <= budget)
        .select(
            "url_key",
            "host",
            F.col("slot").cast("long").alias("slot"),
            F.col("crawl_delay").cast("long").alias("crawl_delay"),
        )
    )


SQL_FRONTIER_SCHEDULE = f"""
WITH {_CRAWL_URLS_CTE},
{_url_canon_ctes("curls", "doc_id", "fq")},
fcrawled AS (SELECT DISTINCT url_key FROM fqcanon),
ftgt AS (
  SELECT DISTINCT
    'src' || CAST((doc_id // 20) % (doc_id % 20 + 1) AS VARCHAR)
      || '.com/p/' || CAST(doc_id % 100 AS VARCHAR) AS url_key,
    'src' || CAST((doc_id // 20) % (doc_id % 20 + 1) AS VARCHAR)
      || '.com' AS domain
  FROM documents
  WHERE (doc_id // 20) % (doc_id % 20 + 1) <> doc_id % 20
  UNION
  SELECT DISTINCT
    'src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com/mirror',
    'src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com'
  FROM documents
  WHERE doc_id % 5 = 3
),
{_FRONTIER_CAND_CTE},
fa AS (
  SELECT url_key, host, k FROM fr
  WHERE {_sql_robots_allowed('k', 'path')}
),
fs AS (
  SELECT url_key, host,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY url_key) AS slot,
         60 // (k % 4 + 1) AS budget,
         k % 4 + 1 AS crawl_delay
  FROM fa
)
SELECT url_key, host, CAST(slot AS BIGINT) AS slot,
       CAST(crawl_delay AS BIGINT) AS crawl_delay
FROM fs WHERE slot <= budget
"""


def q_crawl_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage counts for the complete crawl loop the round-12/13
    families built — extract → rank-able edges → undiscovered
    frontier → robots-allowed → delay-budgeted schedule — the funnel
    datasheet a crawl operator reads to see where candidates die
    (the link-side twin of warc_curation_funnel). Each count is one
    map-combinable aggregate over frames the other queries already
    certify; the oracle derives every stage arithmetically."""
    from etl_finance_pipeline_spark.operators.corpus import (
        robots_delays,
        robots_gate,
        robots_rules,
        synthesize_robots,
    )
    from pyspark.sql import Window

    pages, anchors, tkeys = _frontier_candidates(spark, sf_dir)
    crawled = pages.select("url_key").distinct()
    frontier = tkeys.join(crawled, "url_key", "left_anti")
    hosts = frontier.select("host").distinct()
    robots = synthesize_robots(hosts)
    gated = robots_gate(frontier, robots_rules(robots)).filter(
        "allowed"
    )
    w = Window.partitionBy("host").orderBy("url_key")
    sched = (
        gated.join(F.broadcast(robots_delays(robots)), "host")
        .withColumn("slot", F.row_number().over(w))
        .filter(
            F.col("slot")
            <= F.floor(F.lit(60) / F.col("crawl_delay")).cast("int")
        )
    )

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.count("*").cast("long").alias("n"),
        )

    dofollow = anchors.filter(
        F.col("is_external") & ~F.col("nofollow")
    )
    return (
        stage("pages", pages)
        .unionByName(stage("anchors", anchors))
        .unionByName(stage("dofollow_external", dofollow))
        .unionByName(stage("frontier_new", frontier))
        .unionByName(stage("robots_allowed", gated))
        .unionByName(stage("scheduled", sched))
    )


SQL_CRAWL_FUNNEL = f"""
WITH {_ANCHOR_CTE},
{_CRAWL_URLS_CTE},
{_url_canon_ctes("curls", "doc_id", "fq")},
fcrawled AS (SELECT DISTINCT url_key FROM fqcanon),
ftgt AS (
  SELECT DISTINCT
    'src' || CAST((doc_id // 20) % (doc_id % 20 + 1) AS VARCHAR)
      || '.com/p/' || CAST(doc_id % 100 AS VARCHAR) AS url_key,
    'src' || CAST((doc_id // 20) % (doc_id % 20 + 1) AS VARCHAR)
      || '.com' AS domain
  FROM documents
  WHERE (doc_id // 20) % (doc_id % 20 + 1) <> doc_id % 20
  UNION
  SELECT DISTINCT
    'src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com/mirror',
    'src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com'
  FROM documents
  WHERE doc_id % 5 = 3
),
{_FRONTIER_CAND_CTE},
fa AS (
  SELECT url_key, host, k FROM fr
  WHERE {_sql_robots_allowed('k', 'path')}
),
fs AS (
  SELECT ROW_NUMBER() OVER (PARTITION BY host ORDER BY url_key) AS slot,
         60 // (k % 4 + 1) AS budget
  FROM fa
)
SELECT 'pages' AS stage, CAST(count(*) AS BIGINT) AS n FROM documents
UNION ALL
SELECT 'anchors', CAST(count(*) AS BIGINT) FROM aall
UNION ALL
SELECT 'dofollow_external', CAST(count(*) AS BIGINT) FROM aall
WHERE is_external AND NOT nofollow
UNION ALL
SELECT 'frontier_new', CAST(count(*) AS BIGINT) FROM fr
UNION ALL
SELECT 'robots_allowed', CAST(count(*) AS BIGINT) FROM fa
UNION ALL
SELECT 'scheduled', CAST(count(*) AS BIGINT) FROM fs WHERE slot <= budget
"""


def q_sitemap_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion — the crawl's OTHER discovery channel
    (sitemaps.org; robots.txt points at it): per-host sitemap.xml
    payloads are synthesized (synthesize_sitemap), parsed into
    per-URL rows with their <lastmod> freshness hints
    (sitemap_parse, generator-lambda shape, zero shuffles), and the
    advertised locations canonicalize to frontier identity keys. The
    oracle enumerates every (host, entry) arithmetically from the
    host index."""
    from etl_finance_pipeline_spark.operators.corpus import (
        sitemap_parse,
        synthesize_sitemap,
        url_canonicalize,
    )

    _pages, _anchors, tkeys = _frontier_candidates(spark, sf_dir)
    hosts = tkeys.select("host").distinct()
    sm = sitemap_parse(synthesize_sitemap(hosts))
    keyed = url_canonicalize(
        sm.select("host", "lastmod_month", F.col("loc").alias("url"))
    )
    return keyed.select("host", "url_key", "lastmod_month").distinct()


#: sitemap entries derived arithmetically: host k advertises entries
#: j in 0..k%3+1 with key src{k}.com/s/{(7k+j)%12}, lastmod (k+j)%12+1
_SITEMAP_CTE = """smh AS (
  SELECT DISTINCT
    'src' || CAST((doc_id // 20) % (doc_id % 20 + 1) AS VARCHAR)
      || '.com' AS host
  FROM documents
  WHERE (doc_id // 20) % (doc_id % 20 + 1) <> doc_id % 20
  UNION
  SELECT DISTINCT 'src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com'
  FROM documents WHERE doc_id % 5 = 3
),
sme AS (
  SELECT DISTINCT host,
    CAST(regexp_extract(host, '([0-9]+)', 1) AS INT) AS k,
    unnest(range(0, CAST(regexp_extract(host, '([0-9]+)', 1) AS INT) % 3 + 2)) AS j
  FROM smh
),
sml AS (
  SELECT host,
    host || '/s/' || CAST((k * 7 + j) % 12 AS VARCHAR) AS url_key,
    CAST((k + j) % 12 + 1 AS INT) AS lastmod_month
  FROM sme
)"""


SQL_SITEMAP_EXTRACT = f"""
WITH {_SITEMAP_CTE}
SELECT DISTINCT host, url_key, lastmod_month FROM sml
"""


def q_sitemap_index_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested sitemap ingestion — the sharded-sitemap shape large
    sites publish (sitemaps.org: an index of child sitemaps, nesting
    bounded at depth 2 by spec): index-publishing hosts (k % 4 == 0)
    advertise two shards, each shard parses into its per-URL entries
    with lastmod freshness hints. Index parse → child synthesis →
    entry parse, all generator-lambda + explode, zero data-path
    shuffles before the distinct. Oracle enumerates every
    (host, shard, entry) arithmetically."""
    from etl_finance_pipeline_spark.operators.corpus import (
        sitemap_index_parse,
        sitemap_parse,
        synthesize_child_sitemap,
        synthesize_sitemap_index,
    )

    _pages, _anchors, tkeys = _frontier_candidates(spark, sf_dir)
    k = F.regexp_extract(F.col("host"), r"([0-9]+)", 1).cast("int")
    hosts = tkeys.select("host").distinct().filter(k % 4 == 0)
    children = sitemap_index_parse(synthesize_sitemap_index(hosts))
    urls = sitemap_parse(synthesize_child_sitemap(children))
    return urls.select(
        "host", "child_loc", "loc", "lastmod_month"
    ).distinct()


SQL_SITEMAP_INDEX_EXTRACT = f"""
WITH {_SITEMAP_CTE},
smx AS (
  SELECT host, CAST(regexp_extract(host, '([0-9]+)', 1) AS INT) AS k
  FROM smh
  WHERE CAST(regexp_extract(host, '([0-9]+)', 1) AS INT) % 4 = 0
),
smxi AS (SELECT host, k, unnest(range(0, 2)) AS i FROM smx),
smxj AS (
  SELECT host, k, i, unnest(range(0, k % 2 + 2)) AS j FROM smxi
)
SELECT DISTINCT host,
  'https://' || host || '/sitemap-' || CAST(i AS VARCHAR) || '.xml'
    AS child_loc,
  'https://' || host || '/sx/'
    || CAST((k * 5 + i * 3 + j) % 12 AS VARCHAR) AS loc,
  CAST((k + i + j) % 12 + 1 AS INT) AS lastmod_month
FROM smxj
"""


def q_frontier_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merged discovery frontier — link-derived targets and
    sitemap-advertised URLs unified on their canonical keys (real
    crawlers run exactly this union: sitemaps surface pages no one
    links to yet), each key flagged with its discovery channel(s),
    anti-joined against the crawled set, and robots-gated. One
    full-outer join of two key frames + the broadcast verdict join.
    Output: (url_key, host, via_links, via_sitemap, allowed)."""
    from etl_finance_pipeline_spark.operators.corpus import (
        robots_gate,
        robots_rules,
        sitemap_parse,
        synthesize_robots,
        synthesize_sitemap,
        url_canonicalize,
    )

    pages, _anchors, tkeys = _frontier_candidates(spark, sf_dir)
    crawled = pages.select("url_key").distinct()
    hosts = tkeys.select("host").distinct()
    lf = tkeys.join(crawled, "url_key", "left_anti").withColumn(
        "via_links", F.lit(True)
    )
    sm = sitemap_parse(synthesize_sitemap(hosts))
    smk = (
        url_canonicalize(sm.select("host", F.col("loc").alias("url")))
        .select("url_key", "host")
        .distinct()
        .join(crawled, "url_key", "left_anti")
        .withColumn("via_sitemap", F.lit(True))
    )
    merged = (
        lf.join(smk, ["url_key", "host"], "full_outer")
        .fillna(False, ["via_links", "via_sitemap"])
    )
    rules = robots_rules(synthesize_robots(hosts))
    verdicts = robots_gate(
        merged.select("url_key", "host"), rules
    ).select("url_key", "host", "allowed")
    return merged.join(verdicts, ["url_key", "host"]).select(
        "url_key", "host", "via_links", "via_sitemap", "allowed"
    )


SQL_FRONTIER_MERGE = f"""
WITH {_CRAWL_URLS_CTE},
{_url_canon_ctes("curls", "doc_id", "fq")},
fcrawled AS (SELECT DISTINCT url_key FROM fqcanon),
ftgt AS (
  SELECT DISTINCT
    'src' || CAST((doc_id // 20) % (doc_id % 20 + 1) AS VARCHAR)
      || '.com/p/' || CAST(doc_id % 100 AS VARCHAR) AS url_key,
    'src' || CAST((doc_id // 20) % (doc_id % 20 + 1) AS VARCHAR)
      || '.com' AS domain
  FROM documents
  WHERE (doc_id // 20) % (doc_id % 20 + 1) <> doc_id % 20
  UNION
  SELECT DISTINCT
    'src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com/mirror',
    'src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com'
  FROM documents
  WHERE doc_id % 5 = 3
),
{_FRONTIER_CAND_CTE},
{_SITEMAP_CTE},
smf AS (
  SELECT DISTINCT host, url_key FROM sml
  WHERE url_key NOT IN (SELECT url_key FROM fcrawled)
),
mk AS (
  SELECT coalesce(l.url_key, s.url_key) AS url_key,
         coalesce(l.host, s.host) AS host,
         (l.url_key IS NOT NULL) AS via_links,
         (s.url_key IS NOT NULL) AS via_sitemap
  FROM fr l FULL OUTER JOIN smf s
    ON l.url_key = s.url_key AND l.host = s.host
),
mkv AS (
  SELECT url_key, host, via_links, via_sitemap,
         CAST(regexp_extract(host, '([0-9]+)', 1) AS INT) AS k,
         regexp_replace(url_key, '^[^/]*', '') AS path
  FROM mk
)
SELECT url_key, host, via_links, via_sitemap,
       {_sql_robots_allowed('k', 'path')} AS allowed
FROM mkv
"""


def q_recrawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl scheduling — the freshness loop a continuous crawl
    closes AFTER discovery: per canonical page, the observed refetch
    history (snapshot count, event-time span of the fetches) yields
    an estimated change interval, and pages bucket into hot/warm/cold
    refetch tiers (the Cho-Garcia-Molina change-rate recipe, with the
    uniform-change-rate estimate span/(n−1)). Single-fetch pages have
    no estimate and land in 'cold'. One map-combinable aggregate over
    the canonicalized crawl log. Output: (url_key, n_snapshots,
    span_min, interval_min, tier)."""
    from etl_finance_pipeline_spark.functions.scalar import (
        portable_round,
    )
    from etl_finance_pipeline_spark.operators.corpus import (
        url_canonicalize,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    log = url_canonicalize(
        docs.select(
            "doc_id",
            "source",
            _crawl_url_expr().alias("url"),
            (F.col("doc_id") % 360).cast("long").alias("ev_min"),
        )
    )
    agg = log.groupBy("url_key").agg(
        F.count("*").cast("long").alias("n_snapshots"),
        (F.max("ev_min") - F.min("ev_min")).cast("long").alias("span_min"),
    )
    interval = F.when(
        F.col("n_snapshots") > 1,
        portable_round(
            F.col("span_min") / (F.col("n_snapshots") - 1), 6
        ),
    )
    return (
        agg.withColumn("interval_min", interval)
        .withColumn(
            "tier",
            F.when(F.col("interval_min").isNull(), F.lit("cold"))
            .when(F.col("interval_min") <= 60, F.lit("hot"))
            .when(F.col("interval_min") <= 180, F.lit("warm"))
            .otherwise(F.lit("cold")),
        )
        .select("url_key", "n_snapshots", "span_min", "interval_min", "tier")
    )


SQL_RECRAWL_PRIORITY = f"""
WITH {_CRAWL_URLS_CTE},
{_url_canon_ctes("curls", "doc_id", "rc")},
rlog AS (
  SELECT url_key, doc_id % 360 AS ev_min FROM rccanon
),
ragg AS (
  SELECT url_key,
         CAST(count(*) AS BIGINT) AS n_snapshots,
         CAST(max(ev_min) - min(ev_min) AS BIGINT) AS span_min
  FROM rlog GROUP BY 1
)
SELECT url_key, n_snapshots, span_min,
  CASE WHEN n_snapshots > 1
       THEN floor(span_min / (n_snapshots - 1) * 1000000 + 0.5) / 1000000
       END AS interval_min,
  CASE WHEN n_snapshots <= 1 THEN 'cold'
       WHEN floor(span_min / (n_snapshots - 1) * 1000000 + 0.5) / 1000000 <= 60
         THEN 'hot'
       WHEN floor(span_min / (n_snapshots - 1) * 1000000 + 0.5) / 1000000 <= 180
         THEN 'warm'
       ELSE 'cold' END AS tier
FROM ragg
"""


def _directive_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`_crawl_pages` with page-level indexing directives
    injected (synthesize_directives: meta robots + rel=canonical) —
    the shared stage-0 of the directive family, materialized for the
    same CollapseProject reasons. Kept SEPARATE from _crawl_pages so
    the link/extract oracles keep their directive-free payload."""
    from etl_finance_pipeline_spark.operators.corpus import (
        synthesize_directives,
        synthesize_html,
        url_canonicalize,
    )

    docs = _docs_spread(spark, sf_dir)
    pages = synthesize_directives(synthesize_html(docs)).withColumn(
        "url", _crawl_url_expr()
    )
    return url_canonicalize(pages).localCheckpoint(eager=True)


def q_meta_robots_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-level robots meta directives (the HTML complement of the
    robots.txt gate a crawler honors AFTER fetching): per page, the
    parsed ``<meta name=robots>`` content and the OR-combined
    noindex / nofollow flags (``none`` ≡ both; ``all`` asserts
    nothing; quote/case variants planted by the fixture). The oracle
    derives every directive arithmetically from doc_id — a parse or
    token-combination bug fails the hash."""
    from etl_finance_pipeline_spark.operators.corpus import meta_robots

    out = meta_robots(_directive_pages(spark, sf_dir))
    return out.select("doc_id", "robots_content", "noindex", "nofollow_meta")


SQL_META_ROBOTS_AUDIT = """
SELECT doc_id,
  coalesce(
    CASE WHEN doc_id % 23 = 7 THEN 'none'
         WHEN doc_id % 11 = 4 THEN 'noindex'
         WHEN doc_id % 13 = 6 THEN 'nofollow, noarchive'
         WHEN doc_id % 19 = 3 THEN 'all' END,
    CASE WHEN doc_id % 29 = 11 THEN 'noai, noimageai' END
  ) AS robots_content,
  (doc_id % 23 = 7 OR doc_id % 11 = 4) AS noindex,
  (doc_id % 23 = 7
   OR (doc_id % 23 <> 7 AND doc_id % 11 <> 4 AND doc_id % 13 = 6))
    AS nofollow_meta
FROM documents
"""


def q_canonical_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-identity collapse (RFC 6596): each page's declared
    ``<link rel=canonical>`` target — resolved through the same
    RFC 3986 chain as link extraction, then reduced to the SURT-style
    identity key — overrides its own snapshot key, and pages group by
    that canonical identity (the dedup signal that folds syndicated
    copies and decorated variants onto one indexed page). Pages
    declaring nothing are self-canonical. One groupBy on the key —
    the same shuffle shape as URL dedup at 100 TB.

    Output: (canonical_key, n_pages, n_declared, representative)."""
    from etl_finance_pipeline_spark.operators.corpus import (
        canonical_links,
    )

    pages = _directive_pages(spark, sf_dir)
    decl = canonical_links(pages).select(
        "doc_id",
        F.lower(
            F.regexp_replace(
                F.regexp_replace(
                    F.col("link_url"), r"^[a-z][a-z0-9+.\-]*://", ""
                ),
                r"^www\.",
                "",
            )
        ).alias("_ck"),
    )
    keyed = (
        pages.select("doc_id", "url_key")
        .join(decl, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_ck"), F.col("url_key")).alias(
                "canonical_key"
            ),
            F.col("_ck").isNotNull().alias("_declared"),
        )
    )
    return keyed.groupBy("canonical_key").agg(
        F.count("*").cast("long").alias("n_pages"),
        F.sum(F.col("_declared").cast("long")).alias("n_declared"),
        F.min("doc_id").alias("representative"),
    )


SQL_CANONICAL_COLLAPSE = f"""
WITH {_CRAWL_URLS_CTE},
{_url_canon_ctes("curls", "doc_id", "cx")},
ckeys AS (
  SELECT doc_id,
    CASE
      WHEN doc_id % 6 = 2 THEN
        'src' || CAST(doc_id % 20 AS VARCHAR) || '.com/a.b/'
        || CAST(((doc_id % 100) * 3 + 7) % 100 AS VARCHAR)
      WHEN doc_id % 6 = 5 THEN
        (CASE WHEN doc_id % 4 = 0 THEN 'cdn.' ELSE '' END)
        || 'src' || CAST(doc_id % 20 AS VARCHAR) || '.com'
        || (CASE WHEN doc_id % 5 = 0 THEN ':8443' ELSE '' END)
        || '/canon/' || CAST(doc_id % 50 AS VARCHAR)
      ELSE url_key END AS canonical_key,
    (doc_id % 6 = 2 OR doc_id % 6 = 5) AS declared
  FROM cxcanon
)
SELECT canonical_key, CAST(count(*) AS BIGINT) AS n_pages,
  CAST(sum(CASE WHEN declared THEN 1 ELSE 0 END) AS BIGINT)
    AS n_declared,
  min(doc_id) AS representative
FROM ckeys GROUP BY 1
"""


def q_index_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index-admission funnel — the directive stack between
    "fetched" and "indexed" applied in the order a search/crawl
    pipeline applies it: robots.txt verdict on the page's OWN key
    (site-level), then meta-robots noindex (page-level), then
    canonical-self (pages deferring to another canonical are not
    indexed under their fetch key). Single-row cumulative census.
    Output: (n_crawled, n_robots_allowed, n_not_noindex,
    n_canonical_self)."""
    from etl_finance_pipeline_spark.operators.corpus import (
        canonical_links,
        meta_robots,
        robots_gate,
        robots_rules,
        synthesize_robots,
    )

    pages = meta_robots(_directive_pages(spark, sf_dir))
    decl = canonical_links(pages).select(
        "doc_id", F.lit(True).alias("_declared")
    )
    cand = pages.select("url_key").distinct()
    hosts = cand.select(
        F.regexp_extract(F.col("url_key"), r"^([^/]*)", 1).alias("host")
    ).distinct()
    rules = robots_rules(synthesize_robots(hosts))
    verdicts = robots_gate(cand, rules).select("url_key", "allowed")
    pg = (
        pages.select("doc_id", "url_key", "noindex")
        .join(decl, "doc_id", "left")
        .join(verdicts, "url_key")
    )
    ok1 = F.col("allowed")
    ok2 = ok1 & ~F.col("noindex")
    ok3 = ok2 & F.col("_declared").isNull()
    return pg.agg(
        F.count("*").cast("long").alias("n_crawled"),
        F.sum(ok1.cast("long")).alias("n_robots_allowed"),
        F.sum(ok2.cast("long")).alias("n_not_noindex"),
        F.sum(ok3.cast("long")).alias("n_canonical_self"),
    )


SQL_INDEX_GATE = """
SELECT CAST(count(*) AS BIGINT) AS n_crawled,
  CAST(sum(CASE WHEN doc_id % 20 <> 7 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_robots_allowed,
  CAST(sum(CASE WHEN doc_id % 20 <> 7
        AND NOT (doc_id % 23 = 7 OR doc_id % 11 = 4)
        THEN 1 ELSE 0 END) AS BIGINT) AS n_not_noindex,
  CAST(sum(CASE WHEN doc_id % 20 <> 7
        AND NOT (doc_id % 23 = 7 OR doc_id % 11 = 4)
        AND doc_id % 6 <> 2 AND doc_id % 6 <> 5
        THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical_self
FROM documents
"""


def q_edge_gate_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-edge admission census — BOTH nofollow gates the link
    graph applies before authority flows: per-link ``rel=nofollow``
    (paid placements) and page-level ``<meta name=robots
    content=nofollow>`` (ALL outlinks of the page dropped). The meta
    flags ride the same page scan as the anchor parse (no join).
    Output one row: (n_edges, n_rel_nofollow, n_meta_nofollow,
    n_ranked) with n_ranked = external ∧ neither gate."""
    from etl_finance_pipeline_spark.operators.corpus import (
        anchor_texts,
        meta_robots,
    )

    a = anchor_texts(meta_robots(_directive_pages(spark, sf_dir)))
    ranked = (
        F.col("is_external") & ~F.col("nofollow") & ~F.col("nofollow_meta")
    )
    return a.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum(F.col("nofollow").cast("long")).alias("n_rel_nofollow"),
        F.sum(F.col("nofollow_meta").cast("long")).alias(
            "n_meta_nofollow"
        ),
        F.sum(ranked.cast("long")).alias("n_ranked"),
    )


SQL_EDGE_GATE_CENSUS = f"""
WITH {_ANCHOR_CTE},
ag AS (
  SELECT aall.*,
    (doc_id % 23 = 7
     OR (doc_id % 23 <> 7 AND doc_id % 11 <> 4 AND doc_id % 13 = 6))
      AS mnf
  FROM aall
)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
  CAST(sum(CASE WHEN nofollow THEN 1 ELSE 0 END) AS BIGINT)
    AS n_rel_nofollow,
  CAST(sum(CASE WHEN mnf THEN 1 ELSE 0 END) AS BIGINT)
    AS n_meta_nofollow,
  CAST(sum(CASE WHEN is_external AND NOT nofollow AND NOT mnf
        THEN 1 ELSE 0 END) AS BIGINT) AS n_ranked
FROM ag
"""


def _redirect_key(k, p):
    return F.concat(
        F.lit("src"),
        k.cast("string"),
        F.lit(".com/a.b/"),
        p.cast("string"),
    )


def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution over the crawl's clean page-identity
    space (operators/corpus.py:redirect_resolve): a synthesized
    (src → dst) redirect relation — page p redirects (on every host)
    iff 3p % 7 = 2, to page (7k+3) % 100 on host (k+p+1) % 20 — is
    chased from every crawled identity through ≤ 4 bounded hops with
    per-row visited-set cycle detection and explicit terminal status
    (ok / cycle / too_many_hops), the fetch-log post-processing that
    keys frontier, dedup, and rank on the page that actually serves
    content. Each hop is one key-partitioned equi-join; the oracle
    unrolls the identical four hops in SQL."""
    from etl_finance_pipeline_spark.operators.corpus import (
        redirect_resolve,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    starts = docs.select(
        _redirect_key(F.col("doc_id") % 20, F.col("doc_id") % 100).alias(
            "url_key"
        )
    )
    k, p = F.col("k"), F.col("p")
    grid = (
        spark.range(20)
        .select(F.col("id").alias("k"))
        .select("k", F.explode(F.sequence(F.lit(0), F.lit(99))).alias("p"))
    )
    mapping = grid.filter((p * 3) % 7 == 2).select(
        _redirect_key(k, p).alias("src"),
        _redirect_key((k + p + 1) % 20, (k * 7 + 3) % 100).alias("dst"),
    )
    return redirect_resolve(starts, mapping)


def _sql_redirect_hops(n: int) -> str:
    """The n unrolled hop CTEs of the redirect-resolution oracle —
    h{i} advances every still-``ok`` row one edge, mirroring the
    engine's join-per-hop exactly (cycle check BEFORE the step)."""
    parts = []
    for i in range(1, n + 1):
        parts.append(f"""h{i} AS (
  SELECT src_key,
    CASE WHEN d IS NOT NULL AND NOT cyc THEN d ELSE f END AS f,
    CASE WHEN d IS NOT NULL AND NOT cyc THEN hops + 1 ELSE hops END
      AS hops,
    CASE WHEN cyc THEN 'cycle' ELSE status END AS status,
    CASE WHEN d IS NOT NULL AND NOT cyc THEN list_append(seen, d)
         ELSE seen END AS seen
  FROM (
    SELECT h.*, m.dst AS d,
      (m.dst IS NOT NULL AND list_contains(h.seen, m.dst)) AS cyc
    FROM h{i - 1} h LEFT JOIN rmap m
      ON h.status = 'ok' AND h.f = m.src
  )
)""")
    return ",\n".join(parts)


SQL_REDIRECT_RESOLVE = f"""
WITH rgrid AS (
  SELECT g1.range AS k, g2.range AS p
  FROM range(0, 20) g1 CROSS JOIN range(0, 100) g2
),
rmap AS (
  SELECT 'src' || CAST(k AS VARCHAR) || '.com/a.b/'
           || CAST(p AS VARCHAR) AS src,
         'src' || CAST((k + p + 1) % 20 AS VARCHAR) || '.com/a.b/'
           || CAST((k * 7 + 3) % 100 AS VARCHAR) AS dst
  FROM rgrid WHERE (p * 3) % 7 = 2
),
rstart AS (
  SELECT DISTINCT
    'src' || CAST(doc_id % 20 AS VARCHAR) || '.com/a.b/'
    || CAST(doc_id % 100 AS VARCHAR) AS k0
  FROM documents
),
h0 AS (
  SELECT k0 AS src_key, k0 AS f, 0 AS hops, 'ok' AS status,
         [k0] AS seen
  FROM rstart
),
{_sql_redirect_hops(4)}
SELECT r.src_key, r.f AS final_key, CAST(r.hops AS INT) AS hops,
  CASE WHEN m.dst IS NOT NULL AND r.status = 'ok'
       THEN 'too_many_hops' ELSE r.status END AS status
FROM h4 r LEFT JOIN rmap m ON r.status = 'ok' AND r.f = m.src
"""


def q_hreflang_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hreflang alternate extraction — the page-declared multilingual
    variant graph (``<link rel=alternate hreflang=…>``, both
    attribute orders planted): per declaring page, every (language,
    target) pair. The clusters are the parallel-document candidates
    bitext mining consumes and the per-language ledger multilingual
    balancing weighs. Oracle enumerates the declarations
    arithmetically from doc_id."""
    from etl_finance_pipeline_spark.operators.corpus import hreflang_links

    out = hreflang_links(_directive_pages(spark, sf_dir))
    return out.select("doc_id", "hreflang", "href")


SQL_HREFLANG_EXTRACT = """
SELECT doc_id,
  CASE j WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'fr'
         ELSE 'es' END AS hreflang,
  'https://src' || CAST(doc_id % 20 AS VARCHAR) || '.com/'
    || (CASE j WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'fr'
        ELSE 'es' END)
    || '/a.b/' || CAST(doc_id % 100 AS VARCHAR) AS href
FROM (
  SELECT doc_id, unnest(range(0, doc_id % 3 + 2)) AS j
  FROM documents WHERE doc_id % 4 = 1
)
"""


def q_hreflang_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language census of the hreflang variant graph — the
    multilingual-coverage ledger (how many pages declare a variant in
    each language, how many distinct targets that maps to): one
    map-combinable aggregate over the extraction. Output:
    (hreflang, n_pages, n_targets)."""
    from etl_finance_pipeline_spark.operators.corpus import hreflang_links

    out = hreflang_links(_directive_pages(spark, sf_dir))
    return out.groupBy("hreflang").agg(
        F.countDistinct("doc_id").cast("long").alias("n_pages"),
        F.countDistinct("href").cast("long").alias("n_targets"),
    )


SQL_HREFLANG_CENSUS = f"""
WITH hx AS ({SQL_HREFLANG_EXTRACT})
SELECT hreflang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT href) AS BIGINT) AS n_targets
FROM hx GROUP BY 1
"""


def q_revisit_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-refetch accounting over the snapshot log — the
    WARC ``revisit``-record economics (how much fetch bandwidth
    If-None-Match/ETag would have saved): per canonical page, order
    the refetches by event time and count the ones whose content
    fingerprint (sha-256 of the body) equals the PREVIOUS fetch's —
    those are the 304-eligible revisits. One window over the
    canonicalized log (partitioned by the page key — the same
    partitioning the dedup lanes shuffle on) + one map-combinable
    aggregate. Output: (url_key, n_snapshots, n_unchanged,
    revisit_ratio)."""
    from etl_finance_pipeline_spark.functions.scalar import (
        portable_round,
    )
    from etl_finance_pipeline_spark.operators.corpus import (
        url_canonicalize,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    log = url_canonicalize(
        docs.select(
            "doc_id",
            "source",
            "text",
            _crawl_url_expr().alias("url"),
            (F.col("doc_id") % 360).cast("long").alias("ev_min"),
        )
    ).withColumn("fp", F.sha2(F.col("text"), 256))
    w = Window.partitionBy("url_key").orderBy("ev_min", "doc_id")
    unchanged = (F.lag("fp").over(w) == F.col("fp")).cast("long")
    per = log.withColumn("_u", F.coalesce(unchanged, F.lit(0)))
    return per.groupBy("url_key").agg(
        F.count("*").cast("long").alias("n_snapshots"),
        F.sum("_u").alias("n_unchanged"),
        portable_round(
            F.sum("_u") / F.count("*"), 6
        ).alias("revisit_ratio"),
    )


SQL_REVISIT_CENSUS = f"""
WITH {_CRAWL_URLS_CTE},
{_url_canon_ctes("curls", "doc_id", "rv")},
rlog AS (
  SELECT c.doc_id, c.url_key, c.doc_id % 360 AS ev_min,
         sha256(d.text) AS fp
  FROM rvcanon c JOIN documents d ON c.doc_id = d.doc_id
),
rmark AS (
  SELECT url_key,
    CASE WHEN lag(fp) OVER (PARTITION BY url_key
           ORDER BY ev_min, doc_id) = fp THEN 1 ELSE 0 END AS u
  FROM rlog
)
SELECT url_key, CAST(count(*) AS BIGINT) AS n_snapshots,
  CAST(sum(u) AS BIGINT) AS n_unchanged,
  floor(sum(u) * 1.0 / count(*) * 1000000 + 0.5) / 1000000
    AS revisit_ratio
FROM rmark GROUP BY 1
"""


def q_stream_index_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-admission verdicts ON THE INGEST STREAM — per-page
    directive evaluation as pages arrive: file-stream → synthesize →
    canonicalize → meta-robots parse → canonical detection, with the
    robots.txt verdict supplied by a STATIC control-plane frame
    (robots caches are exactly that in production crawlers) via a
    stateless stream-static equi-join. Append mode, no watermark, no
    state store. Oracle derives every verdict arithmetically.

    Output per page: (doc_id, allowed, noindex, declared_canonical,
    indexable)."""
    import uuid

    from etl_finance_pipeline_spark.operators.corpus import (
        _CANONICAL_EL_RE,
        meta_robots,
        robots_gate,
        robots_rules,
        synthesize_directives,
        synthesize_html,
        synthesize_robots,
        url_canonicalize,
    )
    from etl_finance_pipeline_spark.sources.tables import ensure_nanos_conf

    spark = _narrow_session(spark, _stream_fanout_width(spark, cap=8))
    ensure_nanos_conf(spark)
    path = _t(sf_dir, "documents")
    # control plane: robots verdicts per crawled key, derived batch-side
    batch_pages = _directive_pages(spark, sf_dir)
    cand = batch_pages.select("url_key").distinct()
    hosts = cand.select(
        F.regexp_extract(F.col("url_key"), r"^([^/]*)", 1).alias("host")
    ).distinct()
    rules = robots_rules(synthesize_robots(hosts))
    verdicts = (
        robots_gate(cand, rules)
        .select("url_key", "allowed")
        .localCheckpoint(eager=True)
    )
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path[:-1] + "[t]")
    # NOT fanned out: unlike the stateless extract lanes, this chain
    # ends in a url_key JOIN, and streaming plans run without AQE — a
    # repartition before the join benched +39% here (measured)
    pages = url_canonicalize(
        synthesize_directives(synthesize_html(stream)).withColumn(
            "url", _crawl_url_expr()
        )
    )
    flagged = meta_robots(pages).withColumn(
        "declared_canonical",
        F.col("html").rlike(_CANONICAL_EL_RE),
    )
    out = flagged.join(verdicts, "url_key").select(
        "doc_id",
        "allowed",
        "noindex",
        "declared_canonical",
        (
            F.col("allowed")
            & ~F.col("noindex")
            & ~F.col("declared_canonical")
        ).alias("indexable"),
    )
    name = f"stream_idxgate_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.table(name)


SQL_STREAM_INDEX_GATE = """
SELECT doc_id,
  (doc_id % 20 <> 7) AS allowed,
  (doc_id % 23 = 7 OR doc_id % 11 = 4) AS noindex,
  (doc_id % 6 = 2 OR doc_id % 6 = 5) AS declared_canonical,
  (doc_id % 20 <> 7
   AND NOT (doc_id % 23 = 7 OR doc_id % 11 = 4)
   AND doc_id % 6 <> 2 AND doc_id % 6 <> 5) AS indexable
FROM documents
"""


#: the planted soft-404 body (no quotes — embedded in SQL literals)
_SOFT404_TEXT = (
    "404 Not Found. The page you requested does not exist "
    "or is no longer available."
)


def q_soft404_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-404 detection — error pages served with HTTP 200
    (operators/corpus.py:soft404_flag): pages ``doc_id % 31 == 9``
    are synthesized with an error template INSTEAD of their fixture
    prose, the jusText-lite extractor pulls the visible text, and the
    two-signal heuristic (error phrase ∧ short body) flags them. The
    oracle replays the byte-identical payload + extraction chain and
    the same phrase regex, so both the synthesis substitution and the
    detector are pinned end to end. Narrow map over the page scan —
    zero shuffles."""
    from etl_finance_pipeline_spark.operators.corpus import (
        html_extract,
        soft404_flag,
        synthesize_html,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    planted = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 31 == 9, F.lit(_SOFT404_TEXT)).otherwise(
            F.col("text")
        ),
    )
    out = soft404_flag(html_extract(synthesize_html(planted)))
    return out.select(
        "doc_id", "body_chars", "has_error_phrase", "is_short", "is_soft404"
    )


def _soft404_sql() -> str:
    from etl_finance_pipeline_spark.operators.corpus import SOFT404_RE

    return f"""
WITH s4src AS (
  SELECT doc_id, source, lang,
    CASE WHEN doc_id % 31 = 9 THEN '{_SOFT404_TEXT}' ELSE text END
      AS text
  FROM documents
),
{_html_pay_cte("s4_pay", src="s4src")},
{_html_extract_ctes("s4_pay", p="s4")}
SELECT doc_id, CAST(length(text) AS BIGINT) AS body_chars,
  regexp_matches(text, '{SOFT404_RE}') AS has_error_phrase,
  (length(text) < 150) AS is_short,
  (regexp_matches(text, '{SOFT404_RE}') AND length(text) < 150)
    AS is_soft404
FROM s4docs
"""


def q_ai_optout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AI-training opt-out honoring — the TDM declaration layer a
    training-data pipeline must respect BEFORE any quality gate
    (``<meta name=robots content="noai, noimageai">``, the
    DeviantArt/Bing convention): per page, the parsed opt-out flags
    (``noai`` implies ``noimageai``) — the rows the corpus build
    EXCLUDES regardless of their quality scores. Oracle derives the
    flags arithmetically from the planted fixture."""
    from etl_finance_pipeline_spark.operators.corpus import meta_robots

    out = meta_robots(_directive_pages(spark, sf_dir))
    return out.select("doc_id", "noai", "noimageai")


SQL_AI_OPTOUT_AUDIT = """
SELECT doc_id,
  (doc_id % 29 = 11) AS noai,
  (doc_id % 29 = 11) AS noimageai
FROM documents
"""


def q_license_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """License-aware curation census (``<link rel=license>``, HTML
    spec): pages grouped by their declared license code with the
    train-eligibility verdict license filtering applies (NC-licensed
    content excluded from commercial training corpora; undeclared
    pages pass to the default-policy gate). One map-combinable
    aggregate over the parse. Output: (license_code, n_pages,
    train_eligible)."""
    from etl_finance_pipeline_spark.operators.corpus import license_links

    out = license_links(_directive_pages(spark, sf_dir))
    return out.groupBy("license_code").agg(
        F.count("*").cast("long").alias("n_pages"),
        F.first(
            ~F.coalesce(
                F.col("license_code").contains("nc"), F.lit(False)
            )
        ).alias("train_eligible"),
    )


SQL_LICENSE_CENSUS = """
SELECT
  CASE WHEN doc_id % 9 = 2 THEN 'by-sa'
       WHEN doc_id % 9 = 5 THEN 'by-nc' END AS license_code,
  CAST(count(*) AS BIGINT) AS n_pages,
  coalesce(NOT contains(
    CASE WHEN doc_id % 9 = 2 THEN 'by-sa'
         WHEN doc_id % 9 = 5 THEN 'by-nc' END, 'nc'), true)
    AS train_eligible
FROM documents
GROUP BY 1, 3
"""


def q_crawl_maintain_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous-crawl maintenance readout — one row unifying
    the round's whole loop, each count produced by the REAL operator
    chain it names (the composition twin of corpus_build_e2e, for the
    crawl side): fetch log size → distinct canonical pages →
    redirect-resolved identities that moved → 304-eligible refetches
    (revisit accounting) → pages admitted to the index (robots ∧
    ¬noindex ∧ canonical-self) → robots-allowed newly-discovered
    frontier keys (links ∪ sitemaps) → pages due hot recrawl. Every
    branch is a single-row aggregate crossJoined onto the readout —
    driver state is seven scalars."""
    # Build the component lanes CONCURRENTLY (r14, guide §2.6): each
    # constructor runs eager localCheckpoint jobs (recrawl log, the
    # directive-page frame, the crawl-page + anchor frames) that
    # previously serialized ~5 s of the query's ~7.5 s before the
    # readout job even started. The lanes are independent (each builds
    # its own frames and touches no shared driver state), and every
    # future is consumed in a fixed order, so the readout row is
    # byte-identical.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_rp = pool.submit(
            lambda: q_recrawl_priority(spark, sf_dir).localCheckpoint(
                eager=True
            )
        )
        f_rr = pool.submit(q_redirect_resolve, spark, sf_dir)
        f_rv = pool.submit(q_revisit_census, spark, sf_dir)
        f_ig = pool.submit(q_index_gate, spark, sf_dir)
        f_fm = pool.submit(q_frontier_merge, spark, sf_dir)
        rp = f_rp.result()
        redirect = f_rr.result()
        revisit = f_rv.result()
        index_gate = f_ig.result()
        frontier = f_fm.result()

    n_fetches = (
        load_table(spark, _t(sf_dir, "documents"))
        .agg(F.count("*").cast("long").alias("n_fetches"))
    )
    n_pages = rp.agg(F.count("*").cast("long").alias("n_pages"))
    n_redirected = (
        redirect
        .filter(F.col("hops") > 0)
        .agg(F.count("*").cast("long").alias("n_redirected"))
    )
    n_not_modified = revisit.agg(
        F.sum("n_unchanged").cast("long").alias("n_not_modified")
    )
    n_indexable = index_gate.select(
        F.col("n_canonical_self").alias("n_indexable")
    )
    n_frontier_new = (
        frontier
        .filter(F.col("allowed"))
        .agg(F.count("*").cast("long").alias("n_frontier_new"))
    )
    n_recrawl_hot = rp.filter(F.col("tier") == "hot").agg(
        F.count("*").cast("long").alias("n_recrawl_hot")
    )
    out = n_fetches
    for piece in (
        n_pages,
        n_redirected,
        n_not_modified,
        n_indexable,
        n_frontier_new,
        n_recrawl_hot,
    ):
        out = out.crossJoin(piece)
    return out


SQL_CRAWL_MAINTAIN_E2E = f"""
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_fetches,
  (SELECT CAST(count(*) AS BIGINT) FROM ({SQL_RECRAWL_PRIORITY}))
    AS n_pages,
  (SELECT CAST(count(*) AS BIGINT) FROM ({SQL_REDIRECT_RESOLVE})
   WHERE hops > 0) AS n_redirected,
  (SELECT CAST(sum(n_unchanged) AS BIGINT)
   FROM ({SQL_REVISIT_CENSUS})) AS n_not_modified,
  (SELECT n_canonical_self FROM ({SQL_INDEX_GATE})) AS n_indexable,
  (SELECT CAST(count(*) AS BIGINT) FROM ({SQL_FRONTIER_MERGE})
   WHERE allowed) AS n_frontier_new,
  (SELECT CAST(count(*) AS BIGINT) FROM ({SQL_RECRAWL_PRIORITY})
   WHERE tier = 'hot') AS n_recrawl_hot
"""


def q_link_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 3986 dot-segment + query-only resolution, oracle-pinned
    (round-12 verdict item 4): pages planted with every relative
    shape the main fixture never produces — ``../``, ``../../``,
    ``./``, triple ``../``, mid-path ``x/../``, and a query-only
    reference — run through the real extraction chain
    (operators/corpus.py:link_extract → _remove_dot_segments). The
    oracle derives each resolved URL ARITHMETICALLY from doc_id (no
    regex replay), so any bend in the bounded §5.2.4 rewrite chain
    fails the hash. This is what makes ``a.com/x/../p`` and
    ``a.com/p`` the same frontier/dedup key. Zero shuffles — one
    narrow projection chain."""
    from etl_finance_pipeline_spark.operators.corpus import link_extract

    docs = load_table(spark, _t(sf_dir, "documents"))
    d = F.col("doc_id")
    n = (d % 5).cast("string")
    base = F.concat(
        F.lit("https://src"),
        (d % 20).cast("string"),
        F.lit(".com/a/b/c/page"),
        (d % 10).cast("string"),
    )
    href = (
        F.when(d % 6 == 0, F.concat(F.lit("../up/"), n))
        .when(d % 6 == 1, F.concat(F.lit("../../"), n))
        .when(d % 6 == 2, F.concat(F.lit("./here/"), n))
        .when(d % 6 == 3, F.concat(F.lit("../../../deep/"), n))
        .when(d % 6 == 4, F.concat(F.lit("x/../y"), n))
        .otherwise(F.concat(F.lit("?page="), n))
    )
    pages = docs.select(
        "doc_id",
        base.alias("url_canon"),
        F.concat(F.lit('<a href="'), href, F.lit('">X</a>')).alias(
            "html"
        ),
    )
    return link_extract(pages).select(
        "doc_id", "href", "link_url", "link_domain", "is_external"
    )


SQL_LINK_RESOLVE = """
SELECT doc_id,
  CASE doc_id % 6
    WHEN 0 THEN '../up/' || CAST(doc_id % 5 AS VARCHAR)
    WHEN 1 THEN '../../' || CAST(doc_id % 5 AS VARCHAR)
    WHEN 2 THEN './here/' || CAST(doc_id % 5 AS VARCHAR)
    WHEN 3 THEN '../../../deep/' || CAST(doc_id % 5 AS VARCHAR)
    WHEN 4 THEN 'x/../y' || CAST(doc_id % 5 AS VARCHAR)
    ELSE '?page=' || CAST(doc_id % 5 AS VARCHAR)
  END AS href,
  'https://src' || CAST(doc_id % 20 AS VARCHAR) || '.com' ||
  CASE doc_id % 6
    WHEN 0 THEN '/a/b/up/' || CAST(doc_id % 5 AS VARCHAR)
    WHEN 1 THEN '/a/' || CAST(doc_id % 5 AS VARCHAR)
    WHEN 2 THEN '/a/b/c/here/' || CAST(doc_id % 5 AS VARCHAR)
    WHEN 3 THEN '/deep/' || CAST(doc_id % 5 AS VARCHAR)
    WHEN 4 THEN '/a/b/c/y' || CAST(doc_id % 5 AS VARCHAR)
    ELSE '/a/b/c/page' || CAST(doc_id % 10 AS VARCHAR)
         || '?page=' || CAST(doc_id % 5 AS VARCHAR)
  END AS link_url,
  'src' || CAST(doc_id % 20 AS VARCHAR) || '.com' AS link_domain,
  false AS is_external
FROM documents
"""


def q_table_qa_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-grounding sample prep — the standard path from extracted
    HTML tables to table-QA training data: every BODY cell pairs with
    its column header (self-join on (doc, table, col) against the
    header row — one slim shuffle) and renders a deterministic
    question/answer sample, emitted as an md5 fingerprint + lengths
    (the FIM/span-corruption device: verify the render, don't ship
    megabytes through the driver). The oracle enumerates headers and
    cells arithmetically from the fixture recipe."""
    from etl_finance_pipeline_spark.operators.corpus import html_tables

    docs = load_table(spark, _t(sf_dir, "documents"))
    cells = html_tables(_table_page(docs))
    headers = cells.filter(F.col("is_header")).select(
        "doc_id",
        "table_idx",
        "col_idx",
        F.col("cell").alias("header"),
    )
    body = cells.filter(~F.col("is_header"))
    qa = body.join(headers, ["doc_id", "table_idx", "col_idx"])
    question = F.concat(
        F.lit("In document "),
        F.col("doc_id").cast("string"),
        F.lit(" table "),
        F.col("table_idx").cast("string"),
        F.lit(", what is "),
        F.col("header"),
        F.lit(" in row "),
        F.col("row_idx").cast("string"),
        F.lit("?"),
    )
    return qa.select(
        "doc_id",
        "table_idx",
        "row_idx",
        "col_idx",
        F.md5(F.concat(question, F.lit("\x1f"), F.col("cell"))).alias(
            "sample_md5"
        ),
        F.length(question).cast("long").alias("q_chars"),
        F.length("cell").cast("long").alias("a_chars"),
    )


SQL_TABLE_QA_SAMPLES = """
WITH qdim AS (
  SELECT doc_id, doc_id % 3 + 2 AS nrows, doc_id % 2 + 2 AS ncols
  FROM documents WHERE doc_id % 5 <> 4
),
qrows AS (
  SELECT doc_id, ncols, unnest(range(1, nrows + 1)) AS row_idx FROM qdim
),
qcells AS (
  SELECT doc_id, row_idx, unnest(range(0, ncols)) AS col_idx FROM qrows
),
qa AS (
  SELECT doc_id, row_idx, col_idx,
    'In document ' || CAST(doc_id AS VARCHAR)
      || ' table 0, what is h' || CAST(col_idx AS VARCHAR)
      || ' in row ' || CAST(row_idx AS VARCHAR) || '?' AS question,
    'r' || CAST(row_idx AS VARCHAR) || 'c' || CAST(col_idx AS VARCHAR)
      || 'v' || CAST((doc_id * 7 + row_idx * 3 + col_idx) % 97 AS VARCHAR)
      || (CASE WHEN row_idx = 1 AND col_idx = 0 THEN ' & co' ELSE '' END)
      AS answer
  FROM qcells
)
SELECT doc_id, CAST(0 AS INT) AS table_idx,
       CAST(row_idx AS INT) AS row_idx, CAST(col_idx AS INT) AS col_idx,
       md5(question || chr(31) || answer) AS sample_md5,
       CAST(len(question) AS BIGINT) AS q_chars,
       CAST(len(answer) AS BIGINT) AS a_chars
FROM qa
"""


def _html_extract_ctes(
    src: str,
    keys: str = "doc_id, source, lang",
    p: str = "hx",
    joiner: str = " ",
    html_col: str = "html",
) -> str:
    """``{p}_clean → {p}_blocks → {p}docs`` CTE chain: the DuckDB
    twin of html_extract over CTE *src* (which must expose *keys* +
    *html_col*), generated from the SAME regex constants the Spark
    operator compiles so the two engines run the byte-identical
    chain. ``{p}docs`` exposes (keys..., text=extracted).
    array_to_string of an empty list is NULL in DuckDB where Spark's
    array_join is '' — hence the coalesces."""
    from etl_finance_pipeline_spark.operators.corpus import (
        HTML_BLOCK_SPLIT_RE,
        HTML_ENTITY_RULES,
        HTML_MAX_LINK_DENSITY,
        HTML_STRIP_RES,
    )

    # the regex constants are interpolated into single-quoted SQL
    # literals UNescaped (doubling quotes inside a regex would change
    # the pattern) — so a quote in any of them is a build error here,
    # not silently broken oracle SQL downstream
    for pat in (*HTML_STRIP_RES, HTML_BLOCK_SPLIT_RE):
        if "'" in pat:
            raise ValueError(
                f"HTML regex constant contains a single quote: {pat!r}"
            )

    def _q(s: str) -> str:
        return s.replace("'", "''")

    strip = html_col
    for pat in HTML_STRIP_RES:
        strip = f"regexp_replace({strip}, '{pat}', ' ', 'g')"

    def _unesc(expr: str) -> str:
        for ent, rep in HTML_ENTITY_RULES:
            expr = f"replace({expr}, '{_q(ent)}', '{_q(rep)}')"
        return expr

    j = "chr(10)" if joiner == "\n" else f"'{joiner}'"
    return f"""{p}_clean AS (
  SELECT {keys}, {strip} AS h FROM {src}
),
{p}_blocks AS (
  SELECT {keys},
    list_filter(
      list_transform(
        regexp_split_to_array(h, '{HTML_BLOCK_SPLIT_RE}'),
        b -> struct_pack(
          t := trim(regexp_replace({_unesc("regexp_replace(b, '<[^>]*>', ' ', 'g')")}, '\\s+', ' ', 'g')),
          l := trim(regexp_replace({_unesc("regexp_replace(coalesce(array_to_string(regexp_extract_all(b, '(?is)<a[^>]*>(.*?)</a>', 1), ' '), ''), '<[^>]*>', ' ', 'g')")}, '\\s+', ' ', 'g'))
        )
      ),
      s -> len(s.t) > 0 AND CAST(len(s.l) AS DOUBLE) <= CAST(len(s.t) AS DOUBLE) * {HTML_MAX_LINK_DENSITY}
    ) AS ks
  FROM {p}_clean
),
{p}docs AS (
  SELECT {keys},
    coalesce(array_to_string(list_transform(ks, s -> s.t), {j}), '') AS text
  FROM {p}_blocks
)"""


def _html_sql_ctes(joiner: str = " ") -> str:
    """``hx_pay → hx_clean → hx_blocks → hxdocs``: synthesized
    payload + extraction over the documents fixture (the composed
    form every HTML-lane oracle uses)."""
    return (
        _html_pay_cte()
        + ",\n"
        + _html_extract_ctes("hx_pay", joiner=joiner)
    )


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation stage 0: main-text extraction from raw HTML. The
    payload is synthesized deterministically around the fixture text
    (the media lanes' build-the-bytes-in-engine device, applied to
    markup: head/script/style noise, nav, per-id ad/pagination
    variants, a link-heavy footer), then the jusText-lite extractor
    strips invisible regions, splits at block tags, and keeps only
    low-link-density non-empty blocks — one codegen projection chain,
    zero shuffles. The DuckDB oracle replays the identical regex
    chain over the identical payload bytes."""
    from etl_finance_pipeline_spark.operators.corpus import (
        html_extract,
        synthesize_html,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    return html_extract(synthesize_html(docs)).select("doc_id", "text")


SQL_HTML_EXTRACT = f"""
WITH {_html_sql_ctes()}
SELECT doc_id, text FROM hxdocs
"""

SQL_SOFT404_AUDIT = _soft404_sql()


def _table_page(docs: DataFrame) -> DataFrame:
    """Synthesized page WITH a data table — the html_tables fixture
    device: the standard synthesize_html page gains, just before its
    footer, a ``<table>`` of (2 + id%3) body rows × (2 + id%2)
    columns under a ``<th>`` header row. Cell (r, c) carries
    ``r{r}c{c}v{(id·7 + r·3 + c) % 97}``; cell (1, 0) additionally
    carries an encoded ``&amp;`` and cell (1, 1) inline ``<b>``
    markup, so tag-strip + entity-unescape are exercised inside
    cells. Documents with id%5==4 get NO table (the zero-rows path).
    Every byte is a function of id, so the oracle can enumerate the
    expected cells ARITHMETICALLY — independent of the extraction
    regex chain."""
    from etl_finance_pipeline_spark.operators.corpus import synthesize_html

    d = F.col("doc_id")
    nrows = d % 3 + 2
    ncols = d % 2 + 2
    header = F.concat(
        F.lit("<tr>"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), ncols - 1),
                lambda c: F.concat(
                    F.lit('<th class="h">h'), c.cast("string"), F.lit("</th>")
                ),
            ),
            "",
        ),
        F.lit("</tr>"),
    )

    def _cell(r, c):
        v = (d * 7 + r * 3 + c) % 97
        base = F.concat(
            F.lit("r"),
            r.cast("string"),
            F.lit("c"),
            c.cast("string"),
            F.lit("v"),
            v.cast("string"),
        )
        body = (
            F.when((r == 1) & (c == 0), F.concat(base, F.lit(" &amp; co")))
            .when((r == 1) & (c == 1), F.concat(F.lit("<b>"), base, F.lit("</b>")))
            .otherwise(base)
        )
        return F.concat(F.lit("<td>"), body, F.lit("</td>"))

    body_rows = F.array_join(
        F.transform(
            F.sequence(F.lit(1), nrows),
            lambda r: F.concat(
                F.lit("<tr>"),
                F.array_join(
                    F.transform(F.sequence(F.lit(0), ncols - 1), lambda c: _cell(r, c)),
                    "",
                ),
                F.lit("</tr>"),
            ),
        ),
        "",
    )
    table = F.when(d % 5 == 4, F.lit("")).otherwise(
        F.concat(F.lit('<table class="data">'), header, body_rows, F.lit("</table>"))
    )
    pages = synthesize_html(docs)
    return pages.withColumn(
        "html",
        F.regexp_replace(
            F.col("html"), "<footer", F.concat(table, F.lit("<footer"))
        ),
    )


def q_html_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-data extraction (operators/corpus.py:html_tables):
    every <table> on the synthesized pages unfolds into one row per
    cell with (table_idx, row_idx, col_idx, is_header, cell) — cells
    tag-stripped, entity-unescaped, ws-normalized. The oracle
    ENUMERATES the expected cells arithmetically from the fixture
    recipe, independent of the regex chain, so any parse defect
    (missed cell, shifted index, unstripped markup) hash-fails."""
    from etl_finance_pipeline_spark.operators.corpus import html_tables

    docs = load_table(spark, _t(sf_dir, "documents"))
    return html_tables(_table_page(docs))


SQL_HTML_TABLES = """
WITH tdim AS (
  SELECT doc_id, doc_id % 3 + 2 AS nrows, doc_id % 2 + 2 AS ncols
  FROM documents WHERE doc_id % 5 <> 4
),
trows AS (
  SELECT doc_id, ncols, unnest(range(0, nrows + 1)) AS row_idx FROM tdim
),
tcells AS (
  SELECT doc_id, row_idx, unnest(range(0, ncols)) AS col_idx FROM trows
)
SELECT doc_id,
       CAST(0 AS INT) AS table_idx,
       CAST(row_idx AS INT) AS row_idx,
       CAST(col_idx AS INT) AS col_idx,
       (row_idx = 0) AS is_header,
       CASE WHEN row_idx = 0 THEN 'h' || CAST(col_idx AS VARCHAR)
            ELSE 'r' || CAST(row_idx AS VARCHAR)
                 || 'c' || CAST(col_idx AS VARCHAR)
                 || 'v' || CAST((doc_id * 7 + row_idx * 3 + col_idx) % 97
                                AS VARCHAR)
                 || (CASE WHEN row_idx = 1 AND col_idx = 0 THEN ' & co'
                     ELSE '' END)
       END AS cell
FROM tcells
"""


def q_html_table_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cells-per-doc census of html_tables: per document, table
    count, total cells, header cells, and body-row count — the
    volume readout that sizes a table-QA lane before cells are
    rendered into training samples. Documents without tables
    contribute no rows (the extraction emits none)."""
    from etl_finance_pipeline_spark.operators.corpus import html_tables

    docs = load_table(spark, _t(sf_dir, "documents"))
    cells = html_tables(_table_page(docs))
    return cells.groupBy("doc_id").agg(
        F.countDistinct("table_idx").cast("long").alias("n_tables"),
        F.count("*").cast("long").alias("n_cells"),
        F.sum(F.col("is_header").cast("long"))
        .cast("long")
        .alias("n_header_cells"),
        F.countDistinct(F.when(~F.col("is_header"), F.col("row_idx")))
        .cast("long")
        .alias("n_body_rows"),
    )


SQL_HTML_TABLE_CENSUS = """
SELECT doc_id,
       CAST(1 AS BIGINT) AS n_tables,
       CAST((doc_id % 3 + 3) * (doc_id % 2 + 2) AS BIGINT) AS n_cells,
       CAST(doc_id % 2 + 2 AS BIGINT) AS n_header_cells,
       CAST(doc_id % 3 + 2 AS BIGINT) AS n_body_rows
FROM documents WHERE doc_id % 5 <> 4
"""


def q_html_c4_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extractor → C4 composition: blocks come out of html_extract as
    NEWLINE-joined lines, so c4_clean's line filter (≥5 words; the
    terminal-punctuation rule is off — the fixture corpus carries
    none) judges each extracted block independently — the 2-word
    <h1> block dies, the prose block survives, and the document
    keeps/drops on what's left. This is the funnel order every web
    pipeline runs: extract first, THEN line-level cleaning."""
    from etl_finance_pipeline_spark.operators.corpus import (
        c4_clean,
        html_extract,
        synthesize_html,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    hx = html_extract(synthesize_html(docs), block_joiner="\n").select(
        "doc_id", "text"
    )
    out = c4_clean(
        hx, min_words=5, require_terminal=False, min_kept_lines=1, joiner=" "
    )
    return out.select(
        "doc_id", "n_lines", "kept_lines", "c4_drop", "drop_reason", "text"
    )


SQL_HTML_C4_GATE = f"""
WITH {_html_sql_ctes(joiner=chr(10))},
hcl AS (
  SELECT doc_id, lines[i] AS line, i AS pos
  FROM (
    SELECT doc_id, string_split(text, chr(10)) AS lines,
           unnest(generate_series(1, len(string_split(text, chr(10))))) AS i
    FROM hxdocs
  )
),
hct AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines FROM hcl GROUP BY 1),
hck AS (
  SELECT doc_id, pos, line FROM hcl
  WHERE len(regexp_split_to_array(trim(line), '\\s+')) >= 5
),
hcf AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_lines,
         string_agg(line, ' ' ORDER BY pos) AS clean
  FROM hck GROUP BY 1
),
hcr AS (
  SELECT d.doc_id,
         coalesce(hct.n_lines, 0) AS n_lines,
         coalesce(hcf.kept_lines, 0) AS kept_lines,
         hcf.clean,
         CASE
           WHEN position('{{' IN lower(d.text)) > 0 THEN 'bad_substring'
           WHEN position('lorem ipsum' IN lower(d.text)) > 0 THEN 'bad_substring'
           WHEN coalesce(hcf.kept_lines, 0) < 1 THEN 'too_few_lines'
           ELSE 'kept'
         END AS drop_reason
  FROM hxdocs d
  LEFT JOIN hct ON hct.doc_id = d.doc_id
  LEFT JOIN hcf ON hcf.doc_id = d.doc_id
)
SELECT doc_id, n_lines, kept_lines,
       (drop_reason != 'kept') AS c4_drop,
       drop_reason,
       CASE WHEN drop_reason = 'kept' THEN clean END AS text
FROM hcr
"""


def q_stream_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML main-text extraction on the INGEST STREAM — the shape a
    crawl pipeline actually deploys stage 0 in: a file-stream over
    raw pages through the same synthesize + extract projection chain
    (fully stateless and narrow: no watermark, no state store, append
    mode). Oracle = the batch extraction query, because the lane is a
    pure per-row map."""
    import uuid

    from etl_finance_pipeline_spark.operators.corpus import (
        html_extract,
        synthesize_html,
    )
    from etl_finance_pipeline_spark.sources.tables import ensure_nanos_conf

    spark = _narrow_session(spark, 8)
    ensure_nanos_conf(spark)
    path = _t(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path[:-1] + "[t]")
    # extraction regexes are the cost; the file source is one task —
    # spread the stateless chain (the stream_curation_route device)
    stream = stream.repartition(_stream_fanout_width(spark, cap=8))
    out = html_extract(synthesize_html(stream)).select("doc_id", "text")
    name = f"stream_htmlx_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.table(name)


SQL_STREAM_HTML_EXTRACT = SQL_HTML_EXTRACT


def q_web_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WEB-curation funnel (Penedo et al. 2023's RefinedWeb stage
    order) in one report pass, now starting from RAW HTML: stage 0
    extracts main text from the synthesized markup payloads
    (jusText-lite), then every downstream gate — (a) the URL/domain
    blocklist, (b) the language gate (n-gram lang-ID = en), (c) the
    Gopher structural rules, (d) exact dedup — evaluates over the
    EXTRACTED text, each predicate independently over the corpus and
    intersected for the final keep count (the single-pass semantics
    one report can honestly compute, as with curation_funnel).
    Output: one row of stage counts."""
    from etl_finance_pipeline_spark.operators.corpus import (
        canonical_host,
        html_extract,
        registrable_domain,
        synthesize_html,
    )
    from etl_finance_pipeline_spark.operators.text_analysis import (
        gopher_rules,
        language_id,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    docs_x = html_extract(synthesize_html(docs)).select(
        "doc_id", "source", "lang", "text"
    )
    domain = registrable_domain(canonical_host(_url_expr()))
    dflag = (~domain.isin(_URL_BLOCKLIST)).cast("int")
    # ONE extract pass (r14, guide §2.4): language_id/gopher_rules are
    # narrow per-row maps — joining their flags back by doc_id
    # re-executed the docs_x extract chain per lane; exact-keep is the
    # same set expressed as min(doc_id) over a text window.
    flags = (
        gopher_rules(language_id(docs_x))
        .select(
            (F.length("text") > 0).cast("int").alias("_xk"),
            dflag.alias("_dk"),
            (F.col("pred_lang") == "en").cast("int").alias("_lk"),
            (
                F.col("rule_word_count")
                & F.col("rule_mean_word_len")
                & F.col("rule_symbol_ratio")
                & F.col("rule_alpha_words")
            ).cast("int").alias("_qk"),
            (
                F.col("doc_id")
                == F.min("doc_id").over(Window.partitionBy("text"))
            ).cast("int").alias("_ek"),
        )
    )
    return flags.agg(
        F.count("*").cast("long").alias("n_raw"),
        F.sum("_xk").cast("long").alias("n_extract"),
        F.sum("_dk").cast("long").alias("n_domain"),
        F.sum("_lk").cast("long").alias("n_lang"),
        F.sum("_qk").cast("long").alias("n_quality"),
        F.sum("_ek").cast("long").alias("n_exact"),
        F.sum(
            F.col("_xk") * F.col("_dk") * F.col("_lk") * F.col("_qk") * F.col("_ek")
        )
        .cast("long")
        .alias("n_final"),
    )


SQL_WEB_CURATION_FUNNEL = f"""
WITH {_html_sql_ctes()},
{_URL_CTE.strip()},
wfe AS (SELECT min(doc_id) AS doc_id FROM hxdocs GROUP BY text),
wfl AS (
  SELECT d.doc_id,
    CASE WHEN len(d.text) > 0 THEN 1 ELSE 0 END AS xk,
    CASE WHEN doms.domain NOT IN ({", ".join(f"'{b}'" for b in _URL_BLOCKLIST)})
         THEN 1 ELSE 0 END AS dk,
    CASE WHEN lid.pred_lang = 'en' THEN 1 ELSE 0 END AS lk,
    CASE WHEN gq.rule_word_count AND gq.rule_mean_word_len
          AND gq.rule_symbol_ratio AND gq.rule_alpha_words
         THEN 1 ELSE 0 END AS qk,
    CASE WHEN wfe.doc_id IS NOT NULL THEN 1 ELSE 0 END AS ek
  FROM hxdocs d
  JOIN doms ON doms.doc_id = d.doc_id
  JOIN ({SQL_LANG_ID.replace("FROM documents", "FROM hxdocs").strip()}) lid
    ON lid.doc_id = d.doc_id
  JOIN ({SQL_GOPHER_QUALITY.replace("FROM documents", "FROM hxdocs").strip()}) gq
    ON gq.doc_id = d.doc_id
  LEFT JOIN wfe ON wfe.doc_id = d.doc_id
)
SELECT CAST(count(*) AS BIGINT) AS n_raw,
       CAST(sum(xk) AS BIGINT) AS n_extract,
       CAST(sum(dk) AS BIGINT) AS n_domain,
       CAST(sum(lk) AS BIGINT) AS n_lang,
       CAST(sum(qk) AS BIGINT) AS n_quality,
       CAST(sum(ek) AS BIGINT) AS n_exact,
       CAST(sum(xk * dk * lk * qk * ek) AS BIGINT) AS n_final
FROM wfl
"""


# --------------------------------------------------------------------
# End-to-end corpus build (the LLM-side flagship composition)
# --------------------------------------------------------------------

_CB_CAP = 256  # FFD bin capacity (tokens) for the e2e packing stage
_CB_SHARDS = 4
_CB_SEED = 11


def q_corpus_build_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nightly corpus-build lane END-TO-END, one oracle-backed
    query — the LLM-side analog of ``pipeline_e2e_fused``: raw HTML →
    jusText-lite extraction → curation gates (non-empty extract,
    domain blocklist, lang-ID = en, Gopher structural rules, exact
    dedup canonical) → MinHash-LSH near-dup clusters with
    QUALITY-AWARE canonical selection → DoReMi mixture weights
    learned ON the survivors and deployed as the hash sampling gate →
    deterministic shuffle-shard → first-fit-decreasing bin packing
    WITHIN each output shard → per-shard emission stats. Every stage
    is an already-verified operator; what this query adds is the
    CROSS-STAGE CONTRACT (a canonical-rewrite column rename or a gate
    re-keying breaks here even when each per-stage oracle stays
    green).

    Scale shape: the funnel is narrow maps + doc-keyed joins; dedup
    is the banded LSH (never all-pairs); DoReMi's corpus work is one
    fixed-point logprob aggregate (k weights are a control-plane
    collect); the shuffle+pack is one hash shuffle and the per-shard
    Arrow FFD kernel. Two localCheckpoints cut the multi-consumer
    frames (funnel survivors feed 4 consumers; canonical feeds 2).

    Output: (shard, n_docs, n_tokens, n_bins, fill_frac) — the
    training-shard manifest a real run would write next to the data.
    """
    from etl_finance_pipeline_spark.operators.corpus import (
        canonical_host,
        html_extract,
        registrable_domain,
        synthesize_html,
    )

    docs = _docs_spread(spark, sf_dir)
    hx = html_extract(synthesize_html(docs)).select(
        "doc_id", "source", "lang", "text"
    )
    dkeep = ~registrable_domain(canonical_host(_url_expr())).isin(
        _URL_BLOCKLIST
    )
    return _corpus_build_chain(hx, dkeep)


def _corpus_build_chain(
    hx: DataFrame, dkeep, return_packed: bool = False
) -> DataFrame:
    """Gates → quality canonical → DoReMi gate → shuffle-shard → FFD
    pack → per-shard manifest, over an EXTRACTED-text frame
    (doc_id, source, lang, text) with *dkeep* the domain-gate boolean
    evaluated against it — shared by the HTML-payload and
    WARC-record flagships. ``return_packed`` exposes the per-document
    bin assignment frame instead of the manifest (the frame a real
    run WRITES as shards — test_training_data pins that path through
    the transactional table format)."""
    from etl_finance_pipeline_spark.operators.corpus import (
        pack_bins,
        shuffle_shard,
    )
    from etl_finance_pipeline_spark.operators.graph import (
        connected_components,
    )
    from etl_finance_pipeline_spark.operators.text_analysis import (
        gopher_rules,
        language_id,
    )

    # ONE pass over the extracted frame (r14, guide §2.4): language_id
    # and gopher_rules are narrow per-row maps, so joining their flags
    # back by doc_id re-executed the whole hx extract chain once per
    # lane (4 evaluations + 3 doc_id shuffles in the cbdocs job —
    # measured 5.9 s of the flagship's 13.9 s). Inline the flags on one
    # lineage and express exact-keep as min(doc_id) over a text window
    # (same set as the old groupBy+left-join: the min is taken over ALL
    # extracted rows, before any gate, exactly as before). 4 hx
    # evaluations -> 1, 4 exchanges -> 1.
    flagged = gopher_rules(language_id(hx)).select(
        "doc_id",
        "source",
        "lang",
        "text",
        (F.length("text") > 0).alias("_xk"),
        dkeep.alias("_dk"),
        (F.col("pred_lang") == "en").alias("_lk"),
        (
            F.col("rule_word_count")
            & F.col("rule_mean_word_len")
            & F.col("rule_symbol_ratio")
            & F.col("rule_alpha_words")
        ).alias("_qk"),
    )
    cbdocs = (
        flagged.withColumn(
            "_ek",
            F.col("doc_id")
            == F.min("doc_id").over(Window.partitionBy("text")),
        )
        .filter(
            F.col("_xk")
            & F.col("_dk")
            & F.col("_lk")
            & F.col("_qk")
            & F.col("_ek")
        )
        .select("doc_id", "source", "lang", "text")
        .localCheckpoint(eager=True)  # feeds LSH, quality, loss, gate
    )

    pairs = minhash_lsh_pairs(cbdocs).filter(F.col("est_jaccard") >= 0.5)
    comp = connected_components(pairs).select(
        F.col("id").alias("doc_id"), "component"
    )
    # quality_score is a narrow per-row map: compute it inline on the
    # broadcast-joined frame instead of joining it back by doc_id —
    # the old join re-read the checkpointed cbdocs a second time and
    # paid a doc_id exchange for per-row arithmetic (r14, guide §2.4).
    member = quality_score(
        cbdocs.join(F.broadcast(comp), "doc_id", "left")
    ).select(
        "doc_id",
        "source",
        "text",
        F.coalesce("component", "doc_id").alias("component"),
        _pr("quality", 6).alias("_q"),
    )
    best = member.groupBy("component").agg(
        F.max_by(
            F.col("doc_id"),
            F.struct(F.col("_q"), (-F.col("doc_id")).alias("_nid")),
        ).alias("_keep")
    )
    canon = (
        member.join(F.broadcast(best), "component")
        .filter(F.col("doc_id") == F.col("_keep"))
        .select("doc_id", "source", "text")
        .localCheckpoint(eager=True)  # feeds the loss agg AND the gate
    )

    weights = {
        r["source"]: float(r["weight"])
        for r in _doremi_eg(_doremi_src_loss(canon)).collect()
    }
    gated = _doremi_gate(canon, weights)

    sharded = shuffle_shard(
        gated.select(
            "doc_id",
            F.size(F.split("text", r"\s+")).cast("long").alias("n_tokens"),
        ),
        num_shards=_CB_SHARDS,
        seed=_CB_SEED,
    )
    packed = pack_bins(sharded, seq_tokens=_CB_CAP, shard_col="shard")
    if return_packed:
        return packed
    per_bin = packed.groupBy("shard", "bin_id").agg(
        F.count("*").alias("_docs"), F.max("bin_fill").alias("_fill")
    )
    return (
        per_bin.groupBy("shard")
        .agg(
            F.sum("_docs").cast("long").alias("n_docs"),
            F.sum("_fill").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_bins"),
            _pr(
                F.sum("_fill") / (F.count("*") * _CB_CAP), 6
            ).alias("fill_frac"),
        )
        .select(
            F.col("shard").cast("int").alias("shard"),
            "n_docs",
            "n_tokens",
            "n_bins",
            "fill_frac",
        )
    )


def _corpus_build_sql(head_ctes: str) -> str:
    """Full corpus-build oracle: *head_ctes* must define
    ``cbdocs(doc_id, source, lang, text)`` — the gated, extracted
    survivor frame; the shared tail runs LSH clusters → quality
    canonical → DoReMi EG + gate → shuffle-shard → recursive FFD →
    the per-shard manifest."""
    return f"""
WITH RECURSIVE {head_ctes},
{_SHINGLES_CTE.replace("FROM documents", "FROM cbdocs").strip()},
{_SIG_CTE.strip()},
bands AS (
  {_BANDS_SQL}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, k1, k2, k3, k4)
  WHERE a.doc_id < b.doc_id
),
near AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN sig a ON a.doc_id = c.id_a
  JOIN sig b ON b.doc_id = c.id_b
  WHERE ({_EQ_TERMS}) / 16.0 >= 0.5
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM near
  UNION
  SELECT id_b AS src, id_a AS dst FROM near
),
reach AS (
  SELECT src AS id, src AS r FROM edges
  UNION
  SELECT e.dst AS id, reach.r
  FROM reach JOIN edges e ON e.src = reach.id
),
comp AS (
  SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
),
ndq AS ({SQL_QUALITY_SCORE.replace("FROM documents", "FROM cbdocs").strip()}),
ndm AS (
  SELECT d.doc_id, d.source, d.text,
         coalesce(c.component, d.doc_id) AS component,
         q.quality
  FROM cbdocs d
  LEFT JOIN comp c ON c.doc_id = d.doc_id
  JOIN ndq q ON q.doc_id = d.doc_id
),
canon AS MATERIALIZED (
  SELECT doc_id, source, text FROM (
    SELECT doc_id, source, text,
           row_number() OVER (
             PARTITION BY component ORDER BY quality DESC, doc_id
           ) AS rn
    FROM ndm
  ) WHERE rn = 1
),
{_dm_loss_ctes("cdm", "canon")},
{_dm_eg_ctes("cdm", "cdmsrc")},
cbw AS ({_dm_final_select("cdm")}),
cbgate AS (
  SELECT c.doc_id, c.text
  FROM canon c JOIN cbw w ON w.source = c.source
  WHERE {_H64.format(s="CAST(c.doc_id AS VARCHAR)")} % 1000000
        < CAST(floor(w.weight * 1000000 + 0.5) AS BIGINT)
),
cbsh AS (
  SELECT CAST({_H64.format(s=f"CAST(doc_id AS VARCHAR) || '#shuffle{_CB_SEED}'")}
              % {_CB_SHARDS} AS INT) AS shard,
         doc_id,
         CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens
  FROM cbgate
),
{_pack_bins_ctes("cbp", "cbsh", _CB_CAP)},
cbbin AS (
  SELECT shard, bin_id, CAST(count(*) AS BIGINT) AS docs,
         max(bin_fill) AS fill
  FROM cbpout GROUP BY 1, 2
)
SELECT shard,
       CAST(sum(docs) AS BIGINT) AS n_docs,
       CAST(sum(fill) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_bins,
       floor(sum(fill) * 1.0 / (count(*) * {_CB_CAP}) * 1000000 + 0.5)
         / 1000000 AS fill_frac
FROM cbbin GROUP BY 1
"""


_CB_HTML_HEAD = f"""{_html_sql_ctes()},
{_URL_CTE.strip()},
cbex AS (SELECT min(doc_id) AS doc_id FROM hxdocs GROUP BY text),
cbdocs AS MATERIALIZED (
  SELECT d.doc_id, d.source, d.lang, d.text
  FROM hxdocs d
  JOIN doms ON doms.doc_id = d.doc_id
  JOIN ({SQL_LANG_ID.replace("FROM documents", "FROM hxdocs").strip()}) lid
    ON lid.doc_id = d.doc_id
  JOIN ({SQL_GOPHER_QUALITY.replace("FROM documents", "FROM hxdocs").strip()}) gq
    ON gq.doc_id = d.doc_id
  JOIN cbex ON cbex.doc_id = d.doc_id
  WHERE len(d.text) > 0
    AND doms.domain NOT IN ({", ".join(f"'{b}'" for b in _URL_BLOCKLIST)})
    AND lid.pred_lang = 'en'
    AND gq.rule_word_count AND gq.rule_mean_word_len
    AND gq.rule_symbol_ratio AND gq.rule_alpha_words
)"""

SQL_CORPUS_BUILD_E2E = _corpus_build_sql(_CB_HTML_HEAD)


# --------------------------------------------------------------------
# WARC-style crawl-record parsing (curation stage -1)
# --------------------------------------------------------------------

_WARC_BLOBS = 32  # crawl files per corpus in the synthetic lane

_CRLF = "chr(13) || chr(10)"
_CRLF2 = "chr(13) || chr(10) || chr(13) || chr(10)"



def _warc_parse_ctes() -> str:
    """``wpay → urls → wrec → wblob → wrecs → wparse`` CTE chain: the
    DuckDB twin of synthesize_html + synthesize_warc + warc_parse —
    build the record envelopes, concatenate per blob in id order,
    then split at the record magic and recover each payload by
    Content-Length framing from the header terminator."""
    cl = "TRY_CAST(regexp_extract(r, 'Content-Length: ([0-9]+)', 1) AS BIGINT)"
    return f"""{_html_pay_cte("wpay")},
{_CRAWL_URLS_CTE},
wrec AS (
  SELECT d.doc_id % {_WARC_BLOBS} AS blob_id, d.doc_id,
         'WARC/1.0' || {_CRLF} || 'WARC-Type: response' || {_CRLF}
         || 'WARC-Record-ID: <urn:doc:' || CAST(d.doc_id AS VARCHAR) || '>' || {_CRLF}
         || 'WARC-Target-URI: ' || u.url || {_CRLF}
         || 'Content-Length: ' || CAST(len(d.html) AS VARCHAR) || {_CRLF} || {_CRLF}
         || d.html || {_CRLF} || {_CRLF} AS rec
  FROM wpay d JOIN curls u USING (doc_id)
),
wblob AS (
  SELECT blob_id, string_agg(rec, '' ORDER BY doc_id) AS warc
  FROM wrec GROUP BY 1
),
wrecs AS (
  SELECT unnest(list_filter(
    string_split_regex(warc, 'WARC/1\\.0\\r\\n'), r -> len(r) > 0)) AS r
  FROM wblob
),
wparse AS (
  SELECT TRY_CAST(regexp_extract(r, '<urn:doc:([0-9]+)>', 1) AS BIGINT) AS doc_id,
         regexp_extract(r, 'WARC-Target-URI: ([^\\r]+)', 1) AS uri,
         {cl} AS content_length,
         substr(r, strpos(r, {_CRLF2}) + 4, coalesce({cl}, 0)) AS payload,
         coalesce(CAST(len(r) AS BIGINT)
                  = CAST(strpos(r, {_CRLF2}) + 7 AS BIGINT) + {cl}, false)
           AS length_ok
  FROM wrecs
)"""


def _warc_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → synthesized HTML pages with url + blob grouping —
    the input a crawl writer would have had."""
    from etl_finance_pipeline_spark.operators.corpus import synthesize_html

    docs = _docs_spread(spark, sf_dir)
    return (
        synthesize_html(docs)
        # crawl-shaped URLs WITH snapshot structure (scheme/case/
        # tracking noise over a shared page identity) so the WARC
        # funnel's stage −0.5 — URL canonicalize + URL-level dedup —
        # has real refetches to collapse
        .withColumn("url", _crawl_url_expr())
        .withColumn(
            "blob_id", (F.col("doc_id") % _WARC_BLOBS).cast("int")
        )
    )


def q_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation stage −1: crawl-record (WARC-style) parsing. The
    payload device one framing level below html_extract: pages are
    wrapped in deterministic record envelopes and concatenated into
    multi-record blobs IN-ENGINE (synthesize_warc), then the parser
    splits the blobs back into records, reads the headers, recovers
    each payload by Content-Length framing (length_ok flags any
    framing damage), and hands the payload to the jusText-lite
    extractor — the raw-crawl-to-text front door, entirely string
    primitives, zero UDFs. The DuckDB oracle replays the identical
    build + parse + extract chain."""
    from etl_finance_pipeline_spark.operators.corpus import (
        html_extract,
        synthesize_warc,
        warc_parse,
    )

    parsed = warc_parse(synthesize_warc(_warc_pages(spark, sf_dir)))
    out = html_extract(parsed, html_col="payload", out_col="text")
    return out.select(
        "doc_id", "uri", "content_length", "length_ok", "text"
    )


SQL_WARC_EXTRACT = f"""
WITH {_warc_parse_ctes()},
{_html_extract_ctes("wparse", "doc_id, uri, content_length, length_ok", "wx", " ", "payload")}
SELECT doc_id, uri, content_length, length_ok, text FROM wxdocs
"""


def q_stream_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage −1 on the INGEST STREAM — the shape a crawl pipeline
    actually runs: blobs ARRIVE as files (built in batch here — blobs
    are the stream's input by definition, not its output), and the
    record parse + Content-Length framing + jusText-lite extraction
    run as one stateless narrow chain per file (no watermark, no
    state store, append mode). Oracle = the batch warc_extract query,
    because the lane is a pure per-record map."""
    import shutil
    import tempfile
    import uuid

    from etl_finance_pipeline_spark.operators.corpus import (
        html_extract,
        synthesize_warc,
        warc_parse,
    )
    from etl_finance_pipeline_spark.sources.tables import ensure_nanos_conf

    spark = _narrow_session(spark, 8)
    ensure_nanos_conf(spark)
    blobs = synthesize_warc(_warc_pages(spark, sf_dir))
    tmp = tempfile.mkdtemp(prefix="warc_stream_")
    try:
        blobs.write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = spark.readStream.schema(schema).parquet(tmp)
        parsed = warc_parse(stream)
        # the record explode is cheap but the extraction regexes are
        # not, and the blob source is a couple of scan tasks — spread
        # the stateless chain (the stream_curation_route device)
        parsed = parsed.repartition(_stream_fanout_width(spark, cap=8))
        out = html_extract(parsed, html_col="payload", out_col="text").select(
            "doc_id", "uri", "content_length", "length_ok", "text"
        )
        name = f"stream_warcx_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _await_stream(q)
        return spark.table(name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


#: the streaming lane emits the SAME rows as the batch parse+extract
SQL_STREAM_WARC_EXTRACT = SQL_WARC_EXTRACT


def q_warc_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The web-curation funnel FROM RAW CRAWL RECORDS: stage −1
    parses the WARC-style blobs (framing check), stage 0 extracts
    main text from each recovered payload, and every downstream gate
    — domain blocklist over the PARSED Target-URI (not a synthesized
    column), stage −0.5 URL-level dedup (canonical-key keep-first
    across crawl snapshots), lang-ID, Gopher rules, exact dedup —
    evaluates over the extracted text. source/lang metadata joins in
    by the parsed record id (the crawl catalog lookup a real
    pipeline does). Output: one row of stage counts, n_records down
    to n_final."""
    from etl_finance_pipeline_spark.operators.corpus import (
        canonical_host,
        html_extract,
        registrable_domain,
        synthesize_warc,
        url_canonicalize,
        warc_parse,
    )
    from etl_finance_pipeline_spark.operators.text_analysis import (
        gopher_rules,
        language_id,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    parsed = warc_parse(synthesize_warc(_warc_pages(spark, sf_dir)))
    wx = html_extract(parsed, html_col="payload", out_col="text")
    meta = wx.join(docs.select("doc_id", "source", "lang"), "doc_id")
    dflag = (
        ~registrable_domain(canonical_host(F.col("uri"))).isin(
            _URL_BLOCKLIST
        )
    ).cast("int")
    # stage −0.5: URL-level keep-first across snapshots, evaluated on
    # the raw parsed URI (before any content gate, as deployed) — one
    # slim window shuffle keyed by the canonical identity key
    uk = (
        url_canonicalize(parsed.select("doc_id", F.col("uri").alias("url")))
        .select(
            "doc_id",
            (
                F.col("doc_id")
                == F.min("doc_id").over(Window.partitionBy("url_key"))
            )
            .cast("int")
            .alias("_uk"),
        )
    )
    # ONE parse+extract pass (r14, guide §2.4): language_id and
    # gopher_rules are narrow per-row maps — joining their flags back
    # by doc_id re-executed the warc_parse→html_extract→catalog-join
    # chain once per lane; exact-keep is the same set expressed as
    # min(doc_id) over a text window.
    flags = (
        gopher_rules(language_id(meta))
        .select(
            "doc_id",
            F.col("length_ok").cast("int").alias("_fk"),
            (F.length("text") > 0).cast("int").alias("_xk"),
            dflag.alias("_dk"),
            (F.col("pred_lang") == "en").cast("int").alias("_lk"),
            (
                F.col("rule_word_count")
                & F.col("rule_mean_word_len")
                & F.col("rule_symbol_ratio")
                & F.col("rule_alpha_words")
            ).cast("int").alias("_qk"),
            (
                F.col("doc_id")
                == F.min("doc_id").over(Window.partitionBy("text"))
            ).cast("int").alias("_ek"),
        )
        .join(uk, "doc_id")
    )
    return flags.agg(
        F.count("*").cast("long").alias("n_records"),
        F.sum("_fk").cast("long").alias("n_framed"),
        F.sum("_xk").cast("long").alias("n_extract"),
        F.sum("_dk").cast("long").alias("n_domain"),
        F.sum("_uk").cast("long").alias("n_urldedup"),
        F.sum("_lk").cast("long").alias("n_lang"),
        F.sum("_qk").cast("long").alias("n_quality"),
        F.sum("_ek").cast("long").alias("n_exact"),
        F.sum(
            F.col("_fk")
            * F.col("_xk")
            * F.col("_dk")
            * F.col("_uk")
            * F.col("_lk")
            * F.col("_qk")
            * F.col("_ek")
        )
        .cast("long")
        .alias("n_final"),
    )


SQL_WARC_CURATION_FUNNEL = f"""
WITH {_warc_parse_ctes()},
{_html_extract_ctes("wparse", "doc_id, uri, content_length, length_ok", "wx", " ", "payload")},
wmeta AS (
  SELECT w.doc_id, d.source, d.lang, w.text, w.uri, w.length_ok
  FROM wxdocs w JOIN documents d USING (doc_id)
),
wuri AS (SELECT doc_id, uri AS url FROM wxdocs),
{_URL_CTE_DOMS.replace("FROM urls", "FROM wuri").strip()},
wuq AS (SELECT doc_id, uri AS url FROM wparse),
{_url_canon_ctes("wuq", "doc_id", "wu")},
wuk AS (
  SELECT doc_id,
         CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY url_key)
              THEN 1 ELSE 0 END AS uk
  FROM wucanon
),
wfex AS (SELECT min(doc_id) AS doc_id FROM wmeta GROUP BY text),
wffl AS (
  SELECT m.doc_id,
    CASE WHEN m.length_ok THEN 1 ELSE 0 END AS fk,
    CASE WHEN len(m.text) > 0 THEN 1 ELSE 0 END AS xk,
    CASE WHEN doms.domain NOT IN ({", ".join(f"'{b}'" for b in _URL_BLOCKLIST)})
         THEN 1 ELSE 0 END AS dk,
    wuk.uk AS uk,
    CASE WHEN lid.pred_lang = 'en' THEN 1 ELSE 0 END AS lk,
    CASE WHEN gq.rule_word_count AND gq.rule_mean_word_len
          AND gq.rule_symbol_ratio AND gq.rule_alpha_words
         THEN 1 ELSE 0 END AS qk,
    CASE WHEN wfex.doc_id IS NOT NULL THEN 1 ELSE 0 END AS ek
  FROM wmeta m
  JOIN doms ON doms.doc_id = m.doc_id
  JOIN wuk ON wuk.doc_id = m.doc_id
  JOIN ({SQL_LANG_ID.replace("FROM documents", "FROM wmeta").strip()}) lid
    ON lid.doc_id = m.doc_id
  JOIN ({SQL_GOPHER_QUALITY.replace("FROM documents", "FROM wmeta").strip()}) gq
    ON gq.doc_id = m.doc_id
  LEFT JOIN wfex ON wfex.doc_id = m.doc_id
)
SELECT CAST(count(*) AS BIGINT) AS n_records,
       CAST(sum(fk) AS BIGINT) AS n_framed,
       CAST(sum(xk) AS BIGINT) AS n_extract,
       CAST(sum(dk) AS BIGINT) AS n_domain,
       CAST(sum(uk) AS BIGINT) AS n_urldedup,
       CAST(sum(lk) AS BIGINT) AS n_lang,
       CAST(sum(qk) AS BIGINT) AS n_quality,
       CAST(sum(ek) AS BIGINT) AS n_exact,
       CAST(sum(fk * xk * dk * uk * lk * qk * ek) AS BIGINT) AS n_final
FROM wffl
"""


def q_outlink_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain outlink census FROM RAW CRAWL RECORDS — the link
    side of the WARC pipeline: stage −1 parses the blobs, the parsed
    Target-URI canonicalizes to the page's base URL, link_extract
    pulls and resolves every <a href> in the recovered payload, and
    one aggregate rolls up per page domain: total links, external
    links, and distinct external target domains — the census that
    sizes the crawl graph before domain_authority ranks it (and the
    e2e hook proving link extraction rides the real parse path, not
    just synthesized pages). The oracle derives the counts
    INDEPENDENTLY from the fixture arithmetic."""
    from etl_finance_pipeline_spark.operators.corpus import (
        link_extract,
        synthesize_warc,
        url_canonicalize,
        warc_parse,
    )

    parsed = warc_parse(synthesize_warc(_warc_pages(spark, sf_dir)))
    canon = url_canonicalize(
        parsed.select("doc_id", "payload", F.col("uri").alias("url"))
    )
    links = link_extract(canon, html_col="payload")
    return links.groupBy(F.col("page_domain").alias("domain")).agg(
        F.count("*").cast("long").alias("n_links"),
        F.sum(F.col("is_external").cast("long"))
        .cast("long")
        .alias("n_external"),
        F.countDistinct(F.when(F.col("is_external"), F.col("link_domain")))
        .cast("long")
        .alias("n_ext_domains"),
    )


# per-doc link counts from the same fixture arithmetic the
# domain_authority oracle uses: 8 fixed anchors (3 nav + 2 share +
# 2 footer + 1 partner) + the id%3 variant (buy / p1,p2 / local) +
# the id%5=3 mirror; external = partner-when-cross-domain + mirror
SQL_OUTLINK_CENSUS = """
WITH per AS (
  SELECT doc_id,
    'src' || CAST(doc_id % 20 AS VARCHAR) || '.com' AS domain,
    8 + (CASE doc_id % 3 WHEN 1 THEN 1 WHEN 2 THEN 2 ELSE 1 END)
      + (CASE WHEN doc_id % 5 = 3 THEN 1 ELSE 0 END)
      + (CASE WHEN doc_id % 7 = 1 THEN 1 ELSE 0 END) AS n_links,
    (CASE WHEN (doc_id // 20) % (doc_id % 20 + 1) <> doc_id % 20
          THEN 1 ELSE 0 END)
      + (CASE WHEN doc_id % 5 = 3 THEN 1 ELSE 0 END)
      -- sponsored target (3d+5)%20 never equals d%20 (parity), so
      -- the d%7==1 placement is always cross-domain
      + (CASE WHEN doc_id % 7 = 1 THEN 1 ELSE 0 END) AS n_external
  FROM documents
),
agg AS (
  SELECT domain,
         CAST(sum(n_links) AS BIGINT) AS n_links,
         CAST(sum(n_external) AS BIGINT) AS n_external
  FROM per GROUP BY 1
),
ext AS (
  SELECT 'src' || CAST(doc_id % 20 AS VARCHAR) || '.com' AS domain,
         'src' || CAST((doc_id // 20) % (doc_id % 20 + 1) AS VARCHAR)
           || '.com' AS tgt
  FROM documents
  WHERE (doc_id // 20) % (doc_id % 20 + 1) <> doc_id % 20
  UNION ALL
  SELECT 'src' || CAST(doc_id % 20 AS VARCHAR) || '.com',
         'src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com'
  FROM documents
  WHERE doc_id % 5 = 3
  UNION ALL
  SELECT 'src' || CAST(doc_id % 20 AS VARCHAR) || '.com',
         'src' || CAST((doc_id * 3 + 5) % 20 AS VARCHAR) || '.com'
  FROM documents
  WHERE doc_id % 7 = 1
),
extd AS (
  SELECT domain, count(DISTINCT tgt) AS n_ext_domains FROM ext GROUP BY 1
)
SELECT a.domain, a.n_links, a.n_external,
       CAST(coalesce(e.n_ext_domains, 0) AS BIGINT) AS n_ext_domains
FROM agg a LEFT JOIN extd e USING (domain)
"""


def q_corpus_build_e2e_warc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME nightly corpus build run from RAW CRAWL RECORDS:
    stage −1 (WARC-style record parse; misframed records quarantined
    by the length_ok gate BEFORE any content gate) feeds the identical
    gates → quality canonical → DoReMi gate → shuffle-shard → FFD
    chain as corpus_build_e2e — so the full crawl-file → training-
    shards path is one verified query, with the domain gate evaluating
    the PARSED Target-URI rather than a synthesized column.
    source/lang metadata joins by the parsed record id (the crawl
    catalog lookup)."""
    from etl_finance_pipeline_spark.operators.corpus import (
        canonical_host,
        html_extract,
        registrable_domain,
        synthesize_warc,
        url_canonicalize,
        warc_parse,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    parsed = warc_parse(synthesize_warc(_warc_pages(spark, sf_dir))).filter(
        F.col("length_ok")
    )
    # stage −0.5: URL-level keep-first dedup across crawl snapshots,
    # BEFORE text extraction — refetches are pruned at header cost so
    # the extractor and every content gate never see them. One window
    # shuffle keyed by the canonical URL key (slim columns only).
    keep = (
        url_canonicalize(parsed.select("doc_id", F.col("uri").alias("url")))
        .withColumn(
            "_m", F.min("doc_id").over(Window.partitionBy("url_key"))
        )
        .filter(F.col("doc_id") == F.col("_m"))
        .select("doc_id")
    )
    wx = html_extract(
        parsed.join(keep, "doc_id"), html_col="payload", out_col="text"
    )
    hx = wx.join(docs.select("doc_id", "source", "lang"), "doc_id").select(
        "doc_id", "source", "lang", "text", "uri"
    )
    dkeep = ~registrable_domain(canonical_host(F.col("uri"))).isin(
        _URL_BLOCKLIST
    )
    return _corpus_build_chain(hx, dkeep)


_CB_WARC_HEAD = f"""{_warc_parse_ctes()},
{_html_extract_ctes("wparse", "doc_id, uri, content_length, length_ok", "wx", " ", "payload")},
cwuq AS (SELECT doc_id, uri AS url FROM wparse WHERE length_ok),
{_url_canon_ctes("cwuq", "doc_id", "cu")},
cwin AS (SELECT min(doc_id) AS doc_id FROM cucanon GROUP BY url_key),
cwmx AS (
  SELECT w.doc_id, d.source, d.lang, w.text, w.uri
  FROM wxdocs w
  JOIN cwin USING (doc_id)
  JOIN documents d USING (doc_id)
  WHERE w.length_ok
),
cwuri AS (SELECT doc_id, uri AS url FROM cwmx),
{_URL_CTE_DOMS.replace("FROM urls", "FROM cwuri").strip()},
cbex AS (SELECT min(doc_id) AS doc_id FROM cwmx GROUP BY text),
cbdocs AS MATERIALIZED (
  SELECT d.doc_id, d.source, d.lang, d.text
  FROM cwmx d
  JOIN doms ON doms.doc_id = d.doc_id
  JOIN ({SQL_LANG_ID.replace("FROM documents", "FROM cwmx").strip()}) lid
    ON lid.doc_id = d.doc_id
  JOIN ({SQL_GOPHER_QUALITY.replace("FROM documents", "FROM cwmx").strip()}) gq
    ON gq.doc_id = d.doc_id
  JOIN cbex ON cbex.doc_id = d.doc_id
  WHERE len(d.text) > 0
    AND doms.domain NOT IN ({", ".join(f"'{b}'" for b in _URL_BLOCKLIST)})
    AND lid.pred_lang = 'en'
    AND gq.rule_word_count AND gq.rule_mean_word_len
    AND gq.rule_symbol_ratio AND gq.rule_alpha_words
)"""

SQL_CORPUS_BUILD_E2E_WARC = _corpus_build_sql(_CB_WARC_HEAD)





# --------------------------------------------------------------------
# CCNet perplexity bucketing (head/middle/tail terciles)
# --------------------------------------------------------------------

def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail split at exact perplexity terciles —
    cuts computed over the 6-dp-rounded ppl (identical in both
    engines), interpolated-percentile parity per order_percentiles."""
    from etl_finance_pipeline_spark.operators.ngram_lm import ccnet_buckets

    docs = load_table(spark, _t(sf_dir, "documents"))
    return ccnet_buckets(docs, discount=_KN_D)


SQL_CCNET_BUCKETS = f"""
WITH {_KN_BASE_SQL},
knppl AS MATERIALIZED (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         floor(avg(log2(p)) * 1000000 + 0.5) / 1000000 AS avg_logprob,
         floor(pow(2.0, -avg(log2(p))) * 1000000 + 0.5) / 1000000 AS ppl
  FROM knbig
  JOIN knlm USING (w1, w2)
  GROUP BY doc_id
),
kncut AS (
  SELECT quantile_cont(ppl, [1.0/3.0, 2.0/3.0]) AS c FROM knppl
)
SELECT doc_id, n_bigrams, avg_logprob, ppl,
       CASE WHEN ppl <= c[1] THEN 'head'
            WHEN ppl <= c[2] THEN 'middle'
            ELSE 'tail' END AS bucket
FROM knppl CROSS JOIN kncut
"""


def q_signal_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the quality signals agree? Pearson correlation between the
    heuristic quality score and the KN-LM avg log-probability per
    document — the sanity check a curation pipeline runs before
    trusting either filter. Both signals are 6-dp-rounded BEFORE the
    moment sums so the engines correlate identical inputs; one
    doc-keyed join + one 1-row moment aggregate."""
    from etl_finance_pipeline_spark.operators.ngram_lm import kn_perplexity
    from etl_finance_pipeline_spark.operators.text_analysis import quality_score

    docs = load_table(spark, _t(sf_dir, "documents"))
    q = quality_score(docs).select(
        "doc_id", _pr("quality", 6).alias("_x")
    )
    k = kn_perplexity(docs, discount=_KN_D).select(
        "doc_id", F.col("avg_logprob").alias("_y")
    )
    j = q.join(k, "doc_id")
    m = j.agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    r = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / F.sqrt(
        (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
        * (F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy"))
    )
    return m.select(
        F.col("_n").cast("long").alias("n_docs"),
        _pr(r, 6).alias("pearson_r"),
    )


def q_embedding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding sanity audit: per-vector L2 norm plus a corpus-level
    3-sigma outlier flag (degenerate or exploded vectors are the
    first thing a SemDeDup/ANN pipeline should quarantine). Norms are
    6-dp-rounded before the corpus moments so both engines flag from
    identical inputs; moments ride back as a broadcast 1-row
    aggregate."""
    from etl_finance_pipeline_spark.operators.similarity import _as_double, l2_norm

    emb = _as_double(load_table(spark, _t(sf_dir, "embeddings")), "embedding")
    norms = emb.select(
        "vec_id", _pr(l2_norm(F.col("embedding")), 6).alias("norm")
    )
    stats = norms.agg(
        F.avg("norm").alias("_mu"),
        F.sqrt(
            F.avg(F.col("norm") * F.col("norm"))
            - F.avg("norm") * F.avg("norm")
        ).alias("_sd"),
    )
    out = norms.crossJoin(F.broadcast(stats))
    return out.select(
        "vec_id",
        "norm",
        (F.abs(F.col("norm") - F.col("_mu")) > 3.0 * F.col("_sd")).alias(
            "is_outlier"
        ),
    )


SQL_SIGNAL_CORRELATION = f"""
WITH {_KN_BASE_SQL},
knppl AS (
  SELECT doc_id,
         floor(avg(log2(p)) * 1000000 + 0.5) / 1000000 AS y
  FROM knbig JOIN knlm USING (w1, w2)
  GROUP BY doc_id
),
scq AS (
  SELECT doc_id, quality AS x FROM ({{QUALITY}})
),
scj AS (SELECT x, y FROM scq JOIN knppl USING (doc_id)),
scm AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM scj
)
SELECT CAST(n AS BIGINT) AS n_docs,
       floor(((n * sxy - sx * sy)
              / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
             * 1000000 + 0.5) / 1000000 AS pearson_r
FROM scm
"""


SQL_EMBEDDING_AUDIT = """
WITH ean AS (
  SELECT vec_id,
         floor(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                            x -> x * x)))
               * 1000000 + 0.5) / 1000000 AS norm
  FROM embeddings
),
eas AS (
  SELECT avg(norm) AS mu,
         sqrt(avg(norm * norm) - avg(norm) * avg(norm)) AS sd
  FROM ean
)
SELECT vec_id, norm, (abs(norm - mu) > 3.0 * sd) AS is_outlier
FROM ean CROSS JOIN eas
"""


SQL_SIGNAL_CORRELATION = SQL_SIGNAL_CORRELATION.replace(
    "{QUALITY}", SQL_QUALITY_SCORE
)


SQL_CURATION_LEDGER = (
    SQL_NEAR_DUP_REWRITE[: SQL_NEAR_DUP_REWRITE.index("SELECT d.doc_id")]
    + f"""
SELECT d.doc_id,
       (d.doc_id % 29 = 11) AS opted_out,
       (ex.keep_id IS NOT NULL) AS exact_keep,
       (c.component IS NULL OR c.component = d.doc_id) AS near_keep,
       g.qpass AS quality_keep,
       CASE WHEN d.doc_id % 29 = 11 THEN 'opted_out'
            WHEN ex.keep_id IS NULL THEN 'exact_dup'
            WHEN NOT (c.component IS NULL OR c.component = d.doc_id)
              THEN 'near_dup'
            WHEN NOT g.qpass THEN 'low_quality'
            ELSE 'kept' END AS disposition
FROM documents d
LEFT JOIN (SELECT min(doc_id) AS keep_id FROM documents GROUP BY text) ex
       ON ex.keep_id = d.doc_id
LEFT JOIN comp c ON c.doc_id = d.doc_id
JOIN (
  SELECT doc_id,
         (rule_word_count AND rule_mean_word_len AND rule_symbol_ratio
          AND rule_alpha_words) AS qpass
  FROM ({SQL_GOPHER_QUALITY})
) g ON g.doc_id = d.doc_id
"""
)

SQL_CURATION_FUNNEL = (
    SQL_NEAR_DUP_REWRITE[: SQL_NEAR_DUP_REWRITE.index("SELECT d.doc_id")]
    + f"""
SELECT CAST(count(*) AS BIGINT) AS n_raw,
       CAST(sum(CASE WHEN ex.keep_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN c.component IS NULL OR c.component = d.doc_id
                THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
       CAST(sum(CASE WHEN g.qpass THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(sum(CASE WHEN ex.keep_id IS NOT NULL
                      AND (c.component IS NULL OR c.component = d.doc_id)
                      AND g.qpass THEN 1 ELSE 0 END) AS BIGINT) AS n_final
FROM documents d
LEFT JOIN (SELECT min(doc_id) AS keep_id FROM documents GROUP BY text) ex
       ON ex.keep_id = d.doc_id
LEFT JOIN comp c ON c.doc_id = d.doc_id
JOIN (
  SELECT doc_id,
         (rule_word_count AND rule_mean_word_len AND rule_symbol_ratio
          AND rule_alpha_words) AS qpass
  FROM ({SQL_GOPHER_QUALITY})
) g ON g.doc_id = d.doc_id
"""
)


# --------------------------------------------------------------------
# SFT data prep: chat-template render, loss mask, conversation packing
# --------------------------------------------------------------------

_SFT_TL = 12  # must equal operators.sft.TURN_TOKENS

#: Conversation geometry over documents: tokens → total turns →
#: trailing-user-turn drop → kept-token count. Exposes
#: sftg(doc_id, source, toks, n, t_total, n_turns, kept); only VALID
#: conversations (≥ 2 turns, i.e. ≥ 1 assistant turn) survive.
_SFT_GEOM_CTE = f"""
sft0 AS (
  SELECT doc_id, source,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
sft1 AS (
  SELECT doc_id, source, toks, CAST(len(toks) AS BIGINT) AS n,
         CAST(floor((len(toks) + {_SFT_TL - 1}) / {_SFT_TL}.0) AS BIGINT)
           AS t_total
  FROM sft0
),
sftg AS (
  SELECT doc_id, source, toks, n, t_total,
         t_total - t_total % 2 AS n_turns,
         CASE WHEN t_total % 2 = 0 THEN n
              ELSE (t_total - t_total % 2) * {_SFT_TL} END AS kept
  FROM sft1
  WHERE t_total - t_total % 2 >= 2
)
"""

#: Rendered chat template (DuckDB twin of operators.sft.sft_render).
_SFT_RENDER_EXPR = f"""array_to_string(list_transform(
    generate_series(0, n_turns - 1),
    i -> '<|' || CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END
         || '|> '
         || array_to_string(
              toks[CAST(i*{_SFT_TL}+1 AS BIGINT):CAST(i*{_SFT_TL}+{_SFT_TL} AS BIGINT)],
              ' ')
         || ' <|eot|>'), chr(10))"""

#: Per-turn content length: only the LAST kept turn can be partial,
#: and only when no trailing user turn was dropped.
_SFT_TLEN = (
    f"(CASE WHEN i = n_turns - 1 AND n_turns = t_total"
    f" THEN n - (n_turns - 1) * {_SFT_TL} ELSE {_SFT_TL} END)"
)

_SFT_MASK_EXPR = f"""array_to_string(list_transform(
    generate_series(0, n_turns - 1),
    i -> CASE WHEN i % 2 = 0
         THEN repeat('0', CAST({_SFT_TLEN} + 2 AS BIGINT))
         ELSE '0' || repeat('1', CAST({_SFT_TLEN} + 1 AS BIGINT))
         END), '')"""


def q_sft_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template rendering for SFT: each document becomes a
    deterministic alternating user/assistant conversation (12-token
    turns; a trailing unanswered user turn is dropped; <2 surviving
    turns → not a conversation), rendered as
    ``<|role|> tok ... <|eot|>`` blocks. Pure projection — zero
    shuffles, zero UDFs; at 100 TB a narrow codegen map over the
    corpus scan (the html_extract plan shape)."""
    from etl_finance_pipeline_spark.operators.sft import sft_render

    docs = load_table(spark, _t(sf_dir, "documents"))
    r = sft_render(docs)
    return r.select(
        "doc_id",
        "n_turns",
        "n_user_tokens",
        "n_assistant_tokens",
        F.md5(F.encode("rendered", "UTF-8")).alias("rendered_md5"),
    )


SQL_SFT_RENDER = f"""
WITH {_SFT_GEOM_CTE.strip()}
SELECT doc_id,
       n_turns,
       n_turns * {_SFT_TL // 2} AS n_user_tokens,
       kept - n_turns * {_SFT_TL // 2} AS n_assistant_tokens,
       md5({_SFT_RENDER_EXPR}) AS rendered_md5
FROM sftg
"""


def _mh_chain_sql(src: str, prefix: str) -> str:
    """The minhash_lsh_pairs CTE chain (shingles → 16-perm signature
    → 4-band buckets → candidates → per-pair estimate) over relation
    *src* exposing (doc_id, text), every CTE name *prefix*-renamed so
    two chains coexist in one WITH — the device that lets an audit
    run the SAME sketch over two representations of the corpus."""
    import re

    chain = f"""{_SHINGLES_CTE.strip().replace("FROM documents", f"FROM {src}")},
{_SIG_CTE.strip()},
bands AS (
  {_BANDS_SQL}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, k1, k2, k3, k4)
  WHERE a.doc_id < b.doc_id
),
pairs AS (
  SELECT c.id_a, c.id_b,
         CAST(floor((({_EQ_TERMS}) / 16.0) * 1000000 + 0.5) AS BIGINT)
           AS est_e6
  FROM cand c
  JOIN sig a ON a.doc_id = c.id_a
  JOIN sig b ON b.doc_id = c.id_b
)"""
    for name in ("tokd", "sh", "h", "sig", "bands", "cand", "pairs"):
        chain = re.sub(rf"\b{name}\b", f"{prefix}{name}", chain)
    return chain


def q_template_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does templating change what your dedup sees? Run the SAME
    MinHash-LSH sketch (16 perms, 4 bands) over raw document text and
    over rendered SFT conversations and compare: template markers are
    shared boilerplate that inflates estimated similarity between
    near-dup pairs (982,955 vs 980,000 ppm at sf0.01), while the
    render's validity gate (conversations need an assistant turn)
    silently DROPS documents and with them candidate pairs (25 → 22)
    — both directions of the reason dedup must run on raw content
    BEFORE template rendering, quantified in one row. Both sketches
    are the scale-tested banding lane; the rendered side rides the
    zero-shuffle template projection."""
    from etl_finance_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from etl_finance_pipeline_spark.operators.sft import sft_render

    docs = _docs_spread(spark, sf_dir)
    e6 = F.floor(F.col("est_jaccard") * 1_000_000 + F.lit(0.5)).cast("long")

    def stats(pairs: DataFrame, tag: str) -> DataFrame:
        a = pairs.agg(
            F.count("*").cast("long").alias(f"n_pairs_{tag}"),
            F.coalesce(F.sum(e6), F.lit(0)).cast("long").alias("_s"),
        )
        mean = F.when(
            F.col(f"n_pairs_{tag}") > 0,
            F.floor(F.col("_s") * 1.0 / F.col(f"n_pairs_{tag}") + F.lit(0.5)),
        ).otherwise(F.lit(0))
        return a.select(
            f"n_pairs_{tag}",
            mean.cast("long").alias(f"mean_jaccard_{tag}_ppm"),
        )

    raw = stats(minhash_lsh_pairs(docs, num_hashes=16, bands=4), "raw")
    rend = stats(
        minhash_lsh_pairs(
            sft_render(docs).select(
                "doc_id", F.col("rendered").alias("text")
            ),
            num_hashes=16,
            bands=4,
        ),
        "rendered",
    )
    out = raw.crossJoin(rend)
    inflation = F.when(
        F.col("n_pairs_raw") > 0,
        F.floor(
            F.col("n_pairs_rendered") * 1_000_000.0 / F.col("n_pairs_raw")
        ),
    ).otherwise(F.lit(0))
    return out.select(
        "n_pairs_raw",
        "mean_jaccard_raw_ppm",
        "n_pairs_rendered",
        "mean_jaccard_rendered_ppm",
        inflation.cast("long").alias("pair_inflation_ppm"),
    )


SQL_TEMPLATE_DEDUP_AUDIT = f"""
WITH {_SFT_GEOM_CTE.strip()},
sftdocs AS (SELECT doc_id, {_SFT_RENDER_EXPR} AS text FROM sftg),
{_mh_chain_sql("documents", "mr")},
{_mh_chain_sql("sftdocs", "mt")},
rs AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(coalesce(sum(est_e6), 0) AS BIGINT) AS s
  FROM mrpairs
),
ts AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(coalesce(sum(est_e6), 0) AS BIGINT) AS s
  FROM mtpairs
)
SELECT rs.n AS n_pairs_raw,
       CAST(CASE WHEN rs.n = 0 THEN 0
            ELSE floor(rs.s * 1.0 / rs.n + 0.5) END AS BIGINT)
         AS mean_jaccard_raw_ppm,
       ts.n AS n_pairs_rendered,
       CAST(CASE WHEN ts.n = 0 THEN 0
            ELSE floor(ts.s * 1.0 / ts.n + 0.5) END AS BIGINT)
         AS mean_jaccard_rendered_ppm,
       CAST(CASE WHEN rs.n = 0 THEN 0
            ELSE floor(ts.n * 1000000.0 / rs.n) END AS BIGINT)
         AS pair_inflation_ppm
FROM rs CROSS JOIN ts
"""


def q_sft_loss_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level loss mask over the rendered SFT stream: assistant
    content tokens and the assistant ``<|eot|>`` are 1 (the model
    learns completions and when to stop), user tokens and all
    template markers are 0. The mask string itself is hashed so the
    oracle checks every position, not just the counts."""
    from etl_finance_pipeline_spark.operators.sft import sft_render

    docs = load_table(spark, _t(sf_dir, "documents"))
    r = sft_render(docs)
    return r.select(
        "doc_id",
        "n_stream_tokens",
        "n_loss_tokens",
        _pr(F.col("n_loss_tokens") * 1.0 / F.col("n_stream_tokens"), 6).alias(
            "loss_frac"
        ),
        F.md5(F.encode("loss_mask", "UTF-8")).alias("mask_md5"),
    )


SQL_SFT_LOSS_MASK = f"""
WITH {_SFT_GEOM_CTE.strip()},
sftm AS (
  SELECT doc_id, toks, n, t_total, n_turns, kept,
         kept + 2 * n_turns AS n_stream,
         (kept - n_turns * {_SFT_TL // 2})
           + CAST(n_turns // 2 AS BIGINT) AS n_loss
  FROM sftg
)
SELECT doc_id,
       n_stream AS n_stream_tokens,
       n_loss AS n_loss_tokens,
       floor(n_loss * 1.0 / n_stream * 1000000 + 0.5) / 1000000 AS loss_frac,
       md5({_SFT_MASK_EXPR}) AS mask_md5
FROM sftm
"""


def q_sft_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-safe packing: rendered conversations (template
    tokens included) FFD-packed into 512-token training rows without
    splitting a conversation across rows — the sample-boundary
    guarantee SFT packing needs (a conversation torn across sequence
    boundaries trains on truncated context). Render is a narrow map;
    the pack is one shuffle (shard groupBy) + the Arrow FFD kernel.
    Output: per-bin occupancy (conversations, tokens, fill
    fraction; an overlong conversation gets a reported-overfull bin
    of its own, frac > 1)."""
    from etl_finance_pipeline_spark.operators.corpus import pack_bins
    from etl_finance_pipeline_spark.operators.sft import sft_render

    docs = _docs_spread(spark, sf_dir)
    convs = sft_render(docs).select("doc_id", "n_stream_tokens")
    packed = pack_bins(
        convs, tokens_col="n_stream_tokens", seq_tokens=512, num_shards=4
    )
    return packed.groupBy("shard", "bin_id").agg(
        F.count("*").cast("long").alias("n_convs"),
        F.max("bin_fill").cast("long").alias("bin_tokens"),
        _pr(F.max("bin_fill") * 1.0 / 512.0, 6).alias("fill_frac"),
    )


SQL_SFT_PACK = f"""
WITH RECURSIVE {_SFT_GEOM_CTE.strip()},
spt AS (
  SELECT CAST({_H64.format(s="CAST(doc_id AS VARCHAR)")} % 4 AS INT) AS shard,
         doc_id,
         kept + 2 * n_turns AS n_tokens
  FROM sftg
),
{_pack_bins_ctes("sp", "spt", 512)}
SELECT shard, bin_id,
       CAST(count(*) AS BIGINT) AS n_convs,
       CAST(max(bin_fill) AS BIGINT) AS bin_tokens,
       floor(max(bin_fill) * 1.0 / 512.0 * 1000000 + 0.5) / 1000000
         AS fill_frac
FROM spout
GROUP BY shard, bin_id
"""


def q_stream_sft_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT rendering on the INGEST STREAM — the template is a pure
    per-row map, so the streaming lane is stateless append mode (no
    watermark, no state store) over the documents file-stream.
    Oracle = the batch render query."""
    import uuid

    from etl_finance_pipeline_spark.operators.sft import sft_render
    from etl_finance_pipeline_spark.sources.tables import ensure_nanos_conf

    spark = _narrow_session(spark, 8)
    ensure_nanos_conf(spark)
    path = _t(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path[:-1] + "[t]")
    out = sft_render(stream).select(
        "doc_id",
        "n_turns",
        "n_user_tokens",
        "n_assistant_tokens",
        F.md5(F.encode("rendered", "UTF-8")).alias("rendered_md5"),
    )
    name = f"stream_sft_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.table(name)


SQL_STREAM_SFT_RENDER = SQL_SFT_RENDER


def q_stream_fim_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIM sample prep on the INGEST STREAM — the code route's
    streaming front door: code detection and the PSM/SPM transform
    are both pure per-row maps (code_signals + fim_samples), so the
    lane is one stateless append chain over the documents
    file-stream, exactly the stream_sft_render shape. Oracle = the
    batch fim_samples query."""
    import uuid

    from etl_finance_pipeline_spark.operators.corpus import fim_samples
    from etl_finance_pipeline_spark.operators.text_analysis import (
        _code_signal_exprs,
    )
    from etl_finance_pipeline_spark.sources.tables import ensure_nanos_conf

    spark = _narrow_session(spark, _stream_fanout_width(spark, cap=8))
    ensure_nanos_conf(spark)
    path = _t(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path[:-1] + "[t]")
    d = F.col("doc_id")
    dec = stream.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(d % 7 == 0, F.repeat(F.lit(_CODE_SNIPPET), 3)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    # is_code is a per-row signal: attach the detector EXPRESSION to
    # the same frame (no stream-side join, the chain stays one
    # stateless projection)
    routed = dec.withColumn(
        "is_code", _code_signal_exprs(F.col("text"))["is_code"]
    )
    out = fim_samples(
        routed,
        gate_col="is_code",
        rate_pct=_FIM_RATE,
        keep_cols=("is_code",),
    )
    name = f"stream_fim_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.table(name)




# --------------------------------------------------------------------
# Preference-pair prep (RLHF / DPO): chosen-vs-rejected construction
# + the length-bias audit every reward-model dataset owes its users
# --------------------------------------------------------------------


def _pref_pair_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked preference pairs within each source: rank docs
    by the heuristic quality score (desc, doc_id asc tie-break) and
    by the inverse order; pair the i-th best with the i-th worst for
    i ≤ n/2, keep pairs with a quality margin > 0.1. One shuffle
    (source partition, two window sorts) + one self-join on the
    pair index."""
    from etl_finance_pipeline_spark.operators.text_analysis import (
        quality_score,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    qd = quality_score(docs).select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"),
        "quality",
    )
    w_best = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    w_worst = Window.partitionBy("source").orderBy(
        F.col("quality").asc(), F.col("doc_id").desc()
    )
    ranked = qd.select(
        "doc_id",
        "source",
        "n_chars",
        "quality",
        F.row_number().over(w_best).cast("long").alias("rd"),
        F.row_number().over(w_worst).cast("long").alias("ra"),
        F.count("*").over(Window.partitionBy("source")).cast("long").alias(
            "cnt"
        ),
    )
    a = ranked.select(
        "source",
        F.col("rd").alias("pair_id"),
        F.col("doc_id").alias("chosen_id"),
        F.col("quality").alias("q_c"),
        F.col("n_chars").alias("chosen_chars"),
        "cnt",
    )
    b = ranked.select(
        "source",
        F.col("ra").alias("pair_id"),
        F.col("doc_id").alias("rejected_id"),
        F.col("quality").alias("q_r"),
        F.col("n_chars").alias("rejected_chars"),
    )
    return (
        a.join(b, ["source", "pair_id"])
        .filter(F.col("pair_id") <= F.floor(F.col("cnt") / F.lit(2.0)))
        .withColumn("margin", F.col("q_c") - F.col("q_r"))
        .filter(F.col("margin") > 0.1)
    )


#: Shared CTE chain: documents → raw (unrounded) quality → best/worst
#: ranks per source → margin-filtered pairs.
_PREF_CTES = f"""
prtok AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, text,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
prm AS (
  SELECT doc_id, source, n_chars,
    list_sum(list_transform(toks, t -> CAST(len(t) AS DOUBLE))) / len(toks)
      AS avg_token_len,
    len(list_filter(toks, t -> t IN ({_stop_list('en')}))) * 1.0 / len(toks)
      AS stopword_ratio,
    len(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / len(text)
      AS digit_ratio,
    len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0 / len(text)
      AS punct_ratio,
    len(text) AS nc
  FROM prtok
),
prq AS (
  SELECT doc_id, source, n_chars,
    (CASE WHEN nc >= 50 AND nc <= 10000 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN avg_token_len >= 3 AND avg_token_len <= 10
            THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN stopword_ratio >= 0.05 THEN 0.3 ELSE 0.0 END)
    + (1.0 - least(digit_ratio + punct_ratio, 1.0)) * 0.2 AS quality
  FROM prm
),
prr AS (
  SELECT doc_id, source, n_chars, quality,
    CAST(row_number() OVER (
      PARTITION BY source ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS rd,
    CAST(row_number() OVER (
      PARTITION BY source ORDER BY quality ASC, doc_id DESC) AS BIGINT) AS ra,
    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS cnt
  FROM prq
),
prpairs AS (
  SELECT a.source, a.rd AS pair_id,
         a.doc_id AS chosen_id, b.doc_id AS rejected_id,
         a.quality - b.quality AS margin,
         a.n_chars AS chosen_chars, b.n_chars AS rejected_chars
  FROM prr a JOIN prr b ON a.source = b.source AND a.rd = b.ra
  WHERE a.rd <= CAST(floor(a.cnt / 2.0) AS BIGINT)
    AND a.quality - b.quality > 0.1
)
"""


def q_pref_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for reward-model / DPO training:
    within each source, the i-th best document (by quality score) is
    paired with the i-th worst, margin-gated — the deterministic
    skeleton of the "strong answer vs weak answer" pairing a real
    preference dataset applies per prompt."""
    pairs = _pref_pair_frame(spark, sf_dir)
    return pairs.select(
        "source",
        "pair_id",
        "chosen_id",
        "rejected_id",
        _pr("margin", 6).alias("margin"),
        "chosen_chars",
        "rejected_chars",
    )


SQL_PREF_PAIRS = f"""
WITH {_PREF_CTES.strip()}
SELECT source, pair_id, chosen_id, rejected_id,
       floor(margin * 1000000 + 0.5) / 1000000 AS margin,
       chosen_chars, rejected_chars
FROM prpairs
"""


def q_pref_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The length-bias audit for preference data: reward models
    overfit to "longer = better" when chosen responses are
    systematically longer, so the dataset datasheet must report, per
    source, how often the chosen side is longer and the aggregate
    chosen/rejected length ratio. All aggregates are exact-integer
    sums (margins pre-rounded to micro-units) so the readout is
    order-free and engine-portable."""
    pairs = _pref_pair_frame(spark, sf_dir)
    e6 = F.floor(F.col("margin") * 1000000 + F.lit(0.5)).cast("long")
    agg = pairs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(
            (F.col("chosen_chars") > F.col("rejected_chars")).cast("int")
        ).cast("long").alias("n_chosen_longer"),
        F.sum("chosen_chars").cast("long").alias("_sc"),
        F.sum("rejected_chars").cast("long").alias("_sr"),
        F.sum(e6).cast("long").alias("_sm"),
    )
    return agg.select(
        "source",
        "n_pairs",
        "n_chosen_longer",
        _pr(F.col("n_chosen_longer") * 1.0 / F.col("n_pairs"), 6).alias(
            "frac_chosen_longer"
        ),
        _pr(F.col("_sc") * 1.0 / F.col("_sr"), 6).alias("len_ratio"),
        _pr(F.col("_sm") * 1.0 / (F.col("n_pairs") * 1000000), 6).alias(
            "avg_margin"
        ),
    )


SQL_PREF_LENGTH_BIAS = f"""
WITH {_PREF_CTES.strip()},
pragg AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN chosen_chars > rejected_chars
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_chosen_longer,
         CAST(sum(chosen_chars) AS BIGINT) AS sc,
         CAST(sum(rejected_chars) AS BIGINT) AS sr,
         CAST(sum(CAST(floor(margin * 1000000 + 0.5) AS BIGINT))
              AS BIGINT) AS sm
  FROM prpairs
  GROUP BY source
)
SELECT source, n_pairs, n_chosen_longer,
       floor(n_chosen_longer * 1.0 / n_pairs * 1000000 + 0.5) / 1000000
         AS frac_chosen_longer,
       floor(sc * 1.0 / sr * 1000000 + 0.5) / 1000000 AS len_ratio,
       floor(sm * 1.0 / (n_pairs * 1000000) * 1000000 + 0.5) / 1000000
         AS avg_margin
FROM pragg
"""


# --------------------------------------------------------------------
# Bradley-Terry strength fit over pairwise judgments
# --------------------------------------------------------------------

def _bt_duels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quality duels: rank documents within each source
    by quality (micro-unit integer, doc_id tie-break), then pit the
    r-th ranked doc of source A against the r-th of source B for
    every source pair — equal-rank matching, so strength differences
    between PROVIDERS are what the duels measure, not rank depth.
    Ties (equal rounded quality) are excluded; win is an exact
    integer comparison, so both engines judge identically.
    Output: (item_a, item_b, win_a, len_a, len_b) with item_a <
    item_b lexicographically."""
    from etl_finance_pipeline_spark.operators.text_analysis import (
        quality_score,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    qd = quality_score(docs).select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.floor(F.col("quality") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("qppm"),
    )
    r = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.col("qppm").desc(), F.col("doc_id")
        )
    )
    ranked = qd.select("source", "n_chars", "qppm", r.alias("r"))
    a = ranked.select(
        F.col("source").alias("item_a"),
        F.col("r"),
        F.col("qppm").alias("_qa"),
        F.col("n_chars").alias("len_a"),
    )
    b = ranked.select(
        F.col("source").alias("item_b"),
        F.col("r"),
        F.col("qppm").alias("_qb"),
        F.col("n_chars").alias("len_b"),
    )
    return (
        a.join(b, "r")
        .filter(F.col("item_a") < F.col("item_b"))
        .filter(F.col("_qa") != F.col("_qb"))
        .select(
            "item_a",
            "item_b",
            (F.col("_qa") > F.col("_qb")).cast("int").alias("win_a"),
            "len_a",
            "len_b",
        )
    )


def q_bt_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry per-source strength ratings from pairwise
    quality duels — the readout that turns chosen/rejected judgments
    into per-provider scores (operators/mlprep.py:bt_ratings; Hunter
    2004 MM, 5 fixed rounds, nano-unit term flooring so the oracle
    unrolls bit-identical iterations). The duel frame reduces to
    O(k²) sufficient statistics in one distributed aggregate; only
    those cross to the driver."""
    from etl_finance_pipeline_spark.operators.mlprep import bt_ratings

    return bt_ratings(_bt_duels(spark, sf_dir), iters=5)


def _bt_rounds_sql(iters: int = 5) -> str:
    """``btp0 → btd1/btp1 → … → btp{iters}`` CTE chain: the DuckDB
    twin of the bt_ratings MM loop. Each pairwise denominator term is
    floored to nano-units before the (exact integer) sum; the update
    division is one HUGEINT expression — both mirror the driver-side
    Python exactly."""
    parts = ["btp0 AS (SELECT DISTINCT s, CAST(1000000 AS BIGINT) AS r6, 1.0 AS pi FROM btsym)"]
    for i in range(1, iters + 1):
        parts.append(f"""btd{i} AS (
  SELECT b.s, mw.wins,
         CAST(floor(1000000000.0 / (p.pi + 1.0) + 0.5) AS HUGEINT)
         + CAST(sum(floor(b.n * 1000000000.0 / (p.pi + q.pi) + 0.5))
                AS HUGEINT) AS den
  FROM btsym b
  JOIN btp{i - 1} p ON p.s = b.s
  JOIN btp{i - 1} q ON q.s = b.t
  JOIN btwins mw ON mw.s = b.s
  GROUP BY b.s, mw.wins, p.pi
),
btp{i} AS (
  SELECT s,
         CAST(((2 * wins + 1) * CAST(500000000000000 AS HUGEINT) * 2 + den)
              // (2 * den) AS BIGINT) AS r6,
         CAST(((2 * wins + 1) * CAST(500000000000000 AS HUGEINT) * 2 + den)
              // (2 * den) AS BIGINT) / 1000000.0 AS pi
  FROM btd{i}
)""")
    return ",\n".join(parts)


_BT_BASE = f"""btq AS (
  SELECT q.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars,
         CAST(floor(q.quality * 1000000 + 0.5) AS BIGINT) AS qppm
  FROM ({SQL_QUALITY_SCORE.strip()}) q JOIN documents d USING (doc_id)
),
btr AS (
  SELECT source, n_chars, qppm,
         row_number() OVER (PARTITION BY source
                            ORDER BY qppm DESC, doc_id) AS r
  FROM btq
),
btduel AS (
  SELECT a.source AS sa, b.source AS sb,
         CASE WHEN a.qppm > b.qppm THEN 1 ELSE 0 END AS wa,
         a.n_chars AS la, b.n_chars AS lb
  FROM btr a JOIN btr b ON a.r = b.r AND a.source < b.source
  WHERE a.qppm <> b.qppm
),
btstat AS (
  SELECT sa, sb, CAST(count(*) AS BIGINT) AS n, CAST(sum(wa) AS BIGINT) AS w
  FROM btduel GROUP BY 1, 2
),
btsym AS (
  SELECT sa AS s, sb AS t, n, w FROM btstat
  UNION ALL
  SELECT sb AS s, sa AS t, n, n - w FROM btstat
),
btwins AS (SELECT s, CAST(sum(w) AS BIGINT) AS wins FROM btsym GROUP BY 1),
btn AS (SELECT s, CAST(sum(n) AS BIGINT) AS nd FROM btsym GROUP BY 1)"""


SQL_BT_RATINGS = f"""
WITH {_BT_BASE},
{_bt_rounds_sql(5)}
SELECT w.s AS item, p.pi AS rating, w.wins AS n_wins, n.nd AS n_duels
FROM btwins w JOIN btp5 p ON p.s = w.s JOIN btn n ON n.s = w.s
"""


def q_bt_length_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The length-bias audit made QUANTITATIVE: over the quality
    duels, ordinary least squares of win outcome on the length
    difference, with and WITHOUT controlling for the sides'
    Bradley-Terry strength difference — if the controlled length
    coefficient stays materially positive, annotations (here: the
    quality heuristic) reward length itself, not just the quality
    that longer answers happen to carry. All OLS moments are exact
    integer sums (ratings in ppm, lengths in chars, win ∈ {{0,1}}) so
    the 3×3 Cramer solve consumes identical inputs in both engines.
    One row: duel count, raw and strength-controlled length
    coefficients (per 1000 chars), strength coefficient (per rating
    unit)."""
    from etl_finance_pipeline_spark.operators.mlprep import bt_ratings

    duels = _bt_duels(spark, sf_dir)
    ratings = bt_ratings(duels, iters=5).select(
        "item",
        F.floor(F.col("rating") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("r6"),
    )
    j = (
        duels.join(
            F.broadcast(ratings.withColumnRenamed("item", "item_a")).withColumnRenamed("r6", "_ra"),
            "item_a",
        )
        .join(
            F.broadcast(ratings.withColumnRenamed("item", "item_b")).withColumnRenamed("r6", "_rb"),
            "item_b",
        )
        .select(
            (F.col("_ra") - F.col("_rb")).alias("_x1"),
            (F.col("len_a") - F.col("len_b")).alias("_x2"),
            F.col("win_a").cast("long").alias("_y"),
        )
    )
    m = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_x1").alias("s1"),
        F.sum("_x2").alias("s2"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x1") * F.col("_x1")).alias("s11"),
        F.sum(F.col("_x1") * F.col("_x2")).alias("s12"),
        F.sum(F.col("_x2") * F.col("_x2")).alias("s22"),
        F.sum(F.col("_x1") * F.col("_y")).alias("s1y"),
        F.sum(F.col("_x2") * F.col("_y")).alias("s2y"),
    )
    d = {
        k: F.col(k).cast("double")
        for k in ("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y")
    }
    det = (
        d["n"] * (d["s11"] * d["s22"] - d["s12"] * d["s12"])
        - d["s1"] * (d["s1"] * d["s22"] - d["s12"] * d["s2"])
        + d["s2"] * (d["s1"] * d["s12"] - d["s11"] * d["s2"])
    )
    det_b1 = (
        d["n"] * (d["s1y"] * d["s22"] - d["s12"] * d["s2y"])
        - d["sy"] * (d["s1"] * d["s22"] - d["s12"] * d["s2"])
        + d["s2"] * (d["s1"] * d["s2y"] - d["s1y"] * d["s2"])
    )
    det_b2 = (
        d["n"] * (d["s11"] * d["s2y"] - d["s1y"] * d["s12"])
        - d["s1"] * (d["s1"] * d["s2y"] - d["s1y"] * d["s2"])
        + d["sy"] * (d["s1"] * d["s12"] - d["s11"] * d["s2"])
    )
    raw = (d["n"] * d["s2y"] - d["s2"] * d["sy"]) / (
        d["n"] * d["s22"] - d["s2"] * d["s2"]
    )
    return m.select(
        F.col("n").alias("n_duels"),
        _pr(raw * 1000.0, 6).alias("len_coef_raw_per_kchar"),
        _pr(det_b2 / det * 1000.0, 6).alias("len_coef_ctrl_per_kchar"),
        _pr(det_b1 / det * 1_000_000.0, 6).alias("strength_coef"),
    )


SQL_BT_LENGTH_EFFECT = f"""
WITH {_BT_BASE},
{_bt_rounds_sql(5)},
btx AS (
  SELECT pa.r6 - pb.r6 AS x1, d.la - d.lb AS x2, CAST(d.wa AS BIGINT) AS y
  FROM btduel d
  JOIN btp5 pa ON pa.s = d.sa
  JOIN btp5 pb ON pb.s = d.sb
),
btm AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x1 * x1) AS BIGINT) AS s11,
         CAST(sum(x1 * x2) AS BIGINT) AS s12,
         CAST(sum(x2 * x2) AS BIGINT) AS s22,
         CAST(sum(x1 * y) AS BIGINT) AS s1y,
         CAST(sum(x2 * y) AS BIGINT) AS s2y
  FROM btx
),
btc AS (
  SELECT n,
    CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
    - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
    + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE))
      AS det,
    CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))
    - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
    + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE))
      AS det_b1,
    CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE))
    - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE))
    + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE))
      AS det_b2,
    (CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE))
    / (CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) AS raw
  FROM btm
)
SELECT n AS n_duels,
       floor(raw * 1000.0 * 1000000 + 0.5) / 1000000 AS len_coef_raw_per_kchar,
       floor(det_b2 / det * 1000.0 * 1000000 + 0.5) / 1000000 AS len_coef_ctrl_per_kchar,
       floor(det_b1 / det * 1000000.0 * 1000000 + 0.5) / 1000000 AS strength_coef
FROM btc
"""


# --------------------------------------------------------------------
# Multi-epoch budget planning (data-constrained scaling)
# --------------------------------------------------------------------

#: Diminishing-returns scale for repeated data: effective tokens =
#: unique · RD · (1 − exp(−epochs/RD)). At ≪1 epoch the data counts
#: fully; repetition saturates at RD epochs' worth (Muennighoff et
#: al. 2023's data-constrained scaling shape, fixed constant).
_EPOCH_RD = 4.0
_EPOCH_BUDGET_X = 4.0  # token budget = 4× the unique corpus


def q_best_of_n_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n selection readout over the Bradley-Terry strengths
    (operators/mlprep.py:best_of_n_gain): exact discrete order
    statistics give, for n ∈ {1, 2, 4, 8}, the expected max strength
    of best-of-n sampling from the rated source pool, its gain over a
    single draw, and each source's selection probability — the
    rejection-sampling calculus an RLHF pipeline runs before spending
    n× inference per prompt. All exact integer arithmetic over the
    6-dp ratings; the oracle unrolls the same BT rounds then replays
    the closed-form order statistics in HUGEINT."""
    from etl_finance_pipeline_spark.operators.mlprep import (
        best_of_n_gain,
        bt_ratings,
    )

    ratings = bt_ratings(_bt_duels(spark, sf_dir), iters=5)
    return best_of_n_gain(ratings, ns=(1, 2, 4, 8))


SQL_BEST_OF_N_GAIN = f"""
WITH {_BT_BASE},
{_bt_rounds_sql(5)},
bkr AS (
  SELECT s, r6,
         CAST(row_number() OVER (ORDER BY r6, s) AS HUGEINT) AS i,
         CAST(count(*) OVER () AS HUGEINT) AS k
  FROM btp5
),
bkn AS (SELECT CAST(unnest([1, 2, 4, 8]) AS INT) AS n),
bkw AS (
  SELECT s, r6, n,
    (CASE n WHEN 1 THEN i WHEN 2 THEN i * i
            WHEN 4 THEN (i * i) * (i * i)
            ELSE ((i * i) * (i * i)) * ((i * i) * (i * i)) END)
    - (CASE n WHEN 1 THEN i - 1 WHEN 2 THEN (i - 1) * (i - 1)
              WHEN 4 THEN ((i - 1) * (i - 1)) * ((i - 1) * (i - 1))
              ELSE (((i - 1) * (i - 1)) * ((i - 1) * (i - 1)))
                   * (((i - 1) * (i - 1)) * ((i - 1) * (i - 1))) END)
      AS w,
    (CASE n WHEN 1 THEN k WHEN 2 THEN k * k
            WHEN 4 THEN (k * k) * (k * k)
            ELSE ((k * k) * (k * k)) * ((k * k) * (k * k)) END) AS kp
  FROM bkr CROSS JOIN bkn
),
bke AS (
  SELECT n,
         (2 * sum(CAST(r6 AS HUGEINT) * w) + any_value(kp))
           // (2 * any_value(kp)) AS e6
  FROM bkw GROUP BY n
)
SELECT b.s AS item, b.n, b.r6 / 1000000.0 AS rating,
       CAST((2 * b.w * 1000000 + b.kp) // (2 * b.kp) AS BIGINT)
         / 1000000.0 AS sel_p,
       CAST(e.e6 AS BIGINT) / 1000000.0 AS emax,
       CAST(e.e6 - e1.e6 AS BIGINT) / 1000000.0 AS bon_gain
FROM bkw b JOIN bke e USING (n) JOIN bke e1 ON e1.n = 1
"""


def q_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch mixture planning under a fixed token budget: given
    per-source unique token counts and a uniform-smoothed target
    mixture, compute each source's requested tokens, implied epochs,
    diminishing-returns effective tokens, and budget utilization —
    the planning table a data-constrained pretraining run derives
    before launching (how many times will each source repeat, and
    what is that repetition worth?). One map-side aggregate per
    source + a broadcast 1-row totals join; everything downstream is
    per-row scalar arithmetic."""
    docs = load_table(spark, _t(sf_dir, "documents")).select(
        "source", F.size(F.split(F.col("text"), r"\s+")).alias("n_tok")
    )
    base = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("unique_tokens"),
    )
    tot = base.agg(
        F.sum("unique_tokens").cast("long").alias("total"),
        F.count("*").cast("long").alias("k"),
    )
    j = base.crossJoin(F.broadcast(tot))
    j = j.withColumn(
        "w",
        (F.col("unique_tokens") * 1.0 / F.col("total") + 1.0 / F.col("k"))
        / 2.0,
    )
    j = j.withColumn(
        "requested", F.lit(_EPOCH_BUDGET_X) * F.col("total") * F.col("w")
    ).withColumn("epochs", F.col("requested") / F.col("unique_tokens"))
    j = j.withColumn(
        "effective",
        F.col("unique_tokens")
        * _EPOCH_RD
        * (F.lit(1.0) - F.exp(-F.col("epochs") / _EPOCH_RD)),
    )
    return j.select(
        "source",
        "n_docs",
        "unique_tokens",
        _pr("w", 6).alias("weight"),
        _pr("requested", 6).alias("requested_tokens"),
        _pr("epochs", 6).alias("epochs"),
        _pr("effective", 6).alias("effective_tokens"),
        _pr(F.col("effective") / F.col("requested"), 6).alias("utilization"),
    )


SQL_EPOCH_SCHEDULE = f"""
WITH ept AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)
           AS unique_tokens
  FROM documents GROUP BY source
),
eptot AS (
  SELECT CAST(sum(unique_tokens) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS k
  FROM ept
),
ep1 AS (
  SELECT source, n_docs, unique_tokens, total, k,
         (unique_tokens * 1.0 / total + 1.0 / k) / 2.0 AS w
  FROM ept CROSS JOIN eptot
),
ep2 AS (
  SELECT *, {_EPOCH_BUDGET_X} * total * w AS requested FROM ep1
),
ep3 AS (
  SELECT *, requested / unique_tokens AS epochs FROM ep2
),
ep4 AS (
  SELECT *, unique_tokens * {_EPOCH_RD}
            * (1.0 - exp(-epochs / {_EPOCH_RD})) AS effective
  FROM ep3
)
SELECT source, n_docs, unique_tokens,
       floor(w * 1000000 + 0.5) / 1000000 AS weight,
       floor(requested * 1000000 + 0.5) / 1000000 AS requested_tokens,
       floor(epochs * 1000000 + 0.5) / 1000000 AS epochs,
       floor(effective * 1000000 + 0.5) / 1000000 AS effective_tokens,
       floor(effective / requested * 1000000 + 0.5) / 1000000 AS utilization
FROM ep4
"""


# --------------------------------------------------------------------
# MinHash-LSH operating-point sweep: banding tradeoff, measured
# --------------------------------------------------------------------

#: (bands, rows_per_band) operating points over the 16-hash signature.
_LSHT_CONFIGS = ((2, 8), (4, 4), (8, 2))
_LSHT_MAX_BUCKET = 1000  # mirror minhash_lsh_pairs' skew guard


def q_lsh_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH banding tradeoff MEASURED, not just theorized: for
    three (bands, rows) operating points over the SAME 16-hash
    MinHash signature, candidate count + recall/precision against
    the exact n-gram-Jaccard truth at τ=0.5, next to the theoretical
     1−(1−τ^r)^b pair probability. This is the table an operator
    reads before picking a banding for a 100 TB dedup run — more
    bands = higher recall but more candidate pairs to verify.
    Signatures are computed ONCE (localCheckpoint — at corpus scale
    a persisted signature table) and re-banded per config; each
    banding replays the production skew guard (buckets > 1000
    dropped)."""
    import math

    from etl_finance_pipeline_spark.operators.dedup import (
        minhash_signatures,
    )

    docs = _docs_spread(spark, sf_dir)
    sigs = minhash_signatures(docs).localCheckpoint()
    # the exact-Jaccard truth is re-read by EVERY banding config's
    # aggregate — materialize it once like the signatures (r14; it was
    # re-executing the all-pairs n-gram join per config)
    truth = (
        ngram_jaccard_pairs(docs, threshold=_LSHR_T)
        .select("id_a", "id_b", F.lit(1).alias("_t"))
        .localCheckpoint()
    )
    outs = []
    for b, r in _LSHT_CONFIGS:
        banded = sigs.select(
            F.col("doc_id").alias("_id"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("band"),
                            F.slice("sig", j * r + 1, r).alias("key"),
                        )
                        for j in range(b)
                    ]
                )
            ).alias("_bk"),
        ).select(
            "_id",
            F.col("_bk.band").alias("band"),
            F.col("_bk.key").alias("key"),
        )
        banded = (
            banded.withColumn(
                "_n", F.count(F.lit(1)).over(Window.partitionBy("band", "key"))
            )
            .filter(F.col("_n") <= _LSHT_MAX_BUCKET)
            .drop("_n")
        )
        left = banded.select("band", "key", F.col("_id").alias("id_a"))
        right = banded.select("band", "key", F.col("_id").alias("id_b"))
        cand = (
            left.join(right, ["band", "key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
            .withColumn("_p", F.lit(1))
        )
        j = cand.join(truth, ["id_a", "id_b"], "full")
        t0 = F.coalesce(F.col("_t"), F.lit(0))
        p0 = F.coalesce(F.col("_p"), F.lit(0))
        theo = (
            math.floor((1.0 - (1.0 - _LSHR_T**r) ** b) * 1e6 + 0.5) / 1e6
        )
        agg = j.agg(
            F.sum(t0).alias("_nt"),
            F.sum(p0).alias("_np"),
            F.sum(t0 * p0).alias("_nh"),
        ).select(
            F.lit(b).alias("bands"),
            F.lit(r).alias("rows_per_band"),
            F.col("_np").cast("long").alias("n_cand"),
            F.col("_nt").cast("long").alias("n_truth"),
            F.col("_nh").cast("long").alias("n_hit"),
            _pr(F.col("_nh") / F.col("_nt"), 6).alias("recall"),
            _pr(F.col("_nh") / F.col("_np"), 6).alias("precision"),
            F.lit(theo).alias("theoretical_pair_prob"),
        )
        outs.append(agg)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def _lsht_config_sql(b: int, r: int) -> str:
    """Banded-candidate CTEs for one (bands, rows) operating point:
    string band keys over the shared sig CTE, the production bucket
    guard, distinct ordered pairs."""
    bands = "\nUNION ALL\n".join(
        "SELECT doc_id, {j} AS band, {key} AS bkey FROM sig".format(
            j=j,
            key=" || ':' || ".join(
                f"CAST(m{r * j + i} AS VARCHAR)" for i in range(r)
            ),
        )
        for j in range(b)
    )
    return f"""ltb{b} AS (
  {bands}
),
ltg{b} AS (
  SELECT doc_id, band, bkey FROM ltb{b}
  QUALIFY count(*) OVER (PARTITION BY band, bkey) <= {_LSHT_MAX_BUCKET}
),
ltc{b} AS (
  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
  FROM ltg{b} a JOIN ltg{b} b2 USING (band, bkey)
  WHERE a.doc_id < b2.doc_id
),
lts{b} AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cand,
         CAST(coalesce(sum(CASE WHEN t.id_a IS NOT NULL
                                THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hit
  FROM ltc{b} c
  LEFT JOIN lttruth t ON t.id_a = c.id_a AND t.id_b = c.id_b
)"""


def _lsht_row_sql(b: int, r: int) -> str:
    import math

    theo = math.floor((1.0 - (1.0 - _LSHR_T**r) ** b) * 1e6 + 0.5) / 1e6
    return f"""SELECT CAST({b} AS INT) AS bands, CAST({r} AS INT) AS rows_per_band,
       n_cand, n_truth, n_hit,
       floor(n_hit * 1.0 / n_truth * 1000000 + 0.5) / 1000000 AS recall,
       floor(n_hit * 1.0 / n_cand * 1000000 + 0.5) / 1000000 AS precision,
       {theo!r} AS theoretical_pair_prob
FROM lts{b} CROSS JOIN ltntruth"""


SQL_LSH_TRADEOFF = (
    f"""
WITH {_SHINGLES_CTE.strip()},
{_SIG_CTE.strip()},
ltsizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
ltinter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
lttruth AS (
  SELECT id_a, id_b
  FROM ltinter
  JOIN ltsizes na ON na.doc_id = id_a
  JOIN ltsizes nb ON nb.doc_id = id_b
  WHERE c * 1.0 / (na.n + nb.n - c) >= {_LSHR_T}
),
ltntruth AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM lttruth),
"""
    + ",\n".join(_lsht_config_sql(b, r) for b, r in _LSHT_CONFIGS)
    + "\n"
    + "\nUNION ALL\n".join(_lsht_row_sql(b, r) for b, r in _LSHT_CONFIGS)
)


# --------------------------------------------------------------------
# Unicode-script census + code detection + n-gram novelty (round 10)
# --------------------------------------------------------------------

from etl_finance_pipeline_spark.operators.text_analysis import (  # noqa: E402
    CODE_KEYWORD_RE,
    CODE_SYMBOL_RE,
    SCRIPT_RANGES,
    script_char_class,
)

#: BMP-only per-script samples appended deterministically (the fixture
#: text is clean ASCII, so — as with the mojibake and OOV devices —
#: the multilingual input is synthesized in-engine; no single quotes,
#: so the constants interpolate into SQL literals verbatim)
_SC_SAMPLES: dict[str, str] = {
    "cyrillic": " привет мир",
    "greek": " γειά κόσμος",
    "arabic": " مرحبا بالعالم",
    "devanagari": " नमस्ते दुनिया",
    "cjk": " 你好世界",
    "hangul": " 안녕하세요 세계",
}
_SC_REPEAT = 40


def _script_decorate(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    parts = [F.col("text")]
    for i, name in enumerate(_SC_SAMPLES, start=1):
        parts.append(
            F.when(
                d % 7 == i, F.repeat(F.lit(_SC_SAMPLES[name]), _SC_REPEAT)
            ).otherwise(F.lit(""))
        )
    return docs.withColumn("text", F.concat(*parts))


def q_script_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Unicode-script census over a corpus with
    synthesized multilingual slices (doc_id % 7 picks one of six
    non-Latin scripts, repeated so the appended sample can outweigh
    the ASCII body): per-script character counts, non-Latin ppm, and
    the dominant script — the routing signal for script-specific
    curation stages (operators/text_analysis.py: script_census).
    Exchange-free codegen projection; the oracle decorates and
    censuses identically."""
    from etl_finance_pipeline_spark.operators.text_analysis import (
        script_census,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    return script_census(_script_decorate(docs.select("doc_id", "text")))


def _sc_decorate_sql() -> str:
    cases = "\n         || ".join(
        f"(CASE WHEN doc_id % 7 = {i} THEN repeat('{s}', {_SC_REPEAT}) "
        "ELSE '' END)"
        for i, s in enumerate(_SC_SAMPLES.values(), start=1)
    )
    return f"SELECT doc_id, text\n         || {cases} AS text\n  FROM documents"


def _sc_count_sql(name: str) -> str:
    cls = script_char_class(name)
    return (
        f"CAST(len(text) - len(regexp_replace(text, '{cls}', '', 'g'))"
        " AS BIGINT)"
    )


_SC_NAMES = [n for n, _, _ in SCRIPT_RANGES]
_SC_COUNTS = ",\n    ".join(
    f"{_sc_count_sql(n)} AS {n}" for n in _SC_NAMES
)
_SC_TOTAL = " + ".join(_SC_NAMES)
_SC_BEST = "greatest(" + ", ".join(_SC_NAMES) + ")"
_SC_DOM = (
    f"CASE WHEN {_SC_BEST} = 0 THEN 'und' "
    + " ".join(
        f"WHEN {n} = {_SC_BEST} THEN '{n}'" for n in _SC_NAMES
    )
    + " END"
)

SQL_SCRIPT_CENSUS = f"""
WITH scd AS (
  {_sc_decorate_sql()}
),
scc AS (
  SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars,
    {_SC_COUNTS}
  FROM scd
)
SELECT doc_id, n_chars, {", ".join(_SC_NAMES)},
       CAST({_SC_TOTAL} AS BIGINT) AS script_letters,
       CAST(CASE WHEN {_SC_TOTAL} > 0
            THEN floor(({_SC_TOTAL} - latin) * 1000000.0 / ({_SC_TOTAL}))
            ELSE 0 END AS BIGINT) AS non_latin_ppm,
       {_SC_DOM} AS dominant_script
FROM scc
"""


#: deterministic program-text suffix (no single quotes): 6 keyword
#: hits, 4 braces, 3 semicolons per copy
_CODE_SNIPPET = (
    "\ndef load(x):\n    return x * 2;\n"
    "if (x > 0) { y[0] = x; }\n"
    "import os\npublic class T { void run(); }\n"
)


def q_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-document detection over a corpus with synthesized program
    text (doc_id % 7 == 0 gains three copies of a code snippet):
    brace/semicolon/keyword censuses, structural-symbol density, and
    the is_code routing flag (operators/text_analysis.py:
    code_signals). The decoration is deterministic, so the oracle
    replays it and the flag set is exact."""
    from etl_finance_pipeline_spark.operators.text_analysis import (
        code_signals,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    d = F.col("doc_id")
    dec = F.concat(
        F.col("text"),
        F.when(d % 7 == 0, F.repeat(F.lit(_CODE_SNIPPET), 3)).otherwise(
            F.lit("")
        ),
    )
    return code_signals(docs.select("doc_id", dec.alias("text")))


SQL_CODE_DETECT = f"""
WITH cdd AS (
  SELECT doc_id,
         text || (CASE WHEN doc_id % 7 = 0
                  THEN repeat('{_CODE_SNIPPET}', 3) ELSE '' END) AS text
  FROM documents
),
cdc AS (
  SELECT doc_id,
    CAST(len(text) AS BIGINT) AS n_chars,
    CAST((len(text) - len(replace(text, chr(123), '')))
         + (len(text) - len(replace(text, chr(125), ''))) AS BIGINT)
      AS braces,
    CAST(len(text) - len(replace(text, ';', '')) AS BIGINT) AS semis,
    CAST(len(regexp_extract_all(text, '{CODE_KEYWORD_RE}')) AS BIGINT)
      AS kw_hits,
    CAST(len(text) - len(regexp_replace(text, '{CODE_SYMBOL_RE}', '', 'g'))
         AS BIGINT) AS sym
  FROM cdd
)
SELECT doc_id, n_chars, braces, semis, kw_hits,
       CAST(CASE WHEN n_chars > 0
            THEN floor(sym * 1000000.0 / n_chars) ELSE 0 END AS BIGINT)
         AS symbol_ppm,
       ((kw_hits >= 2 AND braces + semis >= 2)
        OR (CASE WHEN n_chars > 0
            THEN floor(sym * 1000000.0 / n_chars) ELSE 0 END) > 30000)
         AS is_code
FROM cdc
"""


_FIM_RATE = 50  # FIM rate (% of gated docs transformed)


def q_fim_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle sample prep routed off the code detector:
    documents the is_code gate routes to the code lane are FIM-split
    at hash-derived character positions (PSM and SPM orderings, 50%
    FIM rate), everything else passes through as plain CLM text —
    the code-pretraining staple (operators/corpus.py:fim_samples)
    composed with code_detect's routing, sharing span_corruption's
    deterministic-split + md5-fingerprint device."""
    from etl_finance_pipeline_spark.operators.corpus import fim_samples
    from etl_finance_pipeline_spark.operators.text_analysis import (
        code_signals,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    d = F.col("doc_id")
    dec = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(d % 7 == 0, F.repeat(F.lit(_CODE_SNIPPET), 3)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    routed = dec.join(
        code_signals(dec).select("doc_id", "is_code"), "doc_id"
    )
    return fim_samples(
        routed,
        gate_col="is_code",
        rate_pct=_FIM_RATE,
        keep_cols=("is_code",),
    )


SQL_FIM_SAMPLES = f"""
WITH fid AS (
  SELECT doc_id,
         text || (CASE WHEN doc_id % 7 = 0
                  THEN repeat('{_CODE_SNIPPET}', 3) ELSE '' END) AS text
  FROM documents
),
fic AS (SELECT doc_id, is_code FROM ({SQL_CODE_DETECT.strip()})),
fih AS (
  SELECT d.doc_id, d.text, c.is_code, len(d.text) AS n,
         (c.is_code AND
          {_H64.format(s="CAST(d.doc_id AS VARCHAR) || '#fim'")} % 100
            < {_FIM_RATE}) AS gated,
         {_H64.format(s="CAST(d.doc_id AS VARCHAR) || '#fo'")} % 2 AS ho,
         {_H64.format(s="CAST(d.doc_id AS VARCHAR) || '#fi'")} AS hi,
         {_H64.format(s="CAST(d.doc_id AS VARCHAR) || '#fj'")} AS hj
  FROM fid d JOIN fic c USING (doc_id)
),
fis AS (
  SELECT doc_id, is_code, text, n,
    CASE WHEN NOT gated THEN 'plain'
         WHEN ho = 0 THEN 'psm' ELSE 'spm' END AS mode,
    hi % (n + 1) AS i,
    (hi % (n + 1)) + (hj % (n - (hi % (n + 1)) + 1)) AS j
  FROM fih
)
SELECT doc_id, is_code, mode,
  CAST(n AS BIGINT) AS n_chars,
  CAST(CASE WHEN mode <> 'plain' THEN i END AS BIGINT) AS fim_i,
  CAST(CASE WHEN mode <> 'plain' THEN j END AS BIGINT) AS fim_j,
  md5(CASE WHEN mode = 'plain' THEN text
      WHEN mode = 'psm' THEN
        '<fim_prefix>' || substr(text, 1, i)
        || '<fim_suffix>' || substr(text, j + 1, n - j)
        || '<fim_middle>' || substr(text, i + 1, j - i)
      ELSE
        '<fim_suffix>' || substr(text, j + 1, n - j)
        || '<fim_prefix>' || substr(text, 1, i)
        || '<fim_middle>' || substr(text, i + 1, j - i)
      END) AS sample_md5
FROM fis
"""


#: the streaming lane shares the batch oracle (per-row maps only)
SQL_STREAM_FIM_SAMPLES = SQL_FIM_SAMPLES


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out n-gram novelty (memorization audit): split the corpus
    with the deterministic hash_split, then for each test-split doc
    measure the fraction of its distinct 3-gram shingles absent from
    the ENTIRE train split (operators/dedup.py: ngram_novelty) — the
    inverse of decontaminate. Distinct-before-join both sides; the
    held-out side is 5% of the corpus by construction."""
    from etl_finance_pipeline_spark.operators.corpus import hash_split
    from etl_finance_pipeline_spark.operators.dedup import ngram_novelty

    docs = _docs_spread(spark, sf_dir).select(
        "doc_id", "text"
    )
    split = hash_split(docs, "doc_id")
    train = split.filter(F.col("split") == "train").drop("split")
    heldout = split.filter(F.col("split") == "test").drop("split")
    return ngram_novelty(train, heldout)


SQL_NGRAM_NOVELTY = f"""
WITH nvb AS (
  SELECT doc_id, text,
         {_H64.format(s="CAST(doc_id AS VARCHAR)")} % 1000000 AS bucket
  FROM documents
),
nvtr AS (
  SELECT DISTINCT unnest(list_transform(
           generate_series(1, greatest(len(toks) - 2, 0)),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
  FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
        FROM nvb WHERE bucket < 900000)
),
nvho AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(toks) - 2, 0)),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
        FROM nvb WHERE bucket >= 950000)
)
SELECT h.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN t.shingle IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(floor(sum(CASE WHEN t.shingle IS NULL THEN 1 ELSE 0 END)
                  * 1000000.0 / count(*)) AS BIGINT) AS novelty_ppm
FROM nvho h LEFT JOIN nvtr t USING (shingle)
GROUP BY 1
"""


# --------------------------------------------------------------------
# Fused curation routing (batch + on the crawl ingest stream)
# --------------------------------------------------------------------

from etl_finance_pipeline_spark.operators.text_analysis import (  # noqa: E402
    CONTROL_CHAR_RE,
    MOJIBAKE_MARKERS,
)


def _route_decorate(docs: DataFrame) -> DataFrame:
    """Deterministic route-diversity decoration over (doc_id, text):
    script samples for doc_id % 7 ∈ 1..6, program text for % 7 == 0,
    a mojibake slice for % 13 == 0 (overlaps both — quarantine must
    win the priority)."""
    d = F.col("doc_id")
    parts = [F.col("text")]
    for i, name in enumerate(_SC_SAMPLES, start=1):
        parts.append(
            F.when(
                d % 7 == i, F.repeat(F.lit(_SC_SAMPLES[name]), _SC_REPEAT)
            ).otherwise(F.lit(""))
        )
    parts.append(
        F.when(d % 7 == 0, F.repeat(F.lit(_CODE_SNIPPET), 3)).otherwise(
            F.lit("")
        )
    )
    parts.append(
        F.when(d % 13 == 0, F.lit(_ENC_MOJI_SAMPLE)).otherwise(F.lit(""))
    )
    return docs.withColumn("text", F.concat(*parts))


def _route_decorate_sql(src: str, p: str) -> str:
    cases = "\n         || ".join(
        f"(CASE WHEN doc_id % 7 = {i} THEN repeat('{s}', {_SC_REPEAT}) "
        "ELSE '' END)"
        for i, s in enumerate(_SC_SAMPLES.values(), start=1)
    )
    return f"""{p} AS (
  SELECT * REPLACE (text
         || {cases}
         || (CASE WHEN doc_id % 7 = 0 THEN repeat('{_CODE_SNIPPET}', 3)
             ELSE '' END)
         || (CASE WHEN doc_id % 13 = 0 THEN '{_ENC_MOJI_SAMPLE}'
             ELSE '' END) AS text)
  FROM {src}
)"""


def _route_sql_ctes(src: str, keys: str, p: str) -> str:
    """CTE chain ``{p}cnt → {p}route`` over *src* (keys..., text):
    the DuckDB twin of operators/text_analysis.py: curation_route —
    encoding/code/script signal arithmetic shared verbatim with the
    per-signal oracles, fused the way the Spark projection fuses."""
    m0, m1 = MOJIBAKE_MARKERS
    return f"""{p}cnt AS (
  SELECT {keys},
    CAST(len(text) - len(replace(text, chr(65533), '')) AS BIGINT)
      AS repl_c,
    CAST(len(text) - len(regexp_replace(text, '{CONTROL_CHAR_RE}', '', 'g'))
         AS BIGINT) AS ctrl_c,
    CAST((len(text) - len(replace(text, '{m0}', '')))
         + (len(text) - len(replace(text, '{m1}', ''))) / 2 AS BIGINT)
      AS moji_c,
    CAST(len(text) AS BIGINT) AS n_chars,
    CAST((len(text) - len(replace(text, chr(123), '')))
         + (len(text) - len(replace(text, chr(125), ''))) AS BIGINT)
      AS braces,
    CAST(len(text) - len(replace(text, ';', '')) AS BIGINT) AS semis,
    CAST(len(regexp_extract_all(text, '{CODE_KEYWORD_RE}')) AS BIGINT)
      AS kw_hits,
    CAST(len(text) - len(regexp_replace(text, '{CODE_SYMBOL_RE}', '', 'g'))
         AS BIGINT) AS sym,
    {_SC_COUNTS}
  FROM {src}
),
{p}route AS (
  SELECT {keys},
    (repl_c > 0 OR ctrl_c > 0 OR moji_c > 0) AS enc_suspect,
    ((kw_hits >= 2 AND braces + semis >= 2)
     OR (CASE WHEN n_chars > 0 THEN floor(sym * 1000000.0 / n_chars)
         ELSE 0 END) > 30000) AS is_code,
    {_SC_DOM} AS dominant_script
  FROM {p}cnt
)"""


_ROUTE_CASE = (
    "CASE WHEN enc_suspect THEN 'quarantine' "
    "WHEN is_code THEN 'code' "
    "WHEN dominant_script NOT IN ('latin', 'und') THEN 'nonlatin' "
    "ELSE 'prose' END"
)


def q_curation_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The signal layer fused into one routing decision per document
    (operators/text_analysis.py: curation_route): encoding
    quarantine, code detection, and dominant-script census evaluated
    in a SINGLE codegen projection over a corpus decorated with all
    three route devices — quarantine outranks code outranks nonlatin
    outranks prose. Zero exchanges; the oracle fuses identically."""
    from etl_finance_pipeline_spark.operators.text_analysis import (
        curation_route,
    )

    from etl_finance_pipeline_spark.functions.layout import fan_out

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        "doc_id", "text"
    )
    return curation_route(_route_decorate(fan_out(docs)))


SQL_CURATION_ROUTE = f"""
WITH {_route_decorate_sql("documents", "crd")},
{_route_sql_ctes("crd", "doc_id", "cr")}
SELECT doc_id, enc_suspect, is_code, dominant_script,
       {_ROUTE_CASE} AS route
FROM crroute
"""


def q_stream_curation_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENTIRE crawl front door as ONE stateless streaming chain:
    blobs arrive as files → WARC record parse (Content-Length
    framing) → jusText-lite extraction → route-diversity decoration →
    the fused curation_route projection, with a 'reject_frame'
    override for framing-damaged records — append mode, no state
    store, no watermark. This is the composition a real ingest
    pipeline runs record-by-record before anything reaches the
    standing tables; every stage is a narrow map, so the whole chain
    is exactly-once trivially. Oracle = the batch parse + extract +
    decorate + route chain."""
    import shutil
    import tempfile
    import uuid

    from etl_finance_pipeline_spark.operators.corpus import (
        html_extract,
        synthesize_warc,
        warc_parse,
    )
    from etl_finance_pipeline_spark.operators.text_analysis import (
        curation_route,
    )
    from etl_finance_pipeline_spark.sources.tables import ensure_nanos_conf

    # stateless append chain: the only exchange is the explicit
    # repartition below, so the session width just needs to stay small
    # enough not to shred the microbatch's other plan nodes — derived,
    # not hardcoded (was a literal 8; round-10 verdict item)
    spark = _narrow_session(spark, _stream_fanout_width(spark, cap=8))
    ensure_nanos_conf(spark)
    blobs = synthesize_warc(_warc_pages(spark, sf_dir))
    tmp = tempfile.mkdtemp(prefix="warc_route_stream_")
    try:
        blobs.write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = spark.readStream.schema(schema).parquet(tmp)
        wx = html_extract(
            warc_parse(stream), html_col="payload", out_col="text"
        ).select("doc_id", "length_ok", "text")
        # the blob file source is a handful of multi-record rows — one
        # or two scan tasks. The record explode is cheap there, but the
        # fused 15-regex route projection is not: repartition between
        # the stateless parse and the CPU-bound signal map (allowed in
        # append mode, no state) so the signal work uses the executor
        # width. Measured: 14.7 s -> 6.5 s at sf0.1 (width 8 and the
        # derived full width bench identically here — the regex map
        # saturates well under core count at this row volume).
        routed = curation_route(
            _route_decorate(wx.repartition(_stream_fanout_width(spark))),
            keep_cols=("length_ok",),
        ).withColumn(
            "route",
            F.when(~F.col("length_ok"), F.lit("reject_frame")).otherwise(
                F.col("route")
            ),
        )
        name = f"stream_route_{uuid.uuid4().hex[:8]}"
        q = (
            routed.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _await_stream(q)
        return spark.table(name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SQL_STREAM_CURATION_ROUTE = f"""
WITH {_warc_parse_ctes()},
{_html_extract_ctes("wparse", "doc_id, uri, content_length, length_ok", "wx", " ", "payload")},
{_route_decorate_sql("wxdocs", "srd")},
{_route_sql_ctes("srd", "doc_id, length_ok", "sr")}
SELECT doc_id, length_ok, enc_suspect, is_code, dominant_script,
       CASE WHEN NOT length_ok THEN 'reject_frame'
            ELSE {_ROUTE_CASE} END AS route
FROM srroute
"""


# --------------------------------------------------------------------
# Margin-based bitext mining (CCMatrix/LASER device)
# --------------------------------------------------------------------

def _uni_noise(docs: DataFrame) -> DataFrame:
    """Deterministic Unicode-noise decoration over (doc_id, text) —
    the synthesize-from-fixture device for the normalization audit:
    a combining-acute sequence NFC would compose (doc_id%4==1),
    zero-width + BOM characters (%4==2), fullwidth/superscript/
    ligature NFKC-affected characters (%4==3), and a Cyrillic-а
    homoglyph inside a Latin word (%6==5)."""
    d = F.col("doc_id")
    noise = (
        F.when(d % 4 == 1, F.lit(" étude"))
        .when(d % 4 == 2, F.lit(" zero​width﻿"))
        .when(d % 4 == 3, F.lit(" Ｓale² ﬁne"))
        .otherwise(F.lit(""))
    )
    conf = F.when(d % 6 == 5, F.lit(" pаy")).otherwise(F.lit(""))
    return docs.withColumn("text", F.concat(F.col("text"), noise, conf))


def _uni_noise_sql(src: str, p: str) -> str:
    """DuckDB twin of :func:`_uni_noise` (chr() codes, so the twin
    stays visible in the source)."""
    return f"""{p} AS (
  SELECT * REPLACE (text
    || (CASE doc_id % 4
        WHEN 1 THEN ' e' || chr(769) || 'tude'
        WHEN 2 THEN ' zero' || chr(8203) || 'width' || chr(65279)
        WHEN 3 THEN ' ' || chr(65331) || 'ale' || chr(178) || ' '
                  || chr(64257) || 'ne'
        ELSE '' END)
    || (CASE WHEN doc_id % 6 = 5 THEN ' p' || chr(1072) || 'y'
        ELSE '' END) AS text)
  FROM {src}
)"""


def q_unicode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-normalization audit (operators/text_analysis.py:
    unicode_audit) over Unicode-noised documents: true NFC check
    (Arrow-batched unicodedata kernel vs DuckDB's nfc_normalize),
    zero-width, NFKC-flag-set, and homoglyph counts — the
    canonicalization gate that runs before hashing/dedup. The count
    patterns are shared verbatim with the twin; the NFC halves are
    two independent UAX #15 implementations agreeing on the hash."""
    from etl_finance_pipeline_spark.operators.text_analysis import (
        unicode_audit,
    )

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        "doc_id", "text"
    )
    return unicode_audit(_uni_noise(docs))


def _sql_count_re(pat: str) -> str:
    return (
        f"CAST(len(text) - len(regexp_replace(text, '{pat}', '', 'g'))"
        " AS BIGINT)"
    )


def _sql_unicode_audit_cols() -> str:
    from etl_finance_pipeline_spark.operators.text_analysis import (
        CONFUSABLE_RE,
        NFKC_FLAG_RE,
        ZERO_WIDTH_RE,
    )

    return f"""CAST(len(text) AS BIGINT) AS n_chars,
  (nfc_normalize(text) <> text) AS nfc_mismatch,
  {_sql_count_re(ZERO_WIDTH_RE)} AS n_zero_width,
  {_sql_count_re(NFKC_FLAG_RE)} AS n_nfkc_flagged,
  {_sql_count_re(CONFUSABLE_RE)} AS n_confusable,
  ((nfc_normalize(text) <> text)
   OR {_sql_count_re(ZERO_WIDTH_RE)} > 0
   OR {_sql_count_re(NFKC_FLAG_RE)} > 0
   OR {_sql_count_re(CONFUSABLE_RE)} > 0) AS uni_suspect"""


SQL_UNICODE_AUDIT = f"""
WITH {_uni_noise_sql("documents", "un")}
SELECT doc_id,
  {_sql_unicode_audit_cols()}
FROM un
"""


def q_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step paired with unicode_audit (operators/
    text_analysis.py:unicode_normalize): zero-width strip + true NFC
    over the Unicode-noised corpus, emitted as a fingerprint (md5 of
    the normalized text) plus change accounting — two independent
    UAX #15 implementations (unicodedata vs nfc_normalize) agreeing
    on the hash of the REWRITTEN text, not just the mismatch flag."""
    from etl_finance_pipeline_spark.operators.text_analysis import (
        unicode_normalize,
    )

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        "doc_id", "text"
    )
    out = unicode_normalize(_uni_noise(docs))
    return out.select(
        "doc_id",
        F.md5("text").alias("norm_md5"),
        "norm_changed",
        "n_norm_delta",
    )


def _sql_unicode_normalize_expr() -> str:
    from etl_finance_pipeline_spark.operators.text_analysis import (
        ZERO_WIDTH_RE,
    )

    return (
        f"nfc_normalize(regexp_replace(text, '{ZERO_WIDTH_RE}', '', 'g'))"
    )


SQL_UNICODE_NORMALIZE = f"""
WITH {_uni_noise_sql("documents", "unn")}
SELECT doc_id,
  md5({_sql_unicode_normalize_expr()}) AS norm_md5,
  ({_sql_unicode_normalize_expr()} <> text) AS norm_changed,
  CAST(len(text) - len({_sql_unicode_normalize_expr()}) AS BIGINT)
    AS n_norm_delta
FROM unn
"""


def q_unicode_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """curation_route EXTENDED by the normalization signal: over the
    route-decorated + Unicode-noised corpus, documents that clear
    quarantine/code/nonlatin but carry normalization debt
    (uni_suspect) route to 'normalize' — the NFC/NFKC-rewrite step a
    pipeline runs before hashing — instead of flowing into 'prose'
    unhashed. Homoglyph counts only reach the route when the dominant
    script is Latin/und (mixed-script is the TR39 signal; a genuinely
    Cyrillic page routes 'nonlatin' first). One audit projection +
    one fused route projection joined by id."""
    from etl_finance_pipeline_spark.operators.text_analysis import (
        curation_route,
        unicode_audit,
    )

    docs = load_table(spark, _t(sf_dir, "documents")).select(
        "doc_id", "text"
    )
    base = _uni_noise(_route_decorate(docs))
    ua = unicode_audit(base).select("doc_id", "uni_suspect")
    out = curation_route(base.join(ua, "doc_id"), keep_cols=("uni_suspect",))
    return out.select(
        "doc_id",
        "enc_suspect",
        "is_code",
        "dominant_script",
        "uni_suspect",
        F.when(F.col("route") != "prose", F.col("route"))
        .when(F.col("uni_suspect"), F.lit("normalize"))
        .otherwise(F.lit("prose"))
        .alias("route"),
    )


SQL_UNICODE_ROUTE = f"""
WITH {_route_decorate_sql("documents", "urd")},
{_uni_noise_sql("urd", "urn")},
{_route_sql_ctes("urn", "doc_id", "ur")},
uau AS (
  SELECT doc_id,
  {_sql_unicode_audit_cols()}
  FROM urn
)
SELECT r.doc_id, r.enc_suspect, r.is_code, r.dominant_script,
       u.uni_suspect,
       CASE WHEN r.enc_suspect THEN 'quarantine'
            WHEN r.is_code THEN 'code'
            WHEN r.dominant_script NOT IN ('latin', 'und') THEN 'nonlatin'
            WHEN u.uni_suspect THEN 'normalize'
            ELSE 'prose' END AS route
FROM urroute r JOIN uau u USING (doc_id)
"""


def q_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel-corpus candidate mining between the en and de slices
    of the corpus: every en embedding is paired with its best-margin
    de embedding under the Artetxe-Schwenk RATIO margin (cosine
    normalized by both sides' k-NN average, k=4 — the hubness
    correction), kept when the margin clears 1.05
    (operators/similarity.py: bitext_margin_mine). Micro-unit
    integer arithmetic end-to-end, so the oracle replays it exactly."""
    from etl_finance_pipeline_spark.operators.similarity import (
        bitext_margin_mine,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    docs = load_table(spark, _t(sf_dir, "documents")).select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    j = emb.join(docs, "vec_id")
    en = j.filter(F.col("lang") == "en")
    de = j.filter(F.col("lang") == "de")
    return bitext_margin_mine(en, de, k=4, margin_threshold_ppm=1_050_000)


#: en/de sides of the embedding space (doc metadata joined by id)
_BITEXT_SIDES = """btj AS (
  SELECT e.vec_id, d.lang, e.embedding
  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
),
bta AS (SELECT vec_id AS src_id, embedding AS va FROM btj WHERE lang = 'en'),
btb AS (SELECT vec_id AS tgt_id, embedding AS vb FROM btj WHERE lang = 'de')"""


def _bitext_margin_sql(cand: str, p: str, k: int = 4) -> str:
    """CTE chain ``{p}r → {p}dx/{p}dy → {p}s → {p}best`` over a
    candidate frame *cand* (src_id, tgt_id, cos_u) — the DuckDB twin
    of operators/similarity.py: _margin_from_pairs, shared by the
    exact and IVF-bucketed miners."""
    return f"""{p}r AS (
  SELECT *,
    row_number() OVER (PARTITION BY src_id ORDER BY cos_u DESC, tgt_id) AS ra,
    row_number() OVER (PARTITION BY tgt_id ORDER BY cos_u DESC, src_id) AS rb
  FROM {cand}
),
{p}dx AS (
  SELECT src_id, sum(cos_u) AS dx, count(*) AS kx
  FROM {p}r WHERE ra <= {k} GROUP BY 1
),
{p}dy AS (
  SELECT tgt_id, sum(cos_u) AS dy, count(*) AS ky
  FROM {p}r WHERE rb <= {k} GROUP BY 1
),
{p}s AS (
  -- margin UNDEFINED (NULL, dropped by the threshold filter) when the
  -- candidate neighborhood's average cosine is non-positive — mirrors
  -- the Spark guard in _margin_from_pairs
  SELECT c.src_id, c.tgt_id, c.cos_u,
         CASE WHEN (dx * 1.0 / kx + dy * 1.0 / ky) > 0
              THEN CAST(floor(2.0 * c.cos_u * 1000000.0
                         / (dx * 1.0 / kx + dy * 1.0 / ky) + 0.5) AS BIGINT)
         END AS margin_ppm
  FROM {cand} c JOIN {p}dx USING (src_id) JOIN {p}dy USING (tgt_id)
),
{p}best AS (
  SELECT src_id, tgt_id, cos_u, margin_ppm, row_number() OVER (
    PARTITION BY src_id ORDER BY margin_ppm DESC, tgt_id) AS rn
  FROM {p}s
)"""


_BITEXT_BRUTE_CAND = f"""btp AS (
  SELECT src_id, tgt_id,
         CAST(floor(({_COS_SQL.format(a='va', b='vb')}) * 1000000 + 0.5)
              AS BIGINT) AS cos_u
  FROM bta CROSS JOIN btb
)"""

#: IVF-bucketed candidates: seeded codebook (vec_id < 8 — the
#: ann_ivf_topk device), targets in their single nearest list,
#: sources probing their 2 nearest lists
_BITEXT_IVF_CAND = f"""btc AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8
),
btsl AS (
  SELECT src_id, va, cid FROM (
    SELECT a.src_id, a.va, c.cid,
           row_number() OVER (
             PARTITION BY a.src_id
             ORDER BY {_COS_SQL.format(a='a.va', b='c.cvec')} DESC, c.cid
           ) AS pr
    FROM bta a CROSS JOIN btc c
  ) WHERE pr <= 2
),
bttl AS (
  SELECT tgt_id, vb, cid FROM (
    SELECT b.tgt_id, b.vb, c.cid,
           row_number() OVER (
             PARTITION BY b.tgt_id
             ORDER BY {_COS_SQL.format(a='b.vb', b='c.cvec')} DESC, c.cid
           ) AS pr
    FROM btb b CROSS JOIN btc c
  ) WHERE pr = 1
),
btvp AS (
  SELECT s.src_id, t.tgt_id,
         CAST(floor(({_COS_SQL.format(a='s.va', b='t.vb')}) * 1000000 + 0.5)
              AS BIGINT) AS cos_u
  FROM btsl s JOIN bttl t USING (cid)
)"""


SQL_BITEXT_MINE = f"""
WITH {_BITEXT_SIDES},
{_BITEXT_BRUTE_CAND},
{_bitext_margin_sql("btp", "bb")}
SELECT src_id, tgt_id, cos_u AS cos_ppm, margin_ppm
FROM bbbest WHERE rn = 1 AND margin_ppm >= 1050000
"""


def q_bitext_mine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bitext_mine with the IVF-bucketed candidate generator — the
    shape that survives both sides growing to 10⁸ vectors: targets
    live in their nearest-centroid inverted list, sources probe 2
    lists, margins are mined within candidate buckets only
    (operators/similarity.py: bitext_margin_mine_ivf). Same contract
    and threshold as the exact miner; bitext_recall measures what
    the bucketing costs."""
    from etl_finance_pipeline_spark.operators.similarity import (
        bitext_margin_mine_ivf,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    docs = load_table(spark, _t(sf_dir, "documents")).select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    j = emb.join(docs, "vec_id")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    return bitext_margin_mine_ivf(
        j.filter(F.col("lang") == "en"),
        j.filter(F.col("lang") == "de"),
        cents,
        k=4,
        nprobe=2,
        margin_threshold_ppm=1_050_000,
    )


SQL_BITEXT_MINE_IVF = f"""
WITH {_BITEXT_SIDES},
{_BITEXT_IVF_CAND},
{_bitext_margin_sql("btvp", "bv")}
SELECT src_id, tgt_id, cos_u AS cos_ppm, margin_ppm
FROM bvbest WHERE rn = 1 AND margin_ppm >= 1050000
"""


def q_bitext_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-eval readout for the mining index (lsh_recall /
    ann_recall device applied to bitext): how many of the EXACT
    miner's kept pairs the IVF-bucketed miner reproduces — pair
    counts of both miners, the intersection, and recall in ppm. One
    row; the pre-deployment answer to "can we afford the bucketed
    candidate generator"."""
    from etl_finance_pipeline_spark.operators.similarity import (
        bitext_margin_mine,
        bitext_margin_mine_ivf,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    docs = load_table(spark, _t(sf_dir, "documents")).select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    j = emb.join(docs, "vec_id")
    en = j.filter(F.col("lang") == "en")
    de = j.filter(F.col("lang") == "de")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    # materialize both kept-pair frames (≤ |src| rows each) before the
    # three counting actions — without this each count re-executes the
    # full mining chain and the query benches ~3× its real cost. The
    # two miners are independent: overlap their materializations so
    # the IVF lane back-fills the brute lane's idle tail (guide §2.6).
    from concurrent.futures import ThreadPoolExecutor

    def _brute():
        return (
            bitext_margin_mine(en, de, k=4, margin_threshold_ppm=1_050_000)
            .select("src_id", "tgt_id")
            .localCheckpoint(eager=True)
        )

    def _ivf():
        return (
            bitext_margin_mine_ivf(
                en, de, cents, k=4, nprobe=2, margin_threshold_ppm=1_050_000
            )
            .select("src_id", "tgt_id")
            .localCheckpoint(eager=True)
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        fb, fv = pool.submit(_brute), pool.submit(_ivf)
        brute, ivf = fb.result(), fv.result()
    common = brute.join(ivf, ["src_id", "tgt_id"]).count()
    nb = brute.count()
    nv = ivf.count()
    return load_table(spark, _t(sf_dir, "region")).limit(1).select(
        F.lit(nb).cast("long").alias("n_brute"),
        F.lit(nv).cast("long").alias("n_ivf"),
        F.lit(common).cast("long").alias("n_common"),
        F.lit(int(common * 1_000_000 // nb) if nb else 0)
        .cast("long")
        .alias("recall_ppm"),
    )


SQL_BITEXT_RECALL = f"""
WITH {_BITEXT_SIDES},
{_BITEXT_BRUTE_CAND},
{_bitext_margin_sql("btp", "bb")},
{_BITEXT_IVF_CAND},
{_bitext_margin_sql("btvp", "bv")},
kept_b AS (
  SELECT src_id, tgt_id FROM bbbest WHERE rn = 1 AND margin_ppm >= 1050000
),
kept_v AS (
  SELECT src_id, tgt_id FROM bvbest WHERE rn = 1 AND margin_ppm >= 1050000
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM kept_b) AS n_brute,
  (SELECT CAST(count(*) AS BIGINT) FROM kept_v) AS n_ivf,
  (SELECT CAST(count(*) AS BIGINT)
   FROM kept_b JOIN kept_v USING (src_id, tgt_id)) AS n_common,
  -- guard mirrors the Spark side's `if nb else 0`: zero kept exact
  -- pairs must read as recall 0, not a division error
  CAST(CASE WHEN (SELECT count(*) FROM kept_b) = 0 THEN 0
       ELSE (SELECT count(*) FROM kept_b JOIN kept_v USING (src_id, tgt_id))
            * 1000000 // (SELECT count(*) FROM kept_b) END
       AS BIGINT) AS recall_ppm
"""


def q_source_route_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-card rollup of the fused routing gate: per source,
    how much of the corpus each route claims (doc counts per route +
    ppm fraction) — the per-provider quality/content mix a datasheet
    reports next to source_census's volume numbers. One narrow route
    projection + one groupBy; route fractions are exact integers."""
    from etl_finance_pipeline_spark.operators.text_analysis import (
        curation_route,
    )

    from etl_finance_pipeline_spark.functions.layout import fan_out

    docs = _docs_spread(spark, sf_dir)
    routed = curation_route(
        # fan_out: the fused signal projection is regex-CPU-bound and a
        # single-file scan would otherwise run it on one task
        _route_decorate(fan_out(docs.select("doc_id", "source", "text"))),
        keep_cols=("source",),
    )
    per = routed.groupBy("source", "route").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    # totals re-aggregate the k×routes frame (one corpus pass total);
    # aggregating `routed` again would evaluate the signal projection
    # a second time over the whole corpus
    tot = per.groupBy("source").agg(F.sum("n_docs").alias("_tot"))
    return per.join(tot, "source").select(
        "source",
        "route",
        "n_docs",
        F.floor(F.col("n_docs") * 1_000_000 / F.col("_tot"))
        .cast("long")
        .alias("frac_ppm"),
    )


SQL_SOURCE_ROUTE_CENSUS = f"""
WITH srcd0 AS (SELECT doc_id, source, text FROM documents),
{_route_decorate_sql("srcd0", "srcd")},
{_route_sql_ctes("srcd", "doc_id, source", "sc2")},
srcr AS (
  SELECT source, {_ROUTE_CASE} AS route FROM sc2route
),
srcn AS (
  SELECT source, route, CAST(count(*) AS BIGINT) AS n_docs
  FROM srcr GROUP BY 1, 2
),
srct AS (SELECT source, sum(n_docs) AS tot FROM srcn GROUP BY 1)
SELECT source, route, n_docs,
       CAST(floor(n_docs * 1000000.0 / tot) AS BIGINT) AS frac_ppm
FROM srcn JOIN srct USING (source)
"""


# --------------------------------------------------------------------
# Water-filling mixture allocation under per-source epoch caps
# --------------------------------------------------------------------

_WF_ROUNDS = 4
_WF_BUDGET_X = 2.0     # token budget = 2x the unique corpus
_WF_MAX_EPOCHS = 2.5   # no source may repeat beyond 2.5 epochs


def q_mixture_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget allocation the day the target mixture collides with
    reality: a Zipfian target (weight ∝ 1/rank by source size — the
    deliberately skewed ask) wants more tokens from head sources than
    their epoch cap (2.5× unique tokens) allows, so the allocator
    WATER-FILLS — each round gives every uncapped source its
    weight-share of the remaining budget, clips at the cap, and
    re-distributes the overflow to the still-uncapped tail
    (`_WF_ROUNDS` fixed rounds, the unrolled-oracle device).

    Corpus-scale work is ONE per-source token aggregate; the k-source
    allocation state collapses to a single sorted-array row (the
    doremi_weights device) where every fold is a deterministic
    source-order left fold and every intermediate is floor(+0.5)
    fixed-point, so the DuckDB twin replays it bit-exactly.

    Output: (source, unique_tokens, rank, target_w_ppm, cap_tokens,
    alloc_tokens, epochs, capped)."""
    docs = load_table(spark, _t(sf_dir, "documents")).select(
        "source", F.size(F.split(F.col("text"), r"\s+")).alias("n_tok")
    )
    base = docs.groupBy("source").agg(
        F.sum("n_tok").cast("long").alias("uniq")
    )
    wr = Window.orderBy(F.col("uniq").desc(), F.col("source"))
    ranked = base.withColumn("rank", F.row_number().over(wr).cast("long"))
    arr = ranked.agg(
        F.sort_array(
            F.collect_list(F.struct("source", "uniq", "rank"))
        ).alias("_xs")
    )
    xs = F.col("_xs")
    hk = F.aggregate(xs, F.lit(0.0), lambda a, x: a + 1.0 / x["rank"])
    total = F.aggregate(
        xs, F.lit(0).cast("long"), lambda a, x: a + x["uniq"]
    )
    arr = arr.select(
        xs,
        F.floor(F.lit(_WF_BUDGET_X) * total).cast("long").alias("_B"),
        F.transform(
            xs,
            lambda x: F.struct(
                x["source"].alias("source"),
                x["uniq"].alias("uniq"),
                x["rank"].alias("rank"),
                F.floor(1_000_000.0 / (x["rank"] * hk) + F.lit(0.5))
                .cast("long")
                .alias("wu"),
                F.floor(F.lit(_WF_MAX_EPOCHS) * x["uniq"])
                .cast("long")
                .alias("cap"),
                F.lit(0).cast("long").alias("alloc"),
            ),
        ).alias("_st"),
    )
    st = F.col("_st")
    for _ in range(_WF_ROUNDS):
        sw = F.aggregate(
            st,
            F.lit(0).cast("long"),
            lambda a, s: a
            + F.when(s["alloc"] < s["cap"], s["wu"]).otherwise(F.lit(0)),
        )
        slc = F.aggregate(
            st, F.lit(0).cast("long"), lambda a, s: a + s["alloc"]
        )
        rem = F.greatest(F.col("_B") - slc, F.lit(0).cast("long"))
        new_st = F.transform(
            st,
            lambda s: F.struct(
                s["source"].alias("source"),
                s["uniq"].alias("uniq"),
                s["rank"].alias("rank"),
                s["wu"].alias("wu"),
                s["cap"].alias("cap"),
                F.least(
                    s["cap"],
                    s["alloc"]
                    + F.when(
                        (s["alloc"] < s["cap"]) & (sw > 0),
                        F.floor(
                            rem * 1.0 * s["wu"] / sw + F.lit(0.5)
                        ).cast("long"),
                    ).otherwise(F.lit(0).cast("long")),
                ).alias("alloc"),
            ),
        )
        # the round expression references _st three times (the state
        # itself + the sw/rem folds over it); without lineage
        # truncation CollapseProject substitutes the previous round's
        # tree into every reference and the plan grows ~(3k)^rounds —
        # measured: rounds 1/2/3 analyzed in 1.5 s / 1.5 s / >9 min.
        # localCheckpoint per round (the pagerank/bpe_train device)
        # keeps each round's tree one round deep; the frame is ONE
        # control-plane row, so the checkpoint is free.
        arr = arr.select(F.col("_B"), new_st.alias("_st")).localCheckpoint(
            eager=True
        )
    out = arr.select(F.explode(st).alias("_s")).select(
        F.col("_s.source").alias("source"),
        F.col("_s.uniq").alias("unique_tokens"),
        F.col("_s.rank").alias("rank"),
        F.col("_s.wu").alias("target_w_ppm"),
        F.col("_s.cap").alias("cap_tokens"),
        F.col("_s.alloc").alias("alloc_tokens"),
        (
            F.floor(F.col("_s.alloc") * 1_000_000.0 / F.col("_s.uniq"))
            / 1_000_000.0
        ).alias("epochs"),
        (F.col("_s.alloc") >= F.col("_s.cap")).alias("capped"),
    )
    return out


def _wf_round_sql(t: int, p: str = "wf") -> str:
    return f"""
{p}w{t} AS (
  SELECT b,
    list_transform(st, s -> struct_pack(
      source := s.source, uniq := s.uniq, rank := s.rank,
      wu := s.wu, cap := s.cap,
      alloc := least(s.cap, s.alloc + (CASE
        WHEN s.alloc < s.cap
             AND list_reduce(list_transform(st,
                   x -> CASE WHEN x.alloc < x.cap THEN x.wu ELSE 0 END),
                   (a, v) -> a + v) > 0
        THEN CAST(floor(
               greatest(b - list_reduce(list_transform(st, x -> x.alloc),
                                        (a, v) -> a + v), 0)
               * 1.0 * s.wu
               / list_reduce(list_transform(st,
                   x -> CASE WHEN x.alloc < x.cap THEN x.wu ELSE 0 END),
                   (a, v) -> a + v) + 0.5) AS BIGINT)
        ELSE 0 END))
    )) AS st
  FROM {p}w{t - 1}
)"""


SQL_MIXTURE_WATERFILL = f"""
WITH wfb AS (
  SELECT source,
         CAST(sum(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)
           AS uniq
  FROM documents GROUP BY 1
),
wfr AS (
  SELECT source, uniq,
         CAST(row_number() OVER (ORDER BY uniq DESC, source) AS BIGINT)
           AS rank
  FROM wfb
),
wfarr AS (
  SELECT list(struct_pack(source := source, uniq := uniq, rank := rank)
              ORDER BY source) AS xs
  FROM wfr
),
wfw0 AS (
  SELECT
    CAST(floor({_WF_BUDGET_X}
         * list_reduce(list_transform(xs, x -> x.uniq), (a, v) -> a + v))
         AS BIGINT) AS b,
    list_transform(xs, x -> struct_pack(
      source := x.source, uniq := x.uniq, rank := x.rank,
      wu := CAST(floor(1000000.0 / (x.rank
              * list_reduce(list_transform(xs, y -> 1.0 / y.rank),
                            (a, v) -> a + v)) + 0.5) AS BIGINT),
      cap := CAST(floor({_WF_MAX_EPOCHS} * x.uniq) AS BIGINT),
      alloc := CAST(0 AS BIGINT))) AS st
  FROM wfarr
),
{",".join(_wf_round_sql(t) for t in range(1, _WF_ROUNDS + 1))},
wffin AS (
  SELECT unnest(st) AS s FROM wfw{_WF_ROUNDS}
)
SELECT s.source AS source,
       s.uniq AS unique_tokens,
       s.rank AS rank,
       s.wu AS target_w_ppm,
       s.cap AS cap_tokens,
       s.alloc AS alloc_tokens,
       floor(s.alloc * 1000000.0 / s.uniq) / 1000000.0 AS epochs,
       (s.alloc >= s.cap) AS capped
FROM wffin
"""


# --------------------------------------------------------------------
# Annealing mixture schedule (staged phase × source allocation)
# --------------------------------------------------------------------

#: (budget share ppm, quality-interpolation λ ppm) per training phase:
#: the main run samples by size, the final anneal phase samples by
#: quality — the "anneal on high-quality data" recipe
_AN_PHASES = ((600_000, 0), (300_000, 500_000), (100_000, 1_000_000))
_AN_ROUNDS = 3
_AN_BUDGET_X = 1.6
#: tighter than mixture_waterfill's 2.5 ON PURPOSE: with budget 1.6x
#: an uncapped schedule averages 1.6 epochs, so a 1.65x cap binds
#: exactly on the sources the quality-tilted anneal phases favor —
#: the oracle exercises clipping + redistribution + cap carry across
#: phases without phase 0 saturating everything
_AN_MAX_EPOCHS = 1.65


def q_anneal_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum/annealing mixture schedule: the token budget is
    split across fixed training phases (60/30/10), and each phase's
    per-source target weight interpolates from SIZE share (λ=0, the
    main run) to QUALITY share (λ=1, the final anneal) — the staged
    mixture a data-constrained run plans so its last tokens come from
    its best sources. Each phase allocates its budget with the
    mixture_waterfill cap machinery (give weight-share of the
    remainder, clip at the 2.5-epoch cap, redistribute — `_AN_ROUNDS`
    rounds), and caps CARRY ACROSS phases: tokens the main phase
    consumed count against the anneal phase's repetition headroom.

    Corpus-scale work is ONE per-source token+quality aggregate; the
    phase × round state is a single sorted-array row evolved by
    deterministic folds (every intermediate floor(+0.5) fixed-point,
    per-round localCheckpoint — the waterfill/doremi device), so the
    DuckDB twin unrolls the identical schedule.

    Output: (phase, source, phase_w_ppm, phase_budget, alloc_tokens,
    cum_tokens, capped)."""
    from etl_finance_pipeline_spark.operators.text_analysis import (
        quality_score,
    )

    docs = _docs_spread(spark, sf_dir)
    q = quality_score(docs).select(
        "source",
        F.size(F.split(F.col("text"), r"\s+")).alias("n_tok"),
        F.floor(F.col("quality") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("qppm"),
    )
    base = q.groupBy("source").agg(
        F.sum("n_tok").cast("long").alias("uniq"),
        F.floor(F.sum("qppm") * 1.0 / F.count("*") + F.lit(0.5))
        .cast("long")
        .alias("qual"),
    )
    arr = base.agg(
        F.sort_array(
            F.collect_list(F.struct("source", "uniq", "qual"))
        ).alias("_xs")
    )
    xs = F.col("_xs")
    tot_u = F.aggregate(xs, F.lit(0).cast("long"), lambda a, x: a + x["uniq"])
    tot_q = F.aggregate(xs, F.lit(0).cast("long"), lambda a, x: a + x["qual"])
    arr = arr.select(
        F.floor(F.lit(_AN_BUDGET_X) * tot_u).cast("long").alias("_B"),
        F.transform(
            xs,
            lambda x: F.struct(
                x["source"].alias("source"),
                x["uniq"].alias("uniq"),
                F.floor(x["uniq"] * 1_000_000.0 / tot_u + F.lit(0.5))
                .cast("long")
                .alias("ws"),
                F.floor(x["qual"] * 1_000_000.0 / tot_q + F.lit(0.5))
                .cast("long")
                .alias("wq"),
                F.floor(F.lit(_AN_MAX_EPOCHS) * x["uniq"])
                .cast("long")
                .alias("cap"),
                F.lit(0).cast("long").alias("cum"),
                F.lit(0).cast("long").alias("wu"),
                F.lit(0).cast("long").alias("pa"),
            ),
        ).alias("_st"),
    ).localCheckpoint(eager=True)
    st = F.col("_st")
    snapshots = []
    for p, (share, lam) in enumerate(_AN_PHASES):
        bp = F.floor(F.col("_B") * share / 1_000_000.0).cast("long")
        # phase entry: set the phase weight (size→quality interp) and
        # reset the phase allocation
        arr = arr.select(
            F.col("_B"),
            bp.alias("_Bp"),
            F.transform(
                st,
                lambda s: F.struct(
                    s["source"].alias("source"),
                    s["uniq"].alias("uniq"),
                    s["ws"].alias("ws"),
                    s["wq"].alias("wq"),
                    s["cap"].alias("cap"),
                    s["cum"].alias("cum"),
                    F.floor(
                        (
                            (1_000_000 - lam) * s["ws"]
                            + F.lit(lam) * s["wq"]
                        )
                        / 1_000_000.0
                        + F.lit(0.5)
                    )
                    .cast("long")
                    .alias("wu"),
                    F.lit(0).cast("long").alias("pa"),
                ),
            ).alias("_st"),
        ).localCheckpoint(eager=True)
        for _ in range(_AN_ROUNDS):
            sw = F.aggregate(
                st,
                F.lit(0).cast("long"),
                lambda a, s: a
                + F.when(s["cum"] < s["cap"], s["wu"]).otherwise(F.lit(0)),
            )
            spa = F.aggregate(
                st, F.lit(0).cast("long"), lambda a, s: a + s["pa"]
            )
            rem = F.greatest(F.col("_Bp") - spa, F.lit(0).cast("long"))

            def _grow_factory(sw, rem):
                def _grow(s):
                    give = F.least(
                        s["cap"] - s["cum"],
                        F.when(
                            (s["cum"] < s["cap"]) & (sw > 0),
                            F.floor(
                                rem * 1.0 * s["wu"] / sw + F.lit(0.5)
                            ).cast("long"),
                        ).otherwise(F.lit(0).cast("long")),
                    )
                    return F.struct(
                        s["source"].alias("source"),
                        s["uniq"].alias("uniq"),
                        s["ws"].alias("ws"),
                        s["wq"].alias("wq"),
                        s["cap"].alias("cap"),
                        (s["cum"] + give).alias("cum"),
                        s["wu"].alias("wu"),
                        (s["pa"] + give).alias("pa"),
                    )

                return _grow

            arr = arr.select(
                F.col("_B"),
                F.col("_Bp"),
                F.transform(st, _grow_factory(sw, rem)).alias("_st"),
            ).localCheckpoint(eager=True)
        snapshots.append(
            arr.select(
                F.lit(p).cast("long").alias("phase"),
                F.col("_Bp").alias("phase_budget"),
                F.explode(st).alias("_s"),
            ).select(
                "phase",
                F.col("_s.source").alias("source"),
                F.col("_s.wu").alias("phase_w_ppm"),
                "phase_budget",
                F.col("_s.pa").alias("alloc_tokens"),
                F.col("_s.cum").alias("cum_tokens"),
                (F.col("_s.cum") >= F.col("_s.cap")).alias("capped"),
            )
        )
    out = snapshots[0]
    for s in snapshots[1:]:
        out = out.unionAll(s)
    return out


def _an_phase_sql(p: int, share: int, lam: int, prev: str) -> str:
    """Phase-entry + `_AN_ROUNDS` waterfill-round CTEs for phase *p*
    over the state list carried from CTE *prev* — the DuckDB twin of
    one q_anneal_schedule phase."""
    entry = f"""anp{p} AS (
  SELECT b, CAST(floor(b * {share} / 1000000.0) AS BIGINT) AS bp,
    list_transform(st, s -> struct_pack(
      source := s.source, uniq := s.uniq, ws := s.ws, wq := s.wq,
      cap := s.cap, cum := s.cum,
      wu := CAST(floor(((1000000 - {lam}) * s.ws + {lam} * s.wq)
                       / 1000000.0 + 0.5) AS BIGINT),
      pa := CAST(0 AS BIGINT)))
      AS st
  FROM {prev}
)"""
    rounds = []
    for t in range(1, _AN_ROUNDS + 1):
        src = f"anp{p}" if t == 1 else f"anr{p}_{t - 1}"
        rounds.append(f"""anr{p}_{t} AS (
  SELECT b, bp,
    list_transform(st, s -> struct_pack(
      source := s.source, uniq := s.uniq, ws := s.ws, wq := s.wq,
      cap := s.cap,
      cum := s.cum + least(s.cap - s.cum, CASE
        WHEN s.cum < s.cap
             AND list_reduce(list_transform(st,
                   x -> CASE WHEN x.cum < x.cap THEN x.wu ELSE 0 END),
                   (a, v) -> a + v) > 0
        THEN CAST(floor(
               greatest(bp - list_reduce(list_transform(st, x -> x.pa),
                                         (a, v) -> a + v), 0)
               * 1.0 * s.wu
               / list_reduce(list_transform(st,
                   x -> CASE WHEN x.cum < x.cap THEN x.wu ELSE 0 END),
                   (a, v) -> a + v) + 0.5) AS BIGINT)
        ELSE CAST(0 AS BIGINT) END),
      wu := s.wu,
      pa := s.pa + least(s.cap - s.cum, CASE
        WHEN s.cum < s.cap
             AND list_reduce(list_transform(st,
                   x -> CASE WHEN x.cum < x.cap THEN x.wu ELSE 0 END),
                   (a, v) -> a + v) > 0
        THEN CAST(floor(
               greatest(bp - list_reduce(list_transform(st, x -> x.pa),
                                         (a, v) -> a + v), 0)
               * 1.0 * s.wu
               / list_reduce(list_transform(st,
                   x -> CASE WHEN x.cum < x.cap THEN x.wu ELSE 0 END),
                   (a, v) -> a + v) + 0.5) AS BIGINT)
        ELSE CAST(0 AS BIGINT) END)))
      AS st
  FROM {src}
)""")
    return ",\n".join([entry, *rounds])


def _an_sql() -> str:
    parts = []
    prev = "anw0"
    for p, (share, lam) in enumerate(_AN_PHASES):
        parts.append(_an_phase_sql(p, share, lam, prev))
        prev = f"anr{p}_{_AN_ROUNDS}"
    finals = " UNION ALL ".join(
        f"""SELECT CAST({p} AS BIGINT) AS phase, bp AS phase_budget,
       unnest(st) AS s FROM anr{p}_{_AN_ROUNDS}"""
        for p in range(len(_AN_PHASES))
    )
    return ",\n".join(parts) + f",\nanfin AS ({finals})"


SQL_ANNEAL_SCHEDULE = f"""
WITH anq AS (
  SELECT q.doc_id, d.source,
         CAST(len(regexp_split_to_array(d.text, '\\s+')) AS BIGINT) AS n_tok,
         CAST(floor(q.quality * 1000000 + 0.5) AS BIGINT) AS qppm
  FROM ({{qs}}) q JOIN documents d USING (doc_id)
),
anb AS (
  SELECT source, CAST(sum(n_tok) AS BIGINT) AS uniq,
         CAST(floor(sum(qppm) * 1.0 / count(*) + 0.5) AS BIGINT) AS qual
  FROM anq GROUP BY 1
),
anarr AS (
  SELECT list(struct_pack(source := source, uniq := uniq, qual := qual)
              ORDER BY source) AS xs
  FROM anb
),
anw0 AS (
  SELECT
    CAST(floor({_AN_BUDGET_X}
         * list_reduce(list_transform(xs, x -> x.uniq), (a, v) -> a + v))
         AS BIGINT) AS b,
    list_transform(xs, x -> struct_pack(
      source := x.source, uniq := x.uniq,
      ws := CAST(floor(x.uniq * 1000000.0
              / list_reduce(list_transform(xs, y -> y.uniq), (a, v) -> a + v)
              + 0.5) AS BIGINT),
      wq := CAST(floor(x.qual * 1000000.0
              / list_reduce(list_transform(xs, y -> y.qual), (a, v) -> a + v)
              + 0.5) AS BIGINT),
      cap := CAST(floor({_AN_MAX_EPOCHS} * x.uniq) AS BIGINT),
      cum := CAST(0 AS BIGINT),
      wu := CAST(0 AS BIGINT),
      pa := CAST(0 AS BIGINT))) AS st
  FROM anarr
),
{_an_sql()}
SELECT phase, s.source AS source, s.wu AS phase_w_ppm, phase_budget,
       s.pa AS alloc_tokens, s.cum AS cum_tokens,
       (s.cum >= s.cap) AS capped
FROM anfin
""".format(qs=SQL_QUALITY_SCORE.strip())


def q_domain_quality_prior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain reputation priors — the stage that turns per-document
    quality into a per-PROVIDER signal and back: each doc's quality
    (micro-units, the quality_score arithmetic) is aggregated into
    its registrable domain's exact fixed-point mean, and every doc is
    scored against its own domain's prior — a residual more than 0.1
    quality units BELOW the prior flags likely boilerplate/spam pages
    on otherwise-good domains (and protects marginal pages on strong
    domains from doc-level false rejects). Corpus pass + one
    broadcast join of the k-domain prior table; exact integer means.
    Output: (doc_id, domain, quality_ppm, domain_mean_ppm, resid_ppm,
    below_prior)."""
    from etl_finance_pipeline_spark.operators.corpus import (
        canonical_host,
        registrable_domain,
    )
    from etl_finance_pipeline_spark.operators.text_analysis import (
        quality_score,
    )

    docs = load_table(spark, _t(sf_dir, "documents"))
    q = quality_score(docs).select(
        "doc_id",
        F.floor(F.col("quality") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("quality_ppm"),
    )
    dom = docs.withColumn("url", _url_expr()).select(
        "doc_id",
        registrable_domain(canonical_host(F.col("url"))).alias("domain"),
    )
    j = q.join(dom, "doc_id")
    prior = j.groupBy("domain").agg(
        F.floor(
            F.sum("quality_ppm") * 1.0 / F.count("*") + F.lit(0.5)
        )
        .cast("long")
        .alias("domain_mean_ppm")
    )
    out = j.join(F.broadcast(prior), "domain")
    resid = F.col("quality_ppm") - F.col("domain_mean_ppm")
    return out.select(
        "doc_id",
        "domain",
        "quality_ppm",
        "domain_mean_ppm",
        resid.alias("resid_ppm"),
        (resid < -100_000).alias("below_prior"),
    )


SQL_DOMAIN_QUALITY_PRIOR = f"""
WITH dqs AS ({{qs}}),
dqq AS (
  SELECT doc_id,
         CAST(floor(quality * 1000000 + 0.5) AS BIGINT) AS quality_ppm
  FROM dqs
),
{_URL_CTE.strip()},
dqj AS (
  SELECT q.doc_id, d.domain, q.quality_ppm
  FROM dqq q JOIN doms d USING (doc_id)
),
dqp AS (
  SELECT domain,
         CAST(floor(sum(quality_ppm) * 1.0 / count(*) + 0.5) AS BIGINT)
           AS domain_mean_ppm
  FROM dqj GROUP BY 1
)
SELECT j.doc_id, j.domain, j.quality_ppm, p.domain_mean_ppm,
       j.quality_ppm - p.domain_mean_ppm AS resid_ppm,
       (j.quality_ppm - p.domain_mean_ppm < -100000) AS below_prior
FROM dqj j JOIN dqp p USING (domain)
""".format(qs=SQL_QUALITY_SCORE.strip())


# --------------------------------------------------------------------
# Johnson-Lindenstrauss projection (data-oblivious dim reduction)
# --------------------------------------------------------------------

from etl_finance_pipeline_spark.operators.similarity import (  # noqa: E402
    jl_signs,
)

_JL_D_IN, _JL_D_OUT = 64, 16
_JL_SIGNS = jl_signs(_JL_D_IN, _JL_D_OUT)


def _jl_dim_sql(j: int, vec: str = "embedding") -> str:
    lst = "list_value(" + ", ".join(
        str(_JL_SIGNS[i][j]) for i in range(_JL_D_IN)
    ) + ")"
    return (
        f"floor(list_reduce(list_transform(generate_series(1, {_JL_D_IN}),"
        f" i -> CAST({vec}[i] AS DOUBLE) * ({lst}[i])), (a, v) -> a + v)"
        f" * 0.25 * 1000000 + 0.5) / 1000000.0"
    )


def q_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA's data-oblivious sibling: 64-dim embeddings projected to
    16 dims through the deterministic ±1 JL matrix
    (operators/similarity.py: jl_project). Unlike pca_reduce2 this
    needs NO training pass, no covariance shuffle, no stored model —
    the matrix is derived from constants, so at 100 TB the reduction
    is one exchange-free map over the scan, and any executor can
    reproduce it independently. Output exploded to (vec_id, dim,
    value) scalars."""
    from etl_finance_pipeline_spark.operators.similarity import jl_project

    emb = load_table(spark, _t(sf_dir, "embeddings"))
    return jl_project(emb, _JL_D_IN, _JL_D_OUT)


SQL_JL_PROJECT = f"""
WITH jlw AS (
  SELECT vec_id,
    {", ".join(f"{_jl_dim_sql(j)} AS d{j}" for j in range(_JL_D_OUT))}
  FROM embeddings
),
jle AS (
  SELECT vec_id, unnest(list_value(
    {", ".join(f"struct_pack(dim := CAST({j} AS BIGINT), value := d{j})" for j in range(_JL_D_OUT))}
  )) AS p
  FROM jlw
)
SELECT vec_id, p.dim AS dim, p.value AS value FROM jle
"""


def q_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JL quality readout: over every pair of a 1-in-10 vector
    sample, the ratio of projected to original Euclidean distance in
    ppm — count, min, mean, max in one row. The lemma promises
    ratios concentrated near 1; this is the measured check that the
    16-dim sketch preserves neighborhoods before ANN/dedup consume
    it (the ann_recall device applied to the projection)."""
    from etl_finance_pipeline_spark.operators.similarity import (
        jl_project_wide,
    )

    emb = load_table(spark, _t(sf_dir, "embeddings")).filter(
        F.col("vec_id") % 10 == 0
    )
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("_v")
    ).join(jl_project_wide(emb, _JL_D_IN, _JL_D_OUT), "vec_id")
    a = base.select(
        F.col("vec_id").alias("id_a"),
        F.col("_v").alias("_va"),
        *[F.col(f"d{j}").alias(f"a{j}") for j in range(_JL_D_OUT)],
    )
    b = base.select(
        F.col("vec_id").alias("id_b"),
        F.col("_v").alias("_vb"),
        *[F.col(f"d{j}").alias(f"b{j}") for j in range(_JL_D_OUT)],
    )
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    d2o = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    d2p = None
    for j in range(_JL_D_OUT):
        t = (F.col(f"a{j}") - F.col(f"b{j}")) * (
            F.col(f"a{j}") - F.col(f"b{j}")
        )
        d2p = t if d2p is None else d2p + t
    # distortion is undefined for coincident vectors (d2o = 0): filter
    # the pair out in BOTH engines rather than let Spark emit null
    # where DuckDB's CAST(floor(...)) would error on Inf
    ratio = (
        F.floor(F.sqrt(d2p / F.col("_d2o")) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("ratio_ppm")
    )
    r = pairs.withColumn("_d2o", d2o).filter(F.col("_d2o") > 0).select(ratio)
    return r.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.min("ratio_ppm").alias("min_ratio_ppm"),
        F.floor(F.sum("ratio_ppm") * 1.0 / F.count("*") + F.lit(0.5))
        .cast("long")
        .alias("mean_ratio_ppm"),
        F.max("ratio_ppm").alias("max_ratio_ppm"),
    )


SQL_JL_DISTORTION = f"""
WITH jds AS (
  SELECT vec_id, embedding,
    {", ".join(f"{_jl_dim_sql(j)} AS d{j}" for j in range(_JL_D_OUT))}
  FROM embeddings WHERE vec_id % 10 = 0
),
jdo AS (
  SELECT
    ({" + ".join(f"(a.d{j} - b.d{j}) * (a.d{j} - b.d{j})" for j in range(_JL_D_OUT))})
      AS d2p,
    list_reduce(list_transform(generate_series(1, {_JL_D_IN}),
        i -> (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))
             * (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))),
        (x, v) -> x + v) AS d2o
  FROM jds a JOIN jds b ON a.vec_id < b.vec_id
),
-- d2o = 0 (coincident sampled vectors) is filtered in both engines:
-- the ratio is undefined there, not infinite
jdp AS (
  SELECT CAST(floor(sqrt(d2p / d2o) * 1000000 + 0.5) AS BIGINT) AS ratio_ppm
  FROM jdo WHERE d2o > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       min(ratio_ppm) AS min_ratio_ppm,
       CAST(floor(sum(ratio_ppm) * 1.0 / count(*) + 0.5) AS BIGINT)
         AS mean_ratio_ppm,
       max(ratio_ppm) AS max_ratio_ppm
FROM jdp
"""


QUERIES_TD: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "unigram_train": q_unigram_train,
    "unigram_segment": q_unigram_segment,
    "unigram_train_pruned": q_unigram_train_pruned,
    "wordpiece_train": q_wordpiece_train,
    "wordpiece_encode_corpus": q_wordpiece_encode_corpus,
    "tokenizer_efficiency": q_tokenizer_efficiency,
    "line_dedup": q_line_dedup,
    "line_dedup_keep_first": q_line_dedup_keep_first,
    "incremental_line_dedup": q_incremental_line_dedup,
    "embedding_covariance": q_embedding_covariance,
    "pca_top_component": q_pca_top_component,
    "pca_project": q_pca_project,
    "stream_quality_filter": q_stream_quality_filter,
    "pca_reduce2": q_pca_reduce2,
    "pca_outliers": q_pca_outliers,
    "dsir_weights": q_dsir_weights,
    "dsir_select": q_dsir_select,
    "c4_clean": q_c4_clean,
    "gopher_quality": q_gopher_quality,
    "kn_bigram_lm": q_kn_bigram_lm,
    "kn_perplexity": q_kn_perplexity,
    "ccnet_buckets": q_ccnet_buckets,
    "probe_auc": q_probe_auc,
    "fasttext_probe": q_fasttext_probe,
    "fasttext_auc": q_fasttext_auc,
    "fasttext_select": q_fasttext_select,
    "stream_fasttext_score": q_stream_fasttext_score,
    "domain_filter": q_domain_filter,
    "url_canonicalize": q_url_canonicalize,
    "url_dedup": q_url_dedup,
    "stream_url_dedup": q_stream_url_dedup,
    "stream_url_dedup_append": q_stream_url_dedup_append,
    "stream_domain_filter": q_stream_domain_filter,
    "html_extract": q_html_extract,
    "html_tables": q_html_tables,
    "html_table_census": q_html_table_census,
    "stream_html_extract": q_stream_html_extract,
    "html_c4_gate": q_html_c4_gate,
    "web_curation_funnel": q_web_curation_funnel,
    "domain_rollup": q_domain_rollup,
    "cluster_mix": q_cluster_mix,
    "cluster_profile": q_cluster_profile,
    "quality_calibration": q_quality_calibration,
    "lsh_recall": q_lsh_recall,
    "langid_confusion": q_langid_confusion,
    "ngram_repetition": q_ngram_repetition,
    "repetition_filter": q_repetition_filter,
    "source_kl": q_source_kl,
    "vocab_coverage": q_vocab_coverage,
    "zipf_fit": q_zipf_fit,
    "pack_efficiency": q_pack_efficiency,
    "quality_ece": q_quality_ece,
    "hard_negatives": q_hard_negatives,
    "containment_pairs": q_containment_pairs,
    "near_dup_rewrite": q_near_dup_rewrite,
    "near_dup_rewrite_best": q_near_dup_rewrite_best,
    "boilerplate_report": q_boilerplate_report,
    "line_repetition": q_line_repetition,
    "token_budget": q_token_budget,
    "curation_funnel": q_curation_funnel,
    "signal_correlation": q_signal_correlation,
    "embedding_audit": q_embedding_audit,
    "source_overlap": q_source_overlap,
    "normalize_text": q_normalize_text,
    "rag_retrieve": q_rag_retrieve,
    "embed_standardize": q_embed_standardize,
    "stream_dsir": q_stream_dsir,
    "ann_ivfpq_topk": q_ann_ivfpq_topk,
    "image_stats_jpeg_mixed": q_image_stats_jpeg_mixed,
    "media_decode_audit": q_media_decode_audit,
    "char_entropy": q_char_entropy,
    "video_fingerprint": q_video_fingerprint,
    "video_near_dup": q_video_near_dup,
    "audio_fingerprint": q_audio_fingerprint,
    "audio_near_dup": q_audio_near_dup,
    "hamming_near_dup_200k": q_hamming_near_dup_200k,
    "image_phash": q_image_phash,
    "phash_near_dup": q_phash_near_dup,
    "bpe_encode_corpus": q_bpe_encode,
    "audio_spectrum": q_audio_spectrum,
    "linear_probe": q_linear_probe,
    "stream_substring_dedup": q_stream_substring_dedup,
    "incremental_substring_dedup": q_incremental_substring_dedup,
    "pq_topk": q_pq_topk,
    "video_frames_avi": q_video_frames_avi,
    "scene_cuts_avi": q_scene_cuts_avi,
    "image_stats_jpeg_color": q_image_stats_jpeg_color,
    "decontaminate_spans": q_decontaminate_spans,
    "image_stats_jpeg": q_image_stats_jpeg,
    "video_frames_real": q_video_frames_real,
    "scene_cuts_real": q_scene_cuts_real,
    "substring_dedup": q_substring_dedup,
    "suffix_dup_spans": q_suffix_dup_spans,
    "substring_dedup_recall": q_substring_dedup_recall,
    "substring_dedup_clean": q_substring_dedup_clean,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "incremental_near_dup": q_incremental_near_dup,
    "chunk_docs": q_chunk_docs,
    "redact_docs": q_redact_docs,
    "sample_docs": q_sample_docs,
    "pack_sequences": q_pack_sequences,
    "pack_bins": q_pack_bins,
    "semantic_pack": q_semantic_pack,
    "semantic_pack_stats": q_semantic_pack_stats,
    "prep_corpus": q_prep_corpus,
    "shuffle_shard": q_shuffle_shard,
    "training_batches": q_training_batches,
    "simhash_pairs": q_simhash_pairs,
    "ngram_jaccard": q_ngram_jaccard,
    "set_similarity_exact": q_set_similarity_exact,
    "decontaminate": q_decontaminate,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "token_counts": q_token_counts,
    "fingerprints": q_fingerprints,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_recall": q_ann_recall,
    "ann_ivf_trained": q_ann_ivf_trained,
    "embed_near_dup": q_embed_near_dup,
    "asof_last_click": q_asof_last_click,
    "asof_next_view": q_asof_next_view,
    "user_sessions": q_user_sessions,
    "session_errors": q_session_errors,
    "props_extract": q_props_extract,
    "clean_corpus": q_clean_corpus,
    "media_stats": q_media_stats,
    "audio_stats": q_audio_stats,
    "audio_stats_wav": q_audio_stats_wav,
    "image_stats_ppm": q_image_stats_ppm,
    "video_frames": q_video_frames,
    "scene_cuts": q_scene_cuts,
    "audio_silence": q_audio_silence,
    "stream_candles": q_stream_candles,
    "stream_sessions": q_stream_sessions,
    "stream_dedupe": q_stream_dedupe,
    "weighted_sample": q_weighted_sample,
    "temperature_mix": q_temperature_mix,
    "negative_pairs": q_negative_pairs,
    "domain_cap": q_domain_cap,
    "hash_split": q_hash_split,
    "stream_trending": q_stream_trending,
    "stream_near_dup": q_stream_near_dup,
    "stream_gaps": q_stream_gaps,
    "stream_view_click": q_stream_view_click,
    "stream_enrich": q_stream_enrich,
    "near_dup_clusters": q_near_dup_clusters,
    "near_dup_clusters_star": q_near_dup_clusters_star,
    "repetition_stats": q_repetition_stats,
    "unigram_logprob": q_unigram_logprob,
    "doremi_weights": q_doremi_weights,
    "doremi_mix_apply": q_doremi_mix_apply,
    "corpus_build_e2e": q_corpus_build_e2e,
    "warc_extract": q_warc_extract,
    "stream_warc_extract": q_stream_warc_extract,
    "warc_curation_funnel": q_warc_curation_funnel,
    "corpus_build_e2e_warc": q_corpus_build_e2e_warc,
    "encoding_audit": q_encoding_audit,
    "stream_encoding_audit": q_stream_encoding_audit,
    "unicode_audit": q_unicode_audit,
    "unicode_normalize": q_unicode_normalize,
    "unicode_route": q_unicode_route,
    "pii_card_audit": q_pii_card_audit,
    "quality_psi": q_quality_psi,
    "span_corruption": q_span_corruption,
    "clm_batches": q_clm_batches,
    "source_census": q_source_census,
    "ffd_batches": q_ffd_batches,
    "dedup_savings": q_dedup_savings,
    "bpe_bytes_train": q_bpe_bytes_train,
    "bpe_bytes_encode": q_bpe_bytes_encode,
    "tokenizer_oov_cost": q_tokenizer_oov_cost,
    "doremi_proxy_compare": q_doremi_proxy_compare,
    "embed_quantize": q_embed_quantize,
    "semdedup": q_semdedup,
    "prototype_prune": q_prototype_prune,
    "prototype_prune_census": q_prototype_prune_census,
    "image_stats_png": q_image_stats_png,
    "pagerank": q_pagerank,
    "domain_authority": q_domain_authority,
    "authority_sample": q_authority_sample,
    "frontier_rank": q_frontier_rank,
    "link_resolve": q_link_resolve,
    "trustrank": q_trustrank,
    "spam_mass": q_spam_mass,
    "trusted_sample": q_trusted_sample,
    "host_authority": q_host_authority,
    "host_census": q_host_census,
    "pair_alignment": q_pair_alignment,
    "pair_align_census": q_pair_align_census,
    "pair_hard_negatives": q_pair_hard_negatives,
    "sitemap_extract": q_sitemap_extract,
    "sitemap_index_extract": q_sitemap_index_extract,
    "frontier_merge": q_frontier_merge,
    "recrawl_priority": q_recrawl_priority,
    "soft404_audit": q_soft404_audit,
    "ai_optout_audit": q_ai_optout_audit,
    "curation_ledger": q_curation_ledger,
    "license_census": q_license_census,
    "crawl_maintain_e2e": q_crawl_maintain_e2e,
    "hreflang_extract": q_hreflang_extract,
    "hreflang_census": q_hreflang_census,
    "revisit_census": q_revisit_census,
    "stream_index_gate": q_stream_index_gate,
    "meta_robots_audit": q_meta_robots_audit,
    "canonical_collapse": q_canonical_collapse,
    "index_gate": q_index_gate,
    "edge_gate_census": q_edge_gate_census,
    "redirect_resolve": q_redirect_resolve,
    "robots_gate": q_robots_gate,
    "frontier_schedule": q_frontier_schedule,
    "crawl_funnel": q_crawl_funnel,
    "table_qa_samples": q_table_qa_samples,
    "link_extract": q_link_extract,
    "stream_link_extract": q_stream_link_extract,
    "anchor_texts": q_anchor_texts,
    "anchor_text_census": q_anchor_text_census,
    "outlink_census": q_outlink_census,
    "cross_doc_repetition": q_cross_doc_repetition,
    "bpe_train": q_bpe_train,
    "script_census": q_script_census,
    "code_detect": q_code_detect,
    "fim_samples": q_fim_samples,
    "stream_fim_samples": q_stream_fim_samples,
    "ngram_novelty": q_ngram_novelty,
    "curation_route": q_curation_route,
    "stream_curation_route": q_stream_curation_route,
    "bitext_mine": q_bitext_mine,
    "bitext_mine_ivf": q_bitext_mine_ivf,
    "bitext_recall": q_bitext_recall,
    "source_route_census": q_source_route_census,
    "mixture_waterfill": q_mixture_waterfill,
    "anneal_schedule": q_anneal_schedule,
    "domain_quality_prior": q_domain_quality_prior,
    "jl_project": q_jl_project,
    "jl_distortion": q_jl_distortion,
    "sft_render": q_sft_render,
    "sft_loss_mask": q_sft_loss_mask,
    "template_dedup_audit": q_template_dedup_audit,
    "sft_pack": q_sft_pack,
    "stream_sft_render": q_stream_sft_render,
    "pref_pairs": q_pref_pairs,
    "pref_length_bias": q_pref_length_bias,
    "bt_ratings": q_bt_ratings,
    "bt_length_effect": q_bt_length_effect,
    "best_of_n_gain": q_best_of_n_gain,
    "epoch_schedule": q_epoch_schedule,
    "lsh_tradeoff": q_lsh_tradeoff,
}

ORACLES_TD: dict[str, str] = {
    "unigram_train": SQL_UNIGRAM_TRAIN,
    "unigram_segment": SQL_UNIGRAM_SEGMENT,
    "unigram_train_pruned": SQL_UNIGRAM_TRAIN_PRUNED,
    "wordpiece_train": SQL_WORDPIECE_TRAIN,
    "wordpiece_encode_corpus": SQL_WORDPIECE_ENCODE_CORPUS,
    "tokenizer_efficiency": SQL_TOKENIZER_EFFICIENCY,
    "line_dedup": SQL_LINE_DEDUP,
    "line_dedup_keep_first": SQL_LINE_DEDUP_KEEP_FIRST,
    "incremental_line_dedup": SQL_INCREMENTAL_LINE_DEDUP,
    "embedding_covariance": SQL_EMBEDDING_COVARIANCE,
    "pca_top_component": SQL_PCA_TOP_COMPONENT,
    "pca_project": SQL_PCA_PROJECT,
    "stream_quality_filter": SQL_STREAM_QUALITY_FILTER,
    "pca_reduce2": SQL_PCA_REDUCE2,
    "pca_outliers": SQL_PCA_OUTLIERS,
    "dsir_weights": SQL_DSIR_WEIGHTS,
    "dsir_select": SQL_DSIR_SELECT,
    "c4_clean": SQL_C4_CLEAN,
    "gopher_quality": SQL_GOPHER_QUALITY,
    "kn_bigram_lm": SQL_KN_BIGRAM_LM,
    "kn_perplexity": SQL_KN_PERPLEXITY,
    "ccnet_buckets": SQL_CCNET_BUCKETS,
    "probe_auc": SQL_PROBE_AUC,
    "fasttext_probe": SQL_FASTTEXT_PROBE,
    "fasttext_auc": SQL_FASTTEXT_AUC,
    "fasttext_select": SQL_FASTTEXT_SELECT,
    "stream_fasttext_score": SQL_STREAM_FASTTEXT_SCORE,
    "domain_filter": SQL_DOMAIN_FILTER,
    "url_canonicalize": SQL_URL_CANONICALIZE,
    "url_dedup": SQL_URL_DEDUP,
    "stream_url_dedup": SQL_URL_DEDUP,
    "stream_url_dedup_append": SQL_STREAM_URL_DEDUP_APPEND,
    "stream_domain_filter": SQL_STREAM_DOMAIN_FILTER,
    "html_extract": SQL_HTML_EXTRACT,
    "html_tables": SQL_HTML_TABLES,
    "html_table_census": SQL_HTML_TABLE_CENSUS,
    "stream_html_extract": SQL_STREAM_HTML_EXTRACT,
    "html_c4_gate": SQL_HTML_C4_GATE,
    "web_curation_funnel": SQL_WEB_CURATION_FUNNEL,
    "domain_rollup": SQL_DOMAIN_ROLLUP,
    "cluster_mix": SQL_CLUSTER_MIX,
    "cluster_profile": SQL_CLUSTER_PROFILE,
    "quality_calibration": SQL_QUALITY_CALIBRATION,
    "lsh_recall": SQL_LSH_RECALL,
    "langid_confusion": SQL_LANGID_CONFUSION,
    "ngram_repetition": SQL_NGRAM_REPETITION,
    "repetition_filter": SQL_REPETITION_FILTER,
    "source_kl": SQL_SOURCE_KL,
    "vocab_coverage": SQL_VOCAB_COVERAGE,
    "zipf_fit": SQL_ZIPF_FIT,
    "pack_efficiency": SQL_PACK_EFFICIENCY,
    "quality_ece": SQL_QUALITY_ECE,
    "hard_negatives": SQL_HARD_NEGATIVES,
    "containment_pairs": SQL_CONTAINMENT_PAIRS,
    "near_dup_rewrite": SQL_NEAR_DUP_REWRITE,
    "near_dup_rewrite_best": SQL_NEAR_DUP_REWRITE_BEST,
    "boilerplate_report": SQL_BOILERPLATE_REPORT,
    "line_repetition": SQL_LINE_REPETITION,
    "token_budget": SQL_TOKEN_BUDGET,
    "curation_funnel": SQL_CURATION_FUNNEL,
    "signal_correlation": SQL_SIGNAL_CORRELATION,
    "embedding_audit": SQL_EMBEDDING_AUDIT,
    "source_overlap": SQL_SOURCE_OVERLAP,
    "normalize_text": SQL_NORMALIZE_TEXT,
    "rag_retrieve": SQL_RAG_RETRIEVE,
    "embed_standardize": SQL_EMBED_STANDARDIZE,
    "stream_dsir": SQL_DSIR_WEIGHTS,
    "ann_ivfpq_topk": SQL_ANN_IVFPQ_TOPK,
    "image_stats_jpeg_mixed": SQL_IMAGE_STATS_JPEG,
    "media_decode_audit": SQL_MEDIA_DECODE_AUDIT,
    "minhash_lsh_pairs": SQL_MINHASH_LSH_PAIRS,
    "incremental_near_dup": SQL_INCREMENTAL_NEAR_DUP,
    "chunk_docs": SQL_CHUNK_DOCS,
    "redact_docs": SQL_REDACT_DOCS,
    "sample_docs": SQL_SAMPLE_DOCS,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "pack_bins": SQL_PACK_BINS,
    "semantic_pack": SQL_SEMANTIC_PACK,
    "semantic_pack_stats": SQL_SEMANTIC_PACK_STATS,
    "prep_corpus": SQL_PREP_CORPUS,
    "shuffle_shard": SQL_SHUFFLE_SHARD,
    "training_batches": SQL_TRAINING_BATCHES,
    "simhash_pairs": SQL_SIMHASH_PAIRS,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "set_similarity_exact": SQL_SET_SIMILARITY_EXACT,
    "decontaminate": SQL_DECONTAMINATE,
    "lang_id": SQL_LANG_ID,
    "quality_score": SQL_QUALITY_SCORE,
    "token_counts": SQL_TOKEN_COUNTS,
    "fingerprints": SQL_FINGERPRINTS,
    "ann_lsh_topk": SQL_ANN_LSH_TOPK,
    "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    "ann_recall": SQL_ANN_RECALL,
    "ann_ivf_trained": SQL_ANN_IVF_TRAINED,
    "embed_near_dup": SQL_EMBED_NEAR_DUP,
    "asof_last_click": SQL_ASOF_LAST_CLICK,
    "asof_next_view": SQL_ASOF_NEXT_VIEW,
    "user_sessions": SQL_USER_SESSIONS,
    "session_errors": SQL_SESSION_ERRORS,
    "props_extract": SQL_PROPS_EXTRACT,
    "clean_corpus": SQL_CLEAN_CORPUS,
    "media_stats": SQL_MEDIA_STATS,
    "audio_stats": SQL_AUDIO_STATS,
    "audio_stats_wav": SQL_AUDIO_STATS_WAV,
    "image_stats_ppm": SQL_IMAGE_STATS_PPM,
    "video_frames": SQL_VIDEO_FRAMES,
    "scene_cuts": SQL_SCENE_CUTS,
    "audio_silence": SQL_AUDIO_SILENCE,
    "stream_candles": SQL_STREAM_CANDLES,
    "stream_sessions": SQL_STREAM_SESSIONS,
    "stream_dedupe": SQL_STREAM_DEDUPE,
    "incremental_substring_dedup": SQL_INCREMENTAL_SUBSTRING_DEDUP,
    "stream_substring_dedup": SQL_STREAM_SUBSTRING_DEDUP,
    "linear_probe": SQL_LINEAR_PROBE,
    "audio_spectrum": SQL_AUDIO_SPECTRUM,
    "bpe_encode_corpus": SQL_BPE_ENCODE,
    "image_phash": SQL_IMAGE_PHASH,
    "audio_fingerprint": SQL_AUDIO_FINGERPRINT,
    "video_fingerprint": SQL_VIDEO_FINGERPRINT,
    "char_entropy": SQL_CHAR_ENTROPY,
    "video_near_dup": SQL_VIDEO_NEAR_DUP,
    "audio_near_dup": SQL_AUDIO_NEAR_DUP,
    "hamming_near_dup_200k": SQL_HAMMING_NEAR_DUP_200K,
    "phash_near_dup": SQL_PHASH_NEAR_DUP,
    "pq_topk": SQL_PQ_TOPK,
    "video_frames_avi": SQL_VIDEO_FRAMES_AVI,
    "scene_cuts_avi": SQL_SCENE_CUTS_REAL,
    "image_stats_jpeg_color": SQL_IMAGE_STATS_JPEG_COLOR,
    "decontaminate_spans": SQL_DECONTAMINATE_SPANS,
    "image_stats_jpeg": SQL_IMAGE_STATS_JPEG,
    "video_frames_real": SQL_VIDEO_FRAMES_REAL,
    "scene_cuts_real": SQL_SCENE_CUTS_REAL,
    "substring_dedup": SQL_SUBSTRING_DEDUP,
    "suffix_dup_spans": SQL_SUFFIX_DUP_SPANS,
    "substring_dedup_recall": SQL_SUBSTRING_DEDUP_RECALL,
    "substring_dedup_clean": SQL_SUBSTRING_DEDUP_CLEAN,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "temperature_mix": SQL_TEMPERATURE_MIX,
    "negative_pairs": SQL_NEGATIVE_PAIRS,
    "domain_cap": SQL_DOMAIN_CAP,
    "hash_split": SQL_HASH_SPLIT,
    "stream_trending": SQL_STREAM_TRENDING,
    "stream_near_dup": SQL_STREAM_NEAR_DUP,
    "stream_gaps": SQL_STREAM_GAPS,
    "stream_view_click": SQL_STREAM_VIEW_CLICK,
    "stream_enrich": SQL_STREAM_ENRICH,
    "near_dup_clusters": SQL_NEAR_DUP_CLUSTERS,
    "near_dup_clusters_star": SQL_NEAR_DUP_CLUSTERS,
    "repetition_stats": SQL_REPETITION_STATS,
    "unigram_logprob": SQL_UNIGRAM_LOGPROB,
    "doremi_weights": SQL_DOREMI_WEIGHTS,
    "doremi_mix_apply": SQL_DOREMI_MIX_APPLY,
    "corpus_build_e2e": SQL_CORPUS_BUILD_E2E,
    "warc_extract": SQL_WARC_EXTRACT,
    "stream_warc_extract": SQL_STREAM_WARC_EXTRACT,
    "warc_curation_funnel": SQL_WARC_CURATION_FUNNEL,
    "corpus_build_e2e_warc": SQL_CORPUS_BUILD_E2E_WARC,
    "encoding_audit": SQL_ENCODING_AUDIT,
    "unicode_audit": SQL_UNICODE_AUDIT,
    "unicode_normalize": SQL_UNICODE_NORMALIZE,
    "unicode_route": SQL_UNICODE_ROUTE,
    "stream_encoding_audit": SQL_STREAM_ENCODING_AUDIT,
    "pii_card_audit": SQL_PII_CARD_AUDIT,
    "quality_psi": SQL_QUALITY_PSI,
    "span_corruption": SQL_SPAN_CORRUPTION,
    "clm_batches": SQL_CLM_BATCHES,
    "source_census": SQL_SOURCE_CENSUS,
    "ffd_batches": SQL_FFD_BATCHES,
    "dedup_savings": SQL_DEDUP_SAVINGS,
    "bpe_bytes_train": SQL_BPE_BYTES_TRAIN,
    "bpe_bytes_encode": SQL_BPE_BYTES_ENCODE,
    "tokenizer_oov_cost": SQL_TOKENIZER_OOV_COST,
    "doremi_proxy_compare": SQL_DOREMI_PROXY_COMPARE,
    "embed_quantize": SQL_EMBED_QUANTIZE,
    "semdedup": SQL_SEMDEDUP,
    "prototype_prune": SQL_PROTOTYPE_PRUNE,
    "prototype_prune_census": SQL_PROTOTYPE_PRUNE_CENSUS,
    "image_stats_png": SQL_IMAGE_STATS_PNG,
    "pagerank": SQL_PAGERANK,
    "domain_authority": SQL_DOMAIN_AUTHORITY,
    "authority_sample": SQL_AUTHORITY_SAMPLE,
    "frontier_rank": SQL_FRONTIER_RANK,
    "link_resolve": SQL_LINK_RESOLVE,
    "trustrank": SQL_TRUSTRANK,
    "spam_mass": SQL_SPAM_MASS,
    "trusted_sample": SQL_TRUSTED_SAMPLE,
    "host_authority": SQL_HOST_AUTHORITY,
    "host_census": SQL_HOST_CENSUS,
    "pair_alignment": SQL_PAIR_ALIGNMENT,
    "pair_align_census": SQL_PAIR_ALIGN_CENSUS,
    "pair_hard_negatives": SQL_PAIR_HARD_NEGATIVES,
    "sitemap_extract": SQL_SITEMAP_EXTRACT,
    "sitemap_index_extract": SQL_SITEMAP_INDEX_EXTRACT,
    "frontier_merge": SQL_FRONTIER_MERGE,
    "recrawl_priority": SQL_RECRAWL_PRIORITY,
    "soft404_audit": SQL_SOFT404_AUDIT,
    "ai_optout_audit": SQL_AI_OPTOUT_AUDIT,
    "curation_ledger": SQL_CURATION_LEDGER,
    "license_census": SQL_LICENSE_CENSUS,
    "crawl_maintain_e2e": SQL_CRAWL_MAINTAIN_E2E,
    "hreflang_extract": SQL_HREFLANG_EXTRACT,
    "hreflang_census": SQL_HREFLANG_CENSUS,
    "revisit_census": SQL_REVISIT_CENSUS,
    "stream_index_gate": SQL_STREAM_INDEX_GATE,
    "meta_robots_audit": SQL_META_ROBOTS_AUDIT,
    "canonical_collapse": SQL_CANONICAL_COLLAPSE,
    "index_gate": SQL_INDEX_GATE,
    "edge_gate_census": SQL_EDGE_GATE_CENSUS,
    "redirect_resolve": SQL_REDIRECT_RESOLVE,
    "robots_gate": SQL_ROBOTS_GATE,
    "frontier_schedule": SQL_FRONTIER_SCHEDULE,
    "crawl_funnel": SQL_CRAWL_FUNNEL,
    "table_qa_samples": SQL_TABLE_QA_SAMPLES,
    "link_extract": SQL_LINK_EXTRACT,
    "stream_link_extract": SQL_STREAM_LINK_EXTRACT,
    "anchor_texts": SQL_ANCHOR_TEXTS,
    "anchor_text_census": SQL_ANCHOR_TEXT_CENSUS,
    "outlink_census": SQL_OUTLINK_CENSUS,
    "cross_doc_repetition": SQL_CROSS_DOC_REPETITION,
    "bpe_train": SQL_BPE_TRAIN,
    "script_census": SQL_SCRIPT_CENSUS,
    "code_detect": SQL_CODE_DETECT,
    "fim_samples": SQL_FIM_SAMPLES,
    "stream_fim_samples": SQL_STREAM_FIM_SAMPLES,
    "ngram_novelty": SQL_NGRAM_NOVELTY,
    "curation_route": SQL_CURATION_ROUTE,
    "stream_curation_route": SQL_STREAM_CURATION_ROUTE,
    "bitext_mine": SQL_BITEXT_MINE,
    "bitext_mine_ivf": SQL_BITEXT_MINE_IVF,
    "bitext_recall": SQL_BITEXT_RECALL,
    "source_route_census": SQL_SOURCE_ROUTE_CENSUS,
    "mixture_waterfill": SQL_MIXTURE_WATERFILL,
    "anneal_schedule": SQL_ANNEAL_SCHEDULE,
    "domain_quality_prior": SQL_DOMAIN_QUALITY_PRIOR,
    "jl_project": SQL_JL_PROJECT,
    "jl_distortion": SQL_JL_DISTORTION,
    "sft_render": SQL_SFT_RENDER,
    "sft_loss_mask": SQL_SFT_LOSS_MASK,
    "template_dedup_audit": SQL_TEMPLATE_DEDUP_AUDIT,
    "sft_pack": SQL_SFT_PACK,
    "stream_sft_render": SQL_STREAM_SFT_RENDER,
    "pref_pairs": SQL_PREF_PAIRS,
    "pref_length_bias": SQL_PREF_LENGTH_BIAS,
    "bt_ratings": SQL_BT_RATINGS,
    "bt_length_effect": SQL_BT_LENGTH_EFFECT,
    "best_of_n_gain": SQL_BEST_OF_N_GAIN,
    "epoch_schedule": SQL_EPOCH_SCHEDULE,
    "lsh_tradeoff": SQL_LSH_TRADEOFF,
}
