"""Distinct-count sketches: HyperLogLog and K-Minimum-Values, built
from deterministic portable hashes so the DuckDB oracle hash-matches.

Why sketches at all: ``COUNT(DISTINCT x)`` over 100 TB shuffles every
distinct value; a sketch reduces each group to fixed state (2^b
bucket maxima for HLL, k hashes for KMV) that combines map-side and
merges across partitions / days / tables — the standard way a
warehouse serves "distinct users per segment per day" without
re-scanning history. Spark's own ``approx_count_distinct`` is an HLL
too, but its binary sketch is neither inspectable nor cross-engine
reproducible; these are, which is what makes the oracle gate (and
cross-system regression checks) possible.

Determinism contract (shared with the DuckDB oracles):

* hash = md5 of the value's string form; two 60-bit words via
  ``conv(substr(hex,1,15),16,10)`` (Spark) == ``('0x'||substr)::BIGINT``
  (DuckDB). 60 bits keeps everything inside a signed 64-bit int.
* HLL rank uses integer bit-length only (``length(conv(w,10,2))`` ==
  ``length(bin(w))``), and the harmonic sum is computed in INTEGER
  arithmetic (sum of ``2^(61-rank)`` exact bigints) so partial-sum
  ordering cannot perturb the float result; the single final division
  is rounded to 6 decimals.
* KMV takes the k-th smallest hash per group via a window bounded to
  k rows per group, so the estimate ``(k-1) * 2^60 / h_(k)`` is one
  portable division.

Scale shape: HLL is a single groupBy whose partial aggregation is a
per-(group, bucket) MAX — fully map-side combinable, state is
``groups x 2^b`` small ints. KMV's rank window partitions BY GROUP
(never a global window); skew equals group skew, and k rows per group
survive to the final agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_finance_pipeline_spark.functions.scalar import portable_round

#: 60-bit hash words (15 hex chars): the largest width that stays
#: positive in a signed 64-bit integer in both engines.
HASH_BITS = 60


def _check_double_hash_rows(n: int, name: str) -> None:
    """Double hashing computes ``h1 + i*h2`` over two 60-bit words in
    signed 64-bit arithmetic; ``(i+1) * 2^60`` must stay under
    ``2^63``, so at most 8 hash rows (i = 0..7) are representable.
    Beyond that the multiply overflows — a runtime error under Spark
    4's ANSI mode, and silent engine-dependent wrapping without it."""
    if not 1 <= n <= 8:
        raise ValueError(
            f"{name}={n} out of range: double hashing over 60-bit words "
            "supports 1..8 hash rows (i*h2 overflows signed 64-bit past 8)"
        )


def hash_word(col: Column, offset: int = 1) -> Column:
    """One 60-bit deterministic hash word of ``col``'s string form.

    ``offset`` selects which 15-hex-char slice of the md5 digest to
    read (1 or 16), giving two independent words per value.
    """
    hexpart = F.substring(F.md5(col.cast("string")), offset, 15)
    return F.conv(hexpart, 16, 10).cast("bigint")


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    b: int = 9,
) -> DataFrame:
    """HyperLogLog distinct estimate per group (Flajolet et al. 2007).

    ``b`` index bits → m = 2^b buckets; rank = leading-zero count + 1
    of the remaining ``HASH_BITS - b`` bits. Returns one row per group
    with ``hll_estimate`` (raw HLL with the standard linear-counting
    small-range correction) rounded to 6 decimals.
    """
    m = 1 << b
    alpha = 0.7213 / (1 + 1.079 / m)
    word = hash_word(F.col(value_col))
    bucket = word % m
    # Top HASH_BITS - b bits. shiftright, NOT `/ m`: float division
    # rounds above 2^53 and would corrupt the rank.
    rest = F.shiftright(word, b)
    w = HASH_BITS - b
    # bit-length of rest via base-2 string (0 -> conv gives "0", len 1;
    # handled by the rank cap below since rest==0 means all-zero word)
    bits = F.length(F.conv(rest.cast("string"), 10, 2))
    rank = F.when(rest == 0, F.lit(w + 1)).otherwise(F.lit(w + 1) - bits)

    per_bucket = (
        df.select(*group_cols, bucket.alias("_bucket"), rank.alias("_rank"))
        .groupBy(*group_cols, "_bucket")
        .agg(F.max("_rank").alias("_mrank"))
    )
    return hll_estimate_from_sketch(per_bucket, group_cols, b=b)


def hll_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    b: int = 9,
) -> DataFrame:
    """Per-group HLL sketch STATE as a frame: (group..., _bucket,
    _mrank). This is the mergeable representation — sketches of two
    groups (or two days, two tables...) union by bucket-wise MAX,
    which is what makes an HLL over 100 TB composable: store the
    tiny state, merge and estimate later without rescanning."""
    m = 1 << b
    word = hash_word(F.col(value_col))
    bucket = word % m
    rest = F.shiftright(word, b)
    w = HASH_BITS - b
    bits = F.length(F.conv(rest.cast("string"), 10, 2))
    rank = F.when(rest == 0, F.lit(w + 1)).otherwise(F.lit(w + 1) - bits)
    return (
        df.select(*group_cols, bucket.alias("_bucket"), rank.alias("_rank"))
        .groupBy(*group_cols, "_bucket")
        .agg(F.max("_rank").alias("_mrank"))
    )


def hll_merge(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge sketches by bucket-wise max over the given grouping —
    the HLL union operation (lossless: the merged sketch equals the
    sketch of the unioned data)."""
    return sketch.groupBy(*group_cols, "_bucket").agg(
        F.max("_mrank").alias("_mrank")
    )


def hll_estimate_from_sketch(
    sketch: DataFrame,
    group_cols: list[str],
    b: int = 9,
) -> DataFrame:
    """Estimate from sketch state (Flajolet alpha_m correction +
    linear counting below 2.5m with empty buckets)."""
    m = 1 << b
    w = HASH_BITS - b
    alpha = 0.7213 / (1 + 1.079 / m)
    # Integer harmonic sum: scaling 2^-rank by 2^S with S = w + 1
    # makes every term an exact bigint, so the sum is independent of
    # aggregation order (float partial sums are not). S is also small
    # enough that m buckets x 2^S stays under 2^63 (b + S <= 62).
    s_bits = w + 1
    if b + s_bits > 62:  # pragma: no cover - guards custom b
        raise ValueError(f"b={b} leaves no headroom for the integer harmonic sum")
    scale = 1 << s_bits
    est_raw = F.lit(alpha * m * m * float(scale)) / F.col("_intsum")
    agg = sketch.groupBy(*group_cols).agg(
        F.sum(
            # SQL expr: the DSL's shiftleft only takes a literal shift
            F.expr(f"shiftleft(1L, {s_bits} - _mrank)")
        ).alias("_intsum"),
        F.count("*").alias("_nonempty"),
    )
    empty = F.lit(m) - F.col("_nonempty")
    # The empty buckets each contribute 2^0 = 1 to the harmonic sum.
    agg = agg.withColumn("_intsum", F.col("_intsum") + empty * F.lit(scale))
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / empty.cast("double"))
    estimate = F.when((est_raw <= 2.5 * m) & (empty > 0), linear).otherwise(est_raw)
    return agg.select(
        *group_cols, portable_round(estimate, 6).alias("hll_estimate")
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """K-Minimum-Values distinct estimate per group (Bar-Yossef et
    al. 2002): keep the k smallest distinct hashes; the k-th smallest
    at position h estimates n ≈ (k-1) * 2^60 / h. Falls back to the
    exact distinct count when a group has fewer than k distinct
    values (the sketch IS exact there).
    """
    word = hash_word(F.col(value_col))
    hashes = (
        df.select(*group_cols, word.alias("_h"))
        .groupBy(*group_cols, "_h")
        .count()
        .drop("count")
    )
    win = Window.partitionBy(*group_cols).orderBy("_h")
    ranked = hashes.withColumn("_rn", F.row_number().over(win)).filter(
        F.col("_rn") <= k
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.max("_rn").alias("_nk"), F.max("_h").alias("_hk")
    )
    est = F.when(
        F.col("_nk") < k, F.col("_nk").cast("double")
    ).otherwise(F.lit(float(k - 1) * float(1 << HASH_BITS)) / F.col("_hk"))
    return agg.select(*group_cols, portable_round(est, 6).alias("kmv_estimate"))


def count_min_sketch(
    df: DataFrame,
    value_col: str,
    d: int = 4,
    w_buckets: int = 1024,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of the value
    stream: d hash rows x w buckets of counts, as a (row, bucket,
    cnt) frame of at most d*w rows — the fixed-size state that
    answers "how often did X appear" over a stream too big to hold a
    per-key map. Row hashes come from double hashing over the two
    md5 words, so the sketch (and every estimate's overcount) is
    deterministic and portable. Map-side combinable; sketches merge
    by summing counts per (row, bucket).
    """
    _check_double_hash_rows(d, "d")
    h1 = hash_word(F.col(value_col), 1)
    h2 = hash_word(F.col(value_col), 16)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), ((h1 + F.lit(i) * h2) % w_buckets).alias("bucket")
            )
            for i in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    d: int = 4,
    w_buckets: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each distinct key in ``keys``:
    estimate = min over the d rows of the key's bucket counts (never
    an undercount; overcount bounded by collisions). The sketch is
    d*w rows — broadcast — so the probe is one narrow explode + one
    broadcast join + one per-key min."""
    _check_double_hash_rows(d, "d")
    h1 = hash_word(F.col(key_col), 1)
    h2 = hash_word(F.col(key_col), 16)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), ((h1 + F.lit(i) * h2) % w_buckets).alias("bucket")
            )
            for i in range(d)
        ]
    )
    probed = keys.select(key_col, F.explode(cells).alias("rb")).select(
        key_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    return (
        probed.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cms_estimate"))
    )


def histogram_quantile(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: list[float],
    bins: int = 128,
    lo: Column | float | None = None,
    hi: Column | float | None = None,
) -> DataFrame:
    """Mergeable quantile estimates from a fixed-grid histogram —
    the quantile counterpart to the distinct/frequency sketches:
    per-group state is ``bins`` counters on a SHARED grid, so
    histograms merge across groups / days / tables by cell-sum, and
    any quantile is answered later by cumulative interpolation. The
    exact-vs-estimate error is bounded by one bin width.

    ``lo``/``hi`` pin the grid (pass literals or 1-row agg columns
    via a crossJoin upstream); defaults to the global min/max of
    ``value_col`` computed as a broadcast 1-row stat.

    One map-side-combinable (group, bin) count; the cumulative walk
    is a window over <= ``bins`` rows per group.
    """
    spark_f = F
    if lo is None or hi is None:
        stats = df.agg(
            F.min(value_col).alias("_glo"), F.max(value_col).alias("_ghi")
        )
        df = df.crossJoin(F.broadcast(stats))
        lo_c, hi_c = F.col("_glo"), F.col("_ghi")
    else:
        lo_c = lo if isinstance(lo, Column) else F.lit(float(lo))
        hi_c = hi if isinstance(hi, Column) else F.lit(float(hi))

    span = (hi_c - lo_c).cast("double")
    binc = spark_f.when(span == 0, F.lit(0)).otherwise(
        F.floor((F.col(value_col) - lo_c).cast("double") / span * bins)
    )
    binc = F.least(binc.cast("bigint"), F.lit(bins - 1).cast("bigint"))
    hist = (
        df.select(
            *group_cols,
            binc.alias("_bin"),
            lo_c.cast("double").alias("_lo"),
            span.alias("_span"),
        )
        .groupBy(*group_cols, "_bin", "_lo", "_span")
        .agg(F.count("*").alias("_cnt"))
    )
    w = Window.partitionBy(*group_cols).orderBy("_bin")
    cum = hist.withColumn("_cum", F.sum("_cnt").over(w))
    tot = cum.groupBy(*group_cols).agg(F.max("_cum").alias("_n"))
    joined = cum.join(tot, group_cols)

    out_cols = []
    for q in quantiles:
        # clamp to >= 1 row so q=0.0 resolves to the first occupied
        # bin instead of matching nothing (cum - cnt < 0 never holds)
        target = F.greatest(F.lit(q) * F.col("_n"), F.lit(1.0))
        # first bin whose cumulative count reaches the target
        hit = F.when(
            (F.col("_cum") >= target) & ((F.col("_cum") - F.col("_cnt")) < target),
            F.col("_lo")
            + (F.col("_span") / bins)
            * (
                F.col("_bin").cast("double")
                + (target - (F.col("_cum") - F.col("_cnt"))) / F.col("_cnt")
            ),
        )
        out_cols.append(
            F.max(hit).alias(f"q{str(q).replace('.', '_')}")
        )
    return joined.groupBy(*group_cols).agg(*out_cols)
