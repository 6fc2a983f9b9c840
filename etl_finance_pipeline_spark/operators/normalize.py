"""Canonical-schema normalization layer.

Capability parity with the reference's normalize stage
(/root/reference/src/etl/transform/normalize.py) re-expressed for
Spark: the rename algorithm is driver-side schema logic (it never
touches data), dtype/datetime coercions are `try_cast`-style Catalyst
expressions, dedupe is a ranking window, and the `df.attrs` report
side-channel becomes an explicit lazily-computed report DataFrame.

Scale notes:
 * Rename / required-column checks are O(#columns) on the driver.
 * Coercion-count reporting is ONE wide aggregate over the frame —
   map-side partial aggregation, no extra shuffle beyond the final
   1-row reduce.
 * Keep-first dedupe is a `row_number()` window over (keys, order) —
   one shuffle on the dedupe keys; at 100 TB this is hash-partitioned
   by (symbol) so it scales with the number of symbols × time range.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Iterable
from zoneinfo import ZoneInfo

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from etl_finance_pipeline_spark.config import (
    DEFAULT_COLUMNS_MAP,
    DEFAULT_REQUIRED_COLUMNS,
    PROTECTED_COLUMNS,
)

#: Canonical numeric columns coerced to double (parity:
#: /root/reference/src/etl/transform/normalize.py:97-101).
NUMERIC_COLUMNS = ["OPEN", "HIGH", "LOW", "CLOSE", "VOLUME", "TICKVOL", "SPREAD"]

#: Names recognized as the datetime column, in priority order
#: (parity: normalize.py:146-153 — post-rename this is TIMESTAMP).
DATETIME_CANDIDATES = ("timestamp", "datetime", "time", "date", "ts")


# --------------------------------------------------------------------
# P1 — synonym-map rename (pure driver logic over df.columns)
# --------------------------------------------------------------------

def build_rename_map(
    columns: Iterable[str],
    columns_map: dict[str, list[str]] | None = None,
) -> dict[str, str]:
    """source column name -> canonical UPPER name.

    Matching per variant, case-insensitive: exact, ``variant_*``
    prefix, ``*_variant`` suffix. Columns whose lowercase name is in
    PROTECTED_COLUMNS ({symbol, ticker, instrument, pair}) are never
    renamed. First canonical target wins per source column.
    """
    cmap = columns_map or DEFAULT_COLUMNS_MAP
    rename: dict[str, str] = {}
    claimed: set[str] = set()
    for col in columns:
        low = col.lower()
        if low in PROTECTED_COLUMNS:
            continue
        for canonical, variants in cmap.items():
            if canonical in claimed:
                continue
            hit = False
            for v in variants:
                vl = v.lower()
                if low == vl or low.startswith(vl + "_") or low.endswith("_" + vl):
                    hit = True
                    break
            if hit:
                if col != canonical:
                    rename[col] = canonical.upper()
                claimed.add(canonical)
                break
    return rename


def normalize_columns(
    df: DataFrame, columns_map: dict[str, list[str]] | None = None
) -> DataFrame:
    """Apply the synonym rename map to a DataFrame (no data movement —
    a pure projection Catalyst collapses into the scan)."""
    mapping = build_rename_map(df.columns, columns_map)
    return df.withColumnsRenamed(mapping) if mapping else df


# --------------------------------------------------------------------
# P3 — required-columns predicate
# --------------------------------------------------------------------

def validate_required_columns(
    df: DataFrame, required: list[str] | None = None
) -> None:
    """Raise ValueError naming any missing required columns
    (parity: normalize.py:89-95)."""
    req = required or DEFAULT_REQUIRED_COLUMNS
    have = set(df.columns)
    missing = [c for c in req if c not in have]
    if missing:
        raise ValueError(f"missing required columns: {missing}")


# --------------------------------------------------------------------
# P2 — dtype enforcement / numeric coercion with coercion counts
# --------------------------------------------------------------------

def enforce_dtypes(
    df: DataFrame, numeric_columns: list[str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """try_cast every present canonical numeric column to double.

    Returns (coerced_df, report_df) where report_df is a 1-row frame
    with one ``coerced_<col>`` count per column = values that were
    non-null before the cast but null after (pandas
    ``to_numeric(errors="coerce")`` semantics). The report is a single
    wide aggregate — collect it only when needed.
    """
    cols = [c for c in (numeric_columns or NUMERIC_COLUMNS) if c in df.columns]
    if not cols:
        return df, df.sparkSession.createDataFrame([], T.StructType([]))

    casted = df.withColumns(
        {c: F.expr(f"try_cast(`{c}` as double)").alias(c) for c in cols}
    )
    # Count coercions against the original values in one pass.
    report = df.agg(
        *[
            F.sum(
                (
                    F.col(c).isNotNull()
                    & F.expr(f"try_cast(`{c}` as double)").isNull()
                ).cast("long")
            ).alias(f"coerced_{c}")
            for c in cols
        ]
    )
    return casted, report


# --------------------------------------------------------------------
# D1–D5 — datetime detection, coercion, timezone policy
# --------------------------------------------------------------------

def detect_datetime_column(df: DataFrame) -> str:
    """First column whose lowercase name is a known datetime name;
    raise if none (parity: normalize.py:146-153)."""
    for c in df.columns:
        if c.lower() in DATETIME_CANDIDATES:
            return c
    raise ValueError("no datetime column found")


from functools import lru_cache


@lru_cache(maxsize=64)
def dst_transition_windows(
    tz_name: str, start_year: int, end_year: int
) -> list[tuple[datetime, datetime, str]]:
    """Compute ambiguous ("fall-back") and nonexistent ("spring-forward")
    local wall-clock windows for *tz_name* between the given years.

    Returns [(local_start_naive, local_end_naive, kind)] with kind in
    {"ambiguous", "nonexistent"}. Driver-side zoneinfo scan at hourly
    resolution — a few thousand probes per year, trivially cheap, and
    broadcast to executors as a literal predicate.

    This replicates the reference's ``tz_localize(ambiguous="NaT",
    nonexistent="shift_forward")`` policy surface (normalize.py:183-197),
    which Spark's ``to_utc_timestamp`` cannot express (it resolves
    ambiguity deterministically).
    """
    tz = ZoneInfo(tz_name)
    windows: list[tuple[datetime, datetime, str]] = []
    probe = datetime(start_year, 1, 1, tzinfo=timezone.utc)
    end = datetime(end_year + 1, 1, 1, tzinfo=timezone.utc)
    step = timedelta(hours=1)
    prev_off = probe.astimezone(tz).utcoffset()
    while probe < end:
        nxt = probe + step
        off = nxt.astimezone(tz).utcoffset()
        if off != prev_off:
            # Binary-search the exact transition instant.
            lo, hi = probe, nxt
            while hi - lo > timedelta(seconds=1):
                mid = lo + (hi - lo) / 2
                if mid.astimezone(tz).utcoffset() == prev_off:
                    lo = mid
                else:
                    hi = mid
            trans = hi
            delta = off - prev_off  # type: ignore[operator]
            local_after = (trans.astimezone(tz)).replace(tzinfo=None)
            if delta < timedelta(0):
                # clocks fell back: wall times [local_after, local_after-delta) repeat
                windows.append((local_after, local_after - delta, "ambiguous"))
            else:
                # clocks sprang forward: wall times [local_after-delta, local_after) don't exist
                windows.append((local_after - delta, local_after, "nonexistent"))
        prev_off = off
        probe = nxt
    return windows


def normalize_datetime(
    df: DataFrame,
    ts_col: str | None = None,
    source_tz: str | None = None,
    target_tz: str = "UTC",
    formats: list[str] | None = None,
    data_years: tuple[int, int] = (1990, 2035),
) -> tuple[DataFrame, dict]:
    """Coerce the datetime column to TimestampType and apply the
    timezone policy.

    * String/other inputs are coerced via ``try_to_timestamp`` (with an
      optional list of explicit formats tried in order) — invalid values
      become NULL, counted in the report (D2/D5).
    * If *source_tz* is given, naive stamps are interpreted in that zone
      via ``to_utc_timestamp``; wall-clock values falling in an
      ambiguous DST window are NULLed and counted (reference
      ``ambiguous="NaT"``); nonexistent values are shifted forward by
      ``to_utc_timestamp``'s resolution and flagged (D3).
    * If no *source_tz*, stamps are assumed UTC and the report carries
      ``needs_review=True`` (parity: normalize.py:190-197) — as the
      CONSERVATIVE static default. String inputs whose values all
      carry explicit UTC offsets (``+02:00``/``Z`` suffixes) need no
      assumption, exactly as the reference's tz-aware-index path
      (normalize.py:198-199) skips the flag: the lazy
      ``_naive_count_expr`` lets :func:`normalize_df` refine the flag
      from the data (offset-less parsed rows > 0 ⇔ review needed).

    Returns (df, policy_report). The returned df always has *ts_col* as
    TimestampType in UTC, plus the ``_ts_was_null`` helper flag column
    (listed in the report's ``_helper_cols``; :func:`normalize_df`
    drops it after aggregating the report) — the count expressions
    must see the PRE-coercion nullness, and a Column captured before
    ``withColumn`` re-resolves BY NAME against the replaced column,
    so the flag has to be materialized alongside the replacement.
    """
    ts = ts_col or detect_datetime_column(df)
    dtype = dict(df.dtypes)[ts]
    original = F.col(ts)

    if dtype.startswith("timestamp"):
        coerced = original.cast("timestamp")
    elif formats:
        coerced = F.coalesce(
            *[F.try_to_timestamp(original.cast("string"), F.lit(f)) for f in formats]
        )
    else:
        coerced = F.try_to_timestamp(original.cast("string"))

    report: dict = {"needs_review": False, "source_tz": source_tz or "UTC(assumed)"}
    helper_cols = ["_ts_was_null"]

    if source_tz and source_tz.upper() != "UTC":
        windows = dst_transition_windows(source_tz, *data_years)
        amb = [w for w in windows if w[2] == "ambiguous"]
        nonex = [w for w in windows if w[2] == "nonexistent"]

        def in_windows(ws: list[tuple[datetime, datetime, str]]) -> Column:
            if not ws:
                return F.lit(False)
            preds = [
                (coerced >= F.lit(s)) & (coerced < F.lit(e)) for s, e, _ in ws
            ]
            out = preds[0]
            for p in preds[1:]:
                out = out | p
            return out

        is_ambiguous = in_windows(amb)
        is_nonexistent = in_windows(nonex)
        localized = F.when(is_ambiguous, F.lit(None).cast("timestamp")).otherwise(
            F.to_utc_timestamp(coerced, source_tz)
        )
        # single withColumns: all expressions must resolve against the
        # ORIGINAL ts column (a second withColumn would see the
        # already-localized value and the flags would never fire)
        df2 = df.withColumns(
            {
                ts: localized,
                "_dst_nonexistent": is_nonexistent,
                "_ts_was_null": original.isNull(),
            }
        )
        report["ambiguous_policy"] = "NaT"
        report["nonexistent_policy"] = "shift_forward"
    else:
        cols = {ts: coerced, "_ts_was_null": original.isNull()}
        if not source_tz:
            report["needs_review"] = True
            if not dtype.startswith("timestamp"):
                # explicit-offset strings (+HH:MM / +HHMM / Z) carry
                # their own zone — only offset-less parsed rows make
                # the UTC assumption real
                has_offset = original.cast("string").rlike(
                    r"([+-]\d{2}:?\d{2}|Z)\s*$"
                )
                cols["_ts_no_offset"] = coerced.isNotNull() & ~has_offset
                helper_cols.append("_ts_no_offset")
                report["_naive_count_expr"] = F.sum(
                    F.col("_ts_no_offset").cast("long")
                ).alias("ts_naive_no_offset")
        df2 = df.withColumns(cols)

    # target tz: Spark timestamps are UTC-internal; conversion is a
    # display concern (D4). We record the contract only.
    report["target_tz"] = target_tz
    report["_helper_cols"] = helper_cols
    report["_null_count_expr"] = F.sum(
        (F.col(ts).isNull() & ~F.col("_ts_was_null")).cast("long")
    ).alias("ts_coerced_to_null")
    return df2, report


# --------------------------------------------------------------------
# O1 — keep-first dedupe
# --------------------------------------------------------------------

def remove_duplicates(
    df: DataFrame,
    keys: list[str],
    order_by: list[str | Column] | None = None,
    strategy: str = "agg",
) -> DataFrame:
    """Keep the FIRST row per key (parity: normalize.py:227-236,
    ``index.duplicated(keep="first")``).

    "First" must be deterministic in a distributed engine: rows are
    ranked by *order_by* (e.g. an ingest sequence column or file
    offset). Without an explicit order column we fall back to
    ``monotonically_increasing_id()`` captured at scan time, which
    reproduces arrival order per input split.

    strategy="agg" (default): ``groupBy(keys)`` with one
    ``min_by(col, order)`` per carried column — a HASH aggregate with
    map-side partial combine and NO sort (each min_by buffer is a
    primitive pair; a single ``min_by(struct(cols), ...)`` would fall
    back to SortAggregate because struct buffers aren't mutable-typed,
    and would also block column pruning — per-column aggregates that
    are never referenced downstream get pruned away by Catalyst).
    REQUIREMENT: *order_by* must be unique within each key group
    (an ingest sequence is); on ties the per-column picks could mix
    rows. Prefer a SINGLE primitive order column: a multi-column order
    becomes a struct ordering key, which degrades every min_by to
    SortAggregate. strategy="window": ``row_number()`` ranking window —
    shuffle + full sort on (keys, order); use it when the tiebreak is
    not unique or the ranked frame itself is needed.
    """
    if order_by is None:
        df = df.withColumn("_ingest_seq", F.monotonically_increasing_id())
        order_by = ["_ingest_seq"]
        drop_seq = True
    else:
        drop_seq = False

    if strategy == "agg":
        others = [c for c in df.columns if c not in keys]
        order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
        ord_key = order_cols[0] if len(order_cols) == 1 else F.struct(*order_cols)
        picked = df.groupBy(*keys).agg(
            *[F.min_by(F.col(c), ord_key).alias(c) for c in others]
        )
        out = picked.select(*df.columns)
    else:
        w = Window.partitionBy(*keys).orderBy(*order_by)
        out = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    return out.drop("_ingest_seq") if drop_seq else out


# --------------------------------------------------------------------
# normalize_df — composition (parity: normalize.py:239-281)
# --------------------------------------------------------------------

@dataclass
class NormalizeResult:
    df: DataFrame
    report: dict = field(default_factory=dict)


def normalize_df(
    df: DataFrame,
    columns_map: dict[str, list[str]] | None = None,
    required_columns: list[str] | None = None,
    source_tz: str | None = None,
    target_tz: str = "UTC",
    dedupe_keys: list[str] | None = None,
    dedupe_order: list[str | Column] | None = None,
    collect_report: bool = True,
) -> NormalizeResult:
    """rename → validate → coerce dtypes → datetime/tz → dedupe.

    The global time sort of the reference (normalize.py:275) is
    deliberately NOT applied here: in Spark, ordering is declared
    per-operator (windows/order-sensitive aggs) and a physical global
    sort would be a pointless full shuffle at scale. Sinks that want
    sorted files use ``sortWithinPartitions`` at write time.
    """
    report: dict = {}
    out = normalize_columns(df, columns_map)
    validate_required_columns(out, required_columns)
    out, coercion_report = enforce_dtypes(out)
    out, dt_report = normalize_datetime(
        out, source_tz=source_tz, target_tz=target_tz
    )
    null_count_expr = dt_report.pop("_null_count_expr")
    naive_count_expr = dt_report.pop("_naive_count_expr", None)
    helper_cols = dt_report.pop("_helper_cols", [])
    report["timezone"] = dt_report

    before = out  # keeps the helper flag columns for the report agg
    out = out.drop(*helper_cols)
    keys = dedupe_keys or (["SYMBOL", "TIMESTAMP"] if "SYMBOL" in out.columns else ["TIMESTAMP"])
    out = remove_duplicates(out, keys, dedupe_order)

    if collect_report:
        aggs = [F.count("*").alias("rows_before"), null_count_expr]
        if naive_count_expr is not None:
            aggs.append(naive_count_expr)
        agg_row = before.agg(*aggs).collect()[0]
        report["rows_before_dedupe"] = agg_row["rows_before"]
        report["ts_coerced_to_null"] = agg_row["ts_coerced_to_null"]
        if naive_count_expr is not None:
            # refine the conservative static flag from the data: all
            # stamps carried explicit offsets -> no UTC assumption was
            # actually made (reference tz-aware-index parity)
            report["timezone"]["needs_review"] = bool(
                (agg_row["ts_naive_no_offset"] or 0) > 0
            )
        report["coercions"] = coercion_report.collect()[0].asDict() if coercion_report.columns else {}
    return NormalizeResult(df=out, report=report)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two table snapshots on a business key:
    classify every key as ``added`` (only in *new*), ``removed``
    (only in *old*) or ``changed`` (present in both with any compared
    column differing; identical rows are omitted). The reconciliation
    primitive behind snapshot-feed ingestion (no CDC stream — just
    yesterday's file and today's) and table-migration sign-off;
    complements the table format's commit-level ``read_changes``,
    which diffs versions of ONE table rather than two arbitrary
    frames.

    One full outer join hash-partitioned on the key; column
    comparison is null-safe (``<=>``), so NULL→value and value→NULL
    both count as changes while NULL==NULL does not.

    Output: key columns + change_type.
    """
    cmp_cols = compare_cols or [
        c for c in old.columns if c not in key_cols and c in new.columns
    ]
    # Presence is tracked with explicit marker columns (not key-column
    # null checks) and keys join null-safely (``<=>``): a business key
    # whose first column is legitimately NULL would otherwise never
    # match its counterpart and be misreported as added+removed.
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in key_cols],
        *[F.col(c).alias(f"_ov_{c}") for c in cmp_cols],
        F.lit(True).alias("_o_present"),
    )
    n = new.select(
        *[F.col(c).alias(f"_n_{c}") for c in key_cols],
        *[F.col(c).alias(f"_nv_{c}") for c in cmp_cols],
        F.lit(True).alias("_n_present"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"_o_{k}").eqNullSafe(F.col(f"_n_{k}"))
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    in_old = F.col("_o_present").isNotNull()
    in_new = F.col("_n_present").isNotNull()
    same = F.lit(True)
    for c in cmp_cols:
        same = same & F.col(f"_ov_{c}").eqNullSafe(F.col(f"_nv_{c}"))
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    out_keys = [
        F.coalesce(F.col(f"_o_{k}"), F.col(f"_n_{k}")).alias(k)
        for k in key_cols
    ]
    return (
        j.select(*out_keys, change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )
