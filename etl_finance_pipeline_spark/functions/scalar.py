"""Scalar helper expressions shared across operators.

Everything here is a pure Catalyst expression (JVM-side, codegen-able)
— no Python UDFs. The hash functions are deliberately *portable*: the
same value is computable in ANSI SQL (DuckDB, Trino, ...) so that
sketch-based operators (MinHash, SimHash, fingerprints) can be verified
against an external oracle bit-for-bit.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# 60-bit mask: 15 hex chars of md5. Fits comfortably in a signed 64-bit
# integer in every engine (no unsigned-overflow portability traps).
_MD5_HEX_CHARS = 15

# Mersenne prime 2^31 - 1 — universal-hash modulus small enough that
# a * h + b never overflows int64.
MERSENNE_31 = 2_147_483_647

_OFFSET_ALIAS = re.compile(r"^(\d+)\s*(min|t|h|d|s|w)$", re.IGNORECASE)

_UNIT_NAMES = {
    "t": "minute",
    "min": "minute",
    "h": "hour",
    "d": "day",
    "s": "second",
    "w": "week",
}


def portable_hash64(col: Column | str) -> Column:
    """Deterministic 60-bit hash of a string column.

    ``conv(substr(md5(x), 1, 15), 16, 10)::bigint`` — identical in
    DuckDB as ``CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)``.
    Used as the token hash for MinHash/SimHash sketches so oracle SQL
    can reproduce signatures exactly. md5 is JVM-side (codegen) —
    plenty fast for sketching; not a cryptographic claim.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, _MD5_HEX_CHARS), 16, 10).cast("long")


def universal_hash31(h: Column, a: int, b: int) -> Column:
    """(a*h + b) mod (2^31-1) over a 31-bit-reduced input hash.

    The input is first reduced mod 2^31-1 so the multiply stays in
    int64. Same expression evaluates identically in DuckDB.
    """
    h31 = h % MERSENNE_31
    return (F.lit(a) * h31 + F.lit(b)) % MERSENNE_31


def portable_round(col: Column | str, digits: int = 6) -> Column:
    """Engine-portable decimal rounding: ``floor(x*10^d + 0.5)/10^d``.

    Spark's ``round`` converts the double to exact BigDecimal before
    HALF_UP while DuckDB rounds the scaled double — at exact half
    boundaries (interpolation midpoints!) they disagree. Doing the
    scale-floor arithmetic explicitly makes both engines execute the
    identical IEEE ops. SQL twin: ``floor(x * 1eD + 0.5) / 1eD``.
    """
    c = F.col(col) if isinstance(col, str) else col
    scale = 10 ** digits
    return F.floor(c * scale + F.lit(0.5)) / scale


def offset_alias_to_duration(rule: str) -> str:
    """Translate a pandas offset alias ("1T", "5min", "1H", "1D") to a
    Spark window duration string ("1 minute", "5 minutes", ...).

    Mirrors the timeframe vocabulary of the reference config
    (/root/reference/config/default.yml:43-48 uses 1T/5T/15T/1H).

    Alignment note: ``F.window`` buckets are epoch-aligned. For
    second/minute/hour/day rules this matches pandas resample labels
    exactly (midnight UTC boundaries). WEEKLY buckets diverge: Spark's
    epoch-aligned 1-week windows start on Thursday while pandas 'W'
    is right-labeled ending Sunday — pass ``startTime`` to F.window
    yourself if a specific week anchor matters. Calendar units
    (months/quarters/years) are handled separately via date_trunc
    ('1MS'/'1QS'/'1YS' in operators.resample).
    """
    m = _OFFSET_ALIAS.match(rule.strip())
    if not m:
        raise ValueError(f"unsupported offset alias: {rule!r}")
    n, unit = int(m.group(1)), _UNIT_NAMES[m.group(2).lower()]
    plural = "s" if n != 1 else ""
    return f"{n} {unit}{plural}"


def offset_alias_to_seconds(rule: str) -> int:
    """Offset alias → bucket length in seconds (for grid arithmetic)."""
    m = _OFFSET_ALIAS.match(rule.strip())
    if not m:
        raise ValueError(f"unsupported offset alias: {rule!r}")
    n, unit = int(m.group(1)), _UNIT_NAMES[m.group(2).lower()]
    return n * {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}[unit]
