"""Scalar function surface (SURVEY §2.11) — thin, named wrappers over
pyspark.sql.functions so every scalar the reference uses has a
discoverable, tested home. All JVM expressions (codegen'd)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def fahrenheit_to_celsius_col(col) -> Column:
    """(t - 32) * 5/9 — reference chapter1/AverageSensorReadings.scala:51."""
    return (_c(col) - 32.0) * (5.0 / 9.0)


def celsius_to_fahrenheit_col(col) -> Column:
    return _c(col) * (9.0 / 5.0) + 32.0


def iso_datetime(ts_col, millis: bool = False) -> Column:
    """TimestampType → ISO-8601 seconds string, the reference's output
    formatting (chapter8/TransactionalSinkExample.scala:83-85). For an
    epoch-MS BIGINT column (the sensor tables' `timestamp`), pass
    millis=True — a bare numeric column fed to date_format is either
    rejected under ANSI or coerced as epoch-SECONDS, rendering
    1704067200000 ms as a year-55xxx date (r11 review find). Assumes
    UTC session timezone (set by session.tune)."""
    c = F.timestamp_millis(_c(ts_col).cast("long")) if millis \
        else _c(ts_col)
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")


def floor_to_bucket(ts_ms_col, bucket_ms: int) -> Column:
    """ts - (ts % size) — the reference's manual window arithmetic
    (chapter6/CustomWindow.scala:67)."""
    return _c(ts_ms_col) - (_c(ts_ms_col) % F.lit(bucket_ms))


def epoch_seconds(ts_col) -> Column:
    """TimestampType → BIGINT epoch seconds (engine-neutral output)."""
    return _c(ts_col).cast("long")


def ratio6(num, den) -> Column:
    """round-half-up(num/den, 6) computed as EXACT integer arithmetic:
    (2*num*10^6 + den) div (2*den) / 1e6 — the engine-neutral twin of
    round(double, 6) for nonnegative-integer-valued num over positive-
    integer den. round(double, 6) is not engine-neutral when the exact
    rational terminates at a 6-dp half (reduced denominator 2^7 * 5^j):
    Spark rounds the double's shortest decimal repr, DuckDB the raw
    binary, and they split on the last digit (the r12 _avg6 class).
    Count-valued denominators hit that class, so count/count ratio
    sites use this instead of F.round. The quotient is built with long
    `%` (exact) rather than floor() of a double division, which could
    misround exactly at the tie. NULL-propagating like `/`; den = 0
    yields NULL on both engines. Overflow bound: num <= ~4.6e12
    (2*num*10^6 must fit BIGINT) — widen at the call site if a
    corpus-scaled numerator can exceed it.

    DuckDB twin fragment (oracle SQL):
      ((2 * CAST(a AS BIGINT) * 1000000 + b)
       // (2 * CAST(b AS BIGINT))) / 1e6
    """
    n = _c(num).cast("long")
    # den = 0 -> NULL (as DuckDB's // 0): ANSI mode would throw on % 0
    d = F.nullif(_c(den).cast("long"), F.lit(0).cast("long"))
    n2 = n * F.lit(2_000_000) + d
    d2 = d * F.lit(2)
    return ((n2 - n2 % d2) / d2) / F.lit(1_000_000.0)


def ratio6_dec(num, den) -> Column:
    """ratio6 in DECIMAL(38,0) for integer-valued numerators beyond the
    BIGINT headroom (corpus-token counts, squared cent sums). DuckDB
    twin: the same quotient over HUGEINT."""
    n = _c(num).cast("decimal(38,0)")
    d = F.nullif(_c(den).cast("decimal(38,0)"),
                 F.lit(0).cast("decimal(38,0)"))
    n2 = n * F.lit(2_000_000) + d
    d2 = d * F.lit(2)
    return (((n2 - F.pmod(n2, d2)) / d2)
            .cast("decimal(38,0)").cast("double") / F.lit(1e6))


def units6(u, unit: int = 1_000_000_000) -> Column:
    """round-half-up(u/unit, 6) for a SIGNED exact-integer column u —
    the /1e9 nano-unit (and /1e6 micro-unit) display class. Same tie
    exposure as ratio6 (10^9 carries 2^9). Sign is handled explicitly:
    round() is half-AWAY-FROM-ZERO on both engines, and the quotient
    runs over |u| because Spark's integer div truncates toward zero
    while DuckDB's // floors — identical only for nonnegative operands.

    DuckDB twin fragment:
      (CASE WHEN u < 0 THEN -1 ELSE 1 END)
      * ((2 * abs(u)::BIGINT * 1000000 + UNIT) // (2 * UNIT)) / 1e6
    """
    c = _c(u).cast("long")
    sgn = F.when(c < 0, F.lit(-1)).otherwise(F.lit(1))
    a = F.abs(c)
    n2 = a * F.lit(2_000_000) + F.lit(unit)
    d2 = F.lit(2 * unit)
    return sgn * ((n2 - n2 % d2) / d2) / F.lit(1_000_000.0)


def sratio6_dec(num, den) -> Column:
    """Signed ratio6 in DECIMAL(38,0): round-half-away-from-zero
    (num/den, 6) for an exact-integer num of either sign over a
    positive exact-integer den, both beyond BIGINT headroom. DuckDB
    twin: the same quotient over HUGEINT with CASE WHEN sign * abs."""
    n = _c(num).cast("decimal(38,0)")
    d = F.nullif(_c(den).cast("decimal(38,0)"),
                 F.lit(0).cast("decimal(38,0)"))
    sgn = F.when(n < 0, F.lit(-1)).otherwise(F.lit(1))
    a = F.abs(n)
    n2 = a * F.lit(2_000_000) + d
    d2 = d * F.lit(2)
    return sgn * (((n2 - F.pmod(n2, d2)) / d2)
                  .cast("decimal(38,0)").cast("double") / F.lit(1e6))
