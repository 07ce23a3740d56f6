"""Round-13 prep: the deferred-fix recipes from SURVEY §7.4o, pinned
mechanically ONE ROUND EARLY (test-only — the r12 window is at its
25-mandatory-r5 capacity, so the oracle/op edits themselves land in
r13; these tests prove the replacement formulas are correct NOW so
the r13 session applies them without re-derivation).

1. FLOOR(EPOCH) class: DuckDB's CAST(FLOOR(EPOCH(ts)) AS BIGINT) goes
   through DOUBLE whose ulp at 10-digit epochs is ~2 µs, so a .999999
   fraction rounds UP and shifts the floor +1 s. The replacement is
   the exact integer floor over epoch_us with a floor-mod (DuckDB //
   truncates toward zero, so plain epoch_us // 1e6 would break
   pre-epoch instants). Verified here against Python's exact floor on
   every hostile instant class, and the OLD form is pinned DIVERGENT
   on the canonical instant — if a DuckDB upgrade ever fixes EPOCH
   precision, this test flips and tells the session the migration
   rationale changed.
2. bit_ops shift recipe: the low-61-bit masked shift
   (x & 0x1FFFFFFFFFFFFFFF) << 2 is well-defined and identical in
   both engines at int64 extremes (DuckDB throws on the UNmasked
   shift; Spark wraps silently — neither is portable).
"""

from __future__ import annotations

import datetime


import duckdb
import pytest

EXACT_FLOOR_SQL = (
    "(epoch_us(ts) - ((epoch_us(ts) % 1000000 + 1000000) % 1000000))"
    " // 1000000"
)

INSTANTS = [
    # the canonical divergent instant (judge-reproducible, §7.4o)
    "2287-01-05 12:00:00.999999",
    "2287-01-05 12:00:00.000001",
    "2287-06-05 23:59:59.999999",
    "2286-11-20 18:06:40.000000",   # exactly 1e10 epoch seconds
    "1970-01-05 12:00:00.999999",
    "1969-12-31 23:59:59.999999",   # epoch −1 µs: floor is −1, not 0
    "1969-12-31 23:59:59.000001",
    "1969-11-15 03:14:07.500000",
    "9999-06-15 00:00:00.999999",   # DATE-ceiling era
    "1900-01-01 00:00:00.000001",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@pytest.mark.parametrize("iso", INSTANTS)
def test_exact_integer_epoch_floor_matches_python(duck, iso):
    got = duck.execute(
        f"SELECT {EXACT_FLOOR_SQL} FROM (SELECT TIMESTAMP '{iso}' AS ts)"
    ).fetchone()[0]
    dt = datetime.datetime.fromisoformat(iso)
    # exact integer µs (never float total_seconds); python // floors —
    # the reference semantics
    us = (dt - datetime.datetime(1970, 1, 1)) // datetime.timedelta(microseconds=1)
    exact = us // 1000000
    assert got == exact, (iso, got, exact)


def test_old_double_floor_still_diverges_on_the_pinned_instant(duck):
    """The migration rationale: FLOOR(EPOCH()) is +1 s on the canonical
    instant. If this starts PASSING equality after a DuckDB upgrade,
    the r13 migration note needs re-adjudication (the oracles would
    then agree either way)."""
    old, new = duck.execute(
        "SELECT CAST(FLOOR(EPOCH(ts)) AS BIGINT), "
        f"{EXACT_FLOOR_SQL} "
        "FROM (SELECT TIMESTAMP '2287-01-05 12:00:00.999999' AS ts)"
    ).fetchone()
    assert new == 10003953600
    assert old == new + 1, (
        "DuckDB's double EPOCH path no longer rounds this instant up — "
        "re-adjudicate the §7.4o FLOOR(EPOCH) migration rationale"
    )


def test_masked_shift_recipe_is_engine_identical(duck, spark):
    from pyspark.sql import functions as F

    mask = 0x1FFFFFFFFFFFFFFF
    xs = [(1 << 63) - 1, -(1 << 63), -1, 0, 1, (1 << 61) - 1, 1 << 61, 123456789]
    d_rows = dict(
        duck.execute(
            "SELECT x, (x & 2305843009213693951) << 2 FROM (SELECT unnest(?) AS x)",
            [xs],
        ).fetchall()
    )
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    s_rows = {
        r.x: r.s
        for r in df.select(
            "x", F.shiftleft(F.col("x").bitwiseAND(F.lit(mask)), 2).alias("s")
        ).collect()
    }
    assert s_rows == d_rows
    # and every result is in-range (the point of the mask)
    assert all(0 <= v <= (1 << 63) - 4 for v in s_rows.values())


def test_spark_base64_mime_chunking_divergence_and_strip_recipe(duck, spark):
    """r12 NFD-probe find (SURVEY §7.4o addendum), deferred to r13 with
    the rest of the oracle/op budget: Spark's base64() MIME-chunks its
    output with \\r\\n every 76 chars once the payload exceeds 57
    bytes (unconditionally on this build — the
    spark.sql.legacy.chunkBase64String.enabled conf does not disable
    it), while DuckDB emits continuous base64. The one affected op is
    str_encode_b64_hex (a >57-byte 24-codepoint prefix — e.g. NFD
    Hangul at 2-3 bytes/codepoint — crosses the line limit; every
    driver/adversarial doc prefix stays under it, which is why the op
    certified green since r10). The r13 recipe, pinned here: strip
    [\\r\\n] from the Spark value — byte-identical to DuckDB's
    continuous form at any payload size."""
    from pyspark.sql import functions as F

    payloads = ["z" * 58, "w" * 200, "한국어 텍스트 예시", "x" * 57]
    d_rows = dict(
        duck.execute(
            "SELECT s, base64(encode(s)) FROM (SELECT unnest(?) AS s)",
            [payloads],
        ).fetchall()
    )
    df = spark.createDataFrame([(p,) for p in payloads], "s string")
    raw = {
        r.s: r.b
        for r in df.select(
            "s", F.base64(F.encode("s", "utf-8")).alias("b")
        ).collect()
    }
    stripped = {
        r.s: r.b
        for r in df.select(
            "s",
            F.regexp_replace(
                F.base64(F.encode("s", "utf-8")), "[\\r\\n]", ""
            ).alias("b"),
        ).collect()
    }
    # the divergence is real on >57-byte payloads...
    assert any("\r" in raw[p] or "\n" in raw[p] for p in payloads), (
        "Spark base64 no longer MIME-chunks — re-adjudicate the §7.4o "
        "deferral (the strip becomes a no-op and the oracles agree)"
    )
    # ...and the strip recipe restores byte-identity everywhere
    assert stripped == d_rows
