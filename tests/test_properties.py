"""Property-based tests (hypothesis): engine operators vs trivial
Python reference implementations on adversarial random inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from prisma_migrator_spark.llm.text import normalized_text, rolling_fingerprint
from prisma_migrator_spark.operators.dedup import latest_per_key

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),   # key
        st.integers(min_value=0, max_value=20),  # ts (ties likely)
        st.integers(min_value=0, max_value=9),   # tiebreaker (ties likely)
        st.text(alphabet="abc", max_size=3),     # payload
    ),
    min_size=1,
    max_size=40,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=ROWS)
@_SETTINGS
def test_latest_per_key_matches_python_reference(spark, rows):
    df = spark.createDataFrame(rows, "k int, ts int, tb int, v string")
    got = {
        r.k: (r.ts, r.tb, r.v)
        for r in latest_per_key(df, ["k"], "ts", tiebreakers=["tb", "v"]).collect()
    }
    exp: dict[int, tuple] = {}
    for k, ts, tb, v in rows:
        if k not in exp or (ts, tb, v) > exp[k]:
            exp[k] = (ts, tb, v)
    assert got == exp


WORDS = st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=5), min_size=1, max_size=12)


@given(words=WORDS, pad=st.integers(min_value=1, max_value=3))
@_SETTINGS
def test_rolling_fingerprint_whitespace_invariant(spark, words, pad):
    tight = " ".join(words)
    loose = (" " * pad) + (" " * pad).join(words) + (" " * pad)
    df = spark.createDataFrame([(tight, loose)], "a string, b string")
    row = df.select(
        rolling_fingerprint(F.col("a")).alias("fa"),
        rolling_fingerprint(F.col("b")).alias("fb"),
        normalized_text(F.col("a")).alias("na"),
        normalized_text(F.col("b")).alias("nb"),
    ).collect()[0]
    assert row.na == row.nb
    assert row.fa == row.fb


@given(words=st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=2, max_size=8))
@_SETTINGS
def test_rolling_fingerprint_is_order_sensitive_unlike_md5_of_set(spark, words):
    # rotating the token stream changes the rolling hash unless the
    # rotation is a no-op (all tokens equal / full period)
    rotated = words[1:] + words[:1]
    df = spark.createDataFrame(
        [(" ".join(words), " ".join(rotated))], "a string, b string"
    )
    row = df.select(
        rolling_fingerprint(F.col("a")).alias("fa"),
        rolling_fingerprint(F.col("b")).alias("fb"),
    ).collect()[0]
    if words != rotated:
        assert row.fa != row.fb
    else:
        assert row.fa == row.fb
