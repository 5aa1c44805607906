"""Unit vectors for the scalar layer (SURVEY §5 item 3) — hand-computed
expected values, incl. the dead-code identity-extraction semantics and the
backslash-normalization cases from /root/reference/src/main.rs:627-672."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.functions.scalars import (
    email_localpart,
    objectid_hex,
    regex_escape_statement,
    sha256_anonymize,
    timestamp_format,
)


def _col_results(spark, values, col_fn):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    return [r[0] for r in df.select(col_fn(F.col("s"))).collect()]


def test_email_localpart_semantics(spark):
    # a@b→a; x:y→x:y (the ':' fallback is dead code); @b→'' (would be
    # skipped); ''→'' (skipped).
    vals = ["a@b", "x:y", "@b", "", "plain", "two@at@signs"]
    assert _col_results(spark, vals, email_localpart) == [
        "a",
        "x:y",
        "",
        "",
        "plain",
        "two",
    ]


def test_sha256_anonymize_digest(spark):
    got = _col_results(spark, ["alice@example.com"], sha256_anonymize)
    expected = hashlib.sha256(b"fixture-salt" + b"t1" + b"alice").hexdigest()
    assert got == [expected]


@pytest.mark.parametrize(
    "raw,expected",
    [
        # odd backslash run → 2 backslashes; even run → 4
        ("a\\b", "a\\\\b"),
        ("a\\\\b", "a\\\\\\\\b"),
        ("a\\\\\\b", "a\\\\b"),
        ("a\\\\\\\\b", "a\\\\\\\\b"),
        ("a\\\\\\\\\\b", "a\\\\b"),
        # strip ALL wrapping double-quotes
        ('""hi""', "hi"),
        ('"hi"', "hi"),
        # quote escaping: ' → \' ; preexisting \' → \\\\' then ' escape
        ("it's", "it\\'s"),
        ("it\\'s", "it\\\\\\\\'s"),
        # no-op passthrough
        ("plain text", "plain text"),
    ],
)
def test_regex_escape_statement(spark, raw, expected):
    assert _col_results(spark, [raw], regex_escape_statement) == [expected]


def test_regex_escape_matches_reference_simulation(spark):
    """Cross-check the Spark chain against a direct Python simulation of
    process_statement (/root/reference/src/main.rs:647-672)."""
    import re

    def simulate(s: str) -> str:
        # lambda replacements: literal text, no template processing — the
        # Rust regex crate treats backslashes in replacements literally.
        s = re.sub(r"\\{2}", lambda m: "\\" * 4, s)
        s = re.sub(
            r"\\(?:\\\\)*",
            lambda m: "\\" * 2 if len(m.group(0)) % 2 == 1 else m.group(0),
            s,
        )
        s = re.sub(r"\\{4,}", lambda m: "\\" * 4, s)
        s = re.sub(r'^"+', "", s)
        s = re.sub(r'"+$', "", s)
        s = s.replace("\\'", "\\\\'").replace("'", "\\'")
        return s

    cases = [
        "\\" * n + tail for n in range(0, 7) for tail in ["x", "'", '"', ""]
    ] + ['"{\\"k\\": 1}"', "a\\'b\\\\'c", '""']
    got = _col_results(spark, cases, regex_escape_statement)
    assert got == [simulate(c) for c in cases]


def test_timestamp_format_ms(spark):
    df = spark.sql("SELECT timestamp'2024-03-05 07:08:09.123456' AS s")
    assert df.select(timestamp_format(F.col("s"))).collect()[0][0] == (
        "2024-03-05 07:08:09.123"
    )


def test_objectid_hex_shape(spark):
    df = spark.createDataFrame([(255,)], ["s"])
    out = df.select(objectid_hex(F.col("s"))).collect()[0][0]
    assert out == "0000000000000000000000ff"
    assert len(out) == 24
