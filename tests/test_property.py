"""Property-based tests (hypothesis): the Spark escape chain must equal a
direct simulation of the reference's process_statement on ARBITRARY
backslash/quote-laden strings, and anonymization must equal hashlib on
arbitrary identities — batch-evaluated through one Spark job per property
run for speed."""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.functions.scalars import (
    regex_escape_statement,
    sha256_anonymize,
)

_ESCAPE_ALPHABET = st.sampled_from(list('\\"\'abk {}:1'))
_escape_strings = st.lists(
    st.text(alphabet=_ESCAPE_ALPHABET, max_size=24), min_size=1, max_size=50
)

_name_strings = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
        max_size=20,
    ),
    min_size=1,
    max_size=50,
)


def _simulate_escape(s: str) -> str:
    s = re.sub(r"\\{2}", lambda m: "\\" * 4, s)
    s = re.sub(
        r"\\(?:\\\\)*",
        lambda m: "\\" * 2 if len(m.group(0)) % 2 == 1 else m.group(0),
        s,
    )
    s = re.sub(r"\\{4,}", lambda m: "\\" * 4, s)
    s = re.sub(r'^"+', "", s)
    s = re.sub(r'"+$', "", s)
    return s.replace("\\'", "\\\\'").replace("'", "\\'")


_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from mongo_to_clickhouse_spark.session import get_spark

        _spark = get_spark(app_name="property-tests", shuffle_partitions=4)
    return _spark


@settings(max_examples=12, deadline=None)
@given(_escape_strings)
def test_escape_matches_reference_on_arbitrary_input(strings):
    spark = _get_spark()
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = [r[0] for r in df.select(regex_escape_statement(F.col("s"))).collect()]
    assert got == [_simulate_escape(s) for s in strings]


@settings(max_examples=12, deadline=None)
@given(_name_strings)
def test_anonymize_matches_hashlib_on_arbitrary_names(names):
    spark = _get_spark()
    df = spark.createDataFrame([(s,) for s in names], ["s"])
    got = [r[0] for r in df.select(sha256_anonymize(F.col("s"))).collect()]

    def expect(name: str) -> str:
        local = name.split("@")[0]
        return hashlib.sha256(
            b"fixture-salt" + b"t1" + local.encode("utf-8")
        ).hexdigest()

    assert got == [expect(s) for s in names]
