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


# ---------------------------------------------------------------------------
# CDC state-merge lattice properties (streaming/stateful.py)
# ---------------------------------------------------------------------------

_ops_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=50),  # seq
        st.sampled_from(["insert", "update", "replace", "delete"]),
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                       width=32)),
        st.one_of(st.none(), st.text(max_size=5)),
    ),
    min_size=0,
    max_size=30,
    # seq is a per-doc row_number in the real oplog — unique by contract
    # (with colliding seqs, any last-writer-wins rule is order-defined)
    unique_by=lambda t: t[0],
)


@given(ops=_ops_strategy, data=st.data())
@settings(max_examples=200, deadline=None)
def test_cdc_fold_is_arrival_order_invariant(ops, data):
    """The streaming CDC merge must give the SAME document image no
    matter how the op rows are permuted or split into micro-batches —
    the property that makes stream == batch reconstruction."""
    from mongo_to_clickhouse_spark.streaming.stateful import (
        CDC_STATE_ZERO,
        emit_cdc_image,
        fold_cdc_ops,
    )

    baseline = emit_cdc_image(fold_cdc_ops(CDC_STATE_ZERO, ops))

    perm = data.draw(st.permutations(ops))
    n_splits = data.draw(st.integers(min_value=1, max_value=4))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(0, len(perm)), min_size=n_splits - 1,
                max_size=n_splits - 1,
            )
        )
    )
    state = CDC_STATE_ZERO
    last = 0
    for cut in [*cuts, len(perm)]:
        state = fold_cdc_ops(state, perm[last:cut])
        last = cut
    assert emit_cdc_image(state) == baseline


def test_resize_target_dims_invariants():
    from mongo_to_clickhouse_spark.operators.multimodal import (
        RESIZE_MAX_SIDE,
        _target_dims,
    )

    for w in range(1, 600, 7):
        for h in range(1, 600, 11):
            ow, oh = _target_dims(w, h)
            assert 1 <= ow and 1 <= oh
            assert max(ow, oh) <= max(RESIZE_MAX_SIDE, max(w, h))
            if max(w, h) > RESIZE_MAX_SIDE:
                assert max(ow, oh) == RESIZE_MAX_SIDE
                # aspect preserved within integer-floor tolerance
                assert abs(ow * h - oh * w) <= max(w, h)
            else:
                assert (ow, oh) == (w, h)
