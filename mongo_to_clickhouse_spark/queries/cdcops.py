"""CDC oplog-apply: reconstruct final document state from a change log
with MongoDB change-stream semantics (insert / update / replace /
delete, field-level update merge).

The reference consumes change-stream events with ``full_document``
(/root/reference/src/main.rs:313-375) and materializes "latest version
wins" downstream (covered by ``dedup_latest_version``).  When a stream
is consumed WITHOUT fullDocument lookup, each update event carries only
an ``updateDescription`` patch — the sink must merge patches onto the
last full image.  ``cdc_apply_oplog`` is that materialization as one
declarative plan:

* an op log of ``(doc_id, seq, op, field_a, field_b)`` rows (synthesized
  deterministically from ``events`` — op mix ~20% insert / 50% update /
  10% replace / 20% delete; updates set a subset of fields, i.e. a patch)
* ``insert`` / ``replace`` reset the whole document (base image)
* ``update`` patches only its non-null fields onto the current image
* ``delete`` removes the document; a later op re-creates it (upsert)

Reconstruction rule (pure window algebra, no per-doc iteration):
for each doc, find the last *base* op (insert/replace/delete); the final
value of each field is the last non-null assignment at-or-after that
base (strictly after, for delete); docs whose final op is ``delete`` are
gone.  ``last(..., ignorenulls=True)`` over an unbounded frame gives
exactly "latest patch wins" — one shuffle keyed by doc_id, uniform.

Scale posture: two window passes over the same (doc_id, seq) sort order
— Spark plans them in a single sort+exchange; state per doc is O(1).
This is the batch/backfill form; the streaming form is
``stream_stateful_running_agg``'s applyInPandasWithState shape with the
same merge rule per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mongo_to_clickhouse_spark.io import load_table

# op mix by event_id bucket: 0-1 insert, 2-6 update, 7 replace, 8-9 delete
_OP_CASE = """
    CASE
        WHEN event_id % 10 IN (0, 1) THEN 'insert'
        WHEN event_id % 10 BETWEEN 2 AND 6 THEN 'update'
        WHEN event_id % 10 = 7 THEN 'replace'
        ELSE 'delete'
    END
"""


def _oplog_sql(events_rel: str) -> str:
    """Shared Spark/DuckDB SQL for the synthesized op log.

    doc key = user_id (a few ops per doc at every sf); order = (ts,
    event_id).  Base ops carry the full image (both fields); updates
    patch field_a when event_id % 3 != 0 and field_b when
    event_id % 2 = 0 — so both "field untouched by later updates" and
    "field patched repeatedly" paths occur.  Deletes carry no payload.
    """
    # user_id is renamed to doc_id BEFORE the row_number window so every
    # later window spec references the same attribute — Spark then reuses
    # one hash(doc_id) exchange for the whole reconstruction (the rename
    # after a window breaks alias-aware partitioning propagation).
    return f"""
        SELECT doc_id,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY ts, event_id) AS seq,
               op,
               CASE WHEN op IN ('insert', 'replace') THEN round(value, 2)
                    WHEN op = 'update' AND event_id % 3 != 0 THEN round(value, 2)
                    ELSE NULL END AS field_a,
               CASE WHEN op IN ('insert', 'replace') THEN event_type
                    WHEN op = 'update' AND event_id % 2 = 0 THEN event_type
                    ELSE NULL END AS field_b
        FROM (SELECT *, user_id AS doc_id, {_OP_CASE} AS op FROM {events_rel})
    """


def cdc_apply_oplog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final state per document after applying the op log in order."""
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("cdc_events_src")
    oplog = spark.sql(_oplog_sql("cdc_events_src"))

    # Every window below partitions by doc_id and orders by seq, so the
    # whole reconstruction needs ONE exchange; totals come from the same
    # windows (n_ops = last_seq since seq is dense; final_op = last op),
    # not a separate groupBy+join, and the one-row-per-doc reduction is
    # "keep the row at seq == last_seq" — a narrow filter, not DISTINCT.
    wdoc = Window.partitionBy("doc_id")
    wseq = wdoc.orderBy("seq")
    unbounded = wseq.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    staged = oplog.select(
        "doc_id",
        "seq",
        "op",
        "field_a",
        "field_b",
        F.max(
            F.when(F.col("op").isin("insert", "replace", "delete"), F.col("seq"))
        )
        .over(wdoc)
        .alias("base_seq"),
        F.max("seq").over(wdoc).alias("last_seq"),
        F.last("op").over(unbounded).alias("final_op"),
    )
    # ops participating in the final image: at-or-after the base
    # (strictly after, when the base is a delete — its payload is empty
    # anyway, but the doc only re-exists via LATER upserting ops)
    live = staged.filter(
        F.col("seq") >= F.coalesce(F.col("base_seq"), F.lit(0))
    ).filter(
        ~((F.col("seq") == F.col("base_seq")) & (F.col("op") == "delete"))
    )
    return (
        live.select(
            "doc_id",
            "seq",
            "last_seq",
            "final_op",
            F.last("field_a", ignorenulls=True).over(unbounded).alias("field_a"),
            F.last("field_b", ignorenulls=True).over(unbounded).alias("field_b"),
            F.count("*").over(wdoc).cast("bigint").alias("n_applied_ops"),
        )
        # the live set always contains the doc's last op (a final delete is
        # excluded, but those docs are dropped anyway) → exactly 1 row/doc
        .filter((F.col("seq") == F.col("last_seq")) & (F.col("final_op") != "delete"))
        .select(
            "doc_id",
            "field_a",
            "field_b",
            "n_applied_ops",
            F.col("last_seq").cast("bigint").alias("n_ops"),
        )
        .orderBy("doc_id")
    )


CDC_APPLY_OPLOG_SQL = f"""
    WITH oplog AS ({_oplog_sql("events")}),
    staged AS (
        SELECT *,
               MAX(CASE WHEN op IN ('insert', 'replace', 'delete')
                        THEN seq END) OVER (PARTITION BY doc_id) AS base_seq,
               MAX(seq) OVER (PARTITION BY doc_id) AS last_seq,
               LAST_VALUE(op) OVER (
                   PARTITION BY doc_id ORDER BY seq
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS final_op
        FROM oplog
    ),
    live AS (
        SELECT * FROM staged
        WHERE seq >= COALESCE(base_seq, 0)
          AND NOT (seq = base_seq AND op = 'delete')
    ),
    resolved AS (
        SELECT doc_id, seq, last_seq, final_op,
               LAST_VALUE(field_a IGNORE NULLS) OVER (
                   PARTITION BY doc_id ORDER BY seq
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS field_a,
               LAST_VALUE(field_b IGNORE NULLS) OVER (
                   PARTITION BY doc_id ORDER BY seq
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS field_b,
               CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT)
                   AS n_applied_ops
        FROM live
    )
    SELECT doc_id, field_a, field_b, n_applied_ops,
           CAST(last_seq AS BIGINT) AS n_ops
    FROM resolved
    WHERE seq = last_seq AND final_op != 'delete'
    ORDER BY doc_id
"""


def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance under CDC: keep ``(n_docs,
    sum_a_cents)`` per ``field_b`` group up to date from the op log
    alone, by emitting a retraction of each document's previous image
    and an insertion of its new image at every op — the classic
    Δ-maintenance algebra (insert → +new; delete → -old; update →
    -old, +new). The ORACLE aggregates the reconstructed final state
    directly, so the check proves the delta path telescopes to exactly
    the direct answer.

    Money is summed in exact integer cents (field_a is 2-decimal by
    construction), so retraction arithmetic is exact — float retraction
    drift is the classic IVM bug this formulation makes impossible.

    Scale posture: every window partitions by doc_id (epoch is a
    doc_id-subsumed key, so Spark satisfies it from the SAME hash
    exchange), the delta explode is a width-2 fan-out, and the final
    groupBy shuffles pre-aggregated per-group partials — at 100 TB the
    op log streams through one exchange + one bounded-cardinality agg.
    The streaming twin is stream_cdc_state_merge; this is the
    backfill/repair form (reference historical_data/src/main.rs's
    re-aggregation role)."""
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("cdc_events_src")
    cents = "COALESCE(CAST(round(img_a * 100) AS BIGINT), 0)"
    prev_cents = "COALESCE(CAST(round(prev_a * 100) AS BIGINT), 0)"
    return spark.sql(f"""
        WITH oplog AS ({_oplog_sql("cdc_events_src")}),
        epochs AS (
            SELECT *,
                   COALESCE(MAX(CASE WHEN op IN ('insert', 'replace', 'delete')
                                     THEN seq END)
                       OVER (PARTITION BY doc_id ORDER BY seq
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW), 0) AS epoch
            FROM oplog
        ),
        images AS (
            SELECT doc_id, seq,
                   op != 'delete' AS exists_now,
                   LAST(field_a, true) OVER (
                       PARTITION BY doc_id, epoch ORDER BY seq
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS img_a,
                   LAST(field_b, true) OVER (
                       PARTITION BY doc_id, epoch ORDER BY seq
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS img_b
            FROM epochs
        ),
        trans AS (
            SELECT doc_id, seq, exists_now, img_a, img_b,
                   LAG(exists_now) OVER (PARTITION BY doc_id ORDER BY seq) AS prev_exists,
                   LAG(img_a) OVER (PARTITION BY doc_id ORDER BY seq) AS prev_a,
                   LAG(img_b) OVER (PARTITION BY doc_id ORDER BY seq) AS prev_b
            FROM images
        ),
        deltas AS (
            SELECT d.grp, d.dcount, d.dcents
            FROM trans
            LATERAL VIEW explode(array(
                named_struct(
                    'grp', COALESCE(prev_b, '__none__'),
                    'dcount', CASE WHEN COALESCE(prev_exists, false)
                                   THEN -1 ELSE 0 END,
                    'dcents', CASE WHEN COALESCE(prev_exists, false)
                                   THEN -{prev_cents} ELSE CAST(0 AS BIGINT) END),
                named_struct(
                    'grp', COALESCE(img_b, '__none__'),
                    'dcount', CASE WHEN exists_now THEN 1 ELSE 0 END,
                    'dcents', CASE WHEN exists_now
                                   THEN {cents} ELSE CAST(0 AS BIGINT) END)
            )) x AS d
        )
        SELECT grp AS group_key,
               CAST(SUM(dcount) AS BIGINT) AS n_docs,
               CAST(SUM(dcents) AS BIGINT) AS sum_a_cents
        FROM deltas
        GROUP BY grp
        HAVING SUM(dcount) > 0
        ORDER BY group_key
    """)


CDC_INCREMENTAL_AGG_SQL = f"""
    SELECT COALESCE(field_b, '__none__') AS group_key,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(COALESCE(CAST(round(field_a * 100) AS BIGINT), 0))
                AS BIGINT) AS sum_a_cents
    FROM ({CDC_APPLY_OPLOG_SQL})
    GROUP BY COALESCE(field_b, '__none__')
    ORDER BY group_key
"""


def _reconcile_body_sql(truth_rel: str) -> str:
    """Engine-shared divergence audit between the reconstructed CDC
    truth and a snapshot. The snapshot is a deterministic corruption of
    the truth (drop %13 docs, perturb field_a on %11, phantom +1M rows
    for %17), so every divergence class is planted and exactly known:

    - 'missing_in_snapshot': truth row the snapshot lost
    - 'extra_in_snapshot':   snapshot row with no truth counterpart
    - 'field_mismatch':      both present, payload differs (cents-exact)
    - 'consistent':          identical

    The comparison itself is the operator: one full outer join on the
    doc key + per-row CASE, aggregated to a per-class report."""
    return f"""
        WITH snap AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 11 = 0
                        THEN round(field_a + 0.5, 2)
                        ELSE field_a END AS field_a,
                   field_b
            FROM {truth_rel} WHERE doc_id % 13 != 0
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, field_a, field_b
            FROM {truth_rel} WHERE doc_id % 17 = 0
        ),
        d AS (
            SELECT COALESCE(t.doc_id, s.doc_id) AS doc_id,
                   CASE
                       WHEN s.doc_id IS NULL THEN 'missing_in_snapshot'
                       WHEN t.doc_id IS NULL THEN 'extra_in_snapshot'
                       WHEN COALESCE(CAST(round(t.field_a * 100) AS BIGINT),
                                     -1)
                            != COALESCE(CAST(round(s.field_a * 100)
                                             AS BIGINT), -1)
                         OR COALESCE(t.field_b, '')
                            != COALESCE(s.field_b, '')
                            THEN 'field_mismatch'
                       ELSE 'consistent'
                   END AS status
            FROM {truth_rel} t FULL JOIN snap s ON t.doc_id = s.doc_id
        )
        SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM d GROUP BY status ORDER BY status
    """


def cdc_snapshot_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-vs-oplog consistency audit — the operational check a CDC
    deployment runs to prove the sink still equals the source (the
    reference's at-least-once delivery makes sink drift possible:
    src/main.rs:426-439 saves the resume token only after insert, so
    replays/partial batches must be reconciled downstream). Truth is the
    cdc_apply_oplog reconstruction; see _reconcile_body_sql for the
    divergence classes.

    Scale posture: the truth reconstruction is the one doc_id-keyed
    window pass cdc_apply_oplog already pins, and it runs ONCE behind a
    session-memoized barrier (the body references cdc_truth 3× — snap's
    two branches + the join's left side — which inlined would re-run the
    whole window reconstruction each time); the audit adds ONE
    doc_id-keyed full outer join and a 4-group aggregate. At 100 TB this
    is the standard nightly reconciliation shape (hash-compare both
    sides on the key, classify, count)."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    cached_barrier_view(
        spark, sf_dir, "cdc_truth",
        lambda: cdc_apply_oplog(spark, sf_dir), tables=("events",),
    )
    return spark.sql(_reconcile_body_sql("cdc_truth"))


# oracle: same body over the truth CTE (DuckDB hoists the reconstruction
# SQL directly; the Spark side registers the cdc_apply_oplog DataFrame as
# the cdc_truth view instead — same relation, same body text)
CDC_SNAPSHOT_RECONCILE_SQL = (
    f"WITH cdc_truth AS ({CDC_APPLY_OPLOG_SQL}), "
    + _reconcile_body_sql("cdc_truth").strip()[len("WITH"):]
)


QUERIES: dict[str, tuple] = {
    "cdc_apply_oplog": (cdc_apply_oplog, CDC_APPLY_OPLOG_SQL),
    "cdc_incremental_agg": (cdc_incremental_agg, CDC_INCREMENTAL_AGG_SQL),
    "cdc_snapshot_reconcile": (
        cdc_snapshot_reconcile,
        CDC_SNAPSHOT_RECONCILE_SQL,
    ),
}
