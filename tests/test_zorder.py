"""Z-order layout: the written files must bound per-file min/max spread
on BOTH dimensions (that's the file-skipping property), which only the
Spark side can observe — the oracle checks key assignment, this checks
the layout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.io import load_table
from mongo_to_clickhouse_spark.queries.zorderops import ZORDER_FILES, zorder_write

SRC = "/root/testdata/sf0.01"


def _mean_file_spread(per_file, lo_col, hi_col, global_lo, global_hi):
    spreads = [
        (r[hi_col] - r[lo_col]) / (global_hi - global_lo) for r in per_file
    ]
    return sum(spreads) / len(spreads)


def test_zorder_files_bound_both_dimensions(spark, tmp_path):
    out = os.path.join(str(tmp_path), "events_z")
    zorder_write(load_table(spark, SRC, "events"), out)

    back = spark.read.parquet(out).withColumn(
        "file", F.input_file_name()
    )
    per_file = (
        back.groupBy("file")
        .agg(
            F.min("user_id").alias("ulo"),
            F.max("user_id").alias("uhi"),
            F.min("v100").alias("vlo"),
            F.max("v100").alias("vhi"),
            F.min("zkey").alias("zlo"),
            F.max("zkey").alias("zhi"),
        )
        .collect()
    )
    assert len(per_file) == ZORDER_FILES

    # repartitionByRange => file z-ranges are non-overlapping
    zspans = sorted((r.zlo, r.zhi) for r in per_file)
    for (_, hi), (lo, _) in zip(zspans, zspans[1:]):
        assert hi <= lo

    g = back.agg(
        F.min("user_id"), F.max("user_id"), F.min("v100"), F.max("v100")
    ).collect()[0]
    u_spread = _mean_file_spread(per_file, "ulo", "uhi", g[0], g[1])
    v_spread = _mean_file_spread(per_file, "vlo", "vhi", g[2], g[3])
    # a single-column sort would leave the OTHER dimension's mean spread
    # at ~1.0; Morton clustering with 16 files must cut both well below
    assert u_spread < 0.6, u_spread
    assert v_spread < 0.6, v_spread

    # and a point-ish predicate on either dimension must skip most files
    mid_u = (g[0] + g[1]) // 2
    hit_u = sum(1 for r in per_file if r.ulo <= mid_u <= r.uhi)
    mid_v = (g[2] + g[3]) // 2
    hit_v = sum(1 for r in per_file if r.vlo <= mid_v <= r.vhi)
    assert hit_u <= ZORDER_FILES // 2
    assert hit_v <= ZORDER_FILES // 2


def test_compaction_binpacks_small_files(spark, tmp_path):
    """Compaction must collapse the synthesized 64-file layout to a
    handful of right-sized files WITHOUT losing or duplicating rows."""
    import os

    from mongo_to_clickhouse_spark.io import load_table
    from mongo_to_clickhouse_spark.queries.zorderops import (
        COMPACT_SMALL_FILES,
        compact_binpack,
    )

    small = os.path.join(str(tmp_path), "small")
    packed = os.path.join(str(tmp_path), "packed")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.repartition(COMPACT_SMALL_FILES).write.parquet(small)

    def _nfiles(d):
        return sum(
            1 for f in os.listdir(d) if f.endswith(".parquet")
        )

    assert _nfiles(small) == COMPACT_SMALL_FILES
    compact_binpack(spark, small, packed)
    # sf0.001 events ≈ a few hundred KB total << 4MB advisory → 1 file
    assert _nfiles(packed) <= 4, "compaction must bin-pack, not preserve, file count"
    assert spark.read.parquet(packed).count() == ev.count()


def test_hilbert_sql_matches_reference_lattice():
    # exhaustive 16x16 check of the engine-shared unrolled ladder
    # against the classic xy2d loop, plus bijectivity
    import duckdb

    from mongo_to_clickhouse_spark.operators.zorder import hilbert_stages_sql

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    con = duckdb.connect(":memory:")
    con.execute(
        "CREATE TABLE pts AS SELECT a AS hx, b AS hy, a*16+b AS pid"
        " FROM range(16) t(a), range(16) u(b)"
    )
    sql = (f"WITH {hilbert_stages_sql('pts', 'pid', bits=4)}"
           " SELECT pid, hd FROM h4")
    got = dict(con.execute(sql).fetchall())
    assert all(got[x * 16 + y] == xy2d(16, x, y)
               for x in range(16) for y in range(16))
    assert sorted(got.values()) == list(range(256))


def test_layout_locality_hilbert_beats_morton(spark, sf_dir):
    from mongo_to_clickhouse_spark.queries.zorderops import (
        profile_layout_locality,
    )

    rows = {r.ordering: r for r in
            profile_layout_locality(spark, sf_dir).collect()}
    nat, z, h = rows["a_natural"], rows["b_zorder"], rows["c_hilbert"]
    # both curves crush arrival order on both dimensions; Hilbert's
    # unit-step property keeps it at or under Morton
    assert z.avg_user_span_milli < nat.avg_user_span_milli / 5
    assert z.avg_value_span_milli < nat.avg_value_span_milli / 5
    assert h.avg_user_span_milli <= z.avg_user_span_milli
    assert h.avg_value_span_milli <= z.avg_value_span_milli
