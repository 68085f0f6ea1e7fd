"""Manifest-committed versioned tables (sources/manifest.py): atomic
publish, time travel, append snapshots, orphan invisibility, vacuum."""

from __future__ import annotations

import os
import shutil

from vtb_datafusion_2023_spark.sources.manifest import (
    commit_versioned,
    read_versioned,
    table_versions,
    vacuum_versioned,
)


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def test_versioned_overwrite_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = commit_versioned(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), t)
    v2 = commit_versioned(spark.createDataFrame([(3, "c")], "k int, v string"), t)
    assert (v1, v2) == (1, 2)
    assert table_versions(t) == [1, 2]
    assert _rows(read_versioned(spark, t)) == [(3, "c")]
    assert _rows(read_versioned(spark, t, version=1)) == [(1, "a"), (2, "b")]


def test_versioned_append_carries_files_without_rewrite(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_versioned(spark.createDataFrame([(1, "a")], "k int, v string"), t)
    before = set(os.listdir(os.path.join(t, "data")))
    commit_versioned(
        spark.createDataFrame([(2, "b")], "k int, v string"), t, mode="append"
    )
    assert _rows(read_versioned(spark, t)) == [(1, "a"), (2, "b")]
    # v1's physical files are reused, not rewritten
    assert before <= set(os.listdir(os.path.join(t, "data")))


def test_unmanifested_files_are_invisible(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_versioned(spark.createDataFrame([(1, "a")], "k int, v string"), t)
    data = os.path.join(t, "data")
    # simulate a crashed writer: a finished data file that never committed
    src = next(p for p in os.listdir(data) if p.endswith(".parquet"))
    shutil.copy(os.path.join(data, src), os.path.join(data, "vX-orphan-00000.parquet"))
    assert _rows(read_versioned(spark, t)) == [(1, "a")]


def test_vacuum_removes_old_versions_and_orphans(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(3):
        commit_versioned(spark.createDataFrame([(i, "x")], "k int, v string"), t)
    data = os.path.join(t, "data")
    open(os.path.join(data, "vX-orphan-00000.parquet"), "w").close()
    deleted = vacuum_versioned(t, keep=1)
    assert table_versions(t) == [3]
    assert "vX-orphan-00000.parquet" in deleted
    # only version-3 files remain and the table still reads
    assert _rows(read_versioned(spark, t)) == [(2, "x")]
    live = set(os.listdir(data))
    assert all(f.startswith("v3-") for f in live)


def test_compact_rewrites_latest_into_fewer_files(spark, tmp_path):
    import glob
    import os

    from vtb_datafusion_2023_spark.sources.manifest import (
        commit_versioned,
        compact_versioned,
        read_versioned,
        table_versions,
        vacuum_versioned,
    )

    d = str(tmp_path / "t")
    # simulate per-batch appends: 6 commits x several files each
    for i in range(6):
        commit_versioned(
            spark.range(i * 10, (i + 1) * 10).repartition(4), d, mode="append"
        )
    before = read_versioned(spark, d)
    rows = {r.id for r in before.collect()}
    n_files_before = len(
        read_versioned.__globals__["_read_manifest"](d, table_versions(d)[-1])["files"]
    )
    assert n_files_before >= 6
    v = compact_versioned(spark, d, target_files=2)
    after = read_versioned(spark, d)
    assert {r.id for r in after.collect()} == rows
    n_files_after = len(
        read_versioned.__globals__["_read_manifest"](d, v)["files"]
    )
    assert n_files_after <= 2
    # older versions still readable until vacuumed; vacuum then reclaims
    assert read_versioned(spark, d, version=v - 1).count() == len(rows)
    deleted = vacuum_versioned(d, keep=1)
    assert deleted  # the pre-compaction small files are gone
    assert {r.id for r in read_versioned(spark, d).collect()} == rows


def test_merge_into_rewrites_only_touched_buckets(spark, tmp_path):
    import json

    from vtb_datafusion_2023_spark.sources.manifest import (
        commit_versioned_bucketed,
        merge_into,
    )

    t = str(tmp_path / "btbl")
    base = spark.createDataFrame([(i, f"v{i}") for i in range(200)], "k long, v string")
    v1 = commit_versioned_bucketed(base, t, key_col="k", n_buckets=8)
    assert v1 == 1

    updates = spark.createDataFrame(
        [(5, "NEW5"), (5 + 64, "NEW69"), (1000, "INSERTED")], "k long, v string"
    )
    v2 = merge_into(spark, t, updates)
    assert v2 == 2

    got = {r.k: r.v for r in read_versioned(spark, t).collect()}
    want = {i: f"v{i}" for i in range(200)}
    want.update({5: "NEW5", 69: "NEW69", 1000: "INSERTED"})
    assert got == want
    # time travel: v1 unchanged
    v1_rows = {r.k: r.v for r in read_versioned(spark, t, version=1).collect()}
    assert v1_rows == {i: f"v{i}" for i in range(200)}

    with open(os.path.join(t, "manifest-v1.json")) as f:
        m1 = json.load(f)
    with open(os.path.join(t, "manifest-v2.json")) as f:
        m2 = json.load(f)
    names1 = {e["name"] for e in m1["files"]}
    names2 = {e["name"] for e in m2["files"]}
    carried = names1 & names2
    touched_buckets = {e["bucket"] for e in m2["files"] if e["name"] not in names1}
    # the delta touched a strict minority of buckets; everything else
    # carried forward BY NAME (zero bytes rewritten)
    assert len(touched_buckets) <= 3
    assert len(carried) >= len(names1) - len(touched_buckets)
    untouched_v1 = {e["name"] for e in m1["files"] if e["bucket"] not in touched_buckets}
    assert untouched_v1 <= names2


def test_merge_into_deletes_and_rejects_dup_keys(spark, tmp_path):
    import pytest as _pytest

    from vtb_datafusion_2023_spark.sources.manifest import (
        commit_versioned_bucketed,
        merge_into,
    )

    t = str(tmp_path / "btbl2")
    base = spark.createDataFrame([(i, i * 10) for i in range(50)], "k long, v long")
    commit_versioned_bucketed(base, t, key_col="k", n_buckets=4)

    dels = spark.createDataFrame([(7,), (8,)], "k long")
    merge_into(spark, t, spark.createDataFrame([(7, 700)], "k long, v long").limit(0), delete_keys=dels)
    got = {r.k: r.v for r in read_versioned(spark, t).collect()}
    assert 7 not in got and 8 not in got and len(got) == 48

    dup = spark.createDataFrame([(1, 1), (1, 2)], "k long, v long")
    with _pytest.raises(ValueError, match="key-unique"):
        merge_into(spark, t, dup)


def test_read_versioned_pruned_opens_fewer_files(spark, tmp_path):
    import json

    from vtb_datafusion_2023_spark.sources.manifest import (
        commit_versioned_bucketed,
        read_versioned_pruned,
    )

    t = str(tmp_path / "btbl3")
    base = spark.createDataFrame([(i, f"v{i}") for i in range(300)], "k long, v string")
    commit_versioned_bucketed(base, t, key_col="k", n_buckets=8)
    out = read_versioned_pruned(spark, t, keys=[3, 250])
    assert {(r.k, r.v) for r in out.collect()} == {(3, "v3"), (250, "v250")}
    with open(os.path.join(t, "manifest-v1.json")) as f:
        m = json.load(f)
    n_files = len(m["files"])
    # the plan reads only the probed buckets' files
    scanned = out.inputFiles()
    assert 0 < len(scanned) < n_files


def test_table_changes_classifies_merge_delta(spark, tmp_path):
    """CDC between versions: the change feed of a merge_into is exactly its
    upserts/deletes, classified insert/update/delete with old/new values."""
    from vtb_datafusion_2023_spark.sources.manifest import (
        commit_versioned_bucketed,
        merge_into,
        table_changes,
    )

    t = str(tmp_path / "t")
    base = spark.createDataFrame([(k, k * 10) for k in range(1, 9)], "k long, v long")
    v1 = commit_versioned_bucketed(base, t, key_col="k", n_buckets=4)
    updates = spark.createDataFrame([(3, 999), (4, 40), (20, 2000)], "k long, v long")
    dels = spark.createDataFrame([(7,)], "k long")
    v2 = merge_into(spark, t, updates, delete_keys=dels)

    got = {r.k: (r.change_type, r.old_v, r.new_v) for r in table_changes(spark, t, v1, v2).collect()}
    # k=4 was upserted with the SAME value -> not a change
    assert got == {
        3: ("update", 30, 999),
        20: ("insert", None, 2000),
        7: ("delete", 70, None),
    }
    # reverse direction flips the feed
    rev = {r.k: r.change_type for r in table_changes(spark, t, v2, v1).collect()}
    assert rev == {3: "update", 20: "delete", 7: "insert"}


def test_zone_map_range_read_prunes_files(spark, tmp_path):
    """commit_versioned(stats_cols=) lifts per-file min/max from parquet
    footers; read_versioned_range opens only overlapping files and
    returns exactly the rows a full-scan filter would."""
    from vtb_datafusion_2023_spark.sources.manifest import (
        commit_versioned,
        read_versioned,
        read_versioned_range,
    )

    from pyspark.sql import functions as F

    t = str(tmp_path / "zm")
    df = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartitionByRange(10, "k")
    commit_versioned(df, t, stats_cols=["k"])

    narrow = read_versioned_range(spark, t, "k", lo=2500, hi=2600)
    opened = set(narrow.inputFiles())
    total = set(read_versioned(spark, t).inputFiles())
    assert len(opened) <= 2 and len(total) == 10, (len(opened), len(total))
    got = sorted(r.k for r in narrow.collect())
    assert got == list(range(2500, 2601))

    # half-open bounds
    assert read_versioned_range(spark, t, "k", lo=9990).count() == 10
    assert read_versioned_range(spark, t, "k", hi=9).count() == 10
    # disjoint range: zero files, empty result with the right schema
    empty = read_versioned_range(spark, t, "k", lo=20000)
    assert empty.count() == 0 and empty.columns == ["k", "v"]

    # a statless commit is conservatively un-pruned but still correct
    t2 = str(tmp_path / "zm2")
    commit_versioned(df, t2)
    r2 = read_versioned_range(spark, t2, "k", lo=2500, hi=2600)
    assert len(set(r2.inputFiles())) == 10
    assert r2.count() == 101


def test_norm_probe_unit():
    import datetime as dt

    from vtb_datafusion_2023_spark.sources.manifest import _norm_probe

    assert _norm_probe(dt.datetime(2023, 1, 3, 12, 30, 45, 123456)) == "2023-01-03T12:30:45.123456"
    assert _norm_probe(dt.date(2023, 1, 3)) == "2023-01-03"
    assert _norm_probe("2023-01-03 12:30:45") == "2023-01-03T12:30:45"
    assert _norm_probe("2023-01-03T12:30:45") == "2023-01-03T12:30:45"  # already iso
    assert _norm_probe("2023-01-03") == "2023-01-03"  # date string untouched
    assert _norm_probe(42) == 42
    assert _norm_probe(None) is None
    assert _norm_probe("not a timestamp") == "not a timestamp"


def test_zone_map_timestamp_probes_normalized(spark, tmp_path):
    """Timestamp stats are persisted as isoformat ('T'-separated) strings;
    a caller probing with a datetime object or a Spark-style
    'YYYY-MM-DD HH:MM:SS' string must get EXACTLY the full-scan-filter
    rows (previously: datetime raised TypeError, space-separated strings
    silently pruned matching files)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from vtb_datafusion_2023_spark.sources.manifest import (
        commit_versioned,
        read_versioned_range,
    )

    t = str(tmp_path / "zmts")
    df = (
        spark.range(0, 240)
        .select(
            F.col("id").alias("k"),
            (F.to_timestamp(F.lit("2023-01-01 00:00:00")) + F.make_interval(hours=F.col("id"))).alias("ts"),
        )
        .repartitionByRange(8, "ts")
    )
    commit_versioned(df, t, stats_cols=["ts"])

    lo_dt = dt.datetime(2023, 1, 3, 0, 0, 0)
    hi_dt = dt.datetime(2023, 1, 3, 23, 0, 0)
    expect = 24
    got_dt = read_versioned_range(spark, t, "ts", lo=lo_dt, hi=hi_dt)
    assert got_dt.count() == expect
    assert len(set(got_dt.inputFiles())) < 8  # pruning actually happened

    got_str = read_versioned_range(
        spark, t, "ts", lo="2023-01-03 00:00:00", hi="2023-01-03 23:00:00"
    )
    assert got_str.count() == expect

    # incomparable probe type (int vs str stats): conservative keep, exact
    # post-filter still never loses rows
    got_iso = read_versioned_range(
        spark, t, "ts", lo="2023-01-03T00:00:00", hi="2023-01-03T23:00:00"
    )
    assert got_iso.count() == expect

def test_zone_map_mixed_granularity_probe_keeps_boundary_file(spark, tmp_path):
    """A DATE-granularity probe against TIMESTAMP stats (or vice versa)
    must compare at the COMMON granularity: full-length lexicographic
    comparison ('2023-01-03T00:00:00' > '2023-01-03') used to prune the
    file holding the midnight boundary row that the exact post-filter
    keeps — silent row loss from a skipping primitive."""
    import datetime as dt

    from pyspark.sql import functions as F

    from vtb_datafusion_2023_spark.sources.manifest import (
        commit_versioned,
        read_versioned_range,
    )

    t = str(tmp_path / "zm_mixed")
    df = spark.createDataFrame(
        [(dt.datetime(2023, 1, d, h, 0, 0), d * 100 + h) for d in (1, 2, 3) for h in (0, 12)],
        "ts timestamp, v int",
    ).repartitionByRange(3, "ts")
    commit_versioned(df, t, stats_cols=["ts"])

    # hi as a DATE: post-filter ts <= date'2023-01-03' casts to midnight,
    # so exactly the Jan-1/Jan-2 rows plus the Jan-3 00:00 row qualify
    got = read_versioned_range(spark, t, "ts", hi=dt.date(2023, 1, 3))
    assert sorted(r.v for r in got.collect()) == [100, 112, 200, 212, 300]

    # lo as a DATE against timestamp stats: Jan-3 both rows qualify
    got = read_versioned_range(spark, t, "ts", lo=dt.date(2023, 1, 3))
    assert sorted(r.v for r in got.collect()) == [300, 312]

    # pruning still fires when decidable at date granularity
    narrow = read_versioned_range(spark, t, "ts", hi=dt.date(2023, 1, 1))
    assert len(set(narrow.inputFiles())) < 3


def test_schema_evolution_appended_column_and_time_travel(spark, tmp_path):
    from vtb_datafusion_2023_spark.sources.manifest import (
        commit_versioned,
        read_versioned,
    )

    td = str(tmp_path / "evolve")
    v1 = spark.createDataFrame([(1, 10), (2, 20)], "id long, a int")
    commit_versioned(v1, td)
    v2 = spark.createDataFrame([(3, 30, "x")], "id long, a int, b string")
    commit_versioned(v2, td, mode="append")

    cur = read_versioned(spark, td)
    assert [f.name for f in cur.schema.fields] == ["id", "a", "b"]
    got = {r.id: (r.a, r.b) for r in cur.collect()}
    # old files scan the evolved column as NULL
    assert got == {1: (10, None), 2: (20, None), 3: (30, "x")}
    # time travel sees the schema OF THAT version's manifest
    old = read_versioned(spark, td, version=1)
    assert [f.name for f in old.schema.fields] == ["id", "a"]
    assert old.count() == 2


def test_schema_evolution_rejects_type_change_on_append(spark, tmp_path):
    import pytest

    from vtb_datafusion_2023_spark.sources.manifest import commit_versioned

    td = str(tmp_path / "evolve2")
    commit_versioned(spark.createDataFrame([(1, 10)], "id long, a int"), td)
    bad = spark.createDataFrame([(2, "oops")], "id long, a string")
    with pytest.raises(ValueError, match="schema evolution cannot change"):
        commit_versioned(bad, td, mode="append")


def test_schema_evolution_append_missing_column_keeps_it(spark, tmp_path):
    from vtb_datafusion_2023_spark.sources.manifest import (
        commit_versioned,
        read_versioned,
    )

    td = str(tmp_path / "evolve3")
    commit_versioned(spark.createDataFrame([(1, 10)], "id long, a int"), td)
    # an append that DROPS a column keeps it in the union schema —
    # the new file's rows read it as NULL
    commit_versioned(spark.createDataFrame([(2,)], "id long"), td, mode="append")
    got = {r.id: r.a for r in read_versioned(spark, td).collect()}
    assert got == {1: 10, 2: None}


def test_schema_evolution_from_legacy_manifest_keeps_old_columns(spark, tmp_path):
    """A table committed before schema tracking (manifest without a
    'schema' key) must evolve by recovering the old files' schema —
    not by pinning only the new frame's columns (which would silently
    hide old-only columns and skip the type guard)."""
    import json
    import os

    import pytest

    from vtb_datafusion_2023_spark.sources.manifest import (
        commit_versioned,
        read_versioned,
    )

    td = str(tmp_path / "legacy")
    commit_versioned(spark.createDataFrame([(1, 10)], "id long, a int"), td)
    # simulate a pre-schema-evolution manifest
    mp = os.path.join(td, "manifest-v1.json")
    m = json.load(open(mp))
    del m["schema"]
    json.dump(m, open(mp, "w"))

    commit_versioned(
        spark.createDataFrame([(2, "x")], "id long, b string"), td, mode="append"
    )
    cur = read_versioned(spark, td)
    assert [f.name for f in cur.schema.fields] == ["id", "a", "b"]
    got = {r.id: (r.a, r.b) for r in cur.collect()}
    assert got == {1: (10, None), 2: (None, "x")}
    # and the type guard fires against the RECOVERED schema too
    mp2 = os.path.join(td, "manifest-v2.json")
    m2 = json.load(open(mp2))
    del m2["schema"]
    json.dump(m2, open(mp2, "w"))
    with pytest.raises(ValueError, match="schema evolution cannot change"):
        commit_versioned(
            spark.createDataFrame([(3, 1.5)], "id long, a double"), td, mode="append"
        )


def test_schema_evolution_rejects_before_writing_data(spark, tmp_path):
    """A rejected type change must not leave the append's data files
    behind as orphans — validation happens before the staging write."""
    import glob
    import os

    import pytest

    from vtb_datafusion_2023_spark.sources.manifest import commit_versioned

    td = str(tmp_path / "noorphans")
    commit_versioned(spark.createDataFrame([(1, 10)], "id long, a int"), td)
    before = set(glob.glob(os.path.join(td, "data", "*")))
    with pytest.raises(ValueError, match="schema evolution cannot change"):
        commit_versioned(
            spark.createDataFrame([(2, "oops")], "id long, a string"),
            td,
            mode="append",
        )
    assert set(glob.glob(os.path.join(td, "data", "*"))) == before


def test_schema_evolution_legacy_multifile_merges_all_columns(spark, tmp_path):
    """Legacy-schema recovery must mergeSchema across the old files: a
    pre-tracking table that accumulated appends with DIFFERENT column
    sets recovers the union, not whichever single file's footer the
    reader happened to pick (ADVICE r5, manifest.py:204)."""
    import json
    import os

    from vtb_datafusion_2023_spark.sources.manifest import (
        commit_versioned,
        read_versioned,
    )

    td = str(tmp_path / "legacy_multi")
    commit_versioned(spark.createDataFrame([(1, 10)], "id long, a int"), td)
    commit_versioned(
        spark.createDataFrame([(2, "x")], "id long, b string"), td, mode="append"
    )
    # simulate both commits predating schema tracking
    mp = os.path.join(td, "manifest-v2.json")
    m = json.load(open(mp))
    del m["schema"]
    json.dump(m, open(mp, "w"))

    commit_versioned(
        spark.createDataFrame([(3, 1.5)], "id long, c double"), td, mode="append"
    )
    cur = read_versioned(spark, td)
    assert [f.name for f in cur.schema.fields] == ["id", "a", "b", "c"]
    got = {r.id: (r.a, r.b, r.c) for r in cur.collect()}
    assert got == {1: (10, None, None), 2: (None, "x", None), 3: (None, None, 1.5)}


def test_schema_evolution_nested_nullability_is_not_a_type_change(spark, tmp_path):
    """Inner-field nullability (array containsNull, struct-field nullable)
    differs between createDataFrame inference and a parquet round-trip;
    the evolution guard must normalize it recursively instead of
    rejecting a compatible append (ADVICE r5, manifest.py:87)."""
    from pyspark.sql import types as T

    from vtb_datafusion_2023_spark.sources.manifest import (
        commit_versioned,
        read_versioned,
    )

    strict = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField(
                "xs",
                T.ArrayType(
                    T.StructType([T.StructField("v", T.LongType(), False)]), False
                ),
                False,
            ),
        ]
    )
    loose = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField(
                "xs",
                T.ArrayType(
                    T.StructType([T.StructField("v", T.LongType(), True)]), True
                ),
                True,
            ),
        ]
    )
    td = str(tmp_path / "nested_null")
    commit_versioned(spark.createDataFrame([(1, [{"v": 7}])], strict), td)
    # same dataTypes, every nullability flag flipped: must append cleanly
    commit_versioned(
        spark.createDataFrame([(2, [{"v": 8}])], loose), td, mode="append"
    )
    got = {r.id: [x.v for x in r.xs] for r in read_versioned(spark, td).collect()}
    assert got == {1: [7], 2: [8]}
