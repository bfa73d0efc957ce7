"""Delta integration facade (VERDICT r7 item 3): one API that routes to
real ``format("delta")`` when delta-spark is importable and to the
versioned parquet-manifest twin otherwise.

The fallback branch runs everywhere (this sandbox has no delta-spark);
the parity class runs both backends side-by-side and is skip-marked
when the package is absent — deploying the repo with delta-spark on the
classpath activates it with zero code changes."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_project_with_databricks_spark.sources import (
    delta_shim as D,
)

HAS_DELTA = D.delta_available()


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "dt")


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, n int")


def test_probe_is_honest(spark) -> None:
    """delta_available() must agree with an actual import attempt, and
    must refuse when the JVM classpath lacks the Delta extension even if
    the Python package imports."""
    try:
        import delta  # noqa: F401

        importable = True
    except ImportError:
        importable = False
    assert D.delta_available() == importable
    if not importable:
        assert D.delta_available(spark) is False


def test_probe_refuses_without_jvm_classes(spark, monkeypatch) -> None:
    """The documented split-brain case: Python delta package importable
    but the Scala extension absent from the JVM classpath (pip install
    without configure_spark_with_delta_pip).  The bare probe must say
    True, the session probe False — exercised here by injecting a fake
    ``delta`` package and a session whose JVM resolution raises."""
    import sys
    import types

    fake = types.ModuleType("delta")
    fake_tables = types.ModuleType("delta.tables")
    fake_tables.DeltaTable = object
    fake.tables = fake_tables
    monkeypatch.setitem(sys.modules, "delta", fake)
    monkeypatch.setitem(sys.modules, "delta.tables", fake_tables)
    assert D.delta_available() is True

    class _RaisingJvm:
        def __getattr__(self, name):
            raise RuntimeError("ClassNotFoundException: io.delta.tables")

    class _NoDeltaSession:
        _jvm = _RaisingJvm()

    assert D.delta_available(_NoDeltaSession()) is False


def test_timestamp_as_of_uses_session_timezone() -> None:
    """Delta parses timestampAsOf in spark.sql.session.timeZone — the
    same instant must render as DIFFERENT wall-clock strings per zone,
    with fractional seconds kept (truncation selects an earlier
    version)."""
    epoch = 1723726800.25  # 2024-08-15T13:00:00.25Z
    assert D._timestamp_as_of(epoch, "UTC") == "2024-08-15 13:00:00.250000+00:00"
    assert (
        D._timestamp_as_of(epoch, "America/Los_Angeles")
        == "2024-08-15 06:00:00.250000-07:00"
    )
    # Java SHORT_IDS Spark honors but zoneinfo lacks
    assert D._timestamp_as_of(epoch, "PST") == "2024-08-15 06:00:00.250000-07:00"
    assert D._timestamp_as_of(epoch, "JST") == "2024-08-15 22:00:00.250000+09:00"
    assert D._timestamp_as_of(epoch, "IST") == "2024-08-15 18:30:00.250000+05:30"
    # EST/MST/HST are FIXED offsets in Java's ZoneId.of (never DST):
    # an August instant must still render at -05:00, not EDT's -04:00
    assert D._timestamp_as_of(epoch, "EST") == "2024-08-15 08:00:00.250000-05:00"
    assert D._timestamp_as_of(epoch, "MST") == "2024-08-15 06:00:00.250000-07:00"
    assert D._timestamp_as_of(epoch, "HST") == "2024-08-15 03:00:00.250000-10:00"
    # fixed-offset ids Spark accepts but zoneinfo rejects
    assert (
        D._timestamp_as_of(epoch, "GMT+08:00")
        == "2024-08-15 21:00:00.250000+08:00"
    )
    assert D._timestamp_as_of(epoch, "UTC-5") == "2024-08-15 08:00:00.250000-05:00"
    assert D._timestamp_as_of(epoch, "+09:30") == "2024-08-15 22:30:00.250000+09:30"
    # unknown zones fall back to UTC — safe: the explicit offset makes
    # the string mean the same instant under any session zone
    assert (
        D._timestamp_as_of(epoch, "Not/AZone")
        == "2024-08-15 13:00:00.250000+00:00"
    )


def test_timestamp_as_of_dst_fold_is_unambiguous() -> None:
    """The second occurrence of 01:30 on the US fall-back day must carry
    the POST-transition offset (-08:00): a zone-less '01:30:00' string
    would parse to the earlier (PDT) instant, one hour off."""
    first = 1730622600.5   # 2024-11-03 01:30:00.5 PDT (UTC-7)
    second = 1730626200.5  # 2024-11-03 01:30:00.5 PST (UTC-8), same wall clock
    a = D._timestamp_as_of(first, "America/Los_Angeles")
    b = D._timestamp_as_of(second, "America/Los_Angeles")
    assert a == "2024-11-03 01:30:00.500000-07:00"
    assert b == "2024-11-03 01:30:00.500000-08:00"
    assert a != b


def test_facade_append_read_time_travel(spark, root) -> None:
    v1 = D.write_append(_df(spark, [("a", 1), ("b", 2)]), root)
    v2 = D.write_append(_df(spark, [("c", 3)]), root)
    assert v2 > v1
    assert D.read_snapshot(spark, root).count() == 3
    assert sorted(
        r.k for r in D.read_snapshot(spark, root, version=v1).collect()
    ) == ["a", "b"]
    with pytest.raises(ValueError):
        D.read_snapshot(spark, root, version=v1, timestamp=1.0)


def test_facade_merge_and_changes(spark, root) -> None:
    v1 = D.write_append(_df(spark, [("a", 1), ("b", 2)]), root)
    vm = D.merge_upsert(_df(spark, [("b", 20), ("c", 3)]), root, key="k")
    assert vm > v1
    snap = {r.k: r.n for r in D.read_snapshot(spark, root).collect()}
    assert snap == {"a": 1, "b": 20, "c": 3}
    changes = D.table_changes(spark, root, from_version=v1).collect()
    got = {(r.k, r.n, r._change_type) for r in changes}
    # the update surfaces as delete(pre) + insert(post); 'c' as insert
    assert got == {("b", 2, "delete"), ("b", 20, "insert"), ("c", 3, "insert")}


def test_facade_restore_and_history(spark, root) -> None:
    v1 = D.write_append(_df(spark, [("a", 1)]), root)
    D.write_append(_df(spark, [("b", 2)]), root)
    vr = D.restore(spark, root, v1)
    assert D.read_snapshot(spark, root).count() == 1
    ops = {r.version: r.operation for r in D.history(spark, root).collect()}
    assert ops[vr] == "RESTORE"


def test_facade_vacuum_smoke(spark, root) -> None:
    D.write_append(_df(spark, [("a", 1)]), root)
    D.write_append(_df(spark, [("b", 2)]), root)
    # age guard retains everything fresh; the call itself must route
    D.vacuum(spark, root, retain_hours=168.0, retain_last=1)
    assert D.read_snapshot(spark, root).count() == 2


@pytest.mark.skipif(not HAS_DELTA, reason="delta-spark not installed")
class TestDeltaParity:
    """Runs only with delta-spark on the classpath: the facade's Delta
    branch and the versioned twin must agree on snapshot contents, time
    travel, merge results, and the normalized change feed."""

    def test_append_merge_cdf_parity(self, spark, tmp_path) -> None:
        from end_to_end_data_engineering_project_with_databricks_spark.sources import (
            versioned as V,
        )

        droot, troot = str(tmp_path / "delta"), str(tmp_path / "twin")
        spark.sql(
            "SET spark.databricks.delta.properties.defaults.enableChangeDataFeed=true"
        )
        b1 = _df(spark, [("a", 1), ("b", 2)])
        b2 = _df(spark, [("b", 20), ("c", 3)])
        dv1 = D.write_append(b1, droot)
        tv1 = V.append(b1, troot)
        D.merge_upsert(b2, droot, key="k")
        V.merge_upsert(b2, troot, key="k")

        def rows(df):
            return sorted((r.k, r.n) for r in df.select("k", "n").collect())

        assert rows(D.read_snapshot(spark, droot)) == rows(V.read(spark, troot))
        assert rows(D.read_snapshot(spark, droot, version=dv1)) == rows(
            V.read(spark, troot, version=tv1)
        )
        dch = sorted(
            (r.k, r.n, r._change_type)
            for r in D.table_changes(spark, droot, dv1).collect()
        )
        tch = sorted(
            (r.k, r.n, r._change_type)
            for r in V.table_changes(spark, troot, tv1).collect()
        )
        assert dch == tch

    def test_timestamp_read_parity(self, spark, tmp_path) -> None:
        """timestampAsOf must select the same snapshot as the twin's
        epoch-seconds comparison — on a session pinned to a NON-UTC
        zone, the case the UTC-formatting bug broke (ADVICE r8)."""
        import time

        from end_to_end_data_engineering_project_with_databricks_spark.sources import (
            versioned as V,
        )

        droot, troot = str(tmp_path / "delta_ts"), str(tmp_path / "twin_ts")
        old_tz = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        try:
            D.write_append(_df(spark, [("a", 1)]), droot)
            V.append(_df(spark, [("a", 1)]), troot)
            time.sleep(1.5)
            cut = time.time()
            time.sleep(1.5)
            D.write_append(_df(spark, [("b", 2)]), droot)
            V.append(_df(spark, [("b", 2)]), troot)
            drows = sorted(
                r.k
                for r in D.read_snapshot(spark, droot, timestamp=cut).collect()
            )
            trows = sorted(
                r.k for r in V.read(spark, troot, timestamp=cut).collect()
            )
            assert drows == trows == ["a"]
        finally:
            spark.conf.set("spark.sql.session.timeZone", old_tz)

    def test_multi_commit_net_cdf_parity(self, spark, tmp_path) -> None:
        """Update-then-revert across two commits: Delta CDF emits
        cancelling pairs, the twin's snapshot diff omits them — the
        facade must net them out (ADVICE r8)."""
        from end_to_end_data_engineering_project_with_databricks_spark.sources import (
            versioned as V,
        )

        droot, troot = str(tmp_path / "delta_net"), str(tmp_path / "twin_net")
        spark.sql(
            "SET spark.databricks.delta.properties.defaults.enableChangeDataFeed=true"
        )
        dv1 = D.write_append(_df(spark, [("x", 1), ("y", 9)]), droot)
        tv1 = V.append(_df(spark, [("x", 1), ("y", 9)]), troot)
        for batch in ([("x", 2)], [("x", 1)]):  # update then revert
            D.merge_upsert(_df(spark, batch), droot, key="k")
            V.merge_upsert(_df(spark, batch), troot, key="k")
        dch = sorted(
            (r.k, r.n, r._change_type)
            for r in D.table_changes(spark, droot, dv1).collect()
        )
        tch = sorted(
            (r.k, r.n, r._change_type)
            for r in V.table_changes(spark, troot, tv1).collect()
        )
        assert dch == tch == []
