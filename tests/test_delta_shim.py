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
    if importable:
        # the session-level probe may still be False (python package
        # without jars); it must never be True when the bare import fails
        assert D.delta_available(spark) in (True, False)
    else:
        assert D.delta_available(spark) is False


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
