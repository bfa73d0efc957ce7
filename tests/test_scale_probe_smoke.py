"""CI smoke for the scale-probe harness (VERDICT r11 item 7).

scripts/scale_probe_10x.py is the repo's executed-scale gate (the
10x/30x probes in docs/SCALE.md), but it only ran by hand between
rounds — a refactor of the replicators, the registry, or the probe
itself could silently break it.  This test exercises materialize+run
end-to-end at k=2 over the sf0.001 fixtures (a few seconds), checking
the replica's referential integrity and that the probe reports success.
"""

from __future__ import annotations

import importlib.util
import os

_PROBE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "scale_probe_10x.py",
)


def _load_probe():
    spec = importlib.util.spec_from_file_location("scale_probe_10x", _PROBE_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scale_probe_materialize_and_run_k2(spark, sf_dir, tmp_path):
    probe = _load_probe()
    out_dir = str(tmp_path / "k2")
    probe.materialize(sf_dir, out_dir, k=2)

    # every table written, fact tables exactly doubled
    for name in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        assert os.path.isdir(os.path.join(out_dir, f"{name}.parquet")), name
    for name in ("lineitem", "orders", "events", "documents", "embeddings"):
        base = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")).count()
        rep = spark.read.parquet(os.path.join(out_dir, f"{name}.parquet")).count()
        assert rep == 2 * base, (name, base, rep)

    # RI-preserving remap: no dangling keys in the replica's core joins
    orders = spark.read.parquet(os.path.join(out_dir, "orders.parquet"))
    cust = spark.read.parquet(os.path.join(out_dir, "customer.parquet"))
    li = spark.read.parquet(os.path.join(out_dir, "lineitem.parquet"))
    dangling_cust = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_anti"
    ).count()
    dangling_ord = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "left_anti"
    ).count()
    assert dangling_cust == 0 and dangling_ord == 0

    # run the probe's execution path on a 2-query subset: one headline
    # relational, one ACTUAL TRACKING_QUERIES member (r12 ADVICE item 2:
    # dedup_exact_documents is itself headline, so the tracking tier was
    # never exercised) — covers the noop-sink loop, both tier-labeling
    # branches, and the JSON summary
    rc = probe.run(out_dir, names=["q1_pricing_summary", "sim_hnsw_search"])
    assert rc == 0


def test_scale_probe_run_rejects_unknown_query(spark, sf_dir, tmp_path):
    probe = _load_probe()
    import pytest

    with pytest.raises(KeyError, match="no_such_query"):
        probe.run(str(tmp_path), names=["no_such_query"])
