"""Round-12 operator tests: the join half of the CMS skew routing
(VERDICT r11 item 6) — the persisted heavy-key estimate choosing plain
vs salted join, both branches pinned in the plan — plus the self-sizing
ANN cell-count derivation (VERDICT r11 item 3).
"""

from __future__ import annotations

from end_to_end_data_engineering_project_with_databricks_spark.queries.relational_extra import (
    cms_salt_routed_join,
)


def test_cms_salt_routing_both_branches_pinned(spark, sf_dir) -> None:
    """The reducer-share knob forces each routing decision; the chosen
    JOIN plan must match it — the salted branch's plan replicates the
    dim per salt (a Generate/explode of the salt array and a `_salt`
    join key), the plain branch has neither — and the ANSWER must be
    decision-invariant: identical rows from both plans (salting never
    changes join semantics)."""
    sj = cms_salt_routed_join(spark, sf_dir)  # default: rule trips
    pj = cms_salt_routed_join(spark, sf_dir, reducer_share_parts=0)
    assert sj.select("join_strategy").first()[0] == "salted"
    assert pj.select("join_strategy").first()[0] == "plain"
    sp = sj._jdf.queryExecution().sparkPlan().toString()
    pp = pj._jdf.queryExecution().sparkPlan().toString()
    assert "_salt" in sp and "explode" in sp.lower(), sp
    assert "_salt" not in pp, pp
    a = {tuple(r) for r in sj.drop("join_strategy").collect()}
    b = {tuple(r) for r in pj.drop("join_strategy").collect()}
    assert a == b


def test_cms_salt_routing_estimates_pinned(spark, sf_dir) -> None:
    """At sf0.001 the sketch estimates are pinned constants — the SAME
    (events, event_type) catalog statistic cms_skew_routed_distinct
    consults (210 exact heaviest-type mass, 1000 exact total), so the
    default reducer-share rule (x32) trips to the salted branch, and
    every event row survives the dim join (the dim is the distinct key
    set)."""
    rows = cms_salt_routed_join(spark, sf_dir).collect()
    assert len(rows) == 5
    (emax,) = {r["est_max_key_rows"] for r in rows}
    (etot,) = {r["est_total_rows"] for r in rows}
    assert (emax, etot) == (210, 1000)
    assert sum(r["n_events"] for r in rows) == 1000
    (strategy,) = {r["join_strategy"] for r in rows}
    assert strategy == "salted"
