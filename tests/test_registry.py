"""Registry contract tests: the queries()/oracle_sql() surface the round
driver consumes, and the _DRIVER_PRIORITY ordering knob (ADVICE r2: the
list is coupled to driver behavior and would silently rot — stale names
are ignored at runtime, so a typo would quietly waste a coverage slot)."""

from __future__ import annotations

from cours_datalake_dwh_td_kafka_spark import registry


def test_driver_priority_names_all_registered():
    qs = registry.queries()
    stale = [n for n in registry._DRIVER_PRIORITY if n not in qs]
    assert stale == [], f"stale _DRIVER_PRIORITY names: {stale}"


def test_driver_priority_no_duplicates():
    names = registry._DRIVER_PRIORITY
    assert len(names) == len(set(names))


def test_priority_names_lead_iteration_order():
    qs = registry.queries()
    head = list(qs)[: len(registry._DRIVER_PRIORITY)]
    assert head == list(registry._DRIVER_PRIORITY)


def test_every_oracle_has_a_query():
    qs, osql = registry.queries(), registry.oracle_sql()
    assert set(osql) <= set(qs)
    # both views present the same ordering contract
    assert [n for n in qs if n in osql] == list(osql)


def test_approx_family_is_oracle_paired():
    """Round-3 requirement: the approx sketches carry a value oracle
    (exact value + bounded-error boolean) instead of rows-only."""
    osql = registry.oracle_sql()
    assert "approx_quantiles" in osql
    assert "approx_distinct_count" in osql


def test_protocol_lane_names_all_registered():
    """PROTOCOL_QUERIES drives the bench's two-lane split; a stale name
    would silently misclassify lane subtotals."""
    qs = registry.queries()
    stale = [n for n in registry.PROTOCOL_QUERIES if n not in qs]
    assert stale == [], f"stale PROTOCOL_QUERIES names: {stale}"
    # the lane is a strict minority: the operator lane stays the headline
    assert len(registry.PROTOCOL_QUERIES) < len(qs) / 4
