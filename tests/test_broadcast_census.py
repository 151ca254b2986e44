"""Broadcast growth-class census enforcement — the automated version of
the round-9 manual audit (PERF.md), same pattern as the sweep's cache-
race gate: a structural property that silently regresses at fixture
scale gets a mechanical check instead of a per-round human pass.

Pure AST tests — no SparkSession needed."""

from __future__ import annotations

from kinesis2sse_spark.broadcast_census import (
    CENSUS,
    GROWTH_CLASSES,
    census_table,
    scan_broadcast_sites,
    stale_entries,
    unclassified,
)


def test_every_broadcast_site_classified():
    """Any new F.broadcast() call site must be added to the census
    allowlist with a growth class, or this fails — a forced hint can
    never land unclassified again."""
    missing = unclassified()
    assert not missing, (
        "unclassified F.broadcast() call sites (add to "
        f"kinesis2sse_spark/broadcast_census.py with a growth class): {missing}"
    )


def test_census_has_no_stale_entries():
    """Every allowlist entry must correspond to a live call site, so
    the census cannot rot into an over-approximation that would mask a
    future unclassified hint at the same key."""
    stale = stale_entries()
    assert not stale, f"census entries with no matching call site: {stale}"


def test_all_classes_are_known_and_none_linear():
    """Only the documented growth classes appear — 'linear' is
    deliberately not a member of GROWTH_CLASSES, so a linear-growth
    hint cannot be legitimized by typo or fiat."""
    for key, cls in CENSUS.items():
        assert cls in GROWTH_CLASSES, f"{key}: unknown class {cls!r}"
    assert "linear" not in GROWTH_CLASSES


def test_unclassified_hint_is_reported():
    """An intentionally unclassified hint fails the check: inject a
    fake call site and assert the checker names it (proves the gate
    actually bites, not just that today's census happens to match)."""
    fake = ("fake_module.py", "fake_query", "F_customer_dim")
    sites = scan_broadcast_sites() + [fake]
    missing = unclassified(sites)
    assert fake in missing
    # and the real sites stay classified — only the injected one trips
    assert missing == [fake]


def test_scan_finds_known_sites():
    """The scanner actually sees through the package (guards against a
    silent scan regression making the census vacuously green)."""
    sites = scan_broadcast_sites()
    # duplicate keys (the same relation hinted twice in one function,
    # e.g. pagerank's ncnt) collapse in the CENSUS dict
    assert len(set(sites)) == len(CENSUS)
    assert ("joins.py", "join_broadcast_inner", "part") in sites
    assert ("tpch.py", "q5_local_supplier_volume", "n") in sites


def test_census_table_renders():
    t = census_table()
    assert "| class | sites |" in t
    assert "operator-demo" in t and "cluster-bounded" in t
