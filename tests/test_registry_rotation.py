"""Driver-window self-rotation, three rules in priority order:

1. RED RE-FRONT — a query whose LATEST driver row is red leads the
   window unconditionally (a regression must never rotate out of
   driver scrutiny while unfixed);
2. ACTIVE PRIORITY LIST — DRIVER_PRIORITY leads verbatim (exempt from
   rotate-to-back) until every listed name has a row from round >=
   DRIVER_PRIORITY_ROUND; rows from EARLIER rounds don't spend it, so
   re-proof entries with old green rows still front;
3. behind those: never-checked first (registration order), then checked
   ordered least-recently-checked first (stale rows re-earn fresh
   driver rows once coverage is airtight).

These tests assert the ordering INVARIANTS against synthetic driver
histories (monkeypatched _driver_rows), never against the repo's real
CORRECTNESS files — the r04 verdict flagged snapshot-form tests as
self-breaking (they go red the moment the next driver file lands), and
the r06 verdict caught a second instance: a precondition that a
never-checked query EXISTS breaks forever the moment coverage becomes
airtight."""

from __future__ import annotations

from kinesis2sse_spark import registry

GREEN = {"rows_match": True, "schema_match": True, "hash_match": True}
RED = {"rows_match": True, "schema_match": True, "hash_match": False}


def _fake_rows(monkeypatch, rows: dict[str, tuple[int, dict]]):
    monkeypatch.setattr(registry, "_driver_rows", lambda: rows)


def test_red_latest_row_re_fronts_unconditionally(monkeypatch):
    # every name checked GREEN in the priority round (list spent), but
    # one non-priority name's LATEST row is red → it leads the window
    registry._ensure_loaded()
    names = list(registry._REGISTRY)
    red_name = next(
        n for n in names if n not in set(registry.DRIVER_PRIORITY)
    )
    rnd = registry.DRIVER_PRIORITY_ROUND
    rows = {n: (rnd, dict(GREEN)) for n in names}
    rows[red_name] = (rnd, dict(RED))
    _fake_rows(monkeypatch, rows)
    ordered = list(registry.all_queries())
    assert ordered[0] == red_name


def test_red_older_than_green_does_not_re_front(monkeypatch):
    # a red row SUPERSEDED by a later green row is fixed — only the
    # latest round's record counts
    registry._ensure_loaded()
    names = list(registry._REGISTRY)
    rnd = registry.DRIVER_PRIORITY_ROUND
    rows = {n: (rnd, dict(GREEN)) for n in names}
    _fake_rows(monkeypatch, rows)
    assert registry._red_names() == []


def test_priority_entries_lead_despite_old_green_rows(monkeypatch):
    # THE r06 failure mode: every listed name already has an OLD row,
    # which under all-names-checked semantics spent the list instantly.
    # Round-scoped semantics keep it active until the curated round
    # actually runs.
    registry._ensure_loaded()
    pri = [n for n in registry.DRIVER_PRIORITY if n in registry._REGISTRY]
    assert pri, "DRIVER_PRIORITY should name registered queries"
    old = registry.DRIVER_PRIORITY_ROUND - 1
    rows = {n: (old, dict(GREEN)) for n in registry._REGISTRY}
    _fake_rows(monkeypatch, rows)
    names = list(registry.all_queries())
    assert names[: len(pri)] == pri


def test_priority_spends_once_curated_round_has_run(monkeypatch):
    # every listed name has a row from the curated round (or later) →
    # the list stops fronting and never-checked-first rotation governs
    registry._ensure_loaded()
    pri = [n for n in registry.DRIVER_PRIORITY if n in registry._REGISTRY]
    rnd = registry.DRIVER_PRIORITY_ROUND
    all_names = list(registry._REGISTRY)
    never = [n for n in all_names if n not in set(pri)][:3]
    rows = {
        n: (rnd, dict(GREEN))
        for n in all_names
        if n not in set(never)
    }
    _fake_rows(monkeypatch, rows)
    names = list(registry.all_queries())
    assert names[: len(never)] == never
    assert set(names[: len(never)]) & set(pri) == set()


def test_red_leads_even_while_priority_list_is_active(monkeypatch):
    # rule 1 beats rule 2: a red name NOT in the list still fronts the
    # active list (and a red name IN the list isn't duplicated)
    registry._ensure_loaded()
    pri = [n for n in registry.DRIVER_PRIORITY if n in registry._REGISTRY]
    red_name = next(
        n for n in registry._REGISTRY if n not in set(pri)
    )
    old = registry.DRIVER_PRIORITY_ROUND - 1
    rows = {n: (old, dict(GREEN)) for n in registry._REGISTRY}
    rows[red_name] = (old, dict(RED))
    _fake_rows(monkeypatch, rows)
    names = list(registry.all_queries())
    assert names[0] == red_name
    assert names[1 : 1 + len(pri)] == pri
    assert len(names) == len(set(names))


def test_never_checked_sort_ahead_of_checked_behind_priority(monkeypatch):
    registry._ensure_loaded()
    pri = [n for n in registry.DRIVER_PRIORITY if n in registry._REGISTRY]
    old = registry.DRIVER_PRIORITY_ROUND - 1
    all_names = list(registry._REGISTRY)
    unchecked = [n for n in all_names if n not in set(pri)][:5]
    rows = {
        n: (old, dict(GREEN))
        for n in all_names
        if n not in set(unchecked)
    }
    _fake_rows(monkeypatch, rows)
    names = list(registry.all_queries())
    rest = [n for n in names if n not in set(pri)]
    never = [n for n in rest if n in set(unchecked)]
    checked = [n for n in rest if n not in set(unchecked)]
    # behind the manual list: the whole never-checked backlog, then
    # the already-checked remainder — no interleaving
    assert rest == never + checked


def test_current_window_contains_the_r08_reproof_targets():
    # the assertions against the REAL repo state round 8 depends on:
    # sim_topk_ivf and sim_topk_ivfpq must BOTH sit inside the driver's
    # first-50 window so they re-earn oracle-backed rows (their latest
    # rows predate the byte-exact oracles they gained in r06) — ivfpq
    # via DRIVER_PRIORITY, ivf via its r01-vintage LRC position. Also
    # text_boilerplate_fraction (shuffle key rewritten r08). Vacuous
    # (list spent, rotation moved on) once all three hold rows from
    # round >= 8.
    names = list(registry.all_queries())[:50]
    rows = registry._driver_rows()
    for target in (
        "sim_topk_ivf",
        "sim_topk_ivfpq",
        "text_boilerplate_fraction",
    ):
        rec = rows.get(target)
        if rec is None or rec[0] < 8:
            assert target in names, f"{target} missing from the r08 window"


def test_every_registered_query_is_windowable():
    # every registered name appears exactly once in the ordering
    names = list(registry.all_queries())
    assert len(names) == len(set(names))
    assert set(names) == set(registry._REGISTRY)


def test_priority_names_are_all_registered():
    registry._ensure_loaded()
    unknown = [n for n in registry.DRIVER_PRIORITY if n not in registry._REGISTRY]
    assert unknown == [], f"DRIVER_PRIORITY names not registered: {unknown}"


def test_driver_rows_survives_garbage_files(tmp_path, monkeypatch):
    import glob as _glob

    import kinesis2sse_spark.registry as reg

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        '{"q_a": {"hash_match": false}, "q_b": {"hash_match": true}}'
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text("not json at all")
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        '{"q_a": {"hash_match": true}}'
    )
    monkeypatch.setattr(
        _glob,
        "glob",
        lambda pat: [
            str(tmp_path / "CORRECTNESS_r01.json"),
            str(tmp_path / "CORRECTNESS_r02.json"),
            str(tmp_path / "CORRECTNESS_r03.json"),
        ],
    )
    rows = reg._driver_rows()
    assert set(rows) == {"q_a", "q_b"}
    # q_a's red r01 row is superseded by the green r03 row
    assert rows["q_a"] == (3, {"hash_match": True})
    assert rows["q_b"][0] == 1
    assert reg._checked_names() == {"q_a", "q_b"}


def test_checked_segment_cycles_least_recently_checked_first(monkeypatch):
    # airtight coverage (no reds, no never-checked, priority spent):
    # the window must front the STALEST rows, not the registration
    # prefix — a query last checked in an old round sorts ahead of one
    # checked in the latest round, regardless of registration order.
    registry._ensure_loaded()
    names = list(registry._REGISTRY)
    rnd = registry.DRIVER_PRIORITY_ROUND
    rows = {n: (rnd, dict(GREEN)) for n in names}
    # registered LAST, checked LONGEST ago — but never priority
    # members: handing one of those an old row would legitimately
    # re-activate the priority list (round-scoped spend rule) and
    # this test is about the LRC segment, not priority fronting
    pri = set(registry.DRIVER_PRIORITY)
    stale = [n for n in names if n not in pri][-3:]
    for n in stale:
        rows[n] = (rnd - 3, dict(GREEN))
    _fake_rows(monkeypatch, rows)
    ordered = list(registry.all_queries())
    assert ordered[:3] == stale
    # within the same round, registration order is preserved
    assert ordered[3:] == [n for n in names if n not in stale]


def test_coverage_header_counts_match_registry():
    """Doc-lint (r07 verdict item 4): COVERAGE.md's headline counts must
    match the live registry so they can never silently drift again. The
    header states '<N> registered queries (<M> DuckDB-oracle-checked'
    and names each rows-only query in backticks within the opening
    paragraph."""
    import os
    import re

    registry._ensure_loaded()
    n_reg = len(registry._REGISTRY)
    n_oracle = sum(1 for rq in registry._REGISTRY.values() if rq.oracle is not None)
    rows_only = sorted(
        n for n, rq in registry._REGISTRY.items() if rq.oracle is None
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "COVERAGE.md")) as f:
        head = f.read(2000)
    m = re.search(r"(\d+) registered queries \((\d+) DuckDB-oracle-checked", head)
    assert m, "COVERAGE.md headline count sentence missing or reworded"
    assert int(m.group(1)) == n_reg, (
        f"COVERAGE.md says {m.group(1)} registered, registry has {n_reg}"
    )
    assert int(m.group(2)) == n_oracle, (
        f"COVERAGE.md says {m.group(2)} oracle-checked, registry has {n_oracle}"
    )
    for name in rows_only:
        assert f"`{name}`" in head, (
            f"rows-only query {name} not named in COVERAGE.md header"
        )
