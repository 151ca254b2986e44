"""Driver-window self-rotation: DRIVER_PRIORITY always leads the
window (exempt from rotate-to-back, so fixed-red queries can re-earn a
driver row), and behind it every query with no CORRECTNESS row in any
past round sorts ahead of every already-checked one — so a round that
forgets to update DRIVER_PRIORITY still earns new driver evidence
instead of re-checking the same 50 forever.

These tests assert the ordering INVARIANT, not a frozen snapshot of a
particular round's window — the r04 verdict flagged the snapshot form
as self-breaking (it goes red the moment the next CORRECTNESS file
lands)."""

from __future__ import annotations

from kinesis2sse_spark import registry


def test_priority_entries_lead_the_window_in_manual_order():
    names = list(registry.all_queries())
    pri = [n for n in registry.DRIVER_PRIORITY if n in names]
    assert pri, "DRIVER_PRIORITY should name registered queries"
    # DRIVER_PRIORITY fronts the ordering verbatim, regardless of
    # which rounds have already checked its members
    assert names[: len(pri)] == pri


def test_priority_is_exempt_from_rotate_to_back(monkeypatch):
    # even when EVERY priority entry already has a driver row, the
    # manual list still leads — that is how a fixed-red query gets
    # re-proved instead of rotating behind a 50+ unchecked backlog
    fake_checked = registry._checked_names() | set(registry.DRIVER_PRIORITY)
    monkeypatch.setattr(registry, "_checked_names", lambda: fake_checked)
    names = list(registry.all_queries())
    pri = [n for n in registry.DRIVER_PRIORITY if n in names]
    assert names[: len(pri)] == pri


def test_never_checked_sort_ahead_of_checked_behind_priority(monkeypatch):
    fake_checked = registry._checked_names() | set(registry.DRIVER_PRIORITY)
    monkeypatch.setattr(registry, "_checked_names", lambda: fake_checked)
    names = list(registry.all_queries())
    pri = set(n for n in registry.DRIVER_PRIORITY if n in names)
    rest = [n for n in names if n not in pri]
    never = [n for n in rest if n not in fake_checked]
    checked = [n for n in rest if n in fake_checked]
    # behind the manual list: the whole never-checked backlog, then
    # the already-checked remainder — no interleaving
    assert rest == never + checked


def test_every_registered_query_is_windowable():
    # every registered name appears exactly once in the ordering
    names = list(registry.all_queries())
    assert len(names) == len(set(names))
    assert set(names) == set(registry._REGISTRY)


def test_priority_names_are_all_registered():
    registry._ensure_loaded()
    unknown = [n for n in registry.DRIVER_PRIORITY if n not in registry._REGISTRY]
    assert unknown == [], f"DRIVER_PRIORITY names not registered: {unknown}"


def test_checked_names_survives_garbage_files(tmp_path, monkeypatch):
    import glob as _glob

    import kinesis2sse_spark.registry as reg

    (tmp_path / "CORRECTNESS_r01.json").write_text('{"q_a": {}, "q_b": {}}')
    (tmp_path / "CORRECTNESS_r02.json").write_text("not json at all")
    monkeypatch.setattr(
        _glob,
        "glob",
        lambda pat: [
            str(tmp_path / "CORRECTNESS_r01.json"),
            str(tmp_path / "CORRECTNESS_r02.json"),
        ],
    )
    assert reg._checked_names() == {"q_a", "q_b"}


def test_driver_priority_names_all_registered():
    """Unregistered DRIVER_PRIORITY names are skipped by design (so a
    name can be listed before its code lands) — but at round end every
    entry must resolve, or a typo silently drops a must-check query
    from the driver window."""
    from kinesis2sse_spark.registry import DRIVER_PRIORITY, all_queries

    registered = set(all_queries())
    missing = [n for n in DRIVER_PRIORITY if n not in registered]
    assert not missing, missing
    # NOT asserted: window length or exact prefix — those encode a
    # per-round policy snapshot (the r04 rotation-test trap); this
    # test only fails at edit time, from code alone, never from a
    # driver-written file appearing on disk.
