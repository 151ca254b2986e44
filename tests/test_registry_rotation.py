"""Driver-window self-rotation: while DRIVER_PRIORITY contains an
unchecked name the whole list leads the window (exempt from
rotate-to-back, so fixed-red queries can re-earn a driver row in the
round that listed them); once EVERY listed name has a driver row the
list is SPENT and never-checked-first rotation takes over — so a round
that forgets to update DRIVER_PRIORITY still earns new driver evidence
instead of re-checking the same 50 forever.

These tests assert the ordering INVARIANT, not a frozen snapshot of a
particular round's window — the r04 verdict flagged the snapshot form
as self-breaking (it goes red the moment the next CORRECTNESS file
lands)."""

from __future__ import annotations

from kinesis2sse_spark import registry


def test_priority_entries_lead_the_window_in_manual_order():
    # as long as at least one listed name is unchecked, DRIVER_PRIORITY
    # fronts the ordering verbatim (true in the working tree until the
    # r05 CORRECTNESS file lands; the monkeypatched variants below pin
    # both sides of the spent transition)
    registry._ensure_loaded()
    pri = [n for n in registry.DRIVER_PRIORITY if n in registry._REGISTRY]
    assert pri, "DRIVER_PRIORITY should name registered queries"
    checked = registry._checked_names()
    if all(n in checked for n in pri):
        return  # list already spent on this checkout — covered below
    names = list(registry.all_queries())
    assert names[: len(pri)] == pri


def test_priority_is_exempt_from_rotate_to_back_while_active(monkeypatch):
    # with at least ONE listed name unchecked, the whole manual list
    # still leads even though most members have rows — that is how a
    # fixed-red query gets re-proved instead of rotating behind a 50+
    # unchecked backlog
    registry._ensure_loaded()
    pri = [n for n in registry.DRIVER_PRIORITY if n in registry._REGISTRY]
    fake_checked = (registry._checked_names() | set(pri)) - {pri[-1]}
    monkeypatch.setattr(registry, "_checked_names", lambda: fake_checked)
    names = list(registry.all_queries())
    assert names[: len(pri)] == pri


def test_spent_priority_hands_over_to_never_checked(monkeypatch):
    # once EVERY listed name has a driver row (the list's round has
    # run), the list stops fronting: the never-checked backlog leads
    # and the formerly-pinned names rotate to the back with the rest
    # of the checked registry — no between-rounds edit required
    registry._ensure_loaded()
    pri = set(n for n in registry.DRIVER_PRIORITY if n in registry._REGISTRY)
    fake_checked = registry._checked_names() | pri
    monkeypatch.setattr(registry, "_checked_names", lambda: fake_checked)
    names = list(registry.all_queries())
    never = [n for n in names if n not in fake_checked]
    assert never, "test needs at least one never-checked query"
    assert names[: len(never)] == never
    assert set(names[: len(never)]) & pri == set()


def test_never_checked_sort_ahead_of_checked_behind_priority(monkeypatch):
    registry._ensure_loaded()
    pri_list = [n for n in registry.DRIVER_PRIORITY if n in registry._REGISTRY]
    # keep the list ACTIVE (one unchecked member) so it still fronts
    fake_checked = (registry._checked_names() | set(pri_list)) - {pri_list[0]}
    monkeypatch.setattr(registry, "_checked_names", lambda: fake_checked)
    names = list(registry.all_queries())
    rest = [n for n in names if n not in set(pri_list)]
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
