"""Driver-window self-rotation: queries with no CORRECTNESS row in any
past round must sort into the driver's 50-query window automatically,
so a round that forgets to update DRIVER_PRIORITY still earns new
driver evidence instead of re-checking the same 50 forever."""

from __future__ import annotations

from kinesis2sse_spark import registry


def test_current_window_is_the_manual_priority_list():
    # every DRIVER_PRIORITY entry is registered and (as of r01-r03 rows
    # on disk) never-checked, so the manual order survives verbatim
    names = list(registry.all_queries())
    assert names[:50] == list(registry.DRIVER_PRIORITY)


def test_never_checked_flow_into_window_once_priority_is_stale(monkeypatch):
    fake_checked = registry._checked_names() | set(registry.DRIVER_PRIORITY)
    monkeypatch.setattr(registry, "_checked_names", lambda: fake_checked)
    names = list(registry.all_queries())
    never = [n for n in names if n not in fake_checked]
    assert never, "expected a never-checked backlog in this simulation"
    # ALL never-checked names front the ordering, ahead of every
    # already-checked one (manual list included)
    assert names[: len(never)] == never


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
