"""Unit tests for bench.py's host-side plumbing (no device required).

The driver runs ``python bench.py`` at the end of every round; its
degraded/cached paths must never crash on a malformed or partial stamp —
a crash there replaces the round's perf artifact with nothing.
"""
import json

import bench


def test_cached_train_tolerates_null_commit(tmp_path, monkeypatch):
    """A stamp measured in a git-less tree carries measured_at_commit=null;
    replaying it must degrade to stale=True, not IndexError."""
    stamp = {
        "detail": {
            "train": {
                "sec_per_step": 0.5,
                "steps_per_sec": 2.0,
                "measured_at_commit": None,
            }
        }
    }
    p = tmp_path / "BENCH_LAST.json"
    p.write_text(json.dumps(stamp))
    monkeypatch.setattr(bench, "LAST_STAMP", p)
    out = bench._cached_train()
    assert out["stale"] is True  # unknown provenance is stale, never fresh
    assert out["steps_per_sec"] == 2.0


def test_cached_train_fresh_when_commit_is_head(tmp_path, monkeypatch):
    """A stamp at the current HEAD with no train-path diffs replays fresh."""
    head = bench._git_head()
    if head is None:
        import pytest

        pytest.skip("no git here")
    stamp = {
        "detail": {
            "train": {
                "sec_per_step": 0.5,
                "steps_per_sec": 2.0,
                "measured_at_commit": head,
            }
        }
    }
    p = tmp_path / "BENCH_LAST.json"
    p.write_text(json.dumps(stamp))
    monkeypatch.setattr(bench, "LAST_STAMP", p)
    out = bench._cached_train()
    # stale iff a train-path source actually changed vs the worktree; with
    # possibly-dirty test worktrees we only pin the no-crash + honest flag
    assert out["stale"] in (True, False)
    changed = bench._train_paths_changed_since(head)
    if changed is not None:
        assert out["stale"] is changed


def test_cached_train_missing_stamp_flags_constants(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "LAST_STAMP", tmp_path / "nope.json")
    out = bench._cached_train()
    assert out["stale"] is True
    assert "no stamped measurement" in out["note"]
