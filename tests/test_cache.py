"""Pin the private-cache-root hardening (polars_ad_etl_spark/cache.py).

Round-9 advice: derived-layout caches (JSONL twins, bucketed stores) lived
at fixed, predictable paths under the shared system temp dir — another
account could pre-create/poison them, and two concurrent runs raced
overwrite-vs-read. The contract pinned here: uid-keyed 0700 roots with
ownership verification, and atomic build-then-rename publication.
"""

from __future__ import annotations

import os
import stat

import pytest

from polars_ad_etl_spark.cache import private_cache_root, publish_dir


def test_root_is_uid_keyed_and_0700(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # force re-read of TMPDIR
    try:
        root = private_cache_root("spark_graft_test_cache")
        assert root.is_dir()
        assert f"uid{os.getuid()}" in root.name
        assert stat.S_IMODE(root.stat().st_mode) == 0o700
        # idempotent: second call reuses and re-tightens
        loosened = root
        os.chmod(loosened, 0o755)
        again = private_cache_root("spark_graft_test_cache")
        assert again == root
        assert stat.S_IMODE(again.stat().st_mode) == 0o700
    finally:
        tempfile.tempdir = None


def test_root_refuses_symlink(tmp_path, monkeypatch):
    """Round-10 advice (medium): a symlink planted at the predictable path
    must be refused outright — ``stat()``/``chmod()`` follow links, so the
    old ownership check could be redirected to a victim-owned target."""
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    try:
        target = tmp_path / "attacker_target"
        target.mkdir()  # owned by us, so the OLD follow-link check passed
        link = tmp_path / f"spark_graft_test_symlink_uid{os.getuid()}"
        link.symlink_to(target)
        with pytest.raises(RuntimeError, match="not a directory"):
            private_cache_root("spark_graft_test_symlink")
        # the attacker target was not chmod'd through the link
        assert stat.S_IMODE(target.stat().st_mode) != 0o700
    finally:
        tempfile.tempdir = None


def test_root_refuses_regular_file(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    try:
        f = tmp_path / f"spark_graft_test_file_uid{os.getuid()}"
        f.write_text("planted", encoding="utf-8")
        with pytest.raises(RuntimeError, match="not a directory"):
            private_cache_root("spark_graft_test_file")
    finally:
        tempfile.tempdir = None


def test_publish_dir_atomic_success(tmp_path):
    final = tmp_path / "layout"
    with publish_dir(final) as build:
        (build / "data.txt").write_text("payload", encoding="utf-8")
        assert not final.exists()  # nothing visible until publish
    assert (final / "data.txt").read_text(encoding="utf-8") == "payload"
    # no stray build dirs left behind
    assert [p.name for p in tmp_path.iterdir()] == ["layout"]


def test_publish_dir_error_publishes_nothing(tmp_path):
    final = tmp_path / "layout"
    with pytest.raises(RuntimeError):
        with publish_dir(final) as build:
            (build / "partial").write_text("x", encoding="utf-8")
            raise RuntimeError("builder failed")
    assert not final.exists()
    assert list(tmp_path.iterdir()) == []


def test_publish_dir_concurrent_winner_keeps_its_copy(tmp_path):
    final = tmp_path / "layout"
    with publish_dir(final) as build_a:
        (build_a / "v").write_text("a", encoding="utf-8")
        # a concurrent writer publishes first
        with publish_dir(final) as build_b:
            (build_b / "v").write_text("b", encoding="utf-8")
    # first publisher (b) won; the loser's equivalent build was discarded
    assert (final / "v").read_text(encoding="utf-8") == "b"
    assert [p.name for p in tmp_path.iterdir()] == ["layout"]
