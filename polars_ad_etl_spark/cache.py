"""Private on-disk cache roots for derived layouts (bucketed stores, JSONL
twins, ANN indexes).

Derived layouts live under the system temp dir so a driver running from an
arbitrary cwd never grows state there — but a shared temp dir is a
multi-user surface (round-9 advice): a fixed, predictable path can be
pre-created or poisoned by another account, and two concurrent runs can
race overwrite-vs-read on the same directory. Two mitigations, both here so
every cache root has exactly one hardening path:

- :func:`private_cache_root` keys the root by uid and creates it ``0700``;
  if the path already exists but is owned by someone else (pre-created by
  another account before our first run), it raises instead of silently
  reading attacker-controlled layout data.
- :func:`publish_dir` gives writers an atomic publish: build the payload in
  a unique sibling temp dir, then ``rename`` into the final path. Rename is
  atomic on POSIX, so a reader never observes a half-written layout, and
  when two concurrent writers race, exactly one rename wins — the loser
  discards its build (contents are deterministic by construction: cache
  keys embed source path + mtime, so both builds are byte-equivalent).
"""

from __future__ import annotations

import os
import shutil
import stat
import tempfile
import uuid
from contextlib import contextmanager
from pathlib import Path


def private_cache_root(name: str) -> Path:
    """The uid-keyed, 0700 cache root for ``name``. Creation is
    create-or-verify: a pre-existing entry must be a REAL directory (not a
    symlink — ``stat()``/``chmod()`` follow links, so a symlink planted at
    the predictable path would redirect the ownership check and every cache
    IO to an attacker-chosen target; round-10 advice, medium) owned by the
    current uid, and is re-tightened to 0700 via a directory fd so the
    check and the chmod bind to the same inode."""
    uid = os.getuid() if hasattr(os, "getuid") else 0
    root = Path(tempfile.gettempdir()) / f"{name}_uid{uid}"
    try:
        root.mkdir(mode=0o700)
    except FileExistsError:
        lst = os.lstat(root)
        if not stat.S_ISDIR(lst.st_mode):
            raise RuntimeError(
                f"cache root {root} exists but is not a directory"
                " (symlink or file planted at the predictable path) —"
                " refusing to follow it"
            )
        # Open the directory itself with O_NOFOLLOW so ownership check and
        # permission tightening are against this inode, not a racy path
        # re-resolution. The fd-based path needs O_DIRECTORY (opening a
        # directory without it fails outright on Windows — round-11
        # advice, low), so it is capability-gated: platforms without
        # O_DIRECTORY use the lstat result (already symlink-proof above)
        # plus the plain chmod.
        if hasattr(os, "O_DIRECTORY"):
            flags = os.O_RDONLY | os.O_DIRECTORY | getattr(os, "O_NOFOLLOW", 0)
            fd = os.open(root, flags)
            try:
                st = os.fstat(fd)
                if hasattr(os, "getuid") and st.st_uid != uid:
                    raise RuntimeError(
                        f"cache root {root} exists but is owned by uid"
                        f" {st.st_uid}, not {uid} — refusing to reuse a"
                        " directory another account controls"
                    )
                if hasattr(os, "fchmod"):
                    os.fchmod(fd, 0o700)
                else:  # pragma: no cover - O_DIRECTORY without fchmod
                    os.chmod(root, 0o700)
            finally:
                os.close(fd)
        else:  # pragma: no cover - non-POSIX fallback (no dir fds)
            if hasattr(os, "getuid") and lst.st_uid != uid:
                raise RuntimeError(
                    f"cache root {root} exists but is owned by uid"
                    f" {lst.st_uid}, not {uid} — refusing to reuse a"
                    " directory another account controls"
                )
            os.chmod(root, 0o700)
    return root


@contextmanager
def publish_dir(final: Path):
    """Atomic directory publish: yields a unique build dir; on clean exit
    renames it to ``final``. If ``final`` appeared concurrently (another
    writer won the race) the build is discarded — cache contents are
    deterministic per key, so the winner's copy is equivalent. On error the
    partial build is removed and nothing is published."""
    tmp = final.parent / f".build-{final.name}-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    tmp.mkdir(parents=True)
    try:
        yield tmp
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    try:
        tmp.rename(final)
    except OSError:
        if final.exists():  # concurrent writer won; equivalent content
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise
