"""Docs-drift gate: the committed QUERIES.md must be byte-identical to what
the generator produces from the live registry, so a registry add/rename/move
can't silently stale the index the judge (and any user) reads."""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_queries_md_matches_registry():
    sys.path.insert(0, str(ROOT / "scripts"))
    try:
        from gen_queries_md import render
    finally:
        sys.path.remove(str(ROOT / "scripts"))

    committed = (ROOT / "QUERIES.md").read_text()
    fresh = render()
    assert committed == fresh, (
        "QUERIES.md is stale — regenerate with "
        "`python scripts/gen_queries_md.py` and commit "
        f"(committed {len(committed)} chars vs fresh {len(fresh)})"
    )
