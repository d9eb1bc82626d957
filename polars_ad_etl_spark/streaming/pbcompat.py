"""Protobuf availability for the Spark-4 stateful streaming path.

``transformWithStateInPandas`` needs the ``google.protobuf`` runtime in the
driver AND in every Python worker (the state-server client lives in the
worker). This module declares that dependency in one place:

- real installation present -> nothing to do (workers share site-packages);
- otherwise fall back to the repo's ``vendor/`` alias package (see
  ``vendor/google/protobuf/__init__.py``), which resolves the public
  protobuf runtime bundled with the host's Google Cloud SDK. The vendor dir
  must be on PYTHONPATH *before the JVM starts* so spawned workers inherit
  it — call :func:`ensure_protobuf` before building the SparkSession
  (tests/conftest.py does this at import time).

Returns False when neither source exists; callers gate the TWS execution
path on it (plan construction never needs protobuf).

Validated combination (pinned by tests/test_pbcompat_canary.py): cloudsdk
protobuf runtime 4.23.2 under /usr/lib/google-cloud-sdk against pyspark
4.1.2's TWS state-server gencode. On a Spark or protobuf bump, re-run the
streaming suite and move the canary's pins to the new validated pair —
the canary exists to turn a silent drift into a named failure.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_VENDOR = Path(__file__).resolve().parents[2] / "vendor"


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable here and in Spark workers.

    Idempotent and cheap; safe to call before every session build."""
    if not _try_import():
        if not (_VENDOR / "google" / "protobuf" / "__init__.py").is_file():
            return False
        v = str(_VENDOR)
        if v not in sys.path:
            sys.path.append(v)
        if not _try_import():
            return False
    mod = sys.modules["google.protobuf"]
    # vendor package replaces itself with the cloudsdk module — detect by
    # name: a real installation is named 'google.protobuf'
    if mod.__name__.startswith("cloudsdk.") and not _exported():
        existing = os.environ.get("PYTHONPATH", "")
        v = str(_VENDOR)
        # APPEND so other PYTHONPATH entries keep their precedence over the
        # vendor dir. NOTE (round-9 correction): position here does NOT
        # decide between the vendor alias and a worker's real site-packages
        # protobuf — PYTHONPATH entries always precede site-packages in a
        # worker's sys.path, so the alias wins the `google` namespace race
        # regardless. What keeps a real install authoritative is the
        # alias's own `_defer_to_real_install` scan (vendor/google/
        # protobuf/__init__.py): when the vendor file executes first, it
        # looks for a genuine google/protobuf elsewhere on sys.path and
        # hands over before loading the cloudsdk runtime.
        os.environ["PYTHONPATH"] = f"{existing}:{v}" if existing else v
    return True


def _try_import() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _exported() -> bool:
    return str(_VENDOR) in os.environ.get("PYTHONPATH", "").split(":")
