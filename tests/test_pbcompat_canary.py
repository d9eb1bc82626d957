"""Protobuf-drift canary for the transformWithStateInPandas (TWS) path.

``streaming/pbcompat.py`` + ``vendor/google/protobuf`` alias the public
protobuf runtime bundled with the host's Google Cloud SDK so Spark 4's
stateful streaming state-server client can import ``google.protobuf`` in a
container with no protobuf wheel. That aliasing was validated against ONE
exact combination — cloudsdk protobuf 4.23.2 + pyspark 4.1.2 — and a Spark
or SDK bump would break it *silently-weirdly* (wire-format or gencode
mismatch deep inside a streaming micro-batch). These tests pin the
assumption so drift fails loudly, by name, at test time.

On an environment with a REAL protobuf install the alias never activates
(and must not): the canary then asserts the genuine runtime satisfies
Spark's declared minimum instead.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pyspark

from polars_ad_etl_spark.streaming.pbcompat import ensure_protobuf

_REPO = Path(__file__).resolve().parents[1]
_VENDOR = _REPO / "vendor"

# The exact combination the TWS streaming suite was validated against.
# On drift: re-run tests/test_streaming*.py end-to-end, then move these
# pins to the new validated pair (see pbcompat module docstring).
VALIDATED_CLOUDSDK_PB_VERSION = "4.23.2"
VALIDATED_PYSPARK_VERSION = "4.1.2"
EXPECTED_SDK_ROOT = "/usr/lib/google-cloud-sdk/lib/third_party"


def test_protobuf_runtime_matches_validated_combination():
    assert ensure_protobuf(), (
        "no protobuf runtime found at all — the TWS streaming path is dead; "
        "install protobuf or restore the Google Cloud SDK runtime"
    )
    import google.protobuf as pb

    if pb.__name__ == "google.protobuf":
        # Real install: the alias correctly stayed out of the way. Spark 4
        # generates TWS gencode against protobuf >= 4.x wire behavior.
        major = int(pb.__version__.split(".")[0])
        assert major >= 4, (
            f"real protobuf {pb.__version__} predates the proto3 runtime "
            "Spark 4's TWS gencode expects (needs >= 4.x)"
        )
        return
    # Alias active: pin the exact validated origin + version so an SDK bump
    # (new protobuf vendored under cloudsdk) or a relocated SDK fails here
    # with a named cause instead of deep inside a streaming micro-batch.
    assert pb.__name__ == "cloudsdk.google.protobuf", (
        f"google.protobuf resolved to unexpected module {pb.__name__!r} — "
        "the vendor alias chain drifted; audit vendor/google/protobuf"
    )
    assert pb.__version__ == VALIDATED_CLOUDSDK_PB_VERSION, (
        f"cloudsdk protobuf is {pb.__version__}, but the TWS path was "
        f"validated against {VALIDATED_CLOUDSDK_PB_VERSION}. A Cloud SDK "
        "update changed the vendored runtime: re-run the streaming suite "
        "and update VALIDATED_CLOUDSDK_PB_VERSION if green."
    )
    root = os.environ.get("SPARK_GRAFT_PROTOBUF_ROOT") or EXPECTED_SDK_ROOT
    assert Path(pb.__file__).is_relative_to(root), (
        f"cloudsdk protobuf loaded from {pb.__file__}, outside the expected "
        f"root {root} — a second runtime copy is shadowing the validated one"
    )


def test_pyspark_version_is_the_validated_one():
    assert pyspark.__version__ == VALIDATED_PYSPARK_VERSION, (
        f"pyspark is {pyspark.__version__}, but the protobuf aliasing and "
        f"TWS protocol were validated against {VALIDATED_PYSPARK_VERSION}. "
        "Re-run tests/test_streaming*.py and update the pin if green."
    )


def test_tws_state_gencode_imports_through_the_alias():
    # The actual consumer: pyspark's generated state-server messages import
    # google.protobuf at module scope — this is the import a drift breaks.
    assert ensure_protobuf()
    from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401


def test_alias_defers_to_real_install_in_worker_path_order(tmp_path):
    """A worker exports the vendor dir via PYTHONPATH, which PRECEDES
    site-packages — so on a machine with a real protobuf wheel the vendor
    file wins the `google` namespace race and must hand over to the real
    package instead of shadowing it with cloudsdk. Simulated in a
    subprocess: vendor first on PYTHONPATH, a fake 'real install' second
    (standing in for site-packages order)."""
    site = tmp_path / "fakesite"
    (site / "google" / "protobuf").mkdir(parents=True)
    (site / "google" / "protobuf" / "__init__.py").write_text(
        "__version__ = '9.9.9-fake-real-install'\n"
    )
    code = textwrap.dedent(
        """
        import google.protobuf as pb
        print(pb.__name__, pb.__version__)
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env={**os.environ, "PYTHONPATH": f"{_VENDOR}:{site}"},
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert out.returncode == 0, out.stderr
    name, version = out.stdout.split()
    assert version == "9.9.9-fake-real-install", (
        "vendor alias shadowed a real google.protobuf install instead of "
        f"deferring to it (got {name} {version})"
    )


def test_alias_falls_back_to_cloudsdk_without_real_install():
    code = textwrap.dedent(
        """
        import google.protobuf as pb
        print(pb.__name__, pb.__version__)
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env={**os.environ, "PYTHONPATH": str(_VENDOR)},
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert out.returncode == 0, out.stderr
    name, version = out.stdout.split()
    assert name == "cloudsdk.google.protobuf"
    assert version == VALIDATED_CLOUDSDK_PB_VERSION
