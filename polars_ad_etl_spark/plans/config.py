"""Pipeline configuration + fail-fast validation.

The reference engine is driven entirely by per-pipeline config dicts and
validates them at construction time, before any I/O (reference
``multi_source_ad_etl.py:35-94``). We reproduce the same four checks with the
same semantics:

1. detectable sources and rename mappings must cover each other
   (``multi_source_ad_etl.py:40-52``);
2. no fingerprint column may be claimed by two sources (``:54-68``);
3. every rename target must exist in the standard schema (``:70-82``);
4. cleaner keys must be a subset of detectable sources (``:84-94``).

Cleaner values may be a single ``df -> df`` callable or a list of them; they
are normalized to lists at construction (``multi_source_ad_etl.py:24-33``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

Cleaner = Callable[[DataFrame], DataFrame]


class ConfigError(ValueError):
    """Raised for any invalid pipeline configuration (before any I/O)."""


@dataclass
class PipelineConfig:
    """Everything that distinguishes one ad-ETL pipeline from another.

    Attributes:
        rename_config: per-source ``{raw_column: standard_column}`` maps.
        standard_schema: ordered ``{standard_column: DataType}`` target schema;
            dict order == output column order.
        source_config: per-source fingerprint column lists — a file belongs to
            the first source (dict insertion order) whose fingerprint set is a
            subset of the file's columns.
        cleaner_config: per-source cleaner fn or list of fns, applied in order.
        capitalize: whether headers are case-normalized before detection
            (``str.capitalize`` per column) — on for apsl/like_eat pipelines,
            off for manaboo/podl (SURVEY §3.2).
        source_column: name of the provenance column added at detection.
    """

    rename_config: dict[str, dict[str, str]]
    standard_schema: dict[str, T.DataType]
    source_config: dict[str, list[str]]
    cleaner_config: dict[str, Any] = field(default_factory=dict)
    capitalize: bool = True
    source_column: str = "Source"

    # normalized at construction
    cleaners: dict[str, list[Cleaner]] = field(init=False, default_factory=dict)

    def __post_init__(self) -> None:
        self.cleaners = {
            src: list(fns) if isinstance(fns, (list, tuple)) else [fns]
            for src, fns in self.cleaner_config.items()
        }
        self.validate()

    # ------------------------------------------------------------------ checks
    def validate(self) -> None:
        self._check_sources_have_mappings()
        self._check_fingerprints_disjoint()
        self._check_rename_targets_in_schema()
        self._check_cleaner_keys()

    def _check_sources_have_mappings(self) -> None:
        """Detectable sources and rename maps must cover each other
        (reference ``multi_source_ad_etl.py:40-52``)."""
        detectable = set(self.source_config)
        mapped = set(self.rename_config)
        if detectable - mapped:
            raise ConfigError(
                f"sources without a rename mapping: {sorted(detectable - mapped)}"
            )
        if mapped - detectable:
            raise ConfigError(
                f"rename mappings for undetectable sources: {sorted(mapped - detectable)}"
            )

    def _check_fingerprints_disjoint(self) -> None:
        """No fingerprint column claimed by two sources
        (reference ``multi_source_ad_etl.py:54-68``)."""
        claimed: dict[str, str] = {}
        for src, cols in self.source_config.items():
            for col in cols:
                if col in claimed:
                    raise ConfigError(
                        f"fingerprint column {col!r} claimed by both "
                        f"{claimed[col]!r} and {src!r}"
                    )
                claimed[col] = src

    def _check_rename_targets_in_schema(self) -> None:
        """Every rename target must be a standard-schema column
        (reference ``multi_source_ad_etl.py:70-82``)."""
        for src, mapping in self.rename_config.items():
            unknown = set(mapping.values()) - set(self.standard_schema)
            if unknown:
                raise ConfigError(
                    f"source {src!r} renames to columns missing from the "
                    f"standard schema: {sorted(unknown)}"
                )

    def _check_cleaner_keys(self) -> None:
        """Cleaner keys must be a subset of detectable sources
        (reference ``multi_source_ad_etl.py:84-94``)."""
        unknown = set(self.cleaner_config) - set(self.source_config)
        if unknown:
            raise ConfigError(
                f"cleaners registered for undetectable sources: {sorted(unknown)}"
            )
