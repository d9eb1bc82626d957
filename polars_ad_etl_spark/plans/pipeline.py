"""The core engine: config-driven multi-source ETL as ONE lazy Catalyst plan.

Reproduces the reference's 6-stage dataflow — read -> capitalize ->
detect-source -> clean -> standardize -> union (reference
``multi_source_ad_etl.py``, chain used at ``scripts/apsl_internal.py:146-153``)
— with Spark-native execution:

- Each stage is a *plan transformation*, not a materialization. The reference
  eagerly materializes every stage per file (``self.dfs`` reassignment,
  ``multi_source_ad_etl.py:123,150,164,199``); here the whole pipeline is one
  logical plan per source file, merged by union, optimized once by Catalyst,
  and executed once at the sink. Column pruning therefore reaches the scans —
  strictly better than the reference's end-of-pipeline projection.
- Source tags ride driver-side as ``(tag, DataFrame)`` pairs instead of being
  read back out of the data (the reference does ``df["Source"][0]`` per file,
  ``multi_source_ad_etl.py:157,178`` — an action per file in Spark terms;
  SURVEY §2.12 flags this).
- Strict-cast data-quality gate via ANSI mode (reference relies on Polars'
  raise-on-bad-cast, ``multi_source_ad_etl.py:196``).

Scale notes (100 TB design): source detection is schema-based, so it needs
per-file *schemas*, never per-file data — for CSV we read only the header line
driver-side; files that detect to the same source are then globbed into a
single scan so Spark parallelizes over all of them. The per-file driver loop
is O(#files) metadata work only.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_ad_etl_spark.plans.config import PipelineConfig
from polars_ad_etl_spark.plans.schema import to_struct_type
from polars_ad_etl_spark.sources.tabular import read_tabular_dir


class SourceDetectionError(ValueError):
    """A file's column set matches no configured source fingerprint
    (reference ``multi_source_ad_etl.py:136``)."""


class StandardizeError(ValueError):
    """A detected source has no rename mapping at standardize time
    (reference ``multi_source_ad_etl.py:182-183``)."""


@dataclass
class TaggedFrame:
    """A DataFrame with its detected source tag (and origin path, for errors)."""

    source: str | None
    df: DataFrame
    path: str = "<memory>"


class MultiSourceAdETL:
    """Config-driven multi-source ETL engine (Spark-native).

    Same public stage chain as the reference
    (``scripts/apsl_internal.py:146-153``)::

        etl = MultiSourceAdETL(spark, config)
        out = (etl.read_tabular_files(raw_dir)
                  .capitalize_col_names()
                  .assign_source()
                  .clean_dataframes()
                  .standardize_dataframes()
                  .merge())          # -> one DataFrame (lazy)

    ``frames`` holds the per-file tagged plans between stages. Stages return
    ``self`` for chaining. Config validation happens in ``PipelineConfig``
    before any I/O (fail-fast, reference ``multi_source_ad_etl.py:35-38``).
    """

    def __init__(self, spark: SparkSession, config: PipelineConfig):
        self.spark = spark
        self.config = config
        self.frames: list[TaggedFrame] = []

    # ------------------------------------------------------------------ stages
    def read_tabular_files(self, raw_dir: str | Path) -> "MultiSourceAdETL":
        """Enumerate ``raw_dir``, dispatch on extension (.csv / .xlsx), error
        if nothing matched (reference ``multi_source_ad_etl.py:96-108``)."""
        self.frames = [
            TaggedFrame(None, df, path)
            for path, df in read_tabular_dir(self.spark, raw_dir)
        ]
        return self

    def with_frames(self, frames: list[tuple[str | None, DataFrame]]) -> "MultiSourceAdETL":
        """Inject in-memory frames (testing / non-file sources like Sheets)."""
        self.frames = [TaggedFrame(tag, df) for tag, df in frames]
        return self

    def read_tabular_files_grouped(self, raw_dir: str | Path) -> "MultiSourceAdETL":
        """Scale ingest (SURVEY §7.3-3): header-only source detection, then
        one distributed scan per (source, header) group — at 100k files the
        driver does O(#files) single-line reads and Spark does a handful of
        parallel scans, instead of 100k per-file inference passes. Frames
        arrive pre-tagged; ``assign_source`` keeps the tag and only adds the
        provenance column."""
        from polars_ad_etl_spark.sources.tabular import read_csv_dir_grouped

        def detect(cols: list[str]) -> str:
            # detection must see the names the fingerprints are declared on —
            # i.e. post-capitalize names when the pipeline capitalizes
            if self.config.capitalize:
                cols = [c.capitalize() for c in cols]
            return self._detect_source(cols)

        self.frames = [
            TaggedFrame(src, df, ";".join(paths))
            for src, paths, df in read_csv_dir_grouped(
                self.spark, raw_dir, detect
            )
        ]
        return self

    def capitalize_col_names(self) -> "MultiSourceAdETL":
        """Normalize header case: ``str.capitalize()`` per column — first char
        upper, rest lower (reference ``multi_source_ad_etl.py:110-124``)."""
        self.frames = [
            TaggedFrame(f.source, f.df.toDF(*[c.capitalize() for c in f.df.columns]), f.path)
            for f in self.frames
        ]
        return self

    def _detect_source(self, columns: list[str]) -> str:
        """First source (config insertion order) whose fingerprint column set
        is a subset of the file's columns wins; unknown raises (reference
        ``multi_source_ad_etl.py:126-136``)."""
        colset = set(columns)
        for source, fingerprint in self.config.source_config.items():
            if set(fingerprint) <= colset:
                return source
        raise SourceDetectionError(
            f"no configured source matches columns {sorted(colset)}"
        )

    def assign_source(self) -> "MultiSourceAdETL":
        """Detect each frame's source from its schema (driver-side, no data
        read) and add the provenance column, reordered first (reference
        ``multi_source_ad_etl.py:138-151``)."""
        out = []
        for f in self.frames:
            src = f.source if f.source is not None else self._detect_source(
                f.df.columns
            )
            tagged = f.df.select(
                F.lit(src).alias(self.config.source_column), "*"
            )
            out.append(TaggedFrame(src, tagged, f.path))
        self.frames = out
        return self

    def clean_dataframes(self) -> "MultiSourceAdETL":
        """Apply each source's cleaner chain in order via ``df.transform``
        (reference ``multi_source_ad_etl.py:153-168``; fn-or-list normalization
        happens in PipelineConfig)."""
        out = []
        for f in self.frames:
            df = f.df
            for fn in self.config.cleaners.get(f.source, []):
                df = df.transform(fn)
            out.append(TaggedFrame(f.source, df, f.path))
        self.frames = out
        return self

    def standardize_dataframes(self, mode: str = "strict") -> "MultiSourceAdETL":
        """rename -> add missing columns as typed nulls -> project to schema
        order -> cast to declared types (reference
        ``multi_source_ad_etl.py:170-200``).

        Two strictness modes (SURVEY §1.4):

        - ``"strict"`` (default): plain ``cast`` under the ANSI session — a
          bad value raises at action time, the Spark equivalent of Polars'
          raise-on-bad-cast (reference ``multi_source_ad_etl.py:196``).
        - ``"audit"``: ``try_cast`` — bad values become nulls instead of
          failing the job, and ``cast_audit()`` returns the per-source,
          per-column count of rows where the raw value was non-null but the
          cast nulled it. The production pattern for quarantining a bad
          drop without losing the night's run.
        - ``"quarantine"``: rows whose every cast succeeds flow on (cast
          applied); rows with any failing cast are diverted — ``quarantine()``
          returns them with their source, path, failing column names, and the
          raw row as JSON (union-safe across files whose pre-cast types
          differ). Row-level split, vs audit's column-level counts.
        """
        if mode not in ("strict", "audit", "quarantine"):
            raise ValueError(f"unknown cast mode {mode!r}")
        schema = self.config.standard_schema
        src_col = self.config.source_column
        out = []
        self._audits = []
        self._quarantines = []
        for f in self.frames:
            if f.source not in self.config.rename_config:
                raise StandardizeError(
                    f"no rename mapping for detected source {f.source!r} ({f.path})"
                )
            mapping = self.config.rename_config[f.source]
            df = f.df.withColumnsRenamed(mapping)
            missing = {
                name: F.lit(None).cast(dtype)
                for name, dtype in schema.items()
                if name not in df.columns and name != src_col
            }
            if missing:
                df = df.withColumns(missing)
            if mode == "audit":
                self._audits.append(
                    (
                        f.source,
                        f.path,
                        df.agg(
                            *[
                                F.sum(
                                    (
                                        F.col(name).isNotNull()
                                        & F.col(name).try_cast(dtype).isNull()
                                    ).cast("long")
                                ).alias(name)
                                for name, dtype in schema.items()
                                if name != src_col
                            ]
                        ),
                    )
                )
                cast = lambda c, t: c.try_cast(t)  # noqa: E731
            elif mode == "quarantine":
                data_cols = [
                    (name, dtype)
                    for name, dtype in schema.items()
                    if name != src_col
                ]
                bad_names = F.array_compact(
                    F.array(
                        *[
                            F.when(
                                F.col(name).isNotNull()
                                & F.col(name).try_cast(dtype).isNull(),
                                F.lit(name),
                            )
                            for name, dtype in data_cols
                        ]
                    )
                )
                flagged = df.withColumn("_bad_cols", bad_names)
                self._quarantines.append(
                    flagged.filter(F.size("_bad_cols") > 0).select(
                        F.lit(f.source).alias("source"),
                        F.lit(str(f.path)).alias("path"),
                        F.col("_bad_cols").alias("bad_columns"),
                        F.to_json(F.struct(*[n for n, _ in data_cols])).alias(
                            "raw_row"
                        ),
                    )
                )
                df = flagged.filter(F.size("_bad_cols") == 0).drop("_bad_cols")
                cast = lambda c, t: c.try_cast(t)  # noqa: E731
            else:
                cast = lambda c, t: c.cast(t)  # noqa: E731
            df = df.select(
                *[cast(F.col(name), dtype).alias(name) for name, dtype in schema.items()]
            )
            out.append(TaggedFrame(f.source, df, f.path))
        self.frames = out
        return self

    def cast_audit(self) -> DataFrame:
        """Audit-mode report: one row per (source, path, column) with the
        count of values the cast nulled out. Each per-file aggregate is one
        row wide; the unpivot to rows is a literal ``stack`` — no extra
        shuffle beyond the count aggregates themselves."""
        if not getattr(self, "_audits", None):
            raise ValueError(
                "no audit data — run standardize_dataframes(mode='audit') first"
            )
        cols = [
            name
            for name in self.config.standard_schema
            if name != self.config.source_column
        ]
        stack_args = ", ".join(f"'{c}', `{c}`" for c in cols)
        parts = [
            agg.select(
                F.lit(source).alias("source"),
                F.lit(path).alias("path"),
                F.expr(
                    f"stack({len(cols)}, {stack_args}) AS (column, n_failed)"
                ),
            )
            for source, path, agg in self._audits
        ]
        return functools.reduce(lambda a, b: a.unionByName(b), parts)

    def quarantine(self) -> DataFrame:
        """Quarantine-mode report: one row per diverted input row with
        (source, path, bad_columns, raw_row-as-JSON). Lazy union; each file's
        branch shares its scan with the good-row branch until the sink. The
        JSON raw_row keeps the union schema-stable even when pre-cast column
        types differ between files."""
        if not getattr(self, "_quarantines", None):
            raise ValueError(
                "no quarantine data — run "
                "standardize_dataframes(mode='quarantine') first"
            )
        return functools.reduce(
            lambda a, b: a.unionByName(b), self._quarantines
        )

    def merge(self) -> DataFrame:
        """n-ary vertical union of the standardized frames — all must share
        the exact standard schema, which standardize guarantees (reference
        ``merge_and_collect``, ``multi_source_ad_etl.py:202-205``). Lazy: this
        returns the unexecuted union plan."""
        if not self.frames:
            raise ValueError("no frames to merge — run read stages first")
        dfs = [f.df for f in self.frames]
        return functools.reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=False), dfs
        )

    # Reference-compatible alias (its `merge_and_collect` is an eager concat;
    # ours stays lazy — the driver/sink triggers execution).
    merge_and_collect = merge

    # ---------------------------------------------------------------- helpers
    def run(self, raw_dir: str | Path, cast_mode: str = "strict") -> DataFrame:
        """The full default chain in one call."""
        self.read_tabular_files(raw_dir)
        if self.config.capitalize:
            self.capitalize_col_names()
        return (
            self.assign_source()
            .clean_dataframes()
            .standardize_dataframes(mode=cast_mode)
            .merge()
        )

    @property
    def struct_type(self):
        return to_struct_type(self.config.standard_schema)
