"""Plan auditing: the scale-design lint as a LIBRARY, not just a test.

`tests/test_plan_quality.py` pins specific queries' plans; this module
exposes the same checks for any DataFrame so a pipeline can self-audit
before an expensive run (CI gate, pre-deploy check, notebook `explain`
sidekick). The properties checked are exactly the ones that decide whether
a plan survives a 100× scale-up:

- single-partition global sorts (empty-partitionBy windows),
- nested-loop / cartesian joins,
- row-at-a-time Python evaluation in the JVM path,
- shuffle (Exchange) counts,
- scans without pushed filters when a predicate exists.

Usage::

    from polars_ad_etl_spark.plans.audit import plan_report, assert_scalable
    report = plan_report(df)            # structured dict
    assert_scalable(df)                 # raises PlanQualityError with details
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


class PlanQualityError(AssertionError):
    """A plan violates a scale-design rule; message lists every finding."""


def formatted_plan(df: DataFrame) -> str:
    """Spark's formatted explain output, as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def global_window_specs(plan: str) -> list[str]:
    """All ``windowspecdefinition(...)`` first arguments that are sort items
    (contain ASC/DESC) — i.e. windows with an EMPTY partition clause, which
    Spark executes as a single-partition global sort of their input."""
    out = []
    i = 0
    while True:
        j = plan.find("windowspecdefinition(", i)
        if j < 0:
            break
        k = j + len("windowspecdefinition(")
        depth = 0
        arg = []
        while k < len(plan):
            c = plan[k]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
            elif c == "," and depth == 0:
                break
            arg.append(c)
            k += 1
        first = "".join(arg)
        if " ASC" in first or " DESC" in first:
            out.append(first.strip())
        i = j + 1
    return out


@dataclass
class PlanReport:
    n_exchanges: int
    n_scans: int
    global_windows: list[str] = field(default_factory=list)
    nested_loop_joins: bool = False
    cartesian_products: bool = False
    python_row_eval: bool = False
    arrow_python_nodes: bool = False
    broadcast_joins: bool = False
    sort_merge_joins: bool = False
    take_ordered_topk: bool = False

    def findings(
        self, allow_global_window_prefixes: tuple[str, ...] = ()
    ) -> list[str]:
        out = []
        bad_windows = [
            w
            for w in self.global_windows
            if not any(w.startswith(p) for p in allow_global_window_prefixes)
        ]
        if bad_windows:
            out.append(
                "empty-partitionBy window (single-partition global sort): "
                + "; ".join(bad_windows)
            )
        if self.cartesian_products:
            out.append("CartesianProduct join (O(n*m) at scale)")
        if self.nested_loop_joins:
            out.append(
                "BroadcastNestedLoopJoin (every probe row scans the "
                "broadcast side; fine only for 1-row scalars)"
            )
        if self.python_row_eval:
            out.append("BatchEvalPython (row-at-a-time Python in the plan)")
        return out


def plan_report(df: DataFrame) -> PlanReport:
    """Structured scale-design report over the optimized physical plan.
    Counts come from the tree section only (the detail section repeats
    every node)."""
    plan = formatted_plan(df)
    tree = plan.split("\n\n")[0]
    return PlanReport(
        n_exchanges=tree.count("Exchange"),
        n_scans=tree.count("Scan "),
        global_windows=global_window_specs(plan),
        nested_loop_joins="BroadcastNestedLoopJoin" in tree,
        cartesian_products="CartesianProduct" in tree,
        python_row_eval="BatchEvalPython" in plan,
        arrow_python_nodes="ArrowEvalPython" in plan or "MapInPandas" in plan,
        broadcast_joins="BroadcastHashJoin" in tree,
        sort_merge_joins="SortMergeJoin" in tree,
        take_ordered_topk="TakeOrderedAndProject" in tree,
    )


def assert_scalable(
    df: DataFrame,
    allow_global_window_prefixes: tuple[str, ...] = (),
    allow_nested_loop: bool = False,
) -> PlanReport:
    """Raise :class:`PlanQualityError` listing every scale-design violation
    in ``df``'s plan; return the report when clean. Nested-loop joins can
    be allowed explicitly for the broadcast-1-row-scalar pattern."""
    report = plan_report(df)
    findings = report.findings(allow_global_window_prefixes)
    if allow_nested_loop:
        findings = [f for f in findings if "NestedLoop" not in f]
    if findings:
        raise PlanQualityError(
            "plan fails scale-design audit:\n- " + "\n- ".join(findings)
        )
    return report
