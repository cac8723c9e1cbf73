"""Plan linting: the registry-wide hygiene gate as a user-facing API.

tests/test_plans.py:test_no_scale_antipatterns_anywhere sweeps every
registered query for the physical-plan shapes that do not survive a
100x scale-up; this module is that check factored out so USER pipelines
can gate on it too (CI, pre-deploy, notebook sanity check):

    from bigdata_storage_and_proccess_job_data_spark.plans import lint
    findings = lint.lint_plan(df)          # -> ["BroadcastNestedLoopJoin", ...]
    lint.assert_scalable(df)               # raises ScalePlanError with details

Checked shapes (executed plan, AQE-resolved):

- ``CartesianProduct``           -- all-pairs shuffle join, O(n x m)
- ``BroadcastNestedLoopJoin``    -- per-row loop over a broadcast side;
  legitimate ONLY when one side is provably tiny (a scalar frame, a
  bounded query set) -- pass ``allow_bnlj=True`` at such call sites
- ``BatchEvalPython``            -- row-at-a-time Python UDF in the hot
  path (Arrow paths -- ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
  -- are fine and NOT flagged)
- ``sourceless-plan``            -- the frame reads no source at all
  (LocalTableScan-only): either the result was eagerly materialized on
  the driver (so this lint inspected nothing) or the pipeline is
  driver-side; either way the real plan needs its own lint pass
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ALWAYS_BAD = ("CartesianProduct", "BatchEvalPython")


class ScalePlanError(AssertionError):
    """A DataFrame's physical plan contains a shape that will not
    survive scale-up; ``.findings`` carries the flagged shapes."""

    def __init__(self, findings: list[str], plan: str):
        self.findings = findings
        super().__init__(
            f"scale anti-patterns in plan: {findings}\n{plan[:2000]}"
        )


def plan_string(df: DataFrame) -> str:
    """Executed-plan text (the plan that actually runs, post-AQE
    resolution at this point in time)."""
    return df._jdf.queryExecution().executedPlan().toString()


def lint_plan(
    df: DataFrame,
    *,
    allow_bnlj: bool = False,
    require_source: bool = True,
) -> list[str]:
    """Return the scale anti-patterns present in ``df``'s executed plan
    (empty list = clean). See module docstring for the checked shapes."""
    plan = plan_string(df)
    findings = [b for b in ALWAYS_BAD if b in plan]
    if not allow_bnlj and "BroadcastNestedLoopJoin" in plan:
        findings.append("BroadcastNestedLoopJoin")
    if (
        require_source
        and "FileScan" not in plan
        and "ExistingRDD" not in plan
    ):
        findings.append("sourceless-plan")
    return findings


def assert_scalable(
    df: DataFrame,
    *,
    allow_bnlj: bool = False,
    require_source: bool = True,
) -> None:
    """Raise ScalePlanError if ``lint_plan`` flags anything."""
    findings = lint_plan(
        df, allow_bnlj=allow_bnlj, require_source=require_source
    )
    if findings:
        raise ScalePlanError(findings, plan_string(df))
