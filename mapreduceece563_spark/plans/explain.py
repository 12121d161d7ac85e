"""Physical-plan auditing helpers.

"Measure, don't guess": these helpers turn ``.explain`` output into
assertable facts — does the filter reach the parquet scan, did the
dimension join go broadcast, how much of the plan runs inside
whole-stage codegen. Tests pin the plan properties that matter at
100 TB so a refactor that silently regresses them fails CI.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanReport:
    pushed_filters: bool
    read_schema_cols: list[str]
    n_broadcast_joins: int
    n_sortmerge_joins: int
    n_exchanges: int
    codegen_stages: int

    def summary(self) -> str:
        return (
            f"pushed_filters={self.pushed_filters} "
            f"read_cols={len(self.read_schema_cols)} "
            f"broadcast={self.n_broadcast_joins} "
            f"sortmerge={self.n_sortmerge_joins} "
            f"exchanges={self.n_exchanges} "
            f"codegen_stages={self.codegen_stages}"
        )


def plan_report(df: DataFrame) -> PlanReport:
    formatted = plan_string(df, "formatted")
    simple = plan_string(df, "simple")
    read_cols: list[str] = []
    for line in formatted.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            schema = line.split("ReadSchema:", 1)[1].strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            if inner:
                read_cols.extend(
                    part.split(":", 1)[0] for part in inner.split(",")
                )
    return PlanReport(
        pushed_filters="PushedFilters: [" in formatted
        and "PushedFilters: []" not in formatted,
        read_schema_cols=read_cols,
        n_broadcast_joins=simple.count("BroadcastHashJoin"),
        n_sortmerge_joins=simple.count("SortMergeJoin"),
        n_exchanges=simple.count("Exchange"),
        codegen_stages=formatted.count("WholeStageCodegen"),
    )
