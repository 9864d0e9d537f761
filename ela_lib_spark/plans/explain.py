"""Plan-inspection helpers — used by tests to assert that filters push
down to the parquet scan and joins broadcast where expected."""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def find_in_plan(df: DataFrame, needle: str, mode: str = "formatted") -> bool:
    return needle in explain_str(df, mode)
