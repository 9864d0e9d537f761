"""FixDoc rule engine (reference parity: T1/T2).

The reference's cross-version document-fix registry
(/root/reference/pkg/es/doc_fix.go:16-84) keys callback transforms on
(source-version-range, target-version-range, actions) and applies them
per document during import/sync/sync_diff/compare. Re-expressed
Spark-first: each fix is a *vectorized column transform* over the
whole DataFrame (whole-stage codegen — no per-row callback), selected
by the same version-range + action predicate.

The one shipped fix, `fixDatetimeFormatDate` (doc_fix.go:86-108), pads
the fractional-seconds section of `yyyy-MM-dd HH:mm:ss:S...` values to
the format's width when moving ES5 docs to ES≥6: a 3-section value
gains `:0…0`, a 4+-section value gets section 3 left-zero-stripped,
cast to int, and re-padded — byte-identical semantics here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ------------------------------------------------- tiny version ranges


def _parse_version(v: str) -> tuple[int, ...]:
    return tuple(int(x) for x in v.strip().split("."))


def _cmp(a: tuple[int, ...], b: tuple[int, ...]) -> int:
    n = max(len(a), len(b))
    a = a + (0,) * (n - len(a))
    b = b + (0,) * (n - len(b))
    return (a > b) - (a < b)


class VersionRange:
    """Constraint set like ">= 5.0, < 6.0" (the go-version subset the
    reference registry uses)."""

    _OPS = {
        ">=": lambda c: c >= 0,
        "<=": lambda c: c <= 0,
        ">": lambda c: c > 0,
        "<": lambda c: c < 0,
        "=": lambda c: c == 0,
    }

    def __init__(self, spec: str):
        self.constraints = []
        for part in spec.split(","):
            part = part.strip()
            for op in (">=", "<=", ">", "<", "="):
                if part.startswith(op):
                    self.constraints.append((op, _parse_version(part[len(op):])))
                    break
            else:
                self.constraints.append(("=", _parse_version(part)))

    def check(self, version: str | None) -> bool:
        if version is None:
            return False
        v = _parse_version(version)
        return all(self._OPS[op](_cmp(v, ref)) for op, ref in self.constraints)


# --------------------------------------------------------- fix registry


@dataclass
class FixUnit:
    """(version ranges, actions) → vectorized DataFrame transform.

    `transform(df, ctx)` returns a new DataFrame; ctx carries per-task
    config (e.g. datetime_fields: {column: format})."""

    actions: list[str]
    transform: Callable[[DataFrame, dict], DataFrame]
    source_range: VersionRange | None = None
    target_range: VersionRange | None = None
    name: str = ""

    def matches(self, source_version: str | None, target_version: str | None,
                action: str) -> bool:
        if action not in self.actions:
            return False
        if self.source_range is not None and not self.source_range.check(source_version):
            return False
        if self.target_range is not None and not self.target_range.check(target_version):
            return False
        return True


def fix_datetime_format_col(col: Column, fmt: str) -> Column:
    """Vectorized twin of fixDatetimeFormatDate (doc_fix.go:86-108) for
    one column. `fmt` is the ES5 custom format, e.g.
    'yyyy-MM-dd HH:mm:ss:S' — section 3 (':'-split) defines the target
    fractional width. Formats WITHOUT a fractional section (e.g. plain
    'yyyy-MM-dd HH:mm:ss') have nothing to pad — no-op, mirroring the
    Go unit which only registers for fraction-bearing formats."""
    sections = fmt.split(":")
    if len(sections) < 4:
        return col
    width = len(sections[3])
    parts = F.split(col, ":")
    n = F.size(parts)
    frac = F.element_at(parts, 4)
    # TrimLeft(frac, "0") → cast.ToInt ("" ⇒ 0) → %0{width}d
    stripped = F.regexp_replace(frac, "^0+", "")
    frac_int = F.coalesce(
        F.nullif(stripped, F.lit("")).cast("long"), F.lit(0)
    )
    # printf semantics like Go's %0{w}d — pads but never truncates
    padded = F.format_string(f"%0{width}d", frac_int)
    head3 = F.concat_ws(":", F.slice(parts, 1, 3))
    tail = F.when(
        n > 4,
        F.concat(F.lit(":"), F.concat_ws(":", F.slice(parts, 5, 1_000_000))),
    ).otherwise(F.lit(""))
    return (
        F.when(col.isNull(), col)
        .when(n == 3, F.concat(col, F.lit(":"), F.lit("0" * width)))
        .when(n > 3, F.concat(head3, F.lit(":"), padded, tail))
        .otherwise(col)
    )


def _fix_datetime_format(df: DataFrame, ctx: dict) -> DataFrame:
    for col_name, fmt in (ctx.get("datetime_fields") or {}).items():
        if col_name in df.columns:
            df = df.withColumn(col_name, fix_datetime_format_col(F.col(col_name), fmt))
    return df


FIX_UNITS: list[FixUnit] = [
    FixUnit(
        name="fix_datetime_format_date",
        actions=["import", "sync", "sync_diff", "compare"],
        source_range=VersionRange(">= 5.0, < 6.0"),
        target_range=VersionRange(">= 6.0"),
        transform=_fix_datetime_format,
    ),
]


def fix_docs(
    df: DataFrame,
    *,
    source_version: str | None,
    target_version: str | None,
    action: str,
    ctx: dict | None = None,
    units: list[FixUnit] | None = None,
) -> DataFrame:
    """Apply every registered fix whose (version ranges, action) match —
    the FixDoc dispatch (doc_fix.go:57-84). Equal versions short-circuit
    to a no-op, as in the reference."""
    if source_version == target_version:
        return df
    for unit in units if units is not None else FIX_UNITS:
        if unit.matches(source_version, target_version, action):
            df = unit.transform(df, ctx or {})
    return df
