"""ES query-DSL subset → Catalyst Column predicates.

The reference treats the user's query JSON as opaque and pushes it into
every ES scan (/root/reference/pkg/es/es5.go:113-114, merged with id
filters at service/task/migrator.go:649-671). Our engine internalizes
the DSL subset its configs exercise (`terms` on _id —
/root/reference/config.yaml:93 — plus the standard search shapes) and
compiles it to declarative filters, so Catalyst pushes them into the
parquet/Iceberg scan (PushedFilters) instead of an opaque remote query.

Supported: match_all, term, terms, ids, exists, range
(gt/gte/lt/lte), match (analyzed OR over tokens), bool
(must/filter/should/must_not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ela_lib_spark.functions.text import tokenize_col

ID_FIELD = "_id"  # ES meta-field; maps to our primary key column


from ela_lib_spark.errors import EngineError


class DslError(EngineError, ValueError):
    """Unknown/invalid query-DSL clause (O9 typed error taxonomy)."""


def _field(name: str, key_col: str) -> Column:
    return F.col(key_col if name == ID_FIELD else name)


def dsl_to_column(query: dict, key_col: str = "url", text_cols: tuple = ("text",)) -> Column:
    if not isinstance(query, dict) or len(query) != 1:
        raise DslError(f"query must have exactly one top-level clause: {query!r}")
    (kind, body), = query.items()
    if kind == "match_all":
        return F.lit(True)
    if kind == "term":
        (f, v), = body.items()
        if isinstance(v, dict):
            v = v["value"]
        return _field(f, key_col) == F.lit(v)
    if kind == "terms":
        (f, vals), = body.items()
        return _field(f, key_col).isin(list(vals))
    if kind == "ids":
        return F.col(key_col).isin(list(body["values"]))
    if kind == "exists":
        return F.col(body["field"]).isNotNull()
    if kind == "range":
        (f, spec), = body.items()
        c, preds = _field(f, key_col), []
        ops = {"gt": c.__gt__, "gte": c.__ge__, "lt": c.__lt__, "lte": c.__le__}
        for op, v in spec.items():
            if op not in ops:
                raise DslError(f"range op {op}")
            preds.append(ops[op](F.lit(v)))
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out
    if kind == "match":
        (f, v), = body.items()
        if isinstance(v, dict):
            v = v["query"]
        # analyzed match: any query token present in the analyzed field
        toks = tokenize_col(F.col(f)) if f in text_cols else F.array(F.col(f))
        from ela_lib_spark.functions.text import tokenize_list

        qtoks = tokenize_list(str(v))
        preds = [F.array_contains(toks, t) for t in qtoks] or [F.lit(False)]
        out = preds[0]
        for p in preds[1:]:
            out = out | p
        return out
    if kind == "prefix":
        (f, v), = body.items()
        if isinstance(v, dict):
            v = v["value"]
        return _field(f, key_col).startswith(str(v))
    if kind == "wildcard":
        (f, v), = body.items()
        if isinstance(v, dict):
            v = v["value"]
        # ES wildcard: * = any run, ? = one char; anchor both ends
        import re as _re

        rx = "".join(
            ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
            for ch in str(v)
        )
        return _field(f, key_col).rlike(f"^{rx}$")
    if kind == "match_phrase":
        (f, v), = body.items()
        if isinstance(v, dict):
            v = v["query"]
        from ela_lib_spark.functions.text import tokenize_list

        qtoks = tokenize_list(str(v))
        if not qtoks:
            return F.lit(False)
        # analyzed-phrase containment: the normalized token stream of the
        # field contains the query tokens consecutively
        joined = F.concat(F.lit("\x1f"),
                          F.concat_ws("\x1f", tokenize_col(F.col(f))),
                          F.lit("\x1f"))
        needle = "\x1f" + "\x1f".join(qtoks) + "\x1f"
        return joined.contains(needle)
    if kind == "bool":
        out = F.lit(True)
        must = body.get("must", []) + body.get("filter", [])
        for clause in must:
            out = out & dsl_to_column(clause, key_col, text_cols)
        should = [dsl_to_column(c, key_col, text_cols) for c in body.get("should", [])]
        # ES semantics: minimum_should_match defaults to 1 only when the
        # bool has NO must/filter clauses; otherwise should is purely a
        # scoring signal and must not filter. An explicit
        # minimum_should_match (0 or 1 supported) overrides.
        msm = body.get("minimum_should_match", 0 if must else 1)
        if msm not in (0, 1):
            raise DslError(f"minimum_should_match {msm} unsupported (0 or 1)")
        if should and msm >= 1:
            s = should[0]
            for p in should[1:]:
                s = s | p
            out = out & s
        for clause in body.get("must_not", []):
            out = out & ~dsl_to_column(clause, key_col, text_cols)
        return out
    raise DslError(f"unsupported clause: {kind}")


def dsl_filter(df: DataFrame, query: dict | None, key_col: str = "url",
               text_cols: tuple = ("text",)) -> DataFrame:
    if not query:
        return df
    return df.filter(dsl_to_column(query, key_col, text_cols))
