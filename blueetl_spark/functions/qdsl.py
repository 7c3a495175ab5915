"""The ``q`` filter-DSL compiler: blueetl query dicts → Spark ``Column``.

Semantics re-expressed from the reference's documented DSL
(``/root/reference/doc/source/notebooks/01_core_transformations.ipynb``,
SURVEY §2.2 P1-P11). The DSL:

- ``{col: scalar}``            → equality
- ``{col: [v1, v2]}``          → membership (isin)
- ``{col: {"eq"|"ne"|"le"|"lt"|"ge"|"gt": v}}`` → comparisons, AND-combined
  within the dict
- ``{col: {"isin": [...]}}``   → explicit membership
- ``{col: {"regex": pat}}``    → unanchored ``re.search`` → ``rlike``
- multiple keys in one dict    → AND across keys
- ``[d1, d2, ...]``            → OR (union of row sets)
- ``{}`` / ``[]`` / ``None``   → no-op (all rows)

Because Spark DataFrames have no index, index-level vs column lookup
collapses to plain column references — the one intentional simplification
vs the pandas accessor.

``is_subfilter(f1, f2)`` decides whether filter ``f1`` selects a subset of
the rows of ``f2`` (per-key implication), powering subfilter cache reuse
(reference ``cache.py:575-610``). It is conservative: returns True only
when containment is provable.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QueryDict = dict[str, Any]
Query = QueryDict | list[QueryDict] | None

_OPS = frozenset({"eq", "ne", "le", "lt", "ge", "gt", "isin", "regex"})


def _compile_op(col: Column, op: str, value: Any) -> Column:
    if op == "eq":
        return col == F.lit(value)
    if op == "ne":
        # null-safe: pandas `col != v` keeps NaN rows, so `ne` must keep
        # NULL rows too — plain `!=` evaluates to NULL and drops them
        return ~col.eqNullSafe(F.lit(value))
    if op == "le":
        return col <= F.lit(value)
    if op == "lt":
        return col < F.lit(value)
    if op == "ge":
        return col >= F.lit(value)
    if op == "gt":
        return col > F.lit(value)
    if op == "isin":
        if not isinstance(value, (list, tuple, set)):
            raise ValueError(f"isin expects a list, got {value!r}")
        return col.isin(list(value))
    if op == "regex":
        # re.search semantics: unanchored substring match.
        return col.rlike(value)
    raise ValueError(f"unknown query operator {op!r}")


def _compile_constraint(name: str, constraint: Any) -> Column:
    col = F.col(name)
    if isinstance(constraint, dict):
        unknown = set(constraint) - _OPS
        if unknown:
            raise ValueError(f"unknown operators {sorted(unknown)} for column {name!r}")
        preds = [_compile_op(col, op, v) for op, v in constraint.items()]
        if not preds:
            return F.lit(True)
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out
    if isinstance(constraint, (list, tuple, set)):
        return col.isin(list(constraint))
    return col == F.lit(constraint)


def compile_query(query: Query) -> Column:
    """Compile a q-DSL query into a single boolean ``Column``.

    A list of dicts compiles to the OR of each dict's AND-of-constraints.
    Empty / None queries compile to a literal True (P8 no-op).
    """
    if query is None:
        return F.lit(True)
    if isinstance(query, dict):
        if not query:
            return F.lit(True)
        preds = [_compile_constraint(k, v) for k, v in query.items()]
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out
    if isinstance(query, (list, tuple)):
        if not query:
            return F.lit(True)
        for d in query:
            if not isinstance(d, dict):
                raise ValueError("list query must contain dicts")
        preds = [compile_query(d) for d in query]
        out = preds[0]
        for p in preds[1:]:
            out = out | p
        return out
    raise ValueError(f"unsupported query type {type(query).__name__}")


def q(df: DataFrame, query: Query = None, /, **kwargs: Any) -> DataFrame:
    """Filter a DataFrame with the q DSL (``df.etl.q`` equivalent).

    ``q(df, {"a": 1})``, ``q(df, [{"a": 1}, {"b": 2}])`` or ``q(df, a=1)``.
    """
    if query is not None and kwargs:
        raise ValueError("pass either a query object or kwargs, not both")
    return df.filter(compile_query(kwargs if query is None else query))


def query_to_sql(query: Query) -> str:
    """Render a q-DSL query as an ANSI-SQL boolean expression.

    Used for oracle cross-checks and for pushing the same predicate into
    engines that speak SQL. Strings are single-quoted with doubling.
    """

    def lit(v: Any) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return repr(v)

    def constraint(name: str, c: Any) -> str:
        if isinstance(c, dict):
            parts = []
            sql_ops = {"eq": "=", "le": "<=", "lt": "<", "ge": ">=", "gt": ">"}
            for op, v in c.items():
                if op in sql_ops:
                    parts.append(f"{name} {sql_ops[op]} {lit(v)}")
                elif op == "ne":
                    # null-safe, matching the Spark compilation (NULL rows kept)
                    parts.append(f"{name} IS DISTINCT FROM {lit(v)}")
                elif op == "isin":
                    # empty membership: Spark's col.isin([]) is valid and
                    # selects nothing; "IN ()" is a SQL syntax error
                    parts.append(
                        f"{name} IN ({', '.join(lit(x) for x in v)})"
                        if v
                        else "FALSE"
                    )
                elif op == "regex":
                    parts.append(f"regexp_matches({name}, {lit(v)})")
                else:
                    raise ValueError(f"unknown operator {op!r}")
            return "(" + " AND ".join(parts) + ")" if parts else "TRUE"
        if isinstance(c, (list, tuple, set)):
            return (
                f"{name} IN ({', '.join(lit(x) for x in c)})" if c else "FALSE"
            )
        return f"{name} = {lit(c)}"

    if query is None or query == {} or query == []:
        return "TRUE"
    if isinstance(query, dict):
        return "(" + " AND ".join(constraint(k, v) for k, v in query.items()) + ")"
    return "(" + " OR ".join(query_to_sql(d) for d in query) + ")"


# ---------------------------------------------------------------------------
# Subfilter implication (drives cache reuse: rerun vs refilter decisions).
# ---------------------------------------------------------------------------

_RANGE_OPS = {"le", "lt", "ge", "gt"}


def _canonical(constraint: Any) -> dict[str, Any]:
    """Normalize a constraint to operator-dict form."""
    if isinstance(constraint, dict):
        return dict(constraint)
    if isinstance(constraint, (list, tuple, set)):
        return {"isin": list(constraint)}
    return {"eq": constraint}


def _values_of(c: dict[str, Any]) -> list[Any] | None:
    """Finite value set selected by eq/isin constraints, if any.

    eq and isin may coexist; the selected set is their INTERSECTION —
    returning just the eq value would treat the contradictory
    ``{eq: 2, isin: [3]}`` (empty set) as "all rows = 2", making
    ``is_subfilter`` claim an implication into an empty filter.
    """
    if "eq" in c and "isin" in c:
        eq_h = _hashable(c["eq"])
        return [v for v in c["isin"] if _hashable(v) == eq_h]
    if "eq" in c:
        return [c["eq"]]
    if "isin" in c:
        return list(c["isin"])
    return None


def _constraint_implies(c1: dict[str, Any], c2: dict[str, Any]) -> bool:
    """True if constraint c1 provably selects a subset of c2 (same column)."""
    v1, v2 = _values_of(c1), _values_of(c2)
    if v2 is not None:
        # c2 constrains to a finite set: need c1 to be a finite subset.
        if v1 is None:
            return False
        if not set(map(_hashable, v1)) <= set(map(_hashable, v2)):
            return False
    if v1 is not None:
        # c1 finite: every value must ALSO satisfy c2's non-finite ops —
        # even when c2 had eq/isin (e.g. c2 = {eq: 2, ne: 2} is empty, so
        # {isin: [2]} must NOT imply it).
        ops_only = {op: b for op, b in c2.items() if op not in ("eq", "isin")}
        if ops_only and not all(_satisfies_ops(v, ops_only) for v in v1):
            return False
    else:
        # Range/regex/ne implication for non-finite c1.
        for op, val in c2.items():
            if op in ("eq", "isin"):
                continue  # handled above
            if not _op_implied(op, val, c1):
                return False
    return True


def _hashable(v: Any) -> Any:
    return tuple(v) if isinstance(v, list) else v


def _satisfies_ops(value: Any, c: dict[str, Any]) -> bool:
    import re

    for op, bound in c.items():
        try:
            if op == "ne" and not value != bound:
                return False
            if op == "le" and not value <= bound:
                return False
            if op == "lt" and not value < bound:
                return False
            if op == "ge" and not value >= bound:
                return False
            if op == "gt" and not value > bound:
                return False
            if op == "regex" and not (
                isinstance(value, str) and re.search(bound, value)
            ):
                return False
        except TypeError:
            return False
    return True


def _op_implied(op: str, bound: Any, c1: dict[str, Any]) -> bool:
    """Does some constraint in c1 imply ``col <op> bound``?"""
    try:
        if op == "le":
            return ("le" in c1 and c1["le"] <= bound) or ("lt" in c1 and c1["lt"] <= bound)
        if op == "lt":
            return ("lt" in c1 and c1["lt"] <= bound) or ("le" in c1 and c1["le"] < bound)
        if op == "ge":
            return ("ge" in c1 and c1["ge"] >= bound) or ("gt" in c1 and c1["gt"] >= bound)
        if op == "gt":
            return ("gt" in c1 and c1["gt"] >= bound) or ("ge" in c1 and c1["ge"] > bound)
        if op == "ne":
            return c1.get("ne") == bound
        if op == "regex":
            return c1.get("regex") == bound
    except TypeError:
        return False
    return False


def is_subfilter(filter1: Query, filter2: Query, strict: bool = False) -> bool:
    """True if ``filter1`` provably selects a subset of ``filter2``'s rows.

    Per-key semantics (reference behavior, SURVEY P11): a key missing from
    ``filter2`` is unconstrained (superset); a key missing from ``filter1``
    but present in ``filter2`` breaks containment; otherwise the per-key
    constraints must imply. With ``strict=True`` the filters must also
    differ. List-of-dict (OR) queries: every branch of f1 must be a
    subfilter of some branch of f2.
    """
    if isinstance(filter1, list) or isinstance(filter2, list):
        branches1 = filter1 if isinstance(filter1, list) else [filter1 or {}]
        branches2 = filter2 if isinstance(filter2, list) else [filter2 or {}]
        if not branches1:
            branches1 = [{}]
        if not branches2:
            branches2 = [{}]
        ok = all(
            any(is_subfilter(b1, b2) for b2 in branches2) for b1 in branches1
        )
        return ok and (not strict or filter1 != filter2)
    f1 = {k: _canonical(v) for k, v in (filter1 or {}).items()}
    f2 = {k: _canonical(v) for k, v in (filter2 or {}).items()}
    for key, c2 in f2.items():
        if key not in f1:
            return False
        if not _constraint_implies(f1[key], c2):
            return False
    if strict and filter1 == filter2:
        return False
    return True
