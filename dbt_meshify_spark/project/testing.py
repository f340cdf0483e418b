"""Generic data-test compiler (D1-D6, SURVEY.md §2.4).

dbt generic tests compile to SQL SELECTs whose zero-row result means pass
(reference shapes: unique/not_null at
/root/reference/test-projects/split/split_proj/models/staging/__models.yml:9-11,
accepted_values + relationships + expression_is_true at
models/marts/__models.yml:34-59, custom template at
tests/generic/custom_generic_test.sql:1-3). We compile them identically and
run them as Spark SQL — each test is one distributed query, trivially
parallel across tests.
"""

from __future__ import annotations

from typing import Any, Callable

from dbt_meshify_spark.project.compiler import CompileError, JinjaCompiler
from dbt_meshify_spark.project.loader import TestSpec


def _sql_literal(v: Any) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def compile_test(
    spec: TestSpec,
    relation: str,
    compiler: JinjaCompiler,
    resolve_ref: Callable[..., str],
    custom_sources: dict[str, str] | None = None,
) -> str:
    """TestSpec -> zero-row-pass SQL against ``relation``."""
    t, col = spec.test_type, spec.column_name
    if t == "unique":
        return (
            f"select {col}, count(*) as n from {relation} "
            f"where {col} is not null group by {col} having count(*) > 1"
        )
    if t == "not_null":
        return f"select * from {relation} where {col} is null"
    if t == "accepted_values":
        vals = ", ".join(_sql_literal(v) for v in spec.kwargs.get("values", []))
        return (
            f"select * from {relation} "
            f"where {col} is not null and {col} not in ({vals})"
        )
    if t == "relationships":
        to_rel = _render_relation(spec.kwargs.get("to", ""), compiler, resolve_ref)
        fld = spec.kwargs.get("field", "id")
        return (
            f"select {col} from {relation} where {col} is not null "
            f"and {col} not in (select {fld} from {to_rel} where {fld} is not null)"
        )
    if t == "expression_is_true":
        expr = spec.kwargs.get("expression", "true")
        return f"select * from {relation} where not ({expr})"
    template = (custom_sources or {}).get(t)
    if template is None:
        raise CompileError(f"unknown generic test {t!r}")
    # `config:` is test metadata (store_failures etc.), not a template arg
    kwargs = {k: v for k, v in spec.kwargs.items() if k != "config"}
    return compiler.render_test(template, t, relation, col, kwargs)


def _render_relation(
    to_expr: str, compiler: JinjaCompiler, resolve_ref: Callable[..., str]
) -> str:
    """``to: ref('orders')`` -> relation string, through the real resolver."""
    result = compiler.compile(
        "{{ " + to_expr + " }}",
        "__relationships_to__",
        resolve_ref=resolve_ref,
        resolve_source=lambda s, t: t,
    )
    return result.sql.strip()
