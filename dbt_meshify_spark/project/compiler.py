"""Jinja compile layer (UD2-UD4, F3, V7).

dbt models are jinja templates over SQL; macros are jinja macros. We compile
with real jinja2 rather than regex so macro-in-macro expansion, kwargs and
defaults behave exactly as in dbt (reference surface:
/root/reference/test-projects/split/split_proj/macros/cents_to_dollars.sql:3-9
calls type_numeric() from another file; jinja block shapes at
/root/reference/dbt_meshify/storage/jinja_blocks.py:20-72).

Scope is the observed dbt surface (SURVEY.md §7.4.2), not all of dbt:
``ref`` (1/2-arg + v=), ``source``, ``var``, ``env_var``, ``config``,
``is_incremental``, ``this``, ``doc``, project macros, and the dbt_utils
builtins the reference corpus uses (generate_surrogate_key, date_spine).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Any, Callable

import jinja2


class CompileError(Exception):
    pass


@dataclass
class CompileResult:
    sql: str
    config: dict[str, Any]
    refs: list[tuple]          # (name,) or (project, name); version appended last when pinned
    sources: list[tuple[str, str]]


# Builtin macros, provided to every project (public dbt-utils semantics,
# re-expressed for Spark SQL).
_BUILTIN_MACROS = r"""
{% macro generate_surrogate_key(field_list) -%}
md5(concat_ws('-', {%- for f in field_list %}coalesce(cast({{ f }} as string), '_null_'){% if not loop.last %}, {% endif %}{%- endfor %}))
{%- endmacro %}

{% macro date_spine(datepart, start_date, end_date) -%}
select explode(sequence(cast({{ start_date }} as date), cast({{ end_date }} as date), interval 1 {{ datepart }})) as date_{{ datepart }}
{%- endmacro %}

{% macro type_numeric() -%}decimal(16, 2){%- endmacro %}

{% macro type_string() -%}string{%- endmacro %}

{% macro type_timestamp() -%}timestamp{%- endmacro %}
"""


class _This:
    """``{{ this }}`` — the model's own relation (F3 incremental predicate)."""

    def __init__(self, relation: str) -> None:
        self.relation = relation
        self.name = relation.split(".")[-1]

    def __str__(self) -> str:
        return self.relation


class JinjaCompiler:
    """One per project. ``macro_sources`` are raw {% macro %} file bodies."""

    def __init__(
        self,
        project_name: str,
        macro_sources: list[str] | None = None,
        vars: dict[str, Any] | None = None,
    ) -> None:
        self.project_name = project_name
        self.vars = dict(vars or {})
        self.env = jinja2.Environment(undefined=jinja2.Undefined)
        src = _BUILTIN_MACROS + "\n" + "\n".join(macro_sources or [])
        try:
            self._macro_module = self.env.from_string(src).make_module()
        except jinja2.TemplateError as e:
            raise CompileError(f"macro compile failed for {project_name}: {e}") from e

    def macro_names(self) -> list[str]:
        return [
            n
            for n in dir(self._macro_module)
            if not n.startswith("_")
            and isinstance(getattr(self._macro_module, n), jinja2.runtime.Macro)
        ]

    def compile(
        self,
        raw_code: str,
        model_name: str,
        resolve_ref: Callable[..., str],
        resolve_source: Callable[[str, str], str],
        this_relation: str | None = None,
        is_incremental: bool = False,
        extra_context: dict[str, Any] | None = None,
    ) -> CompileResult:
        """Render one model. ``resolve_ref(name)`` / ``resolve_ref(proj,
        name)`` with optional ``v=``/``version=`` kwarg returns the relation
        string for the target (and may raise for access violations)."""
        config: dict[str, Any] = {}
        refs: list[tuple] = []
        sources: list[tuple[str, str]] = []

        def _config(*args: Any, **kwargs: Any) -> str:
            config.update(kwargs)
            return ""

        def _ref(*args: str, **kwargs: Any) -> str:
            version = kwargs.get("v", kwargs.get("version"))
            key = tuple(args) + ((version,) if version is not None else ())
            refs.append(key)
            return resolve_ref(*args, version=version)

        def _source(source_name: str, table_name: str) -> str:
            sources.append((source_name, table_name))
            return resolve_source(source_name, table_name)

        def _var(name: str, default: Any = None) -> Any:
            return self.vars.get(name, default)

        def _env_var(name: str, default: str | None = None) -> str:
            value = os.environ.get(name, default)
            if value is None:
                raise CompileError(f"env_var {name!r} is not set and has no default")
            return value

        ctx: dict[str, Any] = {
            "config": _config,
            "ref": _ref,
            "source": _source,
            "var": _var,
            "env_var": _env_var,
            "is_incremental": lambda: is_incremental,
            "this": _This(this_relation or model_name),
            "doc": lambda _name: "",
            "project_name": self.project_name,
        }
        for name in self.macro_names():
            ctx.setdefault(name, getattr(self._macro_module, name))
        # dbt_utils.x() spellings resolve to the same macros
        ctx["dbt_utils"] = self._macro_module
        ctx["dbt"] = self._macro_module
        ctx.update(extra_context or {})

        try:
            rendered = self.env.from_string(raw_code).render(**ctx)
        except jinja2.TemplateError as e:
            raise CompileError(f"compile failed for {model_name}: {e}") from e
        return CompileResult(
            sql=_tidy(rendered), config=config, refs=refs, sources=sources
        )

    def render_test(
        self,
        template: str,
        test_name: str,
        model_relation: str,
        column_name: str | None = None,
        kwargs: dict[str, Any] | None = None,
    ) -> str:
        """Expand a ``{% test name(model, column_name) %}`` template (D6).

        dbt compiles custom generic tests by calling the test macro with the
        model's relation; we do the same through jinja.
        """
        src = re.sub(r"{%-?\s*test\s+", "{% macro test_", template)
        src = re.sub(r"{%-?\s*endtest\s*-?%}", "{% endmacro %}", src)
        try:
            module = self.env.from_string(src).make_module()
            macro = getattr(module, f"test_{test_name}")
            rendered = macro(model_relation, column_name, **(kwargs or {}))
        except (jinja2.TemplateError, AttributeError, TypeError) as e:
            raise CompileError(f"test template {test_name!r} failed: {e}") from e
        return _tidy(str(rendered))


def _tidy(sql: str) -> str:
    """Collapse the blank lines that config()/macro blocks leave behind."""
    lines = [ln.rstrip() for ln in sql.splitlines()]
    out: list[str] = []
    for ln in lines:
        if ln or (out and out[-1]):
            out.append(ln)
    return "\n".join(out).strip()
