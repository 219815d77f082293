"""GE mini-DSL row conditions -> Spark SQL.

The reference accepts ``condition_parser="great_expectations"`` with a tiny
condition language (reference: expectations/row_conditions.py:36-67 grammar,
:127-160 ``parse_condition_to_spark``):

    col("foo") > 5
    col("foo") == "Two Two"
    col("foo").notNull()
    col("ts") > date("2021-01-01")

The grammar is intentionally single-condition (no and/or composition — the
reference's pyparsing grammar matches exactly one comparison or notnull).
We translate to a Spark SQL predicate string, which our Domain applies as
``df.filter(sql)`` — so GX suites written against the DSL load unchanged,
and Catalyst still sees a plain pushdown-able predicate.

Differences from the reference, both supersets:
  - string comparisons allow ``!=`` as well as ``==`` (the reference's
    Spark branch raises for anything but ``==`` on strings, :139-144);
  - numbers keep full float/scientific forms.
"""

from __future__ import annotations

import re


class ConditionParserError(ValueError):
    pass


_CONDITION_RE = re.compile(
    r"""^\s*
    col\(\s*"(?P<col>[A-Za-z][A-Za-z0-9_\-.]*)"\s*\)\s*
    (?:
        (?P<notnull>\.notnull\(\))
      | (?P<op>>=|<=|==|!=|>|<)\s*(?P<rhs>.+?)
    )
    \s*$""",
    re.IGNORECASE | re.VERBOSE,
)

_NUMBER_RE = re.compile(r"^[+-]?\d+(?:\.\d*)?(?:[eE][+-]?\d+)?$")
_STRING_RE = re.compile(r"""^(?:"(?P<d>[^"]*)"|'(?P<s>[^']*)')$""")
_DATE_RE = re.compile(r"""^date\(\s*(?:"(?P<d>[^"]*)"|'(?P<s>[^']*)')\s*\)$""")

_OP_SQL = {">": ">", "<": "<", ">=": ">=", "<=": "<=", "==": "=", "!=": "!="}


def _sql_str(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def parse_condition_to_spark_sql(row_condition: str) -> str:
    """Translate one GE-DSL condition to a Spark SQL predicate string."""
    m = _CONDITION_RE.match(row_condition)
    if not m:
        raise ConditionParserError(
            f"unable to parse condition: {row_condition!r} (the "
            "great_expectations condition parser accepts exactly one "
            "`col(\"name\") <op> <value>` or `col(\"name\").notnull()`; use "
            "condition_parser='spark' with a SQL string for anything richer)"
        )
    col = f"`{m.group('col')}`"
    if m.group("notnull"):
        return f"{col} IS NOT NULL"
    op = _OP_SQL[m.group("op")]
    rhs = m.group("rhs").strip()
    if _NUMBER_RE.match(rhs):
        return f"{col} {op} {rhs}"
    ms = _STRING_RE.match(rhs)
    if ms:
        if op not in ("=", "!="):
            raise ConditionParserError(
                f"invalid operator {m.group('op')!r} for string literal condition"
            )
        return f"{col} {op} {_sql_str(ms.group('d') or ms.group('s') or '')}"
    md = _DATE_RE.match(rhs)
    if md:
        return f"{col} {op} date({_sql_str(md.group('d') or md.group('s') or '')})"
    raise ConditionParserError(f"unrecognized condition value: {rhs!r}")


def resolve_row_condition(
    row_condition: str | None, condition_parser: str | None
) -> str | None:
    """row_condition as a Spark SQL string, honoring condition_parser
    (reference: sparkdf_execution_engine.py:512-517 for 'spark'/SQL
    strings; row_conditions.py for the GE DSL)."""
    if row_condition is None:
        return None
    if condition_parser in ("great_expectations", "ge",
                            "great_expectations__experimental__"):
        return parse_condition_to_spark_sql(row_condition)
    return row_condition
