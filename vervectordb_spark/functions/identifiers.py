"""Identifier quoting for SQL-string expression builders.

The r11 build moved hot expression trees from per-dim Column calls to
single parsed SQL strings (driver py4j cost, OPTIMIZATION_r11 §1). The
Column API handled any column name; an f-string interpolation does not —
a name with spaces, hyphens, dots or a reserved word raises a parse
error (ADVICE r11, low). Backtick-quote every interpolated identifier.
"""

from __future__ import annotations


def sql_ident(name: str) -> str:
    """`name` backtick-quoted for a Spark SQL expression string; embedded
    backticks double (the Spark/Hive escape)."""
    return "`" + str(name).replace("`", "``") + "`"
