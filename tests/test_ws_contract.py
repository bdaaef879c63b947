"""The pinned whitespace contract (functions/words.py docstring).

Round-10 post-mortem: hypothesis found `'\\x1f'` tokenizing differently in
the engine (Java regex `\\s` = ASCII six) and a test model (Python
str.split() = Unicode whitespace). The fix is ONE spelled-out character
class used verbatim by all three regex dialects; these tests make the
contract load-bearing:

1. a source lint — no `\\s` shorthand may reappear anywhere in the
   package (words.py, which documents the contract, is the only
   exception);
2. tri-dialect parity — Spark (Java regex), DuckDB (RE2) and the Python
   model agree token-for-token over every single byte 0x00-0xFF and over
   adversarial mixed strings.
"""

import pathlib
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from vervectordb_spark.functions.words import (
    WS_CHARS, WS_REGEX, ws_tokens_py)

PKG = pathlib.Path(__file__).resolve().parents[1] / "vervectordb_spark"


def test_no_backslash_s_shorthand_in_package_source():
    """Any `\\s` in a regex is ambiguous across Java/RE2/Python — the
    package must spell the pinned class instead (grep-able contract)."""
    offenders = []
    for p in sorted(PKG.rglob("*.py")):
        if p.name == "words.py":  # the contract definition + rationale
            continue
        src = p.read_text()
        for i, line in enumerate(src.splitlines(), 1):
            if re.search(r"\\+s", line):
                offenders.append(f"{p.relative_to(PKG.parent)}:{i}: {line.strip()}")
    assert not offenders, (
        "backslash-s shorthand found; use words.WS_REGEX / the spelled-out "
        "class instead:\n" + "\n".join(offenders))


def _spark_tokens(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string")
    rows = df.select(
        "i",
        F.filter(F.split(F.lower("t"), WS_REGEX),
                 lambda x: x != "").alias("toks"),
    ).collect()
    return {r["i"]: list(r["toks"]) for r in rows}


def _duck_tokens(texts):
    con = duckdb.connect()
    out = {}
    for i, t in enumerate(texts):
        (toks,) = con.execute(
            "SELECT list_filter(regexp_split_to_array(lower(?), "
            f"'{WS_REGEX}'), x -> x <> '')", [t]).fetchone()
        out[i] = list(toks)
    con.close()
    return out


# every single byte, plus the Unicode whitespace Python treats specially
_SINGLE = [f"a{chr(c)}b" for c in range(0x00, 0x100)]
_MIXED = [
    "",
    " \t\n\x0b\f\r",            # exactly the six separators
    "\x1c\x1d\x1e\x1f\x85\xa0", # Python-whitespace, NOT separators here
    "a\x1fb c\x0bd\te　f",  # the round-10 counterexample + friends
    "A\x00B\x07C",              # NUL / BEL inside a token
    "é Ü ß 一二三",              # non-ASCII letters survive lower()
    "  x  ",                    # leading/trailing runs drop as empties
]


def test_tri_dialect_tokenizer_parity(spark):
    texts = _SINGLE + _MIXED
    py = {i: ws_tokens_py(t) for i, t in enumerate(texts)}
    jvm = _spark_tokens(spark, texts)
    duck = _duck_tokens(texts)
    for i, t in enumerate(texts):
        assert py[i] == jvm[i], (repr(t), py[i], jvm[i], "python-vs-java")
        assert py[i] == duck[i], (repr(t), py[i], duck[i], "python-vs-re2")


def test_separator_set_is_exactly_ws_chars():
    """Byte-level membership: c splits a<c>b iff c is one of the pinned
    six — in the Python model (the two engine dialects are pinned equal
    to it above)."""
    for c in range(0x00, 0x100):
        ch = chr(c)
        toks = ws_tokens_py(f"a{ch}b")
        if ch in WS_CHARS:
            assert toks == ["a", "b"], hex(c)
        else:
            assert toks == [f"a{ch}b".lower()], hex(c)
