"""Lint: no ``\\s`` in engine-facing regex strings (ADVICE r08).

Java regex ``\\s`` is ``[ \\t\\n\\x0b\\f\\r]``; DuckDB's RE2 ``\\s``
omits ``\\x0b`` (vertical tab). Any Spark expression whose oracle
twin recomputes the same tokenization therefore diverges silently on
a vertical tab if either side spells the class ``\\s``. Repo
convention: both engines use the explicit class
``functions/text.py:WS`` (exactly Java ``\\s``, so Spark results are
unchanged vs the historical form).

This lint walks every package source file and fails on a line that
contains ``\\s`` inside quoted text (comments without quotes are
fine), unless the file is allowlisted below with a reason.
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "ai_data_pipeline_spark"

# Files allowed to keep \s, with why:
#   minipdf.py       — Python `re` over PDF bytes; single-engine, no
#                      oracle recomputes it.
#   json_fallback.py — reference-parity fenced-JSON regexes
#                      (app/main.py:46-61 semantics); Java-only, the
#                      q152 oracle never re-derives them.
ALLOWED = {"minipdf.py", "json_fallback.py"}

def test_no_backslash_s_in_engine_regex_strings():
    offenders: list[str] = []
    for path in sorted(PKG.rglob("*.py")):
        if path.name in ALLOWED:
            continue
        for lineno, line in enumerate(path.read_text().splitlines(), 1):
            # drop the trailing # comment — prose may mention \s;
            # (a # inside a regex string would under-lint that line,
            # acceptable for a convention check)
            code = line.split("#", 1)[0]
            if "\\s" in code:
                offenders.append(f"{path.relative_to(PKG.parent)}:{lineno}: {line.strip()}")
    assert not offenders, (
        "backslash-s in an engine-facing string — use the explicit "
        "whitespace class functions/text.py:WS on BOTH engines:\n"
        + "\n".join(offenders)
    )
