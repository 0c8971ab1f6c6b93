"""Shared text expressions — the tokenizer contract.

The reference tokenizer (reference src/mapper.c:14-42) emits maximal runs
of alphanumerics (`iswalnum`, mapper.c:23,28), lowercased (`towlower`,
mapper.c:29), dropping empty tokens (mapper.c:32).  `iswalnum` is
locale-sensitive and Unicode-aware under the reference's
``setlocale(LC_CTYPE, "")`` (mapper.c:120), so the deterministic,
locale-independent restatement (SURVEY.md §7.4.1) is the Unicode
character classes ``\\p{L}\\p{N}`` — NOT ASCII ``[a-z0-9]``: the ASCII
class silently drops every CJK/Cyrillic/accented token the reference
would keep.

The SAME regex class must be used by the DuckDB oracle (RE2 supports
``\\p{L}\\p{N}`` identically), so all engine-side constants live here and
nowhere else:

- ``SPARK_TOKEN_SPLIT_RE``   — Java regex for ``F.split`` (Spark side).
- ``ORACLE_TOKEN_SPLIT_RE``  — RE2 regex for ``string_split_regex``
  (DuckDB side); textually identical today, kept separate so either can
  diverge deliberately.
- ``PY_TOKEN_SPLIT_RE``      — Python ``re`` twin for pandas-UDF paths:
  Python's ``re`` has no ``\\p{L}``, but ``\\w`` (Unicode mode, the
  default for str patterns) is exactly L* ∪ N* ∪ {_}, so splitting on
  ``[\\W_]+`` matches the Java/RE2 classes.
- ``*_ASCII`` variants       — the pinned round-1 ASCII tokenizer, kept
  for operators that intentionally restrict to ASCII (e.g. blocking
  keys, BPE-ish token counting, ASCII-parity demo query).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Unicode-faithful shared default (Java regex / RE2: identical semantics).
SPARK_TOKEN_SPLIT_RE = r"[^\p{L}\p{N}]+"
ORACLE_TOKEN_SPLIT_RE = r"[^\p{L}\p{N}]+"
# Python `re` twin (see module docstring): \w == [L* N* _] on str patterns.
PY_TOKEN_SPLIT_RE = r"[\W_]+"

# Round-1 ASCII tokenizer, kept as an explicit opt-in variant.
SPARK_TOKEN_SPLIT_RE_ASCII = "[^a-z0-9]+"
ORACLE_TOKEN_SPLIT_RE_ASCII = "[^a-z0-9]+"

# Oracle-side snippets — interpolate these into oracle SQL so every query
# stays in lockstep with the Spark constants above.
ORACLE_SPLIT_SNIPPET = (
    f"string_split_regex(lower(text), '{ORACLE_TOKEN_SPLIT_RE}')"
)
# One row per (possibly empty) token from the `text` column.
ORACLE_TOKENS_SNIPPET = f"unnest({ORACLE_SPLIT_SNIPPET})"
# List of non-empty tokens from the `text` column.
ORACLE_TOKEN_LIST_SNIPPET = (
    f"list_filter({ORACLE_SPLIT_SNIPPET}, x -> length(x) > 0)"
)

# Legacy template (round-1 name); prefer the snippets above.
ORACLE_TOKENS_TEMPLATE = (
    "unnest(string_split_regex(lower({col}), '" + ORACLE_TOKEN_SPLIT_RE + "'))"
)


def tokens(col: Column | str) -> Column:
    """Array of lowercase tokens; empty strings still present (filter after
    explode so the predicate survives as a Catalyst Filter node)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), SPARK_TOKEN_SPLIT_RE)
