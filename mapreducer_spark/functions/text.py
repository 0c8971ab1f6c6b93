"""Shared text expressions — the tokenizer contract.

The reference tokenizer (reference src/mapper.c:14-42) emits maximal runs
of alphanumerics (`iswalnum`, mapper.c:23,28), lowercased (`towlower`,
mapper.c:29), dropping empty tokens (mapper.c:32).  The deterministic,
locale-independent restatement (SURVEY.md §7.4.1): lowercase first, then
split on runs of anything outside [a-z0-9].

The SAME regex class must be used by the DuckDB oracle, so both constants
live here and nowhere else.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Pinned tokenizer class — identical semantics in Java regex (Spark) and
# RE2-ish regex (DuckDB): split on runs of non-[a-z0-9] AFTER lowering.
SPARK_TOKEN_SPLIT_RE = "[^a-z0-9]+"
ORACLE_TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Oracle-side snippet producing one row per token from a text column named
# ``{col}``: keep in lockstep with ``tokens`` below.
ORACLE_TOKENS_TEMPLATE = (
    "unnest(string_split_regex(lower({col}), '[^a-z0-9]+'))"
)


def tokens(col: Column | str) -> Column:
    """Array of lowercase tokens; empty strings still present (filter after
    explode so the predicate survives as a Catalyst Filter node)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), SPARK_TOKEN_SPLIT_RE)
