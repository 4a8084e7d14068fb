"""SQL query validation: whitelist, blocklist, length cap, sanitizer.

Reimplements the reference gateway's admission contract (SURVEY.md §2.C):
a query is admitted iff it matches one allow-pattern AND contains no blocked
keyword AND fits the length cap
(``/root/reference/shared/utils/validators.py:21-61``,
``/root/reference/api-service/src/query_engine.py:33-60``). Each admitted
pattern carries a ``max_rows`` result cap the executor enforces
(``/root/reference/shared/schemas/query_whitelist.json:3-50``).

Behavioral notes preserved on purpose:

- Blocked keywords are matched with ``\\b<kw>\\b`` word boundaries, exactly
  like the reference. For punctuation "keywords" (``--``, ``;``, ``@@``)
  this only fires when the token is *surrounded by word characters*
  (``a--b`` matches, ``a -- b`` does not) — the sanitizer, not the
  blocklist, is what actually strips free-standing comments.
- Validation happens on the raw string; callers should sanitize first,
  as the reference's API layer does.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

#: Default admitted query classes. Data-equivalent to the reference's
#: ``shared/schemas/query_whitelist.json`` (names, regexes, row caps).
DEFAULT_ALLOWED: tuple[tuple[str, str, int], ...] = (
    ("select_all", r"^SELECT\s+\*\s+FROM\s+(\w+)", 10000),
    ("select_columns", r"^SELECT\s+([\w\s,]+)\s+FROM\s+(\w+)", 10000),
    ("count", r"^SELECT\s+COUNT\(\*\)\s+FROM\s+(\w+)", 1),
    ("aggregate", r"^SELECT\s+(SUM|AVG|MIN|MAX|COUNT)\s*\(", 1000),
    ("group_by", r"^SELECT\s+.+\s+FROM\s+(\w+)\s+GROUP\s+BY", 5000),
    ("where_clause", r"^SELECT\s+.+\s+FROM\s+(\w+)\s+WHERE", 5000),
    ("order_by", r"^SELECT\s+.+\s+FROM\s+(\w+)\s+ORDER\s+BY", 5000),
    ("limit", r"^SELECT\s+.+\s+FROM\s+(\w+)\s+LIMIT\s+(\d+)", 10000),
)

#: Blocked keywords/tokens (DML/DDL, set ops, multi-statement, escapes).
DEFAULT_BLOCKED: tuple[str, ...] = (
    "INSERT",
    "UPDATE",
    "DELETE",
    "DROP",
    "CREATE",
    "ALTER",
    "TRUNCATE",
    "EXEC",
    "EXECUTE",
    "UNION",
    "--",
    ";/*",
    "xp_",
    "sp_",
    ";",
    "@@",
)

DEFAULT_MAX_QUERY_LENGTH = 5000
DEFAULT_MAX_EXECUTION_TIME_S = 30.0


class QueryRejected(ValueError):
    """Raised when a query fails validation (maps to HTTP 400)."""


@dataclass(frozen=True)
class Admission:
    """A successful validation: which pattern admitted the query."""

    pattern: str
    max_rows: int


def sanitize_query(query: str) -> str:
    """Strip block/EOL comments and collapse whitespace (reference C4,
    ``shared/utils/validators.py:64-73``)."""
    query = re.sub(r"/\*.*?\*/", "", query, flags=re.DOTALL)
    query = re.sub(r"--.*?$", "", query, flags=re.MULTILINE)
    return re.sub(r"\s+", " ", query).strip()


class QueryValidator:
    """Admission control for the read-only SQL surface."""

    def __init__(
        self,
        allowed: tuple[tuple[str, str, int], ...] = DEFAULT_ALLOWED,
        blocked: tuple[str, ...] = DEFAULT_BLOCKED,
        max_query_length: int = DEFAULT_MAX_QUERY_LENGTH,
        max_execution_time_s: float = DEFAULT_MAX_EXECUTION_TIME_S,
    ) -> None:
        self._blocked = [
            re.compile(rf"\b{re.escape(kw)}\b", re.IGNORECASE) for kw in blocked
        ]
        self._allowed = [
            (name, re.compile(pattern, re.IGNORECASE), max_rows)
            for name, pattern, max_rows in allowed
        ]
        self.max_query_length = max_query_length
        self.max_execution_time_s = max_execution_time_s

    def validate(self, query: str) -> Admission:
        """Return the admitting pattern or raise :class:`QueryRejected`."""
        if len(query) > self.max_query_length:
            raise QueryRejected(
                f"Query exceeds maximum length of {self.max_query_length} characters"
            )
        for pattern in self._blocked:
            if pattern.search(query):
                raise QueryRejected("Query contains blocked keywords or patterns")
        stripped = query.strip()
        for name, pattern, max_rows in self._allowed:
            if pattern.match(stripped):
                return Admission(pattern=name, max_rows=max_rows)
        raise QueryRejected("Query does not match any allowed pattern")

    def is_valid(self, query: str) -> bool:
        try:
            self.validate(query)
            return True
        except QueryRejected:
            return False
