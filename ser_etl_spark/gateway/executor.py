"""Query execution: validate -> spark.sql -> cap -> timeout -> envelope.

The reference's execute path (``/root/reference/api-service/src/
query_engine.py:117-149``) — validate, execute on the current snapshot,
return a row-dict envelope — with Catalyst as the executor. Adds the two
contract pieces the reference delegates to config: the per-pattern
``max_rows`` cap (C5) injected as a plan-level LIMIT (Catalyst turns it
into CollectLimit / TakeOrderedAndProject — the cap prunes work, it does
not just truncate the client payload) and the 30 s execution timeout (C6)
via cooperative job-group cancellation.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from ser_etl_spark.gateway.catalog import SnapshotCatalog
from ser_etl_spark.gateway.validator import QueryValidator, sanitize_query


class QueryTimeoutError(RuntimeError):
    """Query exceeded the max execution time and was cancelled."""


@dataclass
class QueryResult:
    """Result envelope (reference C9, ``query_engine.py:19-27``)."""

    data: list[dict[str, Any]]
    columns: list[str]
    row_count: int
    execution_time_ms: float
    cached: bool = False
    pattern: str | None = field(default=None)


class SparkQueryEngine:
    """Read-only SQL gateway over the current snapshot."""

    def __init__(
        self,
        spark: SparkSession,
        catalog: SnapshotCatalog,
        validator: QueryValidator | None = None,
    ) -> None:
        self.spark = spark
        self.catalog = catalog
        self.validator = validator or QueryValidator()

    def execute_query(self, query: str) -> QueryResult:
        start = time.time()
        clean = sanitize_query(query)
        admission = self.validator.validate(clean)
        self.catalog.refresh()

        df = self.spark.sql(clean).limit(admission.max_rows)
        rows = self._collect_with_timeout(
            df, self.validator.max_execution_time_s
        )
        elapsed_ms = (time.time() - start) * 1000.0
        return QueryResult(
            data=[r.asDict(recursive=True) for r in rows],
            columns=list(df.columns),
            row_count=len(rows),
            execution_time_ms=elapsed_ms,
            pattern=admission.pattern,
        )

    def get_schema(self) -> dict[str, list[str]]:
        return self.catalog.schema()

    def explain_query(self, query: str, mode: str = "formatted") -> str:
        """Validated plan introspection: the query passes the SAME
        admission gate as execution (keyword blocklist, allow-pattern,
        length cap) but only its physical plan is returned — no job
        runs, no rows leave. An operator-facing extension (the reference
        exposes no EXPLAIN): lets a caller confirm pushdown/broadcast
        decisions against the live snapshot before paying for execution.

        The admission row cap is applied to the explained plan exactly
        as :meth:`execute_query` applies it before collecting, so the
        returned physical plan (its CollectLimit/TakeOrderedAndProject
        and the optimizations they enable) is the plan execution will
        actually run — not an uncapped variant of it.
        """
        from ser_etl_spark.session import explain_string

        clean = sanitize_query(query)
        admission = self.validator.validate(clean)
        self.catalog.refresh()
        return explain_string(
            self.spark.sql(clean).limit(admission.max_rows), mode
        )

    # -- timeout ------------------------------------------------------------

    def _collect_with_timeout(self, df, timeout_s: float):
        """Collect on a worker thread; cancel the job group on timeout.

        Spark jobs are cancellable only cooperatively: the collecting
        thread tags its jobs with a unique group id and the watchdog calls
        ``cancelJobGroup`` if the deadline passes
        (interruptOnCancel so running tasks stop, not just queued ones).
        """
        group = f"gateway-{uuid.uuid4().hex[:12]}"
        out: dict[str, Any] = {}

        def run() -> None:
            sc = self.spark.sparkContext
            sc.setJobGroup(group, "gateway query", interruptOnCancel=True)
            try:
                out["rows"] = df.collect()
            except Exception as exc:  # surfaced after join
                out["error"] = exc
            finally:
                sc.setJobGroup("", "")

        try:
            from pyspark import InheritableThread

            thread: threading.Thread = InheritableThread(target=run)
        except ImportError:  # pragma: no cover
            thread = threading.Thread(target=run, daemon=True)
        thread.start()
        thread.join(timeout_s)
        if thread.is_alive():
            self.spark.sparkContext.cancelJobGroup(group)
            thread.join(10.0)
            raise QueryTimeoutError(
                f"query exceeded {timeout_s}s and was cancelled"
            )
        if "error" in out:
            raise out["error"]
        return out["rows"]
