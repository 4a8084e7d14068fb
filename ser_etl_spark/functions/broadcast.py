"""Size-aware broadcast policy for dimension joins.

The TPC-H-shaped queries broadcast their dimension sides so a
fact-table join never shuffles the fact side. That hint is always right
for the FIXED dims (``nation`` 25 rows, ``region`` 5 rows) but only
conditionally right for the SF-CORRELATED ones (``customer``,
``supplier``, ``part`` all grow linearly with the fact tables): at the
test scale factors they are a few MB, while at a true 100 TB scale
factor an unconditional ``F.broadcast(customer)`` is a driver/executor
OOM (VERDICT r11 #4 / directive "give the forced-broadcast dim joins a
size story").

:func:`broadcast_if_dim` is that story, in one place: hint the
broadcast only while the optimizer's own size estimate fits a dim
ceiling, otherwise return the frame UNHINTED and let AQE pick the join
strategy at runtime (its shuffle-side statistics convert to broadcast
when the build side turns out small, and to sort-merge when it
doesn't). The helper deliberately uses the plan ESTIMATE, not a count:
policy must not cost an extra job, and the estimate is exactly what
Spark's own ``autoBroadcastJoinThreshold`` consults.

Plan gates pin the POLICY, not the hint: at fixture SFs the estimate is
under the ceiling, so the gated plans still show ``BroadcastHashJoin``;
``tests/test_plans.py::test_broadcast_if_dim_declines_oversized`` pins
the decline path with a forced tiny ceiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: plan-estimate ceiling for hinting a dim broadcast. Generous next to
#: the 10 MB autoBroadcastJoinThreshold default because a *hinted*
#: broadcast bypasses that threshold entirely — this is the safety rail
#: for the hint itself. 256 MiB of build side is comfortably inside a
#: multi-GB executor while 100 TB-scale customer (tens of GB) is not.
BROADCAST_DIM_MAX_BYTES: int = 256 << 20


def plan_size_estimate(df: DataFrame) -> int | None:
    """The optimizer's sizeInBytes estimate for ``df``'s plan, or None
    when the estimate is unavailable (non-JVM test doubles, analysis
    errors). Pure metadata — triggers no job."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(str(stats.sizeInBytes()))
    except Exception:
        return None


def broadcast_if_dim(
    df: DataFrame, max_bytes: int = BROADCAST_DIM_MAX_BYTES
) -> DataFrame:
    """``F.broadcast(df)`` while the plan-size estimate fits the dim
    ceiling; the UNHINTED frame otherwise (AQE then picks the join
    strategy from runtime statistics). Use for SF-correlated dims
    (customer/supplier/part); fixed metadata dims (nation/region,
    <=25-row aggregates) may keep the unconditional hint."""
    size = plan_size_estimate(df)
    if size is not None and size <= max_bytes:
        return F.broadcast(df)
    return df
