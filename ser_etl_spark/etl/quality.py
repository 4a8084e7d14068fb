"""Declarative data-quality constraints and schema-drift detection.

The reference's QA surface is the implicit `id` unique index created per
sync (``/root/reference/etl-service/src/sync.py:88-97``, mirrored here by
``etl/build.py check_unique``). A production pipeline needs the rest of
the standard constraint family — this module provides it as *one
aggregate pass per table* plus an anti-join per foreign key:

- not-null / value-range / accepted-values: folded into a single
  ``agg`` over conditional counts, so N rules on one table cost one
  scan and no shuffle (partial aggregation only);
- referential integrity: LEFT ANTI join per relationship — the orphan
  side is empty in healthy data, and Catalyst broadcasts the parent
  keys when they fit;
- schema drift: pure-Python StructType diff (added / removed /
  type-changed columns) for the sync path to act on before a snapshot
  is built against a stale layout.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


@dataclass(frozen=True)
class Rule:
    """One declarative constraint on a single table."""

    name: str
    #: boolean Column: True where the row VIOLATES the constraint.
    violation: Column


def not_null(col: str) -> Rule:
    return Rule(f"not_null:{col}", F.col(col).isNull())


def in_range(col: str, lo: float | None = None, hi: float | None = None) -> Rule:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return Rule(f"in_range:{col}", F.col(col).isNotNull() & cond)


def accepted_values(col: str, values: tuple[str, ...]) -> Rule:
    return Rule(
        f"accepted_values:{col}",
        F.col(col).isNotNull() & ~F.col(col).isin(list(values)),
    )


def check_rules(df: DataFrame, rules: list[Rule]) -> dict[str, int]:
    """Violation count per rule in ONE aggregate pass over the table."""
    if not rules:
        return {}
    row = df.agg(
        *[
            F.sum(r.violation.cast("long")).alias(f"_r{i}")
            for i, r in enumerate(rules)
        ]
    ).first()
    return {r.name: int(row[f"_r{i}"] or 0) for i, r in enumerate(rules)}


def fk_orphans(child: DataFrame, child_col: str, parent: DataFrame, parent_col: str) -> DataFrame:
    """Child rows whose key has no match in the parent (NOT EXISTS
    semantics — NULL child keys are not orphans, matching the SQL
    convention)."""
    keys = parent.select(F.col(parent_col).alias(child_col)).distinct()
    return child.filter(F.col(child_col).isNotNull()).join(
        keys, child_col, "left_anti"
    )


@dataclass
class DriftReport:
    added: list[str] = field(default_factory=list)
    removed: list[str] = field(default_factory=list)
    changed: list[str] = field(default_factory=list)

    @property
    def has_drift(self) -> bool:
        return bool(self.added or self.removed or self.changed)


def detect_schema_drift(old: StructType, new: StructType) -> DriftReport:
    """Diff two schemas: columns added / removed / type-changed (by name;
    order changes are not drift — column-oriented storage doesn't care)."""
    old_types = {f.name: f.dataType for f in old.fields}
    new_types = {f.name: f.dataType for f in new.fields}
    return DriftReport(
        added=sorted(set(new_types) - set(old_types)),
        removed=sorted(set(old_types) - set(new_types)),
        changed=sorted(
            n
            for n in set(old_types) & set(new_types)
            if old_types[n] != new_types[n]
        ),
    )
