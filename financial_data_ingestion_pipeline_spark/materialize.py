"""Audit hook for lineage truncation (the plan-budget blind spot).

``localCheckpoint`` truncates lineage, so the exchanges and scans of
the *checkpointed subtree* vanish from the returned DataFrame's
optimized plan — a query could silently "pass" a plan budget by
checkpointing its expensive half (round-5 verdict, "What's wrong" #1).

:func:`audit` closes the hole: inside the context it wraps
``DataFrame.localCheckpoint`` so that every call — in any operator,
current or future, with no call-site cooperation — first records the
pre-truncation optimized plan's exchange/scan counts for the subtree
being pinned.  ``tools/plan_report.py`` sums these into
PLAN_AUDIT.md's ``ckpt_ex``/``ckpt_scan``/``ckpts`` columns and
``tests/test_plans.py`` budgets them: adding a checkpoint to dodge a
budget now moves the cost between audited columns instead of hiding
it.  Outside the context nothing is patched and nothing changes.

Nested checkpoints do not double-count: by the time an outer
``localCheckpoint`` inspects its subtree, any inner checkpoint already
shows up as a ``Scan ExistingRDD`` leaf (no exchanges/scans below it).
"""
from __future__ import annotations

import re
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame


def plan_counts(df: DataFrame) -> dict:
    """Exchange/scan counts of ``df``'s optimized physical plan tree."""
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    tree = plan.split("\n\n")[0]
    return {
        "exchanges": len(re.findall(r"\bExchange\b", tree)),
        "scans": len(re.findall(r"Scan parquet", tree)),
    }


@contextmanager
def audit(collector: list) -> Iterator[list]:
    """Record every lineage truncation during the block.

    Each ``localCheckpoint`` call appends ``{"exchanges": n, "scans":
    n, "eager": bool}`` for the subtree it truncated.  Reentrant-safe
    (restores the previous wrapper on exit); not thread-safe — use
    from single-threaded audit tools only.
    """
    # Spark 4 splits the API: pyspark.sql.DataFrame is the abstract
    # base; live sessions hand out pyspark.sql.classic.dataframe.
    # DataFrame (or the connect variant), each OVERRIDING the method —
    # patching only the base would never fire.  Patch every class that
    # defines localCheckpoint in its own __dict__.
    targets = [DataFrame]
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _ClassicDF

        targets.append(_ClassicDF)
    except ImportError:  # pragma: no cover - pre-4.x layout
        pass
    patched = []
    for cls in targets:
        if "localCheckpoint" not in cls.__dict__:
            continue
        original = cls.__dict__["localCheckpoint"]

        def wrapped(self, eager=True, *args, _original=original, **kwargs):
            # Forward everything verbatim: Spark 4's signature is
            # localCheckpoint(eager=True, storageLevel=None) and may
            # grow — a narrower wrapper would TypeError on legitimate
            # call forms the audit has no business rejecting.
            collector.append({**plan_counts(self), "eager": bool(eager)})
            return _original(self, eager, *args, **kwargs)

        cls.localCheckpoint = wrapped
        patched.append((cls, original))
    try:
        yield collector
    finally:
        for cls, original in patched:
            cls.localCheckpoint = original
