"""Shared ordered-window construction with a single-partition guard.

Every augment/sessionize operator accepts ``group_cols=[]`` — a legitimate
ungrouped series — but ``Window.partitionBy()`` funnels the ENTIRE input
through ONE task (a single-partition Exchange): correct, yet a silent
driver-side-equivalent bottleneck at 100× scale. We keep the semantics and
make the hazard loud: a ``SinglePartitionWarning`` fires once per call
site so a pipeline author notices before pointing the job at 100 TB.
"""

from __future__ import annotations

import warnings
from collections.abc import Sequence

from pyspark.sql import Window, WindowSpec


class SinglePartitionWarning(UserWarning):
    """An ungrouped window will serialize the whole input into one task."""


def warn_single_partition(op_name: str) -> None:
    warnings.warn(
        f"{op_name}: group_cols is empty — the ordered window will pull the "
        "entire input into a single partition. Fine for one bounded series; "
        "at scale, pass group_cols (per-key series) instead.",
        SinglePartitionWarning,
        stacklevel=3,
    )


def ordered_window(
    group_cols: Sequence[str] | None, date_column, op_name: str
) -> WindowSpec:
    """Window partitioned by ``group_cols`` ordered by ``date_column``;
    warns (and still proceeds) when ungrouped."""
    group_cols = list(group_cols or [])
    if group_cols:
        return Window.partitionBy(*group_cols).orderBy(date_column)
    warn_single_partition(op_name)
    return Window.partitionBy().orderBy(date_column)
