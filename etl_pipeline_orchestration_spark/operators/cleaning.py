"""Common cleaning stage: full-row dedup + null-row drop.

Parity with reference etl_pipeline.py:181-189 (`clean_common`): pandas
`drop_duplicates()` then `dropna(subset=all columns except "email")`.

Scale notes:
* ``dropDuplicates()`` over all columns is a hash-shuffle on the full row —
  unavoidable for exact dedup; AQE coalesces output partitions.
* The null-drop is a plain filter — pushed to the scan when possible.
* Drop accounting: the reference calls ``len(df)`` before/after. A naive
  Spark port would be two extra ``count()`` jobs that *re-read the source*
  (non-deterministic for a live API). We instead attach
  ``pyspark.sql.Observation`` counters that ride whatever action the caller
  eventually runs — zero extra passes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

# Columns exempt from the null-drop (reference etl_pipeline.py:186 exempts
# "email" because transform_customers null-fills it afterwards).
DEFAULT_NULL_EXEMPT = ("email",)


@dataclass
class CleanStats:
    """Lazily-populated in/out counters for a clean stage."""

    obs_in: Observation = field(default_factory=lambda: Observation("clean_in"))
    obs_out: Observation = field(default_factory=lambda: Observation("clean_out"))

    @property
    def records_in(self) -> int:
        return int(self.obs_in.get["n_in"])

    @property
    def records_out(self) -> int:
        return int(self.obs_out.get["n_out"])

    @property
    def records_dropped(self) -> int:
        return self.records_in - self.records_out


def clean_common(
    df: DataFrame,
    null_exempt: tuple[str, ...] = DEFAULT_NULL_EXEMPT,
    stats: CleanStats | None = None,
) -> DataFrame:
    """Dedup identical rows, then drop rows with NULLs in any non-exempt
    column. If ``stats`` is given, wires in/out row counters that are
    populated by the caller's next action (write/collect) without extra
    jobs.
    """
    if stats is not None:
        df = df.observe(stats.obs_in, F.count(F.lit(1)).alias("n_in"))
    subset = [c for c in df.columns if c not in null_exempt]
    out = df.dropDuplicates().na.drop("any", subset=subset)
    if stats is not None:
        out = out.observe(stats.obs_out, F.count(F.lit(1)).alias("n_out"))
    return out
