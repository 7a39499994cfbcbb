"""Run / per-source health metrics (control plane).

Parity with the reference's monitoring surface: PipelineStatus /
DataSource enums (reference etl_pipeline.py:33-45), PipelineMetric
(:48-70) and PipelineRun (:72-85) dataclasses, including the derived
duration / drop-rate / uptime metrics the reference persists to its
``pipeline_health`` table.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone
from enum import Enum


class PipelineStatus(Enum):
    PENDING = "PENDING"
    RUNNING = "RUNNING"
    SUCCESS = "SUCCESS"
    FAILED = "FAILED"
    SKIPPED = "SKIPPED"


class DataSource(Enum):
    CSV_FILE = "csv_file"
    JSON_API = "json_api"
    SQL_DATABASE = "sql_database"
    EXCEL_FILE = "excel_file"
    FLAT_FILE = "flat_file"
    LOG_FILE = "log_file"


@dataclass
class PipelineMetric:
    source_name: str
    source_type: str
    records_in: int = 0
    records_out: int = 0
    records_dropped: int = 0
    start_time: datetime | None = None
    end_time: datetime | None = None
    status: str = PipelineStatus.PENDING.value
    error_message: str = ""

    @property
    def duration_seconds(self) -> float:
        if self.start_time and self.end_time:
            return (self.end_time - self.start_time).total_seconds()
        return 0.0

    @property
    def drop_rate(self) -> float:
        if self.records_in > 0:
            return round(self.records_dropped / self.records_in * 100, 2)
        return 0.0


@dataclass
class PipelineRun:
    run_id: str = field(
        default_factory=lambda: f"RUN_{datetime.now().strftime('%Y%m%d_%H%M%S')}"
    )
    # tz-aware UTC everywhere: the orchestrator stamps end times with
    # timezone.utc, and naive/aware mixing cannot subtract
    start_time: datetime = field(default_factory=lambda: datetime.now(timezone.utc))
    end_time: datetime | None = None
    metrics: list[PipelineMetric] = field(default_factory=list)
    total_records: int = 0
    status: str = PipelineStatus.RUNNING.value

    @property
    def uptime_pct(self) -> float:
        total = len(self.metrics)
        if total == 0:
            return 0.0
        success = sum(
            1 for m in self.metrics if m.status == PipelineStatus.SUCCESS.value
        )
        return round(success / total * 100, 1)
