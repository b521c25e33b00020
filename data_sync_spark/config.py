"""Pipeline configuration (reference ``[[mysql_task]]`` analog).

Mirrors ``MysqlTaskConfig`` (``/root/reference/src/infrastructure/config/
config.go:63-79`` / ``conf/iot.sync.toml:36-47``): data mode, include/
exclude routing, per-source column filters, per-source upsert flag, plus the
custom transform hook name. JSON-serializable so it can ride along with a
spark-submit job.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field


@dataclass
class PipelineConfig:
    data_mode: str = "ALL"  # ALL | PART
    include_sources: list[str] = field(default_factory=list)
    exclude_sources: list[str] = field(default_factory=list)
    # per-source payload columns to filter out (key cols never filtered)
    filter_cols: dict[str, list[str]] = field(default_factory=dict)
    # per-source upsert flag; sources absent here take `default_upsert`.
    # NOTE: the reference defaults unknown tables to append mode (IsUpsert
    # returns false, regular_base.go:44-49); our default is True because the
    # north-star flagship is the MERGE/upsert path — set
    # default_upsert=False for reference-faithful insert-only semantics.
    upsert: dict[str, bool] = field(default_factory=dict)
    # applies to sources not listed in `upsert`
    default_upsert: bool = True
    # named transform from operators.transforms registry
    transform: str | None = None
    # keep unknown event columns and evolve the target schema
    evolve_schema: bool = True
    # max concurrent per-table MERGE jobs in multi-table batches (reference
    # per-table goroutines, mysql_handler.go:528-539); 1 = sequential
    merge_parallelism: int = 4

    def to_json(self) -> str:
        return json.dumps(asdict(self))

    @classmethod
    def from_json(cls, s: str) -> "PipelineConfig":
        return cls(**json.loads(s))


ALL_UPSERT = PipelineConfig()
