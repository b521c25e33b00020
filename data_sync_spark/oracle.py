"""Single-threaded dict-replay oracle — the correctness golden model.

Replays a change feed exactly the way the reference applies it: one event at
a time, in ``(log_offset, seq)`` order, through the filter → transform →
route semantics of ``mysql_filter_service.go`` and the serializer dispatch
of ``serializer.go:33-45`` (INSERT errors on duplicate key → event dropped
after retries, ``mysql_handler.go:107-119``; UPDATE of a missing row is a
no-op; DELETE of a missing row is a no-op; UPSERT overwrites).

~80 lines of obviously-correct Python over pandas rows. Tests compare the
LakeTable's final state against this, per-row, with exact token-array
equality (``BASELINE.json`` input_hint).
"""

from __future__ import annotations

from typing import Any

import pandas as pd

from data_sync_spark.config import PipelineConfig


def _route_keep(cfg: PipelineConfig, source: Any) -> bool:
    # exact truth table of regular_base.go:15-35 (see operators/route.py)
    if cfg.data_mode == "ALL":
        return True
    inc, exc = set(cfg.include_sources), set(cfg.exclude_sources)
    if source in inc:
        return True
    if source in exc:
        return False
    if exc and not inc:
        return True
    return False


def _upsert_mode(cfg: PipelineConfig, source: Any) -> bool:
    return cfg.upsert.get(source, cfg.default_upsert)


def replay(
    events: pd.DataFrame,
    cfg: PipelineConfig | None = None,
    target_cols: list[str] | None = None,
    key_cols: tuple[str, ...] = ("doc_id",),
    initial_state: dict[tuple, dict[str, Any]] | None = None,
    record_version: bool = False,
) -> dict[tuple, dict[str, Any]]:
    """Serial replay → {key tuple: row dict}. ``initial_state`` seeds the
    replay (e.g. to chain replays under different configs across a hot
    config reload). ``events`` columns: op,
    key column(s), log_offset, seq + payload. Composite keys are tuples
    (reference MQ path zips multi-column pks,
    ``mysql_filter_service.go:90-93``). Exact duplicate deliveries of an
    event are naturally idempotent for upsert/update/delete and are dropped
    for plain insert — identical to replaying the reference's at-least-once
    feed."""
    cfg = cfg or PipelineConfig()
    payload_cols = [
        c for c in events.columns if c not in ("op", "log_offset", "seq")
    ]
    if target_cols is not None:
        payload_cols = [c for c in payload_cols if c in target_cols]

    state: dict[tuple, dict[str, Any]] = dict(initial_state or {})
    ordered = events.sort_values(["log_offset", "seq"], kind="stable")
    for row in ordered.itertuples(index=False):
        d = row._asdict()
        source = d.get("source")
        if not _route_keep(cfg, source):
            continue
        key = tuple(d[k] for k in key_cols)
        op = d["op"]
        filtered = set(cfg.filter_cols.get(source, [])) - set(key_cols)
        payload = {}
        for c in payload_cols:
            payload[c] = None if c in filtered else d.get(c)
        upsert = _upsert_mode(cfg, source)
        if record_version:
            # expose the applied LWW version (the engine's per-row _ver)
            # so change-feed tests can detect winner replacement even when
            # the payload image is unchanged
            payload["_applied"] = (d["log_offset"], d["seq"])
        if op == "delete":
            state.pop(key, None)
        elif op == "insert":
            if key in state and not upsert:
                continue  # duplicate-key INSERT dropped (mysql_handler.go:107-119)
            state[key] = payload
        elif op == "update":
            if key not in state:
                if upsert:
                    state[key] = payload
                continue  # UPDATE matched 0 rows → no-op
            state[key] = payload
    return state


def replay_to_pandas(
    events: pd.DataFrame,
    cfg: PipelineConfig | None = None,
    target_cols: list[str] | None = None,
    key_cols: tuple[str, ...] = ("doc_id",),
) -> pd.DataFrame:
    state = replay(events, cfg, target_cols, key_cols=key_cols)
    cols = target_cols
    if cols is None:
        cols = [c for c in events.columns if c not in ("op", "log_offset", "seq")]
    rows = [{**dict(zip(key_cols, k)), **v} for k, v in state.items()]
    df = pd.DataFrame(rows, columns=list(dict.fromkeys([*key_cols, *cols])))
    return df.sort_values(list(key_cols)).reset_index(drop=True)
