from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_sync_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("data-sync-spark-tests", shuffle_partitions=8)
    yield s


def assert_state_equal(actual_pdf, expected_pdf, msg=""):
    """Per-row comparison incl. exact token-array equality."""
    import pandas as pd

    a = actual_pdf.sort_values("doc_id").reset_index(drop=True)
    e = expected_pdf.sort_values("doc_id").reset_index(drop=True)
    assert list(a["doc_id"]) == list(e["doc_id"]), (
        f"{msg} key sets differ: {len(a)} vs {len(e)}; "
        f"only-actual={set(a['doc_id']) - set(e['doc_id'])} "
        f"only-expected={set(e['doc_id']) - set(a['doc_id'])}"
    )
    for col in e.columns:
        if col == "doc_id":
            continue
        for i in range(len(a)):
            av, ev = a[col].iloc[i], e[col].iloc[i]
            if isinstance(ev, (list, tuple)) or (
                ev is not None and hasattr(ev, "__len__") and not isinstance(ev, str)
            ):
                av_l = None if av is None else [int(x) for x in av]
                ev_l = None if ev is None else [int(x) for x in ev]
                assert av_l == ev_l, f"{msg} row {a['doc_id'].iloc[i]} col {col}: {av_l} != {ev_l}"
            else:
                a_nan = av is None or (isinstance(av, float) and pd.isna(av))
                e_nan = ev is None or (isinstance(ev, float) and pd.isna(ev))
                if a_nan and e_nan:
                    continue
                assert av == ev, f"{msg} row {a['doc_id'].iloc[i]} col {col}: {av!r} != {ev!r}"
