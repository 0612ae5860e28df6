"""q_win_streaks island semantics on a crafted fixture: known runs,
duplicate same-day purchases, tie-break between equal-length streaks."""

from __future__ import annotations

import pandas as pd

from gpe.windows import q_win_streaks


def test_streaks_on_crafted_runs(spark, tmp_path):
    rows = []

    def add(uid, days, etype="purchase"):
        for d in days:
            rows.append(
                {
                    "event_id": len(rows),
                    "ts": pd.Timestamp(f"2024-01-{d:02d} 09:00:00"),
                    "user_id": uid,
                    "event_type": etype,
                    "value": 1.0,
                    "props": "{}",
                }
            )

    # user 1: runs of 3 (1-3) and 2 (10-11) → longest 3, starts 01-01
    add(1, [1, 2, 3, 10, 11])
    # user 2: two same-length runs (4-5, 8-9) → tie-break = earliest start
    add(2, [4, 5, 8, 9])
    # user 3: duplicate purchases on one day must not inflate the streak
    add(3, [6, 6, 7])
    # user 4: only non-purchase events → excluded entirely
    add(4, [1, 2, 3], etype="view")
    pd.DataFrame(rows).to_parquet(str(tmp_path / "events.parquet"))

    got = {
        r["user_id"]: (
            r["streak_days"],
            r["streak_start"].day,
            r["streak_end"].day,
        )
        for r in q_win_streaks(spark, str(tmp_path)).collect()
    }
    assert got == {1: (3, 1, 3), 2: (2, 4, 5), 3: (2, 6, 7)}
