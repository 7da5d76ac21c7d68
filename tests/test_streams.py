"""Event-stream operators: sessionize / sliding windows / as-of join."""

import numpy as np
import pytest
import ray.data

US = 1_000_000


def _events(rows):
    import pandas as pd

    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
    return ray.data.from_pandas(df.drop(columns=["ts_us"]))


class TestSessionize:
    def test_gap_splits_and_ordinals(self, ray_session):
        from alix_ray.ops.streams import sessionize

        rows = [
            # user 1: two sessions (gap > 30 min between e2 and e3)
            {"event_id": 1, "user_id": 1, "ts_us": 0, "value": 1.0,
             "event_type": "view"},
            {"event_id": 2, "user_id": 1, "ts_us": 1800 * US, "value": 2.0,
             "event_type": "view"},  # exactly the gap → SAME session
            {"event_id": 3, "user_id": 1, "ts_us": 1800 * US + 1801 * US,
             "value": 4.0, "event_type": "view"},
            # user 2: one session
            {"event_id": 4, "user_id": 2, "ts_us": 50, "value": 8.0,
             "event_type": "view"},
        ]
        out = sessionize(_events(rows), gap_sec=1800).to_pandas()
        out = out.sort_values(["user_id", "session_ord"]).reset_index(drop=True)
        assert out[["user_id", "session_ord", "n_events"]].values.tolist() == [
            [1, 1, 2], [1, 2, 1], [2, 1, 1]]
        assert out["total_value"].tolist() == [3.0, 4.0, 8.0]
        assert out.loc[0, "start_us"] == 0 and out.loc[0, "end_us"] == 1800 * US

    def test_tie_order_deterministic(self, ray_session):
        from alix_ray.ops.streams import sessionize

        rows = [{"event_id": i, "user_id": 7, "ts_us": 0, "value": 1.0,
                 "event_type": "view"} for i in (5, 3, 9)]
        out = sessionize(_events(rows)).to_pandas()
        assert len(out) == 1 and out.iloc[0]["n_events"] == 3


class TestSlidingWindows:
    def test_event_lands_in_window_over_slide_copies(self, ray_session):
        from alix_ray.ops.streams import sliding_window_agg

        rows = [{"event_id": 1, "user_id": 1, "ts_us": 3600 * US,
                 "value": 2.5, "event_type": "click"}]
        out = sliding_window_agg(_events(rows), window_sec=3600,
                                 slide_sec=900).to_pandas()
        # windows starting at 900s steps covering t=3600: (0,3600] → 4
        # starts: 900,1800,2700,3600
        ws = sorted(out["window_start_us"].tolist())
        assert ws == [900 * US, 1800 * US, 2700 * US, 3600 * US]
        assert set(out["n"]) == {1} and set(out["total_value"]) == {2.5}

    def test_boundary_exclusive(self, ray_session):
        from alix_ray.ops.streams import sliding_window_agg

        # event exactly at window END (start + window) must NOT count:
        # window [0, 3600) excludes t=3600
        rows = [{"event_id": 1, "user_id": 1, "ts_us": 3600 * US,
                 "value": 1.0, "event_type": "click"}]
        out = sliding_window_agg(_events(rows), window_sec=3600,
                                 slide_sec=900).to_pandas()
        assert 0 not in set(out["window_start_us"])


class TestAsofAttribution:
    def test_most_recent_within_horizon(self, ray_session):
        from alix_ray.ops.streams import asof_attribution

        rows = [
            {"event_id": 1, "user_id": 1, "ts_us": 100 * US, "value": 0.0,
             "event_type": "click"},
            {"event_id": 2, "user_id": 1, "ts_us": 200 * US, "value": 0.0,
             "event_type": "click"},
            {"event_id": 3, "user_id": 1, "ts_us": 250 * US, "value": 0.0,
             "event_type": "purchase"},  # → click 2
            {"event_id": 4, "user_id": 1, "ts_us": 90000 * US + 200 * US,
             "value": 0.0, "event_type": "purchase"},  # horizon passed
            {"event_id": 5, "user_id": 2, "ts_us": 500 * US, "value": 0.0,
             "event_type": "purchase"},  # no clicks at all
        ]
        out = asof_attribution(_events(rows), horizon_sec=86400).to_pandas()
        out = out.set_index("event_id")
        assert out.loc[3, "src_event_id"] == 2
        assert out.loc[3, "lag_us"] == 50 * US
        assert out.loc[4, "src_event_id"] == -1
        assert out.loc[5, "src_event_id"] == -1

    def test_strictly_earlier_and_tie_rule(self, ray_session):
        from alix_ray.ops.streams import asof_attribution

        rows = [
            {"event_id": 1, "user_id": 1, "ts_us": 100 * US, "value": 0.0,
             "event_type": "click"},
            {"event_id": 2, "user_id": 1, "ts_us": 100 * US, "value": 0.0,
             "event_type": "click"},  # same ts — higher id wins
            {"event_id": 3, "user_id": 1, "ts_us": 100 * US, "value": 0.0,
             "event_type": "purchase"},  # click at SAME ts not earlier
            {"event_id": 4, "user_id": 1, "ts_us": 101 * US, "value": 0.0,
             "event_type": "purchase"},
        ]
        out = asof_attribution(_events(rows)).to_pandas().set_index("event_id")
        assert out.loc[3, "src_event_id"] == -1
        assert out.loc[4, "src_event_id"] == 2


class TestRelational:
    def test_broadcast_join_agg_inner_semantics(self, ray_session):
        from alix_ray.ops.relational import broadcast_join_agg

        large = ray.data.from_items([
            {"k": 1, "v": 10.0}, {"k": 1, "v": 5.0},
            {"k": 2, "v": 7.0}, {"k": 99, "v": 100.0},  # 99 misses
        ])
        df = broadcast_join_agg(
            large, "k", np.array([2, 1]), ["beta", "alpha"], "v")
        assert df.values.tolist() == [["alpha", 15.0, 2], ["beta", 7.0, 1]]

    def test_pricing_summary_filters_and_sums(self, ray_session):
        import pandas as pd

        from alix_ray.ops.relational import pricing_summary

        rows = pd.DataFrame({
            "l_returnflag": ["A", "A", "N"],
            "l_linestatus": ["F", "F", "O"],
            "l_quantity": [1.0, 2.0, 4.0],
            "l_extendedprice": [10.0, 20.0, 40.0],
            "l_discount": [0.1, 0.0, 0.5],
            "l_shipdate": pd.to_datetime(
                ["1998-01-01", "1998-02-01", "1999-01-01"]),
        })
        cutoff = int(pd.Timestamp("1998-12-31", tz="UTC").timestamp() * 1_000_000)
        df = pricing_summary(ray.data.from_pandas(rows), cutoff)
        assert len(df) == 1  # the 1999 row is filtered
        r = df.iloc[0]
        assert r["sum_qty"] == 3.0 and r["sum_base_price"] == 30.0
        assert r["sum_disc_price"] == 29.0 and r["n"] == 2


class TestRangeJoin:
    def test_counts_across_bucket_boundaries(self, ray_session):
        from alix_ray.ops.streams import range_join_count

        # radius 10s → buckets of 20s; matches straddle the probe's
        # bucket boundary on both sides
        rows = [
            {"event_id": 1, "user_id": 1, "ts_us": 20 * US, "value": 0.0,
             "event_type": "purchase"},   # bucket 1 start
            {"event_id": 2, "user_id": 2, "ts_us": 11 * US, "value": 0.0,
             "event_type": "error"},      # bucket 0, within 10s
            {"event_id": 3, "user_id": 3, "ts_us": 30 * US, "value": 0.0,
             "event_type": "error"},      # bucket 1, exactly radius
            {"event_id": 4, "user_id": 4, "ts_us": 31 * US, "value": 0.0,
             "event_type": "error"},      # outside radius
            {"event_id": 5, "user_id": 5, "ts_us": 500 * US, "value": 0.0,
             "event_type": "purchase"},   # no matches → 0 row
        ]
        out = range_join_count(_events(rows), radius_sec=10).to_pandas()
        out = out.set_index("event_id")
        assert out.loc[1, "n_matches"] == 2
        assert out.loc[5, "n_matches"] == 0
