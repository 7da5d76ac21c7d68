"""Relational patterns over the TPC-H-ish tables: broadcast-side join
and combine-before-shuffle aggregation — the two shuffle-avoidance
disciplines of the graft brief, demonstrated as first-class oracled
operators (the reference engine is fulltext-only; these cover the
§2.4/§2.5 join+aggregate shapes at warehouse scale).

- :func:`broadcast_join_agg` — the LARGE side streams through
  ``map_batches``; the small side ships ONCE via ``ray.put`` as sorted
  numpy arrays (binary-search lookup, no Python dict of N entries);
  per-batch partial aggregates are the only thing that leaves a task.
- :func:`pricing_summary` — TPC-H Q1 shape: per-batch Arrow
  ``group_by`` partials (combine-before-shuffle), merged by one tiny
  driver reduce.  Nothing corpus-sized moves; at 10^12 rows the final
  merge is 4 groups × #blocks partial rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def broadcast_join_agg(large: ray.data.Dataset, key_col: str,
                       lookup_keys: np.ndarray, lookup_vals: list[str],
                       value_col: str):
    """Σ value per lookup value, joining map-side against a broadcast
    (sorted-key) dictionary.  Returns a pandas frame
    ``(name, total, n)`` — name = the joined dimension value.

    ``lookup_keys`` may arrive in any order (sorted internally with
    their values); rows whose key misses the dictionary are dropped
    (inner-join semantics).
    """
    import pandas as pd

    order = np.argsort(lookup_keys)
    keys = np.ascontiguousarray(lookup_keys[order])
    names = np.asarray(lookup_vals, dtype=object)[order]
    # dimension ids are dense → per-batch partials are tiny arrays
    ref = ray.put((keys, names))

    def partial(batch: pa.Table) -> pa.Table:
        k, nm = ray.get(ref)
        bk = batch[key_col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(k, bk)
        idx_c = np.minimum(idx, len(k) - 1)
        hit = k[idx_c] == bk
        vals = batch[value_col].to_numpy(zero_copy_only=False)[hit]
        gi = idx_c[hit]
        # distinct joined names in this batch → partial rows
        uniq, inv = np.unique(gi, return_inverse=True)
        tot = np.bincount(inv, weights=vals)
        cnt = np.bincount(inv)
        return pa.table({
            "name": pa.array(nm[uniq].tolist(), pa.string()),
            "total": pa.array(tot, pa.float64()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    parts = pa.concat_tables(
        ray.get(large.map_batches(
            partial, batch_format="pyarrow").materialize().to_arrow_refs())
    )
    g = parts.group_by("name").aggregate([("total", "sum"), ("n", "sum")])
    df = pd.DataFrame({
        "name": g["name"].to_pylist(),
        "total": np.round(g["total_sum"].to_numpy(), 2),
        "n": g["n_sum"].to_numpy().astype(np.int64),
    })
    return df.sort_values("name").reset_index(drop=True)


def pricing_summary(lineitem: ray.data.Dataset, cutoff_us: int):
    """TPC-H Q1 shape: per (returnflag, linestatus) sums over lineitem
    rows with ``l_shipdate`` ≤ cutoff — per-batch Arrow group_by
    partials, one small final merge.  Sum columns only (exact decimal
    multiples → deterministic rounding across summation orders)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        ship = pc.cast(pc.cast(batch["l_shipdate"], pa.timestamp("us")),
                       pa.int64())
        t = batch.filter(pc.less_equal(ship, cutoff_us))
        if t.num_rows == 0:
            return pa.table({
                "l_returnflag": pa.array([], pa.string()),
                "l_linestatus": pa.array([], pa.string()),
                "sum_qty": pa.array([], pa.float64()),
                "sum_base_price": pa.array([], pa.float64()),
                "sum_disc_price": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
            })
        disc_price = pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t = pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": t["l_quantity"],
            "price": t["l_extendedprice"],
            "disc_price": disc_price,
        })
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price", "sum"), ("disc_price", "sum"),
             ("qty", "count")])
        return pa.table({
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "sum_qty": g["qty_sum"],
            "sum_base_price": g["price_sum"],
            "sum_disc_price": g["disc_price_sum"],
            "n": pc.cast(g["qty_count"], pa.int64()),
        })

    parts = pa.concat_tables(
        ray.get(lineitem.map_batches(
            partial, batch_format="pyarrow").materialize().to_arrow_refs())
    )
    g = parts.group_by(["l_returnflag", "l_linestatus"]).aggregate(
        [("sum_qty", "sum"), ("sum_base_price", "sum"),
         ("sum_disc_price", "sum"), ("n", "sum")])
    df = pd.DataFrame({
        "l_returnflag": g["l_returnflag"].to_pylist(),
        "l_linestatus": g["l_linestatus"].to_pylist(),
        "sum_qty": np.round(g["sum_qty_sum"].to_numpy(), 2),
        "sum_base_price": np.round(g["sum_base_price_sum"].to_numpy(), 2),
        "sum_disc_price": np.round(g["sum_disc_price_sum"].to_numpy(), 4),
        "n": g["n_sum"].to_numpy().astype(np.int64),
    })
    return df.sort_values(["l_returnflag", "l_linestatus"]).reset_index(
        drop=True)
