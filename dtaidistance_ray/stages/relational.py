"""Relational operators on the TPC-H-ish tables: grouped aggregates and
broadcast joins (small dimension side via ray.put; never a shuffle
join for dimension lookups)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1-style pricing summary (column-pruned read, vectorized
    Arrow expressions, one grouped aggregate). Money columns are
    2-decimal, so sums run as exact scaled int64 (cents / basis points)
    and divide back to doubles — bit-identical to the SQL oracle."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def derive(batch: pd.DataFrame) -> pd.DataFrame:
        qty_c = np.round(batch["l_quantity"].to_numpy() * 100).astype(np.int64)
        ep_c = np.round(batch["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.round(batch["l_discount"].to_numpy() * 100).astype(np.int64)
        out = batch[["l_returnflag", "l_linestatus"]].copy()
        out["qty_c"] = qty_c
        out["ep_c"] = ep_c
        out["disc_c"] = disc_c
        out["disc_price_c"] = ep_c * (100 - disc_c)  # basis points (1e-4)
        return out

    out = (
        ds.map_batches(derive, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="qty_c"),
            Sum("ep_c", alias_name="ep_c"),
            Sum("disc_price_c", alias_name="disc_price_c"),
            Sum("disc_c", alias_name="disc_c"),
            Count(alias_name="count_order"),
        )
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["count_order"].astype("int64")
        batch["sum_qty"] = batch["qty_c"] / 100.0
        batch["sum_base_price"] = batch["ep_c"] / 100.0
        batch["sum_disc_price"] = batch["disc_price_c"] / 10000.0
        batch["avg_qty"] = batch["qty_c"] / 100.0 / n
        batch["avg_disc"] = batch["disc_c"] / 100.0 / n
        batch["count_order"] = n
        return batch[
            [
                "l_returnflag",
                "l_linestatus",
                "sum_qty",
                "sum_base_price",
                "sum_disc_price",
                "avg_qty",
                "avg_disc",
                "count_order",
            ]
        ]

    return out.map_batches(finish, batch_format="pandas")


LINEITEM_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS sum_disc_price,
       sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 / count(*) AS avg_qty,
       sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0 / count(*) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def revenue_by_nation(sf_dir: str):
    """Revenue per customer nation: lineitem->orders->customer->nation.

    The dimension chain (customer x nation) is small: broadcast it as a
    dict via ray.put and map orders->nation inside map_batches; the only
    shuffle is the final tiny groupby. orders->lineitem is the large
    side and is joined by broadcast of the orderkey->nation map when it
    fits (documented cutoff; at 100 TB this becomes the bucketed
    hash-join pattern on l_orderkey)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]).to_pandas()
    cust_nation = dict(
        zip(
            cust["c_custkey"].astype(int),
            cust["c_nationkey"].map(dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))),
        )
    )
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]).to_pandas()
    order_nation = {
        int(ok): cust_nation.get(int(ck)) for ok, ck in zip(orders["o_orderkey"], orders["o_custkey"])
    }
    ref = ray.put(order_nation)

    class JoinRev:
        def __init__(self):
            self.lookup = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            batch["n_name"] = [self.lookup.get(int(k)) for k in batch["l_orderkey"]]
            ep_c = np.round(batch["l_extendedprice"].to_numpy() * 100).astype(np.int64)
            disc_c = np.round(batch["l_discount"].to_numpy() * 100).astype(np.int64)
            batch["revenue_c"] = ep_c * (100 - disc_c)  # basis points
            return batch[["n_name", "revenue_c"]]

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )
    out = (
        li.map_batches(JoinRev, batch_format="pandas", concurrency=2)
        .groupby("n_name")
        .aggregate(Sum("revenue_c", alias_name="revenue_c"), Count(alias_name="n_items"))
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["revenue"] = batch["revenue_c"] / 10000.0
        batch["n_items"] = batch["n_items"].astype("int64")
        return batch[["n_name", "revenue", "n_items"]]

    return out.map_batches(finish, batch_format="pandas")


REVENUE_BY_NATION_SQL = """
SELECT n.n_name AS n_name,
       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""
