"""Relational operators on the TPC-H-ish tables: grouped aggregates and
broadcast joins (small dimension side via ray.put; never a shuffle
join for dimension lookups)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from .pool import auto_pool


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

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native combiner: flag columns grouped via dictionary
        # codes (no Python strings), money in exact scaled int64, one
        # stable sort + reduceat folds (events._grouped_reduceat)
        from .events import _cents, _grouped_reduceat

        rf = pc.dictionary_encode(batch["l_returnflag"]).combine_chunks()
        ls = pc.dictionary_encode(batch["l_linestatus"]).combine_chunks()
        rfc = rf.indices.to_numpy().astype(np.int64)
        lsc = ls.indices.to_numpy().astype(np.int64)
        nls = len(ls.dictionary)
        qty_c = _cents(batch["l_quantity"].to_numpy(zero_copy_only=False))
        ep_c = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc_c = _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        dp_c = ep_c * (100 - disc_c)  # basis points (1e-4)
        key = rfc * nls + lsc
        order, starts, uk = _grouped_reduceat(key)
        return pa.table(
            {
                "l_returnflag": rf.dictionary.take(pa.array(uk // nls)),
                "l_linestatus": ls.dictionary.take(pa.array(uk % nls)),
                "qty_c": np.add.reduceat(qty_c[order], starts),
                "ep_c": np.add.reduceat(ep_c[order], starts),
                "disc_price_c": np.add.reduceat(dp_c[order], starts),
                "disc_c": np.add.reduceat(disc_c[order], starts),
                "count_order": np.diff(np.r_[starts, len(key)]).astype(np.int64),
            }
        )

    # combiner: per-batch partials merged by the bounded-key fan-in
    # tree (6 (returnflag, linestatus) rows — a hash groupby would pay
    # a full all-to-all exchange to merge them; round-3 review #1)
    from .events import merge_partials

    out = merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {
            "qty_c": "sum",
            "ep_c": "sum",
            "disc_price_c": "sum",
            "disc_c": "sum",
            "count_order": "sum",
        },
    )
    n = out["count_order"].astype("int64")
    out["sum_qty"] = out["qty_c"] / 100.0
    out["sum_base_price"] = out["ep_c"] / 100.0
    out["sum_disc_price"] = out["disc_price_c"] / 10000.0
    out["avg_qty"] = out["qty_c"] / 100.0 / n
    out["avg_disc"] = out["disc_c"] / 100.0 / n
    out["count_order"] = n
    return out[
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


BROADCAST_ROW_LIMIT = 20_000_000  # ~320 MB of 2-int64 rows: safe per-actor fetch


def revenue_by_nation(sf_dir: str, broadcast_row_limit: int = BROADCAST_ROW_LIMIT):
    """Revenue per customer nation: lineitem->orders->customer->nation.

    The lineitem->orders join (both sides large at scale) is a
    partitioned hash join on l_orderkey (``Dataset.join`` — hash
    shuffle, both sides co-partitioned; nothing is materialized on the
    driver). The customer x nation side is SIZE-THRESHOLDED: below
    ``broadcast_row_limit`` rows (parquet metadata — no read) it rides
    along as a broadcast keyed Series fetched once per actor; above,
    customer joins orders the same partitioned way orders joins
    lineitem (TPC-H customer grows linearly with sf, so at high scale
    the broadcast would be a multi-GB per-actor fetch — round-3 review
    #2). Both plans produce identical (o_orderkey, n_name) rows."""
    import ray
    import ray.data as rd

    import pyarrow.parquet as _pq

    nation = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    n_cust = _pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8

    if n_cust <= broadcast_row_limit:
        cust = rd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ).to_pandas()
        nat_by_cust = pd.Series(
            cust["c_nationkey"]
            .map(pd.Series(nation["n_name"].to_numpy(), index=nation["n_nationkey"].to_numpy()))
            .to_numpy(),
            index=cust["c_custkey"].to_numpy(),
        )
        cust_ref = ray.put(nat_by_cust)

        class OrderNation:
            def __init__(self):
                self.lookup = ray.get(cust_ref)  # fetched once per actor

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                out = pd.DataFrame(
                    {
                        "o_orderkey": batch["o_orderkey"].to_numpy(),
                        "n_name": pd.Series(batch["o_custkey"].to_numpy())
                        .map(self.lookup)
                        .to_numpy(),
                    }
                )
                return out

        orders_nation = rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        ).map_batches(OrderNation, batch_format="pandas", concurrency=auto_pool())
    else:
        # customer too large to broadcast: partitioned hash join
        # customer x orders on custkey (nation stays a 25-row broadcast
        # applied as a vectorized map after the join)
        nat_ref = ray.put(
            pd.Series(nation["n_name"].to_numpy(), index=nation["n_nationkey"].to_numpy())
        )
        cust_ds = rd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        orders_ds = rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        joined_oc = orders_ds.join(
            cust_ds,
            join_type="inner",
            num_partitions=max(2, min(32, ncpu)),
            on=("o_custkey",),
            right_on=("c_custkey",),
        )

        def add_nation(batch: pd.DataFrame) -> pd.DataFrame:
            lookup = ray.get(nat_ref)
            return pd.DataFrame(
                {
                    "o_orderkey": batch["o_orderkey"].to_numpy(),
                    "n_name": pd.Series(batch["c_nationkey"].to_numpy())
                    .map(lookup)
                    .to_numpy(),
                }
            )

        orders_nation = joined_oc.map_batches(add_nation, batch_format="pandas")

    def derive_rev(batch: pd.DataFrame) -> pd.DataFrame:
        from .events import _cents

        ep_c = _cents(batch["l_extendedprice"].to_numpy())
        disc_c = _cents(batch["l_discount"].to_numpy())
        return pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"].to_numpy(),
                "revenue_c": ep_c * (100 - disc_c),  # basis points, exact
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(derive_rev, batch_format="pandas")

    joined = li.join(
        orders_nation,
        join_type="inner",
        num_partitions=max(2, min(32, ncpu)),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("n_name", as_index=False).agg(
            revenue_c=("revenue_c", "sum"), n_items=("revenue_c", "size")
        )

    # combiner partials -> bounded-key fan-in tree (25 nation rows;
    # no all-to-all for the final merge)
    from .events import merge_partials

    out = merge_partials(
        joined.map_batches(partial, batch_format="pandas"),
        ["n_name"],
        {"revenue_c": "sum", "n_items": "sum"},
    )
    out["revenue"] = out["revenue_c"] / 10000.0
    out["n_items"] = out["n_items"].astype("int64")
    return out[["n_name", "revenue", "n_items"]]


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


def _join_partitions() -> int:
    import ray

    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    return max(2, min(32, ncpu))


DORMANT_CUTOFF = "1998-01-01"


def customers_dormant(sf_dir: str, cutoff_date: str = DORMANT_CUTOFF):
    """Anti-join churn query: customers with no order on/after the
    cutoff, via Ray's native hash-partitioned ``left_anti`` join (both
    sides shuffle by key — the 100-TB shape; neither side is
    driver-materialized). The recency predicate is applied at the
    orders read so only surviving join keys enter the shuffle."""
    import ray.data as rd

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_acctbal"]
    )
    import numpy as np

    cutoff = np.datetime64(cutoff_date, "us")

    def keep_recent(batch: pa.Table) -> pa.Table:
        mask = pc.greater_equal(batch.column("o_orderdate"), pa.scalar(cutoff))
        return batch.filter(mask).select(["o_custkey"])

    recent = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(keep_recent, batch_format="pyarrow")
    return cust.join(
        recent,
        join_type="left_anti",
        num_partitions=_join_partitions(),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )


def customers_dormant_sql(cutoff_date: str = DORMANT_CUTOFF) -> str:
    return f"""
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '{cutoff_date}'
)
"""


CUSTOMERS_DORMANT_SQL = customers_dormant_sql()


def suppliers_of_large_parts(sf_dir: str):
    """Semi-join chain: suppliers that ship at least one part with
    ``p_size >= 40``. The part side is filtered AT THE READ (predicate
    pushed into the parquet scan), reduced to its key column, then two
    native ``left_semi`` hash joins dedupe-and-match without ever
    building a distinct set on the driver."""
    import ray.data as rd

    big_parts = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"]).filter(
        expr="p_size >= 40"
    )
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
    nparts = _join_partitions()
    ship_big = li.join(
        big_parts,
        join_type="left_semi",
        num_partitions=nparts,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_acctbal"]
    )
    return supp.join(
        ship_big,
        join_type="left_semi",
        num_partitions=nparts,
        on=("s_suppkey",),
        right_on=("l_suppkey",),
    )


SUPPLIERS_OF_LARGE_PARTS_SQL = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier s
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 40 AND l.l_suppkey = s.s_suppkey
)
"""
