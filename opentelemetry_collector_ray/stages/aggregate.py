"""Grouped aggregation with partial (combiner) pre-aggregation.

Collector analog: core performs counting aggregations only — per-stage
item counters and ``LogRecordCount`` (``/root/reference/pdata/plog/
logs.go:17-29``; ``service/documentation.md:9-101``). The north-star
aggregate is per ``(conv_id, role, tool, time-bucket)`` turn counts.

Scale design (SURVEY.md §4.3): a bare ``groupby().aggregate()`` shuffles
every row. Here each batch is first reduced with a vectorized
``pyarrow.Table.group_by`` (the combiner — one output row per distinct key
per batch), and only the partials go through Ray's hash shuffle, then a
final ``groupby().aggregate(Sum)`` merges them. This is the two-phase
partial/final discipline; it also neutralizes hot-key skew for counts
(a hot conv_id contributes ≤1 row per batch to the shuffle — the salting
degenerate case where the batch index acts as the salt).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Max, Mean, Min, Sum


class PartialCountStage:
    """Combiner for count/sum aggregates: batch → one row per distinct key.

    ``value_cols`` maps output-column name -> (input col, "sum").
    Emits ``n_turns`` partial counts plus optional partial sums.
    """

    def __init__(self, keys: list[str], count_name: str = "n_turns",
                 sum_cols: dict[str, str] | None = None):
        self.keys = list(keys)
        self.count_name = count_name
        self.sum_cols = dict(sum_cols or {})

    def __call__(self, batch: pa.Table) -> pa.Table:
        aggs = [([], "count_all")]
        for out, src in self.sum_cols.items():
            aggs.append((src, "sum"))
        g = batch.group_by(self.keys, use_threads=False).aggregate(aggs)
        names = list(self.keys) + [self.count_name] + list(self.sum_cols.keys())
        # pyarrow emits key cols AFTER aggregate cols in some versions; select
        # by generated names to be explicit.
        gen = {"count_all": g.column("count_all")}
        for out, src in self.sum_cols.items():
            gen[out] = g.column(f"{src}_sum")
        cols = {k: g.column(k) for k in self.keys}
        cols[self.count_name] = gen["count_all"].cast(pa.int64())
        for out in self.sum_cols:
            cols[out] = gen[out]
        t = pa.table(cols)
        return t.select(names)


def grouped_count(ds: Dataset, keys: list[str], count_name: str = "n_turns",
                  sum_cols: dict[str, str] | None = None) -> Dataset:
    """Two-phase grouped count/sum: vectorized per-batch partials →
    hash-shuffle of partials only → final Sum merge."""
    partial = ds.map_batches(
        PartialCountStage(keys, count_name=count_name, sum_cols=sum_cols),
        batch_format="pyarrow",
    )
    aggs = [Sum(count_name, alias_name=count_name)]
    for out in (sum_cols or {}):
        aggs.append(Sum(out, alias_name=out))
    return partial.groupby(keys).aggregate(*aggs)


def add_time_bucket(batch: pa.Table, ts_col: str = "ts", unit: str = "hour",
                    out: str = "bucket") -> pa.Table:
    return batch.append_column(out, pc.floor_temporal(batch.column(ts_col), unit=unit))


__all__ = [
    "PartialCountStage", "grouped_count", "add_time_bucket",
    "Count", "Sum", "Mean", "Min", "Max",
]
