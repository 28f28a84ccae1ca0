"""Filter stage — the reference filter library as a vectorized predicate.

``/root/reference/filter/filter.go:7-11`` + ``filter/config.go:12-34``:
a Filter matches a string either **strictly** (exact membership in a set)
or by **regex**; components combine include/exclude filters. Here the same
two modes compile to ``pc.is_in`` / ``pc.match_substring_regex`` masks and
rows are kept/dropped in one Arrow pass (drop == returning a smaller
table, the ErrSkipProcessingData analog of
``processor/processorhelper/logs.go:31-75`` where empty output drops the
batch).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class FilterConfig:
    column: str
    strict: tuple[str, ...] | None = None
    regex: str | None = None

    def __post_init__(self):
        if (self.strict is None) == (self.regex is None):
            raise ValueError("exactly one of strict/regex must be set "
                             "(filter/config.go:42-58 semantics)")

    def mask(self, batch: pa.Table) -> pa.ChunkedArray | pa.Array:
        col = batch.column(self.column)
        if self.strict is not None:
            m = pc.is_in(col, value_set=pa.array(self.strict, pa.string()))
        else:
            m = pc.match_substring_regex(col, pattern=self.regex)
        return pc.fill_null(m, False)


class FilterStage:
    """include/exclude composition: keep rows matching `include` (if set)
    and not matching `exclude` (if set)."""

    def __init__(self, include: FilterConfig | None = None,
                 exclude: FilterConfig | None = None):
        if include is None and exclude is None:
            raise ValueError("at least one of include/exclude required")
        self.include, self.exclude = include, exclude

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = None
        if self.include is not None:
            mask = self.include.mask(batch)
        if self.exclude is not None:
            ex = pc.invert(self.exclude.mask(batch))
            mask = ex if mask is None else pc.and_(mask, ex)
        return batch.filter(mask)
