"""Text stages: extraction, language filter, quality/token metrics.

All are ``map_batches(batch_format="pyarrow")`` callables. The
extraction stage drops the wide ``html`` binary column the moment text
is extracted (SURVEY.md §7 hard part 6 — keeps downstream blocks
small). Regexes are compiled at module import, once per worker
process.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mapchete_xarray_ray.functions.extract import extract_text


def extract_stage(batch: pa.Table) -> pa.Table:
    """html -> text (byte-identical kernel), then PROJECT AWAY html."""
    htmls = batch.column("html").to_pylist()
    texts = pa.array([extract_text(h) for h in htmls], pa.string())
    batch = batch.drop_columns(["html"])
    if "text" in batch.column_names:
        batch = batch.drop_columns(["text"])
    return batch.append_column("text", texts)


def lang_filter_fn(langs: set[str]):
    """Vectorized predicate inside map_batches (faster than ds.filter)."""
    allowed = pa.array(sorted(langs), pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("lang"), value_set=allowed))

    return fn


def token_count_stage(batch: pa.Table, col: str = "text") -> pa.Table:
    """Whitespace token count, matching DuckDB
    ``array_length(regexp_split_to_array(trim(text), '\\s+'))``."""
    trimmed = pc.utf8_trim_whitespace(batch.column(col))
    toks = pc.split_pattern_regex(trimmed, r"\s+")
    return batch.append_column("n_tokens", pc.list_value_length(toks).cast(pa.int64()))
