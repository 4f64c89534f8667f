"""Zero-copy views over Arrow variable-length binary/string buffers.

Every vectorized kernel that walks payload bytes (document
fingerprints, BPE token counts, image/audio fake decodes) needs the
same preamble: the column's offsets and values buffers as numpy views.
Hand-rolled copies of that preamble have two sharp edges that each
copy must get right independently:

- ``large_binary``/``large_string`` (Arrow auto-promotes past 2 GiB)
  carry **int64** offsets; reading them as int32 silently misdecodes
  byte segments.
- Sliced arrays share the parent's buffers; the offsets buffer starts
  ``col.offset`` entries before the slice's first element.

This module is the single owner of that logic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def binary_offsets_and_data(
    col, *, allow_string: bool = False, name: str = "payload",
) -> tuple[np.ndarray, np.ndarray, int]:
    """Return ``(offsets, raw, n)`` — a zero-copy view of a
    binary/large_binary column (optionally string/large_string, cast
    zero-copy to binary when ``allow_string``).

    ``offsets`` is an int64 array of ``n + 1`` ABSOLUTE positions into
    ``raw`` (the values buffer as uint8): row ``i``'s bytes are
    ``raw[offsets[i]:offsets[i + 1]]``. Null entries read as empty
    segments. Non-conforming column types raise ``TypeError`` (loud,
    per the review contract) rather than guessing.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if allow_string and (pa.types.is_string(t) or pa.types.is_large_string(t)):
        # utf-8 string -> binary is a buffer-reuse cast (same bytes)
        col = col.cast(
            pa.large_binary() if pa.types.is_large_string(t) else pa.binary())
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
    elif not (pa.types.is_binary(t) or pa.types.is_large_binary(t)):
        kinds = "binary/large_binary"
        if allow_string:
            kinds += "/string/large_string"
        raise TypeError(f"column {name!r} must be {kinds}, got {t}")
    n = len(col)
    off0 = col.offset
    odt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    offsets = np.frombuffer(col.buffers()[1], dtype=odt,
                            count=off0 + n + 1)[off0:].astype(np.int64)
    data_buf = col.buffers()[2]
    raw = (np.frombuffer(data_buf, dtype=np.uint8)
           if data_buf is not None else np.empty(0, np.uint8))
    return offsets, raw, n
