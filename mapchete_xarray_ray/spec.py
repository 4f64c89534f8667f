"""Job specification — the engine's equivalent of a ``.mapchete`` config.

Same keys and the same validation guards as the reference driver
(mapchete_xarray/_output.py — M9 in SURVEY.md §2.2):

- pixelbuffer must be 0            (_output.py:42-45)
- output path must end ``.zarr``   (_output.py:51-52)
- exactly one zoom level           (_output.py:343-344)
- a time axis needs ``pattern`` or ``steps`` (_output.py:345-350)
- band count via ``bands`` or ``band_names`` (_output.py:56-63)

The spec is a plain dataclass — cheap to ship inside task closures.
Derived geometry (snapped bounds, global array shape, pixel sizes) is
computed once here, mirroring _output.py:71-94.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Any

import numpy as np

from mapchete_xarray_ray.grid import Bounds, TilePyramid, output_shape

DEFAULT_TIME_CHUNKSIZE = 8  # _output.py:32


class JobSpecError(ValueError):
    """Equivalent of MapcheteConfigError for spec validation failures."""


_COMPRESSION_CODECS = ("zlib", "bz2", "lzma")


def parse_compression(value) -> tuple[str, int] | None:
    """Normalize a chunk-compression spec to ``(codec, level)`` or
    ``None`` (raw).

    Accepts an int 0-9 (0 = raw, 1-9 = zlib level — the historical
    surface) or a string ``"raw"`` / ``"<codec>[:level]"`` with codec
    one of zlib / bz2 / lzma (the stdlib codecs every numcodecs-based
    zarr reader decodes; the reference instead sweeps blosc variants in
    tests/compression_tests.py:27-56 — blosc isn't available here).
    Level defaults to 1 (speed-leaning, matching the zlib default);
    raises :class:`JobSpecError` on anything else so a typo'd codec
    fails loud at spec time, not at first chunk write."""
    if isinstance(value, bool):
        raise JobSpecError(f"invalid compression spec: {value!r}")
    if isinstance(value, str):
        v = value.strip().lower()
        if v.lstrip("-").isdigit():
            value = int(v)
        elif v in ("raw", "none", ""):
            return None
        else:
            codec, _, lvl = v.partition(":")
            if codec not in _COMPRESSION_CODECS:
                raise JobSpecError(
                    f"compression codec must be one of "
                    f"{'/'.join(_COMPRESSION_CODECS)} or 'raw', got {value!r}")
            try:
                level = int(lvl) if lvl else 1
            except ValueError:
                raise JobSpecError(
                    f"invalid compression level in {value!r}") from None
            if not 1 <= level <= 9:
                raise JobSpecError(
                    f"compression level must be 1-9, got {value!r}")
            return (codec, level)
    if isinstance(value, int):
        if not 0 <= value <= 9:
            raise JobSpecError(
                f"compression must be 0 (raw) or a zlib level 1-9, "
                f"got {value!r}")
        return ("zlib", value) if value else None
    raise JobSpecError(f"invalid compression spec: {value!r}")


def _parse_cron_field(field: str, lo: int, hi: int, pattern: str) -> set[int]:
    """One cron field -> the set of matching values. Supports ``*``,
    ints, ranges ``a-b``, lists ``a,b,c`` and steps ``*/n`` / ``a-b/n``
    (standard 5-field cron; dow accepts 7 as an alias for Sunday=0)."""
    vals: set[int] = set()
    for item in field.split(","):
        step = 1
        if "/" in item:
            item, s = item.split("/", 1)
            if not s.isdigit() or int(s) < 1:
                raise JobSpecError(f"unsupported cron pattern: {pattern!r}")
            step = int(s)
        try:
            if item == "*":
                a, b = lo, hi
            elif "-" in item:
                a, b = (int(x) for x in item.split("-", 1))
            else:
                a = b = int(item)
        except ValueError:
            raise JobSpecError(f"unsupported cron pattern: {pattern!r}") from None
        if not (lo <= a <= hi and lo <= b <= hi and a <= b):
            raise JobSpecError(f"unsupported cron pattern: {pattern!r}")
        vals.update(range(a, b + 1, step))
    return vals


def _expand_pattern(start: datetime, end: datetime, pattern: str) -> list[datetime]:
    """Full 5-field cron expansion over [start, end], both inclusive —
    the stdlib equivalent of the reference's ``croniter_range``
    (_output.py:641-649): minute, hour, day-of-month, month,
    day-of-week with lists/ranges/steps, and the standard cron OR rule
    when BOTH day fields are restricted. Enumeration walks days (not
    minutes), so multi-year ranges stay cheap.
    """
    fields = pattern.split()
    if len(fields) != 5:
        raise JobSpecError(f"unsupported cron pattern: {pattern!r}")
    minutes = sorted(_parse_cron_field(fields[0], 0, 59, pattern))
    hours = sorted(_parse_cron_field(fields[1], 0, 23, pattern))
    doms = _parse_cron_field(fields[2], 1, 31, pattern)
    months = _parse_cron_field(fields[3], 1, 12, pattern)
    dows = {v % 7 for v in _parse_cron_field(fields[4], 0, 7, pattern)}
    dom_any = fields[2] == "*"
    dow_any = fields[4] == "*"

    out: list[datetime] = []
    day = start.replace(hour=0, minute=0, second=0, microsecond=0)
    while day <= end:
        if day.month in months:
            dom_ok = day.day in doms
            dow_ok = (day.weekday() + 1) % 7 in dows  # cron: Sunday=0
            # standard cron: if both day fields are restricted, either
            # may match; otherwise the restricted one (or any) decides
            if (dom_ok and dow_ok) if (dom_any and dow_any) else (
                    (dom_ok or dow_ok) if (not dom_any and not dow_any)
                    else (dom_ok if not dom_any else dow_ok)):
                for h in hours:
                    for m in minutes:
                        t = day.replace(hour=h, minute=m)
                        if start <= t <= end:
                            out.append(t)
        day += timedelta(days=1)
    return out


@dataclass
class JobSpec:
    path: str
    zoom: int
    bounds: tuple[float, float, float, float]
    grid: str = "geodetic"
    metatiling: int = 1
    pixelbuffer: int = 0
    tile_size: int = 256
    dtype: str = "uint8"
    nodata: float = 0
    bands: int | None = None
    band_names: list[str] | None = None
    time: dict[str, Any] | None = None
    x_axis_name: str = "X"
    y_axis_name: str = "Y"
    band_axis_name: str = "band"
    time_axis_name: str = "time"
    area_or_point: str = "Area"
    cell_zoom: int | None = None  # fine zoom for the Morton cell index
    # chunk compression: 0/"raw", int 1-9 (zlib level), or
    # "<codec>[:level]" with codec zlib/bz2/lzma — see
    # :func:`parse_compression` (the reference sweeps blosc codecs,
    # tests/compression_tests.py:27-56; blosc isn't available here, so
    # the breadth is the stdlib codecs every numcodecs reader decodes).
    # A storage detail: recorded per-band in .zarray, NOT in the job
    # metadata compat check — readers decode by archive metadata.
    compression: int | str = 1

    # derived (filled in __post_init__)
    pyramid: TilePyramid = field(init=False, repr=False)
    snapped_bounds: Bounds = field(init=False)
    shape: tuple[int, int] = field(init=False)
    timestamps: np.ndarray | None = field(init=False, default=None)

    def __post_init__(self):
        if self.pixelbuffer > 0:
            raise JobSpecError("a pixelbuffer larger than 0 is not allowed with zarr")
        parse_compression(self.compression)  # fail loud on a bad spec
        if not str(self.path).endswith(".zarr"):
            raise JobSpecError("output path must end with .zarr")
        if isinstance(self.zoom, (list, tuple)):
            if len(self.zoom) > 1:
                raise JobSpecError("zarr output can only be used with a single zoom")
            self.zoom = int(self.zoom[0])
        if self.band_names:
            self.count = len(self.band_names)
        elif self.bands:
            self.count = int(self.bands)
            self.band_names = [f"Band{i}" for i in range(1, self.count + 1)]
        else:
            raise JobSpecError("either 'bands' or 'band_names' has to be provided")
        if self.time is not None:
            if "pattern" not in self.time and "steps" not in self.time:
                raise JobSpecError(
                    "when using a time axis, please specify the time stamps "
                    "either through 'pattern' or 'steps'"
                )
            self.timestamps = self._time_coords()
        self.pyramid = TilePyramid(self.grid, self.tile_size, self.metatiling)
        self.snapped_bounds = self.pyramid.snap_bounds(self.bounds, self.zoom)
        self.shape = output_shape(self.snapped_bounds, self.pyramid, self.zoom)
        if self.cell_zoom is None:
            self.cell_zoom = self.zoom

    def _time_coords(self) -> np.ndarray:
        t = self.time
        if "steps" in t:
            return np.array(sorted(np.array(t["steps"], dtype="datetime64[us]")),
                            dtype="datetime64[us]")
        start = np.datetime64(t["start"]).astype("datetime64[us]").astype(datetime)
        end = np.datetime64(t["end"]).astype("datetime64[us]").astype(datetime)
        steps = _expand_pattern(start, end, t["pattern"])
        return np.array(steps, dtype="datetime64[us]")

    @property
    def time_chunksize(self) -> int:
        if not self.time:
            return 0
        return int(self.time.get("chunksize", DEFAULT_TIME_CHUNKSIZE))

    @property
    def chunk_px(self) -> int:
        """Spatial chunk edge = tile_size * metatiling (_output.py:270)."""
        return self.tile_size * self.metatiling

    def tile_range(self):
        """(row0, row1, col0, col1) inclusive tile range over snapped bounds."""
        b = self.snapped_bounds
        tx = self.pyramid.tile_x_size(self.zoom)
        ty = self.pyramid.tile_y_size(self.zoom)
        col0 = int(round((b.left - self.pyramid.left) / tx))
        col1 = int(round((b.right - self.pyramid.left) / tx)) - 1
        row0 = int(round((self.pyramid.top - b.top) / ty))
        row1 = int(round((self.pyramid.top - b.bottom) / ty)) - 1
        return row0, row1, col0, col1

    def metadata(self) -> dict:
        """Serializable job metadata stored in the archive (the
        equivalent of the reference's global ``mapchete`` attr,
        _output.py:702-704) and compared on reopen."""
        return {
            "driver": {
                "format": "zarr",
                "dtype": self.dtype,
                "nodata": self.nodata,
                "band_names": list(self.band_names),
                "time": {k: (list(map(str, v)) if k == "steps" else v)
                         for k, v in (self.time or {}).items()} or None,
            },
            "pyramid": {
                "grid": {"type": self.grid},
                "metatiling": self.metatiling,
                "pixelbuffer": self.pixelbuffer,
                "tile_size": self.tile_size,
            },
            "delimiters": {
                "zoom": [self.zoom],
                "process_bounds": list(self.bounds),
                "effective_bounds": list(self.snapped_bounds),
            },
        }
