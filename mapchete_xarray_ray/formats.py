"""Format/driver registry (reference parity: mapchete's entry-point
registration, setup.py:40-47, asserted by tests/test_driver.py:9-14).

The reference plugs into mapchete via setuptools entry points; this
engine is standalone, so the registry is a plain dict — the lookup
surface (``available_output_formats``, ``driver_from_extension``,
``driver_from_file``) matches what the reference's driver tests probe.
"""

from __future__ import annotations

_OUTPUT_FORMATS = {
    # name -> (file extension, store class path)
    "xarray": (".zarr", "mapchete_xarray_ray.sinks.zarr.ZarrTileStore"),
    "parquet": (".parquet", "ray.data.Dataset.write_parquet"),
}


def available_output_formats() -> list[str]:
    return sorted(_OUTPUT_FORMATS)


def driver_from_extension(extension: str) -> str:
    ext = extension if extension.startswith(".") else f".{extension}"
    for name, (e, _cls) in _OUTPUT_FORMATS.items():
        if e == ext:
            return name
    raise ValueError(f"no registered driver for extension {extension!r}")


def driver_from_file(path: str) -> str:
    for name, (e, _cls) in _OUTPUT_FORMATS.items():
        if str(path).endswith(e):
            return name
    raise ValueError(f"no registered driver for file {path!r}")
