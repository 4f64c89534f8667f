"""Bundled per-tile process functions (the reference ships
``convert_to_xarray``; mapchete_xarray_ray ships these)."""
