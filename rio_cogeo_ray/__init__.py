"""rio_cogeo_ray — a Ray-Data-native spatial tiling + join engine.

From-scratch generalization of rio-cogeo's COG semantics (TMS tile grids,
power-of-two overview pyramids, web-grid alignment, nodata/masking,
structural validation — see /root/reference/rio_cogeo) to a distributed
tiler over Parquet corpora of Common-Crawl-style web pages
``(url, warc_ts, html, text, lang)`` geocoded to lat/lon.

Everything executes as ``ray.data.Dataset`` pipelines: stateless
``map_batches`` over zero-copy Arrow for extract/geocode/tile-assignment,
partial-aggregate + ``groupby`` for the density/pyramid shuffles, actor
pools for stateful stages (point-in-polygon joins, kNN), ordered
manifest-backed Parquet sinks with checkpoint-resume.
"""

__version__ = "0.1.0"

from rio_cogeo_ray.functions import tms  # noqa: F401
