"""Creation profiles — the cog_profiles analog (rio_cogeo/profiles.py).

The reference ships 11 named creation profiles (jpeg/webp/zstd/lzw/
deflate/packbits/lzma/lerc/lerc_deflate/lerc_zstd/raw — profiles.py:
8-151), all tiled 512×512, differing in codec/lossiness. The engine's
profiles carry the same names and the same ``get``-with-copy semantics
(profiles.py:181-190: returns a copy, warns on non-standard names) and
map onto the knobs this engine actually has:

- ``codec``: parquet compression for tile/level files. Codecs parquet
  lacks map to the nearest available one (documented per profile).
- ``tile_px``: density-grid resolution G (blocksize analog; all
  reference profiles use 512).
- ``lossy``: jpeg/webp/lerc are lossy in the reference; a lossy engine
  profile quantizes grid counts to uint8 saturation at dense-export time
  and triggers the LossyCompression warning when combined with masking
  (errors.py:4-5 analog) — the distributed aggregation itself stays
  exact int64.
"""

from __future__ import annotations

import warnings
from typing import Dict

from rio_cogeo_ray import errors


#: Valid profiles that warn on use — codecs newer tooling may not read
#: (the reference's non-standard-driver warning, profiles.py:175-187:
#: zstd/webp/lerc* warn; invalid names raise KeyError with NO warning).
_NON_STANDARD = frozenset({"zstd", "webp", "lerc", "lerc_deflate", "lerc_zstd"})


class Profiles(dict):
    """Profile registry with cog_profiles.get semantics
    (profiles.py:175-190)."""

    def get(self, key: str) -> Dict:  # type: ignore[override]
        # reference profiles.py:189 lowercases before lookup, so
        # get("JPEG") must succeed here too
        key = key.lower()
        if key not in self:
            raise KeyError(f"{key} is not a valid profile name")
        if key in _NON_STANDARD:
            warnings.warn(
                f"Non-standard compression schema: {key!r}. The output "
                "might not be supported by all readers",
                errors.NonStandardProfileWarning,
            )
        return dict(self[key])  # copy, like the reference


def _p(codec: str, lossy: bool = False, tile_px: int = 512, note: str = "") -> Dict:
    return {"codec": codec, "lossy": lossy, "tile_px": tile_px, "note": note}


cog_profiles = Profiles(
    {
        # lossy family → zstd-compressed parquet + uint8 quantized export
        "jpeg": _p("zstd", lossy=True, note="jpeg analog: lossy uint8 export"),
        "webp": _p("zstd", lossy=True, note="webp analog: lossy uint8 export"),
        # lossless codecs with direct parquet equivalents
        "zstd": _p("zstd"),
        "deflate": _p("gzip", note="deflate == gzip"),
        "raw": _p("none"),
        # codecs parquet lacks → documented nearest mapping
        "lzw": _p("snappy", note="no parquet LZW; snappy is the fast-lossless analog"),
        "packbits": _p("snappy", note="no parquet PACKBITS; snappy analog"),
        "lzma": _p("brotli", note="no parquet LZMA; brotli is the high-ratio analog"),
        "lerc": _p("zstd", lossy=True, note="LERC analog: lossy quantized export"),
        "lerc_deflate": _p("gzip", lossy=True, note="LERC+DEFLATE analog"),
        "lerc_zstd": _p("zstd", lossy=True, note="LERC+ZSTD analog"),
    }
)
