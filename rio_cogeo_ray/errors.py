"""Error/warning taxonomy — mirrors rio_cogeo/errors.py:4-21 plus
distributed-specific conditions."""

from __future__ import annotations


class RioCogeoRayError(Exception):
    """Base error (RioCogeoError analog, errors.py:16-17)."""


class IncompatibleOptions(RioCogeoRayError):
    """Mutually exclusive creation options (errors.py:20-21 analog)."""


class ValidationFailure(RioCogeoRayError):
    """Raised by strict validation when a layout invariant fails."""


class ResumeMismatch(RioCogeoRayError):
    """Checkpoint data on disk disagrees with its lineage manifest row."""


class LossyCompression(UserWarning):
    """Lossy codec with nodata-style masking (errors.py:4-5 analog)."""


class IncompatibleBlockRasterSize(UserWarning):
    """Tile size larger than the data extent (errors.py:8-9 analog)."""


class NodataAlphaMaskWarning(UserWarning):
    """Ambiguous validity encodings combined (errors.py:12-13 analog)."""


class NonStandardProfileWarning(UserWarning):
    """Valid profile whose codec some readers may not support
    (reference profiles.py:175-187 zstd/webp/lerc warning analog)."""
