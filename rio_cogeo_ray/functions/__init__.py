"""Pure functions: tile math, geocoding, text extraction, hashing.

No Ray dependencies — everything here is numpy/pyarrow only so it can be
used identically inside distributed ``map_batches`` stages and in the
single-node oracle tiler that tests compare against.
"""
