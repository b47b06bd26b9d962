"""End-to-end pipelines: create (cog_translate analog), validate, info."""
