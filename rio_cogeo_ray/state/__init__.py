"""Lineage manifests, checkpoint-resume, and output-layout state."""
