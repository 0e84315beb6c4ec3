"""Execution state: resumable partitioned output with lineage sidecars."""
