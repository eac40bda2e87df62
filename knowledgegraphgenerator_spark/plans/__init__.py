"""Stage planning: lineage-tracked, resumable pipeline execution."""
