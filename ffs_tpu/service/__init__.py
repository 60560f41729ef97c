"""Beamline service layer: per-image-analysis, SSX indexing, comparison."""
