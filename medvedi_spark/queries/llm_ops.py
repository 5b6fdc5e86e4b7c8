"""Placeholder — populated in later phases."""
