"""Placeholder — populated in later slices."""
