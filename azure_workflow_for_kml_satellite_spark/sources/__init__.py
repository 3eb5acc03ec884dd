"""Deterministic synthetic sources: pages, scenes, frames, dimension tables."""
