"""Placeholder — joins/enrichment/window registry entries land here."""
