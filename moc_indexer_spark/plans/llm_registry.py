"""Placeholder — LLM-data-pipeline registry entries land here."""
