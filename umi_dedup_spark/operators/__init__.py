"""Distributed operators of the dedup engine (SURVEY.md §2 inventory)."""
