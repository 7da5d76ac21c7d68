"""Distributed index-build stages (SURVEY.md §7.2 stage plan)."""
