"""Dedup operators — each module is one stage of SURVEY.md §2."""
