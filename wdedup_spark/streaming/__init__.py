"""Structured-streaming dedup operators."""
