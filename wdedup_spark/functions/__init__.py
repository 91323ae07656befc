"""Scalar/text/multimodal helper functions."""
