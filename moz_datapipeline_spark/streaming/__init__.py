"""Structured Streaming surface.

The reference is pure batch (SURVEY §2.9); these operators extend the
engine to streams. Each transformation is written against an unbound
DataFrame so the SAME function serves batch tables and
``readStream`` sources.
"""
