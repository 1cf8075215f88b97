"""Composable DataFrame→DataFrame operators.

Each operator is a small pure function; composition replaces the
reference's file-per-stage shell pipeline with one lazy Catalyst DAG.
"""
