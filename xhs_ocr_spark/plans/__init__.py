"""Composed multi-stage plans (the reference's pipeline DAGs)."""

from .merge_pipeline import run_merge_pipeline  # noqa: F401
