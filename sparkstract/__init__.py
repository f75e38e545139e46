"""sparkstract — PySpark-native main-content extraction engine.

Public API (SURVEY.md §7): extract, analyse_layout, run_job.
"""

from .config import ExtractConfig
from .plans.checkpoint import lineage, read_result, run_job
from .plans.pipeline import analyse_layout, extract, reassemble_docs

__all__ = [
    "ExtractConfig",
    "analyse_layout",
    "extract",
    "lineage",
    "read_result",
    "reassemble_docs",
    "run_job",
]
