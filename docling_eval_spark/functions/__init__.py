"""Expression-level helpers shared across operators."""

from docling_eval_spark.functions.let import let_col

__all__ = ["let_col"]
