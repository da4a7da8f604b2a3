"""docling-eval's quality metrics, re-expressed Spark-first.

Pure-Python metric kernels (importable without Spark — they double as
the single-process oracle in parity tests) + DataFrame stages that run
them vectorized. Reference parallels cited per module.
"""
