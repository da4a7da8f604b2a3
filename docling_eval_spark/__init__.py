"""docling_eval_spark — a PySpark-native document-extraction-and-evaluation engine.

A from-scratch rebuild of the capabilities of DS4SD/docling-eval
(reference snapshot at /root/reference, 2025-03-14) as an idiomatic
Spark pipeline:

- ``extraction``  — vectorized HTML/PDF main-content extraction kernels
  (the Spark-native analog of the reference's converter stage,
  ``converters/conversion.py``), run through ``mapInPandas``.
- ``evaluators``  — the reference's quality metrics (layout mAP, table
  TEDS, reading-order ARD, markdown/text BLEU & F1 & edit distance,
  histogram stats) re-expressed as DataFrame aggregations + pandas UDF
  kernels.
- ``operators``   — large-scale training-data-pipeline operators the
  reference lacks: dedup (exact / MinHash-LSH / SimHash / n-gram
  Jaccard), similarity search, text analysis, multimodal plumbing.
- ``plans``       — per-partition lineage + resume-by-anti-join
  (the checkpoint/restart mechanism the reference lacks).
- ``streaming``   — incremental (availableNow) processing of new page
  shards.
- ``datagen``     — deterministic synthetic Common-Crawl-style pages
  table ``(url, warc_ts, html, text, lang)`` for tests and benchmarks.

Nothing here imports from or depends on the reference repo.
"""

__version__ = "0.1.0"
