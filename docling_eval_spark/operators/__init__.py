"""Large-scale training-data pipeline operators.

Beyond the reference's own evaluator surface: deduplication families,
embedding similarity search, text analysis, and multimodal-column
plumbing — the operations a 100 TB web-corpus pipeline needs around
extraction. All JVM-side built-ins where possible; Arrow-batched
kernels only where semantics require."""
