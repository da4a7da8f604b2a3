"""Product quantization (PQ) — the compressed-domain ANN path.

Jégou, Douze, Schmid, *Product Quantization for Nearest Neighbor
Search* (TPAMI 2011): split a ``dim``-dimensional vector into ``m``
subvectors, quantize each against its own ``n_codes``-entry codebook,
and represent the vector by ``m`` small integers. With the defaults
here (64 dims → 8 subspaces × 16 codes) a float32 embedding shrinks
256 B → 8 B (4 bits/code would halve that again): at 10^12 documents
the code table is ~8 TB instead of ~256 TB — the difference between
an embedding index that fits hot storage and one that doesn't.

The reference repo (DS4SD/docling-eval) has no vector-search surface;
this extends the engine's ANN family (brute force / hyperplane LSH /
IVF in ``similarity.py`` / ``ivf.py``) with the compressed tier.

Determinism & verification contract (same discipline as the IVF gate):
the oracle gate runs against FIXED seeded-gaussian codebooks — the
assign/score path is what it verifies; :func:`pq_train_codebooks`
refines them with distributed per-subspace Lloyd steps (recall quality
is pytest-gated against brute force with the trained books). Encoding
assigns each subvector the codeword minimizing
``||s - c||² = c·c − 2·s·c`` (the ``s·s`` term is constant per row and
dropped IDENTICALLY on both engines), lowest code index on ties.
Scoring uses the asymmetric distance computation (ADC) identity

    score(q, v) ≈ q · recon(v) = Σ_j  q_j · codebook[j][code_j]

evaluated as ONE sequential 64-element fold over the reconstruction,
so Spark's ``F.aggregate`` and DuckDB's ``list_inner_product`` see the
same doubles in the same order — rank and score replay bit-for-bit.
The table-lookup formulation of ADC (build an ``m × n_codes`` LUT per
query, score = ``Σ_j LUT[j][code_j]``) is the production fast path —
:func:`pq_topk_adc` implements it as a vectorized kernel and a pytest
asserts it ranks identically to the fold path.

Scale shape: encoding is a NARROW MAP (one Arrow batch matmul per
partition against the broadcast ``m·n_codes·sub`` codebook — a few KB).
Search broadcasts the human-scale query set against the code table and
never shuffles the corpus; the per-query top-k runs through the salted
exact :func:`~docling_eval_spark.operators.retrieval.topk_per_key`.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def pq_codebooks(
    dim: int, m: int = 8, n_codes: int = 16, seed: int = 13
) -> np.ndarray:
    """``(m, n_codes, dim//m)`` fixed seeded-gaussian codebooks (one
    independent seed per subspace so codebooks differ)."""
    from docling_eval_spark.operators.similarity import hyperplanes

    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    sub = dim // m
    return np.stack(
        [hyperplanes(sub, n_codes, seed=seed + j) for j in range(m)]
    ).astype(float)


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, codes array<int>, recon array<double>)`` — the PQ codes
    plus the reconstruction (codeword concatenation). ``codes`` is what
    a production table stores (m bytes/row); ``recon`` is carried here
    so downstream scoring can stay in pure Spark SQL (fold-order
    verifiable) — at scale it is re-derivable from ``codes`` by a
    broadcast codebook lookup. Narrow map, zero shuffle."""
    cb = codebooks.astype(float)
    m, n_codes, sub = cb.shape
    # per-codeword squared norms, precomputed once: dist = cc − 2·s·c
    cc = np.einsum("mcs,mcs->mc", cb, cb)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({id_col: [], "codes": [], "recon": []})
                continue
            mat = np.array([list(v) for v in pdf[vec_col]], dtype=float)
            segs = mat.reshape(len(mat), m, sub)
            # (rows, m, n_codes): cc − 2·s·c ; argmin ties → lowest code
            d = cc[None, :, :] - 2.0 * np.einsum("rms,mcs->rmc", segs, cb)
            codes = np.argmin(d, axis=2)
            recon = cb[np.arange(m)[None, :], codes]  # (rows, m, sub)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "codes": [c.astype(int).tolist() for c in codes],
                    "recon": [r.reshape(-1).tolist() for r in recon],
                }
            )

    schema = f"{id_col} long, codes array<int>, recon array<double>"
    return df.select(id_col, vec_col).mapInPandas(kernel, schema=schema)


def _dot_col(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product (same order as DuckDB's
    ``list_inner_product`` — the bit-replay contract)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    n_salt: int = 16,
) -> DataFrame:
    """``(query_id, neighbor_id, rank, score)``: top-``k`` by the ADC
    approximate inner product against PQ-encoded vectors. The corpus
    never shuffles — queries broadcast over the code table; per-query
    top-k is the salted exact prune."""
    from docling_eval_spark.operators.retrieval import topk_per_key

    enc = pq_encode(corpus, codebooks, id_col, vec_col)
    q = queries.select(
        query_id_col,
        F.transform(query_vec_col, lambda x: x.cast("double")).alias(
            query_vec_col
        ),
    )
    scored = enc.crossJoin(F.broadcast(q)).withColumn(
        "score", _dot_col(query_vec_col, "recon")
    )
    top = topk_per_key(
        scored,
        [query_id_col],
        [F.col("score").desc(), F.col(id_col).asc()],
        k,
        salt_col=id_col,
        n_salt=n_salt,
    )
    return top.select(
        query_id_col, F.col(id_col).alias("neighbor_id"), "rank", "score"
    )


def pq_topk_adc(
    corpus: DataFrame,
    queries_pdf: pd.DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Production ADC fast path: per Arrow batch, build the
    ``m × n_codes`` lookup table for every query once, then score each
    encoded row with ``m`` indexed adds — no 64-wide multiply per
    (query, doc) pair. Emits per-partition candidates; the exact
    global top-k is a tiny driver-side-free window over
    ``n_partitions · k`` rows per query. Ranking is pytest-asserted
    identical to :func:`pq_topk` (float sum order differs, so scores
    agree to ~1e-12, not bitwise — the fold path remains the
    oracle-gated one). Caveat: EXACT score ties straddling the k-th
    slot of a partition prune are kept by batch position, so a tied
    lower-id row from another partition can displace differently than
    the fold path's global (score, id) order — ties are measure-zero
    on real embeddings but make the fold path the canonical one."""
    from pyspark.sql import Window

    cb = codebooks.astype(float)
    m, n_codes, sub = cb.shape
    qids = queries_pdf.iloc[:, 0].to_numpy()
    qmat = np.array([list(v) for v in queries_pdf.iloc[:, 1]], dtype=float)
    # (n_queries, m, n_codes) lookup tables
    luts = np.einsum("qms,mcs->qmc", qmat.reshape(len(qmat), m, sub), cb)

    enc = pq_encode(corpus, cb, id_col, vec_col).select(id_col, "codes")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"query_id": [], "neighbor_id": [], "score": []}
                )
                continue
            codes = np.array([list(c) for c in pdf["codes"]], dtype=int)
            rows = np.arange(m)[None, :]
            # (n_queries, batch): Σ_j LUT[q, j, code_j]
            scores = np.stack(
                [luts[qi][rows, codes].sum(axis=1) for qi in range(len(qids))]
            )
            ids = pdf[id_col].to_numpy()
            # per-partition prune to k candidates per query
            keep = min(len(ids), k)
            idx = np.argsort(-scores, axis=1, kind="stable")[:, :keep]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, keep),
                    "neighbor_id": ids[idx].reshape(-1),
                    "score": np.take_along_axis(scores, idx, 1).reshape(-1),
                }
            )

    cand = enc.mapInPandas(
        kernel, schema="query_id long, neighbor_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def pq_train_codebooks(
    df: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
) -> np.ndarray:
    """Lloyd-refined PQ codebooks: start from the fixed seeded
    gaussians and run ``iterations`` k-means steps per subspace over
    the corpus. Each step is ONE narrow map (a kernel that encodes the
    batch and emits per-``(subspace, code, dim)`` partial sums — the
    map-side combine) plus one slim hash agg of ``m·n_codes·sub`` rows
    per partition; the centroid matrix itself is the only driver-side
    data. Empty cells keep their previous codeword (standard Lloyd
    convention)."""
    dim = len(df.select(vec_col).first()[0])
    cb = pq_codebooks(dim, m, n_codes, seed)
    sub = dim // m

    for _ in range(iterations):
        cur = cb.copy()
        cc = np.einsum("mcs,mcs->mc", cur, cur)

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            sums = np.zeros((m, n_codes, sub))
            counts = np.zeros((m, n_codes), dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.array([list(v) for v in pdf[vec_col]], dtype=float)
                segs = mat.reshape(len(mat), m, sub)
                d = cc[None, :, :] - 2.0 * np.einsum("rms,mcs->rmc", segs, cur)
                codes = np.argmin(d, axis=2)  # (rows, m)
                for j in range(m):
                    np.add.at(sums[j], codes[:, j], segs[:, j, :])
                    np.add.at(counts[j], codes[:, j], 1)
            js, cs, ds, ss, ns = [], [], [], [], []
            for j in range(m):
                for c in range(n_codes):
                    if counts[j, c] == 0:
                        continue
                    for dd in range(sub):
                        js.append(j)
                        cs.append(c)
                        ds.append(dd)
                        ss.append(float(sums[j, c, dd]))
                        ns.append(int(counts[j, c]))
            yield pd.DataFrame(
                {"j": js, "code": cs, "dim": ds, "s": ss, "n": ns}
            )

        parts = (
            df.select(vec_col)
            .mapInPandas(kernel, schema="j int, code int, dim int, s double, n long")
            .groupBy("j", "code", "dim")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        nxt = cur.copy()
        for r in parts:
            nxt[r["j"], r["code"], r["dim"]] = r["s"] / r["n"]
        cb = nxt
    return cb
