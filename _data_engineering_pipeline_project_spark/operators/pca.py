"""Distributed PCA over embedding columns: exact covariance relation,
driver-side spectral step, rotated (OPQ-lite) projection.

The covariance pass is the only data-sized work and it is EXACT: each
element is quantized to an integer lane (``round(x·2^20)`` — the same
portable double→integer rounding the int8 quantizer pins against
DuckDB), so per-pair power sums are exact integer aggregates (summed
in DECIMAL(38,0) for headroom — overflow-free through petabyte row
counts) and the final covariance doubles are fixed IEEE sequences on
identical inputs: bit-reproducible on any cluster layout or engine.
That makes the covariance itself ORACLE-CHECKABLE — a property no
streaming-moment implementation (Welford/F.covar_samp) has.

Plan shape: one projection quantizes, a double ``posexplode`` emits
the upper-triangle (i, j, vi·vj) terms, and ONE groupBy(i, j) with
map-side partial aggregation reduces them — d(d+1)/2 output rows
regardless of corpus size (d=64 → 2,080 rows). At 100 TB this is the
canonical distributed Gram computation: the shuffle carries partial
sums, never vectors.

The SPECTRAL step (eigh) runs on the driver over the collected d×d
matrix — bounded at d² doubles (64² = 32 KB), the same
bounded-driver-step discipline as the IVF/Lloyd centroid updates. It
is deliberately OUTSIDE the oracle (no SQL engine re-derives an
eigendecomposition; the registered variance query is rows-only by
design, like HLL); pytest owns its invariants instead: eigenvalue sum
equals total variance (the trace), eigenvalues descend, the rotation
is orthogonal.

``pca_project`` applies the top-r rotation as UNROLLED codegen dots
(projection is an equi-free narrow stage, exactly the context the
vectors.py rule sends to the unrolled form). For product quantization
the rotation must be composed with :func:`opq_allocate` — naive
PCA-then-PQ is a measured ANTI-PATTERN (it concentrates variance into
one subspace; see opq_allocate's numbers), while the eigenvalue-
balanced allocation cuts quantization MSE 2.2× on constructed
correlated data (synthetic iid embeddings have nothing to
decorrelate, so the tests build low-rank-plus-noise data where the
effect is real).

Reference anchor: the reference has no linear-algebra surface; this
extends the engine's LLM-data layer (SURVEY §2 extension: embedding
curation) alongside int8/PQ/IVF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.functions.localrel import local_df

QUANT_SCALE = 1 << 20  # element lane: round(x * 2^20) — portable rounding


def quantized_elements(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, v array<long>) with elements on the integer lane."""
    return df.select(
        F.col(id_col),
        F.transform(
            vec_col,
            lambda x: F.round(x * F.lit(float(QUANT_SCALE))).cast("long"),
        ).alias("v"),
    )


def covariance_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_diagonal: bool = True,
    method: str = "explode",
    dim: int | None = None,
    _parts: DataFrame | None = None,
) -> DataFrame:
    """Exact population covariance per dimension pair (1-based dims,
    upper triangle): ``cov = (n·Sij − Si·Sj) / n²`` computed from exact
    integer power sums, scaled back from the quantized lane. Output:
    (dim_i, dim_j, cov) — d(d+1)/2 rows.

    Two physical forms, BIT-IDENTICAL outputs (integer sums are
    order-free; pinned by test):

    - ``"explode"`` — double posexplode + one groupBy(i, j). Pure
      relational, which is what lets the registered audit be ORACLED
      in DuckDB; but it materializes n·d(d+1)/2 term rows through the
      aggregate's hash map — fine at d=64, catastrophic at real
      embedding widths (d=768 → ~295k terms per input row).
    - ``"gram"`` — mapInPandas per Arrow batch: numpy computes the
      batch's int64 Gram matrix ``XᵀX`` (BLAS, no per-term rows; a
      ~10k-row batch stays far under int64 — |v| ≲ 2^22 ⇒ term ≲ 2^44
      ⇒ batch sum ≲ 2^58 — and the headroom is ENFORCED per batch:
      rows·max|v|² > 2^62 raises loudly instead of letting numpy wrap
      silently, so |x| ≳ 30 or an oversized Arrow batch can never
      produce garbage covariance), emitting ONE row per batch (flattened
      Gram + column sums + count); Spark then sums the per-batch
      partials in DECIMAL(38,0) — d(d+1)/2 + d values per batch,
      never per input row. This is the form a 100 TB / wide-embedding
      deployment runs (measured: docs/SCALE.md r10); ``pca_fit``
      takes ``method=`` and passes it through.
    """
    if method == "gram":
        return _covariance_pairs_gram(
            df, id_col, vec_col, include_diagonal, dim, parts=_parts
        )
    vq = quantized_elements(df, id_col, vec_col)
    a = vq.select(F.posexplode("v").alias("i0", "vi"), "v")
    pred = F.col("i0") <= F.col("j0") if include_diagonal else F.col(
        "i0"
    ) < F.col("j0")
    pairs = a.select(
        "i0", "vi", F.posexplode("v").alias("j0", "vj")
    ).filter(pred)
    dec = "decimal(38,0)"
    sums = pairs.groupBy("i0", "j0").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("vi").cast(dec)).cast("double").alias("si"),
        F.sum(F.col("vj").cast(dec)).cast("double").alias("sj"),
        F.sum((F.col("vi") * F.col("vj")).cast(dec))
        .cast("double")
        .alias("sij"),
    )
    n = F.col("n")
    scale2 = float(QUANT_SCALE) * float(QUANT_SCALE)
    return sums.select(
        (F.col("i0") + 1).cast("int").alias("dim_i"),
        (F.col("j0") + 1).cast("int").alias("dim_j"),
        (
            (n * F.col("sij") - F.col("si") * F.col("sj"))
            / (n * n)
            / F.lit(scale2)
        ).alias("cov"),
    )


def _gram_parts(
    df: DataFrame, id_col: str, vec_col: str, dim: int
) -> DataFrame:
    """Per-Arrow-batch exact partials for the gram form: ONE row per
    batch — (row count, int64 column sums, flattened upper-triangle
    int64 Gram). Validates the declared ``dim`` against every batch's
    actual width (a mismatch would otherwise join the driver's
    triangle map against the WRONG geometry and return silently-
    garbage covariance — code-review r10) and fails loudly on NULL
    elements / ragged vectors, which the int64 matrix cannot represent
    (the explode form tolerates them; the bit-identical contract is
    scoped to non-null fixed-width vectors — the embedding contract)."""
    vq = (
        quantized_elements(df, id_col, vec_col)
        .select("v")
        .filter(F.col("v").isNotNull())
    )

    def gram(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            # NULL elements arrive as NaN in a float64 block (Arrow),
            # and numpy SILENTLY casts NaN -> INT64_MIN with only a
            # RuntimeWarning — so the guard must be explicit, not a
            # try/except around the cast
            X0 = np.array(pdf["v"].tolist())
            if X0.dtype == object or X0.ndim != 2:
                raise ValueError(
                    "method='gram' requires non-null fixed-width "
                    "vectors (ragged lengths in batch); use "
                    "method='explode' for tolerant semantics"
                )
            if not np.issubdtype(X0.dtype, np.integer) and np.isnan(
                X0
            ).any():
                raise ValueError(
                    "method='gram' requires non-null fixed-width "
                    "vectors (NULL element in batch); use "
                    "method='explode' for tolerant semantics"
                )
            if X0.shape[1] != dim:
                raise ValueError(
                    f"vector width {X0.shape[1]} does not match "
                    f"declared dim={dim}"
                )
            X = X0.astype(np.int64, copy=False)
            # int64 headroom guard (advice r10): numpy matmul overflow
            # WRAPS silently — garbage covariance that silently diverges
            # from the decimal explode form on exactly the wide/large
            # deployment path no oracle cross-checks. The usual envelope
            # (|x| ≲ 4 ⇒ |v| ≲ 2^22, ~10k-row Arrow batches ⇒ batch sum
            # ≲ 2^58) is assumed elsewhere but enforced HERE: the worst
            # Gram cell is bounded by rows·max|v|², so require it under
            # 2^62. Larger |x| or arrow maxRecordsPerBatch must shrink
            # the batch or rescale — loudly, like the NULL/ragged guards.
            amax = float(np.abs(X).max()) if X.size else 0.0
            if X.shape[0] * amax * amax > float(1 << 62):
                raise ValueError(
                    "method='gram' int64 headroom exceeded: batch of "
                    f"{X.shape[0]} rows with max |quantized element| "
                    f"{amax:.3g} can overflow the int64 Gram sum "
                    "(rows*max^2 > 2^62). Reduce spark.sql.execution."
                    "arrow.maxRecordsPerBatch or rescale inputs "
                    "(|x| <~ 30 at the default 2^20 lane), or use "
                    "method='explode'."
                )
            G = X.T @ X  # exact int64: |term| ≲ 2^44, batch sum ≲ 2^58
            s = X.sum(axis=0)
            yield pd.DataFrame(
                {
                    "n_part": [int(X.shape[0])],
                    "s_part": [s.tolist()],
                    "g_part": [G[np.triu_indices(X.shape[1])].tolist()],
                }
            )

    return vq.mapInPandas(
        gram, "n_part long, s_part array<long>, g_part array<long>"
    )


def _covariance_pairs_gram(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    include_diagonal: bool,
    dim: int | None,
    parts: DataFrame | None = None,
) -> DataFrame:
    """The gram-batches physical form of :func:`covariance_pairs` —
    same exact integers, same final doubles. ``dim`` is required (the
    driver builds the bounded triangle-index map from it). ``parts``
    lets :func:`pca_fit` pass a cached partials frame so covariance
    and mean derive from ONE input scan."""
    if dim is None:
        raise ValueError("method='gram' requires dim=")
    spark = df.sparkSession
    if parts is None:
        parts = _gram_parts(df, id_col, vec_col, dim)
    dec = "decimal(38,0)"
    # per-triangle-slot exact sums: d(d+1)/2 rows PER BATCH ROW (one
    # per Arrow batch), never per input row
    sij = (
        parts.select(F.posexplode("g_part").alias("t", "g"))
        .groupBy("t")
        .agg(F.sum(F.col("g").cast(dec)).cast("double").alias("sij"))
    )
    # per-dim exact sums + total count (d rows per batch row)
    dims = (
        parts.select("n_part", F.posexplode("s_part").alias("i0", "si"))
        .groupBy("i0")
        .agg(
            F.sum(F.col("si").cast(dec)).cast("double").alias("s"),
            F.sum("n_part").alias("n"),
        )
    )
    # bounded driver-built triangle map t → (i0, j0)
    tri = [(t, i, j) for t, (i, j) in enumerate(
        (i, j) for i in range(dim) for j in range(i, dim)
    )]
    tmap = local_df(spark, tri, "t int, i0 int, j0 int")
    di = dims.select(
        F.col("i0").alias("__i"), F.col("s").alias("si"), "n"
    )
    dj = dims.select(F.col("i0").alias("__j"), F.col("s").alias("sj"))
    joined = (
        sij.join(F.broadcast(tmap), "t")
        .join(F.broadcast(di), F.col("i0") == F.col("__i"))
        .join(F.broadcast(dj), F.col("j0") == F.col("__j"))
    )
    n = F.col("n")
    scale2 = float(QUANT_SCALE) * float(QUANT_SCALE)
    res = joined.select(
        (F.col("i0") + 1).cast("int").alias("dim_i"),
        (F.col("j0") + 1).cast("int").alias("dim_j"),
        (
            (n * F.col("sij") - F.col("si") * F.col("sj"))
            / (n * n)
            / F.lit(scale2)
        ).alias("cov"),
    )
    if not include_diagonal:
        res = res.filter(F.col("dim_i") != F.col("dim_j"))
    return res


def pca_fit(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "explode",
) -> dict:
    """Fit PCA: distributed exact covariance (one shuffle, d² partial
    sums) + driver eigh of the collected d×d matrix (bounded: 32 KB at
    d=64 — the Lloyd-centroid discipline). Returns eigenvalues
    descending, components as row vectors, and the mean (for
    centering), all plain Python lists so the result is loggable and
    artifact-friendly."""
    import numpy as np

    if method == "gram":
        # ONE aggregation job for covariance AND mean (VERDICT r13 #4:
        # the previous form paid two collects — covariance, then mean —
        # over the same cached partials, a second job of pure
        # scheduling). The per-batch partials are concatenated into one
        # lane (idx < dim = column sums, idx >= dim = upper-triangle
        # Gram slots), one groupBy(idx) yields every exact decimal sum
        # plus the row count, and the driver applies the IDENTICAL IEEE
        # double sequence the Spark expressions used: decimal→double is
        # correctly rounded in both engines, and
        # (n·sij − si·sj)/(n·n)/scale² is evaluated in the same
        # operation order, so the model is bit-for-bit the two-collect
        # one (pinned by test).
        nslots = dim + dim * (dim + 1) // 2
        rows = (
            _gram_parts(df, id_col, vec_col, dim)
            .select(
                "n_part",
                F.posexplode(F.concat("s_part", "g_part")).alias(
                    "idx", "val"
                ),
            )
            .groupBy("idx")
            .agg(
                F.sum(F.col("val").cast("decimal(38,0)")).alias("s"),
                F.sum("n_part").alias("n"),
            )
            .collect()
        )
        if not rows:
            raise ValueError(
                "pca_fit on an empty relation: covariance is undefined "
                "(no rows reached the aggregate)"
            )
        if len(rows) != nslots:
            raise ValueError(
                f"gram partials returned {len(rows)} slots, expected "
                f"{nslots} (dim={dim} mismatch?)"
            )
        n = int(rows[0]["n"])
        s = {r["idx"]: r["s"] for r in rows}
        scale2 = float(QUANT_SCALE) * float(QUANT_SCALE)
        cov = np.zeros((dim, dim))
        t = 0
        for i in range(dim):
            si = float(s[i])
            for j in range(i, dim):
                sij = float(s[dim + t])
                sj = float(s[j])
                cov[i, j] = cov[j, i] = (
                    (float(n) * sij - si * sj) / float(n * n) / scale2
                )
                t += 1
        w, v = np.linalg.eigh(cov)  # ascending
        order = np.argsort(w)[::-1]
        return {
            "eigenvalues": [float(w[i]) for i in order],
            "components": [[float(x) for x in v[:, i]] for i in order],
            "mean": [
                float(s[i]) / float(n) / float(QUANT_SCALE)
                for i in range(dim)
            ],
            "dim": dim,
        }
    rows = covariance_pairs(
        df, id_col, vec_col, method=method, dim=dim
    ).collect()
    if not rows:
        raise ValueError(
            "pca_fit on an empty relation: covariance is undefined "
            "(no rows reached the aggregate)"
        )
    cov = np.zeros((dim, dim))
    for r in rows:
        cov[r["dim_i"] - 1, r["dim_j"] - 1] = r["cov"]
        cov[r["dim_j"] - 1, r["dim_i"] - 1] = r["cov"]
    mean = (
        quantized_elements(df, id_col, vec_col)
        .select(
            F.lit(1).alias("n_part"),
            F.posexplode("v").alias("i0", "vi"),
        )
        .groupBy("i0")
        .agg(
            (
                F.sum(F.col("vi").cast("decimal(38,0)")).cast("double")
                / F.sum("n_part")
                / F.lit(float(QUANT_SCALE))
            ).alias("m")
        )
        .orderBy("i0")
        .collect()
    )
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1]
    return {
        "eigenvalues": [float(w[i]) for i in order],
        "components": [[float(x) for x in v[:, i]] for i in order],
        "mean": [float(r["m"]) for r in mean],
        "dim": dim,
    }


def pca_project(
    df: DataFrame,
    model: dict,
    r: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """Project (centered) vectors onto the top-``r`` components as
    unrolled codegen dots — r·d multiply-adds per row, no Python
    worker, no shuffle. Centering is FOLDED INTO each dot term
    (``(x_j − μ_j)·c_j``) rather than materialized via a transform
    lambda: lambda bodies escape codegen subexpression elimination (the
    documented no-CSE-inside-lambdas pitfall), while the unrolled terms
    stay plain top-level expressions. The output array is the rotated
    embedding an OPQ-style PQ trains on (or a dimensionality-reduced
    serving vector).

    SIZE LIMIT (measured, SCALE.md r11): past ~2k total terms (r·d)
    the expression tree exceeds Janino's 64 KB method limit — Spark
    burns seconds in failed whole-stage compiles, then runs
    interpreted. Use :func:`pca_project_batch` (bit-identical, Arrow)
    beyond that crossover; this form stays right for small r·d."""
    dim = model["dim"]
    comps = model["components"][:r]
    mean = model["mean"]
    cdf = df.select(F.col(id_col), F.col(vec_col).alias("__v"))
    outs = []
    for ci, comp in enumerate(comps):
        acc = F.lit(0.0)
        for j in range(1, dim + 1):
            acc = acc + (
                F.element_at("__v", j).cast("double") - F.lit(mean[j - 1])
            ) * F.lit(comp[j - 1])
        outs.append(acc.alias(f"__p{ci}"))
    return cdf.select(id_col, *outs).select(
        id_col,
        F.array(*[F.col(f"__p{ci}") for ci in range(len(comps))]).alias(
            out_col
        ),
    )


def pca_project_batch(
    df: DataFrame,
    model: dict,
    r: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """Arrow-batched physical form of :func:`pca_project` —
    BIT-IDENTICAL outputs (pinned by test), built for the r·d sizes
    where the unrolled expression tree stops being a codegen win and
    becomes a codegen CASUALTY: at r=32, d=64 (2,048 terms) Janino's
    64 KB method limit fails the whole-stage compile and Spark retries
    then falls back interpreted — measured 19.5 s to materialize 500
    rows, virtually all failed-compile time, vs 0.3 s here. (The
    unrolled form stays right for small r·d — the vectors.py ledger's
    "branch-free bit math → codegen" rule holds until the tree outgrows
    the JIT; this is the measured crossover.)

    Bit-parity argument: the unrolled form computes, per output
    element, ``((0.0 + t_1) + t_2) + … + t_d`` with
    ``t_j = (x_j − μ_j)·c_j``. Here the SAME left fold runs as ``d``
    VECTORIZED adds in ascending ``j`` — ``acc += (X[:,j] − μ_j)·c_j``
    — so every output element's accumulation sequence is the identical
    IEEE op chain; numpy never reassociates elementwise ops (only
    reductions like ``@``/``sum`` use pairwise summation, which is why
    this is a loop over dims, not a matmul).

    Contract: non-null fixed-width vectors (the embedding contract,
    same loud guards as the gram covariance path)."""
    dim = model["dim"]
    comps = model["components"][:r]
    mean = model["mean"]
    id_type = df.schema[id_col].dataType.simpleString()
    src = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))

    def proj(batches):
        import numpy as np
        import pandas as pd

        C = np.array(comps, dtype=np.float64)  # (r, dim)
        mu = [float(m) for m in mean]
        for pdf in batches:
            if pdf.empty:
                continue
            X0 = np.array(pdf["__v"].tolist())
            if X0.dtype == object or X0.ndim != 2:
                raise ValueError(
                    "pca_project_batch requires non-null fixed-width "
                    "vectors (ragged lengths in batch); use pca_project "
                    "for tolerant semantics"
                )
            X = X0.astype(np.float64, copy=False)
            if np.isnan(X).any():
                raise ValueError(
                    "pca_project_batch requires non-null fixed-width "
                    "vectors (NULL/NaN element in batch); use "
                    "pca_project for tolerant semantics"
                )
            if X.shape[1] != dim:
                raise ValueError(
                    f"vector width {X.shape[1]} does not match model "
                    f"dim={dim}"
                )
            acc = np.zeros((X.shape[0], len(comps)), dtype=np.float64)
            for j in range(dim):
                # left fold in ascending j — the unrolled form's order
                acc += (X[:, j : j + 1] - mu[j]) * C[:, j]
            yield pd.DataFrame(
                {"__id": pdf["__id"], "__p": [row.tolist() for row in acc]}
            )

    return src.mapInPandas(
        proj, f"__id {id_type}, __p array<double>"
    ).select(F.col("__id").alias(id_col), F.col("__p").alias(out_col))


def variance_explained(model: dict) -> list[tuple[int, float, float]]:
    """(component, eigenvalue, cumulative fraction) — the scree data."""
    ev = model["eigenvalues"]
    total = sum(ev) or 1.0
    out = []
    c = 0.0
    for i, e in enumerate(ev):
        c += e
        out.append((i + 1, e, c / total))
    return out


def opq_allocate(model: dict, m: int, sub_dim: int) -> dict:
    """OPQ parametric allocation: reorder the PCA components so the
    ``m`` product-quantizer subspaces carry BALANCED variance.

    Naive PCA-then-PQ is an anti-pattern, and measurably so (r10:
    quantization MSE 1.51 rotated vs 1.30 unrotated on correlated
    test data): PCA concentrates variance into the leading dims, so
    one subspace swallows nearly all the energy and its ksub codes
    quantize it terribly while the tail subspaces quantize noise.
    OPQ's parametric solution for Gaussian data balances the PRODUCT
    of eigenvalues per subspace; this is the standard greedy form —
    descending eigenvalues, each assigned to the unfilled subspace
    with the smallest Σ log λ. Same correlated data, balanced: MSE
    0.59 — 2.2× better than no rotation, 2.5× better than naive PCA
    (docs/SCALE.md r10).

    Returns a model whose ``components`` are permuted for
    :func:`pca_project`; project with ``r = m·sub_dim``, then train/
    encode PQ on the projected column unchanged."""
    import math

    d = model["dim"]
    if m * sub_dim > d:
        raise ValueError(f"m*sub_dim = {m * sub_dim} exceeds dim {d}")
    ev = model["eigenvalues"]
    buckets: list[list[int]] = [[] for _ in range(m)]
    loads = [0.0] * m
    for idx in sorted(range(m * sub_dim), key=lambda i: -ev[i]):
        cands = [b for b in range(m) if len(buckets[b]) < sub_dim]
        b = min(cands, key=lambda b: loads[b])
        buckets[b].append(idx)
        loads[b] += math.log(max(ev[idx], 1e-300))
    perm = [i for b in buckets for i in b]
    return {
        **model,
        "components": [model["components"][i] for i in perm],
        "eigenvalues": [model["eigenvalues"][i] for i in perm],
        "opq_permutation": perm,
        # the grouping IS part of the allocation's identity: a (2,4)
        # and a (4,2) permutation have the same length but balance
        # different subspaces — save_opq_index guards on these
        "opq_m": m,
        "opq_sub_dim": sub_dim,
    }


def save_opq_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    m: int,
    sub_dim: int,
    ksub: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    model: dict | None = None,
) -> None:
    """Persist the full OPQ retrieval artifact: ``path/pca`` (the
    balanced rotation — :func:`save_pca_model`) + ``path/pq`` (PQ
    codebooks/codes trained on the ROTATED corpus —
    ``similarity.save_pq_index``). This is the train-once form of the
    registered ``embedding_topk_opq`` pipeline: one offline job pays
    the covariance shuffle, eigh, projection and encode; any later
    session serves ADC queries against the stored codes after rotating
    only the QUERY vectors (bounded work), never touching a
    full-precision corpus vector. The codes relation is the same
    m·log2(ksub)-bits-per-vector store as plain PQ — the rotation
    costs nothing at serving time, which is why leaving the measured
    recall win (0.37 → 0.64, SCALE.md r10) unserved was the
    anti-pattern."""
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        save_pq_index,
    )

    if model is None:
        model = opq_allocate(
            pca_fit(
                corpus, dim=dim, id_col=id_col, vec_col=vec_col,
                method="gram",
            ),
            m,
            sub_dim,
        )
    elif (
        "opq_permutation" not in model
        or model.get("dim") != dim
        or len(model["opq_permutation"]) != m * sub_dim
        or model.get("opq_m", m) != m
        or model.get("opq_sub_dim", sub_dim) != sub_dim
    ):
        # a caller-supplied model must be THE allocated model this
        # exact pipeline would train (pca_fit(gram) → opq_allocate is
        # deterministic, so reusing a session-memoized fit changes
        # nothing — the train-once share); a raw/foreign model would
        # silently freeze the wrong rotation into the artifact. The
        # permutation length pins the PQ geometry too: a model balanced
        # for a different (m, sub_dim) grouping would pass a dim-only
        # check and train codebooks on wrongly-grouped subspaces (r12
        # review finding).
        raise ValueError(
            "save_opq_index(model=...) needs an opq_allocate'd model "
            f"of dim {dim} whose permutation covers m·sub_dim = "
            f"{m * sub_dim} components (got keys {sorted(model)} with "
            f"dim {model.get('dim')}, permutation length "
            f"{len(model.get('opq_permutation', []))})"
        )
    rot = pca_project_batch(
        corpus, model, r=m * sub_dim, id_col=id_col, vec_col=vec_col,
        out_col=vec_col,
    )
    save_pca_model(corpus.sparkSession, model, f"{path}/pca")
    save_pq_index(
        rot, f"{path}/pq", m=m, sub_dim=sub_dim, ksub=ksub,
        id_col=id_col, vec_col=vec_col,
    )


def load_opq_index(spark, path: str) -> dict:
    """Load a :func:`save_opq_index` artifact → {model, codebooks,
    codes, params}. Both halves carry their own loud-load guards
    (truncated PCA rows, foreign PQ params)."""
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        load_pq_index,
    )

    model = load_pca_model(spark, f"{path}/pca")
    cb, codes, params = load_pq_index(spark, f"{path}/pq")
    return {"model": model, "codebooks": cb, "codes": codes, "params": params}


def opq_topk_from_index(
    index: dict, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Serve OPQ-ADC top-k from a loaded artifact: rotate the QUERY
    vectors with the stored model (query-bag-sized work), then the
    stored-codes ADC scan — identical results to the in-session
    pipeline on the same corpus (test-pinned), zero training cost."""
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        pq_adc_topk,
    )

    p = index["params"]
    r = p["m"] * p["sub_dim"]
    rot_q = pca_project_batch(
        queries, index["model"], r=r, id_col=p["id_col"],
        vec_col=p["vec_col"], out_col=p["vec_col"],
    )
    return pq_adc_topk(
        rot_q,  # corpus unused when index= is given
        rot_q,
        k=k,
        m=p["m"],
        sub_dim=p["sub_dim"],
        ksub=p["ksub"],
        id_col=p["id_col"],
        vec_col=p["vec_col"],
        index=(index["codebooks"], index["codes"]),
    )


def save_pca_model(spark, model: dict, path: str) -> None:
    """Persist a :func:`pca_fit` / :func:`opq_allocate` model as a tiny
    parquet artifact (one row per component + one mean row + one
    eigenvalue row), joining the PQ/BM25/Bloom artifact family: train
    once on the cluster, project from any session. Doubles round-trip
    EXACTLY (parquet stores IEEE bits, never decimal strings)."""
    rows = [("mean", -1, model["mean"]), ("eig", -1, model["eigenvalues"])]
    for i, comp in enumerate(model["components"]):
        rows.append(("comp", i, comp))
    if "opq_permutation" in model:
        rows.append(
            ("perm", -1, [float(p) for p in model["opq_permutation"]])
        )
    local_df(
        spark, rows, "kind string, idx int, vals array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_pca_model(spark, path: str) -> dict:
    """Load a :func:`save_pca_model` artifact — exact bit round-trip
    (pinned by test: projections from the loaded model equal the
    in-memory model's)."""
    rows = spark.read.parquet(path).collect()
    by_kind: dict = {}
    comps = {}
    for r in rows:
        if r["kind"] == "comp":
            comps[r["idx"]] = list(r["vals"])
        else:
            by_kind[r["kind"]] = list(r["vals"])
    if "mean" not in by_kind or "eig" not in by_kind or not comps:
        raise ValueError(
            f"not a PCA model artifact at {path} (missing "
            "mean/eig/components rows)"
        )
    # adversarial-artifact sweep r11: a TRUNCATED artifact (a lost
    # component row, or rows from a different write mixed in) must not
    # load as a silently-shorter/reordered rotation — projections from
    # it would be garbage with no error anywhere downstream
    dim = len(by_kind["mean"])
    if sorted(comps) != list(range(len(comps))):
        raise ValueError(
            f"corrupt PCA model artifact at {path}: component indices "
            f"{sorted(comps)} are not contiguous from 0 (truncated or "
            "mixed write) — rebuild with save_pca_model"
        )
    widths = {len(c) for c in comps.values()} | {dim}
    if len(widths) != 1:
        raise ValueError(
            f"corrupt PCA model artifact at {path}: mean/component "
            f"widths disagree ({sorted(widths)}) — rebuild with "
            "save_pca_model"
        )
    model = {
        "mean": by_kind["mean"],
        "eigenvalues": by_kind["eig"],
        "components": [comps[i] for i in sorted(comps)],
        "dim": dim,
    }
    if "perm" in by_kind:
        model["opq_permutation"] = [int(p) for p in by_kind["perm"]]
    return model
