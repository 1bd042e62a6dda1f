"""Product quantization (PQ) for vector search at 100 TB.

IVF (similarity.py) bounds how much of the corpus a query SCANS;
PQ bounds how many bytes per vector the scan TOUCHES. A D-dim float32
vector (256 B at D=64) compresses to one byte-sized code per subspace
— M=4 codes here, a 64× cut — so the candidate-scoring pass streams
codes instead of vectors and the whole index of a billion-vector
corpus fits in a fraction of executor memory. Production ANN systems
(FAISS IVFPQ, SCaNN, Milvus) stack exactly these two: IVF routes,
PQ scores, the float originals re-rank the short list.

Scheme (Jegou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011):

- Split each vector into M contiguous subvectors of D/M dims.
- Per subspace m, a codebook of K entries; here the codebooks come
  from K deterministically-sampled seed vectors (md5-lowest ids — the
  same no-training baseline as ``deterministic_centroids``; swapping
  in trained k-means codebooks changes recall, not the plan).
- Encode: ``code[m] = argmin_j ||x_m − c_{m,j}||²`` (first-wins ties).
- Asymmetric distance (ADC): a query q is NOT encoded; its distance
  to a code word is ``Σ_m ||q_m − c_{m,code[m]}||²`` — computed
  against the exact query subvectors, which is what makes ADC much
  tighter than symmetric code-to-code distance.

Everything is a scan-side JVM higher-order-function expression — no
Python, no shuffle for encode; top-k adds the one per-probe window.
Distance folds accumulate LEFT-TO-RIGHT from 0.0 so the DuckDB twin
(``list_reduce``) replays the same IEEE additions in the same order:
the oracle comparison is exact, not approximate.

Spark-first note: at production scale the encode matmul would move to
an Arrow-batched ``mapInPandas`` kernel (one BLAS call per batch, as
``ivf_assign`` does); the expression form here trades peak FLOPs for
engine-exact reproducibility and zero Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bergloom_spark.functions.hashing import hash64, hash64_sql

__all__ = [
    "pq_codebook",
    "pq_encode",
    "pq_encode_sql",
    "knn_pq_adc",
    "knn_pq_adc_sql",
]

N_SUBSPACES = 4
N_CODES = 16


def pq_codebook(
    embeddings: DataFrame,
    n_codes: int = N_CODES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """K seed vectors (full-dim, double precision) chosen by md5-lowest
    id — codebook j for subspace m is seed j's m-th subvector. Bounded
    collect (K rows), exactly like a broadcast dimension."""
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(hash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_codes)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def _cb_col(codebook: list[list[float]]) -> Column:
    return F.array(
        *[F.array(*[F.lit(x) for x in seed]) for seed in codebook]
    )


def _sub_sqdist(
    vec: Column, seed: Column, m: Column, sub_dim: int
) -> Column:
    """||vec_m − seed_m||² as a left-to-right fold from 0.0 (ties the
    IEEE addition order down for the oracle).

    Shape matters: HOF lambdas run interpreted, so the fold iterates a
    pre-built squared-diff array (slice → zip_with → aggregate, one
    pass per element) instead of re-evaluating four indexed
    ``element_at`` calls per term. Same values in the same IEEE order
    (0.0 + d₀ == d₀ exactly), ~4× fewer interpreted ops."""
    start = (m * sub_dim + 1).cast("int")
    diffs = F.zip_with(
        F.slice(vec, start, sub_dim),
        F.slice(seed, start, sub_dim),
        lambda x, y: x - y,
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d * d)


def _let1(value: Column, body) -> Column:
    """Single-evaluation let-binding: HOFs lack ``let``, but a
    ``transform`` over a one-element array evaluates ``value`` once and
    binds it to the lambda variable — the body can then reference it
    many times without re-computation."""
    return F.element_at(F.transform(F.array(value), body), 1)


def pq_encode(
    embeddings: DataFrame,
    codebook: list[list[float]],
    n_subspaces: int = N_SUBSPACES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): per subspace, the index of the nearest
    codebook entry (first-wins on exact ties via ``array_position``).
    Pure projection — the 100 TB plan is scan → encode → write codes,
    two map-only passes and no shuffle anywhere."""
    dim = len(codebook[0])
    sub_dim = dim // n_subspaces
    cb = _cb_col(codebook)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(n_subspaces - 1)),
        # The distance list is computed ONCE per subspace (_let1), then
        # argmin = position of its min — the naive form re-evaluates
        # the whole K-entry distance list for array_position and again
        # for array_min.
        lambda m: _let1(
            F.transform(
                F.sequence(F.lit(0), F.lit(len(codebook) - 1)),
                lambda j: _sub_sqdist(
                    v, F.element_at(cb, (j + 1).cast("int")), m, sub_dim
                ),
            ),
            lambda ds: (F.array_position(ds, F.array_min(ds)) - 1).cast(
                "int"
            ),
        ),
    )
    return embeddings.select(F.col(id_col), codes.alias("codes"))


def knn_pq_adc(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    n_subspaces: int = N_SUBSPACES,
    n_codes: int = N_CODES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by asymmetric PQ distance: corpus side carries
    only its M small codes; each probe's exact subvectors score against
    the code words. Candidate scoring therefore reads
    ``M × 4 bytes``/row instead of the full vector — the bandwidth cut
    that makes exhaustive candidate scoring viable at corpus scale
    (and composable with IVF routing for sublinear scan).

    Output: (probe_id, neighbor_id, adc_dist, rank), self excluded,
    ties broken by neighbor id.
    """
    dim_row = embeddings.select(F.size(vec_col)).first()
    dim = dim_row[0]
    sub_dim = dim // n_subspaces
    codebook = pq_codebook(embeddings, n_codes, id_col, vec_col)
    cb = _cb_col(codebook)
    coded = pq_encode(embeddings, codebook, n_subspaces, id_col, vec_col)

    probes = embeddings.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__pv"),
    )
    cands = coded.crossJoin(F.broadcast(probes)).filter(
        F.col(id_col) != F.col("probe_id")
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(n_subspaces - 1)),
        F.lit(0.0),
        lambda acc, m: acc
        + _sub_sqdist(
            F.col("__pv"),
            F.element_at(
                cb, (F.element_at(F.col("codes"), (m + 1).cast("int")) + 1)
            ),
            m,
            sub_dim,
        ),
    )
    scored = cands.select(
        "probe_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(adc, 6).alias("adc_dist"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "adc_dist", "rank")
    )


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------
def _seeds_cte(
    n_codes: int, id_expr: str, vec_expr: str, table: str
) -> str:
    h = hash64_sql(f"({id_expr})::VARCHAR")
    return f"""
        seeds AS (
          SELECT list_transform({vec_expr}, x -> x::DOUBLE) AS sv,
                 row_number() OVER (ORDER BY {h}, {id_expr}) AS j
          FROM {table}
          ORDER BY {h}, {id_expr}
          LIMIT {n_codes}),
        cb AS (SELECT list(sv ORDER BY j) AS cbl FROM seeds)"""


def _sub_sqdist_sql(vec: str, seed: str, m: str, sub_dim: int) -> str:
    """Same fold as :func:`_sub_sqdist`: list_reduce is sequential and
    0.0 + x == x exactly, so both engines add in the same order."""
    return (
        f"list_reduce(list_transform(range(0, {sub_dim}), i ->"
        f" ({vec}[{m} * {sub_dim} + i + 1] - {seed}[{m} * {sub_dim} + i + 1])"
        f" * ({vec}[{m} * {sub_dim} + i + 1] - {seed}[{m} * {sub_dim} + i + 1])),"
        f" (a, b) -> a + b)"
    )


def _codes_expr(dim: int, n_subspaces: int, n_codes: int, vec: str) -> str:
    sub_dim = dim // n_subspaces
    d = _sub_sqdist_sql(vec, "cbl[j + 1]", "m", sub_dim)
    dists = f"list_transform(range(0, {n_codes}), j -> {d})"
    return (
        f"list_transform(range(0, {n_subspaces}), m ->"
        f" (list_position({dists}, list_min({dists})) - 1)::INT)"
    )


def pq_encode_sql(
    dim: int = 64,
    n_subspaces: int = N_SUBSPACES,
    n_codes: int = N_CODES,
    id_expr: str = "vec_id",
    vec_expr: str = "embedding",
    table: str = "embeddings",
) -> str:
    codes = _codes_expr(dim, n_subspaces, n_codes, "v")
    return f"""
        WITH {_seeds_cte(n_codes, id_expr, vec_expr, table)}
        SELECT {id_expr} AS vec_id, {codes} AS codes
        FROM (SELECT {id_expr},
                     list_transform({vec_expr}, x -> x::DOUBLE) AS v
              FROM {table}), cb
    """


def knn_pq_adc_sql(
    probe_ids: list[int],
    k: int = 5,
    dim: int = 64,
    n_subspaces: int = N_SUBSPACES,
    n_codes: int = N_CODES,
    id_expr: str = "vec_id",
    vec_expr: str = "embedding",
    table: str = "embeddings",
) -> str:
    sub_dim = dim // n_subspaces
    codes = _codes_expr(dim, n_subspaces, n_codes, "v")
    ids = ", ".join(str(i) for i in probe_ids)
    d = _sub_sqdist_sql("pv", "cbl[codes[m + 1] + 1]", "m", sub_dim)
    adc = (
        f"list_reduce(list_prepend(0.0::DOUBLE,"
        f" list_transform(range(0, {n_subspaces}), m -> {d})),"
        f" (a, b) -> a + b)"
    )
    return f"""
        WITH {_seeds_cte(n_codes, id_expr, vec_expr, table)},
        coded AS (
          SELECT {id_expr} AS nid, {codes} AS codes
          FROM (SELECT {id_expr},
                       list_transform({vec_expr}, x -> x::DOUBLE) AS v
                FROM {table}), cb),
        probes AS (
          SELECT {id_expr} AS probe_id,
                 list_transform({vec_expr}, x -> x::DOUBLE) AS pv
          FROM {table} WHERE {id_expr} IN ({ids})),
        scored AS (
          SELECT probe_id, nid AS neighbor_id, round({adc}, 6) AS adc_dist
          FROM coded, probes, cb
          WHERE nid <> probe_id),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY probe_id
            ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
          FROM scored)
        SELECT probe_id, neighbor_id, adc_dist, rank
        FROM ranked WHERE rank <= {k}
    """
