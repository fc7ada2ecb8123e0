"""Relational k-means (Lloyd's) over embedding columns.

The IVF coarse quantizer (Jégou et al., TPAMI 2011 — the inverted-file
half) needs cell assignments; `queries_relational.q_ann_ivf_topk` uses the
testdata's label column as a stand-in.  This module computes real cells,
Spark-first:

- Each Lloyd iteration is TWO aggregations over the posexploded vector
  table — assign (per-(vector, centroid) squared distance, argmin) and
  re-center (per-(cell, pos) mean).  No UDFs, no driver-side vectors, no
  collect: centroids live in a k·d-row DataFrame that broadcast-joins into
  the fact side.
- Determinism: seeds are the k lowest vec_ids; every intermediate
  (centroid component, distance) is rounded to 9dp, and argmin ties break
  on the smaller cell id via a struct-min — so the DuckDB oracle (same
  pipeline with the iterations unrolled as CTEs, oracles.kmeans_cells_sql)
  reproduces the assignment bit-for-bit.  The rounding also pins down
  cross-engine float-summation association noise (~1e-14 ≪ 0.5e-9).

Scale: one iteration moves O(n·d·k) rows through a map-side-combined
aggregation — the shuffle carries (vec_id, cell, partial-sum) triples, not
vectors.  Once fitted, the perf path for ASSIGNMENT at serving time is to
collect the tiny k·d centroid table and embed it as plan literals (one
narrow map, no join) — the relational form here is the fit path and the
checkable contract."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def posexplode_vectors(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, pos, x float64) — the tall form every relational vector op uses.
    spread() first: the d-fold explode of a single-split parquet scan would
    otherwise serialize every downstream aggregation on one core."""
    from es_ch_sync_spark.operators.util import spread

    emb = spread(emb)
    return emb.select(
        F.col(id_col),
        F.posexplode(F.transform(F.col(vec_col), lambda v: v.cast("double"))).alias(
            "pos", "x"
        ),
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell) after ``iters`` Lloyd iterations from deterministic seeds.

    ``cell`` is the seed vector's id (labels need not be dense).  The
    returned plan contains the whole unrolled iteration chain; callers
    running many iterations should localCheckpoint between rounds."""
    pe = posexplode_vectors(emb, id_col, vec_col)
    seeds = emb.select(id_col).orderBy(id_col).limit(k)
    cent = (
        pe.join(F.broadcast(seeds), id_col)
        .select(F.col(id_col).alias("cell"), "pos", F.round("x", 9).alias("c"))
    )
    assign = None
    for i in range(iters):
        diff = F.col("x") - F.col("c")
        dist = (
            pe.join(F.broadcast(cent), "pos")
            .groupBy(id_col, "cell")
            .agg(F.round(F.sum(diff * diff), 9).alias("d"))
        )
        assign = (
            dist.groupBy(id_col)
            .agg(F.min(F.struct("d", "cell")).alias("m"))
            .select(F.col(id_col), F.col("m.cell").alias("cell"))
        )
        if i < iters - 1:
            cent = (
                assign.join(pe, id_col)
                .groupBy("cell", "pos")
                .agg(F.round(F.avg("x"), 9).alias("c"))
            )
    return assign


def _pq_posexplode(
    emb: DataFrame, sub_dim: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, sub, spos, x) — the tall form split into M subspaces: sub =
    pos DIV sub_dim (which codebook), spos = pos % sub_dim (component
    within the subvector).  Integer DIV/%, never float division."""
    pe = posexplode_vectors(emb, id_col, vec_col)
    return pe.select(
        F.col(id_col),
        F.expr(f"pos DIV {sub_dim}").alias("sub"),
        F.expr(f"pos % {sub_dim}").alias("spos"),
        "x",
    )


def pq_fit(
    emb: DataFrame,
    m: int = 4,
    ksub: int = 4,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Product-quantization fit (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011 §II) — M independent k-means, one
    per sub_dim-wide subspace, run SIMULTANEOUSLY by carrying ``sub`` in
    every grouping key.  Returns (codes, codebook):

    - codes:    (id, sub, code) — M rows per vector, each vector encoded
                as M codeword ids (ksub^M distinct reproduction values
                from only m·ksub centroids — the whole point of PQ);
    - codebook: (sub, code, spos, c) — the FINAL per-subspace centroids
                (recomputed from the last assignment), m·ksub·sub_dim rows.

    Same determinism contract as kmeans_assign: seeds are the ksub lowest
    ids (each seed vector donates one codeword per subspace, code = seed
    id), 9dp rounding on centroid components and distances, argmin ties
    break to the smaller code via struct-min — so the DuckDB oracle
    (oracles.pq_codes_sql, iterations unrolled with ``sub`` in the keys)
    reproduces codes bit-for-bit.

    Scale: identical shuffle shape to kmeans_assign — per-iteration the
    fact side moves (id, sub, code, partial-sum) through a map-side
    combine; the codebook (m·ksub·sub_dim rows, e.g. 4·4·16 = 256) stays
    broadcast.  Training at 100 TB runs on a sample; ENCODING (the last
    assign) is the only full pass, and ADC scoring afterwards touches
    codes + a per-query LUT, never raw vectors — an 8-byte-per-vector
    scan replacing a 256-byte one."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_dim = dim // m
    pe = _pq_posexplode(emb, sub_dim, id_col, vec_col)
    seeds = emb.select(id_col).orderBy(id_col).limit(ksub)
    return _pq_fit_tall(pe, seeds, iters, id_col)


def _pq_fit_tall(
    pe: DataFrame, seeds: DataFrame, iters: int, id_col: str = "vec_id"
) -> tuple[DataFrame, DataFrame]:
    """PQ Lloyd iterations over an already-tall (id, sub, spos, x) frame —
    shared by pq_fit (raw components) and ivfpq_topk (residuals)."""
    cent = (
        pe.join(F.broadcast(seeds), id_col)
        .select("sub", F.col(id_col).alias("code"), "spos", F.round("x", 9).alias("c"))
    )
    assign = None
    for i in range(iters):
        diff = F.col("x") - F.col("c")
        dist = (
            pe.join(F.broadcast(cent), ["sub", "spos"])
            .groupBy(id_col, "sub", "code")
            .agg(F.round(F.sum(diff * diff), 9).alias("d"))
        )
        assign = (
            dist.groupBy(id_col, "sub")
            .agg(F.min(F.struct("d", "code")).alias("m"))
            .select(F.col(id_col), F.col("sub"), F.col("m.code").alias("code"))
        )
        if i < iters - 1:
            cent = (
                assign.join(pe, [id_col, "sub"])
                .groupBy("sub", "code", "spos")
                .agg(F.round(F.avg("x"), 9).alias("c"))
            )
    codebook = (
        assign.join(pe, [id_col, "sub"])
        .groupBy("sub", "code", "spos")
        .agg(F.round(F.avg("x"), 9).alias("c"))
    )
    return assign, codebook


def pq_adc_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m: int = 4,
    ksub: int = 4,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes (Jégou 2011 §III.B): build
    a per-query lookup table d(sub, code) = ||q_sub − codeword||², then
    score every vector as the SUM of M table lookups — approximate squared
    L2 distance without ever touching the stored vectors.

    Relational ADC: LUT = codebook ⋈ query-literal (m·ksub rows,
    broadcast); scores = codes ⋈ LUT → groupBy(id) sum.  The scoring scan
    reads only the (id, sub, code) table — at 100 TB that is the entire
    economics of PQ (codes are ~32× smaller than float32 vectors), and the
    shuffle carries (id, partial-sum) pairs.  Deterministic: LUT entries
    rounded 9dp, final distance 6dp, ties break on smaller id; the oracle
    (oracles.pq_adc_topk_sql) replicates every stage."""
    sub_dim = dim // m
    codes, codebook = pq_fit(emb, m, ksub, iters, dim, id_col, vec_col)
    from es_ch_sync_spark.operators.similarity import _sql_double_array

    q = [float(x) for x in query_vec]
    qcol = F.expr(_sql_double_array(q))
    qx = F.element_at(
        qcol, (F.col("sub") * sub_dim + F.col("spos") + 1).cast("int")
    )
    qdiff = qx - F.col("c")
    lut = (
        codebook.groupBy("sub", "code")
        .agg(F.round(F.sum(qdiff * qdiff), 9).alias("d"))
    )
    scored = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.col("adc_dist").asc(), F.col(id_col).asc()).limit(k)


def ivfpq_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 4,
    m: int = 4,
    ksub: int = 4,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """IVFADC (Jégou 2011 §III.C — the FAISS IVF-PQ design): coarse
    k-means cells + product quantization of the RESIDUAL x − centroid(x),
    searched by probing the query's best cell and ADC-scoring only that
    cell's codes.

    Residual PQ is what makes the composition better than either part:
    residuals are centered near 0, so the same ksub codewords per subspace
    quantize them far more finely than raw vectors.  Everything stays
    relational: residual = tall pe ⋈ assignment ⋈ broadcast centroids
    (pure column subtraction), then the SAME _pq_fit_tall Lloyd loop runs
    over the residual frame; at query time the LUT is built from the
    query's residual against the probed cell.  Scoring joins only
    (id, sub, code) rows of the probed cell with the broadcast LUT —
    at 100 TB the scan is codes-only and cell-pruned (pair with
    io/ann_index.py's partitioned layout for the storage half).

    Deterministic end-to-end (9dp intermediates, 6dp distances, id
    tie-breaks); the oracle (oracles.ivfpq_topk_sql) replicates every
    stage: coarse chain, residual frame, PQ chain, best-cell argmax,
    residual LUT, summed-lookup top-k."""
    sub_dim = dim // m
    # the coarse assignment and centroids are reused by three downstream
    # branches (residuals, probe, members) — cache them once; both are
    # small ((n, 2) and (cells·dim, 3)) so this is metadata, not data, at
    # any scale
    assign_c = kmeans_assign(
        emb, k=n_cells, iters=iters, id_col=id_col, vec_col=vec_col
    ).localCheckpoint()
    pe = posexplode_vectors(emb, id_col, vec_col)
    centc = (
        assign_c.join(pe, id_col)
        .groupBy("cell", "pos")
        .agg(F.round(F.avg("x"), 9).alias("cc"))
    ).cache()
    resid = (
        pe.join(assign_c, id_col)
        .join(F.broadcast(centc), ["cell", "pos"])
        .select(
            F.col(id_col),
            F.expr(f"pos DIV {sub_dim}").alias("sub"),
            F.expr(f"pos % {sub_dim}").alias("spos"),
            (F.col("x") - F.col("cc")).alias("x"),
        )
    )
    # the Lloyd loop re-reads the residual frame every iteration and the
    # fitted codes/codebook feed two branches — cache the working set, the
    # standard pattern for iterative fitting (at 100 TB training runs on a
    # sample; encoding is one pass)
    resid = resid.localCheckpoint()
    seeds = emb.select(id_col).orderBy(id_col).limit(ksub)
    codes, codebook = _pq_fit_tall(resid, seeds, iters, id_col)
    codes, codebook = codes.localCheckpoint(), codebook.localCheckpoint()

    from es_ch_sync_spark.operators.similarity import _sql_double_array

    q = [float(x) for x in query_vec]
    qn = sum(x * x for x in q) ** 0.5
    qcol = F.expr(_sql_double_array(q))
    # best cell by centroid cosine (ties → smaller cell id)
    cq = centc.withColumn("qx", F.element_at(qcol, (F.col("pos") + 1).cast("int")))
    cell_scores = cq.groupBy("cell").agg(
        F.sum(F.col("cc") * F.col("qx")).alias("dot"),
        F.sqrt(F.sum(F.col("cc") * F.col("cc"))).alias("cn"),
    )
    ccos = F.when(
        F.col("cn") > 0, F.col("dot") / (F.col("cn") * F.lit(qn))
    ).otherwise(F.lit(-2.0))
    best = (
        cell_scores.select("cell", F.round(ccos, 9).alias("ccos"))
        .agg(
            F.min(
                F.struct((-F.col("ccos")).alias("nc"), F.col("cell").alias("cell"))
            ).alias("m")
        )
        .select(F.col("m.cell").alias("best_cell"))
    )
    # query residual against the probed cell's centroid
    qr = (
        centc.join(F.broadcast(best), centc.cell == F.col("best_cell"))
        .select(
            "pos",
            (
                F.element_at(qcol, (F.col("pos") + 1).cast("int")) - F.col("cc")
            ).alias("qr"),
        )
    )
    lut = (
        codebook.withColumn(
            "pos", (F.col("sub") * sub_dim + F.col("spos")).cast("int")
        )
        .join(F.broadcast(qr), "pos")
        .groupBy("sub", "code")
        .agg(
            F.round(
                F.sum((F.col("qr") - F.col("c")) * (F.col("qr") - F.col("c"))), 9
            ).alias("d")
        )
    )
    members = assign_c.join(
        F.broadcast(best), assign_c.cell == F.col("best_cell")
    ).select(id_col)
    scored = (
        codes.join(members, id_col, "left_semi")
        .join(F.broadcast(lut), ["sub", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.col("adc_dist").asc(), F.col(id_col).asc()).limit(k)


def ivfpq_rerank_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 50,
    n_cells: int = 4,
    m: int = 4,
    ksub: int = 4,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """IVFADC with exact reranking (Jégou 2011 §III.C "IVFADC+R" — the
    standard serving recipe): the ADC pass shortlists ``shortlist``
    candidates from the probed cell's codes, then ONLY those ids' raw
    vectors are fetched and rescored with exact cosine for the final
    top-k.  This removes the PQ approximation from the returned ranking
    while keeping the scan economics: the corpus-sized pass reads codes
    (m bytes/vector, cell-pruned); the float vectors are touched for
    ``shortlist`` rows via a broadcast semi-join — at 100 TB that is a
    point-lookup-sized read, not a scan."""
    from es_ch_sync_spark.operators.similarity import (
        _as_double,
        _sql_double_array,
        cosine,
    )

    short = ivfpq_topk(
        emb, query_vec, k=shortlist, n_cells=n_cells, m=m, ksub=ksub,
        iters=iters, dim=dim, id_col=id_col, vec_col=vec_col,
        exclude_id=exclude_id,
    ).select(id_col)
    q = F.expr(_sql_double_array([float(x) for x in query_vec]))
    scored = emb.join(F.broadcast(short), id_col).select(
        F.col(id_col), cosine(_as_double(F.col(vec_col)), q).alias("cos_sim")
    )
    out = scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)
    return out.select(id_col, F.round("cos_sim", 6).alias("cos_sim"))


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF ANN over REAL k-means cells, end-to-end relational: fit the
    coarse quantizer (kmeans_assign), recompute final centroids, pick the
    query's cell by max centroid cosine (ties → smaller cell id), brute
    top-k inside that cell only.

    Still no driver-side vectors: the best cell is a 1-row DataFrame
    cross-joined into the cell filter.  Approximate vs exact kNN by cell
    truncation, deterministic end-to-end — the oracle replicates every
    stage (oracles.ivf_kmeans_topk_sql)."""
    from es_ch_sync_spark.operators.similarity import _sql_double_array, cosine

    assign = kmeans_assign(emb, k=n_cells, iters=iters, id_col=id_col, vec_col=vec_col)
    pe = posexplode_vectors(emb, id_col, vec_col)
    cent = (
        assign.join(pe, id_col)
        .groupBy("cell", "pos")
        .agg(F.round(F.avg("x"), 9).alias("c"))
    )
    q = [float(x) for x in query_vec]
    qn = sum(x * x for x in q) ** 0.5
    # cos(centroid, q): join the k·d centroid rows with the query literal by
    # position; one k-row aggregate, then a 1-row argmax (min struct over
    # (-cos, cell) — negation gives max with smaller-cell tie-break)
    qcol = F.expr(_sql_double_array(q))
    cq = cent.withColumn("qx", F.element_at(qcol, F.col("pos") + 1))
    cell_scores = cq.groupBy("cell").agg(
        F.sum(F.col("c") * F.col("qx")).alias("dot"),
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cn"),
    )
    cos_c = F.when(F.col("cn") > 0, F.col("dot") / (F.col("cn") * F.lit(qn))).otherwise(
        F.lit(-2.0)
    )
    best = (
        cell_scores.select("cell", F.round(cos_c, 9).alias("ccos"))
        .agg(
            F.min(
                F.struct((-F.col("ccos")).alias("nc"), F.col("cell").alias("cell"))
            ).alias("m")
        )
        .select(F.col("m.cell").alias("best_cell"))
    )
    members = assign.join(F.broadcast(best), assign.cell == F.col("best_cell"), "inner").select(
        id_col
    )
    cand = emb.join(members, id_col, "left_semi")
    from es_ch_sync_spark.operators.similarity import _as_double

    scored = cand.select(
        F.col(id_col), cosine(_as_double(F.col(vec_col)), qcol).alias("cos_sim")
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return (
        scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round("cos_sim", 6).alias("cos_sim"))
    )


def semantic_near_duplicates(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): k-means-cluster
    the embedding space, then find exact-cosine near-duplicate pairs ONLY
    within each cluster — pairwise comparison cost drops from n² to
    sum(n_cell²), and with k grown ~n/const the per-cell population (and so
    total cost) stays bounded at any corpus size.

    Plan shape: the cell table from :func:`kmeans_assign` is (id, cell) —
    tiny relative to vectors — and is self-joined per cell to produce the
    candidate pair list; the pair stream is explicitly repartitioned so
    the scoring map uses the whole cluster (spread() is off-limits here:
    its partition probe would execute the broadcast subtrees of a computed
    frame).  Vectors are pre-normalized ONCE PER VECTOR (n rows, not n²),
    so per-pair scoring is a single unit-dot zip_with/aggregate fold —
    without this, Catalyst re-evaluates the norm folds inside both the
    join condition and the projection, 6 folds per pair.  The fold order
    is identical to DuckDB's list_dot_product, and both engines divide by
    the same correctly-rounded sqrt, so the rounded cosine matches
    bit-for-bit at 6dp.

    The comparison threshold applies to the ROUNDED cosine (same on both
    engines) — the standard cross-engine ULP guard."""
    cells = kmeans_assign(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    cells = cells.localCheckpoint(eager=True)  # unrolled Lloyd plan; reused twice
    par = emb.sparkSession.sparkContext.defaultParallelism
    pairs = (
        cells.alias("a")
        .join(
            cells.alias("b"),
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col("a.cell").alias("cell"),
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .repartition(par, "id_a", "id_b")
    )
    from es_ch_sync_spark.operators.similarity import _as_double, dot, norm

    v = _as_double(F.col(vec_col))
    nrm = norm(v)
    unit = F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(
        F.transform(v, lambda x: x * F.lit(0.0))
    )
    va = emb.select(F.col(id_col).alias("id_a"), unit.alias("ua"))
    vb = emb.select(F.col(id_col).alias("id_b"), unit.alias("ub"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "cell",
            "id_a",
            "id_b",
            F.round(dot(F.col("ua"), F.col("ub")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_near_duplicates_incremental(
    emb_base: DataFrame,
    emb_new: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental SemDeDup ingest: fit cells on the BASE corpus once,
    freeze the re-centered centroids, assign each NEW vector to its
    nearest frozen centroid (the serving-time assignment path — one
    broadcast join, no refit), and score only pairs touching the new
    batch.  Cost per ingest batch is O(|new| · k · d) assignment +
    in-cell pairs touching new ids — never a recluster or a full-corpus
    pair sweep, which is what makes continuous corpus ingest tractable.

    Same determinism contract as the batch operator: 9dp-rounded
    centroids/distances with struct-min argmin tie-break, unit-dot cosine
    rounded at 6dp."""
    cells_base = kmeans_assign(
        emb_base, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    ).localCheckpoint(eager=True)
    pe = posexplode_vectors(emb_base, id_col, vec_col)
    centf = (
        cells_base.join(pe, id_col)
        .groupBy("cell", "pos")
        .agg(F.round(F.avg("x"), 9).alias("c"))
    )
    pen = posexplode_vectors(emb_new, id_col, vec_col)
    diff = F.col("x") - F.col("c")
    distn = (
        pen.join(F.broadcast(centf), "pos")
        .groupBy(id_col, "cell")
        .agg(F.round(F.sum(diff * diff), 9).alias("d"))
    )
    cells_new = (
        distn.groupBy(id_col)
        .agg(F.min(F.struct("d", "cell")).alias("m"))
        .select(F.col(id_col), F.col("m.cell").alias("cell"))
    )
    cells_all = (
        cells_base.withColumn("is_new", F.lit(0))
        .unionByName(cells_new.withColumn("is_new", F.lit(1)))
        .localCheckpoint(eager=True)
    )
    par = emb_base.sparkSession.sparkContext.defaultParallelism
    pairs = (
        cells_all.alias("a")
        .join(
            cells_all.alias("b"),
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & ((F.col("a.is_new") == 1) | (F.col("b.is_new") == 1)),
        )
        .select(
            F.col("a.cell").alias("cell"),
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .repartition(par, "id_a", "id_b")
    )
    from es_ch_sync_spark.operators.similarity import _as_double, dot, norm

    corpus = emb_base.unionByName(emb_new)
    v = _as_double(F.col(vec_col))
    nrm = norm(v)
    unit = F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(
        F.transform(v, lambda x: x * F.lit(0.0))
    )
    va = corpus.select(F.col(id_col).alias("id_a"), unit.alias("ua"))
    vb = corpus.select(F.col(id_col).alias("id_b"), unit.alias("ub"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "cell",
            "id_a",
            "id_b",
            F.round(dot(F.col("ua"), F.col("ub")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def assign_to_centroids(
    emb: DataFrame,
    cent: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell) nearest-centroid assignment against a FIXED centroid
    table (cell, pos, c) — the ingest step of a served IVF index: new
    vectors are routed to existing inverted lists without refitting the
    quantizer (the standard IVF practice; refit happens offline).  Same
    rounded-distance argmin as kmeans_assign's inner step, so assignment
    is deterministic and engine-independent."""
    pe = posexplode_vectors(emb, id_col, vec_col)
    diff = F.col("x") - F.col("c")
    dist = (
        pe.join(F.broadcast(cent), "pos")
        .groupBy(id_col, "cell")
        .agg(F.round(F.sum(diff * diff), 9).alias("d"))
    )
    return (
        dist.groupBy(id_col)
        .agg(F.min(F.struct("d", "cell")).alias("m"))
        .select(F.col(id_col), F.col("m.cell").alias("cell"))
    )


def grid_density_clusters(
    points: DataFrame,
    x_col,
    y_col,
    eps: float = 0.1,
    min_pts: int = 10,
) -> DataFrame:
    """Grid-based density clustering — the cell-level DBSCAN
    approximation [Ester et al. 1996; cell decomposition per Gunawan
    2013]: bin points into ε-cells, call a cell DENSE when it holds ≥
    min_pts points, and emit the connected components of the dense-cell
    8-neighborhood graph.  Points in sparse cells are noise (not
    emitted).  The embedding-space readout for "how many modes does
    this corpus occupy" that k-means can't give (no k, arbitrary
    shapes) — and the standard way DBSCAN is made distributable: the
    point-level ε-graph is never materialized, only the CELL graph
    (≤ cells² but via an 8-offset EQUI-join, never a cross join).

    Determinism contract: coordinates micro-quantize before the cell
    floor-divide (identical doubles both engines); cluster_id is the
    lexicographic MIN dense-cell key reachable (the connected_components
    min-label contract; isolated dense cells label themselves).

    Scale: one (cx, cy) hash aggregate over the points (the only
    point-volume pass) → dense-cell census → 8-offset broadcast
    equi-join → min-label CC over the CELL graph (cells ≪ points);
    the summary is census-sized."""
    from es_ch_sync_spark.operators.dedup import connected_components

    eps_m = float(int(round(eps * 1e6)))
    xq = F.round(F.col(x_col).cast("double") * 1000000.0).cast("long")
    yq = F.round(F.col(y_col).cast("double") * 1000000.0).cast("long")
    pts = points.select(
        F.floor(xq / F.lit(eps_m)).cast("long").alias("_cx"),
        F.floor(yq / F.lit(eps_m)).cast("long").alias("_cy"),
    )
    cells = pts.groupBy("_cx", "_cy").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    key = F.concat_ws(":", F.col("_cx"), F.col("_cy"))
    dense = cells.filter(F.col("_n") >= min_pts).select(
        "_cx", "_cy", "_n", key.alias("_key")
    )
    offs = points.sparkSession.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)],
        "dx long, dy long",
    )
    shifted = dense.crossJoin(F.broadcast(offs)).select(
        (F.col("_cx") + F.col("dx")).alias("_cx"),
        (F.col("_cy") + F.col("dy")).alias("_cy"),
        F.col("_key").alias("_key_b"),
    )
    edges = (
        dense.join(shifted, ["_cx", "_cy"])
        .filter(F.col("_key") < F.col("_key_b"))
        .select(F.col("_key").alias("id_a"), F.col("_key_b").alias("id_b"))
    )
    comp = connected_components(edges)
    labeled = dense.join(
        comp.withColumnRenamed("doc_id", "_key"), "_key", "left"
    ).select(
        F.coalesce(F.col("cluster_id"), F.col("_key")).alias("cluster_id"),
        "_n",
    )
    return (
        labeled.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("_n").cast("long").alias("n_points"),
        )
        .orderBy("cluster_id")
    )
