"""DuckDB oracle SQL generators for the training-data operators.

These build ANSI-SQL strings that replicate the Spark operators *exactly* —
same md5-based hash families, same normalization, same literal hyperplanes —
so the driver's order-insensitive value-hash comparison holds bit-for-bit.
Constants (stopword tables, shingle k, plane seeds) are imported from the
operator modules: one source of truth, two engines.
"""

from __future__ import annotations

from es_ch_sync_spark.operators.similarity import srp_planes
from es_ch_sync_spark.operators.text import LANGS, ROLL_MOD, STOPWORDS, TOKEN_RE

# normalized text + word list (DuckDB needs the 'g' flag; Spark's
# regexp_replace is global by default)
NORM = "trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"
WORDS_CTE = f"""
    WITH n AS (
        SELECT doc_id, text, {NORM.format(col='text')} AS nt FROM documents
    ), w AS MATERIALIZED (
        SELECT doc_id, text, nt, string_split(nt, ' ') AS ws FROM n
    )
"""


def _sw_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


def _sw_hits(lang: str) -> str:
    return f"len(list_filter(ws, x -> list_contains({_sw_list(lang)}, x)))"


def _lang_case() -> str:
    branches = []
    for i, lang in enumerate(LANGS):
        rest = [f"s_{l}" for l in LANGS[i + 1 :]]
        cond = f"s_{lang} > 0"
        if rest:
            cond += f" AND s_{lang} >= greatest({', '.join(rest)})" if len(rest) > 1 else f" AND s_{lang} >= {rest[0]}"
        branches.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(branches) + " ELSE 'und' END"


def text_analysis_sql() -> str:
    sw_cols = ",\n            ".join(f"{_sw_hits(lang)} AS s_{lang}" for lang in LANGS)
    token_re = TOKEN_RE
    return f"""
    {WORDS_CTE}
    , feat AS (
        SELECT doc_id, text, nt, ws,
            {sw_cols},
            len(ws) AS n_tokens_ws,
            length(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
            length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')) AS punct,
            list_sum(list_transform(ws, x -> length(x))) AS total_chars
    FROM w
    ), feat2 AS (
        SELECT *,
            CASE WHEN nonspace > 0 THEN punct::DOUBLE / nonspace::DOUBLE ELSE 0.0 END AS punct_ratio_raw,
            CASE WHEN n_tokens_ws > 0 THEN ({' + '.join('s_' + l for l in LANGS)})::DOUBLE / n_tokens_ws::DOUBLE ELSE 0.0 END AS sw_ratio_raw,
            CASE WHEN n_tokens_ws > 0 THEN total_chars::DOUBLE / n_tokens_ws::DOUBLE ELSE 0.0 END AS mwl_raw
        FROM feat
    )
    SELECT doc_id,
        n_tokens_ws,
        len(regexp_extract_all(text, '{token_re}')) AS n_tokens_bpe,
        {_lang_case()} AS lang_pred,
        round(punct_ratio_raw, 6) AS punct_ratio,
        round(sw_ratio_raw, 6) AS stopword_ratio,
        round(mwl_raw, 6) AS mean_word_len,
        round(
            0.4 * least(n_tokens_ws::DOUBLE / 64.0, 1.0)
          + 0.2 * least(sw_ratio_raw * 4.0, 1.0)
          + 0.2 * (CASE WHEN mwl_raw >= 3.0 AND mwl_raw <= 10.0 THEN 1.0 ELSE 0.5 END)
          + 0.2 * (1.0 - least(punct_ratio_raw * 2.0, 1.0)), 6) AS quality,
        md5(nt) AS fp_md5,
        list_reduce(
            list_prepend(0::BIGINT,
                list_transform(range(1, length(nt) + 1), i -> ascii(substr(nt, i, 1))::BIGINT)),
            (a, b) -> (a * 131 + b) % {ROLL_MOD}
        ) AS fp_roll
    FROM feat2
    """


def exact_dedup_sql() -> str:
    return f"""
    SELECT md5({NORM.format(col='text')}) AS fp,
           min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM documents GROUP BY 1
    """


def _shingles_cte(k: int, src: str = "documents") -> str:
    """CTE `sh(doc_id, shs)`: distinct word k-gram shingles, matching
    operators.dedup.word_shingles (incl. the short-doc single-shingle rule).
    ``src`` lets composed oracles (corpus_pipeline_sql) run the chain over
    a CTE instead of the raw table."""
    return f"""
    {WORDS_CTE.replace("FROM documents", f"FROM {src}")}
    , sh AS MATERIALIZED (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(ws) - {k - 1}, 1) + 1),
                   i -> array_to_string(list_slice(ws, i, i + {k - 1}), ' ')
               )) AS shs
        FROM w
    )
    """


def _minhash_buckets_sql(
    num_hashes: int, bands: int, k: int, src: str = "documents"
) -> str:
    """Shared CTE prefix `sh → mh → buckets` for every minhash pairing
    strategy (full self-join, incremental new-vs-index)."""
    from es_ch_sync_spark.operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    # 56-bit base hash per shingle (first 14 hex chars of md5), then the
    # same affine family as operators.dedup.with_minhash
    base = (
        "list_reduce(list_prepend(0::BIGINT, "
        "list_transform(range(1, 15), j -> (strpos('0123456789abcdef', substr(md5(s), j, 1)) - 1)::BIGINT)), "
        "(a, b) -> a * 16 + b)"
    )
    mh_cols = ",\n            ".join(
        f"list_min(list_transform(shs, s -> ({MINHASH_A[i]} * {base} + {MINHASH_B[i]}) % {MINHASH_P})) AS mh_{i}"
        for i in range(num_hashes)
    )
    rows = num_hashes // bands
    band_keys = []
    for b in range(bands):
        parts = " || '|' || ".join(f"mh_{b * rows + r}" for r in range(rows))
        band_keys.append(f"{{'band': {b}, 'key': md5({parts})}}")
    return f"""
    {_shingles_cte(k, src)}
    , mh AS MATERIALIZED (
        SELECT doc_id, shs,
            {mh_cols}
        FROM sh
    ), buckets AS MATERIALIZED (
        SELECT doc_id, u['band'] AS band, u['key'] AS key FROM (
            SELECT doc_id, unnest([{', '.join(band_keys)}]) AS u FROM mh
        )
    )"""


def minhash_near_dup_sql(
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.7,
    src: str = "documents",
) -> str:
    return f"""
    {_minhash_buckets_sql(num_hashes, bands, k, src)}
    , cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
        round(
            len(list_filter(sa.shs, x -> list_contains(sb.shs, x)))::DOUBLE
            / (len(sa.shs) + len(sb.shs) - len(list_filter(sa.shs, x -> list_contains(sb.shs, x))))::DOUBLE,
        6) AS jaccard
    FROM cand JOIN sh sa ON cand.id_a = sa.doc_id JOIN sh sb ON cand.id_b = sb.doc_id
    WHERE round(
            len(list_filter(sa.shs, x -> list_contains(sb.shs, x)))::DOUBLE
            / (len(sa.shs) + len(sb.shs) - len(list_filter(sa.shs, x -> list_contains(sb.shs, x))))::DOUBLE,
        6) >= {threshold}
    """


def minhash_incremental_sql(
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.7,
    new_mod: int = 10,
) -> str:
    """Mirror of dedup.minhash_incremental with new-batch membership
    doc_id % new_mod = 0: candidates are new-side × index-side bucket
    collisions only, verified by exact shingle Jaccard."""
    return f"""
    {_minhash_buckets_sql(num_hashes, bands, k)}
    , cand AS (
        SELECT DISTINCT n.doc_id AS id_new, i.doc_id AS id_index
        FROM buckets n JOIN buckets i
          ON n.band = i.band AND n.key = i.key
        WHERE n.doc_id % {new_mod} = 0 AND i.doc_id % {new_mod} != 0
    )
    SELECT id_new, id_index,
        round(
            len(list_filter(sn.shs, x -> list_contains(si.shs, x)))::DOUBLE
            / (len(sn.shs) + len(si.shs) - len(list_filter(sn.shs, x -> list_contains(si.shs, x))))::DOUBLE,
        6) AS jaccard
    FROM cand JOIN sh sn ON cand.id_new = sn.doc_id JOIN sh si ON cand.id_index = si.doc_id
    WHERE round(
            len(list_filter(sn.shs, x -> list_contains(si.shs, x)))::DOUBLE
            / (len(sn.shs) + len(si.shs) - len(list_filter(sn.shs, x -> list_contains(si.shs, x))))::DOUBLE,
        6) >= {threshold}
    """


def dedup_clusters_sql(num_hashes: int = 8, bands: int = 4, k: int = 3, threshold: float = 0.5) -> str:
    """Connected components over the minhash near-dup pairs: cluster_id =
    min doc_id transitively reachable.  The recursive CTE enumerates
    (node, reachable-label) — fine at oracle scale; the Spark side is the
    iterative min-label propagation in operators.dedup.connected_components."""
    pairs = minhash_near_dup_sql(num_hashes, bands, k, threshold)
    return f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({pairs}),
    edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    walk(id, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, w.label FROM edges e JOIN walk w ON w.id = e.dst
    )
    SELECT id AS doc_id, min(label) AS cluster_id FROM walk GROUP BY id
    """


def ngram_jaccard_sql(k: int = 3, threshold: float = 0.3) -> str:
    return f"""
    {_shingles_cte(k)}
    , e AS (SELECT doc_id, unnest(shs) AS s FROM sh),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(i::DOUBLE / (sa.n + sb.n - i)::DOUBLE, 6) AS jaccard
    FROM inter
    JOIN (SELECT doc_id, len(shs) AS n FROM sh) sa ON id_a = sa.doc_id
    JOIN (SELECT doc_id, len(shs) AS n FROM sh) sb ON id_b = sb.doc_id
    WHERE round(i::DOUBLE / (sa.n + sb.n - i)::DOUBLE, 6) > {threshold}
    """


HEX_PARSE_15 = (
    "list_reduce(list_prepend(0::BIGINT, "
    "list_transform(range(1, 16), i -> (strpos('0123456789abcdef', substr({h}, i, 1)) - 1)::BIGINT)), "
    "(a, b) -> a * 16 + b)"
)


def simhash_near_dup_sql(max_hamming: int = 12, band_bits: int = 15, bits: int = 60) -> str:
    h60 = HEX_PARSE_15.format(h="substr(md5(word), 1, 15)")
    votes = ",\n            ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{i}" for i in range(bits)
    )
    packed = " + ".join(f"(CASE WHEN v_{i} > 0 THEN (1::BIGINT << {i}) ELSE 0 END)" for i in range(bits))
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    band_rows = ", ".join(
        f"{{'band': {b}, 'key': (sh >> {b * band_bits}) & {mask}}}" for b in range(n_bands)
    )
    return f"""
    {WORDS_CTE}
    , wordrows AS (SELECT doc_id, unnest(ws) AS word FROM w),
    wh AS (SELECT doc_id, {h60} AS h FROM wordrows),
    votes AS (
        SELECT doc_id,
            {votes}
        FROM wh GROUP BY doc_id
    ), sim AS (
        SELECT doc_id, {packed} AS sh FROM votes
    ), buckets AS (
        SELECT doc_id, sh, u['band'] AS band, u['key'] AS key FROM (
            SELECT doc_id, sh, unnest([{band_rows}]) AS u FROM sim
        )
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.sh, b.sh))::BIGINT AS hamming
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
    """


def _cosine_sql(a: str, b: str) -> str:
    d = f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"
    na = f"sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[]))"
    nb = f"sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))"
    return f"CASE WHEN {na} > 0 AND {nb} > 0 THEN {d} / ({na} * {nb}) ELSE 0.0 END"


def cosine_topk_sql(query_id: int = 0, k: int = 10) -> str:
    cos = _cosine_sql("b.embedding", "q.embedding")
    return f"""
    SELECT b.vec_id, round({cos}, 6) AS cos_sim
    FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = {query_id}) q
    WHERE b.vec_id != {query_id}
    ORDER BY {cos} DESC, b.vec_id ASC
    LIMIT {k}
    """


def inner_product_topk_sql(query_id: int = 0, k: int = 10) -> str:
    ip = "list_dot_product(b.embedding::DOUBLE[], q.embedding::DOUBLE[])"
    return f"""
    SELECT b.vec_id, round({ip}, 6) AS ip
    FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = {query_id}) q
    WHERE b.vec_id != {query_id}
    ORDER BY {ip} DESC, b.vec_id ASC
    LIMIT {k}
    """


def knn_join_sql(k: int = 3) -> str:
    cos = _cosine_sql("a.embedding", "b.embedding")
    return f"""
    SELECT id_a, id_b, round(c, 6) AS cos_sim, rn FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS c,
               row_number() OVER (PARTITION BY a.vec_id ORDER BY {cos} DESC, b.vec_id ASC) AS rn
        FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
    ) WHERE rn <= {k}
    """


def _plane_literal(plane: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in plane) + "]"


def lsh_ann_topk_sql(
    query_id: int = 0,
    k: int = 10,
    n_planes: int = 12,
    bands: int = 3,
    dim: int = 64,
) -> str:
    """Replicates lsh_ann_topk: same md5-derived hyperplane literals, the
    query's signature computed in-SQL from the same planes."""
    planes = srp_planes(dim, n_planes)
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    sig_terms = " + ".join(
        f"(CASE WHEN list_dot_product(v::DOUBLE[], {_plane_literal(p)}::DOUBLE[]) >= 0 "
        f"THEN (1::BIGINT << {i}) ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    cos = _cosine_sql("c.embedding", "q.embedding")
    band_match = " OR ".join(
        f"((c.sig >> {b * bits_per_band}) & {mask}) = ((q.sig >> {b * bits_per_band}) & {mask})"
        for b in range(bands)
    )
    return f"""
    WITH sigs AS (
        SELECT vec_id, embedding, {sig_terms.replace('v::', 'embedding::')} AS sig
        FROM embeddings
    )
    SELECT c.vec_id, round({cos}, 6) AS cos_sim
    FROM sigs c, (SELECT * FROM sigs WHERE vec_id = {query_id}) q
    WHERE c.vec_id != {query_id} AND ({band_match})
    ORDER BY {cos} DESC, c.vec_id ASC
    LIMIT {k}
    """


def ann_ivf_topk_sql(query_id: int = 0, k: int = 10, dim: int = 64) -> str:
    """Oracle for queries_relational.q_ann_ivf_topk: per-label centroids
    (elementwise avg), argmax-cos cell vs the query vector (ties → smaller
    label, matching the Spark side's sorted scan), then exact cos top-k
    inside that cell.  ``dim`` is embedded as a literal (DuckDB's range()
    can't take lateral column args); the Spark side posexplodes and works
    for any dim."""
    cos = _cosine_sql("b.embedding", "q.qv")
    return f"""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {query_id}
    ),
    pe AS (
        SELECT label, i::INTEGER AS pos, embedding[i + 1]::DOUBLE AS x
        FROM embeddings CROSS JOIN (SELECT unnest(range(0, {dim})) AS i) d
    ),
    cent AS (
        SELECT label, list(c ORDER BY pos) AS cv FROM (
            SELECT label, pos, avg(x) AS c FROM pe GROUP BY label, pos
        ) GROUP BY label
    ),
    best AS (
        SELECT cent.label
        FROM cent, q
        ORDER BY (CASE WHEN sqrt(list_dot_product(cv, cv)) > 0
                  THEN list_dot_product(cv, qv)
                       / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv)))
                  ELSE -2.0 END) DESC, cent.label ASC
        LIMIT 1
    )
    SELECT b.vec_id, round({cos}, 6) AS cos_sim
    FROM embeddings b, q, best
    WHERE b.label = best.label AND b.vec_id != {query_id}
    ORDER BY {cos} DESC, b.vec_id ASC
    LIMIT {k}
    """


def kmeans_cells_sql(k: int = 4, iters: int = 2, dim: int = 64) -> str:
    """Oracle for operators.clustering.kmeans_assign: the Lloyd iterations
    unrolled as CTE pairs (dist_i → assign_i → cent_i).  Same deterministic
    construction as the Spark side: seeds = k lowest vec_ids, cell = seed
    id, every centroid component and distance rounded to 9dp, argmin ties
    broken by struct-min on (d, cell)."""
    ctes = _kmeans_ctes(k, iters, dim)
    return "WITH " + ",\n    ".join(ctes) + f"\n    SELECT vec_id, cell FROM assign{iters}"


def _kmeans_ctes(k: int, iters: int, dim: int, src: str = "embeddings") -> list[str]:
    """CTE chain pe → cent0 → (dist_i → assign_i → cent_i)* shared by
    kmeans_cells_sql and the composed oracles built on cell assignments.
    ``src`` lets composed oracles fit on a CTE (e.g. the base split of an
    incremental-ingest pairing) instead of the raw table."""
    ctes = [
        f"""pe AS (
        SELECT vec_id, i::INTEGER AS pos, embedding[i + 1]::DOUBLE AS x
        FROM {src} CROSS JOIN (SELECT unnest(range(0, {dim})) AS i) dd
    )""",
        f"""cent0 AS (
        SELECT vec_id AS cell, pos, round(x, 9) AS c FROM pe
        WHERE vec_id IN (SELECT vec_id FROM {src} ORDER BY vec_id LIMIT {k})
    )""",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""dist{i} AS (
        SELECT pe.vec_id, cent{i - 1}.cell,
               round(sum((pe.x - cent{i - 1}.c) * (pe.x - cent{i - 1}.c)), 9) AS d
        FROM pe JOIN cent{i - 1} USING (pos) GROUP BY pe.vec_id, cent{i - 1}.cell
    )"""
        )
        ctes.append(
            f"""assign{i} AS (
        SELECT vec_id, min(struct_pack(d := d, cell := cell))['cell']::BIGINT AS cell
        FROM dist{i} GROUP BY vec_id
    )"""
        )
        if i < iters:
            ctes.append(
                f"""cent{i} AS (
        SELECT a.cell, pe.pos, round(avg(pe.x), 9) AS c
        FROM assign{i} a JOIN pe ON a.vec_id = pe.vec_id GROUP BY a.cell, pe.pos
    )"""
            )
    return ctes


def semantic_near_dup_sql(
    k: int = 4, iters: int = 2, threshold: float = 0.8, dim: int = 64
) -> str:
    """Oracle for clustering.semantic_near_duplicates: k-means cells (same
    unrolled Lloyd chain as kmeans_cells_sql) → in-cell pairs → unit-dot
    cosine at 6dp.  Mirrors the Spark side's once-per-vector
    normalization: each component divides by the same correctly-rounded
    sqrt norm, then list_dot_product folds in list order — the same
    evaluation order as Spark's zip_with/aggregate fold, so the rounded
    cosines agree bit-for-bit."""
    nrm = "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
    chain = ",\n    ".join(_kmeans_ctes(k, iters, dim))
    return f"""
    WITH {chain},
    cells AS (SELECT vec_id, cell FROM assign{iters}),
    pairs AS (
        SELECT a.cell, a.vec_id AS id_a, b.vec_id AS id_b
        FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
    ),
    units AS (
        SELECT vec_id,
               CASE WHEN {nrm} > 0
                    THEN list_transform(embedding::DOUBLE[], x -> x / {nrm})
                    ELSE list_transform(embedding::DOUBLE[], x -> x * 0.0)
               END AS u
        FROM embeddings
    )
    SELECT cell, id_a, id_b, round(list_dot_product(ua.u, ub.u), 6) AS cos_sim
    FROM pairs
    JOIN units ua ON pairs.id_a = ua.vec_id
    JOIN units ub ON pairs.id_b = ub.vec_id
    WHERE round(list_dot_product(ua.u, ub.u), 6) >= {threshold}
    """


def semantic_incremental_sql(
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.3,
    dim: int = 64,
    mod: int = 10,
) -> str:
    """Oracle for clustering.semantic_near_duplicates_incremental: fit
    k-means on the base split (vec_id % mod != 0), re-center once from the
    final assignment, assign the NEW split (% mod == 0) to those frozen
    centroids by the same rounded-argmin rule, then pair only where at
    least one side is new.  Unit-dot cosine as in semantic_near_dup_sql."""
    nrm = "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
    chain = ",\n    ".join(_kmeans_ctes(k, iters, dim, src="base"))
    return f"""
    WITH base AS (SELECT * FROM embeddings WHERE vec_id % {mod} != 0),
    {chain},
    centf AS (
        SELECT a.cell, pe.pos, round(avg(pe.x), 9) AS c
        FROM assign{iters} a JOIN pe ON a.vec_id = pe.vec_id GROUP BY a.cell, pe.pos
    ),
    pen AS (
        SELECT vec_id, i::INTEGER AS pos, embedding[i + 1]::DOUBLE AS x
        FROM embeddings CROSS JOIN (SELECT unnest(range(0, {dim})) AS i) dd
        WHERE vec_id % {mod} = 0
    ),
    distn AS (
        SELECT pen.vec_id, centf.cell,
               round(sum((pen.x - centf.c) * (pen.x - centf.c)), 9) AS d
        FROM pen JOIN centf USING (pos) GROUP BY pen.vec_id, centf.cell
    ),
    assignn AS (
        SELECT vec_id, min(struct_pack(d := d, cell := cell))['cell']::BIGINT AS cell
        FROM distn GROUP BY vec_id
    ),
    cells_all AS (
        SELECT vec_id, cell, 0 AS is_new FROM assign{iters}
        UNION ALL
        SELECT vec_id, cell, 1 AS is_new FROM assignn
    ),
    pairs AS (
        SELECT a.cell, a.vec_id AS id_a, b.vec_id AS id_b
        FROM cells_all a JOIN cells_all b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
         AND (a.is_new = 1 OR b.is_new = 1)
    ),
    units AS (
        SELECT vec_id,
               CASE WHEN {nrm} > 0
                    THEN list_transform(embedding::DOUBLE[], x -> x / {nrm})
                    ELSE list_transform(embedding::DOUBLE[], x -> x * 0.0)
               END AS u
        FROM embeddings
    )
    SELECT cell, id_a, id_b, round(list_dot_product(ua.u, ub.u), 6) AS cos_sim
    FROM pairs
    JOIN units ua ON pairs.id_a = ua.vec_id
    JOIN units ub ON pairs.id_b = ub.vec_id
    WHERE round(list_dot_product(ua.u, ub.u), 6) >= {threshold}
    """


def _pq_ctes(m: int, ksub: int, iters: int, dim: int) -> str:
    """Shared CTE chain for the PQ oracles: the M simultaneous per-subspace
    Lloyd iterations of operators.clustering.pq_fit unrolled, with ``sub``
    carried in every grouping key, plus the final codebook ``centf``."""
    sub_dim = dim // m
    ctes = [
        f"""pe AS (
        SELECT vec_id, (i // {sub_dim})::INTEGER AS sub, (i % {sub_dim})::INTEGER AS spos,
               embedding[i + 1]::DOUBLE AS x
        FROM embeddings CROSS JOIN (SELECT unnest(range(0, {dim})) AS i) dd
    )""",
        f"""cent0 AS (
        SELECT sub, vec_id AS code, spos, round(x, 9) AS c FROM pe
        WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {ksub})
    )""",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""dist{i} AS (
        SELECT pe.vec_id, pe.sub, ct.code,
               round(sum((pe.x - ct.c) * (pe.x - ct.c)), 9) AS d
        FROM pe JOIN cent{i - 1} ct ON pe.sub = ct.sub AND pe.spos = ct.spos
        GROUP BY pe.vec_id, pe.sub, ct.code
    )"""
        )
        ctes.append(
            f"""assign{i} AS (
        SELECT vec_id, sub, min(struct_pack(d := d, code := code))['code']::BIGINT AS code
        FROM dist{i} GROUP BY vec_id, sub
    )"""
        )
        if i < iters:
            ctes.append(
                f"""cent{i} AS (
        SELECT a.sub, a.code, pe.spos, round(avg(pe.x), 9) AS c
        FROM assign{i} a JOIN pe ON a.vec_id = pe.vec_id AND a.sub = pe.sub
        GROUP BY a.sub, a.code, pe.spos
    )"""
            )
    ctes.append(
        f"""centf AS (
        SELECT a.sub, a.code, pe.spos, round(avg(pe.x), 9) AS c
        FROM assign{iters} a JOIN pe ON a.vec_id = pe.vec_id AND a.sub = pe.sub
        GROUP BY a.sub, a.code, pe.spos
    )"""
    )
    return "WITH " + ",\n    ".join(ctes)


def pq_codes_sql(m: int = 4, ksub: int = 4, iters: int = 2, dim: int = 64) -> str:
    """Oracle for pq_fit's code table: (vec_id, sub, code)."""
    return (
        _pq_ctes(m, ksub, iters, dim)
        + f"\n    SELECT vec_id, sub, code FROM assign{iters}"
    )


def pq_adc_topk_sql(
    query_id: int = 0, k: int = 10, m: int = 4, ksub: int = 4, iters: int = 2, dim: int = 64
) -> str:
    """Oracle for pq_adc_topk: per-query LUT from the final codebook, score
    by summed lookups over the code table, ascending-distance top-k."""
    sub_dim = dim // m
    return f"""{_pq_ctes(m, ksub, iters, dim)},
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {query_id}),
    lut AS (
        SELECT sub, code,
               round(sum((qv[sub * {sub_dim} + spos + 1] - c) * (qv[sub * {sub_dim} + spos + 1] - c)), 9) AS d
        FROM centf, q GROUP BY sub, code
    ),
    scores AS (
        SELECT a.vec_id, round(sum(l.d), 6) AS adc_dist
        FROM assign{iters} a JOIN lut l ON a.sub = l.sub AND a.code = l.code
        GROUP BY a.vec_id
    )
    SELECT vec_id, adc_dist FROM scores WHERE vec_id != {query_id}
    ORDER BY adc_dist ASC, vec_id ASC
    LIMIT {k}
    """


def ivf_kmeans_topk_sql(
    query_id: int = 0, k: int = 10, n_cells: int = 4, iters: int = 2, dim: int = 64
) -> str:
    """Oracle for operators.clustering.ivf_topk: the kmeans_cells_sql CTE
    chain, final centroids recomputed from the last assignment, query cell
    by max centroid cosine (round 9dp; ties → smaller cell), brute cos
    top-k among that cell's members."""
    kmeans = kmeans_cells_sql(n_cells, iters, dim)
    # strip the final SELECT — reuse the CTE chain
    body = kmeans.rsplit("SELECT vec_id, cell FROM", 1)[0].rstrip().rstrip(",")
    cos = _cosine_sql("b.embedding", "q.qv")
    return f"""{body},
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {query_id}),
    centf AS (
        SELECT a.cell, pe.pos, round(avg(pe.x), 9) AS c
        FROM assign{iters} a JOIN pe ON a.vec_id = pe.vec_id GROUP BY a.cell, pe.pos
    ),
    cellcos AS (
        SELECT cell,
               round(CASE WHEN sqrt(sum(c * c)) > 0
                     THEN sum(c * qv[pos + 1]) / (sqrt(sum(c * c)) * sqrt(list_dot_product(any_value(qv), any_value(qv))))
                     ELSE -2.0 END, 9) AS ccos
        FROM centf, q GROUP BY cell
    ),
    best AS (
        SELECT min(struct_pack(nc := -ccos, cell := cell))['cell']::BIGINT AS best_cell
        FROM cellcos
    )
    SELECT b.vec_id, round({cos}, 6) AS cos_sim
    FROM embeddings b
    JOIN assign{iters} a ON b.vec_id = a.vec_id
    JOIN best ON a.cell = best.best_cell, q
    WHERE b.vec_id != {query_id}
    ORDER BY {cos} DESC, b.vec_id ASC
    LIMIT {k}
    """


def ivfpq_topk_sql(
    query_id: int = 0,
    k: int = 10,
    n_cells: int = 4,
    m: int = 4,
    ksub: int = 4,
    iters: int = 2,
    dim: int = 64,
) -> str:
    """Oracle for clustering.ivfpq_topk: the coarse k-means chain
    (kmeans_cells_sql CTEs), residual frame, a prefixed PQ chain over the
    residuals, best-cell argmax, residual LUT, summed-lookup top-k."""
    sub_dim = dim // m
    coarse = kmeans_cells_sql(n_cells, iters, dim)
    body = coarse.rsplit("SELECT vec_id, cell FROM", 1)[0].rstrip().rstrip(",")
    ctes = [
        f"""centc AS (
        SELECT a.cell, pe.pos, round(avg(pe.x), 9) AS cc
        FROM assign{iters} a JOIN pe ON a.vec_id = pe.vec_id GROUP BY a.cell, pe.pos
    )""",
        f"""rpe AS (
        SELECT pe.vec_id, (pe.pos // {sub_dim})::INTEGER AS sub,
               (pe.pos % {sub_dim})::INTEGER AS spos, pe.x - centc.cc AS x
        FROM pe JOIN assign{iters} a ON pe.vec_id = a.vec_id
                JOIN centc ON a.cell = centc.cell AND pe.pos = centc.pos
    )""",
        f"""pcent0 AS (
        SELECT sub, vec_id AS code, spos, round(x, 9) AS c FROM rpe
        WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {ksub})
    )""",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""pdist{i} AS (
        SELECT rpe.vec_id, rpe.sub, ct.code,
               round(sum((rpe.x - ct.c) * (rpe.x - ct.c)), 9) AS d
        FROM rpe JOIN pcent{i - 1} ct ON rpe.sub = ct.sub AND rpe.spos = ct.spos
        GROUP BY rpe.vec_id, rpe.sub, ct.code
    )"""
        )
        ctes.append(
            f"""passign{i} AS (
        SELECT vec_id, sub, min(struct_pack(d := d, code := code))['code']::BIGINT AS code
        FROM pdist{i} GROUP BY vec_id, sub
    )"""
        )
        if i < iters:
            ctes.append(
                f"""pcent{i} AS (
        SELECT a.sub, a.code, rpe.spos, round(avg(rpe.x), 9) AS c
        FROM passign{i} a JOIN rpe ON a.vec_id = rpe.vec_id AND a.sub = rpe.sub
        GROUP BY a.sub, a.code, rpe.spos
    )"""
            )
    ctes.append(
        f"""pcentf AS (
        SELECT a.sub, a.code, rpe.spos, round(avg(rpe.x), 9) AS c
        FROM passign{iters} a JOIN rpe ON a.vec_id = rpe.vec_id AND a.sub = rpe.sub
        GROUP BY a.sub, a.code, rpe.spos
    )"""
    )
    joined = ",\n    ".join(ctes)
    return f"""{body},
    {joined},
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {query_id}),
    cellcos AS (
        SELECT cell,
               round(CASE WHEN sqrt(sum(cc * cc)) > 0
                     THEN sum(cc * qv[pos + 1]) / (sqrt(sum(cc * cc)) * sqrt(list_dot_product(any_value(qv), any_value(qv))))
                     ELSE -2.0 END, 9) AS ccos
        FROM centc, q GROUP BY cell
    ),
    best AS (
        SELECT min(struct_pack(nc := -ccos, cell := cell))['cell']::BIGINT AS best_cell
        FROM cellcos
    ),
    qr AS (
        SELECT centc.pos, qv[centc.pos + 1] - centc.cc AS qr
        FROM centc JOIN best ON centc.cell = best.best_cell, q
    ),
    lut AS (
        SELECT pcentf.sub, pcentf.code,
               round(sum((qr.qr - pcentf.c) * (qr.qr - pcentf.c)), 9) AS d
        FROM pcentf JOIN qr ON qr.pos = pcentf.sub * {sub_dim} + pcentf.spos
        GROUP BY pcentf.sub, pcentf.code
    ),
    scores AS (
        SELECT a.vec_id, round(sum(l.d), 6) AS adc_dist
        FROM passign{iters} a
        JOIN assign{iters} ca ON a.vec_id = ca.vec_id
        JOIN best ON ca.cell = best.best_cell
        JOIN lut l ON a.sub = l.sub AND a.code = l.code
        GROUP BY a.vec_id
    )
    SELECT vec_id, adc_dist FROM scores WHERE vec_id != {query_id}
    ORDER BY adc_dist ASC, vec_id ASC
    LIMIT {k}
    """


def ivfpq_rerank_topk_sql(
    query_id: int = 0,
    k: int = 10,
    shortlist: int = 50,
    n_cells: int = 4,
    m: int = 4,
    ksub: int = 4,
    iters: int = 2,
    dim: int = 64,
) -> str:
    """Oracle for clustering.ivfpq_rerank_topk: the ivfpq_topk_sql chain
    with its final top-k widened to the ADC shortlist, then exact cosine
    rerank over only those ids."""
    base = ivfpq_topk_sql(query_id, shortlist, n_cells, m, ksub, iters, dim)
    tail = f"""
    SELECT vec_id, adc_dist FROM scores WHERE vec_id != {query_id}
    ORDER BY adc_dist ASC, vec_id ASC
    LIMIT {shortlist}
    """
    if not base.endswith(tail):
        # Not an assert: under ``python -O`` an assert is stripped and a
        # changed tail would silently slice the SQL into a malformed
        # query (ADVICE r14).
        raise RuntimeError("ivfpq_topk_sql tail changed; rerank oracle "
                           "string surgery would corrupt the SQL")
    cos = _cosine_sql("b.embedding", "q.qv")
    return base[: -len(tail)] + f""",
    short AS (
        SELECT vec_id FROM scores WHERE vec_id != {query_id}
        ORDER BY adc_dist ASC, vec_id ASC
        LIMIT {shortlist}
    )
    SELECT b.vec_id, round({cos}, 6) AS cos_sim
    FROM embeddings b JOIN short USING (vec_id), q
    ORDER BY {cos} DESC, b.vec_id ASC
    LIMIT {k}
    """


def ivfpq_probe_topk_sql(
    query_id: int = 0,
    k: int = 10,
    nprobe: int = 2,
    n_cells: int = 4,
    m: int = 4,
    ksub: int = 4,
    iters: int = 2,
    dim: int = 64,
) -> str:
    """Oracle for io.ann_index.search_ivfpq_index over a freshly built
    index: same CTE chain as ivfpq_topk_sql, but the single best-cell
    argmax generalizes to the top-``nprobe`` cells and the LUT is keyed
    (cell, sub, code) — each vector scores against the residual table of
    ITS OWN cell, membership in a probed cell implied by the lut join."""
    sub_dim = dim // m
    coarse = kmeans_cells_sql(n_cells, iters, dim)
    body = coarse.rsplit("SELECT vec_id, cell FROM", 1)[0].rstrip().rstrip(",")
    ctes = [
        f"""centc AS (
        SELECT a.cell, pe.pos, round(avg(pe.x), 9) AS cc
        FROM assign{iters} a JOIN pe ON a.vec_id = pe.vec_id GROUP BY a.cell, pe.pos
    )""",
        f"""rpe AS (
        SELECT pe.vec_id, (pe.pos // {sub_dim})::INTEGER AS sub,
               (pe.pos % {sub_dim})::INTEGER AS spos, pe.x - centc.cc AS x
        FROM pe JOIN assign{iters} a ON pe.vec_id = a.vec_id
                JOIN centc ON a.cell = centc.cell AND pe.pos = centc.pos
    )""",
        f"""pcent0 AS (
        SELECT sub, vec_id AS code, spos, round(x, 9) AS c FROM rpe
        WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {ksub})
    )""",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""pdist{i} AS (
        SELECT rpe.vec_id, rpe.sub, ct.code,
               round(sum((rpe.x - ct.c) * (rpe.x - ct.c)), 9) AS d
        FROM rpe JOIN pcent{i - 1} ct ON rpe.sub = ct.sub AND rpe.spos = ct.spos
        GROUP BY rpe.vec_id, rpe.sub, ct.code
    )"""
        )
        ctes.append(
            f"""passign{i} AS (
        SELECT vec_id, sub, min(struct_pack(d := d, code := code))['code']::BIGINT AS code
        FROM pdist{i} GROUP BY vec_id, sub
    )"""
        )
        if i < iters:
            ctes.append(
                f"""pcent{i} AS (
        SELECT a.sub, a.code, rpe.spos, round(avg(rpe.x), 9) AS c
        FROM passign{i} a JOIN rpe ON a.vec_id = rpe.vec_id AND a.sub = rpe.sub
        GROUP BY a.sub, a.code, rpe.spos
    )"""
            )
    ctes.append(
        f"""pcentf AS (
        SELECT a.sub, a.code, rpe.spos, round(avg(rpe.x), 9) AS c
        FROM passign{iters} a JOIN rpe ON a.vec_id = rpe.vec_id AND a.sub = rpe.sub
        GROUP BY a.sub, a.code, rpe.spos
    )"""
    )
    joined = ",\n    ".join(ctes)
    return f"""{body},
    {joined},
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {query_id}),
    cellcos AS (
        SELECT cell,
               round(CASE WHEN sqrt(sum(cc * cc)) > 0
                     THEN sum(cc * qv[pos + 1]) / (sqrt(sum(cc * cc)) * sqrt(list_dot_product(any_value(qv), any_value(qv))))
                     ELSE -2.0 END, 9) AS ccos
        FROM centc, q GROUP BY cell
    ),
    probed AS (
        SELECT cell FROM cellcos ORDER BY ccos DESC, cell ASC LIMIT {nprobe}
    ),
    qr AS (
        SELECT centc.cell, centc.pos, qv[centc.pos + 1] - centc.cc AS qr
        FROM centc JOIN probed USING (cell), q
    ),
    lut AS (
        SELECT qr.cell, pcentf.sub, pcentf.code,
               round(sum((qr.qr - pcentf.c) * (qr.qr - pcentf.c)), 9) AS d
        FROM pcentf JOIN qr ON qr.pos = pcentf.sub * {sub_dim} + pcentf.spos
        GROUP BY qr.cell, pcentf.sub, pcentf.code
    ),
    scores AS (
        SELECT a.vec_id, round(sum(l.d), 6) AS adc_dist
        FROM passign{iters} a
        JOIN assign{iters} ca ON a.vec_id = ca.vec_id
        JOIN lut l ON l.cell = ca.cell AND a.sub = l.sub AND a.code = l.code
        GROUP BY a.vec_id
    )
    SELECT vec_id, adc_dist FROM scores WHERE vec_id != {query_id}
    ORDER BY adc_dist ASC, vec_id ASC
    LIMIT {k}
    """


def embedding_near_dup_sql(
    threshold: float = 0.4, n_planes: int = 12, bands: int = 4, dim: int = 64
) -> str:
    planes = srp_planes(dim, n_planes)
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    sig_terms = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {_plane_literal(p)}::DOUBLE[]) >= 0 "
        f"THEN (1::BIGINT << {i}) ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    band_rows = ", ".join(
        f"{{'band': {b}, 'key': (sig >> {b * bits_per_band}) & {mask}}}" for b in range(bands)
    )
    cos = _cosine_sql("sa.embedding", "sb.embedding")
    return f"""
    WITH sigs AS MATERIALIZED (
        SELECT vec_id, embedding, {sig_terms} AS sig FROM embeddings
    ), buckets AS MATERIALIZED (
        SELECT vec_id, embedding, u['band'] AS band, u['key'] AS key FROM (
            SELECT vec_id, embedding, unnest([{band_rows}]) AS u FROM sigs
        )
    ), pairs AS (
        SELECT DISTINCT sa.vec_id AS id_a, sb.vec_id AS id_b, {cos} AS c
        FROM buckets sa JOIN buckets sb
          ON sa.band = sb.band AND sa.key = sb.key AND sa.vec_id < sb.vec_id
    )
    SELECT id_a, id_b, round(c, 6) AS cos_sim FROM pairs WHERE c >= {threshold}
    """


def multimodal_features_sql() -> str:
    """Oracle for extract_features over media_from_documents: blob = UTF-8
    bytes of text, md5 identical, 8 features from 4-hex-char slices of the
    digest.  Emits one scalar row per (media_id, pos) — the driver's
    canonicalizer can't hash array cells — float32-cast then widened and
    rounded exactly like the Spark side."""
    hex4 = (
        "list_reduce(list_prepend(0::BIGINT, "
        "list_transform(range(1, 5), j -> "
        "(strpos('0123456789abcdef', substr(h, pos * 4 + j, 1)) - 1)::BIGINT)), "
        "(a, b) -> a * 16 + b)"
    )
    return f"""
    WITH m AS (SELECT doc_id AS media_id, text, md5(text) AS h FROM documents)
    SELECT media_id,
           strlen(text)::BIGINT AS n_bytes,
           h AS content_md5,
           pos::INTEGER AS pos,
           round((({hex4})::DOUBLE / 65535.0)::FLOAT::DOUBLE, 6) AS feature_value
    FROM m, range(0, 8) t(pos)
    """


# ---------------------------------------------------------------------------
# Deterministic sampling / splits (operators.sampling)
# ---------------------------------------------------------------------------


def _hash_bucket_sql(id_expr: str, seed: str) -> str:
    """DuckDB mirror of sampling._hash_bucket: first 56 bits of
    md5(seed:id) as bigint, mod SPLIT_BUCKETS (hex parsed by fold — DuckDB
    has no conv())."""
    from es_ch_sync_spark.operators.sampling import SPLIT_BUCKETS

    return (
        "list_reduce(list_prepend(0::BIGINT, "
        "list_transform(range(1, 15), j -> "
        f"(strpos('0123456789abcdef', substr(md5('{seed}:' || {id_expr}), j, 1)) - 1)::BIGINT)), "
        f"(a, b) -> a * 16 + b) % {SPLIT_BUCKETS}"
    )


def _split_case_sql(
    weights: dict[str, float] | None = None,
    seed: str = "split",
    id_expr: str = "doc_id",
) -> str:
    """CASE expression assigning doc_id a split name — shared by
    train_test_split_sql and corpus_pipeline_sql."""
    from es_ch_sync_spark.operators.sampling import SPLIT_BUCKETS

    weights = weights or {"train": 0.9, "valid": 0.05, "test": 0.05}
    b = _hash_bucket_sql(id_expr, seed)
    names = list(weights)
    acc = 0.0
    whens = []
    for name in names[:-1]:
        acc += weights[name]
        whens.append(f"WHEN {b} < {int(round(acc * SPLIT_BUCKETS))} THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"


def train_test_split_sql(weights: dict[str, float] | None = None, seed: str = "split") -> str:
    return f"SELECT doc_id, {_split_case_sql(weights, seed)} AS split FROM documents"


def corpus_pipeline_sql(threshold: float = 0.5) -> str:
    """Oracle for the end-to-end corpus pipeline: exact-dedup keep-one →
    minhash near-dup clusters over the survivors → keep each cluster's
    representative → split assignment.  The minhash/CC chain runs over the
    ``kept`` CTE via the generators' src parameter."""
    pairs = minhash_near_dup_sql(threshold=threshold, src="kept")
    return f"""
    WITH RECURSIVE kept AS (
        SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   min(doc_id) OVER (PARTITION BY md5({NORM.format(col='text')})) AS keep
            FROM documents
        ) WHERE doc_id = keep
    ),
    pairs AS ({pairs}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    walk(id, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, w.label FROM edges e JOIN walk w ON w.id = e.dst
    ),
    clusters AS (
        SELECT id AS doc_id, min(label) AS cluster_id FROM walk GROUP BY id
    ),
    nonreps AS (SELECT doc_id FROM clusters WHERE cluster_id != doc_id)
    SELECT k.doc_id, {_split_case_sql(id_expr="k.doc_id")} AS split
    FROM kept k LEFT JOIN nonreps nr ON k.doc_id = nr.doc_id
    WHERE nr.doc_id IS NULL
    """


def stratified_sample_sql(
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_expr: str = "event_id",
    seed: str = "strat",
) -> str:
    from es_ch_sync_spark.operators.sampling import SPLIT_BUCKETS

    b = _hash_bucket_sql(id_expr, seed)
    whens = " ".join(
        f"WHEN {strata_col} = '{v}' THEN {int(round(float(f) * SPLIT_BUCKETS))}"
        for v, f in fractions.items()
    )
    cut = f"CASE {whens} ELSE {int(round(float(default_fraction) * SPLIT_BUCKETS))} END"
    return f"""
    SELECT event_id, ts, user_id, event_type
    FROM events
    WHERE {b} < ({cut})
    """


def tfidf_top_terms_sql(k: int = 3) -> str:
    """Mirror of text.tfidf_top_terms: rank on the 6dp-rounded score (ln
    last-ulp differences between libm implementations must not reorder)."""
    return f"""
    {WORDS_CTE}
    , e AS (SELECT doc_id, unnest(ws) AS term FROM w),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM e GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
               round(tf.tf::DOUBLE * ln(nd.n_docs::DOUBLE / dfreq.df::DOUBLE), 6) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN nd
    )
    SELECT doc_id, term, tf, df, tfidf, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """


def decontaminate_sql(
    ngram_k: int = 5,
    weights: dict[str, float] | None = None,
    seed: str = "split",
    holdout: str = "test",
) -> str:
    """Mirror of sampling.decontaminate over the documents table."""
    case = _split_case_sql(weights, seed)
    return f"""
    {_shingles_cte(ngram_k)}
    , labeled AS (
        SELECT sh.doc_id, {case.replace('doc_id', 'sh.doc_id')} AS split, shs FROM sh
    ), grams AS (
        SELECT doc_id, split, unnest(shs) AS gram FROM labeled
    ), hold AS (
        SELECT DISTINCT gram FROM grams WHERE split = '{holdout}'
    )
    SELECT g.doc_id, count(DISTINCT g.gram) AS n_contaminated_grams
    FROM grams g JOIN hold USING (gram)
    WHERE g.split = 'train'
    GROUP BY g.doc_id
    """


def source_cap_sql(cap: int = 50, seed: str = "cap") -> str:
    """Mirror of sampling.source_cap: per-source row_number in
    md5(seed:id) order, keep rn <= cap."""
    return f"""
    SELECT doc_id, source, rn FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                   ORDER BY md5('{seed}:' || doc_id::VARCHAR) ASC, doc_id ASC) AS rn
        FROM documents
    ) WHERE rn <= {cap}
    """


def global_shuffle_sql(seed: str = "shuf") -> str:
    """Mirror of sampling.global_shuffle: the two-phase bucketed rank
    equals one row_number over the composite (bucket, h, id) order."""
    from es_ch_sync_spark.operators.sampling import GLOBAL_SHUFFLE_BUCKETS

    b = _hash_bucket_sql("doc_id", seed + "-b")
    return f"""
    WITH r AS (
        SELECT doc_id,
               md5('{seed}:' || doc_id::VARCHAR) AS h,
               ({b}) % {GLOBAL_SHUFFLE_BUCKETS} AS bucket
        FROM documents
    )
    SELECT doc_id,
           (row_number() OVER (ORDER BY bucket ASC, h ASC, doc_id ASC) - 1)::BIGINT
               AS shuffle_pos
    FROM r
    """


def quality_budget_select_sql(budget_tokens: int = 100_000) -> str:
    """Mirror of sampling.quality_budget_select: cumulative token sum over
    the (quality desc, doc_id) order, keep the within-budget prefix.
    Reuses the full text_analysis_sql pipeline as a CTE so the quality
    definition can never drift between the two queries."""
    return f"""
    WITH ta AS ({text_analysis_sql()})
    SELECT doc_id, quality, n_tokens, cum_tokens FROM (
        SELECT doc_id, quality, n_tokens_ws::BIGINT AS n_tokens,
               sum(n_tokens_ws) OVER (
                   ORDER BY quality DESC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tokens
        FROM ta
    ) WHERE cum_tokens <= {budget_tokens}
    """


def pack_sequences_sql(budget: int = 512, n_shards: int = 32) -> str:
    """Mirror of sampling.pack_sequences: shard-parallel exclusive cumsum
    of whitespace token counts, chunk = start_offset div budget."""
    return f"""
    {WORDS_CTE}
    , toks AS (
        SELECT doc_id, doc_id % {n_shards} AS shard, len(ws)::BIGINT AS n_tokens FROM w
    )
    SELECT doc_id, shard, n_tokens,
           coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_offset,
           (coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // {budget})::BIGINT AS chunk
    FROM toks
    """


def dedup_keep_best_sql(threshold: float = 0.5) -> str:
    """Mirror of dedup.keep_best_per_cluster: CC clusters (recursive CTE)
    joined to the text_analysis quality score, representative = quality
    DESC / doc_id ASC per cluster."""
    pairs = minhash_near_dup_sql(threshold=threshold)
    ta = text_analysis_sql()
    return f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({pairs}),
    edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    walk(id, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, w.label FROM edges e JOIN walk w ON w.id = e.dst
    ),
    clusters AS MATERIALIZED (SELECT id AS doc_id, min(label) AS cluster_id FROM walk GROUP BY id),
    ta AS MATERIALIZED ({ta}),
    ranked AS (
        SELECT c.cluster_id, c.doc_id, ta.quality,
               row_number() OVER (PARTITION BY c.cluster_id
                                  ORDER BY ta.quality DESC, c.doc_id ASC) AS rn,
               count(*) OVER (PARTITION BY c.cluster_id) AS n_members
        FROM clusters c JOIN ta ON c.doc_id = ta.doc_id
    )
    SELECT cluster_id, doc_id AS keep_id, quality, n_members FROM ranked WHERE rn = 1
    """


def corpus_pipeline_best_sql(threshold: float = 0.5) -> str:
    """corpus_pipeline_sql with QUALITY-ranked cluster representatives
    (keep_best_per_cluster policy) instead of min-id: the survivor of each
    near-dup cluster is its highest-quality member (quality DESC, doc_id
    ASC)."""
    pairs = minhash_near_dup_sql(threshold=threshold, src="kept")
    ta = text_analysis_sql()
    return f"""
    WITH RECURSIVE kept AS (
        SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   min(doc_id) OVER (PARTITION BY md5({NORM.format(col='text')})) AS keep
            FROM documents
        ) WHERE doc_id = keep
    ),
    pairs AS ({pairs}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    walk(id, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, w.label FROM edges e JOIN walk w ON w.id = e.dst
    ),
    clusters AS (
        SELECT id AS doc_id, min(label) AS cluster_id FROM walk GROUP BY id
    ),
    ta AS ({ta}),
    ranked AS (
        SELECT c.doc_id,
               row_number() OVER (PARTITION BY c.cluster_id
                                  ORDER BY ta.quality DESC, c.doc_id ASC) AS rn
        FROM clusters c JOIN ta ON c.doc_id = ta.doc_id
    ),
    nonreps AS (SELECT doc_id FROM ranked WHERE rn > 1)
    SELECT k.doc_id, {_split_case_sql(id_expr="k.doc_id")} AS split
    FROM kept k LEFT JOIN nonreps nr ON k.doc_id = nr.doc_id
    WHERE nr.doc_id IS NULL
    """


def decontaminate_fuzzy_sql(
    threshold: float = 0.3,
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
    weights: dict[str, float] | None = None,
    seed: str = "split",
    holdout: str = "test",
) -> str:
    """Mirror of sampling.decontaminate_fuzzy: per-doc minhash bucket keys
    are split-independent, so the oracle buckets ALL docs once and filters
    by split at the join."""
    case = _split_case_sql(weights, seed)
    return f"""
    {_minhash_buckets_sql(num_hashes, bands, k)}
    , labeled AS (SELECT doc_id, {case} AS split FROM documents),
    bt AS (
        SELECT b.doc_id, b.band, b.key FROM buckets b
        JOIN labeled l USING (doc_id) WHERE l.split = 'train'
    ),
    bh AS (
        SELECT b.doc_id AS holdout_id, b.band, b.key FROM buckets b
        JOIN labeled l USING (doc_id) WHERE l.split = '{holdout}'
    ),
    cand AS (
        SELECT DISTINCT bt.doc_id, bh.holdout_id
        FROM bt JOIN bh ON bt.band = bh.band AND bt.key = bh.key
    )
    SELECT c.doc_id, c.holdout_id,
        round(
            len(list_filter(sa.shs, x -> list_contains(sb.shs, x)))::DOUBLE
            / (len(sa.shs) + len(sb.shs) - len(list_filter(sa.shs, x -> list_contains(sb.shs, x))))::DOUBLE,
        6) AS jaccard
    FROM cand c JOIN sh sa ON c.doc_id = sa.doc_id JOIN sh sb ON c.holdout_id = sb.doc_id
    WHERE round(
            len(list_filter(sa.shs, x -> list_contains(sb.shs, x)))::DOUBLE
            / (len(sa.shs) + len(sb.shs) - len(list_filter(sa.shs, x -> list_contains(sb.shs, x))))::DOUBLE,
        6) >= {threshold}
    """


def sq8_topk_sql(query_id: int = 0, k: int = 10, rerank: int = 50, dim: int = 64) -> str:
    """Mirror of similarity.sq8_topk: per-dim min/max codebook from the
    corpus, midpoint decode, rounded-approx candidate cut, exact-cosine
    rerank."""
    lo = "sarr.mns[i]"
    hi = "sarr.mxs[i]"
    code = f"least(floor((embedding[i]::DOUBLE - {lo}) / ({hi} - {lo}) * 256.0), 255.0)"
    decode = (
        f"CASE WHEN {hi} > {lo} "
        f"THEN {lo} + (({code}) + 0.5) * ({hi} - {lo}) / 256.0 "
        f"ELSE {lo} END"
    )
    acos = _cosine_sql("dec.dv", "q.qv")
    final_cos = _cosine_sql("b.embedding", "q.qv")
    return f"""
    WITH dims AS (SELECT unnest(range(1, {dim + 1})) AS pos),
    stats AS (
        SELECT pos, min(embedding[pos]::DOUBLE) AS mn, max(embedding[pos]::DOUBLE) AS mx
        FROM embeddings, dims GROUP BY pos
    ),
    sarr AS (
        SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs FROM stats
    ),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {query_id}),
    dec AS (
        SELECT vec_id,
               list_transform(range(1, {dim + 1}), i -> {decode}) AS dv
        FROM embeddings, sarr WHERE vec_id != {query_id}
    ),
    approx AS (
        SELECT dec.vec_id, round({acos}, 6) AS acos FROM dec, q
    ),
    cand AS (SELECT vec_id FROM approx ORDER BY acos DESC, vec_id ASC LIMIT {rerank})
    SELECT b.vec_id, round({final_cos}, 6) AS cos_sim
    FROM embeddings b JOIN cand USING (vec_id), q
    ORDER BY {final_cos} DESC, b.vec_id ASC
    LIMIT {k}
    """


def bm25_topk_sql(
    terms: list[str], k: int = 15, k1: float = 1.2, b: float = 0.75
) -> str:
    """Mirror of text.bm25_topk: Lucene-variant Okapi BM25 over the
    whitespace-normalized token stream; per-term component half-up rounded
    to 6dp then summed as exact scaled integers (order-independent)."""
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
    {WORDS_CTE}
    , base AS (SELECT doc_id, len(ws) AS dl, ws FROM w)
    , stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM base)
    , tok AS (SELECT doc_id, dl, unnest(ws) AS term FROM base)
    , tf AS (
        SELECT doc_id, dl, term, count(*)::BIGINT AS tf
        FROM tok WHERE term IN ({tl}) GROUP BY doc_id, dl, term
    )
    , dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)
    , comp AS (
        SELECT tf.doc_id,
               floor(
                 ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * {k1 + 1.0}) / (tf + {k1} * ({1.0 - b} + {b} * dl / avgdl))
                 * 1e6 + 0.5
               ) / 1e6 AS c6
        FROM tf JOIN dfreq USING (term) CROSS JOIN stats
    )
    SELECT doc_id,
           sum(round(c6 * 1e6)::BIGINT) / 1e6 AS bm25,
           count(*)::BIGINT AS n_matched
    FROM comp GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id ASC LIMIT {k}
    """


def contamination_report_sql(
    ngram_k: int = 5,
    weights: dict[str, float] | None = None,
    seed: str = "split",
    holdout: str = "test",
) -> str:
    """Mirror of sampling.contamination_report (holdout-side dirtiness)."""
    case = _split_case_sql(weights, seed)
    return f"""
    {_shingles_cte(ngram_k)}
    , labeled AS (
        SELECT sh.doc_id, {case.replace('doc_id', 'sh.doc_id')} AS split, shs FROM sh
    ), grams AS (
        SELECT doc_id, split, unnest(shs) AS gram FROM labeled
    ), train AS (
        SELECT DISTINCT gram FROM grams WHERE split = 'train'
    )
    SELECT g.doc_id,
           count(*)::BIGINT AS n_grams,
           sum(CASE WHEN t.gram IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_dirty,
           floor(sum(CASE WHEN t.gram IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                 / count(*)::DOUBLE * 1e6 + 0.5) / 1e6 AS dirty_ratio
    FROM grams g LEFT JOIN train t ON g.gram = t.gram
    WHERE g.split = '{holdout}'
    GROUP BY g.doc_id
    """


def negative_sample_pairs_sql(
    k: int = 4, anchor_every: int = 50, seed: str = "neg"
) -> str:
    """Mirror of sampling.negative_sample_pairs: dense positions via one
    row_number over the composite (hash-bucket, id) order (== the engine's
    two-phase bucketed rank), then the 56-bit md5 fold of seed:anchor:slot
    mod corpus size indexes POSITIONS, anchor-collision deflected to +1."""
    from es_ch_sync_spark.operators.sampling import GLOBAL_SHUFFLE_BUCKETS

    b = _hash_bucket_sql("doc_id", seed + "-b")
    h = (
        "list_reduce(list_prepend(0::BIGINT, "
        "list_transform(range(1, 15), j -> "
        f"(strpos('0123456789abcdef', substr(md5('{seed}:' || anchor_id::VARCHAR || ':' || slot::VARCHAR), j, 1)) - 1)::BIGINT)), "
        "(a, b) -> a * 16 + b)"
    )
    return f"""
    WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
    idx AS (
        SELECT doc_id, source,
               (row_number() OVER (
                   ORDER BY ({b}) % {GLOBAL_SHUFFLE_BUCKETS} ASC, doc_id ASC
               ) - 1)::BIGINT AS pos
        FROM documents
    ),
    a AS (SELECT doc_id AS anchor_id, pos AS anchor_pos
          FROM idx WHERE pos % {anchor_every} = 0),
    s AS (SELECT anchor_id, anchor_pos, unnest(range(0, {k})) AS slot FROM a),
    hashed AS (
        SELECT anchor_id, anchor_pos, slot, {h} % n AS raw, n
        FROM s CROSS JOIN nn
    ),
    p AS (
        SELECT anchor_id, slot,
               CASE WHEN raw = anchor_pos THEN (raw + 1) % n ELSE raw END AS neg_pos
        FROM hashed
    )
    SELECT p.anchor_id, p.slot, i.doc_id AS neg_id, i.source AS neg_source
    FROM p JOIN idx i ON i.pos = p.neg_pos
    """


def pca_top_component_sql(dim: int = 64, iters: int = 8) -> str:
    """Mirror of features.pca_top_component: the quantized Gram build and
    the power iteration unrolled into one CTE per round — every
    association-order-dependent sum accumulates floor-quantized BIGINTs,
    so DuckDB walks the identical IEEE path as the Python driver loop."""
    ctes = [
        f"nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM embeddings)",
        f"""g AS MATERIALIZED (
        SELECT ii.i AS i, jj.j AS j,
               (CAST(sum(floor(embedding[ii.i + 1]::DOUBLE
                               * embedding[jj.j + 1]::DOUBLE
                               * 1e6 + 0.5)::BIGINT) AS BIGINT)::DOUBLE
                / 1e6) / (SELECT n FROM nn) AS val
        FROM embeddings
        CROSS JOIN (SELECT unnest(range(0, {dim})) AS i) ii
        CROSS JOIN (SELECT unnest(range(0, {dim})) AS j) jj
        GROUP BY 1, 2
    )""",
        f"v0 AS MATERIALIZED (SELECT unnest(range(0, {dim}))::INTEGER AS i, 1.0 / sqrt({dim}.0) AS v)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""w{t} AS MATERIALIZED (
        SELECT g.i,
               CAST(sum(floor(g.val * v{t - 1}.v * 1e12 + 0.5)::BIGINT) AS BIGINT) AS s
        FROM g JOIN v{t - 1} ON g.j = v{t - 1}.i GROUP BY g.i
    )"""
        )
        ctes.append(
            f"""n{t} AS MATERIALIZED (
        SELECT sqrt(CAST(sum(floor((s::DOUBLE / 1e12) * (s::DOUBLE / 1e12)
                                   * 1e12 + 0.5)::BIGINT) AS BIGINT)::DOUBLE
                    / 1e12) AS nrm
        FROM w{t}
    )"""
        )
        ctes.append(
            f"""v{t} AS MATERIALIZED (
        SELECT i, (s::DOUBLE / 1e12) / (SELECT nrm FROM n{t}) AS v FROM w{t}
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT v{iters}.i AS dim_idx,
           floor(v{iters}.v * 1e6 + 0.5) / 1e6 AS loading,
           (SELECT floor(nrm * 1e6 + 0.5) / 1e6 FROM n{iters}) AS eigval
    FROM v{iters}
    """
    )


def embedding_anisotropy_sql(dim: int = 64, iters: int = 8) -> str:
    """Mirror of features.embedding_anisotropy: the pca CTE chain plus a
    quantized per-vector dot/norm pass against the 6dp-rounded v."""
    pca = pca_top_component_sql(dim, iters)
    head = pca[: pca.index(f"SELECT v{iters}.i AS dim_idx")]
    return (
        head
        + f""", vr AS MATERIALIZED (
        SELECT v{iters}.i AS i, floor(v{iters}.v * 1e6 + 0.5) / 1e6 AS loading
        FROM v{iters}
    ),
    parts AS (
        SELECT vec_id, ii.i AS i, embedding[ii.i + 1]::DOUBLE AS xi
        FROM embeddings
        CROSS JOIN (SELECT unnest(range(0, {dim})) AS i) ii
    ),
    sums AS (
        SELECT p.vec_id,
               CAST(sum(floor(p.xi * vr.loading * 1e9 + 0.5)::BIGINT) AS BIGINT) AS dq,
               CAST(sum(floor(p.xi * p.xi * 1e9 + 0.5)::BIGINT) AS BIGINT) AS nq
        FROM parts p JOIN vr ON p.i = vr.i
        GROUP BY p.vec_id
    )
    SELECT vec_id,
           floor((dq / 1e9) * (dq / 1e9) / (nq / 1e9) * 1e6 + 0.5) / 1e6
               AS top_energy_frac
    FROM sums
    """
    )


def boilerplate_chunks_sql(chunk_tokens: int = 4, min_docs: int = 2) -> str:
    """Mirror of dedup.remove_boilerplate_chunks: token chunks of c words,
    56-bit md5 chunk fingerprints, document-frequency >= min_docs marks
    boilerplate, kept tokens reassembled in order."""
    c = chunk_tokens
    fold = (
        "list_reduce(list_prepend(0::BIGINT, "
        "list_transform(range(1, 15), j -> "
        "(strpos('0123456789abcdef', substr(md5(ctext), j, 1)) - 1)::BIGINT)), "
        "(a, b) -> a * 16 + b)"
    )
    return f"""
    {WORDS_CTE},
    ch AS (
        SELECT doc_id, ci,
               array_to_string(ws[ci * {c} + 1 : ci * {c} + {c}], ' ') AS ctext
        FROM w, unnest(range(0, cast(ceil(len(ws) / {c}.0) AS int))) AS t(ci)
    ),
    hh AS (SELECT doc_id, ci, {fold} AS h FROM ch),
    b AS (
        SELECT h FROM (
            SELECT h, count(DISTINCT doc_id) AS d FROM hh GROUP BY h
        ) WHERE d >= {min_docs}
    ),
    bset AS (SELECT DISTINCT hh.doc_id, hh.ci FROM hh JOIN b USING (h)),
    tokidx AS (
        SELECT doc_id, i, ws[i] AS tok
        FROM w, unnest(range(1, len(ws) + 1)) AS t(i)
    ),
    kept AS (
        SELECT tk.doc_id, string_agg(tk.tok, ' ' ORDER BY tk.i) AS clean_text
        FROM tokidx tk
        LEFT JOIN bset
          ON bset.doc_id = tk.doc_id AND bset.ci = ((tk.i - 1) // {c})
        WHERE bset.ci IS NULL
        GROUP BY tk.doc_id
    ),
    nb AS (SELECT doc_id, count(*) AS nb FROM bset GROUP BY doc_id)
    SELECT w.doc_id,
           cast(ceil(len(ws) / {c}.0) AS int) AS n_chunks,
           coalesce(nb.nb, 0)::INT AS n_boiler_chunks,
           coalesce(kept.clean_text, '') AS clean_text
    FROM w
    LEFT JOIN nb USING (doc_id)
    LEFT JOIN kept USING (doc_id)
    """


def language_mixture_sql() -> str:
    """Mirror of text.language_mixture: stopword-argmax language per doc,
    then per-language doc counts, token totals, and corpus token share."""
    sw_cols = ",\n            ".join(
        f"{_sw_hits(lang)} AS s_{lang}" for lang in LANGS
    )
    return f"""
    {WORDS_CTE}
    , feat AS (
        SELECT doc_id, len(ws) AS n_tok, {sw_cols} FROM w
    ),
    l AS (SELECT doc_id, n_tok, {_lang_case()} AS lang FROM feat),
    tot AS (SELECT sum(n_tok)::BIGINT AS t FROM l)
    SELECT lang, count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
           round(sum(n_tok)::DOUBLE / (SELECT t FROM tot), 6) AS token_share
    FROM l GROUP BY lang
    """


def rrf_hybrid_sql(
    terms: list[str],
    query_id: int = 0,
    k_each: int = 20,
    k0: int = 60,
    n_out: int = 15,
) -> str:
    """Mirror of similarity.rrf_fuse over (bm25_topk, cosine_topk):
    reciprocal-rank fusion of the lexical and dense top-k lists, ranks
    assigned on (score desc, id asc), 1/(k0+rank) summed as exactly-
    rounded IEEE divisions (identical in both engines)."""
    lex = bm25_topk_sql(terms, k=k_each)
    den = cosine_topk_sql(query_id=query_id, k=k_each)
    return f"""
    WITH lex AS MATERIALIZED ({lex}),
    den AS MATERIALIZED ({den}),
    lr AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank_a
        FROM lex
    ),
    dr AS (
        SELECT vec_id AS doc_id,
               row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS rank_b
        FROM den
    )
    SELECT doc_id,
           round(coalesce(1.0 / ({k0} + rank_a), 0.0)
               + coalesce(1.0 / ({k0} + rank_b), 0.0), 9) AS rrf_score,
           rank_a, rank_b
    FROM lr FULL OUTER JOIN dr USING (doc_id)
    ORDER BY coalesce(1.0 / ({k0} + rank_a), 0.0)
           + coalesce(1.0 / ({k0} + rank_b), 0.0) DESC, doc_id ASC
    LIMIT {n_out}
    """


def quality_lr_sql(iters: int = 3, lr: float = 1.0) -> str:
    """Mirror of text.quality_lr_scores: batch-GD logistic regression
    unrolled as a CTE chain (the pca_top_component_sql recipe) — each
    iteration's gradient is a quantized-BIGINT sum, each weight update
    the identical half-up-9dp double arithmetic the Spark driver does."""
    punct = "[!-/:-@\\[-`{-~]"
    feats = f"""
    feats AS MATERIALIZED (
        SELECT doc_id,
               CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               1.0 AS x1,
               ln(1.0 + length(text)::DOUBLE) / 10.0 AS x2,
               (length(text) - length(regexp_replace(text, '{punct}', '', 'g')))::DOUBLE
                   / (length(text) + 1)::DOUBLE AS x3,
               (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                   / (length(text) + 1)::DOUBLE AS x4
        FROM documents WHERE text IS NOT NULL
    ),
    nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM feats)"""
    ctes = [feats]
    w_cols = "w1, w2, w3, w4"
    prev = "w0"
    ctes.append("w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4)")
    for t in range(1, iters + 1):
        z = " + ".join(f"{prev}.w{i} * x{i}" for i in range(1, 5))
        gsel = ", ".join(
            f"CAST(sum(floor((y - 1.0 / (1.0 + exp(-({z})))) * x{i} "
            f"* 1e9 + 0.5)::BIGINT) AS BIGINT) AS g{i}"
            for i in range(1, 5)
        )
        ctes.append(
            f"g{t} AS MATERIALIZED (SELECT {gsel} FROM feats, {prev})"
        )
        wsel = ", ".join(
            f"floor(({prev}.w{i} + {lr} * (g{t}.g{i}::DOUBLE / 1e9) / nn.n)"
            f" * 1e9 + 0.5) / 1e9 AS w{i}"
            for i in range(1, 5)
        )
        ctes.append(
            f"w{t} AS MATERIALIZED (SELECT {wsel} FROM {prev}, g{t}, nn)"
        )
        prev = f"w{t}"
    z = " + ".join(f"{prev}.w{i} * x{i}" for i in range(1, 5))
    return f"""
    WITH {','.join(ctes)}
    SELECT doc_id, y::BIGINT AS y,
           floor(1.0 / (1.0 + exp(-({z}))) * 1e6 + 0.5) / 1e6 AS p_quality,
           CASE WHEN 1.0 / (1.0 + exp(-({z}))) >= 0.5 THEN 1 ELSE 0 END AS pred
    FROM feats, {prev}
    """


def containment_sql(
    threshold: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
) -> str:
    """Mirror of dedup.containment_pairs: directed shingle containment
    over the shared minhash LSH candidate set — kept when EITHER
    direction clears the threshold."""
    return f"""
    {_minhash_buckets_sql(num_hashes, bands, k)}
    , cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    v AS (
        SELECT id_a, id_b,
               len(list_filter(sa.shs, x -> list_contains(sb.shs, x)))::BIGINT
                   AS n_common,
               len(sa.shs)::BIGINT AS n_a, len(sb.shs)::BIGINT AS n_b
        FROM cand JOIN sh sa ON cand.id_a = sa.doc_id
        JOIN sh sb ON cand.id_b = sb.doc_id
    )
    SELECT id_a, id_b, n_common, n_a, n_b,
           round(n_common::DOUBLE / n_a::DOUBLE, 6) AS c_ab,
           round(n_common::DOUBLE / n_b::DOUBLE, 6) AS c_ba
    FROM v
    WHERE n_common >= ceil({threshold} * n_a)
       OR n_common >= ceil({threshold} * n_b)
    """


def edit_distance_pairs_sql(
    max_distance: int = 25,
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
) -> str:
    """Mirror of dedup.edit_distance_pairs: Levenshtein over the
    normalized text of the shared minhash LSH candidate set, with the
    lossless length filter."""
    norm = NORM.format(col="text")
    return f"""
    {_minhash_buckets_sql(num_hashes, bands, k)}
    , cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    txt AS (SELECT doc_id, {norm} AS nt FROM documents)
    SELECT id_a, id_b,
           levenshtein(ta.nt, tb.nt)::BIGINT AS edit_distance,
           length(ta.nt)::BIGINT AS len_a, length(tb.nt)::BIGINT AS len_b
    FROM cand JOIN txt ta ON cand.id_a = ta.doc_id
    JOIN txt tb ON cand.id_b = tb.doc_id
    WHERE abs(length(ta.nt) - length(tb.nt)) <= {max_distance}
      AND levenshtein(ta.nt, tb.nt) <= {max_distance}
    """


def qld_topk_sql(terms: list[str], k: int = 15, mu: int = 2000) -> str:
    """Mirror of text.qld_topk: Dirichlet-smoothed query likelihood over
    the whitespace-normalized token stream; each term's ln argument is
    the exact rational (tf·N + μ·cf)/((dl+μ)·N) in HUGEINT, quantized to
    micro-nats before the per-doc integer sum."""
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
    {WORDS_CTE}
    , base AS (SELECT doc_id, len(ws)::BIGINT AS dl, ws FROM w)
    , ntot AS (SELECT sum(dl)::BIGINT AS n_tokens FROM base)
    , tf AS (
        SELECT doc_id, dl, term, count(*)::BIGINT AS tf FROM (
            SELECT doc_id, dl, unnest(ws) AS term FROM base
        ) WHERE term IN ({tl}) GROUP BY 1, 2, 3
    )
    , cf AS (SELECT term, sum(tf)::BIGINT AS cf FROM tf GROUP BY 1)
    , cand AS (SELECT DISTINCT doc_id, dl FROM tf)
    , g AS (
        SELECT c.doc_id,
               CASE WHEN t.tf IS NOT NULL THEN 1 ELSE 0 END AS m,
               (coalesce(t.tf, 0)::HUGEINT * n.n_tokens::HUGEINT
                + {int(mu)}::HUGEINT * f.cf::HUGEINT) AS num,
               ((c.dl + {int(mu)})::HUGEINT * n.n_tokens::HUGEINT) AS den
        FROM cand c
        CROSS JOIN ntot n
        CROSS JOIN (SELECT * FROM cf WHERE cf > 0) f
        LEFT JOIN tf t ON t.doc_id = c.doc_id AND t.term = f.term
    )
    , pd AS (
        SELECT doc_id,
               sum(CAST(round((ln(num::DOUBLE) - ln(den::DOUBLE)) * 1000000)
                        AS BIGINT))::BIGINT AS sm,
               sum(m)::BIGINT AS n_matched
        FROM g GROUP BY 1
    )
    SELECT doc_id, sm::DOUBLE / 1000000.0 AS qld, n_matched
    FROM pd ORDER BY qld DESC, doc_id LIMIT {k}
    """


def containment_prefix_sql(threshold: float = 0.5, k: int = 3) -> str:
    """Oracle for dedup.containment_pairs_prefix: EXHAUSTIVE directed
    containment (shingle equi-join — every pair with ≥1 shared shingle),
    kept when either direction clears the threshold.  The operator's
    prefix filter has recall 1 by construction, so a value match here
    PROVES the filter lost nothing.  Keep predicate is the same
    exact-integer bound as the operator's candidate generation
    (n_common ≥ ⌈t·n⌉) — NOT the rounded display columns, which on
    adversarial sizes can round up past t (r11 ADVICE #1)."""
    return f"""
    {_shingles_cte(k)}
    , e AS (SELECT doc_id, unnest(shs) AS s FROM sh),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               count(*)::BIGINT AS n_common
        FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_common,
           sa.n::BIGINT AS n_a, sb.n::BIGINT AS n_b,
           round(n_common::DOUBLE / sa.n::DOUBLE, 6) AS c_ab,
           round(n_common::DOUBLE / sb.n::DOUBLE, 6) AS c_ba
    FROM inter
    JOIN (SELECT doc_id, len(shs) AS n FROM sh) sa ON id_a = sa.doc_id
    JOIN (SELECT doc_id, len(shs) AS n FROM sh) sb ON id_b = sb.doc_id
    WHERE n_common >= ceil({threshold} * sa.n)
       OR n_common >= ceil({threshold} * sb.n)
    """


def mmr_rerank_sql(
    query_id: int = 0,
    k: int = 5,
    pool: int = 15,
    lam_num: int = 7,
    lam_den: int = 10,
) -> str:
    """Mirror of similarity.mmr_rerank: greedy MMR over the cosine
    top-``pool`` pool, each pick an exact integer argmax
    lam_num·rel_m − (lam_den−lam_num)·max_sim_m, ties by id, unrolled
    one CTE pair per selection step."""
    cos = _cosine_sql("b.embedding", "q.embedding")
    pcos = _cosine_sql("x.embedding", "y.embedding")
    mu = lam_den - lam_num
    steps = """
    sel1 AS MATERIALIZED (
        SELECT 1 AS rank, vec_id, cos_sim, NULL::DOUBLE AS max_sim,
               ({ln} * rel_m)::BIGINT AS mmr_m
        FROM pool ORDER BY rel_m DESC, vec_id LIMIT 1
    )""".format(ln=lam_num)
    prev = "sel1"
    union = ["SELECT * FROM sel1"]
    for r in range(2, k + 1):
        steps += f"""
    , picked{r} AS (SELECT vec_id FROM ({' UNION ALL '.join(union)})),
    cand{r} AS (
        SELECT p.vec_id, p.cos_sim, p.rel_m, max(s.sim_m)::BIGINT AS ms
        FROM pool p JOIN sims s ON s.ida = p.vec_id
        WHERE p.vec_id NOT IN (SELECT vec_id FROM picked{r})
          AND s.idb IN (SELECT vec_id FROM picked{r})
        GROUP BY 1, 2, 3
    ),
    sel{r} AS MATERIALIZED (
        SELECT {r} AS rank, vec_id, cos_sim,
               round(ms / 1000000.0, 6) AS max_sim,
               ({lam_num} * rel_m - {mu} * ms)::BIGINT AS mmr_m
        FROM cand{r}
        ORDER BY ({lam_num} * rel_m - {mu} * ms) DESC, vec_id LIMIT 1
    )"""
        union.append(f"SELECT * FROM sel{r}")
        prev = f"sel{r}"
    return f"""
    WITH pool AS MATERIALIZED (
        SELECT b.vec_id, round({cos}, 6) AS cos_sim,
               CAST(round(round({cos}, 6) * 1000000.0, 0) AS BIGINT) AS rel_m
        FROM embeddings b,
             (SELECT embedding FROM embeddings WHERE vec_id = {query_id}) q
        WHERE b.vec_id != {query_id}
        ORDER BY {cos} DESC, b.vec_id ASC
        LIMIT {pool}
    ),
    ids AS (SELECT vec_id FROM pool),
    sims AS MATERIALIZED (
        SELECT x.vec_id AS ida, y.vec_id AS idb,
               CAST(round(round({pcos}, 6) * 1000000.0, 0) AS BIGINT) AS sim_m
        FROM embeddings x, embeddings y
        WHERE x.vec_id IN (SELECT vec_id FROM ids)
          AND y.vec_id IN (SELECT vec_id FROM ids)
          AND x.vec_id != y.vec_id
    ),
    {steps}
    SELECT rank, vec_id, cos_sim, max_sim, mmr_m
    FROM ({' UNION ALL '.join(union)})
    ORDER BY rank
    """
