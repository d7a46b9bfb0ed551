"""DuckDB-SQL generators that replicate the vectorized dedup hash pipeline
bit-for-bit, giving the LSH operators EXACT oracles.

``ops/hashing.py`` hashes tokens with a polynomial byte fold
(``h = h*B + byte+1`` mod 2**64, ``B = 0x100000001B3``) finished by
splitmix64, and the MinHash / SimHash signatures are deterministic uint64
arithmetic on top.  All of that is expressible in DuckDB with HUGEINT
modular arithmetic:

- ``a * c  (mod 2**64)`` for small ``c`` (< 2**63): direct HUGEINT multiply
  + modulo (the product fits in INT128).
- for 64-bit ``c``: split ``c = hi*2**32 + lo``; then
  ``a*c = a*lo + ((a*hi mod 2**32) << 32)  (mod 2**64)`` with every term
  inside INT128.
- xor / shifts / bit_count run natively on UBIGINT.

The generated SQL therefore reproduces ``minhash_lsh_pairs`` and
``simhash_pairs`` EXACTLY (not statistically): same token hashes, same
signatures, same band keys / quarter buckets, same pairs.  The only
divergence is the degenerate-bucket star-pair peeling for buckets larger
than ``ops.dedup._MAX_BUCKET`` (2000 members) — a corpus-boilerplate
escape hatch the oracle fixtures never trigger (asserted in
tests/test_oracle_sqlgen.py).
"""

from __future__ import annotations

_M64 = 1 << 64
_SM_A = 0x9E3779B97F4A7C15
_SM_C1 = 0xBF58476D1CE4E5B9
_SM_C2 = 0x94D049BB133111EB
_B = 0x100000001B3          # ops.hashing._B (small: fits direct HUGEINT mul)
_GOLD = 0x9E3779B97F4A7C15  # minhash xor-multiply mixer


def _mm_small(a: str, c: int) -> str:
    """``a * c mod 2**64`` for c < 2**63 (product fits HUGEINT)."""
    return (f"CAST(((CAST({a} AS HUGEINT) * {c}) % {_M64}) AS UBIGINT)")


def _mm(a: str, c: int) -> str:
    """``a * c mod 2**64`` for arbitrary 64-bit c (split multiply)."""
    hi, lo = c >> 32, c & 0xFFFFFFFF
    A = f"CAST({a} AS HUGEINT)"
    return (f"CAST((({A} * {lo} + (({A} * {hi}) % 4294967296) * 4294967296)"
            f" % {_M64}) AS UBIGINT)")


def _sm(x: str) -> str:
    """Inline splitmix64 finalizer over expression ``x`` (UBIGINT)."""
    z1 = f"CAST(((CAST({x} AS HUGEINT) + {_SM_A}) % {_M64}) AS UBIGINT)"
    z2 = f"xor({z1}, ({z1}) >> 30)"
    z3 = _mm(z2, _SM_C1)
    z4 = f"xor({z3}, ({z3}) >> 27)"
    z5 = _mm(z4, _SM_C2)
    return f"xor({z5}, ({z5}) >> 31)"


# Token-hash CTE chain shared by the minhash and simhash oracles.  Produces
# ``th(doc_id, ti, h)``: 1-based token index and the splitmix64-finished
# polynomial hash of each [a-z0-9]+ token — identical to
# ops.hashing.tokenize_hashes.
_TOKEN_HASH_CTES = f"""
    tokd AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
        FROM documents
    ),
    tok AS (
        SELECT doc_id, i AS ti, ts[i] AS tok, length(ts[i]) AS tlen
        FROM tokd, UNNEST(range(1, array_length(ts) + 1)) AS u(i)
    ),
    maxlen AS (SELECT coalesce(max(tlen), 1) AS ml FROM tok),
    pow(e, p) AS (
        SELECT 0, CAST(1 AS UBIGINT)
        UNION ALL
        SELECT e + 1, {_mm_small('p', _B)} FROM pow
        WHERE e < (SELECT ml FROM maxlen)
    ),
    chars AS (
        SELECT doc_id, ti, j, ord(substr(tok, CAST(j AS INT), 1)) + 1 AS d1,
               tlen
        FROM tok, UNNEST(range(1, tlen + 1)) AS v(j)
    ),
    traw AS (
        SELECT doc_id, ti,
               CAST(SUM(CAST(d1 AS HUGEINT) * CAST(p AS HUGEINT))
                    % {_M64} AS UBIGINT) AS h0
        FROM chars JOIN pow ON pow.e = chars.tlen - chars.j
        GROUP BY doc_id, ti
    ),
    th AS (SELECT doc_id, ti, {_sm('h0')} AS h FROM traw)
"""


def simhash_pairs_sql(hamming: int = 3) -> str:
    """Exact oracle for ``ops.dedup.simhash_pairs``: 64-bit majority-vote
    SimHash from the token hashes, then all (a < b) doc pairs with Hamming
    distance <= ``hamming`` among docs with >= 1 token.  The Python path's
    quarter-band candidate generation is COMPLETE for hamming<=3 by
    pigeonhole (4 disjoint 16-bit quarters, <=3 differing bits leave one
    quarter identical), so the verified pair set IS the plain threshold
    join computed here."""
    return f"""
    WITH RECURSIVE
    {_TOKEN_HASH_CTES},
    ndoc AS (SELECT doc_id, count(*) AS n FROM th GROUP BY doc_id),
    bitsum AS (
        SELECT th.doc_id, b,
               SUM(CAST((h >> CAST(b AS INT)) & CAST(1 AS UBIGINT)
                        AS BIGINT)) AS ones
        FROM th, UNNEST(range(0, 64)) AS w(b)
        GROUP BY th.doc_id, b
    ),
    sig AS (
        SELECT bitsum.doc_id,
               CAST(SUM(CASE WHEN 2 * ones > n
                             THEN CAST(CAST(1 AS UBIGINT)
                                       << CAST(b AS INT) AS HUGEINT)
                             ELSE 0 END) AS UBIGINT) AS s
        FROM bitsum JOIN ndoc ON ndoc.doc_id = bitsum.doc_id
        GROUP BY bitsum.doc_id
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= {hamming}
    ORDER BY a_id, b_id
    """


def _minhash_seeds(num_hashes: int) -> list[int]:
    """The exact seeds ops.dedup._MinHashBatch uses (fixed rng stream)."""
    import numpy as np

    rng = np.random.default_rng(12345)
    return rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64).tolist()


def minhash_lsh_pairs_sql(num_hashes: int = 64, bands: int = 16) -> str:
    """Exact oracle for ``ops.dedup.minhash_lsh_pairs``: 3-gram shingle
    hashes (position-weighted 3/5/7 combine + splitmix64; short docs get
    one whole-doc shingle), per-seed xor-multiply min signatures, band
    keys via the splitmix64 fold, then distinct pairs per (band, key)
    bucket."""
    rows = num_hashes // bands
    seeds = _minhash_seeds(num_hashes)
    seed_values = ", ".join(
        f"({j}, CAST({s} AS UBIGINT))" for j, s in enumerate(seeds))
    # band-key fold: acc = band+1; for each of the band's rows in order:
    # acc = splitmix64(acc ^ sig)   (list_reduce over the ordered sig list)
    fold = f"list_reduce(list_prepend(CAST(band + 1 AS UBIGINT), sigs), " \
           f"(acc, s) -> {_sm('xor(acc, s)')})"
    return f"""
    WITH RECURSIVE
    {_TOKEN_HASH_CTES},
    ndoc AS (SELECT doc_id, count(*) AS n FROM th GROUP BY doc_id),
    shw AS (  -- 3-gram windows (docs with >= 3 tokens)
        SELECT doc_id, ti,
               CAST((3 * CAST(h AS HUGEINT)
                     + 5 * CAST(lead(h, 1) OVER w AS HUGEINT)
                     + 7 * CAST(lead(h, 2) OVER w AS HUGEINT))
                    % {_M64} AS UBIGINT) AS c0,
               lead(h, 2) OVER w IS NOT NULL AS full3
        FROM th WINDOW w AS (PARTITION BY doc_id ORDER BY ti)
    ),
    shshort AS (  -- docs with 1..2 tokens: one whole-doc shingle
        SELECT th.doc_id,
               CAST(SUM(CAST(h AS HUGEINT) * (2 * (ti - 1) + 3))
                    % {_M64} AS UBIGINT) AS c0
        FROM th JOIN ndoc ON ndoc.doc_id = th.doc_id AND ndoc.n < 3
        GROUP BY th.doc_id
    ),
    shraw AS (
        SELECT doc_id, c0 FROM shw WHERE full3
        UNION ALL
        SELECT doc_id, c0 FROM shshort
    ),
    sh AS (SELECT doc_id, {_sm('c0')} AS s FROM shraw),
    seeds(j, seed) AS (VALUES {seed_values}),
    sigm AS (
        SELECT doc_id, j, min({_mm('xor(s, seed)', _GOLD)}) AS sig
        FROM sh CROSS JOIN seeds
        GROUP BY doc_id, j
    ),
    bandkeys AS (
        SELECT doc_id, CAST(j // {rows} AS INT) AS band,
               list(sig ORDER BY j) AS sigs
        FROM sigm GROUP BY doc_id, 2
    ),
    keys AS (SELECT doc_id, band, {fold} AS key FROM bandkeys)
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM keys a JOIN keys b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ORDER BY a_id, b_id
    """


def langid_sql() -> str:
    """Exact oracle for ``ops.text.langid``: CJK codepoint check on the
    first 400 chars, else argmax of profile-gram containment scores over
    the first 2000 lowercased chars, ties broken in profile order
    (en, de, fr, es)."""
    from .text import _LANG_PROFILES

    def score(lang: str) -> str:
        grams = _LANG_PROFILES[lang]
        terms = " + ".join(
            f"CAST(contains(sub, '{g}') AS INT)" for g in grams)
        return f"({terms})"

    return f"""
    WITH s AS (
        SELECT doc_id, substr(text, 1, 400) AS head,
               substr(lower(text), 1, 2000) AS sub
        FROM documents
    ),
    sc AS (
        SELECT doc_id, regexp_matches(head, '[一-鿿]') AS is_zh,
               {score('en')} AS s_en, {score('de')} AS s_de,
               {score('fr')} AS s_fr, {score('es')} AS s_es
        FROM s
    )
    SELECT doc_id,
           CASE WHEN is_zh THEN 'zh'
                WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS pred_lang
    FROM sc
    """


def ann_bucketed_sql(n_queries: int = 5, k: int = 10, n_planes: int = 6,
                     n_tables: int = 4, seed: int = 777,
                     dim: int = 64) -> str:
    """Exact oracle for ``ops.similarity.ann_bucketed``: the ±1 Rademacher
    planes (similarity.rademacher_tables — splitmix64-derived, so the SAME
    numbers are regenerated here and inlined as literals) bucket every
    vector per table; a vector is a candidate for a query iff some table
    puts them within hamming distance 1 (the engine's own-bucket +
    1-bit-neighbor multiprobe); candidates are ranked by exact cosine.
    Sign bits come from strict ``dot > 0`` on float64 math on both sides."""
    from .similarity import rademacher_tables

    tables = rademacher_tables(n_tables, n_planes, dim, seed)
    key_cols = []
    for ti, planes in enumerate(tables):
        bits = []
        for p in range(n_planes):
            lit = "[" + ", ".join(
                "%.1f" % v for v in planes[p].tolist()) + "]"
            bits.append("CAST(list_dot_product(emb, %s) > 0 AS INT) * %d"
                        % (lit, 1 << p))
        key_cols.append("(" + " + ".join(bits) + ") AS k%d" % ti)
    near = " OR ".join(
        f"bit_count(xor(q.k{t}, c.k{t})) <= 1" for t in range(n_tables))
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    keys AS (SELECT vec_id, emb, {", ".join(key_cols)} FROM e),
    cand AS (SELECT q.vec_id AS qid, c.vec_id AS vid,
                    list_cosine_similarity(q.emb, c.emb) AS sim
             FROM keys q JOIN keys c
               ON q.vec_id < {n_queries} AND c.vec_id >= {n_queries}
              AND ({near})),
    r AS (SELECT qid AS query_id, vid AS vec_id,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY sim DESC, vid) AS rank
          FROM cand)
    SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id
    FROM r WHERE rank <= {k}
    """


def ann_ivf_sql(n_queries: int = 5, k: int = 10, n_centroids: int = 32,
                nprobe: int = 4, label: int | None = None) -> str:
    """Exact oracle for ``ops.similarity.ann_ivf``: centroids are the
    first ``n_centroids`` corpus vectors, assignment/probing rank by
    cosine with ties toward the smaller id, candidates are ranked by
    exact cosine — the whole IVF pipeline in SQL.  With ``label`` set it
    oracles ``ann_ivf_filtered``: only vectors carrying the label are
    assigned/ranked (the engine's pre-filtered read)."""
    nq, hi = n_queries, n_queries + n_centroids
    lbl = "" if label is None else f" AND label = {int(label)}"
    return f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    cent AS (SELECT vec_id AS cid, emb AS cemb FROM e
             WHERE vec_id >= {nq} AND vec_id < {hi}),
    assign AS (SELECT vec_id, cid FROM (
        SELECT c.vec_id, t.cid,
               row_number() OVER (
                   PARTITION BY c.vec_id
                   ORDER BY list_cosine_similarity(c.emb, t.cemb) DESC,
                            t.cid) AS rn
        FROM e c, cent t WHERE c.vec_id >= {nq}{lbl}) WHERE rn = 1),
    probe AS (SELECT qid, cid FROM (
        SELECT q.vec_id AS qid, t.cid,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.emb, t.cemb) DESC,
                            t.cid) AS rn
        FROM e q, cent t WHERE q.vec_id < {nq}) WHERE rn <= {nprobe}),
    s AS (SELECT p.qid, a.vec_id,
                 list_cosine_similarity(qe.emb, ce.emb) AS sim
          FROM probe p JOIN assign a USING (cid)
          JOIN e qe ON qe.vec_id = p.qid
          JOIN e ce ON ce.vec_id = a.vec_id),
    r AS (SELECT qid AS query_id, vec_id,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY sim DESC, vec_id) AS rank
          FROM s)
    SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id
    FROM r WHERE rank <= {k}
    """


def ann_filtered_sql(n_queries: int = 5, k: int = 10,
                     label: int = 3) -> str:
    """Exact oracle for ``ops.similarity.ann_filtered``: brute-force
    cosine top-k over corpus vectors with the metadata label."""
    return f"""
    WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < {n_queries}),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings
          WHERE vec_id >= {n_queries} AND label = {int(label)}),
    s AS (SELECT qid, vec_id,
                 list_cosine_similarity(qe, emb) AS sim FROM q, c),
    r AS (SELECT qid AS query_id, vec_id,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY sim DESC, vec_id) AS rank
          FROM s)
    SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id
    FROM r WHERE rank <= {k}
    """


def closure_sql(pairs_sql: str) -> str:
    """Wrap any (a_id, b_id) duplicate-pair query in a recursive-CTE
    transitive closure: (doc_id, cluster_id) with cluster_id = the
    component's minimum doc_id — the oracle for
    ops.cluster.connected_components over that pair generator."""
    return f"""
    WITH RECURSIVE
    edges AS (SELECT a_id, b_id FROM ({pairs_sql}) pairs_q),
    und AS (SELECT a_id AS u, b_id AS v FROM edges
            UNION SELECT b_id, a_id FROM edges),
    reach AS (
        SELECT u, v FROM und
        UNION
        SELECT r.u, d.v FROM reach r JOIN und d ON r.v = d.u
        WHERE d.v <> r.u
    )
    SELECT CAST(u AS BIGINT) AS doc_id,
           CAST(least(u, min(v)) AS BIGINT) AS cluster_id
    FROM reach GROUP BY u ORDER BY doc_id
    """


def keep_first_sql(pairs_sql: str) -> str:
    """Oracle for ops.cluster.dedup_keep_first: every doc_id except the
    non-minimum members of the pair set's connected components."""
    return f"""
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id
    FROM documents d
    WHERE d.doc_id NOT IN (
        SELECT doc_id FROM ({closure_sql(pairs_sql)}) c
        WHERE doc_id <> cluster_id)
    ORDER BY doc_id
    """


def kmeans_sql(n_clusters: int = 8, iters: int = 3) -> str:
    """Exact oracle for ops.similarity.kmeans_embeddings: the same Lloyd
    rounds as chained CTEs — deterministic first-k init, assignment by
    (L2 distance, cid) rank, per-dimension mean update, empty clusters
    keeping the previous centroid."""
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb "
        "FROM embeddings)",
        "dim AS (SELECT array_length(emb) AS d FROM e LIMIT 1)",
        f"c0 AS (SELECT vec_id AS cid, emb AS cen FROM e "
        f"WHERE vec_id < {n_clusters})",
    ]
    for t in range(1, iters + 1):
        p = t - 1
        ctes += [
            f"""a{t} AS (SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_distance(e.emb, c.cen), c.cid) AS rn
                FROM e, c{p} c) WHERE rn = 1)""",
            f"""m{t} AS (SELECT a{t}.cid, u.i, avg(e.emb[u.i]) AS x
                FROM a{t} JOIN e USING (vec_id),
                     UNNEST(range(1, (SELECT d FROM dim) + 1)) AS u(i)
                GROUP BY a{t}.cid, u.i)""",
            f"""n{t} AS (SELECT cid, list(x ORDER BY i) AS cen
                FROM m{t} GROUP BY cid)""",
            f"""c{t} AS (SELECT c{p}.cid, coalesce(n{t}.cen, c{p}.cen) AS cen
                FROM c{p} LEFT JOIN n{t} USING (cid))""",
        ]
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_distance(e.emb, c.cen), c.cid) AS rn
        FROM e, c{iters} c) WHERE rn = 1
    ORDER BY vec_id
    """


def semdedup_sql(n_clusters: int = 8, iters: int = 3,
                 threshold: float = 0.45) -> str:
    """Exact oracle for ops.similarity.semdedup: the kmeans_sql CTE chain
    for cluster assignment, then an anti-join dropping every vec that has
    a smaller-id same-cluster neighbor with cosine >= threshold."""
    return f"""
    WITH km AS (SELECT * FROM ({kmeans_sql(n_clusters, iters)}) kmq),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    dropped AS (
        SELECT DISTINCT b.vec_id
        FROM km a JOIN km b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id
        WHERE list_cosine_similarity(ea.emb, eb.emb) >= {threshold}
    )
    SELECT vec_id, cluster FROM km
    WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
    ORDER BY vec_id
    """


def bpe_train_sql(n_merges: int = 6) -> str:
    """Exact oracle for ops.bpe.bpe_train: the BPE trainer loop as
    chained CTEs.  r0 is the word-frequency table with each word spelled
    as a space-separated symbol string; round k counts weighted adjacent
    pairs from r{k-1}, picks the top pair (count desc, pair asc), and
    rewrites with a global re2 ``\\bx y\\b`` replace — the zero-width
    boundaries make the replacement leftmost-non-overlapping, identical
    to the trainer's run-parity merge."""
    ctes, selects = _bpe_chain(n_merges)
    return ("WITH " + ",\n    ".join(ctes) + "\n    "
            + "\n    UNION ALL ".join(selects) + "\n    ORDER BY step")


def _bpe_chain(n_merges: int) -> tuple[list[str], list[str]]:
    """The shared trainer CTE chain (word column carried through so the
    final segmentation can be joined back by word)."""
    ctes = ["""w0 AS (
        SELECT word, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                  AS word FROM documents)
        GROUP BY word),
    r0 AS (SELECT word,
                  array_to_string(regexp_extract_all(word, '.'), ' ') AS s,
                  n FROM w0)"""]
    selects = []
    for k in range(1, n_merges + 1):
        ctes.append(f"""p{k} AS (
        SELECT ss[CAST(i AS INT)] || ' ' || ss[CAST(i AS INT) + 1] AS pair,
               sum(n) AS cnt
        FROM (SELECT string_split(s, ' ') AS ss, n FROM r{k - 1}),
             UNNEST(generate_series(1, len(ss) - 1)) AS u(i)
        GROUP BY 1),
    t{k} AS (SELECT pair, cnt FROM p{k} ORDER BY cnt DESC, pair LIMIT 1),
    r{k} AS (
        SELECT word, regexp_replace(s,
                   '\\b' || (SELECT pair FROM t{k}) || '\\b',
                   replace((SELECT pair FROM t{k}), ' ', ''), 'g') AS s,
               n FROM r{k - 1})""")
        selects.append(
            f"SELECT CAST({k} AS BIGINT) AS step, pair,"
            f" CAST(cnt AS BIGINT) AS n FROM t{k}")
    return ctes, selects


def bpe_encode_counts_sql(n_merges: int = 6) -> str:
    """Exact oracle for ops.bpe.bpe_encode_counts: the trainer chain's
    final segmentation r{n}, joined back to the corpus token stream by
    word; per-doc word and BPE-token counts (docs with no tokens keep
    zero counts via the left join)."""
    ctes, _ = _bpe_chain(n_merges)
    return ("WITH " + ",\n    ".join(ctes) + f""",
    tok AS (SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                       AS word FROM documents),
    seg AS (SELECT word, CAST(len(string_split(s, ' ')) AS BIGINT) AS k
            FROM r{n_merges}),
    agg AS (SELECT doc_id, count(*) AS nw, sum(k) AS nt
            FROM tok JOIN seg USING (word) GROUP BY doc_id)
    SELECT d.doc_id, CAST(coalesce(nw, 0) AS BIGINT) AS n_words,
           CAST(coalesce(nt, 0) AS BIGINT) AS n_bpe_tokens
    FROM (SELECT doc_id FROM documents) d LEFT JOIN agg USING (doc_id)
    """)


def kmv_distinct_sql(k: int = 16) -> str:
    """Exact oracle for ops.text.kmv_distinct: the same splitmix64 token
    hashes (shared _TOKEN_HASH_CTES), per-source k smallest DISTINCT
    values, int64 bit view for the sketch rows, and the (k-1)/max_kmv
    estimate as one double division of those integers."""
    half = 1 << 63
    return f"""
    WITH RECURSIVE
    {_TOKEN_HASH_CTES},
    sh AS (SELECT DISTINCT d.source, th.h
           FROM th JOIN documents d USING (doc_id)),
    r AS (SELECT source, h,
                 row_number() OVER (PARTITION BY source ORDER BY h) AS rank
          FROM sh),
    kept AS (SELECT source, h, rank FROM r WHERE rank <= {k}),
    st AS (SELECT source, max(h) AS hk, count(*) AS cnt
           FROM kept GROUP BY source)
    SELECT kept.source, CAST(rank AS BIGINT) AS rank,
           CAST(CASE WHEN kept.h >= {half}
                     THEN CAST(kept.h AS HUGEINT) - {_M64}
                     ELSE CAST(kept.h AS HUGEINT) END AS BIGINT) AS h,
           CASE WHEN st.cnt = {k}
                THEN CAST({k - 1} AS DOUBLE)
                     / (CAST(st.hk AS DOUBLE) / 18446744073709551616.0)
                ELSE CAST(st.cnt AS DOUBLE) END AS est_distinct
    FROM kept JOIN st USING (source)
    ORDER BY source, rank
    """


def pca_project_sql(n_components: int = 2, iters: int = 6) -> str:
    """Exact oracle for ops.pca.pca_project: the (dim x dim) Gram matrix
    as a parallel-unnest self-join, then each fixed power-iteration
    round and the rank-1 deflation between components as chained CTEs,
    finishing with the per-vector projections.  Deterministic because
    both sides run the SAME fixed round count from the same
    all-ones/sqrt(dim) start — convergence is irrelevant to equality.

    Every CTE is MATERIALIZED: the chain references each g/v repeatedly
    and plain-CTE inlining expands the plan (and its parquet scans)
    exponentially in the iteration count — the materialized results are
    at most dim**2 rows each."""
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb "
        "FROM embeddings)",
        "dim AS (SELECT array_length(emb) AS d FROM e LIMIT 1)",
        "flat AS (SELECT vec_id, unnest(emb) AS x, "
        "unnest(range(1, array_length(emb) + 1)) AS i FROM e)",
        "g0 AS (SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS g "
        "FROM flat a JOIN flat b USING (vec_id) GROUP BY a.i, b.i)",
    ]
    for c in range(1, n_components + 1):
        gp = f"g{c - 1}"
        # fixed start vector 1/sqrt(dim) in every coordinate
        ctes.append(
            f"v{c}_0 AS (SELECT u.i AS i, "
            f"1.0 / sqrt((SELECT d FROM dim)) AS val "
            f"FROM (SELECT unnest(range(1, (SELECT d FROM dim) + 1)) "
            f"AS i) u)")
        for t in range(1, iters + 1):
            ctes += [
                f"w{c}_{t} AS (SELECT g.i AS i, SUM(g.g * v.val) AS s "
                f"FROM {gp} g JOIN v{c}_{t - 1} v ON g.j = v.i "
                f"GROUP BY g.i)",
                f"v{c}_{t} AS (SELECT i, s / (SELECT sqrt(SUM(s * s)) "
                f"FROM w{c}_{t}) AS val FROM w{c}_{t})",
            ]
        if c < n_components:
            # deflate: g_c = g_{c-1} - lam * v v^T
            ctes += [
                f"lam{c} AS (SELECT SUM(g.g * va.val * vb.val) AS l "
                f"FROM {gp} g JOIN v{c}_{iters} va ON g.i = va.i "
                f"JOIN v{c}_{iters} vb ON g.j = vb.i)",
                f"g{c} AS (SELECT g.i, g.j, "
                f"g.g - (SELECT l FROM lam{c}) * va.val * vb.val AS g "
                f"FROM {gp} g JOIN v{c}_{iters} va ON g.i = va.i "
                f"JOIN v{c}_{iters} vb ON g.j = vb.i)",
            ]
    projs = ", ".join(
        f"p{c}.proj AS proj{c}" for c in range(1, n_components + 1))
    joins = "\n    ".join(
        f"JOIN (SELECT f.vec_id, SUM(f.x * v.val) AS proj "
        f"FROM flat f JOIN v{c}_{iters} v USING (i) GROUP BY f.vec_id) "
        f"p{c} USING (vec_id)"
        for c in range(1, n_components + 1))
    body = ",\n    ".join(
        c.replace(" AS (", " AS MATERIALIZED (", 1) for c in ctes)
    return f"""
    WITH {body}
    SELECT e.vec_id, {projs}
    FROM e
    {joins}
    ORDER BY e.vec_id
    """


def countmin_heavy_sql(k: int = 20, w: int = 1024, d: int = 4) -> str:
    """Exact oracle for ops.sketch.countmin_heavy: the shared token-hash
    CTEs, per-term counts, every (row, cell) counter as a GROUP BY over
    term x seed, and the min-over-rows point estimate for the exact
    top-k terms.  Pure integer arithmetic end to end."""
    import numpy as np

    from .hashing import splitmix64

    seeds = splitmix64(np.arange(1, d + 1, dtype=np.uint64))
    seed_rows = ", ".join(
        f"({r}, CAST(CAST('{int(s)}' AS HUGEINT) AS UBIGINT))"
        for r, s in enumerate(seeds))
    cell = _sm("xor(tc.h, s.seed)")
    return f"""
    WITH RECURSIVE
    {_TOKEN_HASH_CTES},
    tc AS MATERIALIZED (
        SELECT t.tok AS term, th.h, count(*) AS n
        FROM th JOIN tok t USING (doc_id, ti)
        GROUP BY t.tok, th.h),
    cells AS MATERIALIZED (
        SELECT tc.term, tc.n, s.r,
               CAST(({cell}) % {w} AS BIGINT) AS c
        FROM tc, (VALUES {seed_rows}) s(r, seed)),
    sketch AS MATERIALIZED (
        SELECT r, c, SUM(n) AS v FROM cells GROUP BY r, c),
    est AS (
        SELECT cells.term, CAST(MIN(sk.v) AS BIGINT) AS est_n
        FROM cells JOIN sketch sk USING (r, c)
        GROUP BY cells.term),
    top AS (
        SELECT term, CAST(n AS BIGINT) AS n FROM tc
        ORDER BY n DESC, term LIMIT {k})
    SELECT top.term, top.n, est.est_n
    FROM top JOIN est USING (term)
    ORDER BY top.n DESC, top.term
    """


def hll_distinct_sql(p: int = 9) -> str:
    """Exact oracle for ops.sketch.hll_distinct: the shared token-hash
    CTEs, register = top p bits, rho from length(bin(low bits)) — an
    integer-exact bit_length, mirroring the numpy frexp-halves trick —
    per-(source, register) MAX, and the same alpha/linear-counting
    estimate formula."""
    m = 1 << p
    low = 64 - p
    mask = (1 << low) - 1
    return f"""
    WITH RECURSIVE
    {_TOKEN_HASH_CTES},
    sh AS (
        SELECT d.source, th.h
        FROM th JOIN documents d USING (doc_id)),
    reg AS (
        SELECT source,
               CAST(h >> {low} AS BIGINT) AS register,
               CASE WHEN (h & CAST(CAST('{mask}' AS HUGEINT) AS UBIGINT))
                         = CAST(0 AS UBIGINT)
                    THEN {low + 1}
                    ELSE {low} + 1
                         - length(bin(h & CAST(CAST('{mask}' AS HUGEINT)
                                               AS UBIGINT)))
               END AS rho
        FROM sh),
    mx AS (
        SELECT source, register, CAST(MAX(rho) AS BIGINT) AS rho
        FROM reg GROUP BY source, register),
    st AS (
        SELECT source,
               SUM(power(2.0, -rho)) AS s,
               COUNT(*) AS nz
        FROM mx GROUP BY source),
    est AS (
        SELECT source,
               CASE WHEN raw <= 2.5 * {m} AND v > 0
                    THEN {m} * ln({m} / v)
                    ELSE raw END AS est_distinct
        FROM (SELECT source,
                     (0.7213 / (1.0 + 1.079 / {m})) * {m} * {m}
                     / (s + ({m} - nz)) AS raw,
                     CAST({m} - nz AS DOUBLE) AS v
              FROM st))
    SELECT mx.source, mx.register, mx.rho, est.est_distinct
    FROM mx JOIN est USING (source)
    ORDER BY mx.source, mx.register
    """


def winnow_fingerprints_sql(window: int = 4) -> str:
    """Exact oracle for ``ops.text.winnow_fingerprints``: the shared
    shingle-hash CTEs (token hash → 3/5/7 combine → splitmix64), then a
    per-doc sliding MIN over ``window`` consecutive shingles (windows
    fully inside the doc), distinct; docs with fewer shingles keep the
    single minimum."""
    return f"""
    WITH RECURSIVE
    {_TOKEN_HASH_CTES},
    ndoc AS (SELECT doc_id, count(*) AS n FROM th GROUP BY doc_id),
    shw AS (
        SELECT doc_id, ti,
               CAST((3 * CAST(h AS HUGEINT)
                     + 5 * CAST(lead(h, 1) OVER w AS HUGEINT)
                     + 7 * CAST(lead(h, 2) OVER w AS HUGEINT))
                    % {_M64} AS UBIGINT) AS c0,
               lead(h, 2) OVER w IS NOT NULL AS full3
        FROM th WINDOW w AS (PARTITION BY doc_id ORDER BY ti)
    ),
    shshort AS (
        SELECT th.doc_id,
               CAST(SUM(CAST(h AS HUGEINT) * (2 * (ti - 1) + 3))
                    % {_M64} AS UBIGINT) AS c0
        FROM th JOIN ndoc ON ndoc.doc_id = th.doc_id AND ndoc.n < 3
        GROUP BY th.doc_id
    ),
    shord AS (
        SELECT doc_id, ti, {_sm('c0')} AS s FROM shw WHERE full3
        UNION ALL
        SELECT doc_id, 1 AS ti, {_sm('c0')} AS s FROM shshort
    ),
    idx AS (
        SELECT doc_id, s,
               row_number() OVER (PARTITION BY doc_id ORDER BY ti) AS i,
               count(*) OVER (PARTITION BY doc_id) AS cnt
        FROM shord
    ),
    wins AS (
        SELECT doc_id, i, cnt,
               min(s) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN {window - 1} PRECEDING
                            AND CURRENT ROW) AS fp
        FROM idx
    )
    SELECT DISTINCT doc_id, fp FROM wins WHERE i >= {window}
    UNION
    SELECT doc_id, min(s) AS fp FROM idx WHERE cnt < {window}
    GROUP BY doc_id
    ORDER BY doc_id, fp
    """


def winnow_dup_pairs_sql(window: int = 4, min_shared: int = 2,
                         max_bucket: int = 256) -> str:
    """Exact oracle for ``ops.text.winnow_dup_pairs``: shared-
    fingerprint counts through buckets of 2..max_bucket docs only (the
    operator's deterministic hub exclusion), pairs with >= min_shared."""
    inner = winnow_fingerprints_sql(window)
    inner = inner.rsplit("ORDER BY doc_id, fp", 1)[0]
    return f"""
    WITH fps AS ({inner}),
    ok AS (SELECT fp FROM fps GROUP BY fp
           HAVING count(*) BETWEEN 2 AND {max_bucket}),
    p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared
          FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
          JOIN ok ON ok.fp = a.fp
          GROUP BY 1, 2)
    SELECT a_id, b_id, CAST(shared AS BIGINT) AS shared FROM p
    WHERE shared >= {min_shared}
    ORDER BY a_id, b_id
    """


def dsir_select_sql(target_source: str = "src0", k: int = 50,
                    n_buckets: int = 256) -> str:
    """Exact oracle for ops.text.dsir_select: the same splitmix64
    unigram hashes (shared _TOKEN_HASH_CTES) and bigram mixes
    (splitmix64(h1·B2 + h2), the ops.hashing._B2 base), bucketed mod
    ``n_buckets``; add-one-smoothed target/raw log-ratios summed per
    doc, rounded to 4dp BEFORE ranking (the score-oracle contract)."""
    b2 = 0x9E3779B97F4A7C15 | 1
    mix_in = (f"CAST(((CAST({_mm('a.h', b2)} AS HUGEINT)"
              f" + CAST(b.h AS HUGEINT)) % {_M64}) AS UBIGINT)")
    return f"""
    WITH RECURSIVE
    {_TOKEN_HASH_CTES},
    bgr AS (SELECT a.doc_id, {_sm(mix_in)} AS h
            FROM th a JOIN th b
              ON a.doc_id = b.doc_id AND b.ti = a.ti + 1),
    feat AS (SELECT doc_id, CAST(h % {n_buckets} AS BIGINT) AS b FROM th
             UNION ALL
             SELECT doc_id, CAST(h % {n_buckets} AS BIGINT) FROM bgr),
    tc AS (SELECT b, count(*) AS n FROM feat JOIN documents USING (doc_id)
           WHERE source = '{target_source}' GROUP BY b),
    rc AS (SELECT b, count(*) AS n FROM feat GROUP BY b),
    tt AS (SELECT count(*) AS n FROM feat JOIN documents USING (doc_id)
           WHERE source = '{target_source}'),
    rt AS (SELECT count(*) AS n FROM feat),
    lr AS (SELECT rc.b,
                  ln((coalesce(tc.n, 0) + 1.0)
                     / ((SELECT n FROM tt) + {float(n_buckets)}))
                - ln((rc.n + 1.0)
                     / ((SELECT n FROM rt) + {float(n_buckets)})) AS r
           FROM rc LEFT JOIN tc USING (b))
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
           round(sum(r), 4) AS logw
    FROM feat JOIN lr USING (b)
    GROUP BY doc_id ORDER BY logw DESC, doc_id LIMIT {k}
    """
