"""DuckDB-SQL oracles for the reference TF-IDF relevance score.

The reference's scoring pipeline (noise_ray/query/engine.py:1-25;
/root/reference/src/snapshot.rs:132-183, src/query.rs:463-477) is

    idf_t      = 1 + ln(K / (C_t + 1))          # K: field total
    per-match  = idf_t^2 * sqrt(tf_t) / sqrt(field_len) * boost
    query_norm = 1 / sum_t(idf_t^2)
    score      = query_norm * sum_slots(sum/count) * matched / num_slots

which is SQL-expressible whenever SQL can reproduce the token
statistics.  For corpora whose text tokenizes identically under
UAX#29 + Porter2 and a lowercase ``[a-z0-9]+`` regex with no two
tokens sharing a stem (the synthetic documents table has a 31-word
closed vocabulary with both properties — asserted over the full
corpus in tests/test_score_oracle.py), token statistics equal stem
statistics, so the whole score computes in DuckDB from the raw table.

Two deliberate reductions, both checked empirically in tests:

- the engine scores in float32 for reference parity while SQL works in
  float64, so oracled entries round the returned score to 4 decimals on
  BOTH sides (raw-f32 golden parity against the reference transcripts
  stays tested in tests/test_noise_transcripts.py and
  tests/test_cross_engine.py);
- top-k selection must be deterministic across engines, so the oracled
  queries order by ``score() desc, <key> asc`` and the SQL mirrors
  ``ORDER BY score DESC, key`` on the unrounded float64 score.  The
  fixed synthetic corpora have no boundary-straddling near-ties (the
  cross-engine equality tests would catch one).

Useful cancellation: for a single-term query the idf cancels against
the query norm and the score is exactly ``sqrt(tf / field_len)``.
"""

from __future__ import annotations

_TOKS = """
toks AS (
  SELECT {key}, tok, ord FROM (
    SELECT {key},
           unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok,
           generate_subscripts(
               regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS ord
    FROM {src})),
lens AS (SELECT {key}, count(*) AS len FROM toks GROUP BY {key})"""


def _toks(src: str, key: str) -> str:
    return _TOKS.format(src=src, key=key)


def term_topk_sql(term: str, limit: int, *, src: str = "documents",
                  key: str = "doc_id") -> str:
    """``find {{text: ~="<term>"}} order score() desc, .<key> asc
    return score() limit N`` — single-slot score = sqrt(tf/len)."""
    return f"""
WITH {_toks(src, key)},
tf AS (SELECT {key}, count(*) AS tf FROM toks
       WHERE tok = '{term}' GROUP BY {key})
SELECT tf.{key},
       ROUND(sqrt(tf.tf / CAST(lens.len AS DOUBLE)), 4) AS score
FROM tf JOIN lens USING ({key})
ORDER BY sqrt(tf.tf / CAST(lens.len AS DOUBLE)) DESC, tf.{key}
LIMIT {limit}"""


def phrase_topk_sql(w1: str, w2: str, limit: int, *, src: str = "documents",
                    key: str = "doc_id") -> str:
    """Two-word phrase: docs where w2 directly follows w1; only the first
    word's slot scores (StemmedPhraseFilter keeps filters[0]'s DocResult,
    /root/reference/src/filters.rs:175-272), the second contributes only
    idf^2 to the query norm; matched=1 of num_slots=2."""
    return f"""
WITH {_toks(src, key)},
corpus_k AS (SELECT count(*) AS k
             FROM (SELECT DISTINCT {key}, tok FROM toks)),
c AS (SELECT
        (SELECT count(*) FROM toks WHERE tok = '{w1}') AS c1,
        (SELECT count(*) FROM toks WHERE tok = '{w2}') AS c2),
idf AS (SELECT 1.0 + ln(k / (c1 + 1.0)) AS i1,
               1.0 + ln(k / (c2 + 1.0)) AS i2
        FROM corpus_k, c),
phr AS (SELECT DISTINCT a.{key} FROM toks a JOIN toks b
        ON a.{key} = b.{key} AND b.ord = a.ord + 1
        WHERE a.tok = '{w1}' AND b.tok = '{w2}'),
tf1 AS (SELECT {key}, count(*) AS tf FROM toks
        WHERE tok = '{w1}' GROUP BY {key}),
raw AS (SELECT phr.{key},
               (i1 * i1 * sqrt(tf / CAST(len AS DOUBLE)))
                 / (i1 * i1 + i2 * i2) * 0.5 AS score
        FROM phr JOIN tf1 USING ({key}) JOIN lens USING ({key}), idf)
SELECT {key}, ROUND(score, 4) AS score FROM raw
ORDER BY score DESC, {key}
LIMIT {limit}"""


def _transcript_corpus_parts(sf_dir: str, terms: tuple[str, ...]):
    """(files, fix_vals, fold) shared by the transcript-corpus score
    oracles: the parquet file list, literal corpus-stat rows for fixture
    texts whose engine tokenization diverges from the SQL regex, and a
    CASE expression folding stem-collision tokens (computed from the
    closed generator vocabulary)."""
    import re as _re

    from ..analysis.porter2 import stem as _stem
    from ..analysis.tokenizer import tokenize as _tokenize
    from ..pipelines.flagship import transcripts_corpus
    from ..sources.transcripts import _VOCAB, FIXTURE_TEXTS

    paths = transcripts_corpus(sf_dir)
    files = ", ".join("'%s'" % p for p in paths)

    fix_rows = []
    for t in FIXTURE_TEXTS:
        eng = [w for _, w in _tokenize(t)]
        rx = [_stem(w) for w in _re.findall(r"[a-z0-9]+", t.lower())]
        if eng != rx:
            assert not (set(terms) & set(eng)), \
                f"divergent fixture contains a query term: {t!r}"
            fix_rows.append((t, len(eng), len(set(eng))))
    fix_vals = ", ".join(
        "('%s', %d, %d)" % (t.replace("'", "''"), ln, ns)
        for t, ln, ns in fix_rows)

    vocab = {w.lower() for w in _VOCAB}
    for t in FIXTURE_TEXTS:
        vocab.update(_re.findall(r"[a-z0-9]+", t.lower()))
    by_stem: dict[str, list[str]] = {}
    for w in sorted(vocab):
        by_stem.setdefault(_stem(w), []).append(w)
    cases = []
    for s, ws in sorted(by_stem.items()):
        if len(ws) > 1:
            for w in ws:
                if w != s:
                    cases.append(f"WHEN '{w}' THEN '{s}'")
    fold = ("CASE tok " + " ".join(cases) + " ELSE tok END") if cases \
        else "tok"
    return files, fix_vals, fold


# the corpus scan shared by the transcript score oracles: regex-clean
# rows tokenized+folded in SQL, divergent fixture rows replaced by their
# literal engine statistics when computing K
_TRANSCRIPT_STATS = """
src AS (SELECT conv_id, turn_idx, role, text
        FROM read_parquet([{files}])),
fix(ftext, flen, fstems) AS (VALUES {fix_vals}),
clean AS (SELECT conv_id, turn_idx, role, text FROM src
          WHERE text NOT IN (SELECT ftext FROM fix)),
toks AS (SELECT conv_id, turn_idx, {fold} AS tok, ord FROM (
           SELECT conv_id, turn_idx,
                  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok,
                  generate_subscripts(
                      regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS ord
           FROM clean)),
lens AS (SELECT conv_id, turn_idx, count(*) AS len
         FROM toks GROUP BY conv_id, turn_idx),
corpus_k AS (
  SELECT (SELECT count(*) FROM (SELECT DISTINCT conv_id, turn_idx, tok
                                FROM toks))
       + (SELECT coalesce(sum(fstems), 0)
          FROM src JOIN fix ON src.text = fix.ftext) AS k)"""


def nested_kp_bm25_sql(terms: tuple[str, ...] = ("quick", "brown"),
                       k: int = 20, k1: float = 1.2, b: float = 0.75,
                       sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Oracle for the keypath-qualified BM25 over the nested
    conversation index (ops/nested_docs.nested_kp_bm25): each TURN is a
    scoring instance, so the SQL ranks the flat transcript rows with
    per-turn tf/len, instance dfs, and corpus avgdl.  The engine's
    instance count N comes from the per-kp zone counters and its token
    total from the stats sidecar — both count ENGINE tokens, so the
    divergent fixture rows contribute their literal engine lengths
    (``fix.flen``) to the avgdl numerator here, exactly as in the other
    transcript-corpus oracles (they never contain a query term)."""
    files, fix_vals, fold = _transcript_corpus_parts(sf_dir, terms)
    stats = _TRANSCRIPT_STATS.format(files=files, fix_vals=fix_vals,
                                     fold=fold)
    toks_in = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {stats},
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM src),
tot AS (SELECT (SELECT coalesce(sum(len), 0) FROM lens)
             + (SELECT coalesce(sum(flen), 0)
                FROM src JOIN fix ON src.text = fix.ftext) AS t),
ad AS (SELECT (SELECT t FROM tot) / (SELECT n FROM nn) AS a),
tf AS (SELECT conv_id, turn_idx, tok, count(*) AS tf FROM toks
       WHERE tok IN ({toks_in}) GROUP BY conv_id, turn_idx, tok),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
s AS (SELECT tf.conv_id, tf.turn_idx,
             sum(ln(1.0 + ((SELECT n FROM nn) - df.df + 0.5)
                          / (df.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b}
                                    + {b} * lens.len / (SELECT a FROM ad)))
                 ) AS score
      FROM tf JOIN df USING (tok) JOIN lens USING (conv_id, turn_idx)
      GROUP BY tf.conv_id, tf.turn_idx)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       ROUND(score, 4) AS score FROM s
ORDER BY ROUND(score, 4) DESC, conv_id, turn_idx LIMIT {k}"""


def nested_kp_bm25_filtered_sql(terms: tuple[str, ...] = ("quick",
                                                          "brown"),
                                role: str = "assistant", k: int = 20,
                                k1: float = 1.2, b: float = 0.75,
                                sf_dir: str = "/root/testdata/sf0.01"
                                ) -> str:
    """Oracle for the sibling-filtered keypath BM25
    (ops/nested_docs.nested_kp_bm25_filtered): identical statistics to
    nested_kp_bm25_sql (df/N/avgdl index-wide — post_filter semantics),
    hits restricted to turns whose role equals ``role``.  Divergent
    fixture rows never contain a query term, so excluding them from the
    role join loses no hit."""
    files, fix_vals, fold = _transcript_corpus_parts(sf_dir, terms)
    stats = _TRANSCRIPT_STATS.format(files=files, fix_vals=fix_vals,
                                     fold=fold)
    toks_in = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {stats},
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM src),
tot AS (SELECT (SELECT coalesce(sum(len), 0) FROM lens)
             + (SELECT coalesce(sum(flen), 0)
                FROM src JOIN fix ON src.text = fix.ftext) AS t),
ad AS (SELECT (SELECT t FROM tot) / (SELECT n FROM nn) AS a),
tf AS (SELECT conv_id, turn_idx, tok, count(*) AS tf FROM toks
       WHERE tok IN ({toks_in}) GROUP BY conv_id, turn_idx, tok),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
s AS (SELECT tf.conv_id, tf.turn_idx,
             sum(ln(1.0 + ((SELECT n FROM nn) - df.df + 0.5)
                          / (df.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b}
                                    + {b} * lens.len / (SELECT a FROM ad)))
                 ) AS score
      FROM tf JOIN df USING (tok) JOIN lens USING (conv_id, turn_idx)
      GROUP BY tf.conv_id, tf.turn_idx),
fs AS (SELECT s.* FROM s JOIN clean c
       ON s.conv_id = c.conv_id AND s.turn_idx = c.turn_idx
       WHERE c.role = '{role}')
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       ROUND(score, 4) AS score FROM fs
ORDER BY ROUND(score, 4) DESC, conv_id, turn_idx LIMIT {k}"""


def flagship_or_topk_sql(terms: tuple[str, ...] = ("quick", "brown", "fox"),
                         limit: int = 50,
                         sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Score oracle for the flagship OR query over the synthetic
    transcript corpus (the driver's correctness pass runs at sf0.01,
    where corpus generation is Ray-free — pipelines/flagship.py).

    The corpus text is space-joined words from a closed vocabulary, so it
    tokenizes identically under the SQL regex and the engine's
    UAX#29 + Porter2 analyzer — EXCEPT (a) three stem-collision pairs
    (its/it, seeing/see, words/word), folded by a CASE computed here from
    the generator vocabulary, and (b) a handful of fixture strata with
    punctuation/unicode (FIXTURES.md §1): those are repo constants, so
    their engine-token statistics (field_len, distinct stems) are inlined
    literally and their rows excluded from the regex scan.  None of the
    fixture divergers contains a query term (asserted below), so they
    only contribute corpus statistics (K), never matches.
    """
    files, fix_vals, fold = _transcript_corpus_parts(sf_dir, terms)
    stats = _TRANSCRIPT_STATS.format(files=files, fix_vals=fix_vals,
                                     fold=fold)
    tq = {t: f"t{i}" for i, t in enumerate(terms)}
    c_sel = ", ".join(
        f"(SELECT count(*) FROM toks WHERE tok = '{t}') AS c_{v}"
        for t, v in tq.items())
    idf_sel = ", ".join(
        f"1.0 + ln(k / (c_{v} + 1.0)) AS i_{v}" for v in tq.values())
    tf_sel = ", ".join(
        f"count(*) FILTER (tok = '{t}') AS tf_{v}" for t, v in tq.items())
    having = " + ".join(f"tf_{v}" for v in tq.values())
    contrib = " + ".join(
        f"CASE WHEN tf_{v} > 0 THEN i_{v} * i_{v} * "
        f"sqrt(tf_{v} / CAST(len AS DOUBLE)) ELSE 0.0 END"
        for v in tq.values())
    norm = " + ".join(f"i_{v} * i_{v}" for v in tq.values())
    matched = " + ".join(f"CAST(tf_{v} > 0 AS INTEGER)" for v in tq.values())

    return f"""
WITH {stats},
c AS (SELECT {c_sel}),
idf AS (SELECT {idf_sel} FROM corpus_k, c),
tfs AS (SELECT conv_id, turn_idx, {tf_sel}
        FROM toks GROUP BY conv_id, turn_idx
        HAVING {having} > 0),
raw AS (SELECT t.conv_id, t.turn_idx,
               ({contrib}) / ({norm}) * ({matched}) / {len(terms)}.0 AS score
        FROM tfs t JOIN lens USING (conv_id, turn_idx), idf)
SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
       ROUND(score, 4) AS score
FROM raw ORDER BY score DESC, conv_id, turn_idx LIMIT {limit}"""


def nested_conv_phrase_sql(role: str = "assistant",
                           w1: str = "quick", w2: str = "brown",
                           limit: int = 50,
                           sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Score oracle for the nested array-context search
    ``find {turns: [{role: =="assistant", text: ~="quick brown"}]}``.

    The nested engine scores each string instance (turn) independently
    and keeps the FIRST matching instance per document
    (query/json_engine.py:25-28).  Slots: the Exact role filter (idf 1,
    contribution 1 per match), the phrase's first word (idf_1^2 *
    sqrt(tf_w1 / turn_len)), and the phrase's second word (query-norm
    only — StemmedPhraseFilter keeps filters[0]'s DocResult).  The
    ``turns$.text`` keypath statistics (K, C) equal the per-turn stats of
    the flat transcript corpus, because the nested corpus packs exactly
    those turns (ops/nested_docs.py)."""
    files, fix_vals, fold = _transcript_corpus_parts(sf_dir, (w1, w2))
    stats = _TRANSCRIPT_STATS.format(files=files, fix_vals=fix_vals,
                                     fold=fold)
    return f"""
WITH {stats},
c AS (SELECT (SELECT count(*) FROM toks WHERE tok = '{w1}') AS c1,
             (SELECT count(*) FROM toks WHERE tok = '{w2}') AS c2),
idf AS (SELECT 1.0 + ln(k / (c1 + 1.0)) AS i1,
               1.0 + ln(k / (c2 + 1.0)) AS i2
        FROM corpus_k, c),
phr AS (SELECT DISTINCT a.conv_id, a.turn_idx FROM toks a JOIN toks b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
           AND b.ord = a.ord + 1
        WHERE a.tok = '{w1}' AND b.tok = '{w2}'),
hits AS (SELECT p.conv_id, p.turn_idx FROM phr p
         JOIN src USING (conv_id, turn_idx)
         WHERE src.role = '{role}'),
first_hit AS (SELECT conv_id, min(turn_idx) AS turn_idx
              FROM hits GROUP BY conv_id),
tf1 AS (SELECT conv_id, turn_idx, count(*) AS tf FROM toks
        WHERE tok = '{w1}' GROUP BY conv_id, turn_idx),
raw AS (SELECT f.conv_id AS _id,
               (1.0 + i1 * i1 * sqrt(tf / CAST(len AS DOUBLE)))
                 / (1.0 + i1 * i1 + i2 * i2) * (2.0 / 3.0) AS score
        FROM first_hit f
        JOIN tf1 USING (conv_id, turn_idx)
        JOIN lens USING (conv_id, turn_idx), idf)
SELECT _id, ROUND(score, 4) AS score FROM raw
ORDER BY score DESC, _id LIMIT {limit}"""


def values_corpus_term_sql(rows: list[tuple[str, int, str]], term: str,
                           limit: int) -> str:
    """Score oracle over an inline VALUES corpus — used by the lifecycle
    entries, whose live corpus after upsert/delete/compaction is a small
    fixed set of turns known a priori.  Returns (conv_id, turn_idx, score)
    for turns matching ``term``, the single-slot score sqrt(tf/len)."""
    vals = ", ".join(
        "('%s', %d, '%s')" % (c, i, t.replace("'", "''"))
        for c, i, t in rows)
    return f"""
WITH corpus(conv_id, turn_idx, text) AS (VALUES {vals}),
toks AS (
  SELECT conv_id, turn_idx,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM corpus),
lens AS (SELECT conv_id, turn_idx, count(*) AS len
         FROM toks GROUP BY conv_id, turn_idx),
tf AS (SELECT conv_id, turn_idx, count(*) AS tf FROM toks
       WHERE tok = '{term}' GROUP BY conv_id, turn_idx)
SELECT tf.conv_id, CAST(tf.turn_idx AS INTEGER) AS turn_idx,
       ROUND(sqrt(tf.tf / CAST(lens.len AS DOUBLE)), 4) AS score
FROM tf JOIN lens USING (conv_id, turn_idx)
ORDER BY sqrt(tf.tf / CAST(lens.len AS DOUBLE)) DESC, tf.conv_id, tf.turn_idx
LIMIT {limit}"""


def term_highlight_sql(term: str, limit: int, ctx: int = 2, *,
                       src: str = "documents", key: str = "doc_id") -> str:
    """Exact oracle for ops.highlight.search_highlight: the term_topk
    score CTE, one row per occurrence of ``term`` in each winning doc
    (pos = 0-based kept-token index), snippet = the +-ctx token window
    joined with spaces.  Ranked on the ROUNDED score + doc_id — the
    op's deterministic cutoff (see ops/highlight.py: the engine's f32
    kernels order mathematically-equal scores by rounding noise)."""
    return f"""
WITH {_toks(src, key)},
tf AS (SELECT {key}, count(*) AS tf FROM toks
       WHERE tok = '{term}' GROUP BY {key}),
top AS (SELECT tf.{key},
               ROUND(sqrt(tf.tf / CAST(lens.len AS DOUBLE)), 4) AS score
        FROM tf JOIN lens USING ({key})
        ORDER BY ROUND(sqrt(tf.tf / CAST(lens.len AS DOUBLE)), 4) DESC,
                 tf.{key}
        LIMIT {limit}),
hits AS (SELECT t.{key}, t.ord - 1 AS pos FROM toks t
         WHERE t.tok = '{term}'
           AND t.{key} IN (SELECT {key} FROM top))
SELECT top.{key}, top.score, hits.pos,
       (SELECT string_agg(t2.tok, ' ' ORDER BY t2.ord) FROM toks t2
        WHERE t2.{key} = hits.{key}
          AND t2.ord BETWEEN hits.pos + 1 - {ctx}
                         AND hits.pos + 1 + {ctx}) AS snippet
FROM top JOIN hits USING ({key})
ORDER BY top.{key}, hits.pos"""


def dynamic_or_topk_sql(seed_sql: str, limit: int, *,
                        src: str = "documents", key: str = "doc_id",
                        exclude: str = "TRUE") -> str:
    """Shared dynamic-term scored-OR oracle: per-term idf and the
    reference OR score (contributions / query-norm x matched /
    num_slots) computed relationally against an arbitrary seed-term CTE
    ``seed_sql`` (must select a ``tok`` column from ``toks``), ranked on
    the ROUNDED score + key — the deterministic cutoff every
    dictionary-expanded op uses (ops/related.py rationale).  Backs
    more_like_this / prefix / fuzzy top-k."""
    return f"""
WITH {_toks(src, key)},
seed AS ({seed_sql}),
nterms AS (SELECT count(*) AS n FROM seed),
corpus_k AS (SELECT count(*) AS k
             FROM (SELECT DISTINCT {key}, tok FROM toks)),
cnt AS (SELECT seed.tok, count(*) AS c
        FROM toks JOIN seed USING (tok) GROUP BY seed.tok),
idf AS (SELECT tok, 1.0 + ln(k / (c + 1.0)) AS i FROM cnt, corpus_k),
nrm AS (SELECT SUM(i * i) AS nr FROM idf),
tfs AS (SELECT t.{key}, t.tok, count(*) AS tf
        FROM toks t JOIN seed USING (tok) GROUP BY t.{key}, t.tok),
contrib AS (SELECT tfs.{key},
                   SUM(idf.i * idf.i
                       * sqrt(tfs.tf / CAST(lens.len AS DOUBLE))) AS co,
                   count(*) AS matched
            FROM tfs JOIN idf USING (tok) JOIN lens USING ({key})
            GROUP BY tfs.{key}),
raw AS (SELECT {key},
               co / nr * matched / CAST(n AS DOUBLE) AS score
        FROM contrib, nrm, nterms
        WHERE {exclude})
SELECT {key}, ROUND(score, 4) AS score FROM raw
ORDER BY ROUND(score, 4) DESC, {key}
LIMIT {limit}"""


def more_like_this_sql(seed_doc: int, limit: int, *,
                       src: str = "documents", key: str = "doc_id") -> str:
    """Exact oracle for ops.related.more_like_this: seed terms = the seed
    doc's distinct tokens, seed doc excluded from the ranking."""
    return dynamic_or_topk_sql(
        f"SELECT DISTINCT tok FROM toks WHERE {key} = {seed_doc}",
        limit, src=src, key=key, exclude=f"{key} != {seed_doc}")


def prefix_topk_sql(prefix: str, limit: int, *, src: str = "documents",
                    key: str = "doc_id") -> str:
    """Exact oracle for ops.termdict.search_prefix: seed terms = every
    corpus token starting with ``prefix``."""
    return dynamic_or_topk_sql(
        f"SELECT DISTINCT tok FROM toks WHERE tok LIKE '{prefix}%'",
        limit, src=src, key=key)


def fuzzy_topk_sql(word: str, max_dist: int, limit: int, *,
                   src: str = "documents", key: str = "doc_id") -> str:
    """Exact oracle for ops.termdict.search_fuzzy: seed terms = every
    corpus token within ``max_dist`` edits of ``word`` (DuckDB
    ``levenshtein`` == build/dictionary.levenshtein_batch)."""
    return dynamic_or_topk_sql(
        f"SELECT DISTINCT tok FROM toks "
        f"WHERE levenshtein(tok, '{word}') <= {max_dist}",
        limit, src=src, key=key)


def regex_topk_sql(pattern: str, limit: int, *, src: str = "documents",
                   key: str = "doc_id") -> str:
    """Exact oracle for ops.termdict.search_regex: seed terms = every
    corpus token fully matching ``pattern`` (RE2 on both engines)."""
    return dynamic_or_topk_sql(
        f"SELECT DISTINCT tok FROM toks "
        f"WHERE regexp_full_match(tok, '{pattern}')",
        limit, src=src, key=key)


def did_you_mean_sql(word: str, max_dist: int, limit: int, *,
                     src: str = "documents", key: str = "doc_id") -> str:
    """Exact oracle for ops.termdict.did_you_mean: (token, dist, cf)
    ranked closest-first, then collection frequency, then token."""
    return f"""
WITH {_toks(src, key)},
cand AS (SELECT tok AS token,
                levenshtein(tok, '{word}') AS dist,
                count(*) AS cf
         FROM toks GROUP BY tok)
SELECT token, CAST(dist AS BIGINT) AS dist, CAST(cf AS BIGINT) AS cf
FROM cand WHERE dist <= {max_dist}
ORDER BY dist, cf DESC, token
LIMIT {limit}"""


def did_you_mean_phrase_sql(words: tuple[str, str], max_dist: int = 1,
                            k: int = 3, max_cand: int = 8, *,
                            src: str = "documents",
                            key: str = "doc_id") -> str:
    """Phrase-suggester oracle (ops/termdict.did_you_mean_phrase):
    per-word candidates capped by the same (dist, cf desc, token)
    order, pairs ranked by (corpus bigram count desc, cf sum desc,
    phrase asc) — integer-exact."""
    cands = []
    for i, w in enumerate(words):
        cands.append(f"""
cand{i} AS (SELECT token, cf FROM (
    SELECT tok AS token, levenshtein(tok, '{w}') AS dist,
           count(*) AS cf
    FROM toks GROUP BY tok) c
    WHERE dist <= {max_dist}
    ORDER BY dist, cf DESC, token LIMIT {max_cand})""")
    return f"""
WITH {_toks(src, key)},{",".join(cands)},
big AS (SELECT a.tok AS t0, b.tok AS t1, count(*) AS n
        FROM toks a JOIN toks b
        ON a.{key} = b.{key} AND b.ord = a.ord + 1
        GROUP BY 1, 2)
SELECT c0.token || ' ' || c1.token AS phrase,
       CAST(coalesce(b.n, 0) AS BIGINT) AS bigram_n,
       CAST(c0.cf + c1.cf AS BIGINT) AS cf_sum
FROM cand0 c0 CROSS JOIN cand1 c1
LEFT JOIN big b ON b.t0 = c0.token AND b.t1 = c1.token
ORDER BY bigram_n DESC, cf_sum DESC, phrase LIMIT {k}"""


def hybrid_rrf_sql(term: str, query_vec_id: int, k: int, rrf_k: int,
                   topn: int, *, src: str = "documents",
                   key: str = "doc_id") -> str:
    """RRF fusion oracle (ops/hybrid.py): lexical rank = the single-term
    4dp-ROUNDED score order (ties by id — ULP-level f32/f64 orderings
    inside a tie group differ, the rounded rank is the deterministic
    one), vector rank = cosine order around
    ``query_vec_id``'s embedding (ties by id), fused score a fixed-order
    two-term sum rounded to 6dp on both sides."""
    return f"""
WITH {_toks(src, key)},
tf AS (SELECT {key}, count(*) AS tf FROM toks
       WHERE tok = '{term}' GROUP BY {key}),
tr AS (SELECT {key} AS doc_id, r FROM (
         SELECT tf.{key},
                row_number() OVER (
                  ORDER BY ROUND(sqrt(tf.tf / CAST(lens.len AS DOUBLE)),
                                 4) DESC,
                           tf.{key}) AS r
         FROM tf JOIN lens USING ({key})) WHERE r <= {k}),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {query_vec_id}),
ar AS (SELECT vec_id AS doc_id, r FROM (
         SELECT vec_id,
                row_number() OVER (
                  ORDER BY list_cosine_similarity(qe, embedding) DESC,
                           vec_id) AS r
         FROM embeddings, q WHERE vec_id != {query_vec_id}) WHERE r <= {k}),
f AS (SELECT coalesce(tr.doc_id, ar.doc_id) AS doc_id,
             coalesce(1.0/({rrf_k}+tr.r), 0)
             + coalesce(1.0/({rrf_k}+ar.r), 0) AS rrf
      FROM tr FULL OUTER JOIN ar ON tr.doc_id = ar.doc_id)
SELECT doc_id, ROUND(rrf, 6) AS rrf FROM f
ORDER BY f.rrf DESC, doc_id LIMIT {topn}"""


def bm25_topk_sql(terms: tuple[str, ...], k: int, k1: float, b: float, *,
                  src: str = "documents", key: str = "doc_id",
                  where: str | None = None,
                  require_all: bool = False,
                  min_match: int = 0,
                  offset: int = 0) -> str:
    """Okapi BM25 oracle (ops/bm25.py): Lucene-style non-negative idf,
    avgdl = total tokens / total docs (ALL docs, matching the engine's
    stats-sidecar total / num_docs), score rounded to 4dp and ordered by
    (rounded score desc, id) on both sides.  ``where`` adds the filtered
    "bool query" shape: candidates restricted to rows satisfying the
    predicate, idf/avgdl stats staying corpus-wide like the engine.
    ``require_all`` is the conjunctive (posting-list intersection) mode:
    only docs matching EVERY query term rank (mode="and");
    ``min_match=m`` is the minimum_should_match middle ground (docs
    matching >= m distinct terms).  ``offset``
    oracles the engine's ``search_after`` cursor pagination: the
    (rounded score desc, key asc) ordering is TOTAL, so the rows
    strictly after page N's last (score, key) cursor are exactly rows
    N*k+1 .. (N+1)*k — plain OFFSET."""
    fil = (f",\nfil AS (SELECT {key} FROM {src} WHERE {where})"
           if where else "")
    fjoin = f"JOIN fil USING ({key})" if where else ""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    having = (f"\n      HAVING count(*) = {len(set(terms))}"
              if require_all else
              (f"\n      HAVING count(*) >= {min_match}"
               if min_match > 1 else ""))
    return f"""
WITH {_toks(src, key)},
nn AS (SELECT count(*) AS n FROM {src}),
ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) FROM nn) AS a
       FROM lens),
tf AS (SELECT {key}, tok, count(*) AS tf FROM toks
       WHERE tok IN ({toks_in}) GROUP BY {key}, tok),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
s AS (SELECT tf.{key},
             sum(ln(1.0 + ((SELECT n FROM nn) - df.df + 0.5)
                          / (df.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b}
                                    + {b} * lens.len / (SELECT a FROM ad)))
                 ) AS score
      FROM tf JOIN df USING (tok) JOIN lens USING ({key})
      GROUP BY tf.{key}{having})
{fil}
SELECT {key}, ROUND(score, 4) AS score FROM s
{fjoin}
ORDER BY ROUND(score, 4) DESC, {key} LIMIT {k}{
    f" OFFSET {offset}" if offset else ""}"""


def bm25_fields_sql(terms: tuple[str, ...],
                    weights: tuple[tuple[str, float], ...],
                    k: int, k1: float = 1.2, b: float = 0.75, *,
                    src: str = "documents", key: str = "doc_id") -> str:
    """Weighted multi-field BM25 oracle (ops/bm25.bm25_fields_topk):
    ``score = Σ_f w_f · Σ_t bm25_f(t)`` with per-field df and avgdl.
    ``text`` tokenizes through the shared toks CTE; every other field
    is a SINGLE-TOKEN column (the synthetic lang/source values are one
    token each), so tf = 1, dl = 1, avgdl = 1 and the kernel expression
    is written out with those literals in the engine's operand order
    (f64 ops are IEEE-rounded, so same order → same bits).  The
    cross-field combination mirrors the engine's field-major weighted
    sum; rounding to 4dp happens once, after it."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    ctes, combines, joins = [], [], []
    for f, w in weights:
        if f == "text":
            ctes.append(f"""
tf_text AS (SELECT {key}, tok, count(*) AS tf FROM toks
            WHERE tok IN ({toks_in}) GROUP BY {key}, tok),
df_text AS (SELECT tok, count(*) AS df FROM tf_text GROUP BY tok),
s_text AS (SELECT tf_text.{key},
                  sum(ln(1.0 + ((SELECT n FROM nn) - df_text.df + 0.5)
                               / (df_text.df + 0.5))
                      * tf_text.tf * ({k1} + 1.0)
                      / (tf_text.tf
                         + {k1} * (1.0 - {b}
                                   + {b} * lens.len / (SELECT a FROM ad)))
                      ) AS sc
           FROM tf_text JOIN df_text USING (tok)
           JOIN lens USING ({key})
           GROUP BY tf_text.{key})""")
            combines.append(f"{w} * COALESCE(s_text.sc, 0.0)")
            joins.append(f"LEFT JOIN s_text USING ({key})")
        else:
            ctes.append(f"""
tf_{f} AS (SELECT {key}, {f} AS tok FROM {src}
           WHERE {f} IN ({toks_in})),
df_{f} AS (SELECT tok, count(*) AS df FROM tf_{f} GROUP BY tok),
s_{f} AS (SELECT tf_{f}.{key},
                 sum(ln(1.0 + ((SELECT n FROM nn) - df_{f}.df + 0.5)
                              / (df_{f}.df + 0.5))
                     * 1.0 * ({k1} + 1.0)
                     / (1.0 + {k1} * (1.0 - {b} + {b} * 1.0 / 1.0))
                     ) AS sc
          FROM tf_{f} JOIN df_{f} USING (tok)
          GROUP BY tf_{f}.{key})""")
            combines.append(f"{w} * COALESCE(s_{f}.sc, 0.0)")
            joins.append(f"LEFT JOIN s_{f} USING ({key})")
    union = " UNION ".join(
        f"SELECT {key} FROM s_{f if f != 'text' else 'text'}"
        for f, _ in weights)
    expr = " + ".join(combines)
    return f"""
WITH {_toks(src, key)},
nn AS (SELECT count(*) AS n FROM {src}),
ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) FROM nn) AS a
       FROM lens),{",".join(ctes)},
ids AS ({union})
SELECT ids.{key}, ROUND({expr}, 4) AS score
FROM ids
{chr(10).join(joins)}
ORDER BY ROUND({expr}, 4) DESC, ids.{key} LIMIT {k}"""


def bm25_dismax_sql(terms: tuple[str, ...],
                    weights: tuple[tuple[str, float], ...],
                    tie_breaker: float, k: int,
                    k1: float = 1.2, b: float = 0.75, *,
                    src: str = "documents", key: str = "doc_id") -> str:
    """Dis-max oracle (ops/bm25_ext.bm25_dismax_topk): per-field scores
    exactly as bm25_fields_sql, combined as ``GREATEST(c_f) + tb ·
    (Σ c_f − GREATEST(c_f))`` — the engine computes mx + tb·(sm − mx)
    in the same f64 operand order."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    ctes, combines, joins = [], [], []
    for f, w in weights:
        if f == "text":
            ctes.append(f"""
tf_text AS (SELECT {key}, tok, count(*) AS tf FROM toks
            WHERE tok IN ({toks_in}) GROUP BY {key}, tok),
df_text AS (SELECT tok, count(*) AS df FROM tf_text GROUP BY tok),
s_text AS (SELECT tf_text.{key},
                  sum(ln(1.0 + ((SELECT n FROM nn) - df_text.df + 0.5)
                               / (df_text.df + 0.5))
                      * tf_text.tf * ({k1} + 1.0)
                      / (tf_text.tf
                         + {k1} * (1.0 - {b}
                                   + {b} * lens.len / (SELECT a FROM ad)))
                      ) AS sc
           FROM tf_text JOIN df_text USING (tok)
           JOIN lens USING ({key})
           GROUP BY tf_text.{key})""")
            combines.append(f"{w} * COALESCE(s_text.sc, 0.0)")
            joins.append(f"LEFT JOIN s_text USING ({key})")
        else:
            ctes.append(f"""
tf_{f} AS (SELECT {key}, {f} AS tok FROM {src}
           WHERE {f} IN ({toks_in})),
df_{f} AS (SELECT tok, count(*) AS df FROM tf_{f} GROUP BY tok),
s_{f} AS (SELECT tf_{f}.{key},
                 sum(ln(1.0 + ((SELECT n FROM nn) - df_{f}.df + 0.5)
                              / (df_{f}.df + 0.5))
                     * 1.0 * ({k1} + 1.0)
                     / (1.0 + {k1} * (1.0 - {b} + {b} * 1.0 / 1.0))
                     ) AS sc
          FROM tf_{f} JOIN df_{f} USING (tok)
          GROUP BY tf_{f}.{key})""")
            combines.append(f"{w} * COALESCE(s_{f}.sc, 0.0)")
            joins.append(f"LEFT JOIN s_{f} USING ({key})")
    union = " UNION ".join(
        f"SELECT {key} FROM s_{f}" for f, _ in weights)
    mx = "GREATEST(" + ", ".join(combines) + ")"
    sm = " + ".join(combines)
    expr = f"{mx} + {tie_breaker} * (({sm}) - {mx})"
    return f"""
WITH {_toks(src, key)},
nn AS (SELECT count(*) AS n FROM {src}),
ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) FROM nn) AS a
       FROM lens),{",".join(ctes)},
ids AS ({union})
SELECT ids.{key}, ROUND({expr}, 4) AS score
FROM ids
{chr(10).join(joins)}
ORDER BY ROUND({expr}, 4) DESC, ids.{key} LIMIT {k}"""


def bm25_phrase_topk_sql(words: tuple[str, ...], k: int,
                         k1: float = 1.2, b: float = 0.75, *,
                         src: str = "documents",
                         key: str = "doc_id") -> str:
    """Phrase BM25 oracle (ops/bm25.bm25_phrase_topk): tf = number of
    exact phrase occurrences (adjacent token ordinals), df = docs with
    >= 1 occurrence, same Okapi kernel and 4dp/(score desc, id) contract
    as bm25_topk_sql.  Words must be their own stems on this corpus."""
    n = len(words)
    joins = "\n       ".join(
        f"JOIN toks t{i} ON t{i}.{key} = t0.{key} "
        f"AND t{i}.ord = t0.ord + {i}" for i in range(1, n))
    conds = " AND ".join(f"t{i}.tok = '{w}'" for i, w in enumerate(words))
    return f"""
WITH {_toks(src, key)},
nn AS (SELECT count(*) AS n FROM {src}),
ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) FROM nn) AS a
       FROM lens),
ph AS (SELECT t0.{key} AS {key}, count(*) AS tf
       FROM toks t0
       {joins}
       WHERE {conds}
       GROUP BY t0.{key}),
pdf AS (SELECT count(*) AS df FROM ph),
s AS (SELECT ph.{key},
             ln(1.0 + ((SELECT n FROM nn) - (SELECT df FROM pdf) + 0.5)
                      / ((SELECT df FROM pdf) + 0.5))
             * ph.tf * ({k1} + 1.0)
             / (ph.tf + {k1} * (1.0 - {b}
                                + {b} * lens.len / (SELECT a FROM ad)))
               AS score
      FROM ph JOIN lens USING ({key}))
SELECT {key}, ROUND(score, 4) AS score FROM s
ORDER BY ROUND(score, 4) DESC, {key} LIMIT {k}"""


def bm25_span_first_sql(term: str, end: int, k: int, k1: float = 1.2,
                        b: float = 0.75, *, src: str = "documents",
                        key: str = "doc_id") -> str:
    """Span-first oracle (ops/bm25.bm25_span_first_topk): tf = term
    occurrences with 1-based ordinal <= ``end`` (the engine's 0-based
    position < end), df = docs with >= 1, phrase-kernel scoring."""
    return f"""
WITH {_toks(src, key)},
nn AS (SELECT count(*) AS n FROM {src}),
ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) FROM nn) AS a
       FROM lens),
sp AS (SELECT {key}, count(*) AS tf FROM toks
       WHERE tok = '{term}' AND ord <= {end} GROUP BY {key}),
pdf AS (SELECT count(*) AS df FROM sp),
s AS (SELECT sp.{key},
             ln(1.0 + ((SELECT n FROM nn) - (SELECT df FROM pdf) + 0.5)
                      / ((SELECT df FROM pdf) + 0.5))
             * sp.tf * ({k1} + 1.0)
             / (sp.tf + {k1} * (1.0 - {b}
                                + {b} * lens.len / (SELECT a FROM ad)))
               AS score
      FROM sp JOIN lens USING ({key}))
SELECT {key}, ROUND(score, 4) AS score FROM s
ORDER BY ROUND(score, 4) DESC, {key} LIMIT {k}"""


def bm25_phrase_prefix_sql(words: tuple[str, ...], prefix: str, k: int,
                           max_expansions: int = 50, k1: float = 1.2,
                           b: float = 0.75, *, src: str = "documents",
                           key: str = "doc_id") -> str:
    """Phrase-prefix oracle (ops/bm25_ext.bm25_phrase_prefix_topk): the
    fixed words followed by any token LIKE '<prefix>%' (capped at
    ``max_expansions`` distinct tokens ascending — the engine's raw
    dictionary cap), scored with the exact phrase kernel."""
    n = len(words)
    joins = "\n       ".join(
        f"JOIN toks t{i} ON t{i}.{key} = t0.{key} "
        f"AND t{i}.ord = t0.ord + {i}" for i in range(1, n))
    conds = " AND ".join(f"t{i}.tok = '{w}'" for i, w in enumerate(words))
    return f"""
WITH {_toks(src, key)},
nn AS (SELECT count(*) AS n FROM {src}),
ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) FROM nn) AS a
       FROM lens),
exp AS (SELECT DISTINCT tok FROM toks WHERE tok LIKE '{prefix}%'
        ORDER BY tok LIMIT {max_expansions}),
ph AS (SELECT t0.{key} AS {key}, count(*) AS tf
       FROM toks t0
       {joins}
       JOIN toks te ON te.{key} = t0.{key} AND te.ord = t0.ord + {n}
       JOIN exp ON te.tok = exp.tok
       WHERE {conds}
       GROUP BY t0.{key}),
pdf AS (SELECT count(*) AS df FROM ph),
s AS (SELECT ph.{key},
             ln(1.0 + ((SELECT n FROM nn) - (SELECT df FROM pdf) + 0.5)
                      / ((SELECT df FROM pdf) + 0.5))
             * ph.tf * ({k1} + 1.0)
             / (ph.tf + {k1} * (1.0 - {b}
                                + {b} * lens.len / (SELECT a FROM ad)))
               AS score
      FROM ph JOIN lens USING ({key}))
SELECT {key}, ROUND(score, 4) AS score FROM s
ORDER BY ROUND(score, 4) DESC, {key} LIMIT {k}"""


def explain_score_sql(terms: tuple[str, ...], k1: float = 1.2,
                      b: float = 0.75, *, src: str = "documents",
                      key: str = "doc_id") -> str:
    """Explain oracle (ops/introspect.explain_score): the BM25 top-1
    doc's per-term tf/df/idf/contribution recomputed from raw text,
    idf/contrib rounded to 6dp, ordered by term."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_toks(src, key)},
nn AS (SELECT count(*) AS n FROM {src}),
ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) FROM nn) AS a
       FROM lens),
tf AS (SELECT {key}, tok, count(*) AS tf FROM toks
       WHERE tok IN ({toks_in}) GROUP BY {key}, tok),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
s AS (SELECT tf.{key},
             sum(ln(1.0 + ((SELECT n FROM nn) - df.df + 0.5)
                          / (df.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b}
                                    + {b} * lens.len / (SELECT a FROM ad)))
                 ) AS score
      FROM tf JOIN df USING (tok) JOIN lens USING ({key})
      GROUP BY tf.{key}),
top1 AS (SELECT {key} FROM s ORDER BY ROUND(score, 4) DESC, {key}
         LIMIT 1)
SELECT t.{key}, tf.tok AS term, CAST(tf.tf AS BIGINT) AS tf,
       CAST(df.df AS BIGINT) AS df,
       ROUND(ln(1.0 + ((SELECT n FROM nn) - df.df + 0.5)
                / (df.df + 0.5)), 6) AS idf,
       ROUND(ln(1.0 + ((SELECT n FROM nn) - df.df + 0.5)
                / (df.df + 0.5))
             * tf.tf * ({k1} + 1.0)
             / (tf.tf + {k1} * (1.0 - {b}
                                + {b} * lens.len / (SELECT a FROM ad))),
             6) AS contrib
FROM top1 t JOIN tf ON tf.{key} = t.{key} JOIN df USING (tok)
JOIN lens ON lens.{key} = t.{key}
ORDER BY term"""


def index_stats_sql(fields=("text", "lang", "source"), *,
                    src: str = "documents") -> str:
    """Index-stats oracle (ops/introspect.index_stats): per-field doc
    and token totals recomputed from raw text — a build invariant (any
    dropped or duplicated token breaks the equality)."""
    subs = []
    for f in sorted(fields):
        subs.append(
            f"SELECT '{f}' AS field, count(*) AS n_docs, "
            f"CAST(sum(coalesce(len(regexp_extract_all(lower({f}), "
            f"'[a-z0-9]+')), 0)) AS BIGINT) AS total_tokens FROM {src}")
    u = "\nUNION ALL\n".join(subs)
    return f"SELECT * FROM ({u}) ORDER BY field"


def mmr_rerank_sql(terms: tuple[str, ...], k: int, n_cand: int,
                   lam: float, k1: float = 1.2, b: float = 0.75, *,
                   src: str = "documents", key: str = "doc_id") -> str:
    """MMR oracle (ops/rerank.mmr_rerank): BM25 top-n_cand candidates
    (4dp rel), then the greedy MMR selection UNROLLED — one
    MATERIALIZED (mmr, pick, sel) CTE triple per round, each round's
    value ``ROUND(λ·rel − (1−λ)·max cos(v, selected), 6)`` with ties
    to the smaller id, exactly the engine's loop."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    oml = 1.0 - lam
    rounds = []
    for r in range(2, k + 1):
        rounds.append(f"""
mmr{r} AS MATERIALIZED (
  SELECT c.{key}, c.rel,
         ROUND({lam} * c.rel - {oml} * (
             SELECT max(list_cosine_similarity(c.v, e2.v))
             FROM sel{r - 1} s JOIN emb e2 ON e2.{key} = s.{key}),
               6) AS mmr
  FROM emb c
  WHERE c.{key} NOT IN (SELECT {key} FROM sel{r - 1})),
pick{r} AS MATERIALIZED (
  SELECT {key}, {r} AS rank, mmr FROM mmr{r}
  ORDER BY mmr DESC, {key} LIMIT 1),
sel{r} AS MATERIALIZED (
  SELECT * FROM sel{r - 1} UNION ALL SELECT * FROM pick{r})""")
    chain = ",".join(rounds)
    return f"""
WITH {_toks(src, key)},
nn AS (SELECT count(*) AS n FROM {src}),
ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) FROM nn) AS a
       FROM lens),
tf AS (SELECT {key}, tok, count(*) AS tf FROM toks
       WHERE tok IN ({toks_in}) GROUP BY {key}, tok),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
s AS (SELECT tf.{key},
             sum(ln(1.0 + ((SELECT n FROM nn) - df.df + 0.5)
                          / (df.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b}
                                    + {b} * lens.len / (SELECT a FROM ad)))
                 ) AS score
      FROM tf JOIN df USING (tok) JOIN lens USING ({key})
      GROUP BY tf.{key}),
cand AS MATERIALIZED (
  SELECT {key}, ROUND(score, 4) AS rel FROM s
  ORDER BY ROUND(score, 4) DESC, {key} LIMIT {n_cand}),
emb AS MATERIALIZED (
  SELECT c.{key}, c.rel, CAST(e.embedding AS DOUBLE[]) AS v
  FROM cand c JOIN embeddings e ON e.vec_id = c.{key}),
sel1 AS MATERIALIZED (
  SELECT {key}, 1 AS rank, ROUND({lam} * rel, 6) AS mmr FROM emb
  ORDER BY ROUND({lam} * rel, 6) DESC, {key} LIMIT 1),{chain}
SELECT CAST(rank AS BIGINT) AS rank, {key}, mmr FROM sel{k}
ORDER BY rank"""


def rag_search_sql(terms: tuple[str, ...], k: int, k_chunks: int,
                   size: int, stride: int, k1: float = 1.2,
                   b: float = 0.75, *, src: str = "documents",
                   key: str = "doc_id") -> str:
    """Chunked-retrieval oracle (ops/rag.rag_search): chunk windows,
    chunk-level Okapi BM25 (stats over CHUNKS: N = chunk count, df and
    avgdl per chunk), the k_chunks candidate cut ordered (rounded score
    desc, parent asc, chunk_idx asc), then per-parent best and the
    top-k parent cut — every tie order matching the engine's internal
    chunk-ordinal ranking by construction."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH t AS (SELECT {key}, regexp_extract_all(lower(text), '[a-z0-9]+')
                    AS toks
           FROM {src}),
st AS (SELECT {key}, toks, unnest(range(0, len(toks), {stride}))
                AS start FROM t),
c AS (SELECT {key}, CAST(start // {stride} AS BIGINT) AS chunk_idx,
             list_slice(toks, start + 1, start + {size}) AS ck
      FROM st WHERE start = 0 OR start + {size} - {stride} < len(toks)),
ct AS (SELECT {key}, chunk_idx, unnest(ck) AS tok FROM c),
clens AS (SELECT {key}, chunk_idx, len(ck) AS len FROM c),
nn AS (SELECT count(*) AS n FROM c),
ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) FROM nn) AS a
       FROM clens),
tf AS (SELECT {key}, chunk_idx, tok, count(*) AS tf FROM ct
       WHERE tok IN ({toks_in}) GROUP BY {key}, chunk_idx, tok),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
s AS (SELECT tf.{key}, tf.chunk_idx,
             sum(ln(1.0 + ((SELECT n FROM nn) - df.df + 0.5)
                          / (df.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b}
                                    + {b} * clens.len
                                          / (SELECT a FROM ad)))
                 ) AS score
      FROM tf JOIN df USING (tok)
      JOIN clens USING ({key}, chunk_idx)
      GROUP BY tf.{key}, tf.chunk_idx),
cand AS (SELECT {key}, chunk_idx, ROUND(score, 4) AS score FROM s
         ORDER BY ROUND(score, 4) DESC, {key}, chunk_idx
         LIMIT {k_chunks}),
best AS (SELECT {key}, chunk_idx, score,
                row_number() OVER (PARTITION BY {key}
                                   ORDER BY score DESC, chunk_idx)
                  AS rn
         FROM cand)
SELECT {key}, chunk_idx, score FROM best WHERE rn = 1
ORDER BY score DESC, {key} LIMIT {k}"""


def bm25_msearch_sql(queries, k: int, k1: float = 1.2, b: float = 0.75,
                     *, src: str = "documents",
                     key: str = "doc_id") -> str:
    """Multi-search oracle (ops/bm25.bm25_msearch): each batched query
    is its own bm25_topk_sql, tagged with its position and unioned."""
    subs = []
    for qid, terms in enumerate(queries):
        sub = bm25_topk_sql(tuple(terms), k, k1, b, src=src, key=key)
        subs.append(f"SELECT {qid} AS query_id, * FROM ({sub})")
    u = "\nUNION ALL\n".join(subs)
    return f"""
SELECT CAST(query_id AS BIGINT) AS query_id, {key}, score FROM ({u})
ORDER BY query_id, score DESC, {key}"""


def suggest_complete_sql(prefix: str, n: int, *, src: str = "documents",
                         key: str = "doc_id") -> str:
    """Completion-suggester oracle (ops/termdict.suggest_complete):
    top-n raw tokens with the prefix, by (document frequency desc,
    token asc) — df = docs containing the token, the dictionary's df."""
    return f"""
WITH {_toks(src, key)},
dt AS (SELECT DISTINCT {key}, tok FROM toks),
df AS (SELECT tok, count(*) AS df FROM dt
       WHERE tok LIKE '{prefix}%' GROUP BY tok)
SELECT tok AS token, df FROM df
ORDER BY df DESC, token LIMIT {n}"""


def bm25_boosting_sql(terms: tuple[str, ...], negative: tuple[str, ...],
                      negative_boost: float, k: int, k1: float = 1.2,
                      b: float = 0.75, *, src: str = "documents",
                      key: str = "doc_id") -> str:
    """Boosting-query oracle (ops/bm25_ext.bm25_boosting_topk): the
    positive terms' BM25 OR score, multiplied by ``negative_boost``
    for docs containing ANY negative term, rounded AFTER demotion."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    negs_in = ", ".join(f"'{t}'" for t in negative)
    return f"""
WITH {_toks(src, key)},
nn AS (SELECT count(*) AS n FROM {src}),
ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) FROM nn) AS a
       FROM lens),
tf AS (SELECT {key}, tok, count(*) AS tf FROM toks
       WHERE tok IN ({toks_in}) GROUP BY {key}, tok),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
neg AS (SELECT DISTINCT {key} FROM toks WHERE tok IN ({negs_in})),
s AS (SELECT tf.{key},
             sum(ln(1.0 + ((SELECT n FROM nn) - df.df + 0.5)
                          / (df.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b}
                                    + {b} * lens.len / (SELECT a FROM ad)))
                 ) AS score
      FROM tf JOIN df USING (tok) JOIN lens USING ({key})
      GROUP BY tf.{key}),
d AS (SELECT s.{key},
             s.score * (CASE WHEN s.{key} IN (SELECT {key} FROM neg)
                             THEN {negative_boost} ELSE 1.0 END) AS score
      FROM s)
SELECT {key}, ROUND(score, 4) AS score FROM d
ORDER BY ROUND(score, 4) DESC, {key} LIMIT {k}"""


def bm25_spannear_topk_sql(words: tuple[str, ...], slop: int, k: int,
                           k1: float = 1.2, b: float = 0.75, *,
                           src: str = "documents",
                           key: str = "doc_id") -> str:
    """Ordered span-near BM25 oracle (ops/bm25.bm25_spannear_topk):
    words in order with <= ``slop`` intervening tokens between adjacent
    words; tf = distinct start ordinals with a valid chain, expressed as
    the same right-to-left EXISTS chain the engine's DP runs (word i's
    ordinal is good iff a good word-i+1 ordinal lies in
    (ord, ord + 1 + slop]); df = docs with >= 1 start.  Same Okapi
    kernel and 4dp/(score desc, id) contract as bm25_phrase_topk_sql."""
    n = len(words)
    g = [f"g{n - 1} AS (SELECT {key}, ord FROM toks "
         f"WHERE tok = '{words[n - 1]}')"]
    for i in range(n - 2, -1, -1):
        g.append(
            f"g{i} AS (SELECT t.{key}, t.ord FROM toks t "
            f"WHERE t.tok = '{words[i]}' AND EXISTS ("
            f"SELECT 1 FROM g{i + 1} nx WHERE nx.{key} = t.{key} "
            f"AND nx.ord > t.ord AND nx.ord <= t.ord + {1 + int(slop)}))")
    chain = ",\n".join(g)
    return f"""
WITH {_toks(src, key)},
nn AS (SELECT count(*) AS n FROM {src}),
ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) FROM nn) AS a
       FROM lens),
{chain},
ph AS (SELECT {key}, count(*) AS tf FROM g0 GROUP BY {key}),
pdf AS (SELECT count(*) AS df FROM ph),
s AS (SELECT ph.{key},
             ln(1.0 + ((SELECT n FROM nn) - (SELECT df FROM pdf) + 0.5)
                      / ((SELECT df FROM pdf) + 0.5))
             * ph.tf * ({k1} + 1.0)
             / (ph.tf + {k1} * (1.0 - {b}
                                + {b} * lens.len / (SELECT a FROM ad)))
               AS score
      FROM ph JOIN lens USING ({key}))
SELECT {key}, ROUND(score, 4) AS score FROM s
ORDER BY ROUND(score, 4) DESC, {key} LIMIT {k}"""


def rerank_topk_sql(terms: tuple[str, ...], k_retrieve: int, k_final: int,
                    k1: float = 1.2, b: float = 0.75, *,
                    src: str = "documents", key: str = "doc_id") -> str:
    """Retrieve-then-rerank oracle (ops/rerank.py): the bm25_topk_sql
    candidate cut, then the lexical feature rerank
    (coverage*10 + tf_sum/len, 6dp) ordered (rerank desc, id)."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_toks(src, key)},
nn AS (SELECT count(*) AS n FROM {src}),
ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) FROM nn) AS a
       FROM lens),
tf AS (SELECT {key}, tok, count(*) AS tf FROM toks
       WHERE tok IN ({toks_in}) GROUP BY {key}, tok),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
s AS (SELECT tf.{key},
             sum(ln(1.0 + ((SELECT n FROM nn) - df.df + 0.5)
                          / (df.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b}
                                    + {b} * lens.len / (SELECT a FROM ad)))
                 ) AS score
      FROM tf JOIN df USING (tok) JOIN lens USING ({key})
      GROUP BY tf.{key}),
cand AS (SELECT {key} FROM s
         ORDER BY ROUND(score, 4) DESC, {key} LIMIT {k_retrieve}),
cov AS (SELECT {key}, count(DISTINCT tok) AS cov, count(*) AS tfsum
        FROM toks WHERE tok IN ({toks_in}) GROUP BY {key}),
r AS (SELECT cand.{key},
             ROUND(coalesce(cov.cov, 0) * 10.0
                   + coalesce(cov.tfsum, 0)
                     / CAST(lens.len AS DOUBLE), 6) AS rerank
      FROM cand LEFT JOIN cov USING ({key}) JOIN lens USING ({key}))
SELECT {key}, rerank FROM r ORDER BY rerank DESC, {key} LIMIT {k_final}"""


def bm25_synonyms_sql(groups: tuple[tuple[str, ...], ...], k: int,
                      k1: float = 1.2, b: float = 0.75, *,
                      src: str = "documents", key: str = "doc_id") -> str:
    """Synonym-blended BM25 oracle (ops/bm25_ext.bm25_synonyms_topk):
    each group scores as ONE pseudo-term — tf_g = Σ member tfs in the
    doc, df_g = docs where ANY member occurs (union), one idf from the
    union df — then the per-group Okapi kernels sum per doc.  Same 4dp /
    (rounded score desc, key asc) contract as bm25_topk_sql.  Group
    members must be their own stems' tokens on this corpus (the closed
    synthetic vocabulary guarantees token stats = stem stats)."""
    vals = ", ".join(f"('{t}', {gi})"
                     for gi, g in enumerate(groups) for t in g)
    return f"""
WITH {_toks(src, key)},
nn AS (SELECT count(*) AS n FROM {src}),
ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) FROM nn) AS a
       FROM lens),
g AS (SELECT * FROM (VALUES {vals}) AS v(tok, grp)),
tf AS (SELECT {key}, grp, count(*) AS tf FROM toks JOIN g USING (tok)
       GROUP BY {key}, grp),
df AS (SELECT grp, count(*) AS df FROM tf GROUP BY grp),
s AS (SELECT tf.{key},
             sum(ln(1.0 + ((SELECT n FROM nn) - df.df + 0.5)
                          / (df.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b}
                                    + {b} * lens.len / (SELECT a FROM ad)))
                 ) AS score
      FROM tf JOIN df USING (grp) JOIN lens USING ({key})
      GROUP BY tf.{key})
SELECT {key}, ROUND(score, 4) AS score FROM s
ORDER BY ROUND(score, 4) DESC, {key} LIMIT {k}"""


def bm25_value_boost_sql(terms: tuple[str, ...], k: int,
                         k1: float = 1.2, b: float = 0.75,
                         value_column: str = "n_chars",
                         lam: float = 0.001, *,
                         src: str = "documents",
                         key: str = "doc_id") -> str:
    """Function-score BM25 oracle (ops/bm25_ext.bm25_value_boost):
    the bm25_topk_sql score times the per-doc decay 1/(1 + λ·v), v the
    doc's stored ``value_column``; multiplied BEFORE the single 4dp
    rounding in the engine's operand order (f64 both sides)."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_toks(src, key)},
nn AS (SELECT count(*) AS n FROM {src}),
ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) FROM nn) AS a
       FROM lens),
tf AS (SELECT {key}, tok, count(*) AS tf FROM toks
       WHERE tok IN ({toks_in}) GROUP BY {key}, tok),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
s AS (SELECT tf.{key},
             sum(ln(1.0 + ((SELECT n FROM nn) - df.df + 0.5)
                          / (df.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b}
                                    + {b} * lens.len / (SELECT a FROM ad)))
                 ) AS score
      FROM tf JOIN df USING (tok) JOIN lens USING ({key})
      GROUP BY tf.{key}),
bs AS (SELECT s.{key},
              ROUND(s.score * (1.0 / (1.0 + {lam}
                    * CAST(d.{value_column} AS DOUBLE))), 4) AS score
       FROM s JOIN {src} d USING ({key}))
SELECT {key}, score FROM bs
ORDER BY score DESC, {key} LIMIT {k}"""


def bm25_decay_sql(terms: tuple[str, ...], k: int,
                   k1: float = 1.2, b: float = 0.75,
                   value_column: str = "n_chars",
                   origin: float = 300.0, offset: float = 50.0,
                   scale: float = 150.0, *, src: str = "documents",
                   key: str = "doc_id") -> str:
    """Gauss-decay function-score oracle (ops/bm25_ext.bm25_decay):
    bm25 × 0.5^((max(0, |v−origin|−offset)/scale)²), multiplied BEFORE
    the single 4dp rounding in the engine's operand order."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    mult = (f"power(0.5, pow(greatest(abs(CAST(d.{value_column} AS DOUBLE)"
            f" - {origin}) - {offset}, 0.0) / {scale}, 2))")
    return f"""
WITH {_toks(src, key)},
nn AS (SELECT count(*) AS n FROM {src}),
ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) FROM nn) AS a
       FROM lens),
tf AS (SELECT {key}, tok, count(*) AS tf FROM toks
       WHERE tok IN ({toks_in}) GROUP BY {key}, tok),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
s AS (SELECT tf.{key},
             sum(ln(1.0 + ((SELECT n FROM nn) - df.df + 0.5)
                          / (df.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b}
                                    + {b} * lens.len / (SELECT a FROM ad)))
                 ) AS score
      FROM tf JOIN df USING (tok) JOIN lens USING ({key})
      GROUP BY tf.{key}),
bs AS (SELECT s.{key}, ROUND(s.score * {mult}, 4) AS score
       FROM s JOIN {src} d USING ({key}))
SELECT {key}, score FROM bs
ORDER BY score DESC, {key} LIMIT {k}"""


def rank_eval_sql(queries=((("merge", "scan"), "row"),
                           (("row", "group"), "merge"),
                           (("sort", "filter"), "join")),
                  k: int = 50, k1: float = 1.2, b: float = 0.75, *,
                  src: str = "documents", key: str = "doc_id") -> str:
    """Rank-eval oracle (ops/rank_eval.rank_eval): per query, BM25
    top-k under (rounded score desc, id asc) scored against the
    conjunctive (ALL query terms + the held-out intent term) relevance
    labels — precision@k, recall@k, binary-gain NDCG@k, 4dp."""
    blocks, selects = [], []
    for qi, (terms, intent) in enumerate(queries):
        toks_in = ", ".join(f"'{t}'" for t in terms)
        inter = "\n        INTERSECT\n        ".join(
            f"SELECT DISTINCT {key} FROM toks WHERE tok = '{t}'"
            for t in (*terms, intent))
        blocks.append(f"""
tf{qi} AS (SELECT {key}, tok, count(*) AS tf FROM toks
       WHERE tok IN ({toks_in}) GROUP BY {key}, tok),
df{qi} AS (SELECT tok, count(*) AS df FROM tf{qi} GROUP BY tok),
s{qi} AS (SELECT t.{key},
             sum(ln(1.0 + ((SELECT n FROM nn) - d.df + 0.5)
                          / (d.df + 0.5))
                 * t.tf * ({k1} + 1.0)
                 / (t.tf + {k1} * (1.0 - {b}
                                   + {b} * lens.len / (SELECT a FROM ad)))
                 ) AS score
      FROM tf{qi} t JOIN df{qi} d USING (tok) JOIN lens USING ({key})
      GROUP BY t.{key}),
top{qi} AS (SELECT {key}, row_number() OVER (
               ORDER BY ROUND(score, 4) DESC, {key}) AS rnk
            FROM s{qi}
            ORDER BY ROUND(score, 4) DESC, {key} LIMIT {k}),
rel{qi} AS ({inter}),
m{qi} AS (SELECT
    (SELECT count(*) FROM rel{qi}) AS n_rel,
    (SELECT count(*) FROM top{qi} JOIN rel{qi} USING ({key})) AS hits,
    (SELECT coalesce(sum(1.0 / log2(rnk + 1.0)), 0.0)
     FROM top{qi} JOIN rel{qi} USING ({key})) AS dcg)""")
        selects.append(f"""
SELECT {qi} AS query_id, CAST(n_rel AS BIGINT) AS n_rel,
       ROUND(hits / {float(k)}, 4) AS p_at_k,
       ROUND(CASE WHEN n_rel = 0 THEN 0.0
             ELSE hits / CAST(n_rel AS DOUBLE) END, 4) AS recall_at_k,
       ROUND(CASE WHEN n_rel = 0 THEN 0.0 ELSE dcg /
             (SELECT idcg FROM ig WHERE i = least(n_rel, {k})) END, 4)
           AS ndcg_at_k
FROM m{qi}""")
    return (f"WITH {_toks(src, key)},\n"
            + "nn AS (SELECT count(*) AS n FROM " + src + "),\n"
            + "ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) "
              "FROM nn) AS a FROM lens),\n"
            + "ig AS (SELECT i, sum(1.0 / log2(i + 1.0)) "
              f"OVER (ORDER BY i) AS idcg FROM generate_series(1, {k})"
              " t(i)),"
            + ",".join(blocks)
            + "\nUNION ALL".join(selects)
            + "\nORDER BY query_id")


def split_bm25_sql(terms: tuple[str, ...] = ("merge", "scan"),
                   k: int = 20,
                   sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Oracle for the split-index query (build/merge.split_index): the
    first of 3 doc-range splits is a standalone index with SLICE-LOCAL
    statistics, so the oracle is plain BM25 over the doc_id slice (the
    split's stats were recomputed exactly from the kept postings)."""
    import math

    import pyarrow.parquet as pq_

    n = pq_.read_metadata(
        f"{sf_dir.rstrip('/')}/documents.parquet").num_rows
    span = math.ceil(n / 3)
    return bm25_topk_sql(
        terms, k, 1.2, 0.75,
        src=f"(SELECT * FROM documents WHERE doc_id < {span})")


def collapse_topk_sql(terms: tuple[str, ...], collapse_field: str, k: int,
                      k1: float = 1.2, b: float = 0.75, *,
                      src: str = "documents", key: str = "doc_id") -> str:
    """Field-collapsing oracle (ops/aggs.collapse_topk): the bm25
    score per doc, then the single best doc per ``collapse_field``
    value under (rounded score desc, id asc), top-k of the winners."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_toks(src, key)},
nn AS (SELECT count(*) AS n FROM {src}),
ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) FROM nn) AS a
       FROM lens),
tf AS (SELECT {key}, tok, count(*) AS tf FROM toks
       WHERE tok IN ({toks_in}) GROUP BY {key}, tok),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
s AS (SELECT tf.{key},
             sum(ln(1.0 + ((SELECT n FROM nn) - df.df + 0.5)
                          / (df.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b}
                                    + {b} * lens.len / (SELECT a FROM ad)))
                 ) AS score
      FROM tf JOIN df USING (tok) JOIN lens USING ({key})
      GROUP BY tf.{key}),
w AS (SELECT d.{collapse_field} AS key, s.{key} AS {key},
             ROUND(s.score, 4) AS score,
             row_number() OVER (PARTITION BY d.{collapse_field}
                 ORDER BY ROUND(s.score, 4) DESC, s.{key}) AS rn
      FROM s JOIN {src} d USING ({key}))
SELECT key, {key}, score FROM w WHERE rn = 1
ORDER BY score DESC, {key} LIMIT {k}"""


def top_hits_sql(terms: tuple[str, ...], group_field: str, per: int,
                 k_groups: int, k1: float = 1.2, b: float = 0.75, *,
                 src: str = "documents", key: str = "doc_id") -> str:
    """Top-hits oracle (ops/aggs.top_hits): the bm25 score per doc,
    the top-``per`` hits per ``group_field`` value under (rounded
    score desc, id asc), ``k_groups`` groups kept ordered by their
    best hit (desc, key asc), hits within a group by rank."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_toks(src, key)},
nn AS (SELECT count(*) AS n FROM {src}),
ad AS (SELECT sum(len) / (SELECT CAST(n AS DOUBLE) FROM nn) AS a
       FROM lens),
tf AS (SELECT {key}, tok, count(*) AS tf FROM toks
       WHERE tok IN ({toks_in}) GROUP BY {key}, tok),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
s AS (SELECT tf.{key},
             sum(ln(1.0 + ((SELECT n FROM nn) - df.df + 0.5)
                          / (df.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b}
                                    + {b} * lens.len / (SELECT a FROM ad)))
                 ) AS score
      FROM tf JOIN df USING (tok) JOIN lens USING ({key})
      GROUP BY tf.{key}),
h AS (SELECT d.{group_field} AS key, s.{key} AS {key},
             ROUND(s.score, 4) AS score,
             row_number() OVER (PARTITION BY d.{group_field}
                 ORDER BY ROUND(s.score, 4) DESC, s.{key}) AS hit_rank
      FROM s JOIN {src} d USING ({key})),
hp AS (SELECT * FROM h WHERE hit_rank <= {per}),
g AS (SELECT key, max(score) AS best FROM hp GROUP BY key
      ORDER BY best DESC, key LIMIT {k_groups})
SELECT hp.key, CAST(hp.hit_rank AS BIGINT) AS hit_rank,
       hp.{key} AS doc_id, hp.score
FROM hp JOIN g USING (key)
ORDER BY g.best DESC, hp.key, hp.hit_rank"""


def histogram_facet_sql(terms: tuple[str, ...], value_column: str,
                        interval: int, *, src: str = "documents",
                        key: str = "doc_id") -> str:
    """Histogram-facet oracle (ops/aggs.histogram_facet): matched-doc
    (ANY query term) counts per floor(v/interval)*interval bucket."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_toks(src, key)},
m AS (SELECT DISTINCT {key} FROM toks WHERE tok IN ({toks_in}))
SELECT CAST(floor(d.{value_column} / {interval}) * {interval} AS BIGINT)
           AS bucket,
       count(*) AS n
FROM {src} d JOIN m USING ({key})
GROUP BY bucket ORDER BY bucket"""


def terms_facet_sql(terms: tuple[str, ...], group_field: str,
                    top_n: int, *, src: str = "documents",
                    key: str = "doc_id") -> str:
    """Terms-facet oracle (ops/aggs.terms_facet): matched-doc (ANY
    query term) counts per ``group_field`` value, top buckets by
    (count desc, key asc)."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_toks(src, key)},
m AS (SELECT DISTINCT {key} FROM toks WHERE tok IN ({toks_in}))
SELECT CAST(d.{group_field} AS VARCHAR) AS key, count(*) AS n
FROM {src} d JOIN m USING ({key})
GROUP BY key ORDER BY n DESC, key LIMIT {top_n}"""


def composite_agg_sql(terms: tuple[str, ...], group_field: str,
                      value_column: str, interval: int, size: int,
                      after: tuple | None, *, src: str = "documents",
                      key: str = "doc_id") -> str:
    """Composite-aggregation oracle (ops/aggs.composite_agg): paginated
    terms × histogram buckets over the matched set, composite key
    ascending, strictly after the exclusive ``after`` cursor."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    cursor = ""
    if after is not None:
        a_key, a_bucket = after
        cursor = (f"WHERE key > '{a_key}' "
                  f"OR (key = '{a_key}' AND bucket > {a_bucket})")
    return f"""
WITH {_toks(src, key)},
m AS (SELECT DISTINCT {key} FROM toks WHERE tok IN ({toks_in})),
b AS (SELECT CAST(d.{group_field} AS VARCHAR) AS key,
             CAST(floor(d.{value_column} / {interval}) * {interval}
                  AS BIGINT) AS bucket,
             count(*) AS n
      FROM {src} d JOIN m USING ({key})
      GROUP BY 1, 2)
SELECT key, bucket, n FROM b {cursor}
ORDER BY key, bucket LIMIT {size}"""


def cardinality_agg_sql(terms: tuple[str, ...], value_field: str, *,
                        src: str = "documents",
                        key: str = "doc_id") -> str:
    """Cardinality oracle (ops/aggs.cardinality_agg): exact distinct
    ``value_field`` count over the matched set."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_toks(src, key)},
m AS (SELECT DISTINCT {key} FROM toks WHERE tok IN ({toks_in}))
SELECT count(DISTINCT d.{value_field}) AS n_distinct
FROM {src} d JOIN m USING ({key})"""


def percentiles_agg_sql(terms: tuple[str, ...], value_column: str,
                        percentiles: tuple[int, ...], *,
                        src: str = "documents",
                        key: str = "doc_id") -> str:
    """Percentiles oracle (ops/aggs.percentiles_agg): PERCENTILE_DISC
    over the matched set's integer field, expressed as the all-integer
    running-sum inequality cum*100 >= p*n (no float thresholds)."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    pvals = ", ".join(f"({int(p)})" for p in percentiles)
    return f"""
WITH {_toks(src, key)},
m AS (SELECT DISTINCT {key} FROM toks WHERE tok IN ({toks_in})),
v AS (SELECT d.{value_column} AS val FROM {src} d JOIN m USING ({key})),
rc AS (SELECT val, count(*) AS c FROM v GROUP BY val),
cw AS (SELECT val, sum(c) OVER (ORDER BY val) AS cum FROM rc),
nn AS (SELECT count(*) AS n FROM v),
pp AS (SELECT * FROM (VALUES {pvals}) AS t(p))
SELECT CAST(pp.p AS BIGINT) AS p, CAST(min(cw.val) AS BIGINT) AS value
FROM pp, cw, nn WHERE cw.cum * 100 >= pp.p * nn.n
GROUP BY pp.p ORDER BY p"""


def significant_terms_sql(terms: tuple[str, ...], top_n: int, *,
                          src: str = "documents",
                          key: str = "doc_id") -> str:
    """Significant-terms oracle (ops/aggs.significant_terms): per-term
    KL contribution (fg_df/fg_n)·ln((fg_df/fg_n)/(bg_df/N)) over the
    query's matched set, 6dp, query terms excluded, (score desc,
    term asc)."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_toks(src, key)},
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM {src}),
fg AS (SELECT DISTINCT {key} FROM toks WHERE tok IN ({toks_in})),
fgn AS (SELECT CAST(count(*) AS DOUBLE) AS fn FROM fg),
bg AS (SELECT tok, count(DISTINCT {key}) AS bg_df FROM toks GROUP BY tok),
fd AS (SELECT tok, count(DISTINCT t.{key}) AS fg_df
       FROM toks t JOIN fg USING ({key}) GROUP BY tok)
SELECT fd.tok AS term, fd.fg_df, bg.bg_df,
       ROUND((fd.fg_df / (SELECT fn FROM fgn))
             * ln((fd.fg_df / (SELECT fn FROM fgn))
                  / (bg.bg_df / (SELECT n FROM nn))), 6) AS score
FROM fd JOIN bg USING (tok)
WHERE fd.tok NOT IN ({toks_in})
ORDER BY score DESC, term LIMIT {top_n}"""


def extended_stats_sql(terms: tuple[str, ...], value_column: str, *,
                       src: str = "documents",
                       key: str = "doc_id") -> str:
    """Extended-stats oracle (ops/aggs.extended_stats): integer moments
    over the matched set, floats derived in the engine's exact operand
    order (avg = Σv/n; var = Σv²/n − avg·avg), 4dp."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    mean = "CAST(sum(v) AS DOUBLE) / count(*)"
    var = f"CAST(sum(v * v) AS DOUBLE) / count(*) - ({mean}) * ({mean})"
    return f"""
WITH {_toks(src, key)},
m AS (SELECT DISTINCT {key} FROM toks WHERE tok IN ({toks_in})),
vv AS (SELECT CAST(d.{value_column} AS BIGINT) AS v
       FROM {src} d JOIN m USING ({key}))
SELECT count(*) AS n, CAST(min(v) AS BIGINT) AS lo,
       CAST(max(v) AS BIGINT) AS hi, CAST(sum(v) AS BIGINT) AS total,
       round({mean}, 4) AS mean, round({var}, 4) AS variance,
       round(sqrt({var}), 4) AS std_dev
FROM vv"""


def rare_terms_sql(terms: tuple[str, ...], max_doc_count,
                   top_n: int, *, src: str = "documents",
                   key: str = "doc_id") -> str:
    """Rare-terms oracle (ops/aggs.rare_terms): matched-set vocabulary
    with doc count ≤ max_doc_count, (count asc, term asc), query terms
    excluded."""
    toks_in = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_toks(src, key)},
fg AS (SELECT DISTINCT {key} FROM toks WHERE tok IN ({toks_in})),
fd AS (SELECT tok, count(DISTINCT t.{key}) AS n
       FROM toks t JOIN fg USING ({key}) GROUP BY tok)
SELECT tok AS term, CAST(n AS BIGINT) AS n FROM fd
WHERE n <= {max_doc_count} AND tok NOT IN ({toks_in})
ORDER BY n, term LIMIT {top_n}"""


def percolate_sql(qspec, *, src: str = "documents",
                  key: str = "doc_id") -> str:
    """Percolator oracle (ops/percolate.py): (doc, query) pairs where
    the doc contains >= m distinct terms of the registered query.
    Unanalyzed surface-token matching — the engine hashes raw tokens."""
    qvals = ", ".join(f"({qid}, '{t}')"
                      for qid, (terms, _) in enumerate(qspec)
                      for t in sorted(set(terms)))
    mvals = ", ".join(f"({qid}, {int(m)})"
                      for qid, (_, m) in enumerate(qspec))
    return f"""
WITH {_toks(src, key)},
q AS (SELECT * FROM (VALUES {qvals}) AS v(qid, tok)),
qm AS (SELECT * FROM (VALUES {mvals}) AS v(qid, m)),
dt AS (SELECT DISTINCT {key}, tok FROM toks),
hit AS (SELECT dt.{key}, q.qid, count(*) AS c
        FROM dt JOIN q USING (tok) GROUP BY dt.{key}, q.qid)
SELECT hit.{key}, CAST(hit.qid AS BIGINT) AS query_id
FROM hit JOIN qm USING (qid) WHERE hit.c >= qm.m
ORDER BY hit.{key}, query_id"""
