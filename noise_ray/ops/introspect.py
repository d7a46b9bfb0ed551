"""Introspection surfaces: score explanation and index statistics.

- **explain_score** (cf. Elasticsearch ``_explain`` / Lucene
  ``Explanation``): the per-term breakdown of the BM25 top-1 document's
  score for a query — tf, df, idf and the Okapi contribution per
  matching term, everything the engine's kernel actually used.  All
  components are reread from the index artifacts (postings for tf/df/dl,
  stats sidecar for N/avgdl), so the explanation IS an audit of the
  index, not a recomputation from raw text; the DuckDB oracle
  (ops/score_oracle.explain_score_sql) recomputes the same numbers from
  the raw corpus and must agree to 6dp.

- **index_stats** (cf. ``_cat/indices``): per-field document and token
  totals straight off the manifest (`field_k`) and the stats sidecar —
  metadata-sized reads, no posting payloads.  Oracled against raw-text
  recomputation, which makes it a cheap end-to-end invariant: if any
  build stage dropped or duplicated tokens, this surface disagrees.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .bm25 import _field_total_tokens, bm25_topk


def explain_score(sf_dir: str, terms=("merge", "scan"), k1: float = 1.2,
                  b: float = 0.75, field: str = "text", *,
                  index_dir: str | None = None) -> pa.Table:
    """Per-term score breakdown for the query's BM25 top-1 doc (module
    docstring).  Returns (doc_id, term, tf, df, idf, contrib) for each
    matching query term, ordered by term; idf/contrib rounded to 6dp;
    ``term`` is the surface form passed in (its stem is what the index
    stores)."""
    from ..query.engine import _stem_one
    from ..pipelines import documents_index

    if index_dir is not None:
        from ..query.distributed import _cached_reader

        reader = _cached_reader(index_dir)
    else:
        reader = documents_index(sf_dir)
    top = bm25_topk(sf_dir, tuple(terms), k=1, k1=k1, b=b, field=field,
                    index_dir=index_dir)
    if not top.num_rows:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "term": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64()),
                         "df": pa.array([], pa.int64()),
                         "idf": pa.array([], pa.float64()),
                         "contrib": pa.array([], pa.float64())})
    doc = int(top.column("doc_id")[0].as_py())
    n_docs = float(reader.num_docs)
    fid = reader.field_id[field]
    avgdl = _field_total_tokens(reader, fid) / n_docs
    out_t, out_tf, out_df, out_idf, out_c = [], [], [], [], []
    for t in sorted(dict.fromkeys(terms)):
        pl = reader.postings(fid, _stem_one(t), need_positions=False)
        if pl is None or not pl.docs.size:
            continue
        i = int(np.searchsorted(pl.docs, doc))
        if i >= pl.docs.size or int(pl.docs[i]) != doc:
            continue
        tf = float(pl.tfs[i])
        dl = float(pl.lens[i])
        df = float(np.unique(pl.docs).size)
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        contrib = (idf * tf * (k1 + 1.0)
                   / (tf + k1 * (1.0 - b + b * dl / avgdl)))
        out_t.append(t)
        out_tf.append(int(tf))
        out_df.append(int(df))
        out_idf.append(round(idf, 6))
        out_c.append(round(contrib, 6))
    return pa.table({"doc_id": pa.array([doc] * len(out_t), pa.int64()),
                     "term": pa.array(out_t, pa.string()),
                     "tf": pa.array(out_tf, pa.int64()),
                     "df": pa.array(out_df, pa.int64()),
                     "idf": pa.array(out_idf, pa.float64()),
                     "contrib": pa.array(out_c, pa.float64())})


def index_stats(sf_dir: str, fields=("text", "lang", "source"), *,
                index_dir: str | None = None) -> pa.Table:
    """(field, n_docs, total_tokens) per indexed field, off manifest +
    stats sidecar (module docstring)."""
    from ..pipelines import documents_index

    if index_dir is not None:
        from ..query.distributed import _cached_reader

        reader = _cached_reader(index_dir)
    else:
        reader = documents_index(sf_dir)
    out_f, out_n, out_tok = [], [], []
    for f in sorted(fields):
        fid = reader.field_id[f]
        out_f.append(f)
        out_n.append(int(reader.num_docs))
        out_tok.append(int(_field_total_tokens(reader, fid)))
    return pa.table({"field": pa.array(out_f, pa.string()),
                     "n_docs": pa.array(out_n, pa.int64()),
                     "total_tokens": pa.array(out_tok, pa.int64())})
