"""ops.highlight: positions + snippet rendering of scored hits."""

import numpy as np

from noise_ray.ops.highlight import search_highlight

SF = "/root/testdata/sf0.001"


def test_positions_match_text(ray_session):
    """Every reported position indexes an occurrence of the term in the
    doc's token stream, and the snippet is the +-2 window around it."""
    import duckdb

    out = search_highlight(SF, term="merge", k=10, ctx=2).to_pandas()
    assert len(out) > 0
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'").df()
    by_id = dict(zip(texts.doc_id, texts.text))
    import re

    for _, r in out.iterrows():
        toks = re.findall(r"[a-z0-9]+", by_id[r.doc_id].lower())
        p = int(r.pos)
        assert toks[p] == "merge"
        assert r.snippet == " ".join(toks[max(0, p - 2): p + 3])


def test_scores_match_term_topk(ray_session):
    """Highlight rows carry the same 4dp scores as the scored term query
    over the same index."""
    from noise_ray.pipelines import documents_index, search

    out = search_highlight(SF, term="merge", k=10).to_pandas()
    top = search(
        documents_index(SF),
        'find {text: ~="merge"} order score() desc, .doc_id asc '
        "return score() limit 10 ;")
    want = dict(zip(top.column("doc_id").to_pylist(),
                    np.round(np.asarray(top.column("score"), np.float64),
                             4)))
    got = out.groupby("doc_id").score.first()
    assert set(got.index) == set(want)
    for did, sc in got.items():
        assert sc == want[did]
    # every top doc appears, with tf occurrences each
    assert (out.groupby("doc_id").size() >= 1).all()
