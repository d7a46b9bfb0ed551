"""Synthetic documents-corpus generator: schema parity with the
testdata table, partition-independence, and the injected duplicate
structure the dedup operators rely on."""

import pyarrow.parquet as pq


def test_schema_matches_testdata(tmp_path):
    from noise_ray.sources import generate_documents

    root = generate_documents(str(tmp_path / "a"), 300, num_files=3)
    got = pq.read_table(f"{root}/documents.parquet")
    want = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    assert got.schema.names == want.schema.names
    assert [f.type for f in got.schema] == [want.schema.field(n).type
                                            for n in got.schema.names]
    assert got.num_rows == 300
    assert got.column("doc_id").to_pylist() == list(range(300))


def test_content_independent_of_num_files(tmp_path):
    from noise_ray.sources import generate_documents

    a = generate_documents(str(tmp_path / "a"), 250, num_files=2)
    b = generate_documents(str(tmp_path / "b"), 250, num_files=7)
    ta = pq.read_table(f"{a}/documents.parquet").sort_by("doc_id")
    tb = pq.read_table(f"{b}/documents.parquet").sort_by("doc_id")
    assert ta.equals(tb)


def test_duplicate_structure(tmp_path):
    from noise_ray.sources import generate_documents

    root = generate_documents(str(tmp_path / "a"), 300, num_files=2)
    t = pq.read_table(f"{root}/documents.parquet").sort_by("doc_id")
    txt = t.column("text").to_pylist()
    for base in (0, 100, 200):
        assert txt[base + 7] == txt[base + 8]          # exact dup
        assert txt[base + 9] == txt[base + 7] + " appended"  # near dup
    # n_chars consistent with text
    nc = t.column("n_chars").to_pylist()
    assert all(len(s) == c for s, c in zip(txt, nc))
    # langs/sources drawn from the testdata's value sets
    assert set(t.column("lang").to_pylist()) <= {"en", "de", "fr", "es", "zh"}
    assert {s[:3] for s in t.column("source").to_pylist()} == {"src"}


def test_embeddings_generator(tmp_path):
    import numpy as np

    from noise_ray.sources import generate_embeddings

    a = generate_embeddings(str(tmp_path / "a"), 200, num_files=2)
    b = generate_embeddings(str(tmp_path / "b"), 200, num_files=5)
    ta = pq.read_table(f"{a}/embeddings.parquet").sort_by("vec_id")
    tb = pq.read_table(f"{b}/embeddings.parquet").sort_by("vec_id")
    assert ta.equals(tb)
    want = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    assert ta.schema.names == want.schema.names
    assert [f.type for f in ta.schema] == [want.schema.field(n).type
                                           for n in ta.schema.names]
    # cluster structure: same-label vectors are closer than cross-label
    vecs = np.array(ta.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.array(ta.column("label").to_pylist())
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ vn.T
    same = sims[labels[:, None] == labels[None, :]].mean()
    diff = sims[labels[:, None] != labels[None, :]].mean()
    assert same > diff + 0.3
