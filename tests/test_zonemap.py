"""Zone-map pruning for RangeQ: the columnar analogue of the reference's
f/T/F/N value keyspace (/root/reference/src/key_builder.rs:163-188).
Partitions whose Parquet footer min/max rule out the range must not be
read at all; results stay identical to the unpruned scan."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "tool": pa.array([None] * len(rows), pa.string()),
        "ts": pa.array(range(len(rows)), pa.timestamp("us")),
    })
    p = os.path.join(dirpath, name)
    pq.write_table(t, p)
    return p


@pytest.fixture()
def banded_index(ray_session, tmp_path):
    """4 input files with disjoint turn_idx bands (i*100 .. i*100+4)."""
    from noise_ray.build import build_index

    files = []
    for i in range(4):
        rows = [(f"c{i:02d}", i * 100 + j, "user", f"band {i} word{j}")
                for j in range(5)]
        files.append(_write(str(tmp_path / "in"), f"f{i}.parquet", rows))
    idx = str(tmp_path / "idx")
    build_index(files, idx, fields=("role", "text", "tool"),
                key_columns=("conv_id", "turn_idx"),
                docs_per_ingest_task=5)
    return idx


def test_zone_map_prunes_unmatched_partitions(banded_index, monkeypatch):
    from noise_ray.query import IndexReader, run_query

    reader = IndexReader(banded_index)
    assert len(reader._docmap) >= 4, "fixture must span multiple partitions"

    reads = []
    orig = pq.read_table

    def spy(path, *a, **k):
        reads.append(str(path))
        return orig(path, *a, **k)

    monkeypatch.setattr(pq, "read_table", spy)
    t = run_query(reader, "find {turn_idx: >= 250} return ._id ;")
    got = sorted(zip(t.column("conv_id").to_pylist(),
                     t.column("turn_idx").to_pylist()))
    # only band 3 (300..304) satisfies turn_idx >= 250
    assert got == [("c03", v) for v in range(300, 305)]

    docmap_paths = {dm["path"] for dm in reader._docmap}
    touched = docmap_paths & set(reads)
    # zones: only the band-3 partition can satisfy turn_idx >= 250
    should_touch = set()
    for dm in reader._docmap:
        vmin, vmax, nulls, rows = reader.docmap_zone(dm["path"], "turn_idx")
        assert vmin is not None and rows > 0
        if vmax >= 250:
            should_touch.add(dm["path"])
    assert touched <= should_touch
    assert len(should_touch) < len(docmap_paths)


def test_zone_map_pruning_preserves_results(banded_index, monkeypatch):
    from noise_ray.query import IndexReader, run_query
    from noise_ray.query.engine import CompiledQuery

    q = "find {turn_idx: > 101, turn_idx: <= 302} return ._id ;"
    pruned = run_query(IndexReader(banded_index), q)
    monkeypatch.setattr(CompiledQuery, "_zone_prunes",
                        staticmethod(lambda reader, path, node: False))
    unpruned = run_query(IndexReader(banded_index), q)
    assert pruned.equals(unpruned)
    assert pruned.num_rows == 11  # 102..104, 200..204, 300..302


def test_zone_map_null_and_bool_semantics(ray_session, tmp_path):
    """Null/bool specials prune on null_count / bool min-max zones."""
    from noise_ray.query.reader import IndexReader, _zone_value

    assert _zone_value(True) is True and _zone_value(False) is False
    assert _zone_value(3) == 3.0 and _zone_value(2.5) == 2.5
    import datetime

    us = _zone_value(datetime.datetime(2001, 1, 1, 0, 0, 0))
    assert us == float(978307200 * 10**6)
    assert _zone_value(datetime.date(1970, 1, 11)) == 10.0
    assert _zone_value("strings-have-no-numeric-zone") is None


def test_tool_null_zone(banded_index):
    """`tool` is all-null in the fixture: a ==null range must match every
    doc without being prunable, and numeric ranges on it prune fully."""
    from noise_ray.query import IndexReader, run_query

    reader = IndexReader(banded_index)
    t = run_query(reader, "find {tool: == null} ;")
    assert t.num_rows == 20
    for dm in reader._docmap:
        vmin, vmax, nulls, rows = reader.docmap_zone(dm["path"], "tool")
        assert nulls == rows and rows > 0
