"""REPL line-protocol test, modeled on the reference's golden-script
harness (/root/reference/tests/repl_tests.rs:10-71): feed `;`-terminated
statements, compare full output."""

import io
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _write_corpus(path: str):
    t = pa.table({
        "conv_id": pa.array(["a", "a", "b"]),
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "role": pa.array(["user", "assistant", "user"]),
        "text": pa.array(["quick brown fox", "lazy dog", "quick dog"]),
        "tool": pa.array([None, None, None], pa.string()),
        "ts": pa.array([0, 1, 2], pa.timestamp("us")),
    })
    pq.write_table(t, path)


def test_repl_lifecycle(ray_session, tmp_path):
    from noise_ray.repl import run

    corpus = str(tmp_path / "docs.parquet")
    _write_corpus(corpus)
    idx = str(tmp_path / "idx")
    script = f"""
create {idx} ;
add {corpus} ;
commit ;
find {{text: ~="quick"}} return ._id ;
params {{"r": "assistant"}} ;
find {{role: ==@r}} return ._id ;
find {{role: =="user"}} return {{n: count()}} ;
unknowncmd ;
exit ;
"""
    out = io.StringIO()
    run(io.StringIO(script), out, interactive=False)
    lines = out.getvalue().strip().splitlines()
    assert lines[0] == "staged 1 file(s), 1 pending"
    assert lines[1].startswith("committed 3 docs")
    # quick matches docs 0 and 2 (sorted by (conv_id, turn_idx))
    ids = [eval(l)["doc_id"] for l in lines[2:4]]
    assert ids == [0, 2]
    assert eval(lines[4])["doc_id"] == 1          # @r = assistant
    assert eval(lines[5])["n"] == 2.0             # grouped count
    assert lines[6] == "Unknown command: unknowncmd"


def test_repl_reopen(ray_session, tmp_path):
    from noise_ray.repl import run

    corpus = str(tmp_path / "docs.parquet")
    _write_corpus(corpus)
    idx = str(tmp_path / "idx2")
    out = io.StringIO()
    run(io.StringIO(f"create {idx} ; add {corpus} ; commit ; exit ;"),
        out, interactive=False)
    out2 = io.StringIO()
    run(io.StringIO(f'open {idx} ; find {{text: ~="dog"}} return ._id ;'),
        out2, interactive=False)
    ids = [eval(l)["doc_id"] for l in out2.getvalue().strip().splitlines()]
    assert ids == [1, 2]


def test_repl_nested_workflow(ray_session, tmp_path):
    """`fields json` switches the CLI to the nested build: JSONL docs in,
    keypath finds out, second commit becomes an epoch add."""
    import io
    import json as _json

    from noise_ray.repl import Repl

    d = str(tmp_path)
    with open(f"{d}/docs.jsonl", "w") as f:
        f.write(_json.dumps({"_id": "1", "msgs": [{"t": "quick fox"}]}) + "\n")
        f.write(_json.dumps({"_id": "2", "msgs": [{"t": "lazy dog"}]}) + "\n")
    with open(f"{d}/more.jsonl", "w") as f:
        f.write(_json.dumps({"_id": "3", "msgs": [{"t": "brown fox"}]}) + "\n")
    out = io.StringIO()
    r = Repl(out)
    for stmt in (f"create {d}/idx", "fields json", f"add {d}/docs.jsonl",
                 "commit", 'find {msgs: [{t: ~="fox"}]} return ._id'):
        r.execute(stmt)
    assert '"1"' in out.getvalue()
    out2 = io.StringIO()
    r.out = out2
    for stmt in (f"add {d}/more.jsonl", "commit",
                 'find {msgs: [{t: ~="fox"}]} return ._id'):
        r.execute(stmt)
    lines = out2.getvalue().splitlines()
    assert "epoch at seq 2" in lines[1]
    assert lines[-2:] == ['"1"', '"3"']


def test_repl_nested_del_compact(ray_session, tmp_path):
    """Main-CLI lifecycle on a NESTED index: del by _id hides the doc,
    compact folds tombstones+epochs into a fresh dense base."""
    import io
    import json
    import os

    from noise_ray.repl import Repl

    docs = [{"_id": f"n{i}", "tags": ["fox" if i % 2 else "dog"],
             "k": i} for i in range(6)]
    src = os.path.join(str(tmp_path), "in.jsonl")
    with open(src, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    out = io.StringIO()
    r = Repl(out)
    idx = os.path.join(str(tmp_path), "idx")
    for line in (f"create {idx}", "fields json", f"add {src}", "commit",
                 "del n3", 'find {tags: [ =="fox" ]} return ._id',
                 "compact", 'find {tags: [ =="fox" ]} return ._id'):
        r.execute(line)
    text = out.getvalue()
    assert '"n1"' in text and '"n5"' in text
    assert text.count('"n3"') == 0          # deleted before AND after
    assert "compacted to 5 docs" in text
