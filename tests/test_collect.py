"""ops.collect: driver-side collection must execute the plan exactly
once.  Regression guard for the to_arrow_refs double-execution (its
schema(fetch_if_missing=True) probe re-runs the whole upstream
pipeline on a lazy dataset)."""

import pyarrow as pa
import ray
import ray.data


def test_arrow_blocks_executes_once(ray_session):
    from noise_ray.ops.collect import arrow_blocks

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def inc(self):
            self.n += 1

        def get(self):
            return self.n

    c = Counter.remote()

    def f(batch: pa.Table) -> pa.Table:
        ray.get(c.inc.remote())
        return batch

    ds = (ray.data.range(100, override_num_blocks=2)
          .map_batches(f, batch_format="pyarrow", batch_size=None))
    tabs = arrow_blocks(ds)
    assert sum(t.num_rows for t in tabs) == 100
    # one execution = one UDF call per block; the double-execution bug
    # would re-run the map stage for the schema probe
    assert ray.get(c.get.remote()) == 2


def test_collect_table_column_order_and_empty(ray_session):
    from noise_ray.ops.collect import collect_table

    ds = ray.data.from_arrow(pa.table({"b": [1, 2], "a": ["x", "y"]}))
    t = collect_table(ds, ["a", "b"])
    assert t.column_names == ["a", "b"]
    assert t.num_rows == 2
    empty = ray.data.from_arrow(
        pa.table({"a": pa.array([], pa.string()),
                  "b": pa.array([], pa.int64())}))
    assert collect_table(empty, ["a", "b"]) is None
