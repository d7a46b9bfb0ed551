import os

import pytest
import ray


@pytest.fixture(scope="session")
def ray_session():
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def scoring_index(ray_session, tmp_path_factory):
    """Index over exactly the scoring.noise corpus (3 docs, field `text`):
    "fox", "quick fox", "quick brown fox" — locks the golden f32 scores."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from noise_ray.build import build_index

    d = tmp_path_factory.mktemp("scoring")
    inp = d / "input"
    os.makedirs(inp)
    t = pa.table(
        {
            "conv_id": pa.array(["c0", "c0", "c0"], pa.string()),
            "turn_idx": pa.array([0, 1, 2], pa.int32()),
            "role": pa.array([None, None, None], pa.string()),
            "text": pa.array(["fox", "quick fox", "quick brown fox"], pa.string()),
            "tool": pa.array([None, None, None], pa.string()),
            "ts": pa.array([0, 1, 2], pa.timestamp("us")),
        }
    )
    pq.write_table(t, str(inp / "part-0.parquet"))
    idx_dir = str(d / "index")
    build_index([str(inp / "part-0.parquet")], idx_dir, num_buckets=4)
    return idx_dir


@pytest.fixture(scope="session")
def small_transcripts(ray_session, tmp_path_factory):
    """~200-conversation synthetic table with all fixture strata + its index."""
    from noise_ray.build import build_index
    from noise_ray.sources import generate_transcripts

    d = tmp_path_factory.mktemp("small")
    paths = generate_transcripts(str(d / "input"), num_convs=200, num_files=8, seed=42)
    idx_dir = str(d / "index")
    manifest = build_index(paths, idx_dir, num_buckets=16)
    return {"input": paths, "index": idx_dir, "manifest": manifest}
