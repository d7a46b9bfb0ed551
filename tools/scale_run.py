"""One-off scale measurements for individual ops over the seeded
synthetic corpora (cached under /tmp/noise_ray_cache).

Usage: python tools/scale_run.py <op> [rows]
  op in {pca_project, countmin_heavy}

Owns its Ray session (never run concurrently with another cluster).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import ray

    op = sys.argv[1]
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from noise_ray.sources.documents import (documents_corpus_at,
                                             embeddings_corpus_at)

    if op == "pca_project":
        sf_dir = embeddings_corpus_at(rows)
    else:
        sf_dir = documents_corpus_at(rows)

    from noise_ray.ops import pca, sketch

    fn = {"pca_project": pca.pca_project,
          "countmin_heavy": sketch.countmin_heavy,
          "hll_distinct": sketch.hll_distinct}[op]
    t0 = time.perf_counter()
    out = fn(sf_dir)
    n = out.count() if hasattr(out, "count") else out.num_rows
    wall = time.perf_counter() - t0
    print(f"{op}: {rows} rows -> {n} out rows in {wall:.1f} s "
          f"({rows / wall:,.0f} rows/s)")
    ray.shutdown()


if __name__ == "__main__":
    main()
