"""One-off scale measurements for individual ops over the seeded
synthetic corpora (cached under /tmp/noise_ray_cache).

Usage: python tools/scale_run.py <op> [rows]
  op in {pca_project, countmin_heavy, hll_distinct, term_dictionary}

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

    if op == "term_dictionary":
        import glob
        import shutil

        from noise_ray.build.dictionary import (build_term_dictionary,
                                                fuzzy_terms, prefix_terms,
                                                regex_terms)

        paths = sorted(glob.glob(f"{sf_dir}/*.parquet"))
        ddir = f"/tmp/noise_ray_scale_dict_{rows}"
        shutil.rmtree(ddir, ignore_errors=True)
        t0 = time.perf_counter()
        build_term_dictionary(paths, ddir, fields=("text",))
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        np_ = prefix_terms(ddir, 0, "s").num_rows
        prefix_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        nf = fuzzy_terms(ddir, 0, "sart", 1).num_rows
        fuzzy_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        nr = regex_terms(ddir, 0, "[a-z]{3}").num_rows
        regex_s = time.perf_counter() - t0
        print(f"term_dictionary: {rows} docs -> build {build_s:.1f} s "
              f"({rows / build_s:,.0f} docs/s); prefix {np_} terms "
              f"{prefix_s * 1000:.0f} ms; fuzzy {nf} terms "
              f"{fuzzy_s * 1000:.0f} ms; regex {nr} terms "
              f"{regex_s * 1000:.0f} ms")
        ray.shutdown()
        return

    if op == "hybrid":
        import glob
        import os

        from noise_ray.build import build_index
        from noise_ray.ops.hybrid import hybrid_search

        emb_dir = embeddings_corpus_at(rows)
        idx = os.path.join(sf_dir, "index-hybrid")
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            t0 = time.perf_counter()
            src = f"{sf_dir}/documents.parquet"
            paths = (sorted(glob.glob(f"{src}/*.parquet"))
                     if os.path.isdir(src) else [src])
            build_index(paths, idx, fields=("text", "lang", "source"),
                        key_columns=("doc_id",), num_buckets=32)
            print(f"hybrid: index build {time.perf_counter() - t0:.1f} s")
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = hybrid_search(sf_dir, emb_dir=emb_dir, index_dir=idx)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"hybrid: {rows} docs+vecs -> top-{out.num_rows} fused in "
              f"{best:.2f} s warm (best of 3)")
        ray.shutdown()
        return

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
