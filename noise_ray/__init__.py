"""noise_ray — a Ray-Data-native inverted-index + TF-IDF/BM25 search engine.

A from-scratch reimplementation of the capabilities of the reference engine
(pipedown/noise, a single-node Rust/RocksDB nested-object search engine) as a
distributed Ray Data pipeline: Parquet transcript tables are tokenized with
``map_batches`` over Arrow batches, shuffled by term bucket into posting-list
segment files, and queried with a scorer that is bit-for-bit (float32)
compatible with the reference's TF-IDF math.
"""

__version__ = "0.1.0"
