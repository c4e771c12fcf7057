"""Dataflow operators authored in this repo (not plain SQL passthrough).

- ``merge``       the reference's merge processor (column/row direction).
- ``dedup``       exact + MinHash-LSH + SimHash + n-gram Jaccard dedup.
- ``similarity``  vector similarity search (brute-force + LSH-bucketed).
- ``text``        text-analysis functions for LLM-data pipelines.
- ``multimodal``  binary-column (image/audio/video) plumbing.
"""
