"""Composite operators: reusable DataFrame->DataFrame building blocks
(k-NN, ANN index build/search, dedup graph utilities, multimodal
plumbing). The declared queries in zvdb_spark/queries/* are thin
wrappers over these."""
