"""Storage-strategy pipelines as pure DataFrame transforms, plus the
large-scale data-pipeline operators (dedup, similarity, text, multimodal)."""
