"""DataFrame -> DataFrame operators (dedup, similarity, aggregation
cubes, normalization, imputation, multimodal plumbing)."""
