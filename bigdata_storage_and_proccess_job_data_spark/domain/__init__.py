"""Job-postings domain: the reference pipeline's schemas, normalization,
cleaning, enrichment, and aggregation cubes as a parameterized library
(SURVEY.md §7.0). Batch and streaming share every stage."""
