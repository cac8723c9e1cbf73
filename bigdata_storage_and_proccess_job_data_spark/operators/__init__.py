"""DataFrame -> DataFrame operators: dedup / near-dup (exact, MinHash,
SimHash, incremental, clustering), similarity search (brute-force, LSH,
IVF, PQ), fuzzy string joins + entity resolution, as-of and range joins,
aggregation cubes + sketches (HLL/CMS/DDSketch/KMV) + robust stats
(median/MAD outliers, correlation matrix, chi-square, autocorrelation,
time-decayed aggregates, table profiler), market-basket pair mining,
PageRank, training-corpus prep (chunking, PII, contamination, sampling,
splits, LM quality scoring, line dedup, BPE tokenizer training,
negative sampling), ranking/retrieval (BM25, MMR), funnels, linear
models (one-pass ridge, distributed logistic GD, expression scoring),
ALS matrix factorization, privacy release (DP noisy counts,
k-anonymity), and multimodal plumbing."""
