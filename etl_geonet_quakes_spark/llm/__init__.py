"""LLM-data-pipeline operators (SURVEY.md §2.3 north-star mandate):
dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash / embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text
analysis (tokens, quality, language-ID, fingerprints) and multimodal
binary-column plumbing."""
