"""LLM-data-pipeline operators (SURVEY §2.K): dedup (exact / MinHash-LSH
/ SimHash / n-gram Jaccard), similarity search, text analysis,
multimodal plumbing. All DataFrame-native; Python appears only in
Arrow-batched pandas UDFs."""
