"""Column-level functions: normalization, tokenization, similarity,
hashing/sketches, text quality. All pure Column expressions or
Arrow-batched pandas UDFs — never per-row Python UDFs."""
