"""Stage operators: DataFrame → DataFrame transformations for each
pipeline stage (extract, blocking, matching, clustering, dedup,
similarity search, evaluation)."""
