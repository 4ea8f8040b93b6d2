"""entity_resolution_pipeline_spark — a from-scratch, PySpark-native
entity-resolution / record-linkage engine.

Reproduces the semantics of nomorehumor/Entity-Resolution-Pipeline
(blocking → pairwise matching → transitive clustering) re-expressed as
idiomatic Spark DataFrame plans:

* declarative DataFrame/SQL everywhere — Catalyst plans the physical
  strategy (broadcast vs sort-merge joins, AQE skew splitting, partition
  coalescing);
* zero per-row Python UDFs — scoring is Spark builtins where possible
  (``levenshtein``, ``array_intersect``) and Arrow-batched pandas UDFs
  otherwise (Jaro-Winkler);
* no driver-side data structures — the reference's dict block index,
  numpy pair arrays and recursive-DFS clustering become exploded
  DataFrames, equi-joins and large-star/small-star label propagation.

Package layout::

    sources/    deterministic synthetic pages generator + table catalog
    functions/  column-level functions (normalize, similarity, hashing, text)
    operators/  stage operators (extract, blocking, matching, clustering,
                dedup, similarity_search, evaluate)
    plans/      resumable multi-stage pipeline orchestration
    streaming/  Structured Streaming incremental ER
"""

__version__ = "0.1.0"
