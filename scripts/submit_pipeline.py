"""spark-submit driver script for the staged ER pipeline (north rule:
`spark-submit --py-files` on a multi-executor cluster).

The package arrives via --py-files (see scripts/make_pyfiles.py); this
script only parses args and delegates to plans.pipeline.main().
"""

from entity_resolution_pipeline_spark.plans.pipeline import main

if __name__ == "__main__":
    main()
