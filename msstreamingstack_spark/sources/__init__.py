from msstreamingstack_spark.sources.tables import (  # noqa: F401
    events_enriched,
    load_table,
    sf_dir_default,
)
