"""Query-plan modules: one per operator family, registered into
idhub_spark.queries.REGISTRY via the @query decorator."""
