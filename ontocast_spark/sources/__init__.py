"""ontocast_spark package."""
