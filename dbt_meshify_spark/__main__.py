"""``python -m dbt_meshify_spark`` — the CLI entry point."""

from dbt_meshify_spark.cli import cli

cli()
