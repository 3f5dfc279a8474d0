"""Composed pipelines: entity resolution (flagship), relational utilities."""
