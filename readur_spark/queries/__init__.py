"""The relational layer (SURVEY.md §2.B) + training-data ops, exposed
through queries/registry.py for the driver's DuckDB correctness gate."""
