"""The delegated SQL operator surface (SURVEY.md §2.B), Spark-first."""
