"""spark.ml surface (SURVEY.md §2.10 X5)."""
