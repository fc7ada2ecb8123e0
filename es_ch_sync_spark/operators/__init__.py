"""Operator library — each module maps a block of SURVEY.md §2 to Spark plans."""
