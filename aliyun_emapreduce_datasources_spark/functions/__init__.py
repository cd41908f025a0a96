"""Function surface: text analysis, vector math, and the reference's
UDF equivalents (SURVEY.md §2.3)."""
