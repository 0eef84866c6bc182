"""Pipeline operators (SURVEY.md §2.2-2.4)."""
