"""Source/sink connectors (SURVEY.md §2.A)."""
