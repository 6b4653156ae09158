"""Sources and sinks (SURVEY.md §2B rows 1-2)."""
