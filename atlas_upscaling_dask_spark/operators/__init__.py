"""Engine operators — each module maps to a SURVEY.md §2 inventory row."""
