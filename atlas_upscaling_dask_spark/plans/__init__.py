"""Planner layer — P1-P8 of SURVEY.md §2.6."""
