"""Driver-mandated LLM-data-pipeline extensions (BASELINE.json north star).

Not present in the reference (SURVEY.md §2.8 — honest gap): dedup,
similarity search, text analysis, multimodal columns.  Designed for
100 TB first; oracle-checkable variants exist for the correctness gate.
"""
