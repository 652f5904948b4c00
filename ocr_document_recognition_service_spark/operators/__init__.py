"""Reusable DataFrame operators: dedup, similarity, text analysis,
quality metrics, windows.  Each is a plain function DataFrame→DataFrame
so the same plan serves queries(), tests, and pipelines."""
