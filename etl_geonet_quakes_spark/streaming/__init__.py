"""Structured Streaming operators (SURVEY.md §2.2 streaming rows +
the O26/O28 scheduled-upsert semantics re-expressed as streams)."""
