"""Structured Streaming rewrites of the reference's asyncio polling loops
(SURVEY.md §2.9)."""
