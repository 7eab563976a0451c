"""Structured Streaming extensions (SURVEY.md §2.12): the reference's
exact count-based completeness watermark and flight-line session
windows, as streaming operators."""
