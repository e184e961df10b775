"""Structured Streaming surface (no analogue in the reference — it is
batch-only; SURVEY §2.3 marks streaming as an engine extension)."""
