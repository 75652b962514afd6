"""Streaming surface: queue semantics over ordered tables + Structured
Streaming windows/watermarks (SURVEY §2.6)."""
