"""Relational/layout/OCR operators (SURVEY §2.3–§2.8)."""
