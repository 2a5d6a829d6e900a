"""Scalar text functions: predicates, normalizers, tokenizers (SURVEY §2.2)."""
