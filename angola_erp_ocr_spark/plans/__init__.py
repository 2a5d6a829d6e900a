"""End-to-end dataflow plans (pipeline assembly, lineage, resume)."""
