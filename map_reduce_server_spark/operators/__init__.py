"""Operator library: relational, dedup, similarity, text, multimodal."""
