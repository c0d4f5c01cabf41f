"""Spark operators: extraction UDFs, dedup, similarity, text stats, media."""
