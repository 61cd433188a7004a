"""Ordered contract modules for __spark_entry__ (split round 10;
statement order and oracle SQL preserved byte-identically)."""
