"""Workflow operators: DataFrame -> DataFrame functions.

Each implements one row of SURVEY §2's operator inventory (joins,
aggregations, window/time-bucket patterns, set ops) or a beyond-reference
training-data operator (dedup, similarity, multimodal).
"""
