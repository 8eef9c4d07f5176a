"""Operator library: LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal) plus joins Spark lacks natively
(as-of). All DataFrame-in/DataFrame-out, composable, lazy.
"""
