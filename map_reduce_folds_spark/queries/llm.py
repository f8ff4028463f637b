"""LLM-data-pipeline queries: dedup, similarity search, text analysis.

(Populated alongside operators/dedup.py, operators/similarity.py,
operators/text.py.)
"""

from __future__ import annotations
