"""Pure-Python ports of graphrag-rs's deterministic build rules.

These functions are the single source of truth for the string-level
semantics; they are invoked from Arrow-vectorized pandas UDFs on the Spark
side and directly by the single-process oracle used in parity tests.
No Spark imports allowed in this package.
"""
