"""Pure-Python span semantics shared by the oracle and the Spark engine.

Only *data* (constant tables, thresholds, regex patterns) and tiny pure
helpers live here; the oracle (``oracle/extract_one.py``) and the vectorized
engine (``operators/extract.py``) implement the *logic* independently so the
span-equality tests are meaningful.
"""
