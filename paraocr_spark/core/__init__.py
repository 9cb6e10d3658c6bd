"""Pure-Python extraction semantics. No Spark imports here.

These functions define the engine's behavior exactly once; the Spark kernel in
``paraocr_spark.operators.extract`` vectorizes around them and the pytest
suite asserts byte-identity between the two (SURVEY.md §5).
"""
