"""Pure-Python deterministic text/NLP primitives.

These are the *semantic spec* of the non-relational surface: the Arrow
UDFs in ``knowledgegraphgenerator_spark.functions`` and the sequential
oracle in ``tests/ref_impl`` both call exactly these functions, so the
distributed re-expression is tested against the same primitive behavior
the golden fixtures were frozen with.

No Spark imports allowed in this subpackage.
"""
