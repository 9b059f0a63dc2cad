"""Pure Column -> Column scalar functions.

Everything here is built from ``pyspark.sql.functions`` expressions that stay
inside whole-stage codegen — no Python UDFs on the hot path.
"""
