"""Column-expression libraries (built-in pyspark.sql.functions only in the
hot path; pandas UDFs only where JVM built-ins cannot express the op)."""
