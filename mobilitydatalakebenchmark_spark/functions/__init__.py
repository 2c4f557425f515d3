"""Column-expression library. Everything here is a pure pyspark.sql.functions
composition (JVM-side, codegen-friendly) unless a docstring says otherwise."""
