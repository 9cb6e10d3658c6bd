"""Spark built-in expression compositions (JVM-side, codegen-friendly)."""
