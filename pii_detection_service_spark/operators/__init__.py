"""Spark DataFrame operators (native-first; UDFs only where unavoidable)."""
