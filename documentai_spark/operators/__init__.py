"""Spark DataFrame operators (pandas UDFs + declarative compositions)."""
