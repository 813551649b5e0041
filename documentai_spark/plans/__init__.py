"""End-to-end pipeline DAGs + checkpoint/resume driver loop."""
