"""Inspectable plans: statement streams, DDL synthesis, JDBC partition
planning — pure Python, review-then-execute like the reference."""
