"""Operator library: relational surface + large-scale data-pipeline ops."""
