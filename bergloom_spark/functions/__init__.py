"""Scalar-function layer: cross-engine-deterministic hashing and text
analysis. Each helper exposes BOTH a Spark Column expression and the
equivalent DuckDB SQL fragment so driver oracles stay in sync by
construction."""
