"""Data layer: graph containers, ETL, splitting, sampling, matchers."""
