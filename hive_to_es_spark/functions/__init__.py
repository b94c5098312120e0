"""Reusable column-expression helpers and multimodal processing
functions. Query-shaped operators live in operators/; this package
holds building blocks meant to be imported by user pipelines."""
