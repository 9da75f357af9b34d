"""Crawl + pipeline operators (DataFrame compositions and Arrow UDFs)."""
