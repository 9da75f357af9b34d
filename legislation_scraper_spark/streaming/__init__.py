"""Structured Streaming surfaces: streaming crawl loop + metric streams."""
