"""Source-format readers for web-scale corpora: WARC (Common Crawl
layout), XML sitemaps, robots.txt."""
