"""legislation_scraper_spark — a PySpark-native crawl/analytics engine.

A from-scratch rebuild of the *capabilities* of the reference crawler
(felipeoes/legislation-scraper, read-only at /root/reference) on idiomatic
PySpark: a stored URL frontier, a partitioned URL-seen set, a per-host
politeness scheduler (window ranking + salted repartition), vectorized
Arrow/pandas extraction UDFs, snapshot-checkpointed tables, and the
training-data-pipeline operators (dedup, similarity search, text analysis)
a 100 TB corpus build needs.

Architecture is Spark-first (DataFrame/Catalyst), NOT a port of the
reference's thread-pooled requests/BeautifulSoup loop.
"""

__version__ = "0.1.0"
