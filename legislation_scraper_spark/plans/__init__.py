"""End-to-end plans: crawl loop, offline dataset build, oracle simulator."""
