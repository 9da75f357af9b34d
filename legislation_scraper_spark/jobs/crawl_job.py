"""Cluster crawl job — the ``spark-submit --py-files`` entrypoint.

Usage (cluster):
    spark-submit --master <cluster> \\
        --py-files lss_pyfiles.zip \\
        crawl_job.py --world <dir> --store <dir> --rounds 50

Usage (sandbox smoke):
    spark-submit --master local[4] --py-files lss_pyfiles.zip \\
        legislation_scraper_spark/jobs/crawl_job.py \\
        --synth-docs 20 --store /tmp/crawlstore --rounds 10

No master is hard-coded: spark-submit (or the cluster scheduler)
supplies it, so the same artifact runs local[N] and a 1000-executor
cluster.  All state lives in the snapshot catalog at ``--store`` —
resubmitting the job after any failure resumes from the last complete
round (multi-table checkpoint).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", help="dir with pages_raw/seeds/robots parquet")
    ap.add_argument("--store", required=True, help="snapshot catalog root")
    ap.add_argument("--rounds", type=int, default=100)
    ap.add_argument("--synth-docs", type=int, default=0,
                    help="generate a synthetic world of N docs/source "
                         "instead of --world")
    ap.add_argument("--export", help="also build + export the dataset here")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--cooldown-rounds", type=int, default=0,
                    help="exclude hosts with errors for N rounds (0=off)")
    ap.add_argument("--cooldown-threshold", type=int, default=3,
                    help="errors within the window that trigger cooldown")
    args = ap.parse_args()

    from legislation_scraper_spark.plans.crawl import (
        CrawlConfig,
        CrawlEngine,
    )
    from legislation_scraper_spark.session import get_spark
    from legislation_scraper_spark.tables import Catalog

    spark = get_spark(
        "lss-crawl-job", shuffle_partitions=args.shuffle_partitions
    )
    if args.synth_docs:
        from legislation_scraper_spark.synth import synth_world

        w = synth_world(spark, docs_per_source=args.synth_docs, skew=3,
                        budget_base=8)
        pages_raw, seeds, robots = w["pages_raw"], w["seeds"], w["robots"]
    else:
        if not args.world:
            raise SystemExit("--world or --synth-docs required")
        pages_raw = spark.read.parquet(f"{args.world}/pages_raw")
        seeds = spark.read.parquet(f"{args.world}/seeds")
        robots = spark.read.parquet(f"{args.world}/robots")

    engine = CrawlEngine(
        spark, Catalog(spark, args.store), pages_raw, seeds, robots,
        CrawlConfig(
            error_cooldown_rounds=args.cooldown_rounds,
            cooldown_error_threshold=args.cooldown_threshold,
        ),
    )
    metrics = engine.run(max_rounds=args.rounds)
    for m in metrics:
        print(json.dumps(m))

    if args.export:
        from legislation_scraper_spark.plans.dataset_build import (
            export_dataset,
        )

        pages = engine.pages.read()
        if pages is not None:
            export_dataset(pages, args.export)
    spark.stop()


if __name__ == "__main__":
    main()
