"""The crawl engine: iterative frontier expansion over snapshot tables.

Replaces the reference's whole runtime (thread pools + queues + saver
thread, /root/reference/src/scraper/base/scraper.py:458-493,
database/saver.py:63-87) with a Spark-first incremental-batch loop
(SURVEY.md §3 "Spark rebuild lifecycle"):

  round r:
    pending    = frontier_log ⟂ seen          (bloom pre-filter + anti-join)
    selected   = robots ⋈ pending → window rank ≤ budget → salted repartition
    results    = fetch(selected)               (mapInPandas transport)
    pages     += extract_doc(fetched docs)     (Arrow UDF, byte-parity)
    frontier  += extract_links(fetched search) (new URLs, depth+1)
    errors    += failures (fetch + parse)
    seen      += every attempted URL
    crawl_log += (round, host, host_rank, url) (ordering contract)
    catalog.save_checkpoint(r, {table: version})   ← atomic multi-table commit

Tables are append-only logs; "state" (FIXTURES.md §3 pending/fetched/
error) is derived: pending = discovered ∖ attempted.  This is the
merge-on-read pattern — no per-round rewrite of a 10^10-row frontier,
just appends plus the anti-join at read time (Iceberg MERGE/compaction
would periodically fold the log at scale).

Shuffle budget per round (SURVEY.md §4): the seen anti-join, the
politeness window rank, and the salted repartition — three shuffles,
all on politeness-bounded row counts (≤ Σ budgets), NOT on the full
frontier; the frontier-side work is a partition-pruned scan + bloom
probe.

Crawl-ordering contract: selection order is fully determined by
(priority, discovered_round, canon_url) per host — reproducible under
any parallelism and verified against the straight-line simulator
(plans/simulator.py) by tests/test_crawl_engine.py
(test_visit_order_matches_simulator / test_seen_set_matches_simulator).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import ascii_slug
from ..functions.urls import url_host
from ..operators import politeness
from ..operators.extract import make_parse_page
from ..operators.fetch import FetchPolicy, fetch
from ..operators.seen import SeenSet, with_url_key
from ..tables import Catalog

FRONTIER_COLS = (
    "url", "canon_url", "url_hash", "shard", "host", "source",
    "priority", "depth", "discovered_round",
)


@dataclass
class CrawlConfig:
    n_shards: int = 64
    bloom_fpp: float = 0.01
    salt_buckets: int = 8
    fetch_partitions: int = 16
    pages_partition_cols: tuple = ("type_slug", "situation_slug")
    policy: FetchPolicy = field(default_factory=FetchPolicy)
    search_marker: str = "/busca"  # URL shape that dispatches link parsing
    transport: str = "jvm"  # 'jvm' (codegen sim) | 'python' (mapInPandas)
    # politeness ranking strategy: 'window' (cheapest with bounded
    # budgets) | 'range' (skew-safe for mega-hosts with large budgets;
    # operators/politeness.rank_per_host_range)
    rank_impl: str = "window"
    round_window_ms: int | None = None  # crawl-delay budget cap (politeness)
    # Error-driven host cooldown (SURVEY.md §2.11 C5: the reference
    # rotates VPN / sleeps when a site starts blocking; here a host with
    # >= cooldown_error_threshold errors within the last
    # error_cooldown_rounds rounds is excluded from selection until the
    # window ages out).  0 disables (default — keeps ordering parity
    # with the straight-line simulator).
    error_cooldown_rounds: int = 0
    cooldown_error_threshold: int = 3
    # bloom capacity per shard for the INCREMENTAL filter state (params
    # must stay fixed across delta batches for OR-merge); resize is a
    # rebuild-maintenance action
    filter_keys_per_shard: int = 65536
    # store the frontier log bucketed by canon_url (Iceberg
    # bucket-transform analogue): pending()'s per-round dedup groupBy
    # then runs with NO Exchange over the log (tables.BucketedLog;
    # asserted in tests/test_plans.py)
    bucket_frontier: bool = True
    frontier_buckets: int = 32
    # snapshot-expiry maintenance (tables.Catalog.expire_all): every
    # N rounds, drop manifests/data below the keep horizon while
    # protecting checkpoint-referenced versions.  0 disables (default:
    # tests exercise full time travel; a long-running crawl turns this
    # on or compaction leaks storage without bound).
    expire_every_rounds: int = 0
    expire_keep_snapshots: int = 4
    expire_keep_checkpoints: int = 2
    # SURT-prefix crawl scoping (sources/cdx.scope_filter, Heritrix
    # SurtPrefixScope semantics: longest matching prefix wins, length
    # ties deny).  Applied to DISCOVERED outlinks at frontier admission
    # — seeds are exempt, as in Heritrix.  None disables (default:
    # keeps ordering parity with the straight-line simulator, which is
    # scope-oblivious).  The rule fold is an in-row broadcast — the
    # link stream never shuffles for it.
    scope_rules: tuple[tuple[str, bool], ...] | None = None
    scope_default_allow: bool = True
    # Global round quota (SURVEY §2.11 C6 / operators.politeness.
    # allocate_budgets): when set, each round divides this cluster-wide
    # fetch budget across hosts by largest-remainder proportional share,
    # weighted by backlog (pending URLs per host) — optionally scaled by
    # the crawl's own TrustRank (budget_weights='trust_backlog', needs
    # record_host_edges) so trusted regions of the web get quota first.
    # Robots budgets stay binding: the allocation only CAPS them.
    # None disables (default: ordering parity with the simulator).
    global_round_budget: int | None = None
    # 'backlog' | 'trust_backlog' | 'opic_backlog' — the last two scale
    # the capacity-capped backlog weight by a link-graph score over the
    # crawl's own recorded host graph: seed-personalized TrustRank
    # (anti-spam bias) or OPIC history (Abiteboul WWW'03 — Nutch's
    # default crawl-ordering signal: hosts whose pages accumulate cash
    # fastest are where frontier budget earns the most importance).
    budget_weights: str = "backlog"
    # Accumulate a host-level link graph (src_host → dst_host edge
    # counts per round) in a `host_edges` table — the input to
    # trust_scores().  Off by default (one extra tiny agg + append).
    record_host_edges: bool = False
    trust_iters: int = 2
    # Maintain a `url_state` BucketedLog (latest fetch record per URL:
    # content digest + validators + last round/status) via bucket-pruned
    # merge_upsert — the state table the conditional-revalidation
    # recrawl tier (operators/fetch.revalidation_plan/outcomes, RFC 9110
    # §13) reads and writes.  One extra md5 over the body in the fetch
    # pass + one ≤round-sized upsert per round.  Off by default.
    track_url_state: bool = False
    # Coalesce round sink writes to this many tasks per table.  The
    # parsed cache's partition count is scan-driven (web splits +
    # fetch_partitions), so each sink otherwise writes partitions×dirs
    # files — for the hive-partitioned pages table that is thousands of
    # ~MB files per round, and open/close/footer overhead becomes a
    # visible slice of the round at every parallelism level.  Coalesce
    # (no shuffle — adjacent cached partitions merge) bounds files per
    # commit at dirs×sink_coalesce.  None keeps one write task per
    # cached partition.
    sink_coalesce: int | None = None


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        catalog: Catalog,
        pages_raw: DataFrame,
        seeds: DataFrame,
        robots: DataFrame,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.catalog = catalog
        self.pages_raw = pages_raw
        self.seeds = seeds
        self.robots = robots
        self.cfg = config or CrawlConfig()
        self.frontier = (
            catalog.bucketed_log(
                "frontier_log", "canon_url", self.cfg.frontier_buckets
            )
            if self.cfg.bucket_frontier
            else catalog.table("frontier_log")
        )
        self.pages = catalog.table("pages")
        self.errors = catalog.table("fetch_errors")
        self.visited = catalog.table("visited")
        self.crawl_log = catalog.table("crawl_log")
        self.host_edges = (
            catalog.table("host_edges")
            if self.cfg.record_host_edges
            else None
        )
        # latest per-URL fetch state, bucketed on the same key family as
        # the frontier so the revalidation joins stay co-locatable
        self.url_state = (
            catalog.bucketed_log(
                "url_state", "canon_url", self.cfg.frontier_buckets
            )
            if self.cfg.track_url_state
            else None
        )
        self.seen = SeenSet(
            catalog.table("seen"),
            self.cfg.n_shards,
            self.cfg.bloom_fpp,
            # incremental filter state: per-round delta bitmaps, OR-merged
            # at probe — the probe cost no longer scales with total seen
            filters_table=catalog.table("seen_filters"),
            keys_per_shard=self.cfg.filter_keys_per_shard,
        )

    # -- lifecycle ------------------------------------------------------------

    def bootstrap(self) -> None:
        """Seed the frontier (round 0 checkpoint). Idempotent."""
        if self.catalog.checkpoints():
            return
        f = with_url_key(
            self.seeds.select(
                F.col("seed_url").alias("url"),
                # url_host (lowercased, port-stripped) — the SAME
                # normalization every other host key uses (politeness
                # grouping, host_edges dst, trust seeds); a raw regexp
                # here would make 'WWW.Host:443' a distinct graph node
                url_host(F.col("seed_url")).alias("host"),
                "source",
                "priority",
            ),
            "url",
            self.cfg.n_shards,
        ).select(
            "url", "canon_url", "url_hash", "shard", "host", "source",
            "priority",
            F.lit(0).alias("depth"),
            F.lit(0).alias("discovered_round"),
        )
        v = self.frontier.append(f)
        self.catalog.save_checkpoint(0, {"frontier_log": v})

    def resume(self) -> int:
        """Roll all tables back to the last complete round; return it."""
        tag = self.catalog.restore_last_checkpoint()
        if tag is None:
            self.bootstrap()
            return 0
        return tag

    # -- one crawl round --------------------------------------------------------

    def pending(self) -> DataFrame | None:
        """Discovered ∖ attempted, deduped to one row per canonical URL
        (earliest discovery wins — deterministic)."""
        best = self._best_frontier()
        if best is None:
            return None
        return self.seen.filter_unseen(best, "canon_url")

    def _best_frontier(self) -> DataFrame | None:
        """One row per canonical URL in the frontier log (earliest
        discovery wins), seen-or-not — the admission view `pending()`
        filters and `revisit_selection()` re-admits from."""
        log = self.frontier.read()
        if log is None:
            return None
        return log.groupBy("canon_url").agg(
            F.min(
                F.struct(
                    "priority", "discovered_round", "depth", "url",
                    "url_hash", "shard", "host", "source",
                )
            ).alias("b")
        ).select(
            F.col("b.url").alias("url"),
            "canon_url",
            F.col("b.url_hash").alias("url_hash"),
            F.col("b.shard").alias("shard"),
            F.col("b.host").alias("host"),
            F.col("b.source").alias("source"),
            F.col("b.priority").alias("priority"),
            F.col("b.depth").alias("depth"),
            F.col("b.discovered_round").alias("discovered_round"),
        )

    def cooled_hosts(self, r: int) -> DataFrame | None:
        """Hosts in error cooldown at round ``r``: ≥ threshold errors
        within the trailing window.  None when cooldown is disabled or
        no errors exist yet."""
        if not self.cfg.error_cooldown_rounds:
            return None
        errs = self.errors.read()
        if errs is None:
            return None
        return (
            errs.filter(F.col("round") >= r - self.cfg.error_cooldown_rounds)
            .groupBy("host")
            .agg(F.count("*").alias("n_err"))
            .filter(F.col("n_err") >= self.cfg.cooldown_error_threshold)
            .select("host")
        )

    def trust_scores(self) -> DataFrame | None:
        """TrustRank over the crawl's OWN accumulated host graph
        (``host_edges``, recorded when cfg.record_host_edges), seeded by
        the seed-list hosts — trust flows out of the configured sources
        along observed links (operators/graph.trustrank; Gyöngyi et al.
        VLDB'04).  Returns (host, trust) or None before any edges exist.

        Scale: the host graph is orders of magnitude smaller than the
        URL frontier (10^7 hosts vs 10^10 URLs at the north-star tier);
        per-round edge folds are pre-aggregated counts."""
        if self.host_edges is None:
            return None
        edges = self.host_edges.read()
        if edges is None:
            return None
        e = edges.groupBy("src_host", "dst_host").agg(
            F.sum("n").alias("n")
        )
        from ..operators.graph import trustrank

        # url_host normalization matches host_edges' src/dst keys —
        # mixed-case or ported seed URLs must land on the same node
        seed_hosts = self.seeds.select(
            url_host(F.col("seed_url")).alias("host")
        ).distinct()
        return trustrank(
            e, seed_hosts, iters=self.cfg.trust_iters,
            src="src_host", dst="dst_host",
        ).select(F.col("node").alias("host"), F.col("rank").alias("trust"))

    def opic_host_scores(self) -> DataFrame | None:
        """OPIC over the crawl's accumulated host graph (``host_edges``)
        — the Nutch-default online importance estimate
        (operators/graph.opic): cash banks into history and flows along
        observed host links, so hosts that keep receiving importance
        from already-important hosts score highest after ANY number of
        steps.  Returns (host, opic) or None before any edges exist.
        Same scale posture as :meth:`trust_scores` — the host graph is
        politeness metadata, orders of magnitude below URL volume."""
        if self.host_edges is None:
            return None
        edges = self.host_edges.read()
        if edges is None:
            return None
        e = edges.groupBy("src_host", "dst_host").agg(
            F.sum("n").alias("n")
        )
        from ..operators.graph import opic

        return opic(
            e, iters=self.cfg.trust_iters, src="src_host", dst="dst_host"
        ).select(F.col("node").alias("host"), F.col("score").alias("opic"))

    def _host_budgets(self, pending: DataFrame) -> DataFrame:
        """Split cfg.global_round_budget across hosts proportional to
        ABSORBABLE backlog — min(pending URLs, robots round capacity)
        per host, disallowed hosts excluded — optionally scaled by
        TrustRank (cfg.budget_weights='trust_backlog').  Output feeds
        schedule_round(host_budgets=...), which takes
        min(robots_budget, allocation) — robots stays binding.

        Capping the WEIGHT at capacity (not just the final budget)
        keeps the global quota from being parked on hosts that cannot
        spend it: a mega-host holding 30% of pending but robots-capped
        at 2 fetches would otherwise absorb 30% of B and the round
        would systematically under-fill; with capacity-capped weights
        the Hamilton division hands that quota to hosts with real
        headroom.  Residual waste is O(hosts) rounding units, never
        O(B).  The capacity expression mirrors apply_robots (default
        budget, crawl-delay window cap) so the two stay consistent."""
        backlog = pending.groupBy("host").agg(
            F.count("*").cast("double").alias("backlog")
        )
        cap = F.coalesce(F.col("max_parallel"), F.lit(4)).cast("double")
        if self.cfg.round_window_ms is not None:
            cap = F.least(
                cap,
                F.greatest(
                    F.lit(1),
                    F.floor(
                        F.lit(self.cfg.round_window_ms)
                        / F.coalesce(F.col("crawl_delay_ms"), F.lit(1))
                    ),
                ).cast("double"),
            )
        r = self.robots.select(
            "host", "allow", "crawl_delay_ms", "max_parallel"
        )
        backlog = (
            backlog.join(F.broadcast(r), "host", "left")
            .filter(F.coalesce(F.col("allow"), F.lit(True)))
            .select(
                "host",
                F.least(F.col("backlog"), cap).alias("weight"),
            )
        )
        if self.cfg.budget_weights == "trust_backlog":
            trust = self.trust_scores()
            if trust is not None:
                # +epsilon keeps zero-trust hosts schedulable (they get
                # leftover quota after trusted backlog is funded)
                backlog = backlog.join(
                    F.broadcast(trust), "host", "left"
                ).select(
                    "host",
                    (
                        F.col("weight")
                        * (F.coalesce("trust", F.lit(0.0)) + F.lit(1e-6))
                    ).alias("weight"),
                )
        elif self.cfg.budget_weights == "opic_backlog":
            opic = self.opic_host_scores()
            if opic is not None:
                # same epsilon contract as the trust branch: a host the
                # graph has not yet scored still gets leftover quota
                backlog = backlog.join(
                    F.broadcast(opic), "host", "left"
                ).select(
                    "host",
                    (
                        F.col("weight")
                        * (F.coalesce("opic", F.lit(0.0)) + F.lit(1e-6))
                    ).alias("weight"),
                )
        return politeness.allocate_budgets(
            backlog, self.cfg.global_round_budget
        )

    def revisit_selection(
        self,
        captures: DataFrame,
        budget: int,
        horizon_days: float = 7.0,
        key: str = "canon_url",
    ) -> DataFrame | None:
        """Recrawl admission: estimate per-URL change rates from capture
        history (operators/revisit.change_rates, Cho & Garcia-Molina
        Poisson estimator), keep the top-``budget`` stalest
        (revisit_priorities), and rebuild frontier-shaped rows for them
        from the frontier log — pass the result to
        ``round(r, extra_pending=...)``.  The seen filter is bypassed by
        construction (these URLs were crawled before; that is the
        point), so the caller owns revisit cadence."""
        from ..operators.revisit import change_rates, revisit_priorities

        rates = change_rates(captures, key=key, horizon_days=horizon_days)
        picks = revisit_priorities(rates, budget, key=key)
        best = self._best_frontier()
        if best is None:
            return None
        # picks ≤ budget rows → broadcast semi-join, no shuffle of the
        # frontier view beyond its own dedup
        return best.join(F.broadcast(picks.select(key)), key, "left_semi")

    def revalidation_round(self, r: int, budget: int) -> dict:
        """Conditional recrawl round (RFC 9110 §13, the validator tier
        the reference never needed — it refetches everything): pick the
        ``budget`` stalest URLs from ``url_state``, plan conditional
        requests from their stored validators
        (operators/fetch.revalidation_plan), apply origin behavior
        against the live web (revalidation_outcomes), then

        - **304 Not Modified** (live digest == stored validator): no
          fetch, no parse, no page write — ``url_state`` is touched
          with ``last_round = r`` via a bucket-pruned merge_upsert and
          the saved bytes are ledgered;
        - **200 / changed or validator-less**: refetched through the
          NORMAL :meth:`round` as ``extra_pending`` (the recrawl
          admission path — seen-filter bypassed by construction), whose
          ``w_state`` sink upserts the new digests.

        Requires ``CrawlConfig.track_url_state``.

        Scale shape: picks are budget-bounded (TakeOrdered over the
        state log, no global sort materialization); every join here —
        picks→frontier rows, plan→live digests — broadcasts the
        budget-bounded side, so the frontier and the web table are
        never shuffled.  At 10^10 rows the same joins run co-located
        under the shared canon_url bucketing.
        """
        from ..operators.fetch import (
            revalidation_outcomes,
            revalidation_plan,
        )

        metrics = {
            "round": r, "revalidated": 0, "not_modified": 0,
            "refetched": 0, "saved_bytes": 0,
        }
        if self.url_state is None:
            raise ValueError("revalidation_round needs track_url_state")
        state = self.url_state.read()
        best = self._best_frontier()
        if state is None or best is None:
            return metrics
        picks = state.orderBy(
            F.col("last_round").asc(), F.col("canon_url")
        ).limit(budget)
        cand = best.join(
            F.broadcast(picks.select("canon_url")), "canon_url",
            "left_semi",
        )
        plan = revalidation_plan(
            cand,
            picks.select("canon_url", "etag", "last_modified", "digest"),
            url_col="canon_url",
        )
        # live content fingerprints, bounded to the planned URLs BEFORE
        # the outcome join (the web table is the 10^10-row side)
        web = self.pages_raw.select(
            F.col("url").alias("canon_url"),
            F.md5(F.col("html")).alias("digest"),
            F.length(F.col("html")).cast("bigint").alias("size_bytes"),
        )
        live = web.join(
            F.broadcast(plan.select("canon_url")), "canon_url", "inner"
        )
        out = revalidation_outcomes(plan, live, url_col="canon_url").cache()
        try:
            agg = out.agg(
                F.count("*").alias("n"),
                F.sum((F.col("status") == 304).cast("long")).alias("nm"),
                F.sum("saved_bytes").alias("saved"),
            ).collect()[0]
            fresh = out.filter(F.col("status") == 304).select(
                "canon_url", "host", "source",
                F.col("prior_digest").alias("digest"),
                F.col("if_none_match").alias("etag"),
                F.col("if_modified_since").alias("last_modified"),
                F.lit(304).alias("last_status"),
                F.lit(r).alias("last_round"),
            ).dropDuplicates(["canon_url"])
            changed = out.filter(F.col("status") != 304).select(
                *FRONTIER_COLS
            )
            sub = self.round(r, extra_pending=changed)
            # touch AFTER the round: both upserts hit url_state and the
            # log is single-writer by contract
            self.url_state.merge_upsert(fresh, metrics={"round": r})
            metrics.update(
                revalidated=int(agg["n"] or 0),
                not_modified=int(agg["nm"] or 0),
                refetched=sub["fetched"],
                saved_bytes=int(agg["saved"] or 0),
                round_metrics=sub,
            )
        finally:
            out.unpersist()
        return metrics

    def _maintain(self) -> None:
        """Compact many-commit tables (Iceberg rewrite_data_files
        analogue) so read fan-in stays bounded as rounds accumulate.
        The trigger threshold is per-table: a bucketed log legitimately
        holds one file per bucket per commit, so its fan-in budget is
        buckets × 12, not 12."""
        tables = [self.frontier, self.seen.table, self.visited]
        if self.url_state is not None:
            tables.append(self.url_state)
        for t in tables:
            snap = t.snapshot()
            thr = 12 * getattr(t, "n_buckets", 1)
            if snap and len(snap.file_sets) > thr:
                t.compact()
        if self.seen.filters_table is not None:
            snap = self.seen.filters_table.snapshot()
            if snap and len(snap.file_sets) > 12:
                # fold delta bitmaps row-wise (plain compact would keep
                # one row per round; this ORs them to one per shard)
                self.seen.compact_filters()

    def _maybe_expire(self, r: int) -> None:
        """Periodic storage reclamation (CrawlConfig.expire_every_rounds):
        compaction leaves predecessors' files on disk; expire_all deletes
        everything below the keep horizon except checkpoint-referenced
        versions, so resume keeps working (tests/test_expiry.py)."""
        cfg = self.cfg
        if cfg.expire_every_rounds and r > 0 and (
            r % cfg.expire_every_rounds == 0
        ):
            self.catalog.expire_all(
                keep_last=cfg.expire_keep_snapshots,
                keep_checkpoints=cfg.expire_keep_checkpoints,
            )

    def round(self, r: int, extra_pending: DataFrame | None = None) -> dict:
        """Execute crawl round ``r``; returns the round's metrics
        (including per-phase wall times under ``timings``).

        ``extra_pending`` (frontier-shaped rows, typically
        :meth:`revisit_selection` output) is unioned into the round's
        candidate set AFTER the seen filter — the recrawl admission
        path.  Caller contract: rows are already deduped against the
        fresh pending set (revisits are seen by definition, so the two
        sets are disjoint by construction)."""
        import time as _time

        timings: dict[str, float] = {}

        def _mark(name: str, t0: float) -> float:
            t1 = _time.perf_counter()
            timings[name] = round(t1 - t0, 3)
            return t1

        t = _time.perf_counter()
        self._maintain()
        self._maybe_expire(r)
        t = _mark("maintain", t)
        pending = self.pending()
        metrics = {"round": r, "selected": 0, "fetched": 0, "errors": 0,
                   "new_urls": 0, "pages": 0, "timings": timings}
        if extra_pending is not None:
            pending = (
                extra_pending if pending is None
                else pending.unionByName(extra_pending)
            )
        if pending is None:
            return metrics
        cooled = self.cooled_hosts(r)
        if cooled is not None:
            # blocked-host back-off: broadcast anti-join (the cooled set
            # is tiny — hosts, not URLs)
            pending = pending.join(F.broadcast(cooled), "host", "left_anti")
        host_budgets = (
            self._host_budgets(pending)
            if self.cfg.global_round_budget is not None
            else None
        )
        selected = politeness.schedule_round(
            pending, self.robots, self.cfg.salt_buckets,
            self.cfg.fetch_partitions, self.cfg.round_window_ms,
            self.cfg.rank_impl, host_budgets=host_budgets,
        ).persist()
        # persist, because the fetch plan references the schedule THREE
        # times (broadcast build of `selected`, the misses probe side,
        # and the hit-set broadcast's join subtree) — exchange reuse
        # dedupes the shuffles but not the window-rank recompute above
        # them (~13 s/round at N4 bench scale, more at higher levels).
        # MEMORY_AND_DISK persist (not localCheckpoint): lineage stays
        # intact, so an executor loss on a real cluster recomputes the
        # partition instead of failing the job.
        raw = fetch(
            selected, self.pages_raw, self.cfg.policy, self.cfg.transport
        )
        is_search = F.col("canon_url").contains(self.cfg.search_marker)
        # ONE pass over the fetch output: a single combined parse UDF
        # (docs + search pages) so the body bytes cross the Python
        # boundary exactly once per round; cache WITHOUT the body —
        # the cached working set is metadata + text, not raw html.
        parse_page = make_parse_page(self.cfg.search_marker)
        # content digest for the url_state validator tier — computed in
        # the SAME pass that parses (body bytes are in hand; md5 is
        # codegen), so tracking costs no extra scan of the fetch output
        state_cols = (
            [F.when(F.col("fetched"), F.md5(F.col("body"))).alias("digest")]
            if self.url_state is not None
            else []
        )
        parsed = raw.select(
            *[c for c in raw.columns if c != "body"],
            *state_cols,
            F.when(
                F.col("fetched"), parse_page("canon_url", "body")
            ).alias("p"),
        ).select(
            "*", F.col("p.rec").alias("rec"), F.col("p.l").alias("l")
        ).drop("p").cache()
        # one aggregation pass for every round metric (vs one job each)
        is_page = (
            F.col("fetched") & ~is_search & ~F.coalesce("rec.is_error", F.lit(True))
        )
        is_err = ~F.col("fetched") | (
            F.col("fetched") & ~is_search & F.coalesce("rec.is_error", F.lit(True))
        )
        counts = parsed.agg(
            F.count("*").alias("n_sel"),
            F.sum(F.col("fetched").cast("long")).alias("n_fetched"),
            F.sum(is_page.cast("long")).alias("n_pages"),
            F.sum(is_err.cast("long")).alias("n_err"),
        ).collect()[0]
        n_sel = counts["n_sel"]
        t = _mark("schedule_fetch", t)
        if n_sel == 0:
            parsed.unpersist()
            selected.unpersist()
            return metrics

        versions: dict[str, int] = {}
        results = parsed  # attempted rows (all outcomes)
        fetched = parsed.filter(F.col("fetched"))

        # --- extracted documents → pages (+ parse errors) ---
        doc_rec = fetched.filter(~is_search)
        good = doc_rec.filter(~F.col("rec.is_error"))
        n_pages = int(counts["n_pages"] or 0)
        pages_df = good.select(
            F.col("canon_url").alias("document_url"),
            "source",
            F.col("rec.title").alias("title"),
            F.col("rec.year").alias("year"),
            F.col("rec.type").alias("type"),
            F.col("rec.situation").alias("situation"),
            F.col("rec.summary").alias("summary"),
            F.col("rec.text").alias("text_markdown"),
            # J2 enrichment payload (ficha metadata arrays + overflow map)
            F.col("rec.themes").alias("themes"),
            F.col("rec.keywords").alias("keywords"),
            F.col("rec.extras").alias("extras"),
            F.lit(r).alias("fetched_round"),
        ).withColumns(
            {
                # ASCII partition twins (saver.py:119-125 parity; non-ASCII
                # partition dirs break on non-UTF-8 JVM file encodings)
                "type_slug": ascii_slug(F.col("type")),
                "situation_slug": ascii_slug(F.col("situation")),
            }
        )
        t = _mark("extract", t)

        err_df = results.filter(~F.col("fetched")).select(
            "canon_url", "host", "source",
            F.lit(r).alias("round"), "status", "attempts",
            F.col("fetch_error").alias("error"),
        ).unionByName(
            doc_rec.filter(F.col("rec.is_error")).select(
                "canon_url", "host", "source",
                F.lit(r).alias("round"), "status", "attempts",
                F.lit("parse error / empty document").alias("error"),
            )
        )
        n_err = int(counts["n_err"] or 0)

        links = (
            fetched.filter(is_search)
            .select(
                "host", "source", "priority", "depth", "discovered_round",
                F.explode(
                    F.concat(
                        F.col("l.doc_links"),
                        F.when(
                            F.col("l.next_link").isNotNull(),
                            F.array(F.col("l.next_link")),
                        ).otherwise(F.array().cast("array<string>")),
                    )
                ).alias("url"),
            )
        )
        if self.cfg.scope_rules:
            from ..sources.cdx import scope_filter

            rules_df = self.spark.createDataFrame(
                list(self.cfg.scope_rules),
                "surt_prefix string, allow boolean",
            )
            links = (
                scope_filter(
                    links,
                    rules_df,
                    url_col="url",
                    default_allow=self.cfg.scope_default_allow,
                )
                .filter(F.col("allowed"))
                .drop("surt", "allowed")
            )
        new_front = with_url_key(
            links.select(
                "url",
                # the CHILD's own host, not the linking page's — a
                # cross-host link scheduled under the parent's host
                # would evade the target host's politeness budget
                # (links.host stays the parent host for the src side
                # of host_edges below)
                url_host(F.col("url")).alias("host"),
                "source", "priority",
                (F.col("depth") + 1).alias("depth"),
                F.lit(r + 1).alias("discovered_round"),
            ),
            "url",
            self.cfg.n_shards,
        ).select(*FRONTIER_COLS).distinct()

        # --- all round outputs write CONCURRENTLY ---------------------------
        # Every sink below reads only the materialized `parsed` cache and
        # writes its OWN table (separate snapshot dirs), so the six jobs
        # are independent; submitting them from driver threads overlaps
        # their fixed job-submission/stage latency (Spark runs concurrent
        # jobs from one session; FIFO still fills free task slots).  On a
        # cluster this is the same pattern as concurrent writes to
        # independent Iceberg tables.
        from concurrent.futures import ThreadPoolExecutor

        def _co(df):
            # bound files-per-commit (see CrawlConfig.sink_coalesce)
            return (
                df.coalesce(self.cfg.sink_coalesce)
                if self.cfg.sink_coalesce
                else df
            )

        def w_pages():
            if n_pages:
                versions["pages"] = self.pages.append(
                    _co(pages_df),
                    partition_cols=list(self.cfg.pages_partition_cols),
                    metrics={"round": r},
                )

        def w_errors():
            if n_err:
                versions["fetch_errors"] = self.errors.append(_co(err_df))

        def w_links() -> int:
            # single pass: append, then read the new-URL count from the
            # commit's manifest lineage (computed from parquet footers
            # during the append) — a separate count() job re-ran the
            # whole distinct shuffle
            v = self.frontier.append(new_front)
            # manifest lineage records THIS commit's rows only
            n = int(sum(self.frontier.snapshot(v).lineage.values()))
            versions["frontier_log"] = v
            return n

        def w_seen():
            self.seen.add(results.select("canon_url"), "canon_url")
            versions["seen"] = self.seen.table.current_version()
            if self.seen.filters_table is not None:
                versions["seen_filters"] = (
                    self.seen.filters_table.current_version()
                )

        def w_visited():
            versions["visited"] = self.visited.append(
                _co(
                    results.select(
                        "canon_url", "host", "source",
                        F.lit(r).alias("round"), "status", "attempts",
                        F.when(F.col("fetched"), F.lit("fetched"))
                        .otherwise(F.lit("error"))
                        .alias("state"),
                    )
                )
            )

        def w_log():
            versions["crawl_log"] = self.crawl_log.append(
                _co(
                    results.select(
                        F.lit(r).alias("round"), "host", "host_rank",
                        "canon_url", "priority", "fetched",
                    )
                )
            )

        def w_edges():
            # host-level link graph: src = linking page's host, dst =
            # target URL's host, pre-aggregated to edge counts (the
            # trust_scores() input).  Post-scope links — the graph the
            # crawl actually follows.
            versions["host_edges"] = self.host_edges.append(
                links.select(
                    F.col("host").alias("src_host"),
                    url_host(F.col("url")).alias("dst_host"),
                )
                .groupBy("src_host", "dst_host")
                .agg(F.count("*").alias("n"))
                .withColumn("round", F.lit(r))
            )

        def w_state():
            # latest-record upsert keyed on canon_url: bucket-pruned
            # rewrite (tables.BucketedLog.merge_upsert) — only the
            # round's touched buckets move, never the full state log.
            # etag = the content digest (a strong validator, which is
            # what the sandbox web serves); last_modified = capture ts.
            st = (
                results.filter(F.col("fetched"))
                .select(
                    "canon_url", "host", "source",
                    F.col("digest"),
                    F.col("digest").alias("etag"),
                    F.col("warc_ts").alias("last_modified"),
                    F.col("status").alias("last_status"),
                    F.lit(r).alias("last_round"),
                )
                .dropDuplicates(["canon_url"])
            )
            versions["url_state"] = self.url_state.merge_upsert(
                st, metrics={"round": r}
            )

        sinks = [w_pages, w_errors, w_seen, w_visited, w_log]
        if self.host_edges is not None:
            sinks.append(w_edges)
        if self.url_state is not None:
            sinks.append(w_state)
        with ThreadPoolExecutor(max_workers=7) as pool:
            futs = [pool.submit(fn) for fn in sinks]
            n_new = pool.submit(w_links).result()
            for f in futs:
                f.result()  # surface the first failure
        t = _mark("appends", t)

        metrics.update(
            selected=int(n_sel),
            fetched=int(counts["n_fetched"] or 0),
            errors=n_err,
            new_urls=n_new,
            pages=n_pages,
        )
        self.catalog.save_checkpoint(r + 1, versions, metrics)
        parsed.unpersist()
        selected.unpersist()
        return metrics

    def run(self, max_rounds: int = 100) -> list[dict]:
        """Crawl until the frontier drains (or max_rounds)."""
        self.bootstrap()
        start = self.resume()
        out = []
        for r in range(start, start + max_rounds):
            m = self.round(r)
            out.append(m)
            if m["selected"] == 0:
                break
        return out

    # -- state views -----------------------------------------------------------

    def frontier_state(self) -> DataFrame | None:
        """FIXTURES.md §3 view: every discovered URL with its state."""
        log = self.frontier.read()
        if log is None:
            return None
        best = log.groupBy("canon_url").agg(
            F.min(F.struct("priority", "discovered_round", "depth", "url",
                           "host", "source")).alias("b")
        )
        v = self.visited.read()
        if v is None:
            return best.select(
                F.col("b.url").alias("url"), "canon_url",
                F.col("b.host").alias("host"),
                F.col("b.source").alias("source"),
                F.col("b.priority").alias("priority"),
                F.col("b.depth").alias("depth"),
                F.lit("pending").alias("state"),
            )
        return best.join(
            v.select("canon_url", "state"), "canon_url", "left"
        ).select(
            F.col("b.url").alias("url"), "canon_url",
            F.col("b.host").alias("host"),
            F.col("b.source").alias("source"),
            F.col("b.priority").alias("priority"),
            F.col("b.depth").alias("depth"),
            F.coalesce("state", F.lit("pending")).alias("state"),
        )
