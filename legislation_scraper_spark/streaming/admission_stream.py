"""Streaming frontier admission — the ingest-time twin of the batch
scope/trap gates (SURVEY.md §2.9 discipline: every crawl-path batch
operator gets a streaming formulation or a documented reason not to).

Discovered outlinks arrive as a stream during the crawl; admission
(SURT scope rules + crawler-trap template flags) is a PURE per-row
decision once the rule array and the flagged-template set are fixed
for the micro-batch window, so the streaming form is the same
stateless projection/broadcast-join pipeline — no watermark, no state
store.  That is itself the load-bearing design fact: by folding scope
rules in-row (sources/cdx.scope_filter) and keeping trap flags as a
small broadcast table (operators/traps.flag_trap_urls), admission
never becomes a stateful streaming operator, so it cannot accumulate
state or reorder the stream.  Trap-statistics REFRESH stays a batch
job over the accumulated pages table (the same split Heritrix makes:
scope decides online, analysis jobs feed it offline).

``stream_admission`` therefore accepts a STREAMING links frame plus
the two BATCH side inputs (rules, flagged templates) and returns the
annotated stream; ``admission_batch_twin`` is the identical
composition on a batch frame, and the parity test drives both over
the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.traps import flag_trap_urls
from ..sources.cdx import scope_filter


def _admit(
    links: DataFrame,
    rules: DataFrame,
    trap_stats: DataFrame,
    trap_threshold: float,
    default_allow: bool,
) -> DataFrame:
    flagged = flag_trap_urls(links, trap_stats, threshold=trap_threshold)
    scoped = scope_filter(flagged, rules, default_allow=default_allow)
    reason = (
        F.when(~F.col("allowed"), F.lit("out_of_scope"))
        .when(F.col("is_trap"), F.lit("trap"))
        .otherwise(F.lit("admitted"))
    )
    return scoped.select(
        "url",
        reason.alias("reason"),
        (reason == "admitted").alias("admitted"),
    )


def stream_admission(
    links: DataFrame,
    rules: DataFrame,
    trap_stats: DataFrame,
    trap_threshold: float = 4.0,
    default_allow: bool = False,
) -> DataFrame:
    """Annotate a STREAMING links frame (column ``url``) with
    (reason, admitted).  Stateless: streaming-batch joins against the
    broadcast rule fold and flagged-template set are allowed by
    Structured Streaming without watermarks, and the plan is the same
    one the batch twin runs."""
    return _admit(links, rules, trap_stats, trap_threshold, default_allow)


def admission_batch_twin(
    links: DataFrame,
    rules: DataFrame,
    trap_stats: DataFrame,
    trap_threshold: float = 4.0,
    default_allow: bool = False,
) -> DataFrame:
    """The identical admission composition on a batch frame."""
    return _admit(links, rules, trap_stats, trap_threshold, default_allow)
