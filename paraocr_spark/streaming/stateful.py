"""Stateful streaming operators.

* ``dedup_pages_stream`` — exactly-once URL dedup across micro-batches with
  Spark's native watermarked state store (the streaming upgrade of the
  reference's resume set, utils.py:30-50: instead of re-reading the output
  JSONL on every run, the state store remembers seen urls within the
  watermark horizon).

* ``site_stats_stream`` — custom stateful operator via
  ``applyInPandasWithState``: a running per-site (host) document/byte
  counter that survives across micro-batches. State is bounded by an
  EVENT-TIME timeout: a site idle past the horizon beyond the watermark is
  expired and its state removed, so per-site state cannot grow unboundedly
  at crawl scale. This is the pattern for any custom accumulating state
  Spark lacks natively (session windows over crawl hosts, adaptive quality
  thresholds, ...).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_pages_stream(pages_stream: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """Drop repeated urls arriving within the watermark horizon.

    Pure built-in: watermark bounds the state store so it cannot grow
    unboundedly at crawl scale.
    """
    return pages_stream.withWatermark("warc_ts", horizon).dropDuplicates(["url"])


_SITE_STATS_OUT = "site string, docs long, bytes long"
_SITE_STATS_STATE = "docs long, bytes long"


def _duration_ms(horizon: str) -> int:
    qty, unit = horizon.split()
    per = {"second": 1000, "minute": 60_000, "hour": 3_600_000,
           "day": 86_400_000}[unit.rstrip("s")]
    return int(qty) * per


def site_stats_stream(pages_stream: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """Running per-site totals via applyInPandasWithState.

    Emits the updated cumulative (docs, bytes) for each site seen in the
    micro-batch; state persists across batches via the checkpoint. A site
    with no documents for ``horizon`` past the watermark times out and its
    state is dropped (EventTimeTimeout) — bounded state at crawl scale.
    """
    horizon_ms = _duration_ms(horizon)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        docs, total = state.get if state.exists else (0, 0)
        batch_max_ms = 0
        for pdf in pdfs:
            docs += len(pdf)
            total += int(pdf["nbytes"].fillna(0).sum())
            if len(pdf):
                ts_max = pdf["warc_ts"].max()
                if pd.notna(ts_max):
                    batch_max_ms = max(batch_max_ms, int(ts_max.value // 1_000_000))
        state.update((docs, total))
        # expire this site's state once the watermark passes idle + horizon.
        # The watermark is 0 during the FIRST micro-batch; anchoring only on
        # it would give batch-1 sites a 1970-epoch timeout that fires the
        # moment the watermark jumps to real event time — so anchor on the
        # batch's own max event time as well
        anchor_ms = max(state.getCurrentWatermarkMs(), batch_max_ms)
        state.setTimeoutTimestamp(anchor_ms + horizon_ms)
        yield pd.DataFrame({"site": [key[0]], "docs": [docs], "bytes": [total]})

    sites = (
        pages_stream.withWatermark("warc_ts", horizon)
        .select(
            F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("site"),
            F.octet_length("html").alias("nbytes"),
            "warc_ts",
        )
    )
    return sites.groupBy("site").applyInPandasWithState(
        update,
        outputStructType=_SITE_STATS_OUT,
        stateStructType=_SITE_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
