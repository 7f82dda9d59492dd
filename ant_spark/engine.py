"""The crawl engine: ant's fetch-parse-enqueue loop as BSP DataFrame rounds.

Reference lifecycle (``/root/reference/engine.go:137-165``): seeds are
normalized, matcher-filtered, deduped and queued; workers dequeue, check
robots, wait for rate limits, fetch, scrape, enqueue discovered links; the
crawl ends when the queue's WaitGroup drains (``queue.go:94-118``).

Spark-native re-expression (SURVEY.md §3.1): one engine *round* processes the
whole eligible frontier as a DataFrame::

    eligible  = frontier WHERE not_before <= round_ts
    allowed   = eligible ⋈ robots (broadcast) WHERE robots_allowed
    admitted  = per-host budget window (politeness)         [W1-W4]
    fetched   = admitted LEFT JOIN pages ON url             [S2: fetch≡join]
    parsed    = fused Arrow parse UDF (links, text, ...)    [C1-C5]
    new       = links → normalize → matcher → first-occurrence
                → ANTI JOIN seen                            [J1: dedupe]
    frontier' = waiting ∪ deferred ∪ retries ∪ new(depth+1)
    seen'     = seen ∪ new
    commit: frontier'/seen' snapshots + fetched_log/metrics appends

State snapshots are parquet directories committed atomically per round
(tmp-write + manifest rename — the sandbox stand-in for Iceberg snapshot
commits; reference antcache/disk.go:390-423 did tmpfile+fsync+rename for the
same reason). A killed job resumes from the last complete round with
identical ordering because every round is a pure function of
(state tables, round number).

Determinism: the reference is only deterministic at Workers=1
(engine_test.go:39-48 sorts otherwise); ``ordering='bfs'`` reproduces that
sequential FIFO order exactly via the global ``seq`` scheme;
``ordering='partitioned'`` keeps seq assignment deterministic but windows it
per hash-partition so no total order is ever materialized (the 10^10-scale
mode — matches the reference's Workers>1 "any order" semantics).
"""

from __future__ import annotations

import json
import math
import os
import tempfile
import time
from dataclasses import dataclass, field
from typing import Any, Callable

_TRACE = os.environ.get("ANT_SPARK_TRACE", "") == "1"


def _trace(label: str, t0: float) -> float:
    if _TRACE:
        print(f"    [trace] {label}: {time.time() - t0:.2f}s", flush=True)
    return time.time()

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from ant_spark import schemas
from ant_spark.functions import urlnorm
from ant_spark.functions.parse import make_parse_udf
from ant_spark.functions.urlnorm import (
    host_of,
    is_queueable,
    normalize_udf,
    normalize_url,
    path_of,
    url_hash,
)
from ant_spark.operators import politeness, robots as robots_ops
from ant_spark.operators.politeness import UNLIMITED_BUDGET
from ant_spark.operators.dedupe import BloomSidecar, exact_new, first_occurrence


class CrawlError(RuntimeError):
    """Raised in strict mode on permanent fetch errors — the reference
    aborts the whole crawl via errgroup on any process error
    (engine.go:236-241, engine_test.go:67-77)."""


@dataclass
class CrawlConfig:
    ua: str = "antbot"  # reference default UA (fetcher.go:25)
    matcher: Callable | None = None  # Column-predicate builder (matchers.py)
    round_seconds: float = 1.0  # logical round duration (politeness clock)
    default_host_budget: int = UNLIMITED_BUDGET  # per-host rows/round cap
    host_rates: dict[str, int] = field(default_factory=dict)  # LimitHostname
    global_rate: int | None = None  # Limit(n) — global rows/round
    max_attempts: int = 5  # fetcher.go:100-104 default
    min_backoff_ms: int = 50  # fetcher.go minBackoff
    max_backoff_ms: int = 1000  # fetcher.go maxBackoff
    # HTTP redirects (Go http.Client follow semantics, operators/redirects):
    # when the pages table carries a ``redirect_to`` column, 3xx chains are
    # collapsed ONCE per crawl (pre-resolved at staging time in
    # create_pages_table's bucketed mode) so the fetch join yields the
    # FINAL page under the requested url; links resolve against final_url.
    # max_redirects mirrors Go's 10-hop cap (excess/cycles → 508, permanent);
    # redirect_seen=True additionally enters final urls into the seen set so
    # a later direct link to the target is not refetched (the reference,
    # which never sees intermediate hops, would refetch — documented
    # divergence in PARITY.md; set False for byte parity).
    max_redirects: int = 10
    redirect_seen: bool = True
    # opt-in 10th normalization rule (urlnorm.strip_tracking): drop
    # utm_*/gclid/fbclid/… query params after reference normalization —
    # session-tracking params make one document enumerable under unbounded
    # URLs, inflating a 10^10 frontier and defeating the exact seen set.
    # Default False keeps byte parity with the Go normalize goldens.
    strip_tracking_params: bool = False
    max_rounds: int | None = None
    max_depth: int | None = None
    # exact | bloom_prefilter | bloom_drop | cuckoo_prefilter | cuckoo_drop
    # (_drop modes reproduce reference DedupeBF false-positive losses)
    dedupe: str = "exact"
    link_selector: str = "a[href]"  # Page.Next(selector) — page.go:103-105
    # what lands in fetched_log.text: 'scan' = reference scan.Text (every
    # text node, nodes.go:27-48); 'main' = boilerplate-stripped body text
    # (functions/readability) extracted in the SAME fused parse pass — a
    # training-corpus build needs no second decode of the html column.
    text_mode: str = "scan"
    # Queue policy (reference Queue interface, queue.go:12-49): 'fifo' is
    # the memoryQueue's order; 'priority' dequeues by (priority asc, seq).
    queue_policy: str = "fifo"
    # priority for newly discovered links: Column fn over the link row
    # (columns: url, url_hash, parent_seq, parent_depth, link_idx)
    priority_fn: Callable | None = None
    # URL-level priority signal TABLE: a (url, priority double) DataFrame
    # left-joined onto newly discovered links each round (collision-safe
    # url_hash+url key). This is the frontier-scale twin of
    # graphops.rank_priority_fn's driver map: a 10^10-URL rank table rides
    # as a broadcast/bucketed join, never a literal. Misses fall back to
    # priority_fn (or 0). Build from pagerank() output via
    # graphops.rank_priority_table.
    priority_join: Any = None
    # True (default): hint the rank table broadcast — right for trimmed
    # signal tables (the common case; audit-pinned, the discovered-links
    # stream never shuffles for the join). False for a corpus-scale rank
    # table: store BOTH sides url_hash-bucketed and let the SMJ run
    # storage-partitioned instead.
    priority_join_broadcast: bool = True
    # LimitPattern/LimitRegexp rules: (kind in {pattern,regexp}, expr, n/sec)
    pattern_rates: list = field(default_factory=list)
    # 'all' (reference-exact: every matching limiter binds, chained per-rule
    # windows) | 'first_match' (one window; identical for disjoint rules)
    pattern_rule_mode: str = "all"
    # robots freshness TTL (internal/robots/cache.go:36-78: entries expire
    # after maxAge=1h and the next Allowed() triggers a re-fetch). None
    # (default) = static robots snapshot, the single-shot-crawl behavior.
    # A value makes the input robots df a FEED: with an optional
    # valid_from_round column the version live at round r is the row with
    # max valid_from_round <= r per host; the engine stamps each host's
    # cached version with fetched_round and re-reads it only once its age
    # (rounds x round_seconds) reaches the TTL — so a robots flip mid-crawl
    # changes allow/deny exactly when the reference's cache would re-fetch.
    robots_max_age_seconds: float | None = None
    max_age_seconds: float | None = None  # cache freshness (S5); needs crawl_ts
    crawl_ts: Any = None  # datetime 'now' for freshness tests
    # S4 render seam (antcdp/client.go — a pluggable client that returns
    # chrome-RENDERED html): a bytes→bytes kernel applied to fetched html
    # between the fetch join and the parse UDF, so JS-injected links enter
    # the frontier like static ones. render_when optionally gates it per
    # row (a Column-builder over the fetched-row columns); None renders
    # every 200, matching the reference's whole-fetcher swap. Kernels in
    # operators/render.py (fake_js_renderer sandbox stand-in; cdp_renderer
    # marks the real-chrome boundary).
    render_fn: Callable | None = None
    render_when: Callable | None = None
    # 'partitioned' is the default (scale-safe: seq windows are per
    # hash-partition, no global sort ever materializes). 'bfs' is the opt-in
    # sequential-parity mode reproducing the reference's Workers=1 FIFO order
    # via ONE global window — never the default at 10^10-frontier scale.
    ordering: str = "partitioned"  # partitioned | bfs
    seq_partitions: int = 32  # partitioned-ordering hash fan-out
    state_partitions: int = 32  # url_hash buckets for frontier/seen snapshots
    # Budget-window skew handling. Catalyst's InferWindowGroupLimit only
    # fires for rank <= LITERAL, and the engine's budget is a per-row
    # column — so with salt<=1 the engine adds a driver-computed foldable
    # budget cap (_politeness_budget_cap: max budget any limited row can
    # have, from config rates + the robots dim) as a literal conjunct,
    # restoring the map-side pruning (hot hosts cut to ≤ cap rows per input
    # partition BEFORE the shuffle), and routes unlimited rows around the
    # window entirely. Measured ~2× faster than the manual salted two-phase
    # and ~3× faster than the uncapped window on a 90%-one-host frontier
    # (tools/skew_politeness_demo.py asserts plans + identical outputs).
    # salt>1 keeps the explicit two-phase form for engines without the
    # pushdown.
    politeness_salt: int = 1
    scrape_spec: dict[str, Any] | None = None
    strict: bool = False  # raise CrawlError on permanent errors
    checkpoint_dir: str | None = None  # resumable state root (None → temp)
    bloom_buckets: int = 32
    bloom_bits: int = 1 << 21
    # Seen-state layout. 'parquet': per-round delta dirs + periodic
    # compaction (default — lowest fixed cost per round at sandbox scale).
    # 'bucketed': the seen set lives in ONE external table CLUSTERED BY
    # url_hash (the plain-Spark stand-in for an Iceberg bucket(N, url_hash)
    # table); candidate links are staged into a same-bucketed table each
    # round so the exact anti-join is storage-partitioned — NO Exchange on
    # the seen side. At a 10^10-URL seen set that Exchange is the round's
    # dominant cost, so 'bucketed' is the cluster-scale mode.
    # 'auto' starts on parquet deltas (lowest fixed cost for BFS ramp-up)
    # and migrates the seen set into the bucketed table once it crosses
    # bucketed_switch_rows — small crawls never pay the staging overhead,
    # wide frontiers get the Exchange-free anti-join without opting in.
    state_backend: str = "auto"  # auto | parquet | bucketed
    # Pages-side storage bucketing for the FETCH join (the engine's biggest
    # join: frontier ⋈ pages on url, html-heavy). Default (None): AQE
    # broadcasts the small frontier side and the page corpus streams in
    # place. At 100 TB neither side broadcasts and a plain equi-join would
    # SHUFFLE THE HTML — the round's dominant cost. Set ``pages_table`` to
    # the name of a session table CLUSTERED BY (url) (Iceberg
    # bucket(N, url) analogue; see Engine.create_pages_table): each round
    # the admitted frontier is staged into a table bucketed the same way
    # (a shuffle-free write of the tiny side), and the fetch join becomes a
    # storage-partitioned sort-merge join with ZERO Exchanges — the pages
    # scan is read in place (tools/bucketed_fetch_ab.py is the measured
    # A/B + plan proof). ``fetch_buckets`` must match the table's bucket
    # count.
    pages_table: str | None = None
    fetch_buckets: int = 32
    # 'auto' migration threshold: the bucketed mode pays ~1.5s/round of
    # candidate-staging overhead to delete the seen-side Exchange, so it
    # should engage once that Exchange is the bigger cost. Local A/B puts
    # the single-node crossover above 240k rows (in-RAM shuffles are nearly
    # free); on a real cluster network shuffle makes it pay far earlier —
    # tune per deployment.
    bucketed_switch_rows: int = 1_000_000
    # Stage counters: 'observe' piggybacks df.observe accumulators on the
    # jobs that already run (zero extra Spark jobs per round; counts recorded
    # with partition=-1); 'partition' runs the per-partition lineage job
    # (one extra concurrent job) — the full north-rule lineage mode.
    metrics_mode: str = "observe"  # observe | partition
    # Compact the append-only seen deltas into one base dir whenever more
    # than this many delta dirs accumulate (reference sweeper analogue,
    # antcache/disk.go:310-377; production = Iceberg compaction). Keeps the
    # per-round seen scan O(1) dirs instead of O(rounds).
    seen_compact_every: int = 16
    # Expire per-round STATE (frontier/seen_delta/bloom) older than this many
    # rounds behind the latest commit; fetched_log/extracted/MANIFEST are
    # never expired (they are the crawl's output + audit trail). None = keep
    # everything (debugging).
    expire_state_rounds: int | None = 2


@dataclass
class CrawlResult:
    rounds: int
    pages_fetched: int
    urls_enqueued: int
    fetched_log: DataFrame
    metrics: DataFrame
    extracted: DataFrame | None
    state_dir: str
    crawl_wall_sec: float = 0.0  # time inside rounds (excludes seed bootstrap)


def _backoff_ms(attempt_col, min_ms: int, max_ms: int):
    """Quadratic backoff, capped (fetcher.go:248-270: dur=attempt²·min)."""
    return F.least(
        (attempt_col * attempt_col * F.lit(min_ms)).cast("long"), F.lit(max_ms)
    )


class Engine:
    """Crawl over a simulated web (the ``pages`` table) — reference Engine.

    ``pages_df`` plays the network: fetch is a left equi-join on ``url``
    (SURVEY.md §2.1 S2). A missing row is a 404 (consumed silently,
    fetcher.go:157-161); ``status=503`` rows are temporary failures until
    ``attempt >= ok_after_attempt`` (fetcher.go:63-69 retry semantics, with
    the wall-clock backoff re-expressed as the ``not_before`` column).
    """

    def __init__(
        self,
        spark: SparkSession,
        pages_df: DataFrame,
        robots_df: DataFrame | None,
        cfg: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.cfg = cfg or CrawlConfig()
        if self.cfg.pages_table is not None:
            # bucketed fetch mode: the page corpus is a url-bucketed session
            # table (create_pages_table); bucketing metadata only survives a
            # spark.table() read, never a raw parquet path read.
            self.pages = spark.table(self.cfg.pages_table)
        else:
            self.pages = pages_df
        if robots_df is None:
            robots_df = spark.createDataFrame([], schemas.ROBOTS)
        self.robots = robots_df
        self._parse_udf = make_parse_udf(
            self.cfg.scrape_spec, self.cfg.link_selector, self.cfg.text_mode
        )
        from ant_spark.functions.urlnorm import make_normalize_udf

        self._norm_udf = make_normalize_udf(self.cfg.strip_tracking_params)
        self._robots_has_delay: bool | None = None
        self._robots_empty: bool | None = None
        self._robots_cache: DataFrame | None = None  # TTL mode per-host cache
        self._max_delay_budget: int | None = None
        if self.cfg.dedupe.startswith("bloom"):
            self._bloom = BloomSidecar(self.cfg.bloom_buckets, self.cfg.bloom_bits)
        elif self.cfg.dedupe.startswith("cuckoo"):
            from ant_spark.operators.dedupe import CuckooSidecar

            self._bloom = CuckooSidecar(
                self.cfg.bloom_buckets, max(4096, self.cfg.bloom_bits // 16)
            )
        else:
            self._bloom = None

    @staticmethod
    def create_pages_table(
        spark: SparkSession,
        pages_df: DataFrame,
        name: str,
        path: str,
        buckets: int = 32,
    ) -> DataFrame:
        """Write the page corpus as a url-bucketed external table — the
        plain-Spark stand-in for an Iceberg ``bucket(N, url)`` table (same
        idiom as the seen/links staging tables). One-time cost; every fetch
        join afterwards reads the html-bearing side in place with no
        Exchange. Pass the table name as ``CrawlConfig.pages_table`` with
        ``fetch_buckets=buckets``.

        A ``redirect_to`` column is collapsed HERE (operators/redirects):
        the stored table already carries final-page content + final_url, so
        the per-round fetch join stays a pure storage-partitioned SMJ —
        redirect chasing never touches the hot path."""
        if "redirect_to" in pages_df.columns:
            from ant_spark.operators.redirects import resolve_redirects

            pages_df = resolve_redirects(pages_df)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            # repartition on the bucket key: one write task per bucket —
            # one file per bucket instead of up to tasks×buckets (r7,
            # guide §6; this is the corpus write, so the file-count blowup
            # here also cost every subsequent fetch-join scan)
            pages_df.repartition(buckets, F.col("url"))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(buckets, "url")
            .sortBy("url")
            .option("path", path)
            .saveAsTable(name)
        )
        return spark.table(name)

    @staticmethod
    def create_rank_table(
        spark: SparkSession,
        rank_df: DataFrame,
        name: str,
        path: str,
        buckets: int = 32,
    ) -> DataFrame:
        """Write a (url, priority) rank signal as a url_hash-bucketed
        external table — the corpus-scale form of ``CrawlConfig.
        priority_join`` (10^10-row PageRank tables that no driver map or
        broadcast can carry). With ``priority_join_broadcast=False`` and
        ``state_backend='bucketed'`` the engine joins this table against
        the same-bucketed staged links each round as a storage-partitioned
        sort-merge join: the rank side is read in place with NO Exchange
        (the fetch-join idiom, queue.go:12-49 priority seam at frontier
        scale). ``buckets`` must equal ``CrawlConfig.state_partitions``."""
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            rank_df.select(
                url_hash(F.col("url")).alias("url_hash"),
                "url",
                F.col("priority").cast("double").alias("priority"),
            )
            # one write task per bucket (see create_pages_table)
            .repartition(buckets, F.col("url_hash"))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(buckets, "url_hash")
            .sortBy("url_hash")
            .option("path", path)
            .saveAsTable(name)
        )
        return spark.table(name)

    def _robots_is_empty(self) -> bool:
        if self._robots_empty is None:
            self._robots_empty = self.robots.limit(1).count() == 0
        return self._robots_empty

    def _robots_for_round(self, r: int) -> DataFrame:
        """The robots dim the round's broadcast join should see.

        Static mode (robots_max_age_seconds=None): the input snapshot,
        unchanged. TTL mode: per-host versions cached with a fetched_round
        stamp; a host re-reads from the feed (max valid_from_round <= r per
        host) only when its cached age reaches the TTL — the BSP analogue
        of the reference's 1h robots cache expiry (cache.go:36-78). The
        cache is dim-sized (one row per host), so the per-round upkeep is
        one anti-join over a broadcast-scale table, eagerly
        local-checkpointed to keep lineage O(1) across rounds. On resume
        the cache rebuilds from the feed at the resumed round (a fresh
        re-fetch — conservative and always robots-compliant).
        """
        cfg = self.cfg
        if cfg.robots_max_age_seconds is None:
            return self.robots
        ttl_rounds = max(1, math.ceil(cfg.robots_max_age_seconds / cfg.round_seconds))
        feed = self.robots
        if "valid_from_round" in feed.columns:
            wv = Window.partitionBy("host").orderBy(
                F.col("valid_from_round").desc_nulls_last()
            )
            active = (
                feed.filter(F.coalesce(F.col("valid_from_round"), F.lit(0)) <= r)
                .withColumn("_rn", F.row_number().over(wv))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "valid_from_round")
            )
        else:
            active = feed
        active = active.drop("fetched_round").withColumn(
            "fetched_round", F.lit(r).cast("int")
        )
        if self._robots_cache is None:
            cur = active
        else:
            keep = self._robots_cache.filter(
                F.lit(r) - F.col("fetched_round") < F.lit(ttl_rounds)
            )
            # stale hosts AND hosts newly appearing in the feed re-read
            refreshed = active.join(
                keep.select(F.col("host").alias("_h")),
                active["host"] == F.col("_h"),
                "left_anti",
            )
            cur = keep.unionByName(refreshed)
        cur = cur.localCheckpoint(eager=True)
        self._robots_cache = cur
        return cur

    def _politeness_static_off(self) -> bool:
        """True when no budget can ever bind: no host/global rates configured
        and no robots body mentions a crawl-delay (checked once, tiny dim)."""
        cfg = self.cfg
        if cfg.host_rates or cfg.global_rate is not None or cfg.pattern_rates:
            return False
        if cfg.default_host_budget < UNLIMITED_BUDGET:
            return False
        if self._robots_has_delay is None:
            self._robots_has_delay = (
                self.robots.filter(
                    F.lower(F.coalesce(F.col("body"), F.lit(""))).contains("crawl-delay")
                )
                .limit(1)
                .count()
                > 0
            )
        return not self._robots_has_delay

    def _politeness_budget_cap(self) -> int:
        """A FOLDABLE upper bound on any LIMITED row's budget, computed once
        per run on the driver (config rates + one tiny agg over the robots
        dim for the largest crawl-delay-derived budget). The literal is what
        lets Catalyst's InferWindowGroupLimit prune hot hosts map-side — a
        per-row budget column alone gets no pushdown (the filter must
        compare against a literal)."""
        import math

        cfg = self.cfg
        cands = [1]
        if cfg.default_host_budget < UNLIMITED_BUDGET:
            cands.append(int(cfg.default_host_budget))
        for n in (cfg.host_rates or {}).values():
            cands.append(int(math.floor(float(n) * cfg.round_seconds)))
        if not self._robots_is_empty():
            if self._max_delay_budget is None:
                from ant_spark.operators.robots import make_delay_udf

                d = make_delay_udf(cfg.ua)(F.col("body"), F.col("status"))
                # the SAME expression host_budget_expr applies per row, so
                # the cap can never drift below a row's real budget
                b = politeness.delay_budget_expr(cfg.round_seconds, d)
                row = self.robots.agg(F.max(b)).collect()[0][0]
                self._max_delay_budget = int(row) if row is not None else 0
            cands.append(self._max_delay_budget)
        return max(cands)

    # ------------------------------------------------------------------
    # state management (parquet snapshot per round + manifest commit)

    def _init_dirs(self) -> str:
        d = self.cfg.checkpoint_dir or tempfile.mkdtemp(prefix="ant_spark_")
        os.makedirs(d, exist_ok=True)
        return d

    def _round_dir(self, root: str, r: int) -> str:
        return os.path.join(root, f"round={r:05d}")

    def _commit_round(self, root: str, r: int, manifest: dict) -> None:
        tmp = os.path.join(self._round_dir(root, r), "_manifest.tmp")
        final = os.path.join(self._round_dir(root, r), "MANIFEST.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)  # atomic commit (disk.go:390-423 analogue)

    def latest_round(self, root: str) -> tuple[int, dict] | None:
        best = None
        if not os.path.isdir(root):
            return None
        for name in os.listdir(root):
            if name.startswith("round="):
                mf = os.path.join(root, name, "MANIFEST.json")
                if os.path.exists(mf):
                    r = int(name.split("=")[1])
                    if best is None or r > best[0]:
                        with open(mf) as f:
                            best = (r, json.load(f))
        return best

    def _write_state(self, root: str, r: int, name: str, df: DataFrame, n_parts: int | None = None) -> DataFrame:
        path = os.path.join(self._round_dir(root, r), name)
        w = df
        if n_parts:
            # hash-distribute state by url_hash (at cluster scale: Iceberg
            # bucket partitioning → storage-partitioned anti-join). No
            # explicit N: AQE coalesces tiny frontiers, keeps large ones
            # parallel up to spark.sql.shuffle.partitions.
            w = df.repartition(F.col("url_hash"))
        w.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    def _seen_write(self, root: str, r: int, delta: DataFrame) -> None:
        """Commit a seen delta: parquet dir per round, or an append into the
        url_hash-bucketed seen table (Iceberg bucketed-append analogue)."""
        if self._bucketed:
            # repartition on the bucket key: the appended delta adds ONE
            # file per bucket per round instead of one per (task, bucket) —
            # the accumulated table otherwise grows toward rounds×tasks×
            # buckets tiny files and the per-round seen scan pays for every
            # one of them (r7, guide §6)
            w = (
                delta.repartition(self.cfg.state_partitions, F.col("url_hash"))
                .write.mode("overwrite" if r == 0 else "append")
                .format("parquet")
                .bucketBy(self.cfg.state_partitions, "url_hash")
                .sortBy("url_hash")
            )
            if r == 0:
                w = w.option("path", self._seen_tbl_path)
            w.saveAsTable(self._seen_tbl)
        else:
            self._write_state(root, r, "seen_delta", delta)

    def _seen_compact(self, root: str, r: int) -> str:
        """Rewrite the bucketed seen table into fresh per-bucket files at a
        NEW versioned path (Iceberg ``rewrite_data_files`` analogue): append
        mode adds one file per bucket per round, so a 1000-round crawl would
        otherwise scan O(rounds × buckets) files. The manifest committed
        right after records the new path — a crash in between resumes on the
        old path (still on disk). Returns the old path for post-commit
        deletion."""
        spark = self.spark
        old_path = self._seen_tbl_path
        new_path = os.path.join(root, f"seen_tbl_r{r:05d}")
        df = spark.read.parquet(old_path).select("url_hash", "url", "round")
        spark.sql(f"DROP TABLE IF EXISTS {self._seen_tbl}")
        self._seen_tbl_path = new_path
        (
            df.repartition(self.cfg.state_partitions, F.col("url_hash"))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(self.cfg.state_partitions, "url_hash")
            .sortBy("url_hash")
            .option("path", new_path)
            .saveAsTable(self._seen_tbl)
        )
        return old_path

    def _seen_register(self) -> None:
        """(Resume) re-register the external bucketed seen table.

        DROP first: a same-session catalog entry can be stale — e.g. a crash
        between ``_seen_compact`` (which re-points the catalog at the new
        path) and the manifest commit leaves the catalog at a path the
        manifest never recorded; appends would then land in a location the
        next compaction ignores, losing seen rows. The manifest's path wins.
        """
        self.spark.sql(f"DROP TABLE IF EXISTS {self._seen_tbl}")
        self.spark.sql(
            f"CREATE TABLE {self._seen_tbl} "
            "(url_hash BIGINT, url STRING, round INT) USING PARQUET "
            "CLUSTERED BY (url_hash) SORTED BY (url_hash) "
            f"INTO {self.cfg.state_partitions} BUCKETS "
            f"LOCATION '{self._seen_tbl_path}'"
        )

    def _seen_read(self, r: int, seen_paths: list[str]) -> DataFrame:
        """The membership set visible to round ``r``. Bucketed mode filters
        ``round <= r``: an append orphaned by a crash between the table
        append and the manifest commit carries round r+1, so the first
        resumed round excludes it; once that round commits its own
        (identical, deterministic) delta the orphan is a harmless subset."""
        if self._bucketed:
            return self.spark.table(self._seen_tbl).filter(F.col("round") <= r)
        return self.spark.read.parquet(*seen_paths)

    # ------------------------------------------------------------------

    def seed_frontier(self, seeds: list[str]) -> "pd.DataFrame":
        """Normalize + scheme-check seeds (engine.go:174-193: invalid seeds
        are a hard error, non-http(s) schemes are rejected)."""
        import pandas as pd

        rows = []
        seen_local: set[str] = set()
        seq = 0
        from ant_spark.functions.urlnorm import strip_tracking

        for raw in seeds:
            u = normalize_url(raw)  # raises ValueError like engine.Enqueue
            if self.cfg.strip_tracking_params:
                u = strip_tracking(u)
            scheme = u.split("://", 1)[0] if "://" in u else ""
            if scheme not in ("http", "https"):
                raise ValueError(f"ant_spark: invalid seed scheme: {raw!r}")
            if u in seen_local:
                continue
            seen_local.add(u)
            rows.append(
                {
                    "url": u,
                    "host": u.split("://", 1)[1].split("/", 1)[0],
                    "depth": 0,
                    "seq": seq,
                    "priority": 0.0,
                    "attempt": 1,
                    "not_before": 0,
                }
            )
            seq += 1
        return pd.DataFrame(
            rows,
            columns=["url", "host", "depth", "seq", "priority", "attempt", "not_before"],
        )

    def run(self, seeds: list[str], resume: bool = False) -> CrawlResult:
        cfg = self.cfg
        spark = self.spark
        root = self._init_dirs()
        if cfg.state_backend not in ("auto", "parquet", "bucketed"):
            raise ValueError(f"unknown state_backend {cfg.state_backend!r}")
        if cfg.metrics_mode not in ("observe", "partition"):
            # an unknown mode would silently zero every stage counter (and
            # frontier_count with it, ending the crawl after one round)
            raise ValueError(f"unknown metrics_mode {cfg.metrics_mode!r}")
        self._bucketed = cfg.state_backend == "bucketed"
        if cfg.state_backend != "parquet" or cfg.pages_table is not None:
            import hashlib

            dig = hashlib.md5(root.encode()).hexdigest()[:10]
            self._adm_tbl = f"ant_adm_{dig}"
        if cfg.state_backend != "parquet":
            self._seen_tbl = f"ant_seen_{dig}"
            self._links_tbl = f"ant_links_{dig}"
            self._seen_tbl_path = os.path.join(root, "seen_tbl_r00000")
            self._since_compact = 0
        if not resume:
            # fresh run into an existing checkpoint_dir: clear stale round=*
            # state — otherwise the end-of-run glob folds a previous crawl's
            # fetched_log/extracted into this CrawlResult.
            import shutil
            import warnings

            stale = [n for n in os.listdir(root) if n.startswith("round=")]
            if stale:
                warnings.warn(
                    f"ant_spark: fresh run (resume=False) into existing "
                    f"checkpoint_dir {root!r} — deleting {len(stale)} prior "
                    f"round=* dir(s) including their fetched_log/extracted "
                    f"output; pass resume=True to continue the previous crawl",
                    stacklevel=2,
                )
            for name in stale:
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
            if cfg.state_backend != "parquet":
                spark.sql(f"DROP TABLE IF EXISTS {self._seen_tbl}")
                spark.sql(f"DROP TABLE IF EXISTS {self._links_tbl}")
                for name in os.listdir(root):
                    if name.startswith("seen_tbl"):
                        shutil.rmtree(os.path.join(root, name), ignore_errors=True)
            if cfg.pages_table is not None:
                spark.sql(f"DROP TABLE IF EXISTS {self._adm_tbl}")

        pages_src = self.pages
        if cfg.max_age_seconds is not None and cfg.crawl_ts is not None:
            # cache freshness (S5, aggressive mode): stale rows fall out of
            # the fetch join — a cache miss with no origin behind it (404).
            from ant_spark.operators.cache import fresh_only

            pages_src = fresh_only(
                pages_src, F.lit(cfg.crawl_ts), cfg.max_age_seconds
            )
        if "redirect_to" in pages_src.columns and cfg.max_redirects > 0:
            # collapse 3xx chains once per crawl (Go http.Client follow);
            # create_pages_table pre-resolves at staging time, so the
            # bucketed path arrives here already carrying final_url.
            from ant_spark.operators.redirects import resolve_redirects

            pages_src = resolve_redirects(pages_src, cfg.max_redirects)
        has_redirects = "final_url" in pages_src.columns
        page_cols = [
            F.col("url").alias("_p_url"),
            "warc_ts",
            "html",
            F.col("status").alias("_p_status"),
            "ok_after_attempt",
        ]
        if has_redirects:
            page_cols.append(F.col("final_url").alias("_p_final_url"))
        pages = pages_src.select(*page_cols)
        # NOTE on the fetch join's pages side: no engine-side repartition or
        # cache — measured slower here. Default mode: AQE broadcasts the
        # (small) frontier side, so the html-heavy page corpus is streamed
        # in place and never exchanged. Cluster-scale mode
        # (cfg.pages_table): the corpus is a url-bucketed table and each
        # round's admitted frontier is staged into the same bucketing, so
        # the join is a storage-partitioned SMJ with ZERO Exchanges even
        # when neither side broadcasts (tools/bucketed_fetch_ab.py).

        start = self.latest_round(root) if resume else None
        if start is not None:
            r0, manifest = start
            frontier = spark.read.parquet(os.path.join(self._round_dir(root, r0), "frontier"))
            seen_paths = [os.path.join(root, p) for p in manifest["seen_paths"]]
            # the MANIFEST is authoritative for which backend holds the seen
            # state: resuming a parquet-phase checkpoint as if it were
            # bucketed would register an EMPTY table and re-crawl everything.
            manifest_bucketed = bool(manifest.get("bucketed_active", False))
            if manifest_bucketed and cfg.state_backend == "parquet":
                raise ValueError(
                    "checkpoint was committed with the bucketed seen backend; "
                    "resume with state_backend='auto' or 'bucketed'"
                )
            self._bucketed = manifest_bucketed
            # (cfg 'bucketed' over a parquet-phase manifest resumes on
            # parquet and migrates at the next commit — see the migration
            # condition in the round loop.)
            if self._bucketed:
                rel = manifest.get("seen_table_path") or "seen_tbl_r00000"
                self._seen_tbl_path = os.path.join(root, rel)
                self._seen_register()
            next_seq = manifest["next_seq"]
            total_fetched = manifest["total_fetched"]
            total_enqueued = manifest["total_enqueued"]
            frontier_count = manifest["frontier_count"]
            # manifest at round=N holds the state FOR round N (committed at
            # the end of round N-1), so the next engine round is N itself.
            r = r0
            bloom_state = (
                spark.read.parquet(os.path.join(self._round_dir(root, r0), "bloom"))
                if self._bloom
                else None
            )
        elif isinstance(seeds, DataFrame):
            # bulk seed path: a DataFrame with a normalized `url` column —
            # seq assigned JVM-side, partition-parallel (unique+deterministic:
            # rank-within-hash-partition × stride + partition), for huge seed
            # sets where a total order or driver-side Python would serialize.
            # An optional `priority` column (higher = more important, e.g. a
            # sitemap's <priority>) becomes the queue priority (negated —
            # lower dequeues first), observed under queue_policy='priority'.
            P = cfg.seq_partitions
            part = F.pmod(F.xxhash64("url"), F.lit(P))
            w = Window.partitionBy(part).orderBy("url")
            if cfg.strip_tracking_params:
                # idempotent re-normalize+strip: same-document urls that
                # differ only in tracking params collapse BEFORE the
                # one-row-per-url aggregation below
                seeds = seeds.withColumn("url", self._norm_udf(F.col("url")))
            has_prio = "priority" in seeds.columns
            if has_prio:
                # one row per URL even when the same URL carries different
                # priority hints (e.g. merged sitemap files): max = the
                # most-important hint wins (higher-wins convention, negated
                # below). A plain distinct over (url, priority) would enqueue
                # the URL twice with two seqs — double-fetched and
                # double-counted in budgets/metrics.
                seed_urls = seeds.groupBy("url").agg(
                    F.max("priority").alias("priority")
                )
            else:
                seed_urls = seeds.select("url").distinct()
            if cfg.matcher is not None:
                # matcher BEFORE seq assignment: excluded seeds must not
                # consume seq values later reused by discovered links
                # (seq is the global-uniqueness key for budget anti-joins).
                seed_urls = seed_urls.filter(cfg.matcher(F.col("url")))
            prio_col = (
                (-F.col("priority")).cast("double") if has_prio else F.lit(0.0)
            )
            frontier = (
                seed_urls
                .withColumn(
                    "seq",
                    (F.row_number().over(w).cast("long") - 1) * P + part.cast("long"),
                )
                .select(
                    "url",
                    url_hash(F.col("url")).alias("url_hash"),
                    host_of(F.col("url")).alias("host"),
                    F.lit(0).alias("depth"),
                    "seq",
                    prio_col.alias("priority"),
                    F.lit(1).alias("attempt"),
                    F.lit(0).cast("long").alias("not_before"),
                )
            )
            frontier = self._write_state(
                root, 0, "frontier", frontier, n_parts=cfg.state_partitions
            )
            self._seen_write(
                root, 0,
                frontier.select("url_hash", "url", F.lit(0).alias("round")),
            )
            seen_paths = (
                [] if self._bucketed
                else [os.path.join(self._round_dir(root, 0), "seen_delta")]
            )
            frontier_count = int(frontier.count())
            next_seq = frontier_count * P  # seq upper bound in partitioned scheme
            total_fetched = 0
            total_enqueued = frontier_count
            r = 0
            bloom_state = None
            if self._bloom:
                bloom_state = self._bloom.add(frontier, self._bloom.empty_state(spark))
                bloom_state = self._write_state(root, 0, "bloom", bloom_state)
        else:
            seed_pdf = self.seed_frontier(seeds)
            frontier = spark.createDataFrame(seed_pdf, schema=(
                "url string, host string, depth int, seq long, priority double, "
                "attempt int, not_before long"
            )).withColumn("url_hash", url_hash(F.col("url"))).select(
                "url", "url_hash", "host", "depth", "seq", "priority", "attempt", "not_before"
            )
            if cfg.matcher is not None:
                # matcher runs BEFORE dedupe/enqueue (engine.go:201,338-349)
                frontier = frontier.filter(cfg.matcher(F.col("url")))
            frontier = self._write_state(root, 0, "frontier", frontier)
            self._seen_write(
                root, 0,
                frontier.select("url_hash", "url", F.lit(0).alias("round")),
            )
            seen_paths = (
                [] if self._bucketed
                else [os.path.join(self._round_dir(root, 0), "seen_delta")]
            )
            # next_seq from max(seq)+1, NOT count(): a matcher that excludes
            # a seed must not let discovered links reuse survivors' seqs
            # (seq uniqueness drives split_by_budget/global_limit anti-joins).
            agg = frontier.agg(
                F.count("*").alias("n"), F.max("seq").alias("mx")
            ).collect()[0]
            frontier_count = int(agg["n"])
            next_seq = int(agg["mx"]) + 1 if agg["mx"] is not None else 0
            total_fetched = 0
            total_enqueued = frontier_count
            r = 0
            bloom_state = None
            if self._bloom:
                bloom_state = self._bloom.add(frontier, self._bloom.empty_state(spark))
                bloom_state = self._write_state(root, 0, "bloom", bloom_state)

        # Corpus-scale priority signal (priority_join_broadcast=False in the
        # bucketed exact-dedupe mode): project the rank table ONCE, keeping
        # its stored url_hash column so the storage bucketing survives the
        # projection — the per-round join against the staged (same-bucketed)
        # links table is then a storage-partitioned SMJ: the huge rank side
        # is read in place with ZERO Exchange (the fetch-join/seen-anti-join
        # idiom; see Engine.create_rank_table). Recomputing url_hash(url)
        # here would be semantically equal but a DIFFERENT expression, so
        # Catalyst would no longer recognize the table's partitioning.
        pj_bucketed = None
        if (
            cfg.priority_join is not None
            and not cfg.priority_join_broadcast
            and self._bucketed
            and (cfg.dedupe == "exact" or self._bloom is None)
        ):
            _pj_src = cfg.priority_join
            _pj_hash_c = (
                F.col("url_hash")
                if "url_hash" in _pj_src.columns
                else url_hash(F.col("url"))
            )
            pj_bucketed = _pj_src.select(
                _pj_hash_c.alias("_pj_hash"),
                F.col("url").alias("_pj_url"),
                F.col("priority").cast("double").alias("_pj_prio"),
            )

        metric_rows: list[tuple] = []
        rounds_run = 0
        crawl_wall = 0.0

        while True:
            _round_t0 = time.time()
            if frontier_count == 0:
                break  # queue.Wait() returned — crawl complete
            if cfg.max_rounds is not None and rounds_run >= cfg.max_rounds:
                break
            round_ts = int(r * cfg.round_seconds * 1000)
            seen = self._seen_read(r, seen_paths)

            eligible = frontier.filter(F.col("not_before") <= round_ts)
            waiting = frontier.filter(F.col("not_before") > round_ts)

            # robots (broadcast join + vectorized allow test) ------------
            # metrics_mode='observe': counters ride as CollectMetrics nodes
            # under the persists, filled by the materialize/write jobs that
            # run anyway — the round schedules ZERO extra jobs for metrics.
            observe = cfg.metrics_mode == "observe"
            obs_rb = Observation() if observe else None
            obs_rb_aggs: list = []
            if self._robots_is_empty():
                # no robots anywhere ⇒ allow-all; skip the join + UDFs
                rb = eligible.withColumn("crawl_delay", F.lit(None).cast("double"))
                if observe:
                    obs_rb_aggs = [
                        F.count(F.lit(1)).alias("eligible"),
                        F.sum(F.lit(0)).alias("robots_denied"),
                    ]
                    rb = rb.observe(obs_rb, *obs_rb_aggs)
                rb = rb.persist()
                allowed = rb
                denied = rb.filter(F.lit(False))
            else:
                rb = robots_ops.with_robots(
                    eligible, self._robots_for_round(r), cfg.ua, path_of(F.col("url"))
                )
                if observe:
                    obs_rb_aggs = [
                        F.count(F.lit(1)).alias("eligible"),
                        F.sum(
                            F.when(~F.col("robots_allowed"), 1).otherwise(0)
                        ).alias("robots_denied"),
                    ]
                    rb = rb.observe(obs_rb, *obs_rb_aggs)
                rb = rb.persist()
                allowed = rb.filter(F.col("robots_allowed")).drop("robots_allowed")
                denied = rb.filter(~F.col("robots_allowed"))

            # politeness budget window -----------------------------------
            # fast path: with no rate limits and no crawl-delays anywhere,
            # every allowed row is admitted — skip the window + anti-join
            # (two shuffles saved per round in pure-throughput crawls).
            pol_off = self._politeness_static_off()
            if pol_off:
                admitted = allowed.drop("crawl_delay")
                deferred = spark.createDataFrame([], eligible.schema)
            else:
                budget = politeness.host_budget_expr(
                    cfg.round_seconds,
                    cfg.default_host_budget,
                    F.col("crawl_delay"),
                    cfg.host_rates or None,
                )
                order_cols = (
                    ["priority", "seq"] if cfg.queue_policy == "priority" else ["seq"]
                )
                wb = allowed.withColumn("_b", budget)
                if cfg.politeness_salt <= 1:
                    # rows with NO binding limiter keep the unlimited
                    # sentinel budget — they are all admitted and must never
                    # enter the window (an unlimited hot host would be one
                    # giant window partition); limited rows go through the
                    # capped window, whose foldable cap fires the map-side
                    # WindowGroupLimit pruning.
                    unlimited = wb.filter(F.col("_b") >= UNLIMITED_BUDGET)
                    limited = wb.filter(F.col("_b") < UNLIMITED_BUDGET)
                    adm_l, deferred = politeness.split_by_budget(
                        limited,
                        F.col("_b"),
                        order_cols=order_cols,
                        salt=1,
                        budget_cap=self._politeness_budget_cap(),
                    )
                    admitted = unlimited.unionByName(adm_l)
                else:
                    admitted, deferred = politeness.split_by_budget(
                        wb,
                        F.col("_b"),
                        order_cols=order_cols,
                        salt=cfg.politeness_salt,
                    )
                admitted = admitted.drop("_b", "crawl_delay")
                deferred = deferred.drop("_b", "crawl_delay").select(*frontier.columns)
                if cfg.pattern_rates:
                    admitted, deferred3 = politeness.rule_budget(
                        admitted, cfg.pattern_rates, cfg.round_seconds,
                        order_cols, mode=cfg.pattern_rule_mode,
                    )
                    deferred = deferred.unionByName(deferred3.select(*frontier.columns))
                if cfg.global_rate is not None:
                    admitted, deferred2 = politeness.global_limit(
                        admitted, int(cfg.global_rate * cfg.round_seconds), order_cols
                    )
                    deferred = deferred.unionByName(deferred2.select(*frontier.columns))
            if cfg.pages_table is not None:
                # stage the admitted frontier into a table bucketed like the
                # pages corpus; only the tiny frontier side is written. The
                # explicit repartition on the bucket key aligns each write
                # task with exactly ONE bucket (repartition's murmur3-pmod IS
                # the bucket function): without it every input partition
                # writes a file per bucket it touches — up to tasks×buckets
                # tiny files per round (measured 1024 files / 7.1s vs 32
                # files / 1.1s at sf1; r7, guide §6). One small-side shuffle
                # buys a 6× cheaper write and a 32× cheaper staged read.
                # The staged read doubles as the round's materialization, so
                # no .persist() needed.
                staged_path = os.path.join(
                    self._round_dir(root, r + 1), "admitted_staged"
                )
                _t_stage = time.time()
                spark.sql(f"DROP TABLE IF EXISTS {self._adm_tbl}")
                (
                    admitted.repartition(cfg.fetch_buckets, F.col("url"))
                    .write.mode("overwrite")
                    .format("parquet")
                    .bucketBy(cfg.fetch_buckets, "url")
                    .sortBy("url")
                    .option("path", staged_path)
                    .saveAsTable(self._adm_tbl)
                )
                _trace("stage:admitted_staged(write)", _t_stage)
                admitted = spark.table(self._adm_tbl)
            elif not pol_off:
                admitted = admitted.persist()
            # else: admitted is a cheap projection of the already-persisted
            # rb cache — a second persist would just double-fill memory and
            # add a cache pass per round.

            # fetch = left equi-join against the page universe ------------
            fetched = admitted.join(pages, admitted["url"] == pages["_p_url"], "left")
            if os.environ.get("ANT_SPARK_EXPLAIN_FETCH") == "1":
                import io
                from contextlib import redirect_stdout

                buf = io.StringIO()
                with redirect_stdout(buf):
                    fetched.explain("formatted")
                plan = buf.getvalue()
                print(
                    f"[fetch-plan round={r} bucketed={cfg.pages_table is not None}] "
                    f"Exchanges={plan.count('Exchange') // 2}\n{plan}",
                    flush=True,
                )
            # temporary statuses (fetcher.go:63-69) recover once attempt
            # reaches ok_after_attempt; other ≥400 statuses are permanent.
            status_eff = (
                F.when(F.col("_p_url").isNull(), F.lit(404))
                .when(
                    F.col("_p_status").isin(503, 504, 429)
                    & (F.col("attempt") < F.coalesce(F.col("ok_after_attempt"), F.lit(1 << 30))),
                    F.col("_p_status"),
                )
                .when(
                    (F.col("_p_status") >= 400) & ~F.col("_p_status").isin(503, 504, 429),
                    F.col("_p_status"),
                )
                .otherwise(F.lit(200))
            )
            # fuse fetch-join + parse into ONE cached pass: the UDF only sees
            # html for 200s (null otherwise); the cache never holds html.
            html_in = F.when(status_eff == 200, F.col("html"))
            if cfg.render_fn is not None:
                # S4 render seam: vectorized kernel over the fetched html,
                # in the same Python stage as the parse UDF (no extra pass)
                from ant_spark.operators.render import make_render_udf

                rendered = make_render_udf(cfg.render_fn)(html_in)
                if cfg.render_when is not None:
                    html_in = F.when(cfg.render_when(), rendered).otherwise(
                        html_in
                    )
                else:
                    html_in = rendered
            # relative links on a redirected page resolve against the FINAL
            # url (Go: req.URL is rewritten per hop before html.Parse sees
            # the body).
            parse_base = (
                F.coalesce(F.col("_p_final_url"), F.col("url"))
                if has_redirects
                else F.col("url")
            )
            processed = (
                fetched.withColumn("status_eff", status_eff)
                .withColumn("parsed", self._parse_udf(parse_base, html_in))
                .drop("html", "_p_url", "_p_status", "ok_after_attempt")
            )
            obs_proc = Observation() if observe else None
            obs_proc_aggs: list = []
            if observe:
                _se = F.col("status_eff")
                _temp = _se.isin(503, 504, 429)
                _n1 = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
                obs_cols = [
                    _n1(_se == 200).alias("fetched"),
                    _n1(_se == 404).alias("missing_404"),
                    _n1(_temp & (F.col("attempt") + 1 <= cfg.max_attempts)).alias("retried"),
                    _n1(_temp & (F.col("attempt") + 1 > cfg.max_attempts)).alias("dead_letter"),
                    _n1((_se >= 400) & ~_se.isin(404, 503, 504, 429)).alias("perm_error"),
                ]
                if has_redirects:
                    obs_cols.append(
                        _n1(F.col("_p_final_url").isNotNull()).alias("redirected")
                    )
                obs_proc_aggs = obs_cols
                processed = processed.observe(obs_proc, *obs_cols)
            processed = processed.persist()

            ok = processed.filter(F.col("status_eff") == 200)
            missing = processed.filter(F.col("status_eff") == 404)  # consumed
            temp_fail = processed.filter(F.col("status_eff").isin(503, 504, 429))
            perm_fail = processed.filter(
                (F.col("status_eff") >= 400)
                & ~F.col("status_eff").isin(404, 503, 504, 429)
            )
            retry = (
                temp_fail.filter(F.col("attempt") + 1 <= cfg.max_attempts)
                .select(
                    "url", "url_hash", "host", "depth", "seq", "priority",
                    (F.col("attempt") + 1).alias("attempt"),
                    (F.lit(round_ts) + _backoff_ms(F.col("attempt"), cfg.min_backoff_ms, cfg.max_backoff_ms)).alias("not_before"),
                )
            )
            dead = temp_fail.filter(F.col("attempt") + 1 > cfg.max_attempts)

            parsed = ok  # 200s already carry the fused-parse struct

            # redirect landing set (dim-sized, from the cached `processed`):
            # these urls are already-logged content — they join the seen
            # delta AND filter the SAME round's link discoveries (a page
            # fetched this round may link the landing url directly).
            redirect_finals = None
            if has_redirects and cfg.redirect_seen:
                redirect_finals = (
                    parsed.filter(
                        F.col("_p_final_url").isNotNull()
                        & (F.col("_p_final_url") != F.col("url"))
                    )
                    .select(F.col("_p_final_url").alias("url"))
                    .distinct()
                    .select(url_hash(F.col("url")).alias("url_hash"), "url")
                )

            log_cols = [
                "url", "url_hash", "host", "depth", "seq",
                F.lit(r).alias("round"),
                F.col("status_eff").alias("status"),
                "warc_ts",
                F.size("parsed.links").alias("n_links"),
                F.col("parsed.text").alias("text"),
                F.lit("en").alias("lang"),
            ]
            if has_redirects:
                log_cols.append(F.col("_p_final_url").alias("final_url"))
            log_df = parsed.select(*log_cols)
            if cfg.scrape_spec:
                extracted_df = parsed.select(
                    "url", "seq", F.lit(r).alias("round"),
                    F.col("parsed.scraped").alias("data"),
                )

            # link expansion → normalize → matcher → dedupe --------------
            links = (
                parsed.select(
                    F.col("seq").alias("parent_seq"),
                    F.col("depth").alias("parent_depth"),
                    F.posexplode("parsed.links").alias("link_idx", "raw_url"),
                )
                .withColumn("url", self._norm_udf(F.col("raw_url")))
                .filter(F.col("url").isNotNull() & is_queueable(F.col("url")))
            )
            if cfg.matcher is not None:
                links = links.filter(cfg.matcher(F.col("url")))
            if cfg.max_depth is not None:
                links = links.filter(F.col("parent_depth") + 1 <= cfg.max_depth)
            links = links.withColumn("url_hash", url_hash(F.col("url")))
            links = first_occurrence(
                links, ["url_hash", "url"], ["parent_seq", "link_idx"]
            )

            if self._bucketed and (cfg.dedupe == "exact" or self._bloom is None):
                # stage candidates into a table bucketed like `seen`: the
                # exact anti-join becomes storage-partitioned — the (huge)
                # seen side is read in place with NO Exchange; only the
                # (small) per-round candidate set pays a bucket shuffle,
                # folded into this write.
                staged_path = os.path.join(
                    self._round_dir(root, r + 1), "links_staged"
                )
                _t_stage = time.time()
                spark.sql(f"DROP TABLE IF EXISTS {self._links_tbl}")
                (
                    # repartition on the bucket key: one bucket per write
                    # task — 32 files instead of up to 1024 (see the
                    # admitted staging note above)
                    links.drop("raw_url")
                    .repartition(cfg.state_partitions, F.col("url_hash"))
                    .write.mode("overwrite").format("parquet")
                    .bucketBy(cfg.state_partitions, "url_hash")
                    .sortBy("url_hash")
                    .option("path", staged_path)
                    .saveAsTable(self._links_tbl)
                )
                _trace("stage:links_staged(write incl. parse UDF)", _t_stage)
                links = spark.table(self._links_tbl)
                if pj_bucketed is not None:
                    # URL-level rank at corpus scale: both sides bucketed
                    # on url_hash → storage-partitioned SMJ, no Exchange on
                    # the (10^10-row) rank side; url equality rides along
                    # for hash-collision safety. The joined priority flows
                    # through dedupe + seq assignment to the final select.
                    links = links.join(
                        pj_bucketed,
                        (links["url_hash"] == pj_bucketed["_pj_hash"])
                        & (links["url"] == pj_bucketed["_pj_url"]),
                        "left",
                    ).drop("_pj_hash", "_pj_url")

            if cfg.dedupe == "exact" or self._bloom is None:
                new_links = exact_new(links, seen)
                if os.environ.get("ANT_SPARK_EXPLAIN_DEDUPE") == "1":
                    import io
                    from contextlib import redirect_stdout

                    buf = io.StringIO()
                    with redirect_stdout(buf):
                        new_links.explain("formatted")
                    plan = buf.getvalue()
                    print(
                        f"[dedupe-plan round={r} backend={cfg.state_backend}] "
                        f"Exchanges={plan.count('Exchange')}\n{plan}",
                        flush=True,
                    )
            else:
                # distinct url_hash probe: two distinct same-round URLs with
                # colliding hashes must not fan out the equi-join below
                # (tested would carry one row per INPUT row otherwise,
                # duplicating both URLs into new_links).
                tested = self._bloom.test(
                    links.select("url_hash").distinct(), bloom_state
                )
                links_t = links.join(tested, "url_hash", "left")
                if cfg.dedupe.endswith("_drop"):
                    # reference DedupeBF parity: false positives drop forever
                    new_links = links_t.filter(~F.coalesce(F.col("maybe_seen"), F.lit(False))).drop("maybe_seen")
                else:  # *_prefilter: exact check only for maybe-seen
                    sure_new = links_t.filter(~F.coalesce(F.col("maybe_seen"), F.lit(False))).drop("maybe_seen")
                    maybe = links_t.filter(F.coalesce(F.col("maybe_seen"), F.lit(False))).drop("maybe_seen")
                    new_links = sure_new.unionByName(exact_new(maybe, seen))

            if redirect_finals is not None:
                # same-round discovery of a landing url: already logged
                # under the original url — drop before seq assignment
                new_links = new_links.join(
                    F.broadcast(redirect_finals), ["url_hash", "url"],
                    "left_anti",
                )

            # deterministic seq assignment --------------------------------
            if cfg.ordering == "bfs":
                w = Window.orderBy("parent_seq", "link_idx")
                new_rows = new_links.withColumn(
                    "seq", (F.row_number().over(w) - 1 + F.lit(next_seq)).cast("long")
                )
            else:
                p = F.pmod(F.col("url_hash"), F.lit(cfg.seq_partitions))
                w = Window.partitionBy(p).orderBy("parent_seq", "link_idx")
                new_rows = new_links.withColumn(
                    "seq",
                    (
                        F.lit(next_seq)
                        + (F.row_number().over(w).cast("long") - 1) * cfg.seq_partitions
                        + p.cast("long")
                    ),
                )
            priority_col = (
                cfg.priority_fn().cast("double")
                if cfg.priority_fn is not None
                else F.lit(0.0)
            )
            if pj_bucketed is not None:
                # bucketed-path rank joined upstream; misses fall back
                priority_col = F.coalesce(F.col("_pj_prio"), priority_col)
            new_rows = new_rows.select(
                "url", "url_hash",
                host_of(F.col("url")).alias("host"),
                (F.col("parent_depth") + 1).alias("depth"),
                "seq",
                priority_col.alias("priority"),
                F.lit(1).alias("attempt"),
                F.lit(0).cast("long").alias("not_before"),
            )
            if cfg.priority_join is not None and pj_bucketed is None:
                # URL-level rank signal as an in-round equi-join — the
                # 10^10-frontier shape a driver-literal map can't carry
                # (rank_priority_fn's documented seam): new links pick up
                # (url_hash, url)-keyed priorities (collision-safe, same
                # key idiom as the seen anti-join); misses keep the
                # priority_fn/default value. Catalyst broadcasts a small
                # rank table; at corpus scale set priority_join_broadcast=
                # False with state_backend='bucketed' and a create_rank_table
                # table — the join then runs upstream against the staged
                # bucketed links (storage-partitioned SMJ, zero Exchange).
                pj = cfg.priority_join.select(
                    url_hash(F.col("url")).alias("_pj_hash"),
                    F.col("url").alias("_pj_url"),
                    F.col("priority").cast("double").alias("_pj_prio"),
                )
                if cfg.priority_join_broadcast:
                    pj = F.broadcast(pj)
                new_rows = (
                    new_rows.join(
                        pj,
                        (new_rows["url_hash"] == pj["_pj_hash"])
                        & (new_rows["url"] == pj["_pj_url"]),
                        "left",
                    )
                    .withColumn(
                        "priority", F.coalesce("_pj_prio", "priority")
                    )
                    .drop("_pj_hash", "_pj_url", "_pj_prio")
                )
            obs_new = Observation() if observe else None
            obs_new_aggs: list = []
            if observe:
                obs_new_aggs = [F.count(F.lit(1)).alias("enqueued")]
                new_rows = new_rows.observe(obs_new, *obs_new_aggs)
            new_rows = new_rows.persist()
            if os.environ.get("ANT_SPARK_EXPLAIN_ROUND") == "1":
                # audit hook: dump the full round plan (seq window + dedupe
                # + parse) so tools/explain_audit.py can assert scale
                # invariants, e.g. no partition-less Window in the plan.
                import io
                from contextlib import redirect_stdout

                buf = io.StringIO()
                with redirect_stdout(buf):
                    new_rows.explain()
                print(f"[round-plan round={r}]\n{buf.getvalue()}", flush=True)

            if _TRACE:
                tt = time.time()
                rb.count(); tt = _trace("mat:rb", tt)
                admitted.count(); tt = _trace("mat:admitted", tt)
                processed.count(); tt = _trace("mat:processed(join+udf)", tt)
                new_rows.count(); tt = _trace("mat:new_rows(dedupe+seq)", tt)

            # ---- commit: state snapshots + log/metrics appends ----------
            # Materialize the two shared caches once, then run the three
            # independent writes as CONCURRENT Spark jobs (one session,
            # separate threads — the scheduler interleaves their stages).
            # r7: the log write depends only on `processed`, so it is
            # submitted right after processed.count() and overlaps the
            # new_rows materialization (guide §2.6). BOTH counts stay:
            # Observation metrics on a persisted subtree finalize reliably
            # only when the observed DF is the action target (gotcha list).
            t = time.time()
            processed.count()
            t = _trace("materialize:processed", t)

            rd = self._round_dir(root, r + 1)
            log_path = os.path.join(rd, "fetched_log")
            waiting_sel = waiting.select(*frontier.columns)
            deferred_sel = deferred.select(*frontier.columns)
            obs_waiting = obs_deferred = None
            if observe:
                # these two branches flow only into the frontier write — the
                # write job fills them (no standalone count jobs).
                obs_waiting, obs_deferred = Observation(), Observation()
                waiting_sel = waiting_sel.observe(
                    obs_waiting, F.count(F.lit(1)).alias("waiting")
                )
                deferred_sel = deferred_sel.observe(
                    obs_deferred, F.count(F.lit(1)).alias("deferred")
                )
            new_frontier = (
                waiting_sel
                .unionByName(deferred_sel)
                .unionByName(retry.select(*frontier.columns))
                .unionByName(new_rows.select(*frontier.columns))
            )
            # seen is APPEND-ONLY: write only this round's delta (at cluster
            # scale: an Iceberg append into a url_hash-bucketed table — never
            # a rewrite of the accumulated membership set).
            seen_delta = new_rows.select(
                "url_hash", "url", F.lit(r + 1).alias("round")
            )
            if redirect_finals is not None:
                # the chain's landing url becomes seen too: a later direct
                # link to it is the same content the log already carries
                # under the original url. (Prevents FUTURE enqueues only —
                # a landing url already sitting in the frontier still
                # fetches; same guarantee window as any enqueue-time dedupe.)
                seen_delta = seen_delta.unionByName(
                    redirect_finals.withColumn("round", F.lit(r + 1))
                )

            from concurrent.futures import ThreadPoolExecutor

            def _w_log():
                t0 = time.time()
                log_df.write.mode("overwrite").parquet(log_path)
                if cfg.scrape_spec:
                    extracted_df.write.mode("overwrite").parquet(
                        os.path.join(rd, "extracted")
                    )
                _trace("w:log", t0)

            def _w_frontier():
                t0 = time.time()
                out = self._write_state(
                    root, r + 1, "frontier", new_frontier,
                    n_parts=cfg.state_partitions,
                )
                _trace("w:frontier", t0)
                return out

            def _w_seen():
                t0 = time.time()
                out = self._seen_write(root, r + 1, seen_delta)
                _trace("w:seen", t0)
                return out

            by_stage: dict[str, int] = {}
            if cfg.metrics_mode == "partition":
                # per-partition lineage counters — ONE job for all stages
                # (every input is cached or a small parquet scan); runs
                # concurrently with the commit writes below.
                pid = F.spark_partition_id().alias("partition")

                def _st(df, name):
                    return df.groupBy(pid).agg(F.count("*").alias("n")).withColumn(
                        "stage", F.lit(name)
                    )

                stage_counts = (
                    _st(eligible, "eligible")
                    .unionByName(_st(waiting, "waiting"))
                    .unionByName(_st(denied, "robots_denied"))
                    .unionByName(_st(deferred, "deferred"))
                    .unionByName(_st(parsed, "fetched"))
                    .unionByName(_st(missing, "missing_404"))
                    .unionByName(_st(retry, "retried"))
                    .unionByName(_st(dead, "dead_letter"))
                    .unionByName(_st(perm_fail, "perm_error"))
                    .unionByName(_st(new_rows, "enqueued"))
                )
                if has_redirects:
                    stage_counts = stage_counts.unionByName(
                        _st(
                            parsed.filter(F.col("_p_final_url").isNotNull()),
                            "redirected",
                        )
                    )
                with ThreadPoolExecutor(max_workers=4) as pool:
                    # log write needs only `processed` (already cached) —
                    # it overlaps the new_rows materialization on this
                    # thread; frontier/seen/counts need new_rows and are
                    # submitted after its count.
                    f_log = pool.submit(_w_log)
                    new_rows.count()
                    t = _trace("materialize:new_rows", t)
                    f_frontier = pool.submit(_w_frontier)
                    f_seen = pool.submit(_w_seen)
                    f_counts = pool.submit(stage_counts.collect)
                    f_log.result()
                    frontier2 = f_frontier.result()
                    f_seen.result()
                    counts = f_counts.result()
                for row in counts:
                    by_stage[row["stage"]] = by_stage.get(row["stage"], 0) + row["n"]
                    metric_rows.append((r, row["partition"], row["stage"], row["n"]))
            else:
                with ThreadPoolExecutor(max_workers=3) as pool:
                    # same overlap as partition mode: log write (processed
                    # only) runs while new_rows materializes here. The
                    # explicit new_rows.count() stays — obs_new finalizes
                    # reliably only with the observed DF as action target.
                    f_log = pool.submit(_w_log)
                    new_rows.count()
                    t = _trace("materialize:new_rows", t)
                    f_frontier = pool.submit(_w_frontier)
                    f_seen = pool.submit(_w_seen)
                    f_log.result()
                    frontier2 = f_frontier.result()
                    f_seen.result()
                # harvest the observations (all filled by the jobs above /
                # the materialize pass; sum() over zero rows yields null → 0).
                # Observation.get on a persisted subtree can intermittently
                # fail finalization (Spark toPyRow assertion) under load; the
                # counters drive frontier_count/next_seq, so a failed harvest
                # must RECOUNT from the source DF (cached or cheap), never
                # zero out — zeros would end the crawl a round early.
                def _take(
                    obs: Observation | None,
                    src: DataFrame | None = None,
                    aggs: list | None = None,
                ):
                    vals: dict = {}
                    if obs is not None:
                        try:
                            vals = dict(obs.get)
                        except Exception as exc:  # pragma: no cover - race
                            import warnings

                            warnings.warn(
                                f"ant_spark: Observation harvest failed "
                                f"({exc!r}); recounting stage metrics from "
                                f"the cached source", stacklevel=2,
                            )
                            if src is not None and aggs:
                                vals = src.agg(*aggs).collect()[0].asDict()
                    for stage, v in vals.items():
                        n = int(v) if v is not None else 0
                        if n == 0:
                            continue  # parity with partition mode: empty
                            # stages emit no rows (groupBy of zero rows)
                        by_stage[stage] = by_stage.get(stage, 0) + n
                        metric_rows.append((r, -1, stage, n))

                _take(obs_rb, rb, obs_rb_aggs)
                _take(obs_proc, processed, obs_proc_aggs)
                _take(obs_new, new_rows, obs_new_aggs)
                _take(obs_waiting, waiting, [F.count(F.lit(1)).alias("waiting")])
                _take(
                    obs_deferred, deferred,
                    [F.count(F.lit(1)).alias("deferred")],
                )
            if not self._bucketed:
                seen_paths.append(os.path.join(rd, "seen_delta"))
            t = _trace("commit_writes+metrics(parallel)", t)
            if self._bloom:
                bloom2 = self._bloom.add(new_rows.select("url_hash"), bloom_state)
                bloom_state = self._write_state(root, r + 1, "bloom", bloom2)

            # seen-delta compaction: fold the O(rounds) delta dirs into one
            # url_hash-distributed base every seen_compact_every rounds so
            # each round reads O(1) seen dirs (Iceberg compaction analogue;
            # the bucketed backend appends into one table — nothing to fold).
            if not self._bucketed and len(seen_paths) > cfg.seen_compact_every:
                base_df = spark.read.parquet(*seen_paths).select(
                    "url_hash", "url", "round"
                )
                self._write_state(
                    root, r + 1, "seen_base", base_df,
                    n_parts=cfg.state_partitions,
                )
                seen_paths = [os.path.join(rd, "seen_base")]

            # 'auto' backend migration: once the seen set is big enough that
            # its per-round anti-join Exchange dominates, fold all deltas
            # into the bucketed table (a one-time compaction-priced job) and
            # continue storage-partitioned. Committed atomically with this
            # round's manifest; a crash in between resumes on parquet and
            # simply re-migrates (the table create is an overwrite).
            if (
                not self._bucketed
                and cfg.state_backend != "parquet"
                and (
                    cfg.state_backend == "bucketed"  # resumed parquet-phase
                    or total_enqueued >= cfg.bucketed_switch_rows
                )
            ):
                base_df = spark.read.parquet(*seen_paths).select(
                    "url_hash", "url", "round"
                )
                self._bucketed = True
                self._seen_write(root, 0, base_df)
                seen_paths = []

            # bucketed-table file compaction: fresh per-bucket files at a
            # versioned path every seen_compact_every rounds; the old dir is
            # deleted only after the manifest pointing at the new one commits.
            old_seen_dir = None
            if self._bucketed:
                self._since_compact += 1
                if self._since_compact >= cfg.seen_compact_every:
                    old_seen_dir = self._seen_compact(root, r + 1)
                    self._since_compact = 0

            n_new = by_stage.get("enqueued", 0)
            n_fetched = by_stage.get("fetched", 0)
            if cfg.ordering == "bfs":
                next_seq += n_new
            else:
                next_seq += n_new * cfg.seq_partitions  # stride-safe upper bound
            total_fetched += n_fetched
            total_enqueued += n_new
            frontier_count = (
                by_stage.get("waiting", 0)
                + by_stage.get("deferred", 0)
                + by_stage.get("retried", 0)
                + n_new
            )

            self._commit_round(
                root, r + 1,
                {
                    "round": r + 1,
                    "next_seq": next_seq,
                    "total_fetched": total_fetched,
                    "total_enqueued": total_enqueued,
                    "frontier_count": frontier_count,
                    "seen_paths": [os.path.relpath(p, root) for p in seen_paths],
                    "state_backend": cfg.state_backend,
                    "bucketed_active": self._bucketed,
                    "seen_table_path": (
                        os.path.relpath(self._seen_tbl_path, root)
                        if self._bucketed
                        else None
                    ),
                    "stages": by_stage,
                },
            )

            if old_seen_dir is not None:
                import shutil

                shutil.rmtree(old_seen_dir, ignore_errors=True)

            # expire STATE of rounds older than the keep window: frontier /
            # seen_delta / seen_base / bloom snapshots are superseded by the
            # just-committed round (minus live seen refs); fetched_log,
            # extracted and MANIFEST.json stay — they are the crawl's output.
            if cfg.expire_state_rounds is not None:
                import shutil

                live = set(seen_paths)
                keep_from = (r + 1) - cfg.expire_state_rounds
                for name in os.listdir(root):
                    if not name.startswith("round="):
                        continue
                    if int(name.split("=")[1]) >= keep_from:
                        continue
                    for state in (
                        "frontier", "seen_delta", "seen_base", "bloom",
                        "links_staged", "admitted_staged",
                    ):
                        p = os.path.join(root, name, state)
                        if p not in live and os.path.isdir(p):
                            shutil.rmtree(p, ignore_errors=True)

            rb.unpersist()
            admitted.unpersist()
            processed.unpersist()
            new_rows.unpersist()
            frontier = frontier2
            r += 1
            rounds_run += 1
            crawl_wall += time.time() - _round_t0

            if cfg.strict and by_stage.get("perm_error", 0) > 0:
                raise CrawlError(
                    f"permanent fetch errors in round {r - 1}: "
                    f"{by_stage.get('perm_error')} (reference aborts the crawl)"
                )

        # include logs from pre-resume rounds so the result covers the crawl
        all_log_dirs = sorted(
            os.path.join(root, name, "fetched_log")
            for name in os.listdir(root)
            if name.startswith("round=")
            and os.path.isdir(os.path.join(root, name, "fetched_log"))
        )
        fetched_log = (
            self.spark.read.parquet(*all_log_dirs)
            if all_log_dirs
            else self.spark.createDataFrame([], schemas.FETCHED_LOG)
        )
        metrics = self.spark.createDataFrame(
            metric_rows, schema="round int, partition int, stage string, n long"
        )
        extracted = None
        if cfg.scrape_spec:
            ex_dirs = sorted(
                os.path.join(root, name, "extracted")
                for name in os.listdir(root)
                if name.startswith("round=")
                and os.path.isdir(os.path.join(root, name, "extracted"))
            )
            if ex_dirs:
                extracted = self.spark.read.parquet(*ex_dirs)
        return CrawlResult(
            rounds=rounds_run,
            pages_fetched=total_fetched,
            urls_enqueued=total_enqueued,
            fetched_log=fetched_log,
            metrics=metrics,
            extracted=extracted,
            state_dir=root,
            crawl_wall_sec=round(crawl_wall, 3),
        )


def fetch_one(spark: SparkSession, pages_df: DataFrame, rawurl: str) -> DataFrame:
    """Library one-shot fetch (reference ant.Fetch, fetcher.go:72-78):
    a single-row frontier through the fetch join + parse UDF."""
    u = normalize_url(rawurl)
    one = spark.createDataFrame([(u,)], "url string")
    udf = make_parse_udf(None)
    return (
        one.join(pages_df, "url", "left")
        .withColumn("parsed", udf(F.col("url"), F.col("html")))
        .select("url", "warc_ts", "parsed.links", "parsed.text", "parsed.title")
    )
