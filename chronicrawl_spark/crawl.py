"""The crawl engine: micro-batch "fetch waves" over snapshot state tables.

One ``step()`` is the wave analog of the reference's sequential
``Crawl.step()`` (``Crawl.java:95-131``) — same state transitions, executed
as declarative DataFrame ops over the whole eligible set at a virtual
timestamp T:

  read origins+frontier snapshots → F1/F2 eligibility at T → J1/J2 joins →
  W2 salted top-k per host → robots gate (F3) → join-based fetch (S2) +
  as-of conditional-GET (J6, quirk preserved) → sha1 digest (C6) + digest
  dedupe (J7) → visits/warc append → AIMD next-visit (C11) + politeness
  (C12) MERGEs → process discoveries (S4-S7) → depth/scheme filters (F4/F5)
  → URL-seen anti-join MERGE (J5) → snapshot commit.

Determinism: the wave clock T advances to ``min(origin.next_visit)`` when
idle (the reference sleeps until then — ``Crawl.java:115-122``); every
fetch in a wave is stamped T.  With ``k_origins=1, per_host_k=1`` the engine
reproduces the reference's sequential crawl ordering exactly (the parity
oracle); with unbounded origins and per-host budgets it is the throughput
product — same final URL-seen set on confluent fixtures.

Parking quirk preserved: an origin whose queue is empty gets
``next_visit = NULL`` and drops out of F1 permanently (``Crawl.java:
123-126``) — nothing un-parks it.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.schedule import BUILTIN_SCHEDULES, batch_apply
from .functions.udfs import url_parts
from .functions.urlkit import Url
from .operators.process import process_success_rows
from .operators.wave import eligible_origins, select_wave
from .sources import content as C
from .sources.fetchsim import prepare_site, simulate_fetch
from .tables import MUTABLE_TABLES, StateStore

DAY_MS = 86_400_000

# max wave-host ids pushed into the history parquet scans as isin().
# Two hard constraints: (a) must not exceed
# spark.sql.parquet.pushdown.inFilterThreshold (session.py) or the In
# predicate degrades to a useless min/max range on hashed ids; (b) Spark
# pushes In to parquet as a NESTED Or-chain whose row-group evaluation
# recurses once per value — measured: 2000 values = StackOverflowError in
# the scan task.  256 is ~8× below the measured overflow and still covers
# the few-hot-hosts waves where row-group skipping pays; larger waves rely
# on the broadcast-semi filter instead (BROADCAST_WAVE_KEYS_MAX).
WAVE_HOST_IDS_CAP = 256

# wave sizes up to this broadcast their (origin_id, path_id) key set into
# the J6/J7 history semi-joins (2 longs/row → ~32 MB of rows at the cap,
# well inside the executor/driver broadcast budget); bigger waves fall back
# to one shuffle-hash semi whose partitioning the J6 window reuses
BROADCAST_WAVE_KEYS_MAX = 2_000_000

# dimension tables up to this many PHYSICAL bytes (manifest file sizes, no
# job — StateStore.table_bytes) get an explicit broadcast hint in wave
# selection.  MoR-resolved reads carry no size stats, so without the hint
# the static planner sort-merges and AQE's runtime conversion still pays
# the big side's shuffle map stage — measured 2× on wave_select at 16
# cores.  128 MB of parquet is conservatively inside the executor/driver
# broadcast budget; a 10^8-host origins table or URL-keyed sitemap_entries
# blows past it and takes the hint-free SMJ path.
BROADCAST_DIM_BYTES_MAX = 128 * 1024 * 1024


@dataclass
class CrawlConfig:
    """Reference defaults (``Config.java``)."""

    robots_policy: str = "STRICT"  # STRICT | PAGES_ONLY | IGNORE
    max_depth: int = 10  # Config.java:120
    max_delay_millis: int = 30  # Config.java:114 (load-bearing for ordering)
    min_revisit_ms: int = 1 * DAY_MS  # Config.java:126
    max_revisit_ms: int = 365 * DAY_MS  # Config.java:132
    initial_revisit_html_ms: int = 2 * DAY_MS  # Config.java:139
    initial_revisit_other_ms: int = 7 * DAY_MS  # Config.java:146
    dedupe_server: bool = True  # Config.java:190
    dedupe_digest: bool = True  # Config.java:196
    dedupe_min_length: int = 64  # Config.java:202
    max_robots_bytes: int = 512 * 1024  # Config.java:102
    user_agent: str = "Chronicrawl/spark"
    # xxh64 collision guard — the reference ALWAYS checks (Database.java:
    # 196-198), so parity mode defaults on; costs one tiny limit(1) probe
    # per discovery wave
    check_collisions: bool = True
    # B-axis: URL-seen prefilter before the J5 anti-join MERGE.
    # Definitely-new discoveries skip the exact check entirely; maybe-seen
    # (incl. false positives) fall through to it — results are identical,
    # only the J5 shuffle volume changes (SURVEY §4.2).  Built once from the
    # frontier, maintained incrementally per wave, sharded by
    # pmod(origin_id, bloom_shards) for linear capacity scaling.
    use_bloom: bool = True  # legacy name: gates the prefilter of EITHER kind
    # filter kind (the north_star names "bloom/cuckoo"):
    #   "bloom"  — OR-idempotent planes, treeAggregate-merged builds, cannot
    #              delete (a frontier-retire path forces a full rebuild)
    #   "cuckoo" — 16-bit fingerprints, 4-slot buckets (Fan CoNEXT'14);
    #              supports in-place DELETE; inserts are NOT idempotent so
    #              the engine inserts each verified-new key exactly once
    seen_filter: str = "bloom"
    bloom_bits: int = 1 << 24
    bloom_k: int = 5
    bloom_shards: int = 4  # shard count for either kind
    # cuckoo sizing: capacity ≈ 0.95 · shards · buckets · 4 slots; planes
    # memory = shards · buckets · 8 bytes (8 MB at the defaults)
    cuckoo_buckets: int = 1 << 18
    # S11 producer: the reference feeds the screenshot cache from every
    # rendered visit (Exchange.java:198-201).  When on, each wave's fetched
    # image payloads (magic-byte prefiltered, JVM-side) run the Arrow
    # resize stage and the (screenshot, thumbnail) rows ride this wave's
    # commit — zero extra scans: the source is the wave's own exchange.
    screenshot_thumbnails: bool = False
    thumbnail_max_dim: int = 16
    # L21 auto-evolution: when >0 and the frontier's average per-bucket
    # physical bytes (manifest metadata, no Spark job) exceed this at the
    # start of a wave, the store doubles its bucket count before selection;
    # the rewrite rides this wave's commit.  Off by default — 0 keeps the
    # layout fixed and `StateStore.rebucket` stays a manual maintenance op.
    auto_rebucket_bytes: int = 0
    # L23 small-file maintenance: when >0 and the visits table holds at
    # least this many wave dirs at the start of a wave, the engine folds
    # the small ones into one consolidated wave per append table
    # (StateStore.compact_appends — Iceberg rewrite_data_files bin-pack
    # analog) as a self-committed maintenance snapshot before the wave.
    # Off by default; `CrawlEngine.compact_history` stays the manual op.
    auto_compact_min_waves: int = 0
    compact_small_bytes: int = 32 << 20
    compact_max_rewrite_bytes: int = 1 << 30


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        store: StateStore,
        site: DataFrame,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.store = store
        self.site = site
        self.config = config or CrawlConfig()
        self.schedules = {s.id: s for s in BUILTIN_SCHEDULES}
        # virtual time (epoch millis) — restored from the committed manifest
        # so resume-from-snapshot needs no manual clock
        self.clock: int | None = store.manifest.get("clock")
        self._rules_empty: bool | None = None  # cached; invalidated by add_rules
        self._lineage: list[tuple] = []  # (table, op, buckets) per wave
        self._site_prep: tuple | None = None  # prepare_site(site), built lazily
        self._disc_caches: list[DataFrame] = []  # persisted discovery frames
        # incremental URL-seen filter (np.ndarray) — reload the committed
        # planes from the store so a restart/resume costs O(planes), not a
        # full-frontier rebuild scan (params must match; else rebuild lazily)
        self._bloom_bits = None
        if self.config.use_bloom:
            self._bloom_bits = store.load_bloom(self._bloom_meta())

    def _bloom_meta(self) -> dict:
        """Sizing params of the active URL-seen filter — persisted with the
        planes so load_bloom rejects planes built under a different kind or
        geometry (a mismatch falls back to a rebuild, never a wrong probe)."""
        cfg = self.config
        if cfg.seen_filter == "cuckoo":
            return {"kind": "cuckoo", "n_buckets": cfg.cuckoo_buckets, "shards": cfg.bloom_shards}
        return {"kind": "bloom", "n_bits": cfg.bloom_bits, "k": cfg.bloom_k, "shards": cfg.bloom_shards}

    def _merge(self, table: str, delta, mode: str, tags: list | None = None) -> dict:
        """StateStore.merge + lineage accounting; returns the merge stats
        dict (no shared-attribute read — safe if sinks ever parallelize)."""
        st = self.store.merge(table, delta, mode, tags=tags)
        self._lineage.append((table, mode, st["buckets"]))
        return st

    def add_rules(self, rules_df) -> None:
        """Install rule→schedule bindings (ref ``RuleDAO``)."""
        self.store.merge("rules", rules_df, "upsert")
        self.store.commit(self.store.committed_wave + 1)
        self._rules_empty = None

    # ------------------------------------------------------------- seeding
    def add_seeds(self, urls: list[str], now: int) -> None:
        """``Crawl.addSeed`` (``Crawl.java:63-70``): upsert CONTINUOUS origin,
        enqueue /robots.txt (ROBOTS) and the seed itself (PAGE)."""
        origin_rows, frontier_rows = [], []
        for u in urls:
            url = Url(u)
            robots = url.resolve("/robots.txt")
            origin_rows.append((url.origin_id(), url.origin, now, "CONTINUOUS", None, now, None, None))
            frontier_rows.append(
                (robots.origin_id(), robots.path_id(), robots.pathref, "ROBOTS", 0, None, None, now, None, now)
            )
            frontier_rows.append(
                (url.origin_id(), url.path_id(), url.pathref, "PAGE", 0, None, None, now, None, now)
            )
        origins_df = self.spark.createDataFrame(origin_rows, self.store.read("origins").schema)
        self.store.merge("origins", origins_df, "insert_if_absent")
        # updateCrawlPolicy → CONTINUOUS even if the origin pre-existed
        existing = self.store.read_staged("origins").join(
            origins_df.select("origin_id"), "origin_id", "left_semi"
        )
        self.store.merge("origins", existing.withColumn("crawl_policy", F.lit("CONTINUOUS")), "upsert")
        frontier_df = self.spark.createDataFrame(frontier_rows, self.store.read("frontier").schema)
        self.store.merge("frontier", frontier_df, "insert_if_absent")
        if self.clock is None:
            self.clock = now
        self.store.set_clock(self.clock)
        wave = self.store.committed_wave + 1
        self.store.commit(wave)

    # ------------------------------------------------------------ the wave
    def step(
        self,
        k_origins: int | None = None,
        per_host_k: int = 1,
        salt: int | None = None,
    ) -> dict:
        """One fetch wave.

        Driver-action budget (the N→4N scaling lever): the wave runs a fixed
        small number of jobs regardless of size — nv_min agg, wave
        checkpoint, stats agg, exch checkpoint, 2 appends, discovery count,
        and ONE fused COW merge each for frontier (visit updates + new
        discoveries, mixed-mode) and origins (politeness + robots + parked +
        new origins).  Everything else is folded into those jobs: touched
        buckets ride the stats agg, per-subset row counts ride the merges'
        bucket-discovery job (``__tag``).
        """
        import time as _time

        # per-phase wall clock around every driver-blocking action — the
        # wave's SERIAL floor decomposition (each entry is a synchronous
        # job/commit boundary; their sum ≈ wave wall time).  Cost-free to
        # keep always-on; scripts/wave_profile.py aggregates it.
        phases: dict[str, float] = {}
        _t0 = _time.monotonic()

        def _mark(name: str) -> None:
            nonlocal _t0
            now = _time.monotonic()
            phases[name] = round(now - _t0, 3)
            _t0 = now

        cfg = self.config
        store = self.store
        if (
            cfg.auto_compact_min_waves
            and not store.has_staged_changes()
            and len(store.manifest["append"].get("visits", []))
            >= cfg.auto_compact_min_waves
        ):
            # fold small per-wave history files BEFORE the wave so its
            # pruned J6/J7 reads open the consolidated layout; self-commits
            # its own snapshot (fresh wave id — shared namespace)
            self.compact_history()
            _mark("compact_appends")
        if (
            cfg.auto_rebucket_bytes
            and store.table_bytes("frontier", staged=True) / store.buckets
            > cfg.auto_rebucket_bytes
        ):
            # grow the layout BEFORE selection so the whole wave (reads,
            # merges, bucket-pruned history lookups) runs under one count;
            # rebucket stages the rewrite and this wave's commit publishes it
            store.rebucket(store.buckets * 2)
            _mark("rebucket")
        origins = store.read("origins")
        frontier = store.read("frontier")
        # the wave consumes the resolved origins MoR read from FOUR actions
        # (nv_min agg, wave-select semi + carry join, parked anti-join) and
        # every one re-runs the base∪delta resolve plus its broadcast
        # subjobs.  When the table is physically small (manifest bytes, the
        # same gate as the broadcast hints) materialize the resolve ONCE per
        # wave; past the gate the repeated reads stay distributed scans.
        origins_ckpt = store.table_bytes("origins", staged=True) <= BROADCAST_DIM_BYTES_MAX
        if origins_ckpt:
            # persist, not localCheckpoint: lazy — the nv_min agg below is
            # the materializing job (resolve+cache+agg in one), the later
            # three consumers hit the cache
            origins = origins.persist()

        # F1 + virtual clock advance (Crawl.java:104-122).  Kept as its own
        # tiny job (origins is the hosts table, ≪ frontier): making T a
        # runtime subquery would lose the literal next_visit<=T pushdown on
        # the frontier scan, which matters far more at 10^10 rows.
        elig_all = origins.filter(
            (F.col("crawl_policy") == "CONTINUOUS") & F.col("next_visit").isNotNull()
        )
        # .collect() not .first(): first() = limit(1) runs 2-3 incremental
        # jobs; a global agg always yields one row, collect is a single job
        nv_min = elig_all.agg(F.min("next_visit").alias("m")).collect()[0]["m"]
        if nv_min is None:
            if origins_ckpt:
                origins.unpersist()
            return {"idle": True, "fetched": 0}
        T = max(self.clock or 0, nv_min)
        self.clock = T
        store.set_clock(T)  # published with this wave's commit (resume)
        _mark("nv_min")

        elig = eligible_origins(origins, T)
        if k_origins is not None:
            picked = (
                elig.orderBy(F.col("next_visit").asc(), F.col("discovered").asc(), F.col("origin_id").asc())
                .limit(k_origins)
                .select("origin_id")
            )
            elig = elig.join(F.broadcast(picked), "origin_id", "left_semi")

        se = store.read("sitemap_entries")
        wave = select_wave(
            frontier, elig, se, T, k=per_host_k, salt=salt,
            broadcast_origins=store.table_bytes("origins") <= BROADCAST_DIM_BYTES_MAX,
            broadcast_sitemap=store.table_bytes("sitemap_entries") <= BROADCAST_DIM_BYTES_MAX,
        )
        # origin carry-cols (incl. o_discovered) ride select_wave's
        # post-top-k join — no extra origins join/broadcast here
        # localCheckpoint (not persist): truncates the logical plan so the
        # dozen downstream actions this wave plan against a tiny LogicalRDD
        # instead of re-optimizing the full read→join→window tree each time
        # (driver planning was the dominant serial cost per wave).
        # The wave stats agg RIDES the checkpoint job as observed metrics
        # (one job instead of checkpoint + a separate agg collect):
        # countDistinct is disallowed in observe, but size(collect_set) is
        # the same number and the full set was built by the old agg anyway;
        # the WAVE_HOST_IDS_CAP driver-transfer cap is applied post-agg
        # inside the metric expression, exactly like the old post-agg select.
        wobs = Observation()
        oids_set = F.collect_set("origin_id")
        wave = wave.observe(
            wobs,
            F.count(F.lit(1)).alias("n"),
            F.size(oids_set).alias("hosts"),
            F.collect_set(F.pmod(F.col("origin_id"), F.lit(store.buckets)).cast("int")).alias("bks"),
            # wave host ids, for pushing isin(origin_id) into the J6/J7
            # history scans (row-group skipping on key-sorted buckets).
            # Transferred to the driver only below the cap — a mega-wave
            # falls back to semi-join-only pruning
            F.when(F.size(oids_set) <= F.lit(WAVE_HOST_IDS_CAP), oids_set).alias("oids"),
            # any stored robots.txt in this wave?  Rides the same agg;
            # lets the robots gate skip its two-branch union + Arrow
            # stage entirely on robots-free waves (identical semantics:
            # a null robots_txt row is allowed by definition)
            F.max(F.col("robots_txt").isNotNull()).alias("any_robots"),
        ).localCheckpoint(eager=True)
        _mark("wave_select")
        stats = wobs.get
        n_wave, n_hosts = stats["n"], stats["hosts"]
        wave_buckets = stats["bks"]
        wave_origin_ids = stats["oids"]
        wave_any_robots = bool(stats["any_robots"])
        _mark("wave_stats")

        # park eligible origins with no due locations (Crawl.java:123-126) —
        # an anti-join against the (checkpointed, tiny) wave's hosts; the
        # rows ride the fused origins merge, tagged for the count
        parked_rows = (
            elig.join(wave.select("origin_id").distinct(), "origin_id", "left_anti")
            .withColumn("last_visit", F.lit(T))
            .withColumn("next_visit", F.lit(None).cast("long"))
            .withColumn("__tag", F.lit("parked"))
        )

        if n_wave == 0:
            pst = self._merge("origins", parked_rows, "upsert", tags=["parked"])
            n_parked = pst["rows_by_tag"].get("parked", 0)
            w = store.committed_wave + 1
            store.commit(w)
            wave.unpersist()
            if origins_ckpt:
                origins.unpersist()
            return {"wave": w, "ts": T, "fetched": 0, "parked": n_parked}

        exch = self._exchange(
            wave, T, wave_buckets, wave_origin_ids, n_wave=n_wave,
            any_robots=wave_any_robots,
        )
        # AQE coalesces shuffle output by COMPRESSED byte size, so a wave
        # whose payloads compress well can materialize in 1-3 partitions —
        # starving every downstream per-wave job of parallelism (worst case
        # the Arrow image-decode stage, whose cost scales with ROWS, not
        # bytes: measured 39 s single-worker vs ~1.5 s balanced on a 60k-row
        # wave of compressible images).  For waves whose ROW COUNT is known
        # small (≤ BROADCAST_WAVE_KEYS_MAX — n_wave is already on the
        # driver), repartition by the storage bucket BEFORE the one
        # checkpoint: whole buckets stay in one task, so the payload appends
        # are shuffle-free with ≤1 file per bucket, and compute-dense stages
        # get full task parallelism.  The r5 shape checkpointed first,
        # inspected the partition count, then repartitioned + checkpointed
        # AGAIN — materializing every small wave's payloads twice.  Mega
        # waves keep the inspect-then-rebalance fallback (an unconditional
        # repartition there would shuffle payload bytes AQE already spread).
        par = self.spark.sparkContext.defaultParallelism
        exch_aligned = n_wave <= BROADCAST_WAVE_KEYS_MAX
        if exch_aligned:
            exch = exch.repartition(
                max(par, self.store.buckets),
                F.pmod(F.col("origin_id"), F.lit(self.store.buckets)),
            ).localCheckpoint(eager=True)
        else:
            # the robots-gate and fetch/denied unions CONCATENATE partitions
            # (32 → 128 through two unions) — coalesce back to the session
            # parallelism before checkpointing or every downstream write
            # runs 4× tiny tasks / output files
            exch = exch.coalesce(par).localCheckpoint(eager=True)
            if exch.rdd.getNumPartitions() < min(par, self.store.buckets):
                balanced = exch.repartition(
                    max(par, self.store.buckets),
                    F.pmod(F.col("origin_id"), F.lit(self.store.buckets)),
                ).localCheckpoint(eager=True)
                exch.unpersist()
                exch = balanced
                exch_aligned = True
        exch_partitions = exch.rdd.getNumPartitions()
        _mark("exchange")

        n_fetched = n_wave  # one visit row per wave row by construction

        # per-partition wave metrics + the discovery gate count in ONE job
        # over the checkpointed exchange (the r5 shape ran a separate
        # succ.isEmpty() probe before the discovery machinery)
        metric_rows = exch.groupBy(F.spark_partition_id().alias("partition_id")).agg(
            F.count("*").alias("visits"),
            F.sum("content_length").alias("bytes"),
            F.sum(F.when(F.col("status") < 0, 1).otherwise(0)).alias("errors"),
            F.sum(
                F.when(
                    (F.col("status") >= 200)
                    & (F.col("status") <= 299)
                    & F.col("revisit_of_date").isNull(),
                    1,
                ).otherwise(0)
            ).alias("__succ"),
            F.sum(
                F.when(
                    (F.col("location_type") == "ROBOTS")
                    & (F.col("status") >= 200)
                    & (F.col("status") <= 299)
                    & F.col("revisit_of_date").isNull(),
                    1,
                ).otherwise(0)
            ).alias("__succ_robots"),
        ).collect()
        n_succ = sum(r["__succ"] for r in metric_rows)
        n_succ_robots = sum(r["__succ_robots"] for r in metric_rows)
        _mark("metrics_agg")

        # build all mutable-table deltas lazily, then ONE merge per table.
        # Every delta's plan freezes its staged-snapshot file list at
        # construction time, so the sinks below are independent.
        frontier_updates = self._frontier_visit_updates(exch, T)
        origin_updates = self._origin_updates(
            exch, wave, T, any_robots_fetched=n_succ_robots > 0
        )
        sm_rows, frontier_new, new_origins = self._discover(exch, T, n_succ=n_succ)

        o_delta = origin_updates.withColumn("__tag", F.lit("visited"))
        if new_origins is not None:
            o_delta = o_delta.unionByName(new_origins.withColumn("__tag", F.lit("new_origin")))
        o_delta = o_delta.unionByName(parked_rows.select(*o_delta.columns))

        # the five sinks write DIFFERENT tables and the store is
        # thread-safe, but they run SEQUENTIALLY on purpose: measured at
        # local-cluster 1→4 executors, overlapping them speeds up the
        # under-subscribed 1-executor case (216→181 s) while slowing the
        # saturated 4-executor case (92→118 s, memory/shuffle contention) —
        # net scaling efficiency drops 0.585→0.384.  On a real cluster with
        # headroom, a ThreadPoolExecutor around these four calls is the
        # one-line change.
        self._append_visits_and_warc(exch, T, bucket_aligned=exch_aligned)
        _mark("visits_warc_append")
        ost = store.merge_mixed(
            "origins", o_delta, None, tags=["visited", "new_origin", "parked"]
        )
        _mark("origins_merge")
        if sm_rows is not None:
            self._merge("sitemap_entries", sm_rows, "upsert")
            _mark("sitemap_merge")
        fst = store.merge_mixed("frontier", frontier_updates, frontier_new)
        _mark("frontier_merge")
        self._lineage.append(("origins", "upsert", ost["buckets"]))
        self._lineage.append(("frontier", "mixed", fst["buckets"]))
        n_parked = ost["rows_by_tag"].get("parked", 0)
        n_disc = fst["insert_rows"]
        self._release_discovery_caches()

        self._append_metrics(metric_rows, T)
        _mark("metrics_append")

        if cfg.screenshot_thumbnails:
            # inline S11 producer: this wave's image responses → thumbnails
            # → screenshot cache, published with the same commit.  Reads the
            # (checkpointed) exchange, not the warc table — no archive scan.
            from .screenshots import add_screenshots, image_response_thumbnails

            img_src = exch.filter(F.col("status") > 0).select(
                "origin_id",
                "path_id",
                F.lit(T).alias("date"),
                F.lit("response").alias("record_type"),
                F.col("body").alias("payload"),
            )
            add_screenshots(
                self.store,
                image_response_thumbnails(img_src, cfg.thumbnail_max_dim),
                self.store.committed_wave + 1,
            )
            _mark("screenshots_append")

        # publish the updated URL-seen planes with this wave's commit
        # (restart/resume then skips the full-frontier bloom rebuild)
        if cfg.use_bloom and self._bloom_bits is not None:
            store.save_bloom(self._bloom_bits, self._bloom_meta())

        w = store.committed_wave + 1
        store.commit(w)
        # free the checkpoint blocks — they otherwise accumulate in the
        # block manager across waves and GC-stall the whole JVM
        exch.unpersist()
        wave.unpersist()
        if origins_ckpt:
            origins.unpersist()
        _mark("bloom_commit")
        return {
            "wave": w, "ts": T, "fetched": n_fetched, "parked": n_parked,
            "discovered": n_disc, "phase_secs": phases,
            "exch_partitions": exch_partitions,
        }

    def run(self, max_waves: int, **kw) -> list[dict]:
        out = []
        for _ in range(max_waves):
            s = self.step(**kw)
            out.append(s)
            if s.get("idle"):
                break
        return out

    # ------------------------------------------------------ exchange stage
    def _robots_gate(self, wave: DataFrame, any_robots: bool = True) -> DataFrame:
        cfg = self.config
        if cfg.robots_policy == "IGNORE" or not any_robots:
            # no stored robots.txt anywhere in the wave (known from the
            # wave-stats agg): every row takes the null-robots allow-all
            # branch, so skip the two-branch union + Arrow parse stage
            return wave.withColumn("allowed", F.lit(True))
        ua = cfg.user_agent

        @F.pandas_udf(T.BooleanType())
        def is_allowed(robots: pd.Series, urls: pd.Series) -> pd.Series:
            cache: dict[int, C.RobotRules] = {}
            out = []
            for raw, u in zip(robots.tolist(), urls.tolist()):
                if raw is None:
                    out.append(True)
                    continue
                key = id(raw) if not isinstance(raw, (bytes, bytearray)) else hash(bytes(raw))
                r = cache.get(key)
                if r is None:
                    r = C.parse_robots(bytes(raw), ua)
                    cache[key] = r
                out.append(r.is_allowed(u))
            return pd.Series(out)

        # Python only where a robots.txt actually exists: rows with no stored
        # robots are allowed by definition (crawler-commons parses null as
        # allow-all) and must not pay the Arrow round-trip.  The split keeps
        # the hot path JVM-only when most hosts have no robots yet.
        no_robots = wave.filter(F.col("robots_txt").isNull()).withColumn("allowed", F.lit(True))
        with_robots = wave.filter(F.col("robots_txt").isNotNull())
        allowed = is_allowed(F.col("robots_txt"), F.col("url"))
        if cfg.robots_policy == "PAGES_ONLY":
            allowed = (F.col("location_type") != "PAGE") | allowed
        gated = with_robots.withColumn("allowed", allowed)
        return no_robots.unionByName(gated)

    def _exchange(
        self,
        wave: DataFrame,
        T: int,
        wave_buckets: list | None = None,
        wave_origin_ids: list | None = None,
        n_wave: int | None = None,
        any_robots: bool = True,
    ) -> DataFrame:
        """Robots gate → fetch → digest → dedupe; one row per exchange.

        J6/J7 history lookups (the reference's per-URL indexed SELECTs,
        ``Database.java:387-395``, ``schema.sql:131,139``) are pruned three
        ways before any window/join: (a) the visits/warc scans read only the
        buckets this wave touches (manifest-level file pruning), (b) an
        ``isin(wave origin_ids)`` pushed into the parquet scan — appends are
        key-sorted within bucket files, so row groups outside the wave's
        hosts are skipped at the reader, (c) a left-semi join against the
        wave's (origin_id, path_id) keys — wave ≪ history, and the semi
        join's hash partitioning is reused by the J6 window, so history rows
        outside the wave never shuffle.
        """
        cfg = self.config
        wk = wave.select("origin_id", "path_id")
        if wave_buckets is None:
            visits_hist = self.store.read("visits")
            warc_hist = self.store.read("warc_records")
        else:
            visits_hist = self.store.read_pruned("visits", wave_buckets)
            warc_hist = self.store.read_pruned("warc_records", wave_buckets)
        if wave_origin_ids:
            # (c) exact key pushdown: appends are sorted by (origin_id,
            # path_id) within bucket files, so isin(wave hosts) reaches the
            # parquet scan and skips whole row groups — the semi-join below
            # stays for exactness, this just stops history bytes at the scan
            in_hosts = F.col("origin_id").isin([int(x) for x in wave_origin_ids])
            visits_hist = visits_hist.filter(in_hosts)
            warc_hist = warc_hist.filter(in_hosts)
        if n_wave is not None and n_wave <= BROADCAST_WAVE_KEYS_MAX:
            # wave keys fit a broadcast (2 longs/row; gate sized well under
            # the driver budget): BROADCAST the semi so history rows are
            # filtered at the SCAN side, before any exchange — the J6 as-of
            # window then shuffles only the wave's ~k·hosts matching rows
            # instead of the whole pruned history (10× history growth cost
            # moves from the shuffle to a cheap columnar scan)
            semi = F.broadcast(wk)
        else:
            # mega-wave fallback: one hash shuffle of the pruned history,
            # whose (origin_id, path_id) partitioning the J6 window reuses
            semi = wk.hint("shuffle_hash")
        visits_hist = visits_hist.join(semi, ["origin_id", "path_id"], "left_semi")
        warc_hist = warc_hist.join(semi, ["origin_id", "path_id"], "left_semi")
        gated = self._robots_gate(wave, any_robots=any_robots)
        allowed = gated.filter(F.col("allowed"))
        denied = (
            gated.filter(~F.col("allowed"))
            .withColumn("status", F.lit(C.ROBOTS_DISALLOWED))
            .withColumn("content_type", F.lit(None).cast("string"))
            .withColumn("body", F.lit(None).cast("binary"))
            .withColumn("etag", F.lit(None).cast("string"))
            .withColumn("last_modified", F.lit(None).cast("string"))
            .withColumn("loc_header", F.lit(None).cast("string"))
            .withColumn("prev_date", F.lit(None).cast("long"))
        )
        if self._site_prep is None:
            self._site_prep = prepare_site(self.site)
        fetched = simulate_fetch(
            allowed,
            self._site_prep,
            visits_hist,
            warc_hist,
            T,
            dedupe_server=cfg.dedupe_server,
        )
        exch = fetched.unionByName(denied.select(*fetched.columns))
        exch = exch.withColumn(
            "content_length",
            F.when(F.col("status") > 0, F.length(F.coalesce(F.col("body"), F.lit(b"")))).otherwise(
                F.lit(0)
            ),
        ).withColumn(
            "digest",
            F.when(
                F.col("status") > 0, F.unhex(F.sha1(F.coalesce(F.col("body"), F.lit(b""))))
            ).otherwise(F.lit(None).cast("binary")),
        )
        exch = exch.withColumn("digest8", F.expr("substring(digest, 1, 8)"))

        # J7 digest dedupe (Storage.java:114-137): same (origin,path), prior
        # non-revisit visit with same truncated digest, full-digest recheck
        # against the stored WARC payload, min(date) pinned for determinism.
        if cfg.dedupe_digest:
            visits = visits_hist
            warc = warc_hist
            originals = (
                visits.filter(
                    F.col("revisit_of_date").isNull() & F.col("response_payload_digest").isNotNull()
                )
                .select(
                    "origin_id",
                    "path_id",
                    F.col("date").alias("__v_date"),
                    F.col("response_payload_digest").alias("__v_digest8"),
                )
                .join(
                    warc.filter(F.col("record_type") == "response").select(
                        "origin_id",
                        "path_id",
                        F.col("date").alias("__v_date"),
                        F.col("payload_digest").alias("__v_digest"),
                    ),
                    ["origin_id", "path_id", "__v_date"],
                    "left",
                )
            )
            cand = exch.filter(
                F.col("prev_date").isNull()
                & (F.col("status") > 0)
                & (F.col("content_length") >= cfg.dedupe_min_length)
            ).select("origin_id", "path_id", "digest8", "digest")
            dups = (
                cand.join(originals, ["origin_id", "path_id"], "inner")
                .filter(
                    (F.col("__v_digest8") == F.col("digest8"))
                    & (F.col("__v_digest") == F.col("digest"))
                )
                .groupBy("origin_id", "path_id")
                .agg(F.min("__v_date").alias("dup_date"))
            )
            exch = exch.join(dups, ["origin_id", "path_id"], "left")
        else:
            exch = exch.withColumn("dup_date", F.lit(None).cast("long"))
        return exch.withColumn("revisit_of_date", F.coalesce(F.col("prev_date"), F.col("dup_date")))

    # --------------------------------------------------------- state sinks
    def _append_visits_and_warc(
        self, exch: DataFrame, T: int, bucket_aligned: bool = False
    ) -> None:
        date_s = F.lit(T).cast("string")
        with_ids = exch.withColumn("date_s", date_s)
        resp_id = F.unhex(
            F.substring(F.sha1(F.concat_ws("|", F.col("url"), F.col("date_s"), F.lit("response"))), 1, 32)
        )
        req_id = F.unhex(
            F.substring(F.sha1(F.concat_ws("|", F.col("url"), F.col("date_s"), F.lit("request"))), 1, 32)
        )
        visits = with_ids.select(
            "origin_id",
            "path_id",
            F.lit(T).alias("date"),
            F.lit("GET").alias("method"),
            F.col("status").cast("short").alias("status"),
            # visit insert coalesces unknown content types to octet-stream
            # (Database.java:372-373)
            F.coalesce(F.col("content_type"), F.lit("application/octet-stream")).alias("content_type"),
            F.col("content_length"),
            F.when(F.col("status") > 0, resp_id).alias("warc_id"),
            F.lit(None).cast("long").alias("request_position"),
            F.lit(None).cast("long").alias("request_length"),
            F.lit(None).cast("long").alias("response_position"),
            F.lit(None).cast("long").alias("response_length"),
            F.col("digest8").alias("response_payload_digest"),
            "revisit_of_date",
        )
        self.store.append(
            "visits", visits, self.store.committed_wave + 1, bucket_aligned=bucket_aligned
        )

        stored = with_ids.filter(F.col("status") > 0)
        requests = stored.select(
            req_id.alias("warc_id"),
            F.lit("request").alias("record_type"),
            "url",
            F.lit(T).alias("date"),
            "origin_id",
            "path_id",
            F.lit(None).cast("binary").alias("payload"),
            F.lit(None).cast("binary").alias("payload_digest"),
            F.lit(None).cast("long").alias("refers_to_date"),
            F.lit(None).cast("string").alias("profile"),
            F.lit(None).cast("string").alias("etag"),
            F.lit(None).cast("string").alias("last_modified"),
        )
        responses = stored.select(
            resp_id.alias("warc_id"),
            F.when(F.col("revisit_of_date").isNotNull(), F.lit("revisit"))
            .otherwise(F.lit("response"))
            .alias("record_type"),
            "url",
            F.lit(T).alias("date"),
            "origin_id",
            "path_id",
            F.when(F.col("revisit_of_date").isNull(), F.col("body")).alias("payload"),
            F.col("digest").alias("payload_digest"),
            F.col("revisit_of_date").alias("refers_to_date"),
            F.when(
                F.col("revisit_of_date").isNotNull(),
                F.when(F.col("prev_date").isNotNull(), F.lit("server_not_modified")).otherwise(
                    F.lit("identical_payload_digest")
                ),
            ).alias("profile"),
            "etag",
            "last_modified",
        )
        self.store.append("warc_records", requests.unionByName(responses), self.store.committed_wave + 1)

    def _rule_next_visit(self, exch: DataFrame) -> DataFrame:
        """A4 + C13: longest matching rule pattern → schedule → next fire.
        Returns (origin_id, path_id, nv_schedule)."""
        if self._rules_empty is None:
            self._rules_empty = self.store.read("rules").isEmpty()
        if self._rules_empty:
            return None
        rules = self.store.read("rules")
        joined = exch.select("origin_id", "path_id", "path").join(rules, "origin_id", "inner")

        @F.pandas_udf(T.BooleanType())
        def rule_matches(patterns: pd.Series, pathrefs: pd.Series) -> pd.Series:
            import re as _re

            cache = {}
            out = []
            for pat, pr in zip(patterns.tolist(), pathrefs.tolist()):
                rx = cache.get(pat)
                if rx is None:
                    try:
                        rx = _re.compile(pat)
                    except _re.error:
                        rx = False
                    cache[pat] = rx
                # Java Pattern.matches() = full match (Rule.java:29-31)
                out.append(bool(rx.fullmatch(pr)) if rx else False)
            return pd.Series(out)

        matched = joined.filter(rule_matches(F.col("pattern"), F.col("path")))
        w = Window.partitionBy("origin_id", "path_id").orderBy(
            F.length("pattern").desc(), F.col("pattern").asc()
        )
        best = (
            matched.withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1) & F.col("schedule_id").isNotNull())
            .select("origin_id", "path_id", "schedule_id")
        )
        schedules = self.schedules

        @F.pandas_udf(T.LongType())
        def schedule_next(sids: pd.Series, dates: pd.Series) -> pd.Series:
            return pd.Series(
                batch_apply(schedules, sids.tolist(), dates.tolist()), dtype="object"
            )

        return best.withColumn("nv_schedule", schedule_next(F.col("schedule_id"), F.lit(self.clock)))

    def _frontier_visit_updates(self, exch: DataFrame, T: int) -> DataFrame:
        """C10/C11 next-visit cascade → updateVisitData delta (merged by the
        caller in one fused frontier MERGE with the wave's discoveries)."""
        cfg = self.config
        nv_rule = self._rule_next_visit(exch)
        out = exch
        if nv_rule is not None:
            out = out.join(nv_rule.select("origin_id", "path_id", "nv_schedule"), ["origin_id", "path_id"], "left")
        else:
            out = out.withColumn("nv_schedule", F.lit(None).cast("long"))

        days = (
            F.when(F.lower(F.col("changefreq")).isin("always", "hourly", "daily"), F.lit(1))
            .when(F.lower(F.col("changefreq")) == "weekly", F.lit(7))
            .when(F.lower(F.col("changefreq")) == "monthly", F.lit(29))
            .when(F.lower(F.col("changefreq")).isin("yearly", "never"), F.lit(365))
        )
        nv_changefreq = F.when(days.isNotNull(), F.lit(T) + days.cast("long") * F.lit(DAY_MS))

        dur = F.lit(T) - F.col("last_visit")
        # Exchange.java:264-277 — the inverted-AIMD branch, copied exactly:
        # revisitOf != null (payload UNCHANGED) → halve; else double.
        raw_next = F.when(F.col("revisit_of_date").isNotNull(), (dur / 2).cast("long")).otherwise(
            dur * 2
        )
        clamped = F.least(F.greatest(raw_next, F.lit(cfg.min_revisit_ms)), F.lit(cfg.max_revisit_ms))
        nv_aimd = F.when(F.col("last_visit").isNotNull(), F.lit(T) + clamped)

        is_html = F.col("content_type").isNotNull() & (
            F.trim(F.split(F.col("content_type"), ";").getItem(0)) == "text/html"
        )
        nv_initial = F.when(is_html, F.lit(T + cfg.initial_revisit_html_ms)).otherwise(
            F.lit(T + cfg.initial_revisit_other_ms)
        )

        updated = out.withColumn(
            "next_visit", F.coalesce("nv_schedule", nv_changefreq, nv_aimd, nv_initial)
        ).withColumn("last_visit", F.lit(T))
        return updated.select(
            "origin_id", "path_id", "path", "location_type", "depth",
            "via_origin_id", "via_path_id", "discovered", "last_visit", "next_visit",
        )

    def _origin_updates(
        self, exch: DataFrame, wave: DataFrame, T: int, any_robots_fetched: bool = True
    ) -> DataFrame:
        """C12 politeness + robots-field updates (updateVisit/updateRobots)
        → origins delta (merged by the caller in one fused origins MERGE).

        ``any_robots_fetched=False`` (known from the wave's metrics agg: no
        successful non-revisit ROBOTS fetch this wave) skips the
        robots-fields Arrow stage + join — with zero rb rows the left join
        kept every original value anyway, so the output is identical."""
        cfg = self.config
        delay = F.when(F.col("status") == C.ROBOTS_DISALLOWED, F.lit(0)).otherwise(
            F.least(
                F.coalesce(F.col("robots_crawl_delay").cast("long") * 1000, F.lit(5000)),
                F.lit(cfg.max_delay_millis),
            )
        )
        per_origin = (
            exch.withColumn("__delay", delay)
            .groupBy("origin_id")
            .agg(F.sum("__delay").alias("__total_delay"))
        )
        base = (
            wave.select(
                "origin_id", "origin", F.col("o_discovered").alias("discovered"),
                "crawl_policy", "robots_crawl_delay", "robots_txt",
            )
            .dropDuplicates(["origin_id"])
            .join(per_origin, "origin_id", "left")
            .withColumn("last_visit", F.lit(T))
            .withColumn("next_visit", F.lit(T) + F.coalesce(F.col("__total_delay"), F.lit(0)))
            .drop("__total_delay")
        )
        if not any_robots_fetched:
            return base
        # processRobots updates (Exchange.java:204-216) — from this wave's
        # successful ROBOTS fetches
        succ_robots = exch.filter(
            (F.col("location_type") == "ROBOTS")
            & (F.col("status") >= 200)
            & (F.col("status") <= 299)
            & F.col("revisit_of_date").isNull()
        ).select("origin_id", "body")
        ua = cfg.user_agent
        mrb = cfg.max_robots_bytes

        @F.pandas_udf("crawl_delay int, robots_txt binary")
        def robots_fields(bodies: pd.Series) -> pd.DataFrame:
            rows = []
            for b in bodies.tolist():
                raw = bytes(b or b"")[:mrb]
                r = C.parse_robots(raw, ua)
                rows.append((r.crawl_delay, raw))
            return pd.DataFrame(rows, columns=["crawl_delay", "robots_txt"])

        rb = succ_robots.withColumn("__rf", robots_fields(F.col("body"))).select(
            "origin_id",
            F.col("__rf.crawl_delay").alias("__new_delay"),
            F.col("__rf.robots_txt").alias("__new_robots"),
        )
        merged = (
            base.join(rb, "origin_id", "left")
            .withColumn(
                "robots_crawl_delay",
                F.when(F.col("__new_robots").isNotNull(), F.col("__new_delay").cast("short")).otherwise(
                    F.col("robots_crawl_delay")
                ),
            )
            .withColumn(
                "robots_txt",
                F.when(F.col("__new_robots").isNotNull(), F.col("__new_robots")).otherwise(
                    F.col("robots_txt")
                ),
            )
            .drop("__new_delay", "__new_robots")
        )
        return merged

    def _release_discovery_caches(self) -> None:
        for df in self._disc_caches:
            df.unpersist()
        self._disc_caches = []

    def _discover(self, exch: DataFrame, T: int, n_succ: int | None = None):
        """process() + enqueue(): extraction, depth cut, URL-seen anti-join.

        Returns lazy deltas ``(sm_rows, frontier_new, new_origins)`` (each
        possibly None); the caller folds them into the wave's fused MERGEs
        and then calls ``_release_discovery_caches``.
        """
        cfg = self.config
        self._disc_caches = []
        succ = exch.filter(
            (F.col("status") >= 200) & (F.col("status") <= 299) & F.col("revisit_of_date").isNull()
        )
        # cheap early-out: scheduler-only waves (no successful processable
        # fetches) skip the whole discovery machinery.  The caller passes
        # the count from the fused metrics agg; fall back to one probe job
        # on the cached exchange otherwise.
        if (n_succ == 0) if n_succ is not None else succ.isEmpty():
            return None, None, None
        disc = process_success_rows(succ, cfg.user_agent, cfg.max_robots_bytes).persist()
        self._disc_caches.append(disc)
        # one job: materializes the persist AND gates each delta by kind
        kinds = {r["kind"]: r["count"] for r in disc.groupBy("kind").count().collect()}

        # sitemap entries upsert (insertOrReplace, Database.java:340-343)
        sm = disc.filter(F.col("kind") == "sm_entry").withColumn("u", url_parts(F.col("url")))
        sm_rows = sm.select(
            F.col("u.origin_id").alias("origin_id"),
            F.col("u.path_id").alias("path_id"),
            F.col("sm_origin_id").alias("sitemap_origin_id"),
            F.col("sm_path_id").alias("sitemap_path_id"),
            "changefreq",
            F.col("priority").cast("float"),
            "lastmod",
        ).filter(F.col("origin_id").isNotNull())
        # last-writer-wins within the wave, deterministic by sitemap identity
        w_sm = Window.partitionBy("origin_id", "path_id").orderBy(
            F.col("sitemap_origin_id").asc(), F.col("sitemap_path_id").asc()
        )
        sm_rows = sm_rows.withColumn("__rn", F.row_number().over(w_sm)).filter(F.col("__rn") == 1).drop("__rn")
        if not kinds.get("sm_entry"):
            sm_rows = None
        if not kinds.get("loc"):
            return sm_rows, None, None

        # enqueue (Crawl.java:72-80): depth cut FIRST (before any insert)
        locs = (
            disc.filter(F.col("kind") == "loc")
            .withColumn("depth", F.col("via_depth") + 1)
            .filter(F.col("depth") <= cfg.max_depth)
            .withColumn("u", url_parts(F.col("url")))
            .filter(F.col("u.origin_id").isNotNull())
            .persist()
        )
        self._disc_caches.append(locs)

        # robots-location quirk (Crawl.java:76-78): tryInsert returns
        # existed-already; the robots.txt location is only enqueued on calls
        # where the origin row already existed — i.e. origin pre-existed, or
        # this is the 2nd+ enqueue touching that origin this wave.
        per_origin_cnt = locs.groupBy(F.col("u.origin_id").alias("origin_id"), F.col("u.origin").alias("origin")).agg(
            F.count("*").alias("__cnt")
        )
        # presence-only check → read_keys (base∪deltas, no MoR resolve);
        # distinct because a key may appear in base AND a delta chain
        pre_existing = (
            self.store.read_keys("origins", ["origin_id"], staged=True)
            .distinct()
            .withColumn("__pre", F.lit(True))
        )
        oc = per_origin_cnt.join(pre_existing, "origin_id", "left")

        new_origins = oc.filter(F.col("__pre").isNull()).select(
            "origin_id",
            "origin",
            F.lit(T).alias("discovered"),
            F.lit("TRANSCLUSIONS").alias("crawl_policy"),
            F.lit(None).cast("long").alias("last_visit"),
            F.lit(T).alias("next_visit"),
            F.lit(None).cast("short").alias("robots_crawl_delay"),
            F.lit(None).cast("binary").alias("robots_txt"),
        )

        robots_origins = oc.filter(F.col("__pre").isNotNull() | (F.col("__cnt") >= 2))

        from .functions.hashing import hash_str

        robots_locs = robots_origins.select(
            "origin_id",
            F.lit(hash_str("/robots.txt")).alias("path_id"),
            F.lit("/robots.txt").alias("path"),
            F.lit("ROBOTS").alias("location_type"),
            F.lit(0).cast("short").alias("depth"),
            F.lit(None).cast("long").alias("via_origin_id"),
            F.lit(None).cast("long").alias("via_path_id"),
            F.lit(T).alias("discovered"),
            F.lit(None).cast("long").alias("last_visit"),
            F.lit(T).alias("next_visit"),
        )

        # within-wave dedupe: deterministic winner per (origin,path)
        w_loc = Window.partitionBy(F.col("u.origin_id"), F.col("u.path_id")).orderBy(
            F.when(F.col("loc_type") == "ROBOTS", 3)
            .when(F.col("loc_type") == "SITEMAP", 2)
            .when(F.col("loc_type") == "TRANSCLUSION", 1)
            .otherwise(0)
            .desc(),
            F.col("via_origin_id").asc_nulls_last(),
            F.col("via_path_id").asc_nulls_last(),
        )
        frontier_new = (
            locs.withColumn("__rn", F.row_number().over(w_loc))
            .filter(F.col("__rn") == 1)
            .select(
                F.col("u.origin_id").alias("origin_id"),
                F.col("u.path_id").alias("path_id"),
                F.col("u.pathref").alias("path"),
                F.col("loc_type").alias("location_type"),
                F.col("depth").cast("short").alias("depth"),
                "via_origin_id",
                "via_path_id",
                F.lit(T).alias("discovered"),
                F.lit(None).cast("long").alias("last_visit"),
                F.lit(T).alias("next_visit"),
            )
        )
        all_new = frontier_new.unionByName(robots_locs).persist()
        self._disc_caches.append(all_new)
        if cfg.use_bloom:
            from .operators.cuckoo import (
                build_cuckoo_sharded,
                insert_collected,
                insert_sharded,
                split_by_cuckoo,
            )
            from .operators.seen import build_bloom_sharded, or_in_collected, split_by_bloom

            kind = cfg.seen_filter

            def _keyed(df):
                return df.select(
                    F.pmod(F.col("origin_id"), F.lit(cfg.bloom_shards)).alias("shard"),
                    F.xxhash64("origin_id", "path_id").alias("key"),
                )

            # URL-seen is a key-presence question: base∪delta keys without
            # the MoR newest-wins resolve (duplicates are harmless to a
            # filter build and to the joins below).  path rides along so the
            # collision check folds into the SAME verify join — a key
            # collision (same ids, different path) can only involve a row
            # the filter flags maybe-seen, so no second frontier scan needed.
            cur = self.store.read_keys(
                "frontier", ["origin_id", "path_id", "path"], staged=True
            ).select("origin_id", "path_id", F.col("path").alias("__p"))
            if self._bloom_bits is None:
                # one-time build over the whole frontier (engine start /
                # snapshot resume); afterwards the filter is maintained
                # incrementally — no per-wave full-frontier scan
                if kind == "cuckoo":
                    self._bloom_bits = build_cuckoo_sharded(
                        _keyed(cur), "key", "shard", cfg.bloom_shards, cfg.cuckoo_buckets
                    )
                else:
                    self._bloom_bits = build_bloom_sharded(
                        _keyed(cur), "key", "shard", cfg.bloom_shards, cfg.bloom_bits, cfg.bloom_k
                    )
            if kind == "cuckoo":
                definite_new, maybe_seen = split_by_cuckoo(
                    self.spark, all_new, self._bloom_bits
                )
                # cuckoo inserts happen AFTER verification (below): inserts
                # consume slots, so each key must enter exactly once — the
                # verified-new set, not the rediscovery superset
            else:
                definite_new, maybe_seen = split_by_bloom(
                    self.spark, all_new, self._bloom_bits, cfg.bloom_bits, cfg.bloom_k
                )
                # OR-in this wave's candidate keys (a superset of the rows
                # the MERGE inserts — supersets are safe: blooms only forbid
                # false negatives, and OR is idempotent).  kinds["loc"]
                # bounds the delta: small → one driver-side collect; big →
                # distributed treeAggregate.
                if kinds.get("loc", 0) <= 100_000:
                    # toPandas, not collect: Arrow transfer of the keyed
                    # delta instead of per-row py4j deserialization
                    self._bloom_bits = or_in_collected(
                        self._bloom_bits, _keyed(all_new).toPandas(), cfg.bloom_bits, cfg.bloom_k
                    )
                else:
                    delta_bits = build_bloom_sharded(
                        _keyed(all_new), "key", "shard", cfg.bloom_shards, cfg.bloom_bits, cfg.bloom_k
                    )
                    self._bloom_bits = self._bloom_bits | delta_bits
            # exact check only for the (small) maybe-seen set; FPs drop out
            # here, and the collision check (same ids, different path — ref
            # refuses to proceed, Url.java:30-50 identity) rides the same
            # lookup.  JOIN SHAPE MATTERS AT SCALE: the r3 form was
            # maybe_seen LEFT-OUTER frontier-keys, and a broadcast outer
            # join must build the NON-preserved (frontier) side — so Spark
            # sort-merged, shuffling the WHOLE frontier every wave (the
            # dominant residual in the 20M-row frontier-growth curve).
            # Decomposed into a broadcast left-SEMI (frontier streams, zero
            # shuffle → `matched` = the few frontier rows whose key is
            # maybe-seen) + tiny joins against `matched`:
            if kinds.get("loc", 0) <= BROADCAST_WAVE_KEYS_MAX:
                ms_keys = maybe_seen.select("origin_id", "path_id")
                matched = cur.join(
                    F.broadcast(ms_keys), ["origin_id", "path_id"], "left_semi"
                ).persist()
                self._disc_caches.append(matched)
                if cfg.check_collisions:
                    bad = matched.join(
                        F.broadcast(maybe_seen.select("origin_id", "path_id", "path")),
                        ["origin_id", "path_id"],
                    ).filter(F.col("path") != F.col("__p"))
                    clash = bad.limit(1).collect()
                    if clash:
                        raise RuntimeError(
                            f"Hash collision: {clash[0]['path']} vs {clash[0]['__p']}"
                        )
                verified_new = maybe_seen.join(
                    F.broadcast(matched.select("origin_id", "path_id")),
                    ["origin_id", "path_id"],
                    "left_anti",
                )
            else:
                # candidate set too big to broadcast — r3 sort-merge path
                hit = maybe_seen.join(cur, ["origin_id", "path_id"], "left")
                if cfg.check_collisions:
                    bad = hit.filter(
                        F.col("__p").isNotNull() & (F.col("path") != F.col("__p"))
                    )
                    clash = bad.limit(1).collect()
                    if clash:
                        raise RuntimeError(
                            f"Hash collision: {clash[0]['path']} vs {clash[0]['__p']}"
                        )
                verified_new = hit.filter(F.col("__p").isNull()).drop("__p")
            all_new = definite_new.unionByName(verified_new)
            if kind == "cuckoo":
                # insert-once maintenance: exactly the keys the frontier
                # MERGE will insert (verified not-in-frontier, so no key is
                # ever inserted twice over the crawl's lifetime).  Small
                # delta → one driver-side collect; big → one task per shard
                # against the broadcast planes.  Persisted: the insert and
                # the frontier MERGE both consume this frame, and the
                # probe+verify chain must not run twice.
                all_new = all_new.persist()
                self._disc_caches.append(all_new)
                if kinds.get("loc", 0) <= 100_000:
                    # toPandas, not collect: Arrow transfer (see bloom path)
                    self._bloom_bits = insert_collected(
                        self._bloom_bits, _keyed(all_new).toPandas(), cfg.cuckoo_buckets
                    )
                else:
                    self._bloom_bits = insert_sharded(
                        self.spark, self._bloom_bits, _keyed(all_new),
                        "key", "shard", cfg.cuckoo_buckets,
                    )
        elif cfg.check_collisions:
            # bloom off: no maybe-seen subset exists — scan the keys view.
            # Inner join with the candidate side broadcast when bounded, so
            # the frontier streams instead of shuffling
            cur = self.store.read_keys(
                "frontier", ["origin_id", "path_id", "path"], staged=True
            ).select("origin_id", "path_id", F.col("path").alias("__p"))
            cand = all_new.select("origin_id", "path_id", "path")
            if kinds.get("loc", 0) <= BROADCAST_WAVE_KEYS_MAX:
                cand = F.broadcast(cand)
            bad = cur.join(cand, ["origin_id", "path_id"], "inner").filter(F.col("path") != F.col("__p"))
            clash = bad.limit(1).collect()
            if clash:
                raise RuntimeError(f"Hash collision: {clash[0]['path']} vs {clash[0]['__p']}")
        return sm_rows, all_new, new_origins

    def _append_metrics(self, metric_rows: list, T: int) -> None:
        wave_n = self.store.committed_wave + 1
        # ≤ one row per exchange partition, already collected by the step's
        # fused metrics+discovery-gate agg: write the parquet driver-side —
        # a Spark write job for ≤32 rows was pure scheduling floor
        # (~0.3 s/wave)
        self.store.append_rows(
            "metrics",
            [
                (wave_n, T, r["partition_id"], r["visits"], r["bytes"], r["errors"])
                for r in metric_rows
            ],
            wave_n,
        )
        rows = [(wave_n, t, op, None, b) for (t, op, b) in self._lineage] or [
            (wave_n, "visits", "append", None, None)
        ]
        self._lineage = []
        self.store.log_lineage(wave_n, rows)

    # ---------------------------------------------------------- maintenance
    def retire_locations(self, keys_df: DataFrame) -> dict:
        """Retire frontier locations — the maintenance op the cuckoo
        URL-seen variant exists for (the reference never deletes locations:
        its seen-set is the location table's insert-if-absent PK,
        ``Database.java:229-251``; retirement is our scale addition for
        frontier compaction / record purge at 10^10 rows).

        ``keys_df``: (origin_id, path_id) rows to retire.  Three effects:

        1. bucket-pruned COW delete of the frontier rows
           (``StateStore.delete_where`` — O(touched buckets));
        2. ``seen_filter="cuckoo"``: the keys are deleted from the filter
           planes (collected fast path ≤100k keys, else the distributed
           per-shard ``delete_sharded``), so a later re-discovery is
           eligible again at filter level.  Safe per the cuckoo contract —
           retired keys were inserted; a collision-induced false negative
           on a surviving key only costs a duplicate insert ATTEMPT, which
           the frontier's insert-if-absent merge drops;
        3. ``seen_filter="bloom"``: planes are left untouched.  Bloom
           cannot delete — the stale bits become a permanent false
           positive, which is sound (maybe-seen rows go through the exact
           verify join against the now-smaller frontier and re-enter);
           only the FP rate degrades over many retire cycles.  That
           asymmetry is the bloom-vs-cuckoo tradeoff in SURVEY §4.2.

        Staged like every other mutation: the next ``store.commit`` (or
        the next wave's commit) publishes both the rewritten buckets and —
        for cuckoo — the updated planes.  Returns the delete stats dict.
        """
        cfg = self.config
        keys_df = keys_df.select("origin_id", "path_id")
        stats = self.store.delete_where("frontier", keys_df)
        if (
            cfg.use_bloom
            and cfg.seen_filter == "cuckoo"
            and self._bloom_bits is not None
            and stats["rows_deleted"]
        ):
            from .operators.cuckoo import delete_collected, delete_sharded

            keyed = keys_df.select(
                F.pmod(F.col("origin_id"), F.lit(cfg.bloom_shards)).alias("shard"),
                F.xxhash64("origin_id", "path_id").alias("key"),
            ).distinct()
            if stats["rows_deleted"] <= 100_000:
                delete_collected(self._bloom_bits, keyed.collect(), cfg.cuckoo_buckets)
            else:
                self._bloom_bits = delete_sharded(
                    self.spark, self._bloom_bits, keyed, "key", "shard", cfg.cuckoo_buckets
                )
            self.store.save_bloom(self._bloom_bits, self._bloom_meta())
        return stats

    def purge_origin(self, origin_id: int) -> dict:
        """Full origin takedown — every trace of the host leaves the store.

        The reference keeps history forever (its only deletion is the
        keep-newest-K screenshot expiry, ``Database.java:455-474``); a real
        archive at 10^10 rows must honor takedown/robots-revocation
        requests, so purge is the scale-side maintenance op that composes
        the store's bucket-pruned deletes:

        - frontier rows via ``retire_locations`` (incl. cuckoo key delete);
        - the ``origins`` / ``sitemap_entries`` / ``rules`` rows
          (``delete_where``, COW on touched buckets);
        - visit/WARC/screenshot HISTORY via ``delete_append_where`` — only
          the (wave, bucket) files that can contain the origin are read,
          computed per rebucket epoch; kept rows move to one maintenance
          wave and ``vacuum`` reclaims the de-listed bucket files.

        Self-commits as its own snapshot: the history rewrite appends at
        ``committed_wave + 1`` — the id the next crawl wave would claim —
        so the purge must publish atomically rather than stage.  Call
        between waves (like every maintenance op).
        """
        store = self.store
        out: dict = {}
        keys = (
            store.read_staged("frontier")
            .filter(F.col("origin_id") == int(origin_id))
            .select("origin_id", "path_id")
        )
        out["frontier"] = self.retire_locations(keys)
        oid = self.spark.createDataFrame([(int(origin_id),)], "origin_id long")
        out["origins"] = store.delete_where("origins", oid)
        for t in ("sitemap_entries", "rules"):
            tkeys = (
                store.read_staged(t)
                .filter(F.col("origin_id") == int(origin_id))
                .select(*MUTABLE_TABLES[t][1])
            )
            out[t] = store.delete_where(t, tkeys)
        wave = store.committed_wave + 1
        for t in ("visits", "warc_records", "screenshots"):
            out[t] = store.delete_append_where(t, [int(origin_id)], wave)
        store.commit(wave)
        return out

    def compact_history(
        self,
        tables: tuple = ("visits", "warc_records", "screenshots", "metrics"),
        min_waves: int = 2,
    ) -> dict:
        """Fold small per-wave append files into consolidated waves
        (L23 — `StateStore.compact_appends` per table; the maintenance op a
        continuous crawl needs because every wave leaves ≤1 file per bucket
        per append table, and at 1000s of waves the file-open/task floor of
        pruned history reads dominates long before data volume).

        Self-commits as its own snapshot (like ``purge_origin``): the
        rewrite appends at ``committed_wave + 1`` — the id the next crawl
        wave would claim — so it must publish atomically rather than stage.
        Call between waves; no-op commits nothing.  Old files remain for
        retained snapshots until ``vacuum``.
        """
        store, cfg = self.store, self.config
        wave = store.committed_wave + 1
        out: dict = {}
        did = False
        for t in tables:
            r = store.compact_appends(
                t,
                wave,
                small_bytes=cfg.compact_small_bytes,
                max_rewrite_bytes=cfg.compact_max_rewrite_bytes,
                min_waves=min_waves,
            )
            out[t] = r
            did = did or bool(r["waves_in"])
        if did:
            store.log_lineage(
                wave,
                [
                    (wave, t, "compact_appends", None, r["waves_in"])
                    for t, r in out.items()
                    if r["waves_in"]
                ],
            )
            store.commit(wave)
        return out

    def reapply_rules_to_origin(self, origin_id: int) -> int:
        """W5 — ``Rule.reapplyRulesToOrigin`` (``Rule.java:48-67``): for every
        visited location of the origin, recompute next_visit from the best
        matching rule's schedule; update rows whose next_visit changes.

        The reference paginates with keyset scans; set semantics need no
        pagination here — one filtered scan + window + MERGE."""
        rules = self.store.read("rules").filter(F.col("origin_id") == origin_id)
        if rules.isEmpty():
            return 0
        locs = self.store.read("frontier").filter(
            (F.col("origin_id") == origin_id) & F.col("last_visit").isNotNull()
        )
        joined = locs.join(rules.select("origin_id", "pattern", "schedule_id"), "origin_id")

        @F.pandas_udf(T.BooleanType())
        def rule_matches(patterns: pd.Series, pathrefs: pd.Series) -> pd.Series:
            import re as _re

            cache = {}
            out = []
            for pat, pr in zip(patterns.tolist(), pathrefs.tolist()):
                rx = cache.get(pat)
                if rx is None:
                    try:
                        rx = _re.compile(pat)
                    except _re.error:
                        rx = False
                    cache[pat] = rx
                out.append(bool(rx.fullmatch(pr)) if rx else False)
            return pd.Series(out)

        from pyspark.sql import Window as W

        matched = joined.filter(rule_matches(F.col("pattern"), F.col("path")))
        w = W.partitionBy("origin_id", "path_id").orderBy(
            F.length("pattern").desc(), F.col("pattern").asc()
        )
        best = (
            matched.withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1) & F.col("schedule_id").isNotNull())
        )
        schedules = self.schedules

        @F.pandas_udf(T.LongType())
        def schedule_next(sids: pd.Series, dates: pd.Series) -> pd.Series:
            return pd.Series(batch_apply(schedules, sids.tolist(), dates.tolist()), dtype="object")

        updated = (
            best.withColumn("next_visit", schedule_next(F.col("schedule_id"), F.col("last_visit")))
            .select(*[f.name for f in self.store.read("frontier").schema.fields])
        )
        n = updated.count()
        if n:
            self.store.merge("frontier", updated, "upsert")
            self.store.commit(self.store.committed_wave + 1)
        return n
