"""The crawl engine: frontier → politeness schedule → fetch → extract →
atomic epoch commit, looping until the frontier drains (SURVEY.md §7.1).

One epoch is one batch job.  The reference's six Celery phases collapse into
a single dataflow evaluated per epoch; phases emerge naturally from URL
depth (listing pages are fetched first because seeds point at them, detail
pages next, contact pages last — the same wave structure as
app/main.py:661-697 without any orchestration code).

Scale notes (10^10-URL design point):
* frontier/seen live in the epoch catalog partitioned by epoch; pending is
  ``frontier ∖ seen`` — one anti-join shuffle on the 64-bit hash, no state
  mutation ever (S10 → append-only; SURVEY.md §7.4.5).
* the scheduled set per epoch is budget-bounded by politeness, so the fetch
  join broadcasts the *scheduled* side against the big pages table — the
  10^10-row pages side is never shuffled.
* extraction is Arrow-batched pandas UDFs over a salted-host repartition
  (Zipf mega-hosts spread across partitions).
* a deterministic "flaky fetch" simulator exercises the retry path
  (reference: 4 retries with backoff, tasks.py:204-268 → here: priority
  demotion via retry_count, re-scheduled next epoch).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.udfs import with_url_hash
from .singlepass import fused_extract
from ..operators.dedup import dedup_keep_first, dedup_keep_last
from ..operators.politeness import politeness_schedule
from ..operators.seen import anti_join_seen
from ..operators.export import export_contacts
from .catalog import EpochCatalog

FRONTIER_SCHEMA = T.StructType([
    T.StructField("url_hash", T.LongType()),
    T.StructField("canon_url", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("kind", T.StringType()),        # listing | detail | contact
    T.StructField("url_type", T.StringType()),    # website | facebook (contact)
    T.StructField("priority", T.IntegerType()),
    T.StructField("depth", T.IntegerType()),
    T.StructField("industry", T.StringType()),
    T.StructField("company_name", T.StringType()),
    T.StructField("retry_count", T.IntegerType()),
    T.StructField("epoch_added", T.IntegerType()),
])

SEEN_SCHEMA = T.StructType([
    T.StructField("url_hash", T.LongType()),
    T.StructField("first_epoch", T.IntegerType()),
    T.StructField("reason", T.StringType()),      # fetched | disallowed | missing | gave_up
])


@dataclass
class CrawlRunConfig:
    state_dir: str
    directory_host: str = "1900.example.vn"
    epoch_seconds: float = 60.0
    max_epochs: int = 50
    max_retries: int = 4
    simulate_flaky_rate: float = 0.0   # deterministic first-attempt failures
    num_partitions: int | None = None
    # circuit breaker (reference: app/utils/circuit_breaker.py:52-92 —
    # CLOSED/OPEN/HALF_OPEN per resource): a host with ≥ threshold failures
    # in an epoch is OPEN (skipped) for the next `cooldown` epochs, then
    # half-open (scheduled again)
    breaker_threshold: int = 3
    breaker_cooldown_epochs: int = 1


class CrawlEngine:
    def __init__(self, spark: SparkSession, pages: DataFrame, hosts: DataFrame,
                 cfg: CrawlRunConfig):
        self.spark = spark
        self.cfg = cfg
        self.catalog = EpochCatalog(spark, cfg.state_dir)
        self.hosts = hosts
        # index the page store once: canonical url + hash, keep-oldest per
        # url (D2 dedup of duplicate captures), persisted across epochs.
        # F5 validity gate (detail_crawler.py:39, contact_crawler.py:127):
        # a fetch with ≤100 bytes of html is not a page — such URLs fall
        # through to the 'missing' seen-reason instead of being extracted
        idx = with_url_hash(pages.filter(F.length("html") > 100), "url")
        idx = dedup_keep_first(idx, ["url_hash"], "warc_ts", tiebreak=["canon_url"])
        self.pages_idx = idx.select("url_hash", "canon_url", "host", "html", "warc_ts", "lang").persist()

    # ---- url classification (corpus conventions; cf. 1900comvn.yml:33) ----

    def _classify(self, df: DataFrame) -> DataFrame:
        is_detail = F.col("canon_url").contains("-tong-quan")
        is_listing = F.col("host") == F.lit(self.cfg.directory_host)
        return df.withColumn(
            "kind",
            F.when(is_detail, "detail").when(is_listing, "listing").otherwise("contact"),
        ).withColumn(
            "url_type",
            F.when(F.col("kind") != "contact", F.lit(None).cast("string"))
            .when(F.col("host").contains("facebook.com"), "facebook")
            .otherwise("website"),
        )

    # ---- bootstrap ---------------------------------------------------------

    def init_frontier(self, seeds: DataFrame) -> None:
        """Epoch -0 commit: seeds become the initial frontier."""
        f = with_url_hash(seeds, "url")
        f = self._classify(f).select(
            "url_hash", "canon_url", "host", "kind", "url_type",
            F.coalesce(F.col("priority"), F.lit(0)).cast("int").alias("priority"),
            F.lit(0).alias("depth"),
            F.col("industry"),
            F.lit(None).cast("string").alias("company_name"),
            F.lit(0).alias("retry_count"),
            F.lit(0).alias("epoch_added"),
        )
        self.catalog.write_epoch(0, {"frontier": f}, metadata={"phase": "bootstrap"})

    # ---- one epoch ---------------------------------------------------------

    def _pending(self) -> DataFrame | None:
        frontier = self.catalog.read("frontier")
        if frontier is None:
            return None
        frontier = frontier.drop("epoch")
        seen = self.catalog.read("seen")
        pending = frontier if seen is None else anti_join_seen(frontier, seen.drop("epoch"))
        # rediscovered urls keep one row; retried rows win (highest retry_count
        # → demoted in the politeness order), ties broken by earliest epoch
        return dedup_keep_last(pending, ["url_hash"], "retry_count", tiebreak=["epoch_added"])

    def run_epoch(self, epoch: int) -> dict | None:
        t0 = time.time()
        cfgc = self.cfg
        pending = self._pending()
        if pending is None:
            return None
        pending = pending.persist()
        urls_pending = pending.count()
        if urls_pending == 0:
            pending.unpersist()
            return None

        scheduled, deferred, disallowed = politeness_schedule(
            pending, self.hosts, epoch_seconds=cfgc.epoch_seconds,
            order_cols=("priority", "retry_count", "url_hash"),
        )

        # circuit breaker: hosts that tripped in the cooldown window are
        # OPEN — their urls sit out this epoch (stay pending, no seen rows)
        breaker = self.catalog.read("breaker")
        n_breaker_deferred = 0
        if breaker is not None and cfgc.breaker_threshold > 0:
            open_hosts = (
                breaker.drop("epoch")
                .filter(
                    (F.col("n_failures") >= cfgc.breaker_threshold)
                    & (F.col("fail_epoch") >= epoch - cfgc.breaker_cooldown_epochs)
                )
                .select("host").distinct()
            )
            tripped = scheduled.join(F.broadcast(open_hosts), on="host", how="left_semi")
            n_breaker_deferred = tripped.count()
            if n_breaker_deferred:
                scheduled = scheduled.join(F.broadcast(open_hosts), on="host", how="left_anti")
        scheduled = scheduled.persist()
        n_scheduled = scheduled.count()
        n_disallowed = disallowed.count()
        if n_scheduled == 0 and n_breaker_deferred == 0 and n_disallowed == 0:
            # nothing schedulable and nothing that will unblock by waiting
            pending.unpersist()
            scheduled.unpersist()
            return None

        # deterministic flaky-fetch simulation: fail first attempts by hash
        if cfgc.simulate_flaky_rate > 0:
            flaky = (
                F.pmod(F.xxhash64("url_hash", F.lit(1234)), F.lit(10_000))
                < F.lit(int(cfgc.simulate_flaky_rate * 10_000))
            ) & (F.col("retry_count") < F.lit(1))
            failed_now = scheduled.filter(flaky)
            attempt = scheduled.filter(~flaky)
        else:
            failed_now = None
            attempt = scheduled

        # fetch = hash-join against the page store; scheduled side is
        # budget-bounded → broadcast it, never shuffle the page store
        att_sel = attempt.select(
            "url_hash", "kind", "url_type", "priority", "depth",
            F.col("industry").alias("seed_industry"),
            F.col("company_name").alias("seed_company_name"),
            "retry_count",
        )
        fetched = self.pages_idx.join(F.broadcast(att_sel), on="url_hash", how="inner")
        # ONE fused Arrow pass: shared DOM parse feeds detail/email/link/text
        # kernels per url kind; frontier metadata rides through as passthrough
        ext = fused_extract(
            fetched,
            passthrough={
                "host": "string", "lang": "string", "warc_ts": "timestamp",
                "seed_industry": "string", "seed_company_name": "string",
                "depth": "int",
            },
        ).persist()
        n_fetched = ext.count()
        missing = att_sel.join(ext.select("url_hash"), "url_hash", "left_anti")

        details = ext.filter(F.col("kind") == "detail").select(
            "url_hash", "canon_url", "host", "lang", "warc_ts", "seed_industry",
            "company_name", "address", "phone", "website", "facebook",
            "linkedin", "tiktok", "youtube", "instagram", "industry",
            "created_year", "revenue", "scale", "text",
            F.lit(epoch).alias("epoch_fetched"),
        )

        emails = ext.filter(F.col("kind") == "contact").select(
            "url_hash", "canon_url", "url_type",
            F.col("seed_company_name").alias("company_name"), "emails",
            F.when(F.size("emails") > 0, F.lit(0.9)).otherwise(F.lit(0.0)).alias("confidence_score"),
            F.lit(epoch).alias("epoch_fetched"),
        )

        # frontier expansion: listing pages yield company + pagination links
        # (list_crawler.py:342-394, :330-340), detail pages yield their
        # website/facebook contact urls
        new_links = (
            ext.filter(F.size(F.coalesce("out_links", F.array())) > 0)
            .select(
                F.explode("out_links").alias("url"),
                (F.col("depth") + 1).alias("depth"),
                F.col("seed_industry").alias("industry"),
                F.when(F.col("kind") == "detail", F.col("company_name"))
                .otherwise(F.lit(None).cast("string")).alias("company_name"),
            )
        )
        # priority is a pure function of kind — listings drain before details
        # before contacts, mirroring the reference's phase order (main.py:661-697)
        new_frontier = self._classify(with_url_hash(new_links, "url")).select(
            "url_hash", "canon_url", "host", "kind", "url_type",
            F.when(F.col("kind") == "listing", 0)
            .when(F.col("kind") == "detail", 1)
            .otherwise(2).cast("int").alias("priority"),
            F.col("depth").cast("int"),
            "industry", "company_name",
            F.lit(0).alias("retry_count"),
            F.lit(epoch).alias("epoch_added"),
        ).dropDuplicates(["url_hash"])

        # retried rows go back to the frontier with demoted order
        retries = None
        n_failed = 0
        breaker_rows = None
        if failed_now is not None:
            breaker_rows = (
                failed_now.groupBy("host")
                .agg(F.count("*").alias("n_failures"))
                .withColumn("fail_epoch", F.lit(epoch))
            )
            retries = failed_now.select(
                "url_hash", "canon_url", "host", "kind", "url_type",
                "priority", "depth", "industry", "company_name",
                (F.col("retry_count") + 1).cast("int").alias("retry_count"),
                F.lit(epoch).alias("epoch_added"),
            ).filter(F.col("retry_count") <= cfgc.max_retries)
            new_frontier = new_frontier.unionByName(retries)
            n_failed = failed_now.count()

        # seen = fetched ∪ disallowed ∪ missing (never re-scheduled)
        seen_rows = (
            ext.select("url_hash", F.lit(epoch).alias("first_epoch"), F.lit("fetched").alias("reason"))
            .unionByName(disallowed.select("url_hash", F.lit(epoch).alias("first_epoch"), F.lit("disallowed").alias("reason")))
            .unionByName(missing.select("url_hash", F.lit(epoch).alias("first_epoch"), F.lit("missing").alias("reason")))
        )

        records_out = details
        n_records = records_out.count()
        n_deferred = deferred.count()

        metrics = {
            "epoch": epoch,
            "urls_pending": urls_pending,
            "scheduled": n_scheduled,
            "deferred": n_deferred,
            "disallowed": n_disallowed,
            "fetched": n_fetched,
            "failed_flaky": n_failed,
            "breaker_deferred": n_breaker_deferred,
            "records_out": n_records,
        }
        checkpoint = self.spark.createDataFrame(
            [(epoch, urls_pending, n_scheduled, n_deferred, n_disallowed,
              n_fetched, n_failed, n_records, int((time.time() - t0) * 1000),
              f"epoch {epoch}: schedule->fetch->extract->commit")],
            "epoch int, urls_pending long, scheduled long, deferred long, "
            "disallowed long, fetched long, failed long, records_out long, "
            "wall_ms long, lineage string",
        )
        tables = {
            "records": records_out,
            "emails": emails,
            "seen": seen_rows,
            "frontier": new_frontier,
            "checkpoints": checkpoint,
        }
        if breaker_rows is not None:
            tables["breaker"] = breaker_rows
        self.catalog.write_epoch(epoch, tables, metadata=metrics)
        metrics["wall_ms"] = int((time.time() - t0) * 1000)
        pending.unpersist()
        scheduled.unpersist()
        ext.unpersist()
        return metrics

    # ---- full run / resume -------------------------------------------------

    def run(self, seeds: DataFrame | None = None) -> list[dict]:
        """Run to frontier exhaustion.  With an existing state_dir this
        RESUMES from the last committed epoch (killed runs lose at most the
        uncommitted epoch, which is recomputed)."""
        self.catalog.rollback_uncommitted()
        last = self.catalog.last_committed_epoch()
        if last < 0:
            if seeds is None:
                raise ValueError("fresh run needs seeds")
            self.init_frontier(seeds)
            last = 0
        out = []
        for epoch in range(last + 1, self.cfg.max_epochs + 1):
            m = self.run_epoch(epoch)
            if m is None:
                break
            out.append(m)
        return out

    # ---- outputs -------------------------------------------------------------

    def records(self) -> DataFrame | None:
        return self.catalog.read("records")

    def emails(self) -> DataFrame | None:
        return self.catalog.read("emails")

    def seen(self) -> DataFrame | None:
        return self.catalog.read("seen")

    def checkpoints(self) -> DataFrame | None:
        return self.catalog.read("checkpoints")

    def export(self) -> DataFrame:
        """Phase-6 export join over the engine's own outputs."""
        records = self.records()
        emails = self.emails()
        company_details = records.select(
            "company_name", F.col("canon_url").alias("company_url"),
            "address", "phone", "website", "facebook", "linkedin", "tiktok",
            "youtube", "instagram", "industry", "created_year", "revenue", "scale",
        )
        detail_pages = records.select(
            F.col("canon_url").alias("url"),
            F.col("seed_industry").alias("industry"),
        )
        email_extraction = emails.select(
            "company_name", "emails",
            F.col("url_type").alias("email_source"),
        ).filter(F.col("company_name").isNotNull())
        return export_contacts(company_details, detail_pages, email_extraction)

    def export_csv(self, path: str, max_na_ratio: float = 0.7) -> None:
        """Final CSV sink (reference tasks.py:773-786 fixed-column-order CSV)
        with the N/A-density row gate applied (merge_files.py:50-76)."""
        from ..operators.export import EXPORT_COLUMNS
        from ..operators.qualitygate import na_density_filter

        df = na_density_filter(self.export(), EXPORT_COLUMNS, max_na_ratio)
        df.write.mode("overwrite").option("header", True).csv(path)
