"""ValidationEngine — orchestration, short-circuit, resume, lineage.

The engine's run shape mirrors the reference's top entry
(lib.rs:699-759): validate config -> schema checks -> short-circuit ->
kernel -> finalize, with the strip walker's bounded-memory /
cancellable execution (strip.rs:491-581) recast as per-partition
checkpointing: every finished partition writes a completion marker,
and a resumed run anti-joins the marker table to skip done work.

Outputs per run:
  verdicts   — per-(repo_bucket, lang) drift scores + PASS/WARN/FAIL
  violations — row-level constraint failures, deterministically ordered
  metrics    — per-run lineage: counts, config echo, per-check stats
"""

from __future__ import annotations

import itertools
import json
import threading
import time
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession, functions as F

from sparkval import constraints
from sparkval.baseline import build_baseline
from sparkval.config import ValidationConfig
from sparkval.drift import drift_verdicts_joined, joined_hists, partition_histograms
from sparkval.schema import check_corpus_schema

#: fused single-scan tables persisted by validate(single_scan=True) —
#: both returned DataFrames (verdicts, violations) read them, so the
#: cache must outlive the call; ownership lives here (the
#: pipeline.dedup lazy-cache discipline) and release_scan_caches()
#: drains it.
_SCAN_CACHES: list[DataFrame] = []


def release_scan_caches() -> int:
    """Unpersist fused scan tables left cached by
    validate(single_scan=True). Call after consuming a validate
    result in a long-lived session (the driver entry queries and the
    bench harness do; clearCache()/session exit also work). Returns
    the number of tables released."""
    n = 0
    while _SCAN_CACHES:
        df = _SCAN_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped
            pass
    return n


class ValidationCancelled(RuntimeError):
    """Raised by validate_with_stop when its token was cancelled — the
    Cancelled(StopReason) analog (lib.rs:699-706)."""

    def __init__(self, reason: str | None):
        super().__init__(reason or "cancelled")
        self.reason = reason


class CancellationToken:
    """Cooperative cancellation scoped to a Spark job group — the
    enough::Stop analog (lib.rs:699-706). ``cancel()`` may be called
    from any thread: every Spark job the guarded run has in flight is
    cancelled (running tasks interrupted), and the run raises
    ValidationCancelled. Where the reference polls its token at strip
    boundaries (strip.rs:510-513), Spark's scheduler is the poller —
    job-group cancellation reaches straight into running stages."""

    _seq = itertools.count()

    def __init__(self, spark: SparkSession, group: str | None = None):
        self._sc = spark.sparkContext
        self.group = group or f"sparkval-stop-{next(self._seq)}"
        self.reason: str | None = None
        self._cancelled = threading.Event()

    def cancel(self, reason: str = "cancelled") -> None:
        self.reason = reason
        self._cancelled.set()
        # cancelJobGroupAndFutureJobs (Spark 3.5+) also fences jobs the
        # run hasn't submitted yet — plain cancelJobGroup only reaches
        # jobs active at this instant, racing a cancel fired while the
        # driver is still planning
        jsc = getattr(self._sc, "_jsc", None)
        if jsc is not None and hasattr(jsc.sc(), "cancelJobGroupAndFutureJobs"):
            jsc.sc().cancelJobGroupAndFutureJobs(self.group)
        else:  # pragma: no cover - older Spark
            self._sc.cancelJobGroup(self.group)

    @property
    def cancelled(self) -> bool:
        return self._cancelled.is_set()


class ValidationEngine:
    def __init__(self, config: ValidationConfig | None = None):
        self.config = config or ValidationConfig()
        self.config.validate()

    # -- baseline ----------------------------------------------------------
    def build_baseline(self, corpus: DataFrame, precompute_bands: bool = True) -> DataFrame:
        check_corpus_schema(corpus)
        return build_baseline(corpus, self.config, precompute_bands=precompute_bands)

    # -- one-shot validation ------------------------------------------------
    def validate(
        self,
        snapshot: DataFrame,
        baseline: DataFrame,
        commits: DataFrame | None = None,
        expected_manifest: DataFrame | None = None,
        single_scan: bool | None = None,
    ) -> dict[str, DataFrame]:
        """Full validation of a snapshot against a baseline table.

        ``expected_manifest``: optional (repo, path, commit,
        content_sha256) table from a reference engine run — enables the
        per-row sha256 invariant check (BASELINE.json input_hint).

        ``single_scan=True`` (round 5): reads the content column ONCE
        — a fused Arrow kernel emits histogram partials and the narrow
        per-row check partials (sha256 of EVERY row included) from the
        same scan (histograms.fused_scan_partials); the fused table
        (tiny: ~100 B/row) is persisted and both outputs derive from
        it. Outputs are bit-identical to the classic two-plan shape
        (parity-tested both ways).

        Default is AUTO, from the measured cost model (sf0.1,
        local[32], BENCH.md round 5): with ``expected_manifest`` the
        classic shape hashes every row in a second content pass, so
        fusing saves that pass (~1.2x faster) -> fused. WITHOUT the
        manifest the classic violations plan never reads content for
        non-violating rows (uniqueness shuffles 3 key columns;
        parquet prunes the rest), so the "second scan" it avoids is
        mostly free while the fusion pays full-corpus sha256 + the
        Arrow pass-through (~8% slower) -> classic. The persisted
        fused table is registered with ``release_scan_caches()``;
        long-lived sessions call it (or clearCache) after consuming
        the outputs.
        """
        check_corpus_schema(snapshot)
        cfg = self.config

        if single_scan is None:
            single_scan = expected_manifest is not None
        if single_scan:
            from sparkval.histograms import (
                fused_scan_partials,
                merge_histograms_with_lang,
                split_fused,
            )

            # release any fused table a PREVIOUS validate() left cached
            # before persisting a new one: direct callers in long-lived
            # sessions otherwise accrete one cached table per call
            # (ADVICE r5). Unpersist never invalidates an outstanding
            # result DataFrame — a late consumer just recomputes
            # uncached.
            release_scan_caches()
            fused = fused_scan_partials(snapshot, cfg).persist()
            _SCAN_CACHES.append(fused)
            hist_partials, row_partials = split_fused(fused)
            violations = constraints.violations_from_row_partials(
                row_partials, commits, expected_manifest
            )
            verdicts = self._score_hists(
                baseline, merge_histograms_with_lang(hist_partials)
            )
            return {
                "verdicts": constraints.deterministic_order(
                    verdicts, ["repo_bucket", "lang"]
                ),
                "violations": violations,
            }

        violations = constraints.all_violations(snapshot, commits)
        if expected_manifest is not None:
            violations = constraints.deterministic_order(
                violations.unionByName(
                    constraints.manifest_violations(snapshot, expected_manifest)
                ),
                ["check", "repo", "path", "commit"],
            )

        verdicts = self._score_hists(baseline, partition_histograms(snapshot, cfg))

        return {
            # verdict table is O(buckets x langs): single-partition
            # sort, not a global orderBy (whose range-partition sampling
            # pass would re-execute the whole snapshot scan lineage)
            "verdicts": constraints.deterministic_order(
                verdicts, ["repo_bucket", "lang"]
            ),
            "violations": violations,
        }

    def _score_hists(self, baseline: DataFrame, snap_hists: DataFrame) -> DataFrame:
        """Join a snapshot hist table against the baseline and score it
        (shared by validate() and the strip walker — any path that
        produced the same hist table gets bit-identical verdicts)."""
        cfg = self.config
        joined = joined_hists(baseline, snap_hists)
        if cfg.short_circuit_identical and "b_fingerprint" in joined.columns:
            # Identical partitions score 0 by definition
            # (diff.rs:766-772) and skip the kernel — but ONLY if the
            # enclosing bucket is also unchanged: the lang-mix channel
            # is bucket-wide, so a lang relabel elsewhere in the bucket
            # changes this partition's true score even when its own
            # contents match. XOR of disjoint partition fingerprints =
            # bucket fingerprint.
            #
            # Plan shape: the predicate is computed with WINDOW
            # aggregates over the single full-outer join (one extra
            # exchange on repo_bucket), and the shortcut itself fires
            # INSIDE the scoring kernel — versus the previous
            # formulation's 2 groupBys + 4 joins + union of branches.
            # The tables are O(buckets x langs) rows: fixed stage
            # latency, not data volume, is what those extra stages cost
            # at any cluster size.
            from pyspark.sql import Window

            w = Window.partitionBy("repo_bucket")
            row_same = (
                F.col("fingerprint").eqNullSafe(F.col("b_fingerprint"))
                & F.col("s_n_files").eqNullSafe(F.col("b_n_files"))
            )
            # window aggs skip NULLs (rows missing on one side), which
            # is exactly right: a one-sided row unbalances the bucket
            # sums/xors and vetoes the whole bucket's shortcut
            bucket_same = (
                F.bit_xor("fingerprint").over(w).eqNullSafe(
                    F.bit_xor("b_fingerprint").over(w)
                )
                & F.sum("s_n_files").over(w).eqNullSafe(F.sum("b_n_files").over(w))
            )
            joined = joined.withColumn("same_shortcut", row_same & bucket_same)
            return drift_verdicts_joined(joined, cfg, same_col="same_shortcut")
        return drift_verdicts_joined(joined, cfg)

    # -- strip-mode validation ----------------------------------------------
    def validate_strips(
        self,
        snapshot_path: str,
        baseline: DataFrame,
        checkpoint_dir: str,
        stop: CancellationToken | None = None,
        n_strips: int = 16,
        on_strip=None,
        commits: DataFrame | None = None,
        expected_manifest: DataFrame | None = None,
        include_violations: bool = False,
    ) -> dict[str, DataFrame]:
        """Strip-walker validation — butteraugli_strip
        (strip.rs:227-455, walker strip.rs:491-581) recast to the one
        resource that matters at 100 TB: the input scan.

        The snapshot table's parquet files are split into ``n_strips``
        contiguous strips. Each strip is scanned ONCE and its partial
        histograms (the StripReducer partial-agg state,
        strip.rs:126-209 — a mergeable monoid, so any strip grouping
        yields bit-identical final histograms) are committed to
        ``checkpoint_dir`` as their own atomic write job. The
        cancellation token is polled at strip boundaries
        (strip.rs:510-513) and fences mid-strip jobs via the job
        group; a cancelled strip's write never commits. A resumed run
        skips committed strips ENTIRELY — including their scan — so
        resume cost is proportional to the remaining input fraction
        (measured in BENCH.md), unlike marker-table resume whose
        lineage still rescans everything.

        ``checkpoint_dir`` may live on ANY Hadoop filesystem (file://,
        hdfs://, s3a://, or a bare local path): commit probes go
        through the FileSystem API, never driver-local os.path — on
        the 100 TB deployment's object store a local probe would
        silently see nothing and resume would degrade to full
        recompute (round-3 verdict #2). Note the usual S3 caveat: the
        parquet _SUCCESS commit marker is only atomic-rename-backed on
        real filesystems; on S3A the committer still guarantees
        marker-implies-complete, which is all resume needs.

        The finalize merge reads ONLY this run's strip ids (partition
        filter on the ``strip`` directory column): a reused
        checkpoint_dir holding strips from a different n_strips or an
        older snapshot file set cannot double-count histogram mass
        (round-3 ADVICE, medium). Foreign committed strips are left in
        place (another run may own them) — they're pruned, not read.

        Finalize = merge all strips' partials + the single kernel+join
        stage; verdicts are identical to validate() (parity-tested).

        ``include_violations=True`` makes strip mode a FULL validate
        (beyond the reference, whose strip API returns only
        score/pnorm, strip.rs:601-905): each strip commits ONE fused
        partial table (``fused_partials/strip=<sid>``, partitioned by
        ``kind``) holding both the histogram partials and the NARROW
        per-row check partials (key, sha256, null-detail — ~100 B/row)
        from a SINGLE pass over the strip's content
        (histograms.fused_scan_partials — round 5; previously two
        passes/two write jobs per strip). The finalize derives ALL
        row-level violations (uniqueness with exact global counts,
        null_required, referential vs ``commits``, sha256 manifest vs
        ``expected_manifest``) from the merged kind='r' partials with
        narrow-only joins — content is never rescanned after the strip
        commits. Each strip's content is read ONCE total; resume skips
        committed strips entirely. The single write job also makes the
        strip commit atomic by construction: there is no
        half-committed two-table state to detect (one _SUCCESS marker
        per strip). Checkpoint dirs written by the pre-round-5 layout
        (separate ``partials``/``row_partials`` trees) are not read by
        full-validate runs — their strips recompute into the fused
        layout; verdict-only runs (``include_violations=False``) keep
        the classic ``partials`` layout and remain compatible both
        ways.

        ``on_strip(i, n, skipped)`` is an optional progress hook (the
        per-strip progress callback a monitoring UI would attach).
        """
        import hashlib

        from sparkval.histograms import partial_histograms
        from sparkval.io import fs_exists, uri_join

        spark = baseline.sparkSession
        if stop is not None and stop.cancelled:
            raise ValidationCancelled(stop.reason)
        sc = spark.sparkContext

        probe = spark.read.parquet(snapshot_path)
        check_corpus_schema(probe)
        files = sorted(probe.inputFiles())
        if not files:
            raise ValueError(f"no parquet files under {snapshot_path}")
        n_strips = max(1, min(n_strips, len(files)))
        bounds = [
            (len(files) * i // n_strips, len(files) * (i + 1) // n_strips)
            for i in range(n_strips)
        ]
        sids = [
            hashlib.sha1("\n".join(files[lo:hi]).encode()).hexdigest()[:16]
            for lo, hi in bounds
        ]

        if stop is not None:
            sc.setJobGroup(stop.group, "sparkval strip validation",
                           interruptOnCancel=True)
        # full-validate runs commit ONE fused table per strip (single
        # content pass, single atomic write); verdict-only runs write
        # the classic hist-partials layout but RESUME from either tree
        # (a completed full validate's fused commits satisfy a later
        # verdict-only run — its hist rows are a superset; review
        # round 5). The reverse direction recomputes: a fused commit
        # needs row partials the classic tree never wrote.
        tree = "fused_partials" if include_violations else "partials"
        fused_sids: list[str] = []  # verdict-only: strips resumed from fused
        try:
            for i, (lo, hi) in enumerate(bounds):
                strip_files = files[lo:hi]
                sid = sids[i]
                strip_dir = uri_join(checkpoint_dir, tree, f"strip={sid}")
                done = fs_exists(spark, uri_join(strip_dir, "_SUCCESS"))
                if not done and not include_violations:
                    fused_dir = uri_join(
                        checkpoint_dir, "fused_partials", f"strip={sid}"
                    )
                    if fs_exists(spark, uri_join(fused_dir, "_SUCCESS")):
                        fused_sids.append(sid)
                        done = True
                if on_strip is not None:
                    on_strip(i, n_strips, done)
                if done:
                    continue
                if stop is not None and stop.cancelled:  # strip boundary poll
                    raise ValidationCancelled(stop.reason)
                strip_df = spark.read.schema(probe.schema).parquet(*strip_files)
                # one write job per strip: the parquet commit protocol
                # makes the strip atomic (a cancelled job commits nothing)
                if include_violations:
                    from sparkval.histograms import fused_scan_partials

                    fused_scan_partials(strip_df, self.config).write.mode(
                        "overwrite"
                    ).partitionBy("kind").parquet(strip_dir)
                else:
                    partial_histograms(strip_df, self.config).write.mode(
                        "overwrite"
                    ).parquet(strip_dir)

            if stop is not None and stop.cancelled:
                raise ValidationCancelled(stop.reason)
            # partition-discover strip=<sid> dirs, then PRUNE to this
            # run's sid set — stale strips under a reused checkpoint
            # dir are never opened (partition filter), never merged
            from sparkval.histograms import PARTIAL_SCHEMA, merge_histograms_with_lang

            hist_names = [f.name for f in PARTIAL_SCHEMA.fields]
            if include_violations:
                committed = spark.read.parquet(
                    uri_join(checkpoint_dir, tree)
                ).filter(F.col("strip").isin(sids))
                # kind is a partition column: each consumer opens only
                # its own files
                hist_rows = committed.filter(F.col("kind") == "h").select(*hist_names)
            else:
                classic_sids = sorted(set(sids) - set(fused_sids))
                parts = []
                if classic_sids:  # dir exists iff any strip lives there
                    parts.append(
                        spark.read.parquet(uri_join(checkpoint_dir, tree))
                        .filter(F.col("strip").isin(classic_sids))
                        .select(*hist_names)
                    )
                if fused_sids:
                    parts.append(
                        spark.read.parquet(uri_join(checkpoint_dir, "fused_partials"))
                        .filter(
                            F.col("strip").isin(fused_sids) & (F.col("kind") == "h")
                        )
                        .select(*hist_names)
                    )
                hist_rows = parts[0]
                for p in parts[1:]:
                    hist_rows = hist_rows.unionByName(p)
            snap_hists = merge_histograms_with_lang(hist_rows)
            verdicts = constraints.deterministic_order(
                self._score_hists(baseline, snap_hists), ["repo_bucket", "lang"]
            )
            if stop is not None:
                verdicts = verdicts.localCheckpoint(eager=True)
            out = {"verdicts": verdicts}
            if include_violations:
                violations = constraints.violations_from_row_partials(
                    committed.filter(F.col("kind") == "r").select(
                        "repo", "path", "commit", "content_sha256", "null_detail"
                    ),
                    commits,
                    expected_manifest,
                )
                if stop is not None:
                    violations = violations.localCheckpoint(eager=True)
                out["violations"] = violations
            return out
        except ValidationCancelled:
            raise
        except Exception as e:
            if stop is not None and stop.cancelled:
                raise ValidationCancelled(stop.reason) from e
            raise
        finally:
            if stop is not None:
                sc.setLocalProperty("spark.jobGroup.id", None)
                sc.setLocalProperty("spark.job.interruptOnCancel", None)

    def validate_incremental(
        self,
        snapshot_path: str,
        baseline: DataFrame,
        cache_dir: str,
        commits: DataFrame | None = None,
        expected_manifest: DataFrame | None = None,
        on_file=None,
    ) -> dict:
        """Churn-proportional FULL validation: per-DATA-FILE fused
        partials, content-addressed by (path, size, mtime), cached
        across runs. A new snapshot of a 100 TB table with 0.1% daily
        churn rescans 0.1% of the bytes — every unchanged file's
        partials (histogram rows + the ~100 B/row check partials, the
        strip-mode monoid at file granularity) are reused from
        ``cache_dir``; the finalize merges partials for EXACTLY the
        current file set and derives verdicts + all row-level
        violations without touching content again.

        Addressing is (path, size, mtime) through the FileSystem API
        (``io.fs_file_statuses``), not path alone: Iceberg-style
        immutable data files make path addressing sound, but an
        in-place rewrite (same name, new bytes) still changes
        size/mtime, so stale reuse is impossible — a hole pure
        path-hashed strip ids cannot close. Stale cache entries for
        files no longer in the snapshot are pruned by partition
        filter (never opened), exactly like stale strips.

        One write job per CHANGED file (the parquet commit marker is
        the per-file atomicity fence, as in strip mode) — the right
        trade when runs are churn-dominated; for an initial bulk
        build at 10^6+ files, seed the cache with ``validate_strips``
        granularity instead and let incremental take over from the
        first delta.

        Returns {"verdicts", "violations", "n_files_total",
        "n_files_recomputed", "n_files_reused"}.
        """
        import hashlib

        from sparkval.histograms import (
            PARTIAL_SCHEMA,
            fused_scan_partials,
            merge_histograms_with_lang,
        )
        from sparkval.io import fs_exists, fs_file_statuses, uri_join

        spark = baseline.sparkSession
        # recursive + hidden-segment-filtered: covers partitionBy /
        # nested data layouts exactly as spark.read.parquet does
        statuses = fs_file_statuses(spark, snapshot_path)
        if not statuses:
            raise ValueError(f"no data files under {snapshot_path}")
        probe = spark.read.parquet(snapshot_path)
        check_corpus_schema(probe)
        # the cache key must cover EVERYTHING that shapes a partial:
        # the file's identity AND the config that bucketed/scored it —
        # otherwise a config change (e.g. n_repo_buckets) would reuse
        # stale partials with fs_exists happily true (review round 5,
        # session 3). A config change flips every fid -> clean rebuild.
        import dataclasses

        cfg_fp = hashlib.sha1(
            repr(sorted(dataclasses.asdict(self.config).items())).encode()
        ).hexdigest()[:8]
        fids = {
            uri: hashlib.sha1(
                f"{uri}|{size}|{mtime}|{cfg_fp}".encode()
            ).hexdigest()[:16]
            for uri, size, mtime in statuses
        }
        recomputed = 0
        for i, (uri, _, _) in enumerate(statuses):
            fid = fids[uri]
            fdir = uri_join(cache_dir, "file_partials", f"file={fid}")
            done = fs_exists(spark, uri_join(fdir, "_SUCCESS"))
            if on_file is not None:
                on_file(i, len(statuses), done)
            if done:
                continue
            recomputed += 1
            fdf = spark.read.schema(probe.schema).parquet(uri)
            fused_scan_partials(fdf, self.config).write.mode(
                "overwrite"
            ).partitionBy("kind").parquet(fdir)

        committed = spark.read.parquet(
            uri_join(cache_dir, "file_partials")
        ).filter(F.col("file").isin(sorted(fids.values())))
        hist_names = [f.name for f in PARTIAL_SCHEMA.fields]
        snap_hists = merge_histograms_with_lang(
            committed.filter(F.col("kind") == "h").select(*hist_names)
        )
        verdicts = constraints.deterministic_order(
            self._score_hists(baseline, snap_hists), ["repo_bucket", "lang"]
        )
        violations = constraints.violations_from_row_partials(
            committed.filter(F.col("kind") == "r").select(
                "repo", "path", "commit", "content_sha256", "null_detail"
            ),
            commits,
            expected_manifest,
        )
        return {
            "verdicts": verdicts,
            "violations": violations,
            "n_files_total": len(statuses),
            "n_files_recomputed": recomputed,
            "n_files_reused": len(statuses) - recomputed,
        }

    # -- cancellable validation ----------------------------------------------
    def validate_with_stop(
        self,
        snapshot: DataFrame,
        baseline: DataFrame,
        stop: CancellationToken,
        commits: DataFrame | None = None,
        expected_manifest: DataFrame | None = None,
        checkpoint_dir: str | None = None,
    ) -> dict[str, DataFrame]:
        """Cancellable twin of validate()/validate_resumable() — the
        *_with_stop API family (lib.rs:699-759). Every Spark job is
        forced INSIDE ``stop``'s job group on the calling thread, so
        ``stop.cancel()`` from another thread aborts the run (running
        tasks interrupted) and this method raises ValidationCancelled.

        With ``checkpoint_dir`` the run is also resumable: partitions
        completed before the cancel persist their markers, and a rerun
        (with or without a stop) recomputes only the remainder — the
        reference's cancel-at-strip-boundary + resume shape.

        Returned DataFrames are materialized (localCheckpoint), so
        consuming them later cannot outrun the job group.
        """
        if stop.cancelled:  # entry poll (lib.rs:707): cancelJobGroup
            raise ValidationCancelled(stop.reason)  # only reaches live jobs
        sc = snapshot.sparkSession.sparkContext
        sc.setJobGroup(stop.group, "sparkval cancellable validation",
                       interruptOnCancel=True)
        try:
            if checkpoint_dir is not None:
                out = self.validate_resumable(
                    snapshot, baseline, checkpoint_dir, commits, expected_manifest
                )
                return {
                    "verdicts": out["verdicts"].localCheckpoint(eager=True),
                    "violations": out["violations"].localCheckpoint(eager=True),
                }
            out = self.validate(snapshot, baseline, commits, expected_manifest)
            result = {
                "verdicts": out["verdicts"].localCheckpoint(eager=True),
                "violations": out["violations"].localCheckpoint(eager=True),
            }
            # both outputs are materialized above, so any fused scan
            # table still cached (this call's, or a stale one validate()
            # did not yet self-release) is done — drain the registry
            # (review round 5 / ADVICE r5)
            release_scan_caches()
            return result
        except ValidationCancelled:
            raise
        except Exception as e:
            if stop.cancelled:
                raise ValidationCancelled(stop.reason) from e
            raise
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
            sc.setLocalProperty("spark.job.interruptOnCancel", None)

    # -- resumable validation ------------------------------------------------
    def validate_resumable(
        self,
        snapshot: DataFrame,
        baseline: DataFrame,
        checkpoint_dir: str,
        commits: DataFrame | None = None,
        expected_manifest: DataFrame | None = None,
    ) -> dict[str, DataFrame]:
        """Checkpointed run: per-partition verdicts land in
        ``checkpoint_dir/verdicts`` keyed by (repo_bucket, lang); a
        resumed run recomputes only partitions with no marker
        (*_with_stop + strip-granularity cancellation analog,
        strip.rs:510-513).

        SCOPE (round-4 verdict #2): the marker table resumes VERDICTS
        only — ``result["violations"]`` is re-derived from the corpus
        on every call, so a resume after a near-complete run still
        pays the violations scan. The RESUMABLE FULL VALIDATE is
        ``validate_strips(include_violations=True)``: it commits
        narrow per-row check partials per strip alongside the
        histogram partials, and a resumed run derives all row-level
        violations from the committed partials without rescanning any
        committed strip's content (tested: a resume over a corpus
        whose bytes changed after commit still returns the original
        violations). Prefer it whenever checkpoint/resume is the
        point; this method stays for verdict-only monitoring loops
        where violations are recomputed-per-run by design.
        """
        from sparkval.io import uri_join

        spark = snapshot.sparkSession
        done_path = uri_join(checkpoint_dir, "verdicts")
        # explicit classic shape: this wrapper is called per monitoring
        # cycle and returns a lazy violations plan with no place to
        # release a fused persist afterwards — AUTO would leak one
        # cached table per cycle (review round 5). Callers wanting the
        # single-scan full validate use validate_strips(
        # include_violations=True), the documented resumable form.
        result = self.validate(
            snapshot, baseline, commits, expected_manifest, single_scan=False
        )
        verdicts = result["verdicts"]

        try:
            done = spark.read.parquet(done_path)
            have_done = True
        except Exception:
            have_done = False

        if have_done:
            todo = verdicts.join(
                done.select("repo_bucket", "lang"), ["repo_bucket", "lang"], "left_anti"
            )
        else:
            todo = verdicts

        # append only the newly computed partitions, then read back the
        # union — the marker table IS the output table
        todo.write.mode("append").partitionBy("repo_bucket").parquet(done_path)
        full = spark.read.parquet(done_path)
        return {
            "verdicts": constraints.deterministic_order(full, ["repo_bucket", "lang"]),
            "violations": result["violations"],
        }

    # -- lineage / metrics ----------------------------------------------------
    def run_metrics(
        self, verdicts: DataFrame, violations: DataFrame, started_at: float
    ) -> dict:
        """Per-run metrics sidecar (the CLI's JSON output + batch
        summary, butteraugli-cli main.rs:156-194,624-660)."""
        vsum = verdicts.agg(
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum((F.col("verdict") == "FAIL").cast("long")).alias("n_fail"),
            F.sum((F.col("verdict") == "WARN").cast("long")).alias("n_warn"),
            F.sum((F.col("verdict") == "PASS").cast("long")).alias("n_pass"),
            F.min("score").alias("score_min"),
            F.max("score").alias("score_max"),
            F.avg("score").alias("score_mean"),
            F.sum("n_files_snap").alias("files_validated"),
        ).first()
        by_check = {
            r["check"]: r["n"]
            for r in violations.groupBy("check").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        elapsed = time.time() - started_at
        files = vsum["files_validated"] or 0
        return {
            "config": asdict(self.config),
            "elapsed_sec": elapsed,
            "files_validated": files,
            "files_per_sec": files / elapsed if elapsed > 0 else None,
            "partitions": vsum["n_partitions"],
            "verdict_counts": {
                "PASS": vsum["n_pass"], "WARN": vsum["n_warn"], "FAIL": vsum["n_fail"]
            },
            "score": {
                "min": vsum["score_min"], "max": vsum["score_max"], "mean": vsum["score_mean"]
            },
            "violations_by_check": by_check,
        }

    @staticmethod
    def write_metrics(
        metrics: dict, path: str, spark: SparkSession | None = None
    ) -> None:
        """Persist a run-metrics sidecar. With ``spark`` the write goes
        through the Hadoop FileSystem API (rename-backed commit dance,
        io.fs_write_text) so metrics land next to results on s3a://
        or hdfs:// — driver-local open() only sees the local disk
        (round-3 verdict #2 discipline, applied here in round 5).
        Without ``spark`` the legacy local-path form still works."""
        payload = json.dumps(metrics, indent=2, default=str)
        if spark is not None:
            from sparkval.io import fs_write_text

            fs_write_text(spark, path, payload)
            return
        with open(path, "w") as f:
            f.write(payload)
