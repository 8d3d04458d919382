package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry aggregated from the engine modules:
  *  - [[graft.engine.Relational]] — Layer-B semantics (B1-B10) + TPC-H-style analytics
  *  - [[graft.engine.CdcQueries]] — end-to-end CDC slices (parse/assemble/filter/envelope)
  *  - [[graft.ext.TextOps]]       — text analysis / fingerprinting
  *  - [[graft.ext.Dedup]]         — exact + MinHash-LSH + SimHash + Jaccard dedup
  *  - [[graft.ext.Similarity]]    — cosine top-k + LSH bucketing over embeddings
  *  - [[graft.ext.Multimodal]]    — binary media columns + WAV/BMP/AVI container codecs
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.engine.Relational.queries ++
      graft.engine.Skew.queries ++
      graft.engine.Temporal.queries ++
      graft.engine.CdcQueries.queries ++
      graft.ext.TextOps.queries ++
      graft.ext.Dedup.queries ++
      graft.ext.Similarity.queries ++
      graft.ext.Multimodal.queries

  /** Queries whose CONSTRUCTION executes a streaming harness (MemoryStream feed +
    * processAllAvailable): plan printers and other construct-only callers should skip
    * these unless explicitly requested. */
  val streamingHarness: Set[String] =
    Set("cdc_txn_reconstruct_stream", "cdc_pipeline_e2e", "cdc_apply_merge_stream",
      "events_window_stream", "events_dedup_stream", "events_dedup_stream_wm",
      "events_join_stream", "events_session_stream", "cdc_status_feed",
      "dedup_incremental_stream", "events_enrich_stream", "cdc_txn_timeout",
      "cdc_scd2_stream", "events_topk_stream", "events_heavy_hitters_stream",
      "dedup_winnow_admit_stream", "dedup_winnow_admit_stream_incr", "simsearch_stream",
      "simsearch_stream_ivfpq", "simsearch_stream_ivfpq_cells", "simsearch_stream_append",
      "dedup_image_admit_stream", "dedup_audio_admit_stream", "dedup_video_admit_stream",
      "dedup_image_admit_stream_incr",
      "cdc_pipeline_restart") // runs runBatchesWithRestarts (checkpointed restarts) at construction

  /** BATCH queries whose CONSTRUCTION nonetheless executes actions (the restart-artifact
    * gates persist + reload an index mid-build, so "constructing" them runs a full corpus
    * fold AND clobbers the on-disk artifact — ADVICE r15 #1). Plan printers and sweep
    * specs must skip these like the streaming harnesses. */
  val constructActions: Set[String] =
    Set("dedup_winnow_admit_persist", "dedup_image_admit_persist")

  /** Everything a construct-only caller (Explain, PlanSweepSpec) should skip. */
  val constructSkip: Set[String] = streamingHarness ++ constructActions

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.engine.Relational.oracle ++
      graft.engine.Skew.oracle ++
      graft.engine.Temporal.oracle ++
      graft.engine.CdcQueries.oracle ++
      graft.ext.TextOps.oracle ++
      graft.ext.Dedup.oracle ++
      graft.ext.Similarity.oracle ++
      graft.ext.Multimodal.oracle
}
