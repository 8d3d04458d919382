package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Skew tooling: two-phase salted aggregation. Plain `sum/count` aggregates already combine
 * map-side, but a genuinely hot key still funnels all its partials into one reducer; adding
 * a deterministic salt spreads phase 1 over `salts` reducers and phase 2 touches only
 * (#distinct keys × salts) pre-aggregated rows. Use for hot-key aggregates whose per-group
 * state is heavy (collect_list/distinct-sets) or whose key histogram is pathological;
 * AQE's skew-join splitting covers the join side of the same problem.
 *
 * The salt is `pmod(hash(salt-source columns), salts)` — deterministic, so the rewrite is
 * semantics-preserving (proved by the `skew_salted_agg` oracle query: salted result ==
 * DuckDB's plain GROUP BY).
 */
object Skew {

  /** Salted sum/count per key: phase 1 groupBy(key, salt), phase 2 groupBy(key).
    * The salt mixes a per-row id so a hot key spreads even when its VALUE column is
    * constant (hash(value) alone would re-funnel fixed-value hot keys into one reducer).
    *
    * Pass `saltSource` (a unique row id column) whenever one exists: the salt is then
    * `pmod(hash(key, id), salts)` — fully deterministic, so the map stage is reproducible
    * under task retry and run-to-run. Without one the salt falls back to
    * partition-id + monotonic-id, which is retry-safe only because the final sums are
    * salt-assignment-invariant (Spark's indeterminate-stage rollback covers the
    * partial-fetch case), and plans are not reproducible run-to-run. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column, salts: Int = 16,
                     saltSource: Option[Column] = None): DataFrame = {
    val salt = saltSource
      .map(id => pmod(hash(key, id), lit(salts)))
      .getOrElse(pmod(hash(value, spark_partition_id(), monotonically_increasing_id()), lit(salts)))
    df.select(key.as("k"), value.as("v"), salt.as("salt"))
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("partial_sum"), count(lit(1)).as("partial_cnt"))
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("total"), sum(col("partial_cnt")).cast("long").as("cnt"))
  }

  /**
   * Salted equi-join — the join-side twin of [[saltedSumCount]]: the skewed fact side gets
   * a deterministic salt, the dimension side is replicated `salts`× with an exploded salt
   * column, and the join key becomes (key, salt) so one hot key spreads over `salts`
   * reducers at the cost of a salts× dim replication. This is the manual form of AQE's
   * skew-join split, for when AQE can't act (no shuffle stats yet, skew below its
   * thresholds but above yours, or a non-shuffle consumer pinning the partitioning).
   *
   * `saltSource` is REQUIRED and must be deterministic per row (a unique id column):
   * a nondeterministic source (monotonically_increasing_id, rand) can re-salt a fact row
   * differently between shuffle-map re-executions on stage retry — the classic
   * nondeterministic-repartition hazard that drops/duplicates rows under partial
   * recomputation (ADVICE r4).
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, saltSource: Column,
                 salts: Int = 16): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(hash(col(key), saltSource), lit(salts)))
    val replicated = dim.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // oracle-gated proof that the salted two-phase plan equals a plain GROUP BY
    "skew_salted_agg" -> { (s, dir) =>
      import s.implicits._
      val events = Tables(s, dir, "events")
        .select($"user_id", round($"value" * 100).cast("long").as("cents"), $"event_id")
      saltedSumCount(events, $"user_id", $"cents", saltSource = Some($"event_id"))
        .select($"k".as("user_id"), $"total".as("total_cents"), $"cnt".as("event_cnt"))
        .orderBy($"user_id")
    },
    // oracle-gated proof that the salted join equals a plain equi-join: events carry only
    // 15 distinct user_ids (every key is hot), customers are the dim side. shuffle_hash
    // hint pins the shuffle path so the salted distribution is actually exercised (a
    // broadcast would dodge it and make the salt decorative).
    "skew_salted_join" -> { (s, dir) =>
      import s.implicits._
      val fact = Tables(s, dir, "events")
        .select($"user_id", round($"value" * 100).cast("long").as("cents"), $"event_id")
      val dim = Tables(s, dir, "customer")
        .select($"c_custkey".as("user_id"), $"c_mktsegment")
      saltedJoin(fact, dim.hint("shuffle_hash"), "user_id", saltSource = $"event_id")
        .groupBy($"c_mktsegment")
        .agg(sum($"cents").as("total_cents"), count(lit(1)).as("event_cnt"))
        .orderBy($"c_mktsegment")
    },
  )

  val oracle: Map[String, String] = Map(
    "skew_salted_join" ->
      """SELECT c_mktsegment,
        | cast(sum(cast(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents,
        | cast(count(*) AS BIGINT) AS event_cnt
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "skew_salted_agg" ->
      """SELECT user_id,
        | cast(sum(cast(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents,
        | cast(count(*) AS BIGINT) AS event_cnt
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
