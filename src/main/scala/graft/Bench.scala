package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against SPARK_GRAFT_SF_DIR and prints one
  * JSON line. A query that throws is recorded as an `"errors"` entry (and excluded from the
  * total) rather than silently timed — BENCH output distinguishes fast from crashed. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Spark 4.1's async checksum writer can park streaming tasks forever under
      // local-mode load (see SparkTestSession); cdc_txn_reconstruct_stream runs here
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      // events.ts is TIMESTAMP(NANOS) → LongType (see engine.Tables)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    // warmup: parquet footer reads + codegen/classloading so the alphabetically-first
    // query doesn't absorb session initialization in its timing
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).write.mode("overwrite")
      .format("noop").save()
    catch { case _: Throwable => () }
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // per-query time limit: a wedged query is recorded as an error, not a bench hang
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val perQueryTimeout = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "300").toLong
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        Await.result(Future {
          // job groups are thread-local: tag the runner thread so a timeout on the main
          // thread can actually cancel the wedged jobs instead of abandoning them to
          // keep burning cores under the next query's timing
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        }, perQueryTimeout.seconds)
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
          errors(name) = s"timeout after ${perQueryTimeout}s"
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      } finally {
        // one query's plan-reuse caches must not tax the next query's timing or memory
        spark.catalog.clearCache()
      }
    }
    val errs = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val total = timings.values.sum
    // full-precision record to stderr (and a file beside the build) for local analysis
    val fullQs = timings.map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"errors":$errs,"sf":"${esc(sfDir)}"}"""
    System.err.println(fullLine)
    try java.nio.file.Files.write(java.nio.file.Paths.get("target/bench_full.json"),
      fullLine.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    // stdout line: the harness that collects this keeps only a ~2000-char tail of stdout,
    // and the full-precision line has outgrown it every round (BENCH_r1..r4 all record
    // parsed:null with the line's head clipped). Emit a COMPACT line — 2-decimal timings,
    // queries ordered fastest-first so a clip would eat the least-informative entries
    // first — and, if the surface outgrows the window, FOLD the fastest queries into an
    // "omitted_fastest" summary instead of letting the JSON get truncated mid-object.
    def fmt(v: Double): String = f"$v%.2f"
    def line(qSeq: Seq[(String, Double)], omitted: Seq[(String, Double)]): String = {
      val qs = qSeq.map { case (k, v) => s""""${esc(k)}":${fmt(v)}""" }.mkString("{", ",", "}")
      val om = if (omitted.isEmpty) ""
        else s""","omitted_fastest":{"n":${omitted.size},"sum_sec":${fmt(omitted.map(_._2).sum)}}"""
      s"""{"metric":"total","unit":"sec","sf":"${esc(sfDir)}","queries":$qs$om,"errors":$errs,"value":${fmt(total)}}"""
    }
    val asc = timings.toSeq.sortBy(_._2)
    val budget = 1850 // tail window ~2000 chars minus the build tool's trailing lines
    var cut = 0
    while (cut < asc.length && line(asc.drop(cut), asc.take(cut)).length > budget) cut += 1
    println(line(asc.drop(cut), asc.take(cut)))
    spark.stop()
  }
}
