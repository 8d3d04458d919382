package graft
import org.apache.spark.sql.functions._
object OccDebug {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("occdebug")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val dir = args(0)
    val cells = graft.ext.Similarity.debugScaledCellsOf(s, dir, tiered = args(1).toBoolean)
    val occ = cells.groupBy($"cell").count()
    occ.agg(count(lit(1)).as("n_cells"), min($"count"), expr("percentile(count, 0.5)"),
      expr("percentile(count, 0.95)"), max($"count")).show(false)
    s.stop()
  }
}
