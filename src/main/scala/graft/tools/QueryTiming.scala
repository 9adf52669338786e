package graft.tools

/** Dev tool: wall-time individual registry queries at a chosen SF
  * (two passes — the second shows warm/cached cost, which is what the
  * bench's min-of-two reports). Usage: runMain graft.tools.QueryTiming
  * [query names...], SPARK_GRAFT_SF_DIR to change the fixture. */
import org.apache.spark.sql.SparkSession
object QueryTiming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String): Unit = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"TIMING $name ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val seq =
      if (args.nonEmpty) args.toSeq
      else Seq("q_token_count", "q_ngram_containment")
    seq.foreach(time); println("--- pass 2"); seq.foreach(time)
    spark.stop()
  }
}
