package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev-only round-15 probe: attribute q_minhash_calibration's cost to its
  * stages (sig build, group compaction, banded self-join, intra expansion,
  * exact-Jaccard join-back) under the bench's warm-artifact discipline.
  * Delete or ignore after the optimization round; not part of any gate. */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.ops.DedupOps
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), DedupOps.tokenSet(col("text")).as("t"))
      .filter(size(col("t")) > 0)
    val sigs = graft.util.SessionCache
      .getOrMaterialize(spark, s"mh_calib_reps:$dir") {
        docs.groupBy("t")
          .agg(count(lit(1)).as("mult"), min(col("doc_id")).as("rep_id"))
          .withColumn("sig", DedupOps.minhashSignatureFnv(col("t"), 16))
      }
    val groups = graft.util.SessionCache
      .getOrMaterialize(spark, s"mh_calib_groups:$dir") {
        sigs.groupBy("sig")
          .agg(sort_array(collect_list(struct(col("rep_id").as("rid"),
            col("mult").as("m")))).as("members"))
      }
    println(s"PROBE sigs=${sigs.count()} groups=${groups.count()}")

    val nm = size(col("members"))
    val intra = groups.filter(nm > 1)
      .select(explode(flatten(transform(
        sequence(lit(1), nm - 1),
        i => transform(slice(col("members"), i + 1, nm - i),
          b => struct(
            element_at(col("members"), i.cast("int"))
              .getField("rid").as("a_id"),
            b.getField("rid").as("b_id"),
            (element_at(col("members"), i.cast("int")).getField("m")
              * b.getField("m")).as("w")))))).as("p"))
      .select(col("p.a_id"), col("p.b_id"), lit(16L).as("agree"), col("p.w"))
    val banded = groups
      .withColumn("band", explode(DedupOps.bandKeys(col("sig"), 4, 4)))
      .withColumn("bh", xxhash64(col("band")))
    def side(p: String) = banded.select(col("members").as(s"${p}m"),
      col("sig").as(s"${p}_sig"), col("bh"))
    val crossRaw = side("a").join(side("b"), "bh")
      .filter(element_at(col("am"), 1).getField("rid")
        < element_at(col("bm"), 1).getField("rid"))
    val crossAgree = crossRaw
      .select(col("am"), col("bm"),
        size(filter(zip_with(col("a_sig"), col("b_sig"),
          (x, y) => when(x === y, lit(1)).otherwise(lit(0))), v => v === 1))
          .cast(LongType).as("agree"))
      .filter(col("agree") >= 13 && col("agree") < 16)
    val cross = crossAgree
      .dropDuplicates("am", "bm")
      .select(explode(col("am")).as("x"), col("bm"), col("agree"))
      .select(col("x"), explode(col("bm")).as("y"), col("agree"))
      .select(least(col("x.rid"), col("y.rid")).as("a_id"),
        greatest(col("x.rid"), col("y.rid")).as("b_id"), col("agree"),
        (col("x.m") * col("y.m")).as("w"))

    // warm pass (codegen + artifacts) then timed
    time("warm-intra")(noop(intra))
    time("warm-crossRaw-count")(println("  rows=" + crossRaw.count()))
    time("warm-cross")(noop(cross))
    time("intra")(noop(intra))
    time("crossAgree-count")(println("  rows=" + crossAgree.count()))
    time("cross")(noop(cross))

    val pairs = intra.unionByName(cross)
    def t(p: String) = sigs.select(col("rep_id").as(s"${p}_id"),
      col("t").as(s"${p}t"), size(col("t")).as(s"${p}sz"))
    val inter = size(array_intersect(col("at"), col("bt")))
    val uni = col("asz") + col("bsz") - inter
    val pairsW = pairs.join(t("a"), "a_id").join(t("b"), "b_id")
      .select(col("agree"), col("w"),
        inter.cast(LongType).as("inter"), uni.cast(LongType).as("uni"))
    time("warm-pairsW")(noop(pairsW))
    time("pairsW")(noop(pairsW))
    println("PROBE pairs=" + pairs.count())

    val full = graft.SparkEntry.queries("q_minhash_calibration")
    time("warm-full")(noop(full(spark, dir)))
    time("full1")(noop(full(spark, dir)))
    time("full2")(noop(full(spark, dir)))
    spark.stop()
  }
}
