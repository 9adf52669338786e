package graft

import graft.stream.{PkChange, StalenessMonitor, StatusChange}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming index-freshness monitor vs the registered batch audit: final
  * per-pk statuses must aggregate to exactly q_index_staleness's rollup,
  * transitions must stream out across micro-batch splits, and the
  * min/max-folded state must be arrival-order-free. */
class StalenessMonitorSpec extends SparkSpec {
  import spark.implicits._

  /** The audit population: effective changes on the mapped table. */
  private lazy val arrivals: Seq[PkChange] =
    graft.cdc.Changelog.changes(spark, sfDir)
      .filter(concat($"schema", lit("."), $"table") === "public.documents")
      .filter($"primary_key" =!= "" && ($"op" === "d" || $"after".isNotNull))
      .select($"primary_key", $"lsn".cast("long"), $"op")
      .collect()
      .map(r => PkChange(r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_.lsn)

  private lazy val batchRollup: Map[String, Long] =
    SparkEntry.queries("q_index_staleness")(spark, sfDir)
      .select($"status", $"n").as[(String, Long)].collect().toMap

  test("batch twin rolls up to the registered q_index_staleness audit") {
    val counts = StalenessMonitor.monitorBatch(arrivals.toDS())
      .groupBy("status").count()
      .as[(String, Long)].collect().toMap
    assert(counts == batchRollup, s"got $counts expected $batchRollup")
  }

  test("streamed transitions: last status per pk matches the batch audit") {
    val (a, b) = arrivals.splitAt(arrivals.size / 2)
    val mem = MemoryStream[PkChange](spark)
    val q = StalenessMonitor.monitor(mem.toDS())
      .writeStream.format("memory").queryName("stale_out")
      .outputMode("append").start()
    mem.addData(a); q.processAllAvailable()
    mem.addData(b); q.processAllAvailable()
    val trans = spark.table("stale_out").as[StatusChange].collect()
    q.stop()
    // transitions carry strictly increasing cur_lsn per pk — the max picks
    // the final status
    val finals = trans.groupBy(_.pk).map { case (_, ts) =>
      ts.maxBy(_.cur_lsn)
    }
    val counts = finals.groupBy(_.status)
      .map { case (s, xs) => s -> xs.size.toLong }
    assert(counts == batchRollup, s"got $counts expected $batchRollup")
    // a pk whose status never changed after first sight emits exactly once
    assert(trans.groupBy(t => (t.pk, t.status)).values.forall(_.size == 1),
      "duplicate transition emissions")
  }

  test("state fold is arrival-order-free: shuffled replay, same statuses") {
    val ordered = arrivals.groupBy(_.pk).map { case (pk, cs) =>
      pk -> cs.foldLeft(Option.empty[StalenessMonitor.S])(
        (s, c) => Some(StalenessMonitor.step(s, c))).map(StalenessMonitor.status)
    }
    val shuffled = arrivals.groupBy(_.pk).map { case (pk, cs) =>
      val rev = cs.reverse // worst-case disorder: fully reversed delivery
      pk -> rev.foldLeft(Option.empty[StalenessMonitor.S])(
        (s, c) => Some(StalenessMonitor.step(s, c))).map(StalenessMonitor.status)
    }
    assert(ordered == shuffled)
  }
}
