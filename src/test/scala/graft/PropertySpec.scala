package graft

import graft.functions.MeanVector
import graft.ops.{TextOps, VectorOps}

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-style tests (SURVEY.md §5.3.3): ScalaCheck generates the data,
  * one DataFrame pass evaluates the property over every sample (running a
  * Spark job per ScalaCheck case would be pathological). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("property: ‖l2normalize(v)‖ ≈ 1 for all non-zero vectors") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-100.0f, 100.0f))
      .suchThat(_.exists(x => x != 0.0f))
    val data = samples(gen, 200).map(_.toArray)
    val norms = data.toDF("v")
      .select(VectorOps.l2norm(VectorOps.l2normalize($"v")).as("n"))
      .as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-4),
      s"worst: ${norms.map(n => math.abs(n - 1.0)).max}")
  }

  test("property: textConcat never produces double spaces or edge spaces") {
    val token = Gen.alphaNumStr.map(_.take(8))
    val cell = Gen.oneOf(token.map(Option(_)), Gen.const(Option("")),
      Gen.const(Option.empty[String]))
    val rows = samples(Gen.zip(cell, cell, cell), 300)
    val out = rows.toDF("a", "b", "c")
      .select(TextOps.textConcat(Seq($"a", $"b", $"c")).as("t"))
      .as[String].collect()
    assert(out.forall(t => !t.contains("  ") && !t.startsWith(" ") && !t.endsWith(" ")))
  }

  test("property: fnv1a64 expression equals the reference implementation") {
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('€', 'ß', '中', '\n')))
      .map(_.mkString)
    val strs = samples(gen, 300)
    val fromSpark = strs.toDF("s")
      .select($"s", VectorOps.fnv1a64($"s").as("h"))
      .as[(String, Long)].collect().toMap
    strs.foreach { s =>
      assert(fromSpark(s) == graft.ops.expr.Fnv1a64.hash(s))
    }
  }

  test("property: pgoutput wire encode→decode round-trips arbitrary tuples") {
    import graft.sources.PgOutputWire
    import graft.sources.PgOutputWire._
    // values exercise empty strings, multi-byte UTF-8, and NULLs; the id
    // column stays non-null text so the pk contract is well-defined
    val value = Gen.oneOf(
      Gen.const(Option.empty[String]),
      Gen.const(Option("")),
      Gen.alphaNumStr.map(s => Option(s.take(12))),
      Gen.const(Option("héllo wörld — ünïcode")))
    val rowGen = Gen.zip(Gen.chooseNum(1, 999999), value, value)
    val rows = samples(rowGen, 120)
    val REL = 77
    val cols = Seq("id", "title", "content")
    val msgs = Seq(1L -> begin(500L, 1), 2L -> relation(REL, "public", "documents", cols)) ++
      rows.zipWithIndex.map { case ((id, t, c), i) =>
        (i + 3).toLong -> insert(REL, tupleData(Seq(Some(id.toString), t, c)))
      } :+ ((rows.size + 3).toLong -> commit(500L))
    val out = PgOutputWire.decodeSegment(frame(msgs))
    assert(out.size == rows.size)
    out.zip(rows).foreach { case (ch, (id, t, c)) =>
      assert(ch.op == "c" && ch.lsn == 500L && ch.primaryKey == id.toString)
      assert(ch.after.get("id") == id.toString)
      assert(ch.after.get("title") == t.orNull,
        s"title ${ch.after.get("title")} != ${t.orNull}")
      assert(ch.after.get("content") == c.orNull)
    }
  }

  test("MeanVector aggregator: correct mean, stable under repartitioning") {
    val vecs = samples(Gen.listOfN(4, Gen.chooseNum(-10.0f, 10.0f)), 100)
      .map(_.toArray)
    val expected = (0 until 4).map { i =>
      vecs.map(_(i).toDouble).sum / vecs.size
    }
    def run(parts: Int): Seq[Float] =
      vecs.toDS().repartition(parts)
        .groupByKey(_ => 1).agg(MeanVector.column).collect().head._2.toSeq
    val m1 = run(1)
    val m8 = run(8)
    (0 until 4).foreach { i =>
      assert(math.abs(m1(i) - expected(i)) < 1e-3)
      // merge order may differ across partition layouts; equal within float tolerance
      assert(math.abs(m1(i) - m8(i)) < 1e-4)
    }
  }

  test("IVM invariant: delta-maintained view equals recompute from latest state") {
    // the contract q_ivm_delta rests on — aggregating change-log deltas
    // converges to the same per-author (count, chars) as recomputing from
    // the replayed latest state
    def q(name: String) = graft.SparkEntry.queries(name)(spark, sfDir)
    val delta = q("q_ivm_delta")
      .select($"author", $"n_docs", $"n_chars")
      .as[(String, Long, Long)].collect()
      .map { case (a, n, c) => a -> (n, c) }.toMap
    val recompute = q("q_latest_by_pk")
      .select($"pk", coalesce($"content", lit("")).as("content"))
      .join(graft.cdc.Changelog.flat(spark, sfDir)
        .filter($"op" === "c" && $"table_name" === "documents")
        .select($"pk", $"author"), Seq("pk"))
      .groupBy($"author")
      .agg(count(lit(1)).as("n"), sum(length($"content")).as("chars"))
      .as[(String, Long, Long)].collect()
      .map { case (a, n, c) => a -> (n, c) }.toMap
    assert(recompute.nonEmpty)
    // every author surviving in the latest state matches the delta view
    // (authors whose docs ALL deleted may sit at zero in the delta view)
    recompute.foreach { case (a, (n, c)) =>
      assert(delta.get(a).contains((n, c)), s"author $a: delta=${delta.get(a)} recompute=${(n, c)}")
    }
  }

  test("property: BurstMonitor split-invariance — any batching equals one flush") {
    import graft.stream.{BurstMonitor, MinuteArrival}
    // random in-order minute streams: ascending minutes, 1-5 events each,
    // occasional gaps wider than the trailing window
    val gen = for {
      n <- Gen.chooseNum(1, 40)
      gaps <- Gen.listOfN(n, Gen.chooseNum(1L, 15L))
      counts <- Gen.listOfN(n, Gen.chooseNum(1, 5))
    } yield {
      val minutes = gaps.scanLeft(1000L)(_ + _).tail
      minutes.zip(counts).flatMap { case (m, c) =>
        Seq.fill(c)(MinuteArrival("k", m))
      }
    }
    val splitsGen = Gen.chooseNum(1, 5)
    samples(Gen.zip(gen, splitsGen), 60).foreach { case (arr, nSplits) =>
      // one-shot flush (the batch twin)
      val (oneShot, _) = BurstMonitor.transition("k", arr.iterator,
        BurstMonitor.empty, flush = true)
      // the same arrivals over nSplits micro-batches + a final flush
      val chunks = arr.grouped(math.max(1, arr.size / nSplits)).toSeq
      var st = BurstMonitor.empty
      val streamed = Seq.newBuilder[graft.stream.BurstRow]
      chunks.foreach { c =>
        val (out, next) = BurstMonitor.transition("k", c.iterator, st,
          flush = false)
        streamed ++= out
        st = next
        assert(st._2.size <= BurstMonitor.TrailMinutes, "ring unbounded")
      }
      val (tail, fin) = BurstMonitor.transition("k", Iterator.empty, st,
        flush = true)
      streamed ++= tail
      assert(streamed.result() == oneShot,
        s"split divergence at nSplits=$nSplits over ${arr.size} arrivals")
      assert(fin._3.isEmpty, "open minutes survived the flush")
    }
  }
}
