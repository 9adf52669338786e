package graft

import graft.ops.Lsh
import graft.ops.expr.VecQuant

import org.apache.spark.sql.functions._

/** The quantized-integer vector kernels carrying the oracle-checked ANN
  * family: every result must equal a plain-Scala reference fold over
  * floor(x·2²⁴) longs, for float and double arrays, interpreted and
  * codegen'd alike.
  */
class VecQuantSpec extends SparkSpec {
  import spark.implicits._

  private val a = Seq(0.5f, -0.25f, 0.125f, -1.0f)
  private val b = Seq(-0.75f, 0.5f, 1.0f, 0.0625f)

  private def q(x: Double): Long = math.floor(x * 16777216.0).toLong
  private def refDot(x: Seq[Float], y: Seq[Float]): Long =
    x.zip(y).map { case (u, v) => q(u.toDouble) * q(v.toDouble) }.sum

  test("quantized dot matches the reference fold; driver q agrees") {
    assert(VecQuant.q(0.5) == 8388608L && VecQuant.q(-0.25) == -4194304L)
    val got = Seq((a, b)).toDF("a", "b")
      .select(VecQuant.dotColumn($"a", $"b").as("d")).as[Long].head()
    assert(got == refDot(a, b))
  }

  test("self-dot equals the quantized squared norm, float and double inputs") {
    val asD = a.map(_.toDouble)
    val row = Seq((a, asD)).toDF("f", "d")
      .select(VecQuant.dotColumn($"f", $"f").as("ff"),
        VecQuant.dotColumn($"d", $"d").as("dd"))
      .head()
    assert(row.getLong(0) == refDot(a, a))
    // float→double widening is exact, so both input types give one answer
    assert(row.getLong(1) == row.getLong(0))
  }

  test("weighted projection: integer plane weights over quantized components") {
    val w = Seq(-7L, 0L, 3L, 7L)
    val got = Seq(Tuple1(a)).toDF("v")
      .select(VecQuant.wdotColumn($"v", typedLit(w)).as("p")).as[Long].head()
    val want = a.zip(w).map { case (x, wi) => wi * q(x.toDouble) }.sum
    assert(got == want)
  }

  test("squared distance to a quantized centroid") {
    val c = b.map(x => q(x.toDouble))
    val got = Seq(Tuple1(a)).toDF("v")
      .select(VecQuant.dist2Column($"v", typedLit(c)).as("d2")).as[Long].head()
    val want = a.zip(c).map { case (x, ci) =>
      val d = q(x.toDouble) - ci; d * d
    }.sum
    assert(got == want)
  }

  test("bucketQ bit p = sign of plane p's projection; probesQ flips one bit") {
    val planes = Lsh.fnvPlanesL(numPlanes = 4, dim = 4, salt = "spec")
    val row = Seq(Tuple1(a)).toDF("v")
      .select(Lsh.bucketQ($"v", planes).as("bkt"),
        Lsh.probesQ(Lsh.bucketQ($"v", planes), 4).as("probes"))
      .head()
    val signs = planes.map(p =>
      a.zip(p).map { case (x, wi) => wi * q(x.toDouble) }.sum >= 0)
    val want = signs.zipWithIndex.collect { case (true, i) => 1L << i }.sum
    assert(row.getLong(0) == want)
    val probes = row.getSeq[Long](1)
    assert(probes.head == want)
    assert(probes.tail == (0 until 4).map(i => want ^ (1L << i)))
  }

  test("tableKeysQ: table index in the high bits keeps tables disjoint") {
    val planes = Lsh.fnvPlanesL(8, dim = 4, salt = "spec")
    val keys = Seq(Tuple1(a)).toDF("v")
      .select(Lsh.tableKeysQ($"v", planes, tables = 2, planesPerTable = 4).as("k"))
      .as[Seq[Long]].head()
    assert(keys.size == 2)
    assert(keys(0) >> 4 == 0L && keys(1) >> 4 == 1L)
    val bits0 = planes.take(4).zipWithIndex.collect {
      case (p, i) if a.zip(p).map { case (x, wi) => wi * q(x.toDouble) }.sum >= 0 =>
        1L << i
    }.sum
    assert(keys(0) == bits0)
  }

  test("type mismatch is rejected at analysis, not at runtime") {
    val err = intercept[Exception] {
      Seq(Tuple1(Seq(1L, 2L))).toDF("v")
        .select(VecQuant.dotColumn($"v", $"v")).collect()
    }
    assert(err.getMessage.contains("vec_qdot"))
  }
}
