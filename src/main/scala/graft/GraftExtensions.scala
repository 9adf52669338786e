package graft

import graft.ops.expr.{ChunkSplit, Fnv1a64, JaccardSorted, MinHashSig, MinHashSigFnv, SimHash64, SimHashFnv64, VecDist2, VecDot}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers the engine's native expressions
  * into the SQL function registry, so `spark.sql("SELECT fnv1a64(id)")`
  * works next to the Column API. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def unary(name: String, clazz: Class[_],
                    make: Expression => Expression): Descriptor = (
    new FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      require(children.size == 1, s"$name takes exactly one argument")
      make(children.head)
    })

  private def binary(name: String, clazz: Class[_],
                     make: (Expression, Expression) => Expression): Descriptor = (
    new FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"$name takes exactly two arguments")
      make(children.head, children(1))
    })

  private val descriptors: Seq[Descriptor] = Seq(
    unary("fnv1a64", classOf[Fnv1a64], Fnv1a64(_)),
    unary("simhash64", classOf[SimHash64], SimHash64(_)),
    unary("simhash_fnv64", classOf[SimHashFnv64], SimHashFnv64(_)),
    unary("chunk_split", classOf[ChunkSplit], ChunkSplit(_)),
    binary("vec_dot", classOf[VecDot], VecDot(_, _)),
    binary("vec_dist2", classOf[VecDist2], VecDist2(_, _)),
    binary("jaccard_sorted", classOf[JaccardSorted], JaccardSorted(_, _)),
    // minhash_sig(toks, n) — the hash count must be a literal int
    (new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "minhash_sig takes (array<string>, int literal)")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig: hash count must be an int literal, got $other")
        }
        MinHashSig(children.head, n)
      }),
    // minhash_sig_fnv(toks, n) — FNV-permutation variant, same literal rule
    (new FunctionIdentifier("minhash_sig_fnv"),
      new ExpressionInfo(classOf[MinHashSigFnv].getName, "minhash_sig_fnv"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "minhash_sig_fnv takes (array<string>, int literal)")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig_fnv: hash count must be an int literal, got $other")
        }
        MinHashSigFnv(children.head, n)
      }))

  /** Imperative registration onto a live session (the extensions class
    * covers sessions built with `spark.sql.extensions`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach { d =>
      spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
    }
}
