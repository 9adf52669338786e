package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract integrity: the maps SparkEntry exposes must stay
  * consistent however the registry evolves. */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique across groups") {
    val names = SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, xs) if xs.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: $dups")
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("oracle SQL is non-empty and ends with a deterministic ORDER BY") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      assert(sql.toUpperCase.contains("ORDER BY"),
        s"$name: oracle lacks ORDER BY — row order would be engine-dependent")
    }
  }

  test("naming convention: every query id starts with q_") {
    assert(SparkEntry.registry.forall(_.name.startsWith("q_")))
  }
}
