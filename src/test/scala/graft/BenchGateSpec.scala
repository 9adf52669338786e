package graft

import graft.tools.BenchGate
import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate's decision logic: 2× per-query trip, the
  * sub-floor noise exemption, missing-query detection, total-ratio trip,
  * and new-query tolerance. */
class BenchGateSpec extends AnyFunSuite {

  private val budget =
    """{"metric":"total","value":100.0,"queries":{
      |"q_fast":0.05,"q_mid":0.50,"q_slow":2.00}}""".stripMargin

  test("passes an identical run") {
    assert(BenchGate.violations(budget, budget).isEmpty)
  }

  test("pretty-printed JSON (spaces after colons) parses identically") {
    val pretty =
      """{"metric": "total", "value": 100.0, "queries": {
        |  "q_fast": 0.05, "q_mid": 0.50, "q_slow": 2.00}}""".stripMargin
    assert(BenchGate.violations(pretty, budget).isEmpty)
    assert(BenchGate.violations(budget, pretty).isEmpty)
    assert(BenchGate.parseQueries(pretty).size == 3)
  }

  test("an empty/unparseable budget or fresh run FAILS, never passes " +
    "vacuously") {
    assert(BenchGate.violations("{}", budget).exists(_.contains("EMPTY budget")))
    assert(BenchGate.violations(budget, "not json at all")
      .exists(_.contains("EMPTY fresh")))
  }

  test("trips on a >2x per-query regression above the noise floor") {
    val fresh =
      """{"metric":"total","value":101.0,"queries":{
        |"q_fast":0.05,"q_mid":1.10,"q_slow":2.00}}""".stripMargin
    val v = BenchGate.violations(budget, fresh)
    assert(v.exists(_.contains("q_mid")), v.toString)
    assert(v.size == 1)
  }

  test("sub-floor budgets get the floor's allowance, not a blanket exemption") {
    // q_fast budget 0.05 < floor 0.15 → allowed up to 2 x 0.15 = 0.30:
    // scheduling noise passes...
    val noisy =
      """{"metric":"total","value":100.0,"queries":{
        |"q_fast":0.28,"q_mid":0.50,"q_slow":2.00}}""".stripMargin
    assert(BenchGate.violations(budget, noisy).isEmpty)
    // ...but a genuine blow-up on a formerly-cheap query still trips
    val blown =
      """{"metric":"total","value":100.0,"queries":{
        |"q_fast":30.0,"q_mid":0.50,"q_slow":2.00}}""".stripMargin
    val v = BenchGate.violations(budget, blown)
    assert(v.size == 1 && v.head.contains("q_fast"), v.toString)
  }

  test("a budgeted query missing from the fresh run trips") {
    val fresh =
      """{"metric":"total","value":90.0,"queries":{"q_fast":0.05,"q_mid":0.50}}"""
    assert(BenchGate.violations(budget, fresh).exists(_.startsWith("MISSING q_slow")))
  }

  test("total-ratio trips independently; new queries pass") {
    val fresh =
      """{"metric":"total","value":160.0,"queries":{
        |"q_fast":0.05,"q_mid":0.50,"q_slow":2.00,"q_new":9.99}}""".stripMargin
    val v = BenchGate.violations(budget, fresh)
    assert(v.size == 1 && v.head.contains("total"), v.toString)
  }
}
