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

  test("trips on a >2x per-query regression above the noise floor") {
    val fresh =
      """{"metric":"total","value":101.0,"queries":{
        |"q_fast":0.05,"q_mid":1.10,"q_slow":2.00}}""".stripMargin
    val v = BenchGate.violations(budget, fresh)
    assert(v.exists(_.contains("q_mid")), v.toString)
    assert(v.size == 1)
  }

  test("sub-floor queries are exempt from the per-query ratio") {
    val fresh = // q_fast 10x worse but budget < 150ms: scheduling noise
      """{"metric":"total","value":100.0,"queries":{
        |"q_fast":0.50,"q_mid":0.50,"q_slow":2.00}}""".stripMargin
    assert(BenchGate.violations(budget, fresh).isEmpty)
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
