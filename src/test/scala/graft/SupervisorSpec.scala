package graft

import graft.stream.Supervisor

import org.scalatest.funsuite.AnyFunSuite

class SupervisorSpec extends AnyFunSuite {

  /** Minimal StreamingQuery stub: awaitTermination throws `failures` times,
    * then returns cleanly. */
  private class FlakyQuery(failures: Int) {
    var starts = 0
    def make(): org.apache.spark.sql.streaming.StreamingQuery = {
      starts += 1
      val attempt = starts
      new org.apache.spark.sql.streaming.StreamingQuery {
        override def awaitTermination(): Unit =
          if (attempt <= failures)
            throw new RuntimeException(s"simulated failure $attempt")
        override def awaitTermination(timeoutMs: Long): Boolean = true
        override def name: String = "flaky"
        override def id: java.util.UUID = java.util.UUID.randomUUID()
        override def runId: java.util.UUID = java.util.UUID.randomUUID()
        override def sparkSession: org.apache.spark.sql.SparkSession = null
        override def isActive: Boolean = false
        override def exception: Option[org.apache.spark.sql.streaming.StreamingQueryException] = None
        override def status: org.apache.spark.sql.streaming.StreamingQueryStatus = null
        override def recentProgress: Array[org.apache.spark.sql.streaming.StreamingQueryProgress] = Array.empty
        override def lastProgress: org.apache.spark.sql.streaming.StreamingQueryProgress = null
        override def processAllAvailable(): Unit = ()
        override def stop(): Unit = ()
        override def explain(): Unit = ()
        override def explain(extended: Boolean): Unit = ()
      }
    }
  }

  test("supervisor restarts failed queries with backoff, then exits cleanly") {
    val q = new FlakyQuery(failures = 2)
    Supervisor.runWithRestarts(maxRestarts = 5, backoffMs = 1L)(q.make)
    assert(q.starts == 3) // two failures + one clean run
  }

  test("supervisor rethrows when restarts are exhausted") {
    val q = new FlakyQuery(failures = 10)
    val e = intercept[RuntimeException] {
      Supervisor.runWithRestarts(maxRestarts = 2, backoffMs = 1L)(q.make)
    }
    assert(e.getMessage.contains("simulated failure"))
    assert(q.starts == 3) // initial + 2 restarts
  }
}
