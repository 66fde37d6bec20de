package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver contract between SparkEntry.queries and
  * SparkEntry.oracleSql: every oracle has a query, and every query except
  * the crawl fixpoint (not SQL-expressible; verified by the trace-replay
  * suite) has an oracle — a missing pair silently downgrades the round
  * gate to a rows-only check. */
final class SparkEntrySpec extends AnyFunSuite {

  test("every oracleSql key names an implemented query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query except q00_crawl_trace carries a DuckDB oracle") {
    val unOracled =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet - "q00_crawl_trace"
    assert(unOracled.isEmpty, s"queries without oracles: $unOracled")
  }

  test("query names follow the qNN_ naming scheme the driver sorts by") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.matches("q\\d{2}_[a-z0-9_]+"), s"bad query name: $k")
    }
  }
}
