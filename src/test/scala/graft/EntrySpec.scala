package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke check, run locally: the flagship entry must
  * return rows on the smallest testdata, on a CALLER-owned session
  * (the contract ensure() exists for). */
class EntrySpec extends AnyFunSuite {
  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("every registered query has either an oracle or a scan prefix") {
    val keys = SparkEntry.queries.keySet
    val withOracle = SparkEntry.oracleSql.keySet
    val scanOnly = keys -- withOracle
    assert(scanOnly.forall(_.startsWith("html_scan_")),
      s"non-scan queries missing oracles: ${scanOnly.filterNot(_.startsWith("html_scan_"))}")
    assert(withOracle.subsetOf(keys),
      s"oracles without queries: ${withOracle -- keys}")
  }
}
