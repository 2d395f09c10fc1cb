package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke check, run locally: the flagship entry must
  * return rows on the smallest testdata, on a CALLER-owned session
  * (the contract ensure() exists for). */
class EntrySpec extends AnyFunSuite {
  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("ensure covers every native graft_* expression any registered query resolves to") {
    // the bug class this pins: a kernel injected via GraftExtensions but
    // missing from SparkEntry.nativeFns resolves in extension-built
    // sessions (TestSpark, Sessions) and fails only on a caller-owned
    // one — collect the actually-resolved graft expressions from every
    // query's analyzed plan and require ensure to know each of them
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val known = SparkEntry.nativeFns.map(_._1).toSet
    val used = SparkEntry.queries.values.flatMap { fn =>
      fn(spark, dir).queryExecution.analyzed
        .flatMap(_.expressions) // every plan node's expression trees
        .flatMap(_.collect {
          case e if e.getClass.getPackage != null &&
            e.getClass.getPackage.getName == "graft.expressions" => e.prettyName
        })
    }.toSet
    assert(used.nonEmpty, "expected native kernels in the registry's plans")
    assert(used.subsetOf(known),
      s"native functions used but not registered by ensure: ${used -- known}")
  }

  test("the extension registry and ensure() register the SAME kernel set") {
    // the r19 gap this pins: graft_looprun landed in nativeFns but not
    // GraftExtensions — harmless for the driver contract (ensure runs
    // on every query) but an extension-built session that SKIPS the
    // contract would silently miss the newest kernels. An extension-
    // built session (TestSpark runs through Sessions.builder, which
    // sets spark.sql.extensions) must resolve every nativeFns name
    // BEFORE ensure() runs for it.
    val fresh = TestSpark.spark.newSession() // extensions apply, ensure() hasn't
    val missing = SparkEntry.nativeFns.map(_._1).filterNot(name =>
      fresh.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
    assert(missing.isEmpty,
      s"kernels registered by ensure() but absent from GraftExtensions: $missing")
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
