package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Env-drift tripwire: the harness regenerates /root/testdata between
  * rounds, and a dtype change there breaks queries at ANALYSIS time —
  * round 13 lost 30 queries and the whole bench because `events.ts`
  * silently changed from TIMESTAMP(NANOS) to timestamp[us]. This spec
  * pins the engine's expectations of every table so the NEXT
  * regeneration costs one loudly-named test failure (with
  * actual-vs-expected dtypes in the message), not a round.
  *
  * Schema-only: no actions, runs in milliseconds.
  */
class TestdataContractSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  /** name → expected Spark dtype AFTER the Tables reader normalization. */
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  private def reader(name: String) = name match {
    // events goes through its dtype-adaptive repair; everything else is
    // a plain scan (and must stay one — a new normalization belongs in
    // Tables AND here)
    case "events" => Tables.events(TestSpark.spark, dir)
    case n        => Tables.table(TestSpark.spark, dir, n)
  }

  for (name <- Tables.names) {
    test(s"testdata contract: $name schema matches engine expectations") {
      val actual = reader(name).schema.map(f => f.name -> f.dataType)
      val want = expected(name)
      assert(actual == want,
        s"\n  testdata REGENERATED with a different schema for '$name'?" +
          s"\n  expected: ${want.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ")}" +
          s"\n  actual:   ${actual.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ")}" +
          "\n  Fix the reader in Tables.scala (dtype-adaptive, like Tables.events), then update this contract.")
    }
  }

  // every sf the harness exercises: Verify runs sf0.01, Bench sf0.1 —
  // a regeneration that changed only ONE sf's dtype would pass a
  // single-dir check and still break a gate
  for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
    test(s"testdata contract: raw events.ts dtype is a handled generation ($sfDir)") {
      // the adaptive reader in Tables.events handles exactly these three
      // raw spellings; a FOURTH generation must fail here by name, not as
      // thirty downstream analysis errors
      val raw = Tables.table(TestSpark.spark, sfDir, "events").schema("ts").dataType
      assert(Seq(LongType, TimestampNTZType, TimestampType).contains(raw),
        s"events.ts scanned as ${raw.simpleString} — not a generation Tables.events handles; " +
          "extend the dtype branch in Tables.scala:events")
      assert(Tables.events(TestSpark.spark, sfDir).schema("ts").dataType == TimestampType,
        "Tables.events must normalize ts to TIMESTAMP for every sf")
    }
  }
}
