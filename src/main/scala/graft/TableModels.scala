package graft

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.types._

/** Typed single-source-of-truth models for the harness tables — the
  * Spark analog of the reference's attrs→ORM derivation
  * (db/core/models.py:88-148, where one attrs class declares each
  * field once and the ORM schema, keys, and indexes are derived
  * reflectively). Here the case class is that single source: the Spark
  * `StructType` is derived from its product encoder ([[schemaOf]]),
  * and the physical-layout keys a cluster deployment bucket/sorts by
  * (the reference's `primary_key`/`index` declarations re-read as
  * distribution metadata) are declared alongside in [[layouts]].
  *
  * TableModelsSpec pins the derived schemas field-for-field against
  * the actual driver-generated parquet, so a testdata regeneration or
  * a model drift fails a spec instead of silently skewing queries.
  *
  * Scale note: the layout declarations are what a 100 TB deployment
  * feeds `bucketBy`/`sortBy` at ingest ([[bucketedLayout]]) — the
  * join/agg keys below are exactly the ones BucketingSpec proves
  * exchange-free once the write pays the one-time shuffle, and the
  * sort keys are the zone-map/pruning axes (docs/SCALE.md).
  */
object TableModels {
  // ---------------------------------------------------------------------
  // the models — raw parquet field order and types, one class per table.
  // Timestamp columns are tz-naive in the testdata (`timestamp[us]`,
  // isAdjustedToUTC=false), i.e. TIMESTAMP_NTZ on the Spark side —
  // modeled as java.time.LocalDateTime. (`events.ts` has ALSO shipped
  // as TIMESTAMP(NANOS); Tables.events normalizes either generation to
  // session-TZ TIMESTAMP, and TestdataContractSpec owns that branch —
  // the model here is the current micros generation's raw schema.)
  // ---------------------------------------------------------------------
  final case class Region(r_regionkey: Int, r_name: String)
  final case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
  final case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)
  final case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
      s_acctbal: Double)
  final case class Part(p_partkey: Long, p_name: String, p_brand: String,
      p_type: String, p_size: Int, p_retailprice: Double)
  final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.time.LocalDateTime,
      o_orderpriority: String)
  final case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: java.time.LocalDateTime)
  final case class Event(event_id: Long, ts: java.time.LocalDateTime,
      user_id: Long, event_type: String, value: Double, props: String)
  final case class Document(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  /** The Spark schema derived reflectively from a model class — field
    * names, order, and types come from the case class declaration and
    * nowhere else. */
  def schemaOf[T <: Product : TypeTag]: StructType = Encoders.product[T].schema

  /** Every table's derived schema, keyed by harness table name. */
  val schemas: Map[String, StructType] = Map(
    "region" -> schemaOf[Region],
    "nation" -> schemaOf[Nation],
    "customer" -> schemaOf[Customer],
    "supplier" -> schemaOf[Supplier],
    "part" -> schemaOf[Part],
    "orders" -> schemaOf[Order],
    "lineitem" -> schemaOf[Lineitem],
    "events" -> schemaOf[Event],
    "documents" -> schemaOf[Document],
    "embeddings" -> schemaOf[Embedding])

  /** Physical-layout declaration: `primaryKey` is the row identity
    * (upsert/dedup key), `bucketKeys` the co-location axis big joins
    * and aggs shuffle on (empty = dimension small enough to broadcast,
    * never bucket), `sortKeys` the within-bucket order that gives
    * parquet zone maps their pruning power. */
  final case class Layout(primaryKey: Seq[String],
      bucketKeys: Seq[String] = Seq.empty, sortKeys: Seq[String] = Seq.empty)

  /** Declared once, next to the models they describe. Broadcast-sized
    * dimensions (region…part) carry no bucket keys; the fact tables
    * bucket on their dominant join axis (the BucketingSpec pair for
    * lineitem⋈orders; user_id for the per-user event folds; doc_id for
    * the dedup/similarity joins) and sort on their pruning axis. */
  val layouts: Map[String, Layout] = Map(
    "region" -> Layout(Seq("r_regionkey")),
    "nation" -> Layout(Seq("n_nationkey")),
    "customer" -> Layout(Seq("c_custkey")),
    "supplier" -> Layout(Seq("s_suppkey")),
    "part" -> Layout(Seq("p_partkey")),
    "orders" -> Layout(Seq("o_orderkey"),
      bucketKeys = Seq("o_orderkey"), sortKeys = Seq("o_orderdate")),
    "lineitem" -> Layout(Seq("l_orderkey", "l_linenumber"),
      bucketKeys = Seq("l_orderkey"), sortKeys = Seq("l_shipdate")),
    "events" -> Layout(Seq("event_id"),
      bucketKeys = Seq("user_id"), sortKeys = Seq("ts")),
    "documents" -> Layout(Seq("doc_id"),
      bucketKeys = Seq("doc_id"), sortKeys = Seq("source")),
    "embeddings" -> Layout(Seq("vec_id"), bucketKeys = Seq("vec_id")))

  /** Apply a table's declared layout to an ingest write: bucketed
    * tables get `bucketBy(bucket keys).sortBy(sort keys ++ bucket
    * keys)` (the one-time shuffle every later co-located join rides —
    * BucketingSpec), broadcast-sized ones a plain sorted write. The
    * caller finishes with `.option("path", …).saveAsTable(name)` /
    * `.parquet(path)` so storage stays its choice. */
  def bucketedLayout(df: DataFrame, table: String, numBuckets: Int)
      : org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] = {
    val l = layouts(table)
    if (l.bucketKeys.nonEmpty) {
      // bucketBy/sortBy imposes its own per-bucket ordering on write —
      // a pre-sortWithinPartitions here is dead work the writer re-sorts
      // anyway (r20 ADVICE), so only the non-bucketed branch pre-sorts
      val sorts = (l.sortKeys ++ l.bucketKeys).distinct
      df.write.bucketBy(numBuckets, l.bucketKeys.head, l.bucketKeys.tail: _*)
        .sortBy(sorts.head, sorts.tail: _*)
    } else (if (l.sortKeys.nonEmpty)
      df.sortWithinPartitions(l.sortKeys.map(df.col): _*) else df).write
  }
}
