package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the single-source-of-truth property: every model class's
  * reflectively derived schema equals the driver-generated parquet
  * field-for-field (names, order, types), and the declared layout keys
  * actually exist in that schema. Nullability is normalized — parquet
  * marks everything optional while a Scala primitive field is
  * non-null; the CONTRACT is names/order/types. */
class TableModelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private def normalize(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map(f => StructField(f.name, normalize(f.dataType))))
    case a: ArrayType => ArrayType(normalize(a.elementType), containsNull = true)
    case m: MapType => MapType(normalize(m.keyType), normalize(m.valueType))
    case other => other
  }

  test("models cover exactly the harness tables") {
    assert(TableModels.schemas.keySet == Tables.names.toSet)
    assert(TableModels.layouts.keySet == Tables.names.toSet)
  }

  Tables.names.foreach { t =>
    test(s"$t: derived model schema equals the parquet schema") {
      val derived = normalize(TableModels.schemas(t))
      val actual = normalize(Tables.table(spark, Dir, t).schema)
      assert(derived == actual,
        s"model drift for $t:\n  model:   $derived\n  parquet: $actual")
    }
  }

  test("declared layout keys all exist in their table's model schema") {
    TableModels.layouts.foreach { case (t, l) =>
      val fields = TableModels.schemas(t).fieldNames.toSet
      val keys = l.primaryKey ++ l.bucketKeys ++ l.sortKeys
      assert(l.primaryKey.nonEmpty, s"$t: a table needs a primary key")
      keys.foreach(k => assert(fields(k), s"$t: layout key $k not in model"))
    }
  }

  test("events model matches the RAW generation Tables.events normalizes from") {
    // the model declares TIMESTAMP_NTZ micros (the current generation);
    // the normalized reader view is session-TZ TIMESTAMP — both pinned
    assert(TableModels.schemas("events")("ts").dataType == TimestampNTZType)
    assert(Tables.events(spark, Dir).schema("ts").dataType == TimestampType)
  }

  test("bucketedLayout writes the declared bucket/sort spec (one-time shuffle at ingest)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString
    try {
      TableModels.bucketedLayout(Tables.documents(spark, Dir), "documents", 4)
        .option("path", s"$tmp/documents_l").saveAsTable("documents_l")
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("documents_l"))
      val spec = meta.bucketSpec.get
      assert(spec.numBuckets == 4)
      assert(spec.bucketColumnNames == TableModels.layouts("documents").bucketKeys)
      assert(spec.sortColumnNames.startsWith(TableModels.layouts("documents").sortKeys))
      assert(spark.table("documents_l").count() ==
        Tables.documents(spark, Dir).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS documents_l")
      ()
    }
  }
}
