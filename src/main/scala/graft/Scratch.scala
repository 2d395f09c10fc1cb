package graft

import org.apache.spark.sql.functions._

/** Throwaway perf probe (not registered anywhere; deleted before
  * round close). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("graft-scratch")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(body: => Unit): Unit = {
      val samples = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min ${samples.min}%.3f  med ${samples.sorted.apply(2)}%.3f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("scan_only") {
      noop(Tables.events(spark, dir).select("props", "value"))
    }
    time("scan_shuffle") {
      noop(Tables.events(spark, dir).select("props", "value")
        .repartition(32))
    }
    time("from_json_serial") {
      noop(Tables.events(spark, dir).select("props", "value")
        .withColumn("k", from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k")))
    }
    time("get_json_serial") {
      noop(Tables.events(spark, dir).select("props", "value")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long")))
    }
    time("regexp_serial") {
      noop(Tables.events(spark, dir).select("props", "value")
        .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(-?\\d+)", 1).cast("long")))
    }
    def full(kexpr: org.apache.spark.sql.Column, fan: Boolean): org.apache.spark.sql.DataFrame = {
      val base = Tables.events(spark, dir).select("props", "value")
      val src = if (fan) Tables.fanout(base) else base
      src.withColumn("k", kexpr)
        .groupBy(expr("k - ((k % 10) + 10) % 10").as("k_bucket"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(38,10)")).cast("double").as("sum_value"))
        .filter(col("k_bucket").isNotNull)
        .orderBy("k_bucket")
    }
    val fj = from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))).getField("k")
    val re = expr("try_cast(regexp_extract(props, '\"k\":\\\\s*(-?\\\\d+)', 1) as long)")
    time("full_fromjson_serial") { noop(full(fj, fan = false)) }
    time("full_fromjson_fanout") { noop(full(fj, fan = true)) }
    time("full_regexp_serial") { noop(full(re, fan = false)) }

    // exact_substr_spans: current packed-key ObjectHashAgg spelling vs a
    // window-count duplicate test (no packing, no collect_list)
    import org.apache.spark.sql.expressions.Window
    val SpanN = 10
    def exactDupes = {
      val d = Tables.documents(spark, dir).select("doc_id", "text")
      d.unionByName(d.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + (1L << 40)).as("doc_id"), col("text")))
    }
    def gramsOf = Tables.fanout(exactDupes)
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= SpanN)
      .select(col("doc_id"),
        posexplode(expr(s"graft_winhash(words, $SpanN)")).as(Seq("pos", "h")))
    def spansWindow = {
      val rep = gramsOf
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("h")))
        .filter(col("cnt") >= 2)
        .select("doc_id", "pos")
      rep
        .withColumn("grp", col("pos") - row_number().over(
          Window.partitionBy("doc_id").orderBy("pos")))
        .groupBy("doc_id", "grp")
        .agg(min(col("pos")).cast("long").as("span_start"),
          (max(col("pos")) + SpanN).cast("long").as("span_end"),
          count(lit(1)).as("n_grams"))
        .select("doc_id", "span_start", "span_end", "n_grams")
        .orderBy("doc_id", "span_start")
    }
    time("substr_spans_window") { noop(spansWindow) }
    time("substr_spans_current") {
      noop(SparkEntry.queries("exact_substr_spans")(spark, dir))
    }
    time("substr_grams_only") { noop(gramsOf) }
    time("substr_grams_agg") {
      noop(gramsOf
        .select(col("h"), (col("doc_id") * (1L << 21) + col("pos")).as("pk"))
        .groupBy("h").agg(collect_list(col("pk")).as("occ"))
        .filter(size(col("occ")) >= 2)
        .select(explode(col("occ")).as("pk")))
    }
    def spansJoin = {
      val dup = gramsOf.groupBy("h").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2).select("h")
      val rep = gramsOf.join(dup, "h").select("doc_id", "pos")
      rep
        .withColumn("grp", col("pos") - row_number().over(
          Window.partitionBy("doc_id").orderBy("pos")))
        .groupBy("doc_id", "grp")
        .agg(min(col("pos")).cast("long").as("span_start"),
          (max(col("pos")) + SpanN).cast("long").as("span_end"),
          count(lit(1)).as("n_grams"))
        .select("doc_id", "span_start", "span_end", "n_grams")
        .orderBy("doc_id", "span_start")
    }
    time("substr_spans_join") { noop(spansJoin) }
    def spansArray = {
      val rep = gramsOf
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("h")))
        .filter(col("cnt") >= 2)
        .select("doc_id", "pos")
      rep.groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("ps"))
        .select(col("doc_id"), explode(expr(
          """aggregate(ps,
            |  cast(array() as array<struct<s: int, e: int, n: int>>),
            |  (acc, p) -> CASE
            |    WHEN size(acc) > 0 AND element_at(acc, -1).e = p - 1
            |      THEN concat(slice(acc, 1, size(acc) - 1),
            |                  array(named_struct(
            |                    's', element_at(acc, -1).s, 'e', p,
            |                    'n', element_at(acc, -1).n + 1)))
            |    ELSE concat(acc, array(named_struct('s', p, 'e', p, 'n', 1)))
            |  END)""".stripMargin)).as("sp"))
        .select(col("doc_id"), col("sp.s").cast("long").as("span_start"),
          (col("sp.e") + SpanN).cast("long").as("span_end"),
          col("sp.n").cast("long").as("n_grams"))
        .orderBy("doc_id", "span_start")
    }
    time("substr_spans_array") { noop(spansArray) }

    // fluency_buckets: current (duplicated corpus pass) vs aggregate-first
    def fluencyCurrent = SparkEntry.queries("fluency_buckets")(spark, dir)
    def fluencyAggFirst = {
      val bi = Tables.fanout(Tables.documents(spark, dir))
        .select(col("doc_id"), col("lang"), col("source"),
          explode(expr("graft_bigrams(text)")).as("b"))
        .select(col("doc_id"), col("lang"), col("source"),
          col("b.w1").as("w1"), col("b.w2").as("w2"))
      val g = bi.groupBy("doc_id", "lang", "source", "w1", "w2")
        .agg(count(lit(1)).as("n"))
      val model = g.groupBy("w1", "w2").agg(sum(col("n")).as("c2"))
        .select(col("w1"), col("w2"),
          expr("(c2 * 1000000L) div (sum(c2) OVER (PARTITION BY w1))").as("p"))
      val fl = g.join(model, Seq("w1", "w2"))
        .groupBy("doc_id", "lang", "source")
        .agg(sum(col("n")).as("n_bigrams"), sum(col("p") * col("n")).as("psum"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_bigrams"),
          expr("psum div n_bigrams").as("fluency"))
      fl.withColumn("tercile", ntile(3).over(
          Window.partitionBy("lang").orderBy(col("fluency").desc, col("doc_id")))
          .cast("long"))
        .select(col("doc_id"), col("lang"), col("fluency"), col("tercile"),
          when(col("tercile") === 1, "head")
            .when(col("tercile") === 2, "middle")
            .otherwise("tail").as("tier"))
        .orderBy("doc_id")
    }
    time("fluency_current") { noop(fluencyCurrent) }
    time("fluency_aggfirst") { noop(fluencyAggFirst) }
    def fluencyNotNull = {
      val bi = Tables.fanout(Tables.documents(spark, dir))
        .select(col("doc_id"), col("lang"), col("source"),
          explode(expr("graft_bigrams(text)")).as("b"))
        .select(col("doc_id"), col("lang"), col("source"),
          col("b.w1").as("w1"), col("b.w2").as("w2"))
        .filter(col("w1").isNotNull && col("w2").isNotNull)
      val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val model = c2.select(col("w1"), col("w2"),
        expr("(c2 * 1000000L) div (sum(c2) OVER (PARTITION BY w1))").as("p"))
      val fl = bi.join(model, Seq("w1", "w2"))
        .groupBy("doc_id", "lang", "source")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("p")).as("psum"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_bigrams"),
          expr("psum div n_bigrams").as("fluency"))
      fl.withColumn("tercile", ntile(3).over(
          Window.partitionBy("lang").orderBy(col("fluency").desc, col("doc_id")))
          .cast("long"))
        .select(col("doc_id"), col("lang"), col("fluency"), col("tercile"),
          when(col("tercile") === 1, "head")
            .when(col("tercile") === 2, "middle")
            .otherwise("tail").as("tier"))
        .orderBy("doc_id")
    }
    time("fluency_notnull") { noop(fluencyNotNull) }
    def fluencyReuse = {
      val bi = Tables.fanout(Tables.documents(spark, dir))
        .select(col("doc_id"), col("lang"), col("source"),
          explode(expr("graft_bigrams(text)")).as("b"))
        .select(col("doc_id"), col("lang"), col("source"),
          col("b.w1").as("w1"), col("b.w2").as("w2"))
        .filter(col("w1").isNotNull && col("w2").isNotNull)
      // count references all non-join columns so column pruning cannot
      // strip them below the model-side exchange: both subtrees stay
      // byte-identical from scan through exchange -> ReuseExchange
      val c2 = bi.groupBy("w1", "w2").agg(
        count(when(col("doc_id").isNotNull && col("lang").isNotNull &&
          col("source").isNotNull, 1)).as("c2"))
      val model = c2.select(col("w1"), col("w2"),
        expr("(c2 * 1000000L) div (sum(c2) OVER (PARTITION BY w1))").as("p"))
      val fl = bi.join(model, Seq("w1", "w2"))
        .groupBy("doc_id", "lang", "source")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("p")).as("psum"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_bigrams"),
          expr("psum div n_bigrams").as("fluency"))
      fl.withColumn("tercile", ntile(3).over(
          Window.partitionBy("lang").orderBy(col("fluency").desc, col("doc_id")))
          .cast("long"))
        .select(col("doc_id"), col("lang"), col("fluency"), col("tercile"),
          when(col("tercile") === 1, "head")
            .when(col("tercile") === 2, "middle")
            .otherwise("tail").as("tier"))
        .orderBy("doc_id")
    }
    time("fluency_reuse") { noop(fluencyReuse) }
    def fluencyShj = {
      val bi = Tables.fanout(Tables.documents(spark, dir))
        .select(col("doc_id"), col("lang"), col("source"),
          explode(expr("graft_bigrams(text)")).as("b"))
        .select(col("doc_id"), col("lang"), col("source"),
          col("b.w1").as("w1"), col("b.w2").as("w2"))
        .filter(col("w1").isNotNull && col("w2").isNotNull)
      val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val model = c2.select(col("w1"), col("w2"),
        expr("(c2 * 1000000L) div (sum(c2) OVER (PARTITION BY w1))").as("p"))
      val fl = bi.join(model.hint("SHUFFLE_HASH"), Seq("w1", "w2"))
        .groupBy("doc_id", "lang", "source")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("p")).as("psum"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_bigrams"),
          expr("psum div n_bigrams").as("fluency"))
      fl.withColumn("tercile", ntile(3).over(
          Window.partitionBy("lang").orderBy(col("fluency").desc, col("doc_id")))
          .cast("long"))
        .select(col("doc_id"), col("lang"), col("fluency"), col("tercile"),
          when(col("tercile") === 1, "head")
            .when(col("tercile") === 2, "middle")
            .otherwise("tail").as("tier"))
        .orderBy("doc_id")
    }
    time("fluency_shj") { noop(fluencyShj) }
    time("tercile_window") {
      noop(SparkEntry.queries("fluency_buckets")(spark, dir))
    }
    spark.conf.set("graft.fluency.twophase.minBytes", "1")
    time("tercile_twophase") {
      noop(SparkEntry.queries("fluency_buckets")(spark, dir))
    }
    spark.conf.unset("graft.fluency.twophase.minBytes")

    // fact_join_agg: serial probe chain vs fanned lineitem
    def factJoin(fan: Boolean) = {
      val li0 = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") > to_timestamp(lit("1996-01-01 00:00:00")))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val li = if (fan) Tables.fanout(li0) else li0
      li.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          (sum(round(col("l_extendedprice") * 100).cast("long") *
               (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
            .cast("double") / 1000000L).as("revenue"))
        .orderBy("c_mktsegment", "o_orderpriority")
    }
    time("factjoin_plain") { noop(factJoin(fan = false)) }
    time("factjoin_fan") { noop(factJoin(fan = true)) }

    time("chunkdedup_plain") {
      noop(SparkEntry.queries("corpus_chunk_dedup")(spark, dir))
      spark.catalog.clearCache()
    }
    time("chunkdedup_fan") {
      noop(graft.operators.Dedup.chunkDedupOf(
        Tables.fanout(graft.operators.Dedup.withExactDupes(spark, dir)))
        .orderBy("doc_id"))
      spark.catalog.clearCache()
    }
    time("substr_spans_window2") { noop(spansWindow) }
    time("substr_spans_current2") {
      noop(SparkEntry.queries("exact_substr_spans")(spark, dir))
    }
    spark.stop()
  }
}
