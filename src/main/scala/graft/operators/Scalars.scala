package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns

/** Oracle-checked query twins for the scalar-function surface
  * (SURVEY.md §2.7). Each query synthesizes reference-shaped inputs from
  * the testdata columns, applies the F-group functions, and is mirrored by
  * DuckDB SQL computing the same values.
  */
object Scalars {
  type Q = (SparkSession, String) => DataFrame

  private val EV =
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

  /** F1+F2 `regexp_extract_id` — delete-link message IDs and flag-badge
    * counts (scrapers/chat.py:19-20,59-61,106-114). */
  val regexpExtractId: Q = (spark, dir) =>
    Tables.events(spark, dir)
      .withColumn("href", concat(lit("javascript:delChat("), col("event_id"), lit(")")))
      .withColumn("badge", concat((col("user_id") % 5).cast("string"), lit(" flags")))
      .select(col("event_id"),
        Fns.messageId(col("href")).cast("long").as("msg_id"),
        Fns.flagCount(col("badge")).cast("long").as("n_flags"))
      .orderBy("event_id")
  val regexpExtractIdSql: String =
    s"""SELECT event_id,
       |       CAST(regexp_extract('javascript:delChat(' || event_id || ')',
       |                           'javascript:(?:un)?delChat\\((\\d+)\\)', 1) AS BIGINT) AS msg_id,
       |       user_id % 5 AS n_flags
       |FROM $EV ORDER BY event_id""".stripMargin

  /** F3+F4+F7 `regexp_replace_normalize` — content normalization: forcepath
    * rewrite, @-link rewrite, <br> split-to-first-line
    * (scrapers/chat.py:21-25,72-74; bots/base.py:37-44). */
  val regexpReplaceNormalize: Q = (spark, dir) => {
    val d = Tables.documents(spark, dir)
    val content = concat(
      lit("<strong>"), col("lang"), lit("path</strong> "),
      lit("""<a class="close-panel" href="profile.php?user_name="""), col("source"),
      lit("""" style="color:teal">@"""), col("source"), lit("</a> "),
      col("text"), lit("<br/>tail line"))
    d.withColumn("content", content)
      .select(col("doc_id"),
        Fns.firstLine(Fns.rewriteAtLinks(Fns.normalizeForcepath(col("content")))).as("norm"))
      .orderBy("doc_id")
  }
  val regexpReplaceNormalizeSql: String =
    """SELECT doc_id,
      |  string_split(
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          '<strong>' || lang || 'path</strong> <a class="close-panel" href="profile.php?user_name='
      |            || source || '" style="color:teal">@' || source || '</a> ' || text || '<br/>tail line',
      |          '<strong>\w+path</strong>', '<strong>Forcepath</strong>', 'g'),
      |        '<a class="close-panel" href="profile.php\?user_name=[^">]+" style="color:teal">(@[^">]+)</a>',
      |        '\1:', 'g'),
      |      '<br\s*/?>', chr(10), 'g'),
      |    chr(10))[1] AS norm
      |FROM documents ORDER BY doc_id""".stripMargin

  /** F5 `regexp_extract_all_mentions` — mention extraction. The oracle runs
    * a lookahead-free pattern (RE2 cannot express the reference's lookahead;
    * the exact reference pattern is [[graft.functions.Fns.mentions]],
    * golden-tested in MentionSpec). Output is CSV-joined so the compared
    * column is a plain string.
    */
  val regexpExtractAllMentions: Q = (spark, dir) => {
    val d = Tables.documents(spark, dir)
    val s = concat(lit("@"), col("source"), lit(": "), col("text"),
      lit(" cc @user"), col("doc_id") % 7, lit(": bye"))
    d.withColumn("s", s)
      .select(col("doc_id"),
        array_join(regexp_extract_all(col("s"), lit("""@([^:\s]+):"""), lit(1)), ",").as("mentions_csv"))
      .orderBy("doc_id")
  }
  val regexpExtractAllMentionsSql: String =
    """SELECT doc_id,
      |       array_to_string(
      |         regexp_extract_all('@' || source || ': ' || text || ' cc @user' || (doc_id % 7) || ': bye',
      |                            '@([^:\s]+):', 1), ',') AS mentions_csv
      |FROM documents ORDER BY doc_id""".stripMargin

  /** F11+F12 `to_timestamp_ampm` — round-trip the server's yearless
    * "%b %d, %I:%M:%S %p" America/Chicago format back to UTC
    * (scrapers/mailbox.py:45-57, utils/datetime.py:4-13). January slice
    * only: a fixed UTC offset (CST), so the round-trip is unambiguous —
    * the reference has the same property because its "now" anchor and the
    * parsed times share a zone.
    */
  val toTimestampAmPm: Q = (spark, dir) => {
    // fanout: format+parse round-trip is the dominant per-row cost;
    // the small-file scan leaves it serial without the rebalance
    val ev = Tables.fanout(Tables.events(spark, dir)).filter(month(col("ts")) === 1)
    // Render what the game server would show (it displays America/Chicago).
    val shown = date_format(from_utc_timestamp(col("ts"), "America/Chicago"),
      "MMM dd, hh:mm:ss a")
    ev.withColumn("shown", shown)
      .select(col("event_id"), col("shown"),
        Fns.parseServerTs(col("shown"), lit(2024)).as("parsed_utc"))
      .orderBy("event_id")
  }
  val toTimestampAmPmSql: String =
    s"""SELECT event_id, shown,
       |       make_timestamp(epoch_us(timezone('America/Chicago',
       |         strptime('2024 ' || shown, '%Y %b %d, %I:%M:%S %p')))) AS parsed_utc
       |FROM (
       |  SELECT event_id,
       |         strftime(timezone('America/Chicago', timezone('UTC', ts)),
       |                  '%b %d, %I:%M:%S %p') AS shown
       |  FROM $EV WHERE month(ts) = 1)
       |ORDER BY event_id""".stripMargin

  /** F13+F14 `datetime_funcs` — interval arithmetic, truncation, field
    * extraction, epoch conversion (scrapers/chat.py:50, utils/datetime.py). */
  val datetimeFuncs: Q = (spark, dir) =>
    Tables.events(spark, dir)
      .select(col("event_id"),
        (col("ts") - expr("INTERVAL 1 DAY")).as("prev_day"),
        date_trunc("day", col("ts")).as("day"),
        year(col("ts")).cast("long").as("y"),
        month(col("ts")).cast("long").as("m"),
        unix_micros(col("ts")).as("epoch_us"))
      .orderBy("event_id")
  val datetimeFuncsSql: String =
    s"""SELECT event_id, ts - INTERVAL 1 DAY AS prev_day,
       |       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |       year(ts) AS y, month(ts) AS m, epoch_us(ts) AS epoch_us
       |FROM $EV ORDER BY event_id""".stripMargin

  /** F8+F9+F10+F17 `string_funcs` — lower/trim, prefix-drop slice, composite
    * key concat, fixed-length check. */
  val stringFuncs: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        lower(col("source")).as("lowered"),
        trim(concat(lit("  "), col("lang"), lit(" "))).as("trimmed"),
        Fns.dropPrefix2(col("text")).as("sliced"),
        Fns.compositeKey(col("lang"), col("source"), col("doc_id")).as("ckey"),
        (length(col("text")) === 28).as("is_uid_len"))
      .orderBy("doc_id")
  val stringFuncsSql: String =
    """SELECT doc_id, lower(source) AS lowered, trim('  ' || lang || ' ') AS trimmed,
      |       substr(text, 3) AS sliced,
      |       lang || '|' || source || '|' || doc_id AS ckey,
      |       length(text) = 28 AS is_uid_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** F6 `regexp_match_link` — link-shape matching (scrapers/user.py:16-17,
    * 44-52): extract the user id from friends-list hrefs, test
    * profile-link shapes. Exercises [[Fns.friendsLinkUserId]] /
    * [[Fns.ProfileLinkPat]] with the reference's exact patterns (both are
    * lookahead-free, so the oracle runs the same regexes).
    */
  val regexpMatchLink: Q = (spark, dir) =>
    Tables.customer(spark, dir)
      .withColumn("href",
        when(col("c_custkey") % 4 === 0, concat(lit("members.php?type=friended&id="), col("c_custkey")))
          .otherwise(concat(lit("profile.php?user_name="), col("c_name"))))
      .select(col("c_custkey"), col("href"),
        Fns.friendsLinkUserId(col("href")).as("friend_id"),
        col("href").rlike(Fns.ProfileLinkPat).as("is_profile_link"))
      .orderBy("c_custkey")
  val regexpMatchLinkSql: String =
    """SELECT c_custkey, href,
      |       CAST(NULLIF(regexp_extract(href, '^members.php\?type=friended&id=(\d+)$', 1), '') AS BIGINT) AS friend_id,
      |       regexp_matches(href, '^profile.php\?') AS is_profile_link
      |FROM (
      |  SELECT c_custkey,
      |         CASE WHEN c_custkey % 4 = 0 THEN 'members.php?type=friended&id=' || c_custkey
      |              ELSE 'profile.php?user_name=' || c_name END AS href
      |  FROM customer)
      |ORDER BY c_custkey""".stripMargin

  /** F7+F8 `command_parse` — DM bot command parsing (bots/base.py:37-44):
    * first line of the <br>-separated body, command lowered, args split
    * once. */
  val commandParse: Q = (spark, dir) =>
    Tables.customer(spark, dir)
      .withColumn("body",
        concat(lit("FIREBASE "), col("c_name"), lit(" extra<br/>ignored tail")))
      .select(col("c_custkey"),
        Fns.commandName(col("body")).as("cmd"),
        Fns.commandArgs(col("body")).as("args"))
      .orderBy("c_custkey")
  val commandParseSql: String =
    """SELECT c_custkey, 'firebase' AS cmd, c_name || ' extra' AS args
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** F16 `to_json_claims` — claims JSON with a conditional role key
    * (models/user.py:27-33, firebase.py:32): the key is absent, not null,
    * when the user has no role. Built by explicit concatenation so both
    * engines emit byte-identical JSON.
    */
  val toJsonClaims: Q = (spark, dir) => {
    val c = Tables.customer(spark, dir)
    val role = when(col("c_acctbal") > 9000, lit("ranger"))
      .when(col("c_acctbal") > 5000, lit("farmhand"))
    c.select(col("c_custkey"),
        Fns.claimsJson(col("c_name"), role).as("claims"))
      .orderBy("c_custkey")
  }
  val toJsonClaimsSql: String =
    """SELECT c_custkey,
      |       '{"username":"' || c_name || '"' ||
      |       CASE WHEN c_acctbal > 9000 THEN ',"role":"ranger"'
      |            WHEN c_acctbal > 5000 THEN ',"role":"farmhand"'
      |            ELSE '' END || '}' AS claims
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // X108 json_props_histogram — schema-on-read JSON extraction + rollup
  // ---------------------------------------------------------------------

  /** The schema-on-read path F16's `to_json` only writes: extract a
    * typed field from the `events.props` JSON payload per row
    * ([[propsLong]] — a codegen'd pattern scan, vs DuckDB's
    * `json_extract_string`, same NULL-on-missing contract for the
    * harness's flat integer payloads), then roll the corpus into a
    * decade histogram with the exact decimal-pinned value mass. This is
    * the event-property analytics every product pipeline runs without
    * ever materializing a schema for `props`.
    *
    * Scale shape: the extraction is a row-local projection fused into
    * the scan stage; the corpus collapses in ONE map-combinable
    * (bucket) aggregate; ≤ value-range / 10 output rows. */

  /** Typed top-level-integer-field extraction from a JSON payload
    * column: `"<key>"` followed by optional whitespace, `:`, optional
    * whitespace, and an integer — NULL on no match or a non-long value.
    * The divergence classes vs a full JSON parse are pinned by
    * JsonPropsContractSpec: a string-typed `"k":"12"` is NULL (the
    * quote blocks the match — same NULL the old from_json spelling
    * produced, while DuckDB's TRY_CAST(json_extract_string) parses it),
    * and the scan does not validate document well-formedness (a
    * truncated payload whose `"k":12` prefix survives still extracts,
    * where a strict parse yields NULL — DuckDB's json_extract_string
    * ERRORS there, so the oracle holds no position). A key pattern
    * EMBEDDED in another field's string value cannot match from
    * well-formed JSON — the escape its quotes require (`\"k\"`) is the
    * very character that blocks the literal `"k"` scan — and matches
    * only from malformed raw text (same non-validation class; both
    * pinned in JsonPropsContractSpec, r19 ADVICE). Exact on
    * well-formed single-level integer-typed payloads, which is the
    * harness generator's contract for `events.props`. */
  private[graft] def propsLong(propsCol: String, key: String): Column =
    expr(s"try_cast(regexp_extract($propsCol, " +
      s"'\"$key\"\\\\s*:\\\\s*(-?\\\\d+)', 1) as long)")
  val jsonPropsHistogram: Q = (spark, dir) =>
    // Extraction scalar (r19 rewrite, measured min-of-5 at sf0.1 on the
    // full query): pattern-scan extraction at 0.28 s vs 0.71 s for the
    // r18 pinned-schema from_json and 0.60 s for from_json behind a
    // fanout exchange. Two findings drove it: (1) the bucket expression
    // below references k THREE times and Catalyst's collapsed
    // projection inlines the alias, so a Jackson-backed k paid three
    // full parses per row; (2) a codegen'd regexp scan of the tiny
    // props payload costs ~nothing over the raw scan (0.09 s vs 0.10 s
    // scan-only), so the serial single-row-group scan stays the only
    // serial stage and needs no rebalance exchange at all. This is the
    // same engineering choice DuckDB's json_extract_string makes — a
    // specialized byte scanner, not a document parse. Contract (same
    // class as the r18 from_json spelling, pinned by
    // JsonPropsContractSpec): exact for the harness's well-formed
    // integer-typed payloads; a string-typed "k":"12" is NULL here
    // (quote blocks the match) while the oracle's TRY_CAST(
    // json_extract_string(...)) parses it — identical to from_json's
    // NULL, so the agreed divergence class is unchanged.
    // Robustness (r18, kept): TRY_CAST on both sides (a non-numeric k
    // is NULL, not an error, in either engine) and a FLOOR-aligned
    // bucket spelled with a sign-normalized remainder — `div` truncates
    // toward zero in Spark while DuckDB's `//` floors, so a negative k
    // would bucket differently under the old `(k div 10) * 10`;
    // `k - ((k % 10) + 10) % 10` floors identically in both (% is the
    // truncation-style remainder in both engines).
    Tables.events(spark, dir).select("props", "value")
      .withColumn("k", propsLong("props", "k"))
      .groupBy(expr("k - ((k % 10) + 10) % 10").as("k_bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(38,10)")).cast("double").as("sum_value"))
      .filter(col("k_bucket").isNotNull)
      .orderBy("k_bucket")
  val jsonPropsHistogramSql: String =
    s"""SELECT k - ((k % 10) + 10) % 10 AS k_bucket,
       |       CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS sum_value
       |FROM (
       |  SELECT value,
       |         TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
       |  FROM $EV ev)
       |WHERE k IS NOT NULL
       |GROUP BY 1 ORDER BY k_bucket""".stripMargin

  val queries: Map[String, Q] = Map(
    "json_props_histogram" -> jsonPropsHistogram,
    "regexp_extract_id" -> regexpExtractId,
    "regexp_replace_normalize" -> regexpReplaceNormalize,
    "regexp_extract_all_mentions" -> regexpExtractAllMentions,
    "to_timestamp_ampm" -> toTimestampAmPm,
    "datetime_funcs" -> datetimeFuncs,
    "string_funcs" -> stringFuncs,
    "to_json_claims" -> toJsonClaims,
    "regexp_match_link" -> regexpMatchLink,
    "command_parse" -> commandParse,
  )
  val oracles: Map[String, String] = Map(
    "regexp_extract_id" -> regexpExtractIdSql,
    "regexp_replace_normalize" -> regexpReplaceNormalizeSql,
    "regexp_extract_all_mentions" -> regexpExtractAllMentionsSql,
    "to_timestamp_ampm" -> toTimestampAmPmSql,
    "datetime_funcs" -> datetimeFuncsSql,
    "string_funcs" -> stringFuncsSql,
    "to_json_claims" -> toJsonClaimsSql,
    "regexp_match_link" -> regexpMatchLinkSql,
    "command_parse" -> commandParseSql,
    "json_props_histogram" -> jsonPropsHistogramSql,
  )
}
