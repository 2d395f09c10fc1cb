package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins [[Scalars.propsLong]]'s data contract (the ADVICE r18 ask,
  * carried to the r19 pattern-scan extraction): the harness generator
  * writes flat, well-formed, integer-typed `events.props` payloads, and
  * THERE the extraction is exact vs the oracle's
  * TRY_CAST(json_extract_string(props, '$.k') AS BIGINT). This spec
  * freezes what happens OUTSIDE that contract so a future generator
  * change diverges a test, not the silent oracle gate:
  *
  *  - integer-typed k           → the value (in-contract)
  *  - string-typed "k":"12"     → NULL (oracle would parse 12 — the
  *                                 agreed divergence class, identical
  *                                 to the old from_json spelling)
  *  - missing k / other keys    → NULL (same as oracle)
  *  - out-of-long-range integer → NULL via TRY_CAST (oracle identical)
  *  - truncated payload with a  → extracts (a strict parse would NULL;
  *    surviving "k":N prefix      DuckDB json_extract_string ERRORS, so
  *                                 the oracle holds no position)
  */
class JsonPropsContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def k(payloads: String*): Seq[Option[Long]] = {
    import spark.implicits._
    payloads.toDF("props")
      .select(Scalars.propsLong("props", "k").as("k"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
  }

  test("in-contract integer payloads extract exactly, whitespace-insensitively") {
    assert(k("""{"k": 76}""", """{"k":43}""", """{"k" : -7}""", """{"j": 1, "k": 10}""")
      == Seq(Some(76L), Some(43L), Some(-7L), Some(10L)))
  }

  test("string-typed k is NULL — the pinned divergence vs the oracle's TRY_CAST") {
    assert(k("""{"k": "12"}""") == Seq(None))
  }

  test("missing key and non-numeric values are NULL") {
    assert(k("""{"j": 5}""", """{"k": true}""", "{}") == Seq(None, None, None))
  }

  test("decimal-typed k captures its integer prefix — pinned, in-contract payloads are integers") {
    // documented sharp edge: the scan is not a number parser; "1.5"
    // yields 1 where a typed parse yields NULL. The harness contract
    // (integer-typed k) keeps this out of the oracle's sight.
    assert(k("""{"k": 1.5}""") == Seq(Some(1L)))
  }

  test("out-of-long-range integers are NULL via TRY_CAST, matching the oracle") {
    assert(k("""{"k": 99999999999999999999999}""") == Seq(None))
  }

  test("truncated payload with a surviving k:N prefix still extracts — documented non-validation") {
    assert(k("""{"k": 31""") == Seq(Some(31L)))
  }

  test("""key pattern embedded in another field's string value — pinned both ways (r19 ADVICE)""") {
    // WELL-FORMED JSON cannot smuggle the bare pattern into a string
    // value: an embedded quote is escaped, so the raw bytes carry
    // \"k\" and the scan's literal "k" never matches there — the REAL
    // field wins, exactly like a typed parse. (Stronger than the
    // advisory assumed: the escape that JSON requires is the same
    // character that blocks the pattern.)
    assert(k("""{"a": "\"k\":7", "k": 12}""") == Seq(Some(12L)))
    assert(k("""{"a": "\"k\": 9"}""") == Seq(None))
    // MALFORMED payloads (unescaped quotes in a value) are the one
    // route in, consistent with the documented non-validation above:
    // the first raw "k":N wins regardless of structure. The harness
    // generator writes well-formed flat payloads, so this stays outside
    // the oracle gate; a generator change trips HERE instead.
    assert(k("""{"a": ""k":7", "k": 12}""") == Seq(Some(7L)))
  }
}
