package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.UserSnapshot

/** The reference's third query consumer, composed end-to-end from
  * registered operators: the login path (api/auth.py:23-65).
  *
  *   firebase uid ── resolve through the users relation (J2
  *   `user__firebase_uid=uid`, auth.py:44) ── latest snapshot per user
  *   (A1 argmax, `.order_by("-ts").first()`, auth.py:44-46) ── role
  *   claims, ranger before farmhand, {} when no snapshot (auth.py:47-51)
  *   ── JWT payload with a deterministic time anchor (auth.py:52-61) ──
  *   signing callout through the S11 REST sink shape with an injected
  *   transport (auth.py:62-65; the reference's IAMCredentials sign_jwt).
  *
  * The routes are stubbed to 404 in the reference (api/__init__.py:18-19),
  * so this stays a composed spec, not a registered query.
  */
class LoginPathSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val FirebaseAud =
    "https://identitytoolkit.googleapis.com/google.identity.identitytoolkit.v1.IdentityToolkit"
  private val SvcEmail = "etl@svc.example"
  private val Now = 1700000000L // auth.py:40 time.time(), anchored

  private def snap(id: Long, ts: Long, name: String, fh: Boolean = false, r: Boolean = false) =
    UserSnapshot(id, new Timestamp(ts), name, fh, r)

  /** uid → (userId, claims, payload): the whole relational core of login. */
  private def resolve(logins: DataFrame, users: DataFrame,
      snaps: DataFrame): DataFrame = {
    // A1: latest snapshot per user — max_by hash aggregate, no window
    val latest = snaps.groupBy(col("userId"))
      .agg(max_by(struct(col("username"), col("isFarmhand"), col("isRanger")),
        struct(col("ts"))).as("m"))
      .select(col("userId"), col("m.isFarmhand").as("isFarmhand"),
        col("m.isRanger").as("isRanger"))
    // J2: filter across the users relation; LEFT joins because a valid
    // firebase login with no snapshot still gets a token, claims = {}
    // (auth.py:47 initializes claims = {} before the lookup)
    val role = when(col("isRanger"), "ranger").when(col("isFarmhand"), "farmhand")
    logins.join(users, Seq("firebase_uid"), "left")
      .join(latest, Seq("userId"), "left")
      .withColumn("claims",
        concat(lit("{"),
          coalesce(concat(lit("\"role\":\""), role, lit("\"")), lit("")),
          lit("}")))
      .withColumn("payload", concat(
        lit(s"""{"iss":"$SvcEmail","sub":"$SvcEmail","aud":"$FirebaseAud","uid":""""),
        col("firebase_uid"),
        lit(s"""","iat":$Now,"exp":${Now + 3600},"claims":"""),
        col("claims"), lit("}")))
  }

  private def fixtures(implicit s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    val users = Seq((1L, "uid-alice"), (2L, "uid-bob"), (3L, "uid-carol"))
      .toDF("userId", "firebase_uid")
    val snaps = Seq(
      snap(1, 100, "alice", r = true),            // stale: was ranger
      snap(1, 200, "alice", fh = true),           // latest wins: farmhand
      snap(2, 100, "bob"),                        // roleless -> {}
      snap(3, 100, "carol", fh = true, r = true)  // ranger outranks farmhand
    ).toDF()
    (users, snaps)
  }

  test("uid resolves through argmax snapshot to auth.py's role claims") {
    import spark.implicits._
    val (users, snaps) = fixtures(spark)
    val logins = Seq("uid-alice", "uid-bob", "uid-carol", "uid-ghost").toDF("firebase_uid")
    val got = resolve(logins, users, snaps)
      .select("firebase_uid", "claims")
      .as[(String, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("uid-alice", """{"role":"farmhand"}"""), // latest snapshot, not the stale ranger one
      ("uid-bob", "{}"),
      ("uid-carol", """{"role":"ranger"}"""),   // is_ranger checked before is_farmhand
      ("uid-ghost", "{}")))                     // no user row: token still issued, claims {}
  }

  test("signed-JWT callout: one POST per login through the S11 sink shape") {
    import spark.implicits._
    val (users, snaps) = fixtures(spark)
    val logins = Seq("uid-alice", "uid-bob").toDF("firebase_uid")
    val calls = spark.sparkContext.collectionAccumulator[String]("jwt-calls")
    val transport: RestSink.Transport = (url, body) => { calls.add(s"$url  $body"); 200 }
    val url = s"https://iamcredentials.example/projects/-/serviceAccounts/$SvcEmail:signJwt"
    val toSign = resolve(logins, users, snaps)
      .select(col("userId"), col("payload").as("new_claims"))
    val failed = RestSink.postClaims(toSign, url, transport)
    assert(failed == 0)
    import scala.jdk.CollectionConverters._
    val bodies = calls.value.asScala.toSeq.sorted
    assert(bodies.size == 2)
    assert(bodies.forall(_.startsWith(s"$url  ")))
    val alice = bodies.find(_.contains("\"localId\":\"1\"")).get
    assert(alice.contains(RestSink.jsonEscape(
      s""""uid":"uid-alice","iat":$Now,"exp":${Now + 3600},"claims":{"role":"farmhand"}""")))
    val bob = bodies.find(_.contains("\"localId\":\"2\"")).get
    assert(bob.contains(RestSink.jsonEscape(""""claims":{}""")))
  }
}
