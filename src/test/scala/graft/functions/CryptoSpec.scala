package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HMAC-SHA256 expression pinned to RFC 4231 test vectors, plus the
  * JWT verify decision built on it. */
class CryptoSpec extends SparkSpec {
  import spark.implicits._
  import CryptoExpressions._

  test("hmac_sha256 matches RFC 4231 test cases 1 and 2") {
    // case 1: key = 0x0b * 20, data = "Hi There"
    // case 2: key = "Jefe", data = "what do ya want for nothing?"
    val got = Seq(("c1", "Hi There"), ("c2", "what do ya want for nothing?"))
      .toDF("c", "data")
      .select(col("c"), lower(hex(hmacSha256(col("data"),
        when(col("c") === "c1", unhex(lit("0b" * 20)))
          .otherwise(encode(lit("Jefe"), "UTF-8"))))).as("mac"))
      .as[(String, String)].collect().toMap
    assert(got("c1") ==
      "b0344c61d8db38535ca8afceaf0bf12b881dc200c9833da726e9376c2e32cff7")
    assert(got("c2") ==
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
  }

  test("hmac_sha256 agrees with javax.crypto on arbitrary string inputs") {
    val rows = Seq(("k1", "some payload"), ("a longer key than the block", ""),
      ("", "data under empty key"))
    val got = rows.toDF("k", "d")
      .select(lower(hex(hmacSha256(col("d"), col("k")))).as("mac"))
      .as[String].collect()
    val want = rows.map { case (k, d) =>
      HmacUtil.hmacSha256(d.getBytes("UTF-8"), k.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    assert(got.toSeq == want)
  }

  test("jwtSigValid: true for properly signed token, false for tamper/malformed") {
    val header = java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString("""{"alg":"HS256","typ":"JWT"}""".getBytes("UTF-8"))
    val payload = java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString("""{"user_id":"42"}""".getBytes("UTF-8"))
    val si = s"$header.$payload"
    val sig = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(
      HmacUtil.hmacSha256(si.getBytes("UTF-8"), "s3cret".getBytes("UTF-8")))
    val tokens = Seq(
      (s"$si.$sig", true),            // signed with the right secret
      (s"$si.${sig.reverse}", false), // tampered signature
      (si, false),                    // no signature segment
      (s"$header.eyJ1c2VyX2lkIjoiOTkifQ.$sig", false)) // payload swapped
    val got = tokens.map(_._1).toDF("token")
      .select(jwtSigValid(col("token"), lit("s3cret")).as("v"))
      .as[Boolean].collect().toSeq
    assert(got == tokens.map(_._2))
    // and the wrong verifier secret rejects the valid token
    val wrong = Seq(s"$si.$sig").toDF("token")
      .select(jwtSigValid(col("token"), lit("other")).as("v")).as[Boolean].head()
    assert(!wrong)
  }
}
