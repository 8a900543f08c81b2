package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HMAC-SHA256 as a native Catalyst expression — the engine-side half
  * of the reference's JWT verification (internal/middleware/auth.go:
  * 32-53: HMAC signing method enforced, token rejected unless the
  * signature matches the server secret). Spark ships sha2/md5 but no
  * keyed MAC, so this wraps javax.crypto.Mac behind codegen: the
  * generated code calls the static helper (same pattern as Spark's own
  * hash expressions calling into their utility classes), so a
  * verification filter over a token column stays inside
  * WholeStageCodegen.
  */
object HmacUtil {
  private val mac = new ThreadLocal[javax.crypto.Mac] {
    override def initialValue(): javax.crypto.Mac =
      javax.crypto.Mac.getInstance("HmacSHA256")
  }

  /** One-shot HMAC-SHA256; Mac instance reused per thread, re-keyed
    * per call (init is cheap next to the digest). JCE refuses empty
    * keys, but RFC 2104 zero-pads keys to the block size, so an empty
    * key is equivalent to a single zero byte — substitute it. */
  def hmacSha256(data: Array[Byte], key: Array[Byte]): Array[Byte] = {
    val m = mac.get()
    val k = if (key.isEmpty) new Array[Byte](1) else key
    m.init(new javax.crypto.spec.SecretKeySpec(k, "HmacSHA256"))
    m.doFinal(data)
  }
}

/** hmac_sha256(data, key) → 32-byte binary MAC. String inputs are
  * taken as their UTF-8 bytes. */
case class HmacSha256(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType

  private def ok(t: DataType) = t == StringType || t == BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hmac_sha256 needs string/binary inputs, got ${left.dataType} / ${right.dataType}")

  private def bytes(v: Any): Array[Byte] = v match {
    case s: UTF8String => s.getBytes
    case b: Array[Byte] => b
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    HmacUtil.hmacSha256(bytes(a), bytes(b))

  private def toBytesJava(t: DataType, v: String): String =
    if (t == StringType) s"$v.getBytes()" else v

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val da = toBytesJava(left.dataType, a)
      val kb = toBytesJava(right.dataType, b)
      s"${ev.value} = graft.functions.HmacUtil.hmacSha256($da, $kb);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HmacSha256 =
    copy(left = l, right = r)
}

object CryptoExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def hmacSha256(data: Column, key: Column): Column =
    ColumnBridge.column(
      HmacSha256(ColumnBridge.expression(data), ColumnBridge.expression(key)))

  /** base64url without padding (RFC 7515 §2 — the JWT alphabet). */
  def base64Url(bin: Column): Column =
    regexp_replace(translate(base64(bin), "+/", "-_"), "=+$", "")

  /** Mint the signature segment for `header.payload` with `secret`. */
  def jwtSignature(signingInput: Column, secret: Column): Column =
    base64Url(hmacSha256(signingInput, secret))

  /** SC10 verification — the middleware decision as a boolean column:
    * token's third segment == HMAC-SHA256(header "." payload, secret)
    * in base64url. Malformed tokens (≠ 3 segments) verify false. */
  def jwtSigValid(token: Column, secret: Column): Column = {
    val parts = split(token, "\\.")
    val recomputed = jwtSignature(
      concat(element_at(parts, 1), lit("."), element_at(parts, 2)), secret)
    size(parts) === 3 && element_at(parts, 3) === recomputed
  }
}
