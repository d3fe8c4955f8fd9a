package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd portable hash — the first 60 bits of md5 as a
  * non-negative long, BIT-IDENTICAL to the composite the engine's
  * oracles were validated against
  * (`conv(substring(md5(x), 1, 15), 16, 10)`): the first 15 hex
  * digits of a digest are exactly the top 60 bits of its first 8
  * bytes read big-endian, so `(bytes[0..8) as u64) >>> 4` equals
  * `parseLong(hex[0..15), 16)` with no string detour.
  *
  * This is the engine's hottest scalar after the dot product — every
  * shingle, LSH bucket, MinHash family member, sample draw and shard
  * coin flows through it — and the builtin composite materializes a
  * 32-char hex string then runs base-conversion parsing per call. The
  * native form is digest + shift: no hex encode, no conv parse, no
  * intermediate UTF8String.
  *
  * Registered as SQL function `graft_hash60` via [[GraftExtensions]];
  * `Embedder.hash60Col` routes through it, so every operator picks it
  * up without plan changes. Hash60Spec pins bit-equality against the
  * composite path over the corpus plus edge cases.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hash60 expects a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    Hash60.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)

  override def prettyName: String = "graft_hash60"
}

object Hash60 {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(utf8 bytes) as a non-negative long. */
  def compute(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val b = md.digest(s.getBytes)
    val hi =
      ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
      ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
      ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    hi >>> 4
  }
}
