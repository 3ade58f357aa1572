package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The HLL (bucket, rho) pair of `md5(x)` in ONE native pass —
  * value-identical to [[graft.functions.Sketches]]'s hex-string
  * pipeline (`conv(substring(md5(x),1,2),16,10)` for the bucket,
  * ltrim-based leading-zero arithmetic over hex chars 3..16 for rho)
  * but computed straight off the 16 digest bytes:
  *
  *  - bucket = first digest byte (hex chars 1-2) ∈ [0, 256);
  *  - rho = 1 + number of leading zero bits of digest bytes 1..7
  *    (hex chars 3..16 = 56 bits), 57 when all are zero — exactly
  *    [[graft.functions.Sketches.MaxRho]].
  *
  * Equality is bit-level, not approximate: both formulations read the
  * same md5 bits, so every (bucket, rho) — and therefore every
  * register bank, nonzero count and harmonic sum downstream — is
  * unchanged, and the md5-hex ORACLE replay (the q70 determinism
  * contract) still matches. What this removes from the per-row hot
  * path is the hex STRING materialization (32 chars per value) plus
  * the substring/conv/ltrim/length/when chain per sketched column —
  * q132 profiles 9 columns, so that chain ran 9× per row.
  *
  * Null in → null out (UnaryExpression default), matching the hex
  * path where md5(null) nulls the whole chain; [[HllRegisters]] skips
  * null rows either way.
  */
case class Md5BucketRho(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("rho", LongType, nullable = false)))

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_bucket_rho requires a string input, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    Md5BucketRho.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.plans.Md5BucketRho.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Md5BucketRho =
    copy(child = newChild)
}

object Md5BucketRho {
  import org.apache.spark.sql.graftbridge.Bridge

  def md5BucketRho(x: Column): Column =
    Bridge.toColumn(Md5BucketRho(Bridge.toExpression(x)))

  // MessageDigest is stateful; one per task thread, reset per call
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String): GenericInternalRow = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    val bucket = (d(0) & 0xff).toLong
    // 56 bits from digest bytes 1..7, big-endian — hex chars 3..16
    var v = 0L
    var i = 1
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    // rho = leading zeros within the 56-bit field + 1; the long holds
    // the field in its low 56 bits, so subtract the 8 spare high bits.
    // All-zero field caps at Sketches.MaxRho — the ONE sketch-geometry
    // constant, shared so the native and hex paths cannot diverge.
    val rho = if (v == 0L) graft.functions.Sketches.MaxRho.toLong
      else (java.lang.Long.numberOfLeadingZeros(v) - 8 + 1).toLong
    new GenericInternalRow(Array[Any](bucket, rho))
  }
}
